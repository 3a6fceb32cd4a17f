"""SwinV2 backbone variant (cosine attention + continuous rel-pos bias).

Re-design of /root/reference/basics/models/backbone_swinv2.py:13-250 — the
alternate encoder the reference swaps in by editing the import at
model.py:16. Structure:

  4x per-channel patch embeds (1->24ch, kernel=patch_size stride 4, pad 0)
  -> CAttentionBlockV2 (window 2, no shift, scale-before-softmax, residual
     + LN inside windows, concat to 96ch; backbone_swinv2.py:395-474)
  -> 1x1 patch embed 96->96
  -> 4 BasicLayers, depths [2,2,6,2], heads [3,6,12,24], window 8, V2
     blocks: cosine attention with clamped learned logit scale
     (backbone_swinv2.py:924-927), cpb-MLP continuous relative position
     bias scaled 16*sigmoid (:929-933), qkv bias with zero K bias (:917-920),
     POST-norm residuals with norms zero-initialized (_init_respostnorm,
     :1169-1174), PatchMerging between stages
  -> taps after stages 0, 2, 3 (pre-downsample) -> necks 96->128, 384->256,
     768->512, i.e. [P3@/4, P4@/16, P5@/32].
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .swin import (window_partition, window_unpartition, shift_attn_mask,
                   relative_position_index, PatchMerging, PatchEmbed)
from .cattention import CAttention
from ..ops.activations import gelu

DType = Any


def relative_coords_table(ws: int, pretrained_ws: int = 0) -> np.ndarray:
    """Normalized log-spaced coord table (backbone_swinv2.py:868-881)."""
    rh = np.arange(-(ws - 1), ws, dtype=np.float32)
    rw = np.arange(-(ws - 1), ws, dtype=np.float32)
    table = np.stack(np.meshgrid(rh, rw, indexing="ij"), axis=-1)
    denom = (pretrained_ws - 1) if pretrained_ws > 0 else (ws - 1)
    table = table / max(denom, 1)
    table *= 8.0
    table = np.sign(table) * np.log2(np.abs(table) + 1.0) / np.log2(8)
    return table.reshape(-1, 2)  # ((2ws-1)^2, 2)


class WindowAttentionV2(nn.Module):
    """Cosine window attention with cpb-MLP bias (backbone_swinv2.py:837-949)."""

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    pretrained_window_size: int = 0
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: np.ndarray | None = None):
        b_, n, c = x.shape
        nh = self.num_heads
        hd = c // nh

        logit_scale = self.param(
            "logit_scale",
            lambda k, s: jnp.full(s, jnp.log(10.0), jnp.float32),
            (nh, 1, 1))

        table = jnp.asarray(relative_coords_table(
            self.window_size, self.pretrained_window_size))
        h1 = nn.Dense(512, use_bias=True, dtype=self.dtype,
                      name="cpb_mlp0")(table)
        bias_table = nn.Dense(nh, use_bias=False, dtype=self.dtype,
                              name="cpb_mlp1")(jax.nn.relu(h1))
        rel_idx = relative_position_index(self.window_size).reshape(-1)
        bias = bias_table[rel_idx].reshape(n, n, nh).transpose(2, 0, 1)
        bias = 16.0 * jax.nn.sigmoid(bias.astype(jnp.float32))

        qkv_w = nn.Dense(3 * c, use_bias=False, dtype=self.dtype,
                         name="qkv")(x)
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (c,))
            v_bias = self.param("v_bias", nn.initializers.zeros, (c,))
            qkv_bias = jnp.concatenate(
                [q_bias, jnp.zeros_like(q_bias), v_bias]).astype(qkv_w.dtype)
            qkv_w = qkv_w + qkv_bias
        qkv = qkv_w.reshape(b_, n, 3, nh, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]

        qn = q / (jnp.linalg.norm(q.astype(jnp.float32), axis=-1,
                                  keepdims=True) + 1e-12)
        kn = k / (jnp.linalg.norm(k.astype(jnp.float32), axis=-1,
                                  keepdims=True) + 1e-12)
        # cosine attention = plain scaled-dot attention on the NORMALIZED
        # q/k with the (clamped) per-head logit scale folded into q —
        # softmax((qn*s_h) @ kn^T + bias + mask) — so the same Pallas
        # window-attention core as v1 serves v2 with scale=1
        scale = jnp.exp(jnp.clip(logit_scale, a_max=float(np.log(100.0))))
        qs = (qn * scale[None]).astype(self.dtype)       # (B_, nh, n, hd)
        pack = jnp.concatenate([
            qs.transpose(0, 2, 1, 3).reshape(b_, n, c),
            kn.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b_, n, c),
            v.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b_, n, c),
        ], axis=-1)                                      # (B_, n, 3C)
        from ..pallas.window_attention import window_attention_core
        nw = mask.shape[0] if mask is not None else 1
        out = window_attention_core(
            pack, bias.astype(jnp.float32),
            None if mask is None else jnp.asarray(mask, jnp.float32),
            nw, nh, 1.0)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class SwinBlockV2(nn.Module):
    """V2 block: post-norm residuals, norms zero-init (backbone_swinv2.py:
    969-1077, 1169-1174)."""

    dim: int
    input_resolution: tuple[int, int]
    num_heads: int
    window_size: int = 8
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    pretrained_window_size: int = 0
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        h, w = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            ws, shift = min(h, w), 0
        b, l, c = x.shape
        assert l == h * w

        shortcut = x
        xs = x.reshape(b, h, w, c)
        if shift > 0:
            xs = jnp.roll(xs, shift=(-shift, -shift), axis=(1, 2))
        xw = window_partition(xs, ws)
        mask = shift_attn_mask(h, w, ws, shift) if shift > 0 else None
        xw = WindowAttentionV2(self.dim, ws, self.num_heads, self.qkv_bias,
                               pretrained_window_size=self.pretrained_window_size,
                               dtype=self.dtype, name="attn")(xw, mask)
        xs = window_unpartition(xw, ws, (h, w))
        if shift > 0:
            xs = jnp.roll(xs, shift=(shift, shift), axis=(1, 2))
        xs = xs.reshape(b, l, c)
        # post-norm, zero-initialized (residual starts as identity)
        from .norm import FusedLayerNorm
        xs = FusedLayerNorm(dtype=self.dtype,
                            scale_init=nn.initializers.zeros,
                            name="norm1")(xs)
        x = shortcut + xs

        y = nn.Dense(int(self.dim * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(x)
        y = gelu(y)
        y = nn.Dense(self.dim, dtype=self.dtype, name="mlp_fc2")(y)
        y = FusedLayerNorm(dtype=self.dtype,
                           scale_init=nn.initializers.zeros, name="norm2")(y)
        return x + y


class CAttentionBlockV2(nn.Module):
    """V2 cross-channel fusion: window 2, scale-before-softmax, residual+LN
    inside windows, concat output (backbone_swinv2.py:395-474)."""

    embedding_dim: int
    num_heads: int
    window_size: int = 2
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, r, g, b, ir):
        bsz, h, w, c = r.shape
        ws = self.window_size
        rw = window_partition(r, ws)
        gw = window_partition(g, ws)
        bw = window_partition(b, ws)
        irw = window_partition(ir, ws)

        def cattn(q, k, v):
            # standard scaled-dot attention (scale BEFORE softmax here,
            # unlike the v1 block's mask-first quirk)
            b_, n, cc = q.shape
            nh = self.num_heads
            hd = cc // nh
            split = lambda x: x.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3)
            qh, kh, vh = split(q), split(k), split(v)
            a = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                           preferred_element_type=jnp.float32)
            a = a / jnp.sqrt(jnp.asarray(hd, a.dtype))
            a = jax.nn.softmax(a, axis=-1).astype(self.dtype)
            o = jnp.einsum("bhnm,bhmd->bhnd", a, vh.astype(self.dtype))
            return o.transpose(0, 2, 1, 3).reshape(b_, n, cc)

        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                       name=name)
        x1 = ln("norm1")(rw + cattn(rw, gw, gw))
        x2 = ln("norm2")(gw + cattn(gw, bw, bw))
        x3 = ln("norm3")(bw + cattn(bw, irw, irw))
        x4 = ln("norm4")(irw + cattn(irw, gw, gw))

        unp = lambda xw: window_unpartition(xw, ws, (h, w))
        return jnp.concatenate([unp(x1), unp(x2), unp(x3), unp(x4)], axis=-1)


class ImageEncoderSwinV2(nn.Module):
    """The full SwinV2 variant encoder (backbone_swinv2.py:13-232)."""

    img_size: int = 512
    patch_size: int = 4
    embed_dim: int = 96
    in_chans: int = 4
    out_chans: int = 256   # kept for config parity; necks are fixed below
    window_size: int = 8
    chan_embed_dim: int = 24
    chan_heads: int = 12
    depths: tuple = (2, 2, 6, 2)
    num_heads: tuple = (3, 6, 12, 24)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        ps = self.patch_size
        ce = self.chan_embed_dim

        def chan_embed(name):
            return PatchEmbed(ce, kernel=(ps, ps), stride=(4, 4),
                              padding=(0, 0), dtype=self.dtype, name=name)

        r = chan_embed("channel_embed_r")(x[..., 0:1])
        g = chan_embed("channel_embed_g")(x[..., 1:2])
        b = chan_embed("channel_embed_b")(x[..., 2:3])
        ir = chan_embed("channel_embed_i")(x[..., 3:4])

        x = CAttentionBlockV2(embedding_dim=ce, num_heads=self.chan_heads,
                              dtype=self.dtype, name="chan_block")(r, g, b, ir)
        x = PatchEmbed(self.embed_dim, kernel=(1, 1), stride=(1, 1),
                       padding=(0, 0), dtype=self.dtype, name="patch_embed")(x)
        bsz, h, w, c = x.shape
        x = x.reshape(bsz, h * w, c)

        taps = []
        res = (h, w)
        dim = self.embed_dim
        for li, (depth, nh) in enumerate(zip(self.depths, self.num_heads)):
            for bi in range(depth):
                shift = 0 if bi % 2 == 0 else self.window_size // 2
                x = SwinBlockV2(dim=dim, input_resolution=res, num_heads=nh,
                                window_size=self.window_size,
                                shift_size=shift, mlp_ratio=self.mlp_ratio,
                                qkv_bias=self.qkv_bias,
                                pretrained_window_size=8,
                                dtype=self.dtype,
                                name=f"layer{li}_blk{bi}")(x)
            if li in (0, 2, 3):
                taps.append((x, res, dim))
            if li < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"downsample{li}")(x, res)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2

        outs = []
        necks = [("neck1", 128), ("neck2", 256), ("neck3", 512)]
        for (t, (th, tw), td), (nname, nch) in zip(taps, necks):
            fmap = t.reshape(bsz, th, tw, td)
            outs.append(nn.Conv(nch, (1, 1), use_bias=False,
                                dtype=self.dtype, name=nname)(fmap))
        return outs
