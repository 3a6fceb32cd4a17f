"""Swin-style windowed attention blocks, TPU-first (static shapes, NHWC).

Re-design of the transformer vocabulary in
/root/reference/basics/models/backbone_vit.py:619-1148 — window
partition/unpartition, W-MSA with learned relative-position bias,
shifted-window masks, dual-mode MLP (linear vs conv-augmented), and
PatchMerging — with the TPU in mind:

  * all window partitioning is reshape/transpose on static shapes; XLA fuses
    it into the surrounding ops (no gather),
  * shift masks and relative-position indices are computed with numpy at
    trace time and baked in as constants,
  * attention runs in one batched einsum over (B * num_windows) so the MXU
    sees a single large matmul per block,
  * everything is resolution-static: one compile per input size.

Parity notes vs the reference:
  * `linear_mlp = (shift_size == 0)` — non-shifted blocks use the plain
    fc-act-fc MLP; *shifted* blocks use the conv-augmented MLP
    (2x2 conv on the (H, W) token grid, backbone_vit.py:863-908).
  * mask value -100.0 (not -inf), LayerNorm eps 1e-5 (torch default).
  * PatchMerging applies reduction Linear *then* LayerNorm
    (backbone_vit.py:839-860).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from .norm import FusedLayerNorm, FusedAddLayerNorm
from ..ops.activations import gelu
from ..pallas import kernels_enabled

DType = Any

trunc02 = nn.initializers.truncated_normal(stddev=0.02)


def window_partition(x: jax.Array, ws: int) -> jax.Array:
    """(B, H, W, C) -> (B*nW, ws*ws, C). H, W must be multiples of ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_unpartition(windows: jax.Array, ws: int, hw: tuple[int, int]) -> jax.Array:
    """(B*nW, ws*ws, C) -> (B, H, W, C)."""
    h, w = hw
    c = windows.shape[-1]
    b = windows.shape[0] // ((h // ws) * (w // ws))
    x = windows.reshape(b, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


def shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """SW-MSA additive mask (nW, ws*ws, ws*ws), values {0, -100}.

    Computed statically (reference backbone_vit.py:1058-1081).
    """
    img_mask = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img_mask[hs, wsl] = cnt
            cnt += 1
    m = img_mask.reshape(h // ws, ws, w // ws, ws)
    m = m.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def relative_position_index(ws: int) -> np.ndarray:
    """(ws*ws, ws*ws) index into the (2ws-1)^2 bias table (backbone_vit.py:940-951)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


class DenseParams(nn.Module):
    """Parameter-only stand-in for nn.Dense: identical name/shape/init
    tree ({"kernel", "bias"}, f32, lecun-normal/zeros), so checkpoints and
    the torch weight importer are unaffected while fused kernels consume
    the raw weights directly."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (in_features, self.features), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros,
                        (self.features,), jnp.float32)
             if self.use_bias else None)
        return k, b


class ConvParams(nn.Module):
    """Parameter-only stand-in for nn.Conv (same {"kernel", "bias"} names,
    HWIO shape, lecun-normal/zeros init) for megakernel consumers."""

    features: int
    kernel_size: tuple[int, int]
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kh, kw = self.kernel_size
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (kh, kw, in_features, self.features), jnp.float32)
        b = (self.param("bias", nn.initializers.zeros,
                        (self.features,), jnp.float32)
             if self.use_bias else None)
        return k, b


class LNParams(nn.Module):
    """Parameter-only stand-in for FusedLayerNorm ({"scale", "bias"}, f32,
    ones/zeros) so pre-attention LN can fold into the fused block kernel
    while checkpoints and weight import stay unchanged."""

    @nn.compact
    def __call__(self, features: int):
        s = self.param("scale", nn.initializers.ones, (features,),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (features,),
                       jnp.float32)
        return s, b


class WindowAttention(nn.Module):
    """W-MSA with relative position bias (backbone_vit.py:913-992).

    Input: (B_, N, C) window tokens; optional additive mask (nW, N, N).
    """

    dim: int
    window_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, mask: np.ndarray | None = None,
                 ln=None, params_only: bool = False):
        """Two input layouts share the same parameters:

        * (B_, N, C) pre-partitioned window tokens (the reference
          interface; golden-parity tests use it), or
        * (B, H, W, C) full maps — on TPU the qkv projection, window
          partitioning, attention and output projection all run in ONE
          Pallas kernel (weights resident in VMEM), so neither the qkv
          tensor nor the attention output ever touches HBM.
        """
        nh = self.num_heads
        c = x.shape[-1]
        hd = c // nh
        scale = hd ** -0.5
        n = self.window_size * self.window_size

        table = self.param(
            "relative_position_bias_table", trunc02,
            ((2 * self.window_size - 1) ** 2, nh), jnp.float32)
        rel_idx = relative_position_index(self.window_size).reshape(-1)

        def materialize():
            return table[rel_idx].reshape(n, n, nh).transpose(2, 0, 1)

        # Serving-path bias cache: the (nh, N, N) materialization is a
        # gather XLA re-executes every call (~1.9 ms for stage-3's
        # 1M-row index at batch 64). Eval refreshes a "bias_cache"
        # collection once per weight load (evaluate.cache_rel_bias) and
        # every subsequent step reads the cached tensor; training and
        # cache-less applies keep the differentiable gather.
        if (self.has_variable("bias_cache", "rel_bias")
                or self.is_mutable_collection("bias_cache")):
            bias = self.variable("bias_cache", "rel_bias",
                                 materialize).value
        else:
            bias = materialize()                              # (nh,N,N)

        dt = self.dtype
        wqkv, bqkv = DenseParams(3 * c, self.qkv_bias, name="qkv")(c)
        wp, bp = DenseParams(c, True, name="proj")(c)
        bqkv = (bqkv if bqkv is not None
                else jnp.zeros((3 * c,), jnp.float32))

        if params_only:
            # raw weights + materialized bias for the caller's megakernel
            return bias, wqkv, bqkv, wp, bp

        if x.ndim == 4:
            from ..pallas.window_attention import block_attention_nhwc
            return block_attention_nhwc(
                x, wqkv.astype(dt), bqkv.astype(dt), wp.astype(dt),
                bp.astype(dt), bias.astype(jnp.float32),
                None if mask is None else mask, self.window_size, nh,
                scale, ln=ln)

        from ..pallas.window_attention import window_attention_core
        if ln is not None:
            from ..pallas.layernorm import layernorm
            x = layernorm(x, ln[0], ln[1])
        qkv = x @ wqkv.astype(dt) + bqkv.astype(dt)
        nw = mask.shape[0] if mask is not None else 1
        out = window_attention_core(
            qkv, bias.astype(jnp.float32),
            None if mask is None else mask, nw, nh, scale)
        return out @ wp.astype(dt) + bp.astype(dt)


class Mlp(nn.Module):
    """Dual-mode MLP (backbone_vit.py:863-908).

    linear=True: fc(hidden) -> GELU -> fc(out).
    linear=False ("enhanced" conv branch): fc(dim->dim) -> 2x2 conv over the
    (H, W) token grid with bottom/right pad -> GELU -> fc(out). Note the conv
    path has no expansion: fc1 keeps the channel count (parity quirk).
    """

    hidden: int
    out: int
    linear: bool = True
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, hw: tuple[int, int],
                 params_only: bool = False):
        c_in = x.shape[-1]
        if params_only:
            # raw weights for the caller's megakernel; same param tree as
            # the nn.Dense/nn.Conv modules of the compute path
            if self.linear:
                w1, b1 = DenseParams(self.hidden, name="fc1")(c_in)
                w2, b2 = DenseParams(self.out, name="fc2")(self.hidden)
                return w1, b1, None, w2, b2
            w1, b1 = DenseParams(c_in, name="fc1")(c_in)
            wc, bc = ConvParams(c_in, (2, 2), name="conv1")(c_in)
            w2, b2 = DenseParams(self.out, name="fc2")(c_in)
            return w1, b1, (wc, bc), w2, b2
        if self.linear:
            x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
            x = gelu(x)
            return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)
        h, w = hw
        tokens_in = x.ndim == 3  # (B, L, C) compat; fast path is NHWC
        b = x.shape[0]
        x = nn.Dense(c_in, dtype=self.dtype, name="fc1")(x)
        if tokens_in:
            x = x.reshape(b, h, w, c_in)
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        x = nn.Conv(c_in, (2, 2), padding="VALID", use_bias=True,
                    dtype=self.dtype, name="conv1")(x)
        if tokens_in:
            x = x.reshape(b, h * w, c_in)
        x = gelu(x)
        return nn.Dense(self.out, dtype=self.dtype, name="fc2")(x)


class SwinBlock(nn.Module):
    """Swin transformer block (backbone_vit.py:1011-1130), tokens (B, H*W, C)."""

    dim: int
    input_resolution: tuple[int, int]
    num_heads: int
    window_size: int = 7
    shift_size: int = 0
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    linear_mlp: bool = True
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        h, w = self.input_resolution
        ws, shift = self.window_size, self.shift_size
        if min(h, w) <= ws:
            # window covers the map: global attention over ONE padded
            # window. ws itself stays fixed (the rel-pos table shape is
            # (2ws-1)^2 — shrinking it would make params image-size-
            # dependent and break loading a 512-trained checkpoint at
            # other sizes, e.g. val.py --task study); the map pads up to
            # ws below, the reference window_partition's pad-to-multiple
            # semantics (backbone_vit.py:619-672).
            shift = 0
        assert 0 <= shift < ws
        # pad to a window multiple (reference pads with zeros AFTER norm1
        # and crops after attention). Shifted blocks at a padded size use
        # the mask of the PADDED map — the pad behaves as image border;
        # the reference has no defined behavior here (its masks are
        # precomputed for the 512 grid and it crashes off-config).
        ph, pw = (-h) % ws, (-w) % ws

        # NHWC-native fast path: carrying (B, H, W, C) through the whole
        # block keeps every dot/conv/LN in one feature-minor layout (mixing
        # (B, L, C) dots with NHWC convs made XLA pick token-minor GEMM
        # layouts + relayout copies, measured at ~125 GB/s effective).
        tokens_in = x.ndim == 3
        if tokens_in:
            b, l, c = x.shape
            assert l == h * w, (l, h, w)
            x = x.reshape(b, h, w, c)
        b, _, _, c = x.shape

        attn_mod = WindowAttention(self.dim, ws, self.num_heads,
                                   self.qkv_bias, dtype=self.dtype,
                                   name="attn")
        mlp_mod = Mlp(hidden=int(self.dim * self.mlp_ratio), out=self.dim,
                      linear=self.linear_mlp, dtype=self.dtype, name="mlp")
        mask = (shift_attn_mask(h + ph, w + pw, ws, shift)
                if shift > 0 else None)

        # Megakernel fast paths (round 3): the whole block — LN1, qkv,
        # attention, projection, both residuals, LN2, MLP — runs in one
        # or two Pallas kernels; only the block input/output touch HBM.
        dt = self.dtype
        # the megakernels are sized for bf16 residents: in f32
        # (--no-bf16) the VMEM footprint doubles and the c=384 stage-2
        # kernel exceeds the 16 MB scoped-vmem limit at compile time
        # (observed r5); f32 runs take the XLA path instead.
        on_tpu = kernels_enabled() and dt == jnp.bfloat16
        # c gate: at c=384 (flagship stage 2) the megakernel Mosaic compile
        # was observed pathological on this rig (wedges the shared remote
        # compile queue); stage 2 keeps the round-2 fused-attention path
        # until a safe compile is demonstrated. Stage 1 (c=192, 4x the
        # pixels) is where the time is.
        fast = (on_tpu and ws * ws <= 256 and h % ws == 0 and w % ws == 0
                and c <= 256)
        scale = (c // self.num_heads) ** -0.5
        if fast and shift == 0 and self.linear_mlp:
            from ..pallas.swin_block import fused_swin_block
            lns1, lnb1 = LNParams(name="norm1")(c)
            lns2, lnb2 = LNParams(name="norm2")(c)
            bias, wqkv, bqkv, wp, bp = attn_mod(x, params_only=True)
            w1, b1, _, w2, b2 = mlp_mod(x, (h, w), params_only=True)
            from ..pallas import int8_enabled
            out = fused_swin_block(
                x, lns1, lnb1, wqkv.astype(dt), bqkv.astype(dt),
                wp.astype(dt), bp.astype(dt), lns2, lnb2, w1.astype(dt),
                b1.astype(dt), w2.astype(dt), b2.astype(dt), bias, ws,
                self.num_heads, scale, int8_enabled())
            return out.reshape(b, h * w, c) if tokens_in else out
        if fast and not self.linear_mlp:
            from ..pallas.window_attention import fused_block_attention_ln
            from ..pallas.swin_block import fused_conv_mlp_tail
            lns1, lnb1 = LNParams(name="norm1")(c)
            lns2, lnb2 = LNParams(name="norm2")(c)
            bias, wqkv, bqkv, wp, bp = attn_mod(x, params_only=True)
            w1, b1, (wc, bc), w2, b2 = mlp_mod(x, (h, w), params_only=True)
            # shift folds into the kernels: the attention kernel assembles
            # shifted row-strips in VMEM and the tail kernel un-shifts
            # while reading — no jnp.roll ever materializes in HBM
            # (4 rolls/block, ~1.6 ms each at flagship stage-1 batch 64)
            from ..pallas import int8_enabled
            q8 = int8_enabled()
            a = fused_block_attention_ln(
                x, lns1, lnb1, wqkv.astype(dt), bqkv.astype(dt),
                wp.astype(dt), bp.astype(dt), bias, mask, ws,
                self.num_heads, scale, shift, q8)
            out = fused_conv_mlp_tail(
                x, a, lns2, lnb2, w1.astype(dt), b1.astype(dt),
                wc.astype(dt), bc.astype(dt), w2.astype(dt), b2.astype(dt),
                shift, q8)
            return out.reshape(b, h * w, c) if tokens_in else out

        # c>256-safe kernel split (round 4, flagship stage 2 at c=384):
        # in-kernel LN at c=384 is Mosaic-compile-pathological (see
        # ARCHITECTURE.md), so the LayerNorms stay OUTSIDE (standalone
        # LN kernels compile fine at any c) and the GEMM-dense halves
        # run as no-LN Pallas kernels: LN1 -> fused attention (shift
        # folded in VMEM) -> un-shift roll -> fused add+LN2 -> fused
        # MLP tail (+ both residuals in-kernel).
        fast384 = (on_tpu and ws * ws <= 256 and h % ws == 0
                   and w % ws == 0 and c > 256)
        if fast384:
            from ..pallas import int8_enabled
            from ..pallas.window_attention import fused_block_attention
            from ..pallas.swin_block import (fused_mlp_tail,
                                             fused_conv_mlp_tail_noln)
            q8 = int8_enabled()
            bias, wqkv, bqkv, wp, bp = attn_mod(x, params_only=True)
            x1 = FusedLayerNorm(dtype=dt, name="norm1")(x)
            a = fused_block_attention(
                x1, wqkv.astype(dt), bqkv.astype(dt), wp.astype(dt),
                bp.astype(dt), bias.astype(jnp.float32), mask, ws,
                self.num_heads, scale, shift, q8)
            if shift:
                a = jnp.roll(a, (shift, shift), (1, 2))
            s, y = FusedAddLayerNorm(dtype=dt, name="norm2")(x, a)
            if self.linear_mlp:
                w1, b1, _, w2, b2 = mlp_mod(x, (h, w), params_only=True)
                out = fused_mlp_tail(s, y, w1.astype(dt), b1.astype(dt),
                                     w2.astype(dt), b2.astype(dt), q8)
            else:
                w1, b1, (wc, bc), w2, b2 = mlp_mod(x, (h, w),
                                                   params_only=True)
                out = fused_conv_mlp_tail_noln(
                    s, y, w1.astype(dt), b1.astype(dt), wc.astype(dt),
                    bc.astype(dt), w2.astype(dt), b2.astype(dt), q8)
            return out.reshape(b, h * w, c) if tokens_in else out

        shortcut = x
        # Note: folding norm1 into the fused attention kernel was measured
        # net-NEGATIVE when the rest of the block stayed in XLA (+7 ms at
        # batch 64): XLA amortizes the LN into neighboring fusions. The
        # megakernel paths above fold it profitably because there are no
        # XLA neighbors left; this fallback keeps the XLA LN.
        x = FusedLayerNorm(dtype=self.dtype, name="norm1")(x)
        if ph or pw:  # pad first so the shift roll + mask see one map
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
        # NHWC path: the attention module partitions windows inside the
        # fused kernel (no HBM partition/unpartition copies)
        x = attn_mod(x, mask)
        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        if ph or pw:
            x = x[:, :h, :w]

        # residual add + norm2 fused into one HBM pass
        x, y = FusedAddLayerNorm(dtype=self.dtype, name="norm2")(shortcut, x)
        y = mlp_mod(y, (h, w))
        out = x + y
        return out.reshape(b, h * w, c) if tokens_in else out


class _PatchReduction(nn.Module):
    """Linear(4C->2C) over the 2x2 neighborhood, applied as ONE stride-2
    conv instead of four strided slices + a 4C concat + a Dense.

    The parameter stays the reference's Linear kernel (4C, 2C) — same path
    (`reduction/kernel`), same init, checkpoint/torch-import compatible —
    and is reordered to HWIO at trace time. The math is identical
    (concat4 @ W == conv2x2s2 with W's rows scattered to window taps); what
    changes is the lowering: the strided slices each materialized an HBM
    layout copy and the concat a (B,H/2,W/2,4C) intermediate, while the
    conv reads x once, NHWC, straight onto the MXU.
    """

    features: int
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):  # (B, H, W, C) NHWC
        c = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (4 * c, self.features), jnp.float32)
        # reference row order [x(0::2,0::2); x(1::2,0::2); x(0::2,1::2);
        # x(1::2,1::2)] (backbone_vit.py:846-850): row block p = 2*dw + dh
        # -> reshape to (dw, dh, C, out), transpose to HWIO (dh, dw, C, out)
        k = kernel.reshape(2, 2, c, self.features).transpose(1, 0, 2, 3)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), k.astype(self.dtype),
            window_strides=(2, 2), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class PatchMerging(nn.Module):
    """2x2 space-to-depth + Linear(4C->2C) + LN (backbone_vit.py:823-860)."""

    dim: int
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, hw: tuple[int, int]):
        h, w = hw
        tokens_in = x.ndim == 3  # (B, L, C) compat; fast path is NHWC
        b, c = x.shape[0], x.shape[-1]
        assert h % 2 == 0 and w % 2 == 0
        if tokens_in:
            assert x.shape[1] == h * w
            x = x.reshape(b, h, w, c)
        x = _PatchReduction(2 * self.dim, dtype=self.dtype,
                            name="reduction")(x)
        x = FusedLayerNorm(dtype=self.dtype, name="norm")(x)
        return x.reshape(b, (h // 2) * (w // 2), 2 * self.dim) \
            if tokens_in else x


class PatchEmbed(nn.Module):
    """Conv projection to BHWC tokens (backbone_vit.py:742-773)."""

    embed_dim: int
    kernel: tuple[int, int] = (16, 16)
    stride: tuple[int, int] = (16, 16)
    padding: tuple[int, int] = (1, 1)
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        p = self.padding
        return nn.Conv(self.embed_dim, self.kernel, strides=self.stride,
                       padding=[(p[0], p[0]), (p[1], p[1])], use_bias=True,
                       dtype=self.dtype, name="proj")(x)
