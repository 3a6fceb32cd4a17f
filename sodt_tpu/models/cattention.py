"""Cross-channel attention fusion (the paper's core contribution).

Re-design of CAttentionBlock / CAttention from
/root/reference/basics/models/backbone_vit.py:407-616: four projection-free
multi-head cross-attention units chained over the per-channel token maps
(r<-g, g<-b, b<-ir, ir<-g) with residual + LayerNorm per channel.

Parity quirks reproduced deliberately:
  * CAttention has NO qkv/out projections — raw Q.K^T softmax V with head
    split/merge only (backbone_vit.py:566-616).
  * the additive shift mask is applied BEFORE the 1/sqrt(d) scaling
    (backbone_vit.py:600-609), so the mask value is effectively scaled too.
  * the live configuration uses window_size=1 / shift_size=0: every window
    holds a single token, so softmax over one logit is 1 and the attention
    output equals V exactly. We exploit that as a zero-FLOP fast path — the
    result is bitwise the mathematical limit of the general path — giving
    x_r = LN(r + g), x_g = LN(g + b), x_b = LN(b + ir), x_ir = LN(ir + g).
    The general windowed path is kept for window_size > 1 configurations.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .swin import window_partition, window_unpartition, shift_attn_mask

DType = Any


class CAttention(nn.Module):
    """Projection-free multi-head cross attention over window tokens.

    q, k, v: (B_, N, C). Returns (B_, N, C).
    """

    num_heads: int = 8
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        b_, n, c = q.shape
        nh = self.num_heads
        hd = c // nh

        def split(x):
            return x.reshape(b_, n, nh, hd).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        attn = jnp.einsum("bhnd,bhmd->bhnm", qh, kh,
                          preferred_element_type=jnp.float32)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(b_ // nw, nw, nh, n, n)
            attn = attn + jnp.asarray(mask, attn.dtype)[None, :, None]
            attn = attn.reshape(b_, nh, n, n)
        # parity quirk: scale applied after the mask add
        attn = attn / jnp.sqrt(jnp.asarray(hd, attn.dtype))
        attn = jax.nn.softmax(attn, axis=-1).astype(self.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, vh.astype(self.dtype))
        return out.transpose(0, 2, 1, 3).reshape(b_, n, c)


class CAttentionBlock(nn.Module):
    """Pairwise cross-channel fusion over 4 channel token maps (NHWC each).

    Reference backbone_vit.py:407-561. Inputs/outputs: four (B, H, W, C)
    maps (r, g, b, ir).
    """

    embedding_dim: int
    num_heads: int
    window_size: int = 1
    shift_size: int = 0
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, r, g, b, ir):
        bsz, h, w, c = r.shape
        ws, shift = self.window_size, self.shift_size

        if ws == 1 and shift == 0:
            # exact fast path: single-token windows make attention = identity
            # on V (softmax over one logit), so each unit returns its V input.
            r_out, g_out, b_out, ir_out = g, b, ir, g
        else:
            def part(x):
                if shift > 0:
                    x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
                return window_partition(x, ws)

            def unpart(xw):
                x = window_unpartition(xw, ws, (h, w))
                if shift > 0:
                    x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
                return x

            mask = shift_attn_mask(h, w, ws, shift) if shift > 0 else None
            rw, gw, bw, irw = part(r), part(g), part(b), part(ir)
            att = lambda name: CAttention(self.num_heads, dtype=self.dtype,
                                          name=name)
            r_out = unpart(att("r2g_attn")(rw, gw, gw, mask))
            g_out = unpart(att("rg2b_attn")(gw, bw, bw, mask))
            b_out = unpart(att("rgb2ir_attn")(bw, irw, irw, mask))
            ir_out = unpart(att("ir2rgb_attn")(irw, gw, gw, mask))

        from .norm import FusedLayerNorm
        ln = lambda name: FusedLayerNorm(dtype=self.dtype, name=name)
        return (ln("norm1")(r + r_out), ln("norm2")(g + g_out),
                ln("norm3")(b + b_out), ln("norm4")(ir + ir_out))
