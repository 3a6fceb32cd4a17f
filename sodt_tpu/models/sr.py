"""Super-resolution auxiliary branch (training-only, dropped at inference).

Re-design of the reference SR stack:
  * DeepLab wrapper      /root/reference/basics/models/deeplabedsr.py:36-76
  * Decoder (no BN/drop) /root/reference/basics/models/sr_decoder_noBN_noD.py:6-47
  * EDSR                 /root/reference/basics/models/edsr.py:14-121

Graph: Decoder fuses a low-level tap (c1 ch) with a high-level tap (c2 ch):
1x1 convs halve both, bilinear-resize the high-level map to
low_level_size * (factor//2) (and the low-level map too when factor > 1),
concat, 3-conv head to 64ch. EDSR then: 3x3 head conv -> 16 residual blocks
-> x8 pixel-shuffle upsampler -> 3x3 conv to the output channel count.
The wrapper hardcodes the EDSR scale to 8 regardless of `factor`
(deeplabedsr.py:46) — reproduced.

NHWC; pixel shuffle via einops-style reshape (depth-to-space).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

DType = Any


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """NHWC depth-to-space matching torch.nn.PixelShuffle channel order.

    torch PixelShuffle on NCHW views channels as (C, r, r); in NHWC that is
    a reshape to (..., C_out, r, r) then interleave.
    """
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, r, w, r, co
    return x.reshape(b, h * r, w * r, co)


class SRDecoder(nn.Module):
    """Feature-fusion decoder (sr_decoder_noBN_noD.py:6-47)."""

    c1: int
    c2: int
    factor: int = 2
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, low_level_feat, train: bool = False):
        low = nn.Conv(self.c1 // 2, (1, 1), use_bias=False, dtype=self.dtype,
                      name="conv1")(low_level_feat)
        low = jax.nn.relu(low)
        x = nn.Conv(self.c2 // 2, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv2")(x)
        x = jax.nn.relu(x)

        b, lh, lw, _ = low.shape
        th, tw = lh * (self.factor // 2), lw * (self.factor // 2)
        x = jax.image.resize(x, (x.shape[0], th, tw, x.shape[-1]),
                             method="linear")
        if self.factor > 1:
            low = jax.image.resize(low, (b, th, tw, low.shape[-1]),
                                   method="linear")
        y = jnp.concatenate([x, low], axis=-1)
        y = nn.Conv(256, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="last_conv0")(y)
        y = jax.nn.relu(y)
        y = nn.Conv(128, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                    dtype=self.dtype, name="last_conv1")(y)
        y = jax.nn.relu(y)
        return nn.Conv(64, (1, 1), use_bias=True, dtype=self.dtype,
                       name="last_conv2")(y)


class EDSR(nn.Module):
    """EDSR super-resolver (edsr.py:55-108): head -> 16 ResBlocks -> x`scale`."""

    num_channels: int = 3
    input_channel: int = 64
    scale: int = 8
    width: int = 64
    depth: int = 16
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda c, name: nn.Conv(c, (3, 3), padding=[(1, 1), (1, 1)],
                                       use_bias=True, dtype=self.dtype,
                                       name=name)
        x = conv(self.width, "head")(x)
        res = x
        for i in range(self.depth):
            y = conv(self.width, f"body{i}_0")(res)
            y = jax.nn.relu(y)
            y = conv(self.width, f"body{i}_1")(y)
            res = res + y
        res = conv(self.width, "body_out")(res)
        x = x + res
        # tail: pixel-shuffle upsampler (scale must be a power of two here)
        s, k = self.scale, 0
        while s > 1:
            x = conv(4 * self.width, f"tail_up{k}")(x)
            x = pixel_shuffle(x, 2)
            s //= 2
            k += 1
        return conv(self.num_channels, "tail_out")(x)


class DeepLabSR(nn.Module):
    """SR wrapper: Decoder + EDSR(x8) (deeplabedsr.py:36-76).

    Called with (low_level_feat, x) = (y[l1], y[l2]) like the reference
    `model_up(y[l1], y[l2])` (model.py:291).
    """

    out_ch: int
    c1: int = 128
    c2: int = 512
    factor: int = 2
    dtype: DType = jnp.float32

    @nn.compact
    def __call__(self, low_level_feat, x, train: bool = False):
        y = SRDecoder(self.c1, self.c2, self.factor, dtype=self.dtype,
                      name="sr_decoder")(x, low_level_feat, train)
        return EDSR(num_channels=self.out_ch, input_channel=64, scale=8,
                    dtype=self.dtype, name="edsr")(y, train)
