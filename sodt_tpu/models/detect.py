"""Anchor-based YOLO Detect head + grid decode, NHWC / fixed-shape.

Re-design of the reference Detect module (/root/reference/basics/models/
model.py:32-70): per-scale 1x1 conv to na*(nc+5) channels, then at inference
the sigmoid grid decode

    xy = (sigma*2 - 0.5 + grid) * stride
    wh = (sigma*2)^2 * anchor_pixels

The reference mutates buffers and returns training/inference variants from
one forward; here the conv and the decode are split into a linen module and
a pure function so the decode can fuse into the jitted eval graph and the
train path carries no dead decode code.

Bias init reproduces reference Model._initialize_biases (model.py:299-307):
obj bias log(8/(640/stride)^2), cls bias log(0.6/(nc-0.99)).
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def detect_bias_init(nc: int, stride: float):
    """Per-anchor bias vector [x,y,w,h,obj,cls...] (model.py:299-307)."""
    def init(key, shape, dtype=jnp.float32):
        na = shape[0] // (nc + 5)
        b = jnp.zeros((na, nc + 5), dtype)
        b = b.at[:, 4].add(math.log(8 / (640 / stride) ** 2))
        b = b.at[:, 5:].add(math.log(0.6 / (nc - 0.99)))
        return b.reshape(shape)
    return init


class Detect(nn.Module):
    """Per-scale 1x1 output convs. Input: list of NHWC features.

    Output: list of (B, ny, nx, na, no) raw logits per scale.
    """

    nc: int
    anchors: tuple  # ((w,h)*na per level, ...) in input pixels
    strides: tuple  # per-level stride, static
    dtype: Any = jnp.float32

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @nn.compact
    def __call__(self, xs: Sequence[jax.Array], train: bool = False):
        assert len(xs) == self.nl, (len(xs), self.nl)
        outs = []
        for i, x in enumerate(xs):
            y = nn.Conv(self.no * self.na, (1, 1), use_bias=True,
                        bias_init=detect_bias_init(self.nc, self.strides[i]),
                        dtype=self.dtype, name=f"m{i}")(x)
            b, ny, nx, _ = y.shape
            # (B, ny, nx, na, no); the reference uses (B, na, ny, nx, no) —
            # keeping anchors minor-adjacent to channels is layout-friendly
            # on TPU and only permutes the flattened candidate order.
            outs.append(y.reshape(b, ny, nx, self.na, self.no))
        return outs


def anchor_grid(anchors_level: jax.Array, ny: int, nx: int, stride: float):
    """Broadcast helpers for one level: grid (ny,nx,1,2), anchors (na,2)."""
    yv, xv = jnp.meshgrid(jnp.arange(ny, dtype=jnp.float32),
                          jnp.arange(nx, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xv, yv], axis=-1)[:, :, None, :]  # (ny,nx,1,2)
    return grid


def decode_detections(outs: Sequence[jax.Array], anchors: Sequence,
                      strides: Sequence[float]) -> jax.Array:
    """Decode raw per-scale logits to (B, total, no) pixel-space predictions.

    Matches reference Detect.forward inference branch (model.py:57-65).
    `anchors` are in input pixels per level, shape (na, 2) each.
    """
    zs = []
    for out, anc, s in zip(outs, anchors, strides):
        b, ny, nx, na, no = out.shape
        y = jax.nn.sigmoid(out.astype(jnp.float32))
        grid = anchor_grid(None, ny, nx, s)
        anc = jnp.asarray(anc, jnp.float32).reshape(1, 1, 1, na, 2)
        xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * s
        wh = (y[..., 2:4] * 2.0) ** 2 * anc
        z = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
        zs.append(z.reshape(b, ny * nx * na, no))
    return jnp.concatenate(zs, axis=1)
