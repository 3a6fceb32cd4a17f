"""Test-time-augmented inference (reference Model.forward augment branch,
/root/reference/basics/models/model.py:156-184).

Three passes — identity, lr-flip @ 0.83x, 0.67x — each jitted at its own
static shape; box de-scaling and de-flipping match the reference. scale_img
pads to stride multiples with the reference's 0.447 gray (torch_utils.py
scale_img).
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from ..models.detect import decode_detections

TTA_SCALES = (1.0, 0.83, 0.67)
TTA_FLIPS = (None, 3, None)  # 3 = left-right (reference encoding)


def scale_img_shape(h: int, w: int, ratio: float, gs: int = 32):
    nh, nw = int(h * ratio), int(w * ratio)
    # pad target from the UNROUNDED product (torch_utils.py:258 computes
    # ceil(x * ratio / gs) before the int() truncation of the resize size)
    ph = math.ceil(h * ratio / gs) * gs
    pw = math.ceil(w * ratio / gs) * gs
    return nh, nw, ph, pw


def _bilinear_resize(img: jax.Array, nh: int, nw: int) -> jax.Array:
    """torch F.interpolate(mode='bilinear', align_corners=False) parity:
    a pure 4-tap sample at half-pixel centers with edge clamping.
    (jax.image.resize antialiases on downscale — different math.)"""
    b, h, w, c = img.shape
    ys = (jnp.arange(nh, dtype=jnp.float32) + 0.5) * (h / nh) - 0.5
    xs = (jnp.arange(nw, dtype=jnp.float32) + 0.5) * (w / nw) - 0.5
    y0f = jnp.floor(ys)
    x0f = jnp.floor(xs)
    fy = (ys - y0f)[None, :, None, None]
    fx = (xs - x0f)[None, None, :, None]
    y0 = jnp.clip(y0f.astype(jnp.int32), 0, h - 1)
    y1 = jnp.clip(y0f.astype(jnp.int32) + 1, 0, h - 1)
    x0 = jnp.clip(x0f.astype(jnp.int32), 0, w - 1)
    x1 = jnp.clip(x0f.astype(jnp.int32) + 1, 0, w - 1)
    top = img[:, y0][:, :, x0] * (1 - fx) + img[:, y0][:, :, x1] * fx
    bot = img[:, y1][:, :, x0] * (1 - fx) + img[:, y1][:, :, x1] * fx
    return top * (1 - fy) + bot * fy


def scale_img(img: jax.Array, ratio: float, gs: int = 32) -> jax.Array:
    """Resize by ratio then zero-pad to gs multiple (torch_utils scale_img)."""
    b, h, w, c = img.shape
    if ratio == 1.0:
        return img
    nh, nw, ph, pw = scale_img_shape(h, w, ratio, gs)
    out = _bilinear_resize(img, nh, nw)
    return jnp.pad(out, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)),
                   constant_values=0.447)


def tta_forward(model, variables, img: jax.Array, ir: jax.Array,
                gs: int | None = None):
    """Augmented inference: returns concatenated decoded predictions
    (B, sum_i Ni, no) in the ORIGINAL image's pixel space.

    gs defaults to max(32, max Detect stride). The reference passes
    `gs=int(self.stride.max())` (model.py:162), but its hardcoded stride
    [4.] (model.py:130) makes scale_img pad to 4-multiples, which crashes
    any network with deeper internal downsampling (e.g. SRyolo_PF's /16
    trunk at scale 0.83: 216 px -> fractional grids) — in the reference
    itself too. 32 is scale_img's own default and the yolov5 convention."""
    anchors = np.asarray(model.spec.anchors, np.float32).reshape(
        len(model.spec.anchors), -1, 2)
    strides = model.spec.detect_strides
    if gs is None:
        gs = max(32, int(max(strides)))
    h, w = img.shape[1:3]

    outs = []
    for si, fi in zip(TTA_SCALES, TTA_FLIPS):
        xi = jnp.flip(img, axis=2) if fi == 3 else img
        ii = jnp.flip(ir, axis=2) if fi == 3 else ir
        xi = scale_img(xi, si, gs)
        ii = scale_img(ii, si, gs)
        out = model.apply(variables, xi, ii, train=False)
        y = decode_detections(out["raw"], anchors, strides)
        y = y.at[..., :4].set(y[..., :4] / si)  # de-scale
        if fi == 2:
            y = y.at[..., 1].set(h - y[..., 1])  # de-flip ud
        elif fi == 3:
            y = y.at[..., 0].set(w - y[..., 0])  # de-flip lr
        outs.append(y)
    return jnp.concatenate(outs, axis=1)
