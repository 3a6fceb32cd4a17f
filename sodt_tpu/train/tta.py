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
    ph = math.ceil(nh / gs) * gs
    pw = math.ceil(nw / gs) * gs
    return nh, nw, ph, pw


def scale_img(img: jax.Array, ratio: float, gs: int = 32) -> jax.Array:
    """Resize by ratio then zero-pad to gs multiple (torch_utils scale_img)."""
    b, h, w, c = img.shape
    if ratio == 1.0:
        return img
    nh, nw, ph, pw = scale_img_shape(h, w, ratio, gs)
    out = jax.image.resize(img, (b, nh, nw, c), method="bilinear")
    return jnp.pad(out, ((0, 0), (0, ph - nh), (0, pw - nw), (0, 0)),
                   constant_values=0.447)


def tta_forward(model, variables, img: jax.Array, ir: jax.Array,
                gs: int = 32):
    """Augmented inference: returns concatenated decoded predictions
    (B, sum_i Ni, no) in the ORIGINAL image's pixel space."""
    anchors = np.asarray(model.spec.anchors, np.float32).reshape(
        len(model.spec.anchors), -1, 2)
    strides = model.spec.detect_strides
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
