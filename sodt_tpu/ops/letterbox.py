"""Letterbox geometry + device-side letterbox resize.

The geometry math mirrors the reference `letterbox` in
/root/reference/basics/utils/datasets.py:1151-1181 (ratio = min(new/old),
optional no-scaleup, symmetric padding split, pad value 114), but the image
resampling itself runs on device as a jitted XLA op instead of cv2 on the
host, per the TPU-first data-path design.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def letterbox_params(shape_hw, new_shape_hw, *, auto: bool = False,
                     scale_fill: bool = False, scaleup: bool = True,
                     stride: int = 32):
    """Compute (ratio, new_unpad_hw, (dw, dh)) for letterboxing.

    Pure-python math on static shapes (used for cache keys and label
    transforms). `dw`/`dh` are the *total* pad split in half on each side,
    matching reference datasets.py:1162-1175.
    """
    h0, w0 = shape_hw
    if isinstance(new_shape_hw, int):
        new_shape_hw = (new_shape_hw, new_shape_hw)
    nh, nw = new_shape_hw

    r = min(nh / h0, nw / w0)
    if not scaleup:
        r = min(r, 1.0)
    ratio = (r, r)
    new_unpad = (int(round(w0 * r)), int(round(h0 * r)))  # (w, h)
    dw, dh = nw - new_unpad[0], nh - new_unpad[1]
    if auto:  # minimum rectangle: pad only to stride multiple
        dw, dh = dw % stride, dh % stride
    elif scale_fill:
        dw, dh = 0.0, 0.0
        new_unpad = (nw, nh)
        ratio = (nw / w0, nh / h0)
    dw /= 2
    dh /= 2
    return ratio, new_unpad, (dw, dh)


def letterbox_image(img: jax.Array, new_shape_hw, *, scaleup: bool = True,
                    pad_value: float = 114.0) -> jax.Array:
    """Letterbox an HWC image on device to a fixed (H, W) output.

    The input spatial shape must be static (known at trace time); output is
    always exactly `new_shape_hw`, so downstream stays fixed-shape under jit.
    """
    h0, w0, c = img.shape
    if isinstance(new_shape_hw, int):
        new_shape_hw = (new_shape_hw, new_shape_hw)
    nh, nw = new_shape_hw
    (_, _), (uw, uh), (dw, dh) = _unpack(letterbox_params(
        (h0, w0), new_shape_hw, scaleup=scaleup))

    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))

    resized = img
    if (uh, uw) != (h0, w0):
        resized = jax.image.resize(img.astype(jnp.float32), (uh, uw, c),
                                   method="linear")
    out = jnp.pad(
        resized.astype(jnp.float32),
        ((top, bottom), (left, right), (0, 0)),
        constant_values=pad_value,
    )
    assert out.shape == (nh, nw, c), (out.shape, (nh, nw, c))
    return out


def _unpack(params):
    ratio, new_unpad, dwdh = params
    return (ratio, ratio), (new_unpad[0], new_unpad[1]), dwdh


def letterbox_image_np(img, new_shape_hw, *, scaleup: bool = True,
                       pad_value: int = 114):
    """Host-side uint8 letterbox with the same geometry as
    `letterbox_image` (same letterbox_params, same round(d±0.1) split).

    For feed paths that keep images on the host until one uint8 batch
    upload (rect eval): the device variant would cost an f32 upload +
    per-shape dispatch + download per image on a remote-attached chip.
    """
    import numpy as np
    h0, w0 = img.shape[:2]
    if isinstance(new_shape_hw, int):
        new_shape_hw = (new_shape_hw, new_shape_hw)
    (_, _), (uw, uh), (dw, dh) = _unpack(letterbox_params(
        (h0, w0), new_shape_hw, scaleup=scaleup))
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    resized = np.asarray(img)
    if (uh, uw) != (h0, w0):
        from PIL import Image
        resized = np.asarray(Image.fromarray(
            np.asarray(img, np.uint8)).resize((uw, uh), Image.BILINEAR))
    out = np.pad(resized, ((top, bottom), (left, right), (0, 0)),
                 constant_values=pad_value)
    assert out.shape[:2] == tuple(new_shape_hw)
    return out.astype(np.uint8)
