"""Box geometry primitives (pure JAX, fixed shapes, differentiable).

Semantics match the reference implementation in
/root/reference/basics/utils/general.py:259-422 (xy conversions, IoU family)
including its numerical quirks (e.g. eps added only to box heights in
`bbox_iou`, reference general.py:366-367), so that loss values and eval
matching are bit-comparable. All functions are functional: they return new
arrays and never mutate, and they broadcast over arbitrary leading axes so
they can be vmapped/jitted freely.

Boxes use the last axis for coordinates: (..., 4).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def xyxy2xywh(x: jax.Array) -> jax.Array:
    """(..., 4) corner boxes [x1,y1,x2,y2] -> center boxes [cx,cy,w,h].

    Reference: general.py:259-266.
    """
    x1, y1, x2, y2 = jnp.split(x[..., :4], 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def xywh2xyxy(x: jax.Array) -> jax.Array:
    """(..., 4) center boxes [cx,cy,w,h] -> corner boxes [x1,y1,x2,y2].

    Reference: general.py:269-276.
    """
    cx, cy, w, h = jnp.split(x[..., :4], 4, axis=-1)
    hw, hh = w / 2, h / 2
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xywhn2xyxy(x: jax.Array, w: float = 640, h: float = 640,
               padw: float = 0, padh: float = 0) -> jax.Array:
    """Normalized center boxes -> pixel corner boxes with optional pad offset.

    Reference: general.py:279-286.
    """
    cx, cy, bw, bh = jnp.split(x[..., :4], 4, axis=-1)
    return jnp.concatenate(
        [
            w * (cx - bw / 2) + padw,
            h * (cy - bh / 2) + padh,
            w * (cx + bw / 2) + padw,
            h * (cy + bh / 2) + padh,
        ],
        axis=-1,
    )


def xyn2xy(x: jax.Array, w: float = 640, h: float = 640,
           padw: float = 0, padh: float = 0) -> jax.Array:
    """Normalized points -> pixel points. Reference: general.py:289-294."""
    px, py = jnp.split(x[..., :2], 2, axis=-1)
    return jnp.concatenate([w * px + padw, h * py + padh], axis=-1)


def clip_coords(boxes: jax.Array, img_hw: tuple[int, int]) -> jax.Array:
    """Clip xyxy boxes to image bounds (h, w). Reference: general.py:339-344."""
    h, w = img_hw
    x1 = jnp.clip(boxes[..., 0:1], 0, w)
    y1 = jnp.clip(boxes[..., 1:2], 0, h)
    x2 = jnp.clip(boxes[..., 2:3], 0, w)
    y2 = jnp.clip(boxes[..., 3:4], 0, h)
    rest = boxes[..., 4:]
    return jnp.concatenate([x1, y1, x2, y2, rest], axis=-1)


def scale_coords(img1_hw, coords: jax.Array, img0_hw, ratio_pad=None) -> jax.Array:
    """Undo letterboxing: map xyxy coords from img1 (network) space back to
    img0 (native) space, then clip. Reference: general.py:323-336.

    img1_hw/img0_hw: (h, w) python or traced scalars.
    ratio_pad: optional ((gain,), (padw, padh)).
    """
    if ratio_pad is None:
        gain = jnp.minimum(img1_hw[0] / img0_hw[0], img1_hw[1] / img0_hw[1])
        padw = (img1_hw[1] - img0_hw[1] * gain) / 2
        padh = (img1_hw[0] - img0_hw[0] * gain) / 2
    else:
        gain = ratio_pad[0][0]
        padw, padh = ratio_pad[1]

    x1 = (coords[..., 0:1] - padw) / gain
    y1 = (coords[..., 1:2] - padh) / gain
    x2 = (coords[..., 2:3] - padw) / gain
    y2 = (coords[..., 3:4] - padh) / gain
    rest = coords[..., 4:]
    out = jnp.concatenate([x1, y1, x2, y2, rest], axis=-1)
    return clip_coords(out, img0_hw)


def bbox_iou(box1: jax.Array, box2: jax.Array, *, xyxy: bool = True,
             giou: bool = False, diou: bool = False, ciou: bool = False,
             eps: float = 1e-7) -> jax.Array:
    """Elementwise IoU / GIoU / DIoU / CIoU between broadcastable box arrays.

    Inputs are (..., 4); output is (...). Matches reference general.py:347-389
    exactly, including: eps added only to heights when forming the union, the
    CIoU aspect-ratio term computed with atan, and alpha held out of the
    gradient (reference wraps it in torch.no_grad()).
    """
    if xyxy:
        b1_x1, b1_y1, b1_x2, b1_y2 = (box1[..., i] for i in range(4))
        b2_x1, b2_y1, b2_x2, b2_y2 = (box2[..., i] for i in range(4))
    else:
        b1_x1 = box1[..., 0] - box1[..., 2] / 2
        b1_x2 = box1[..., 0] + box1[..., 2] / 2
        b1_y1 = box1[..., 1] - box1[..., 3] / 2
        b1_y2 = box1[..., 1] + box1[..., 3] / 2
        b2_x1 = box2[..., 0] - box2[..., 2] / 2
        b2_x2 = box2[..., 0] + box2[..., 2] / 2
        b2_y1 = box2[..., 1] - box2[..., 3] / 2
        b2_y2 = box2[..., 1] + box2[..., 3] / 2

    inter_w = jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0)
    inter_h = jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0)
    inter = inter_w * inter_h

    # NB: eps on heights only — a deliberate parity quirk (general.py:366-367).
    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if not (giou or diou or ciou):
        return iou

    cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
    ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
    if ciou or diou:
        c2 = cw**2 + ch**2 + eps
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2
                + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
        if diou:
            return iou - rho2 / c2
        v = (4 / math.pi**2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
        alpha = jax.lax.stop_gradient(v / (v - iou + (1 + eps)))
        return iou - (rho2 / c2 + v * alpha)
    c_area = cw * ch + eps
    return iou - (c_area - union) / c_area


def box_iou(box1: jax.Array, box2: jax.Array) -> jax.Array:
    """Pairwise IoU matrix between (N,4) and (M,4) xyxy boxes -> (N,M).

    Reference: general.py:392-414.
    """
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = jnp.minimum(box1[:, None, 2:4], box2[None, :, 2:4])
    inter = jnp.prod(jnp.clip(rb - lt, 0), axis=2)
    return inter / (area1[:, None] + area2[None, :] - inter)


def wh_iou(wh1: jax.Array, wh2: jax.Array) -> jax.Array:
    """Pairwise IoU of (N,2) and (M,2) width/height boxes anchored at origin.

    Reference: general.py:417-422.
    """
    inter = jnp.prod(jnp.minimum(wh1[:, None, :], wh2[None, :, :]), axis=2)
    return inter / (jnp.prod(wh1, -1)[:, None] + jnp.prod(wh2, -1)[None, :] - inter)
