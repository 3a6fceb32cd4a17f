"""Device-side batched augmentation: mosaic, perspective, HSV, flips, mixup.

TPU-native replacement for the reference's cv2 per-sample CPU augmentation
(/root/reference/basics/utils/datasets.py:947-1324). On this host (one CPU
core feeding a TPU) cv2 workers would bottleneck the chip; instead every
transform here is a jitted, batched XLA program over uint8-scaled float
tensors with fixed shapes:

  * `random_perspective`: same matrix composition as the reference
    (M = T @ Sh @ R @ P @ C, datasets.py:1203-1235), same hyp ranges, same
    label corner-warp + box_candidates filter (datasets.py:1271-1278) —
    labels stay in fixed-capacity padded buffers with a validity mask
    instead of variable-length arrays.
  * `mosaic4`: 4-tile mosaic on a 2s x 2s canvas around a jittered center
    (datasets.py:999-1057) followed by random_perspective with border -s/2.
  * `hsv_augment`: float RGB<->HSV math replacing the uint8 LUT
    (datasets.py:980-996); applied to RGB only (parity quirk,
    datasets.py:869-871).
  * flips (both modalities) and mixup (beta(32, 32), datasets.py:830-835).

Geometry is applied identically to RGB and IR, as the reference warps both
modalities together.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------- sampling

def affine_sample(img: jax.Array, minv: jax.Array, out_hw: tuple[int, int],
                  pad_value: float = 114.0) -> jax.Array:
    """Bilinear-sample `img` (H, W, C) at out-grid coords mapped by `minv`.

    minv is the 3x3 *inverse* transform (output px -> input px). Out-of-
    bounds samples get `pad_value` (cv2 borderValue parity).
    """
    oh, ow = out_hw
    h, w, c = img.shape
    img = img.astype(jnp.float32)  # u8 tiles cast at the sampler, so the
    # mosaic paste upstream can run in uint8 (4x less HBM traffic)
    ys = jnp.arange(oh, dtype=jnp.float32)
    xs = jnp.arange(ow, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (oh, ow)
    ones = jnp.ones_like(gx)
    pts = jnp.stack([gx, gy, ones], axis=-1)             # (oh, ow, 3)
    src = pts @ minv.T                                   # (oh, ow, 3)
    sx = src[..., 0] / src[..., 2]
    sy = src[..., 1] / src[..., 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0

    def gather(yq, xq):
        inb = (xq >= 0) & (xq <= w - 1) & (yq >= 0) & (yq <= h - 1)
        xc = jnp.clip(xq, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yq, 0, h - 1).astype(jnp.int32)
        vals = img[yc, xc]                               # (oh, ow, C)
        return jnp.where(inb[..., None], vals, pad_value)

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    top = v00 * (1 - fx)[..., None] + v01 * fx[..., None]
    bot = v10 * (1 - fx)[..., None] + v11 * fx[..., None]
    return top * (1 - fy)[..., None] + bot * fy[..., None]


def _axis_weights(a, b, n_in: int, n_out: int):
    """Bilinear interpolation weights for 1-D resampling s = a*i + b.

    Returns (W (n_out, n_in) f32, cov (n_out,)) where W row o holds the
    two-tap weights of output sample o (zeroed where the tap falls out of
    bounds) and cov is the in-bounds weight mass (for constant-border
    blending). Built from comparisons against an iota — no gather."""
    s = a * jnp.arange(n_out, dtype=jnp.float32) + b
    i0 = jnp.floor(s)
    f = s - i0
    cols = jnp.arange(n_in, dtype=jnp.float32)[None, :]

    def tap(idx, w):
        inb = (idx >= 0) & (idx <= n_in - 1)
        return (cols == jnp.clip(idx, 0, n_in - 1)[:, None]) \
            * (w * inb)[:, None]

    w_mat = tap(i0, 1.0 - f) + tap(i0 + 1.0, f)
    return w_mat, w_mat.sum(axis=1)


def separable_affine_sample(img: jax.Array, minv: jax.Array,
                            out_hw: tuple[int, int],
                            pad_value: float = 114.0) -> jax.Array:
    """affine_sample for axis-aligned transforms (rotation = shear =
    perspective = 0 — the reference's default and paper hyps): the warp
    factorizes into per-axis 1-D resamples, so it runs as two dense
    matmuls on the MXU instead of 4 pointwise HBM gathers (the gathers
    are the augmentation hot spot on TPU: ~3x the cost of the whole
    fwd+bwd step at 512 px). Bit-equivalent to affine_sample for such
    matrices: out = Wy @ img @ Wx^T + pad * (1 - covy x covx).

    Callers must guarantee the STRUCTURE (minv[0,1] == minv[1,0] ==
    minv[2,0] == minv[2,1] == 0); the entries themselves stay traced."""
    oh, ow = out_hw
    h, w, _ = img.shape
    wy, covy = _axis_weights(minv[1, 1], minv[1, 2], h, oh)
    wx, covx = _axis_weights(minv[0, 0], minv[0, 2], w, ow)
    t1 = jnp.einsum("oh,hwc->owc", wy, img.astype(jnp.float32),
                    precision=jax.lax.Precision.HIGHEST)
    out = jnp.einsum("pw,owc->opc", wx, t1,
                     precision=jax.lax.Precision.HIGHEST)
    border = 1.0 - covy[:, None] * covx[None, :]
    return out + pad_value * border[..., None]


# ----------------------------------------------------- random perspective

class PerspectiveParams(NamedTuple):
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    perspective: float = 0.0


def compose_perspective_matrix(px, py, a_deg, s, shx_deg, shy_deg, tx, ty,
                               in_hw):
    """M = T @ Sh @ R @ P @ C from explicit draws, exactly as the reference
    composes it (datasets.py:1190-1235). R follows cv2.getRotationMatrix2D's
    sign convention: [[cos, sin], [-sin, cos]] * s."""
    ih, iw = in_hw
    # center: move image center to origin
    C = jnp.array([[1, 0, -iw / 2], [0, 1, -ih / 2], [0, 0, 1]], jnp.float32)
    P = jnp.eye(3)
    P = P.at[2, 0].set(px).at[2, 1].set(py)
    a = a_deg * math.pi / 180.0
    R = jnp.array([[jnp.cos(a) * s, jnp.sin(a) * s, 0],
                   [-jnp.sin(a) * s, jnp.cos(a) * s, 0],
                   [0, 0, 1]], jnp.float32)
    shx = jnp.tan(shx_deg * math.pi / 180.0)
    shy = jnp.tan(shy_deg * math.pi / 180.0)
    Sh = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    Sh = Sh.at[0, 1].set(shx).at[1, 0].set(shy)
    T = jnp.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    T = T.at[0, 2].set(tx).at[1, 2].set(ty)
    return T @ Sh @ R @ P @ C


def _perspective_matrix(key, in_hw, out_hw, p: PerspectiveParams):
    """Random 3x3 matrix + scale draw (datasets.py:1203-1235 ranges)."""
    oh, ow = out_hw
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    u = lambda k, lo, hi: jax.random.uniform(k, (), minval=lo, maxval=hi)
    px = u(k1, -p.perspective, p.perspective)
    py = u(k2, -p.perspective, p.perspective)
    a_deg = u(k3, -p.degrees, p.degrees)
    s = u(k4, 1 - p.scale, 1 + p.scale)
    shx = u(k5, -p.shear, p.shear)
    shy = u(k6, -p.shear, p.shear)
    k7a, k7b = jax.random.split(k7)
    tx = u(k7a, 0.5 - p.translate, 0.5 + p.translate) * ow
    ty = u(k7b, 0.5 - p.translate, 0.5 + p.translate) * oh
    return compose_perspective_matrix(px, py, a_deg, s, shx, shy, tx, ty,
                                      in_hw), s


def box_candidates(box1, box2, wh_thr=2.0, ar_thr=20.0, area_thr=0.1,
                   eps=1e-16):
    """Keep boxes that survived the warp (reference datasets.py:1271-1278).

    box1/box2: (..., 4) xyxy before/after. Returns bool (...)."""
    w1 = box1[..., 2] - box1[..., 0]
    h1 = box1[..., 3] - box1[..., 1]
    w2 = box2[..., 2] - box2[..., 0]
    h2 = box2[..., 3] - box2[..., 1]
    ar = jnp.maximum(w2 / (h2 + eps), h2 / (w2 + eps))
    return ((w2 > wh_thr) & (h2 > wh_thr)
            & (w2 * h2 / (w1 * h1 + eps) > area_thr) & (ar < ar_thr))


def warp_labels(labels_xyxy, mask, m, out_hw, s=1.0):
    """Transform padded xyxy pixel labels by 3x3 matrix m; clip + filter.

    `s` is the scale component of m: the reference compares warped areas
    against the SCALED originals (box_candidates(box1=targets*s, box2=xy),
    datasets.py:1271) so pure zoom never kills a box."""
    oh, ow = out_hw
    n = labels_xyxy.shape[0]
    x1, y1, x2, y2 = (labels_xyxy[:, i] for i in range(4))
    corners = jnp.stack([
        jnp.stack([x1, y1], -1), jnp.stack([x2, y1], -1),
        jnp.stack([x1, y2], -1), jnp.stack([x2, y2], -1)], axis=1)  # (n,4,2)
    ones = jnp.ones((n, 4, 1), jnp.float32)
    pts = jnp.concatenate([corners, ones], axis=-1) @ m.T
    pts = pts[..., :2] / pts[..., 2:3]
    nx1 = jnp.clip(pts[..., 0].min(1), 0, ow)
    ny1 = jnp.clip(pts[..., 1].min(1), 0, oh)
    nx2 = jnp.clip(pts[..., 0].max(1), 0, ow)
    ny2 = jnp.clip(pts[..., 1].max(1), 0, oh)
    new = jnp.stack([nx1, ny1, nx2, ny2], axis=-1)
    keep = mask & box_candidates(labels_xyxy * s, new)
    return new, keep


def random_perspective(img, ir, labels_xyxy, mask, key,
                       p: PerspectiveParams, out_hw, pad_value=114.0):
    """Warp one sample (img, ir HWC float; padded pixel xyxy labels)."""
    m, s = _perspective_matrix(key, img.shape[:2], out_hw, p)
    minv = jnp.linalg.inv(m)
    # rotation/shear/perspective ranges are STATIC hyps; when all are 0
    # (the reference's shipped hyps) every draw is axis-aligned and the
    # warp runs as MXU matmuls instead of HBM gathers
    sample = (separable_affine_sample
              if p.degrees == 0 and p.shear == 0 and p.perspective == 0
              else affine_sample)
    img_w = sample(img, minv, out_hw, pad_value)
    ir_w = sample(ir, minv, out_hw, pad_value)
    new_labels, keep = warp_labels(labels_xyxy, mask, m, out_hw, s)
    return img_w, ir_w, new_labels, keep


# --------------------------------------------------------------- mosaic 4

def mosaic4(imgs, irs, labels_xyxy, masks, key, s: int, pad_value=114.0):
    """4-tile mosaic for ONE output sample.

    imgs/irs: (4, s, s, C) float; labels_xyxy: (4, M, 4) pixel coords in each
    tile's own frame; masks: (4, M). Returns the 2s x 2s canvas + remapped
    padded labels (4*M).  Center jitter range matches the reference
    (uniform in [s/2, 3s/2], datasets.py:1004).
    """
    kc, _ = jax.random.split(key)
    cx = jax.random.uniform(kc, (), minval=0.5 * s, maxval=1.5 * s)
    cy = jax.random.uniform(jax.random.fold_in(kc, 1), (),
                            minval=0.5 * s, maxval=1.5 * s)
    cx = jnp.floor(cx)
    cy = jnp.floor(cy)

    # tile i target corner: 0 top-left of (cx,cy), 1 top-right, 2 bottom-left,
    # 3 bottom-right — each tile touches the jittered center with its
    # matching corner. To keep shapes static under jit the tiles are pasted
    # into a 4s x 4s scratch (origin shifted by +s) and the 2s x 2s window
    # [s:3s] is cropped out; the overhang simply falls outside the window.
    offs = [(cx - s, cy - s), (cx, cy - s), (cx - s, cy), (cx, cy)]

    scratch = jnp.full((4 * s, 4 * s, imgs.shape[-1]), pad_value, imgs.dtype)
    scratch_ir = jnp.full((4 * s, 4 * s, irs.shape[-1]), pad_value, irs.dtype)
    labels_out = []
    masks_out = []
    for i in range(4):
        ox, oy = offs[i]
        oxi = jnp.int32(ox) + s
        oyi = jnp.int32(oy) + s
        scratch = jax.lax.dynamic_update_slice(scratch, imgs[i], (oyi, oxi, 0))
        scratch_ir = jax.lax.dynamic_update_slice(scratch_ir, irs[i],
                                                  (oyi, oxi, 0))
        lab = labels_xyxy[i] + jnp.stack(
            [ox, oy, ox, oy]).astype(jnp.float32)[None]
        labels_out.append(lab)
        masks_out.append(masks[i])
    canvas = scratch[s:3 * s, s:3 * s]
    canvas_ir = scratch_ir[s:3 * s, s:3 * s]
    labels = jnp.concatenate(labels_out, axis=0)
    labels = jnp.clip(labels, 0, 2 * s)  # clip into canvas (datasets.py:1046)
    mask = jnp.concatenate(masks_out, axis=0)
    # degenerate boxes after clipping die in box_candidates downstream
    return canvas, canvas_ir, labels, mask


# ------------------------------------------------------------------- HSV

def hsv_augment(img, key, h_gain=0.015, s_gain=0.7, v_gain=0.4):
    """HSV jitter on float RGB [0, 255] (reference datasets.py:980-996)."""
    k1, k2, k3 = jax.random.split(key, 3)
    r = jnp.stack([
        jax.random.uniform(k1, (), minval=-1.0, maxval=1.0) * h_gain + 1,
        jax.random.uniform(k2, (), minval=-1.0, maxval=1.0) * s_gain + 1,
        jax.random.uniform(k3, (), minval=-1.0, maxval=1.0) * v_gain + 1,
    ])
    return hsv_apply(img, r)


def hsv_apply(img, r):
    """Scale (hue, sat, val) by gains r (3,) — float equivalent of the
    reference's uint8 LUTs (x*r0 % 180, clip(x*r1), clip(x*r2))."""
    x = img / 255.0
    mx = x.max(-1)
    mn = x.min(-1)
    diff = mx - mn + 1e-12
    rch, gch, bch = x[..., 0], x[..., 1], x[..., 2]
    hue = jnp.where(
        mx == rch, (gch - bch) / diff % 6.0,
        jnp.where(mx == gch, (bch - rch) / diff + 2.0,
                  (rch - gch) / diff + 4.0)) / 6.0
    sat = jnp.where(mx > 0, diff / (mx + 1e-12), 0.0)
    val = mx

    hue = (hue * r[0]) % 1.0
    sat = jnp.clip(sat * r[1], 0, 1)
    val = jnp.clip(val * r[2], 0, 1)

    i = jnp.floor(hue * 6.0)
    f = hue * 6.0 - i
    pch = val * (1 - sat)
    q = val * (1 - f * sat)
    t = val * (1 - (1 - f) * sat)
    i = i.astype(jnp.int32) % 6
    rgb = jnp.stack([
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [val, q, pch, pch, t, val]),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, val, val, q, pch, pch]),
        jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [pch, pch, t, val, val, q]),
    ], axis=-1)
    return rgb * 255.0


# ----------------------------------------------------------------- flips

def flips(img, ir, labels_xywhn, mask, key, flipud_p=0.0, fliplr_p=0.5):
    """Random up/down + left/right flips on both modalities + labels.

    labels are normalized xywh here (reference flips after normalization,
    datasets.py:883-896)."""
    k1, k2 = jax.random.split(key)
    do_ud = jax.random.uniform(k1) < flipud_p
    do_lr = jax.random.uniform(k2) < fliplr_p

    img = jnp.where(do_ud, img[::-1], img)
    ir = jnp.where(do_ud, ir[::-1], ir)
    img = jnp.where(do_lr, img[:, ::-1], img)
    ir = jnp.where(do_lr, ir[:, ::-1], ir)

    y = labels_xywhn
    y = y.at[:, 2].set(jnp.where(do_ud, 1.0 - y[:, 2], y[:, 2]))
    y = y.at[:, 1].set(jnp.where(do_lr, 1.0 - y[:, 1], y[:, 1]))
    return img, ir, y, mask


def mixup(img1, ir1, l1, m1, img2, ir2, l2, m2, key):
    """Blend two mosaiced samples (reference datasets.py:830-835)."""
    lam = jax.random.beta(key, 32.0, 32.0)
    img = img1 * lam + img2 * (1 - lam)
    ir = ir1 * lam + ir2 * (1 - lam)
    labels = jnp.concatenate([l1, l2], axis=0)
    mask = jnp.concatenate([m1, m2], axis=0)
    return img, ir, labels, mask
