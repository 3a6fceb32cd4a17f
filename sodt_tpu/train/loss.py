"""YOLO detection loss with fixed-shape, fully-vectorized target assignment.

Re-design of ComputeLoss (/root/reference/basics/utils/loss.py:90-224) for
XLA: the reference builds variable-length index lists per batch (anchor-ratio
filtering, 5-way neighbor-cell expansion) — data-dependent shapes that
cannot jit. Here every candidate (target x anchor x offset) slot exists
statically and a boolean mask switches it on, so the whole loss is one
fixed-shape program:

  targets: (B, M, 5) [cls, cx, cy, w, h] normalized, mask (B, M) — padded
  per image instead of the reference's concatenated (nt, 6) with image ids.

Semantics preserved (loss.py:165-224):
  * anchor match: max(r, 1/r) < anchor_t elementwise on wh ratios,
  * center + 2-nearest-neighbor cells (offsets g=0.5; left/up if frac<0.5
    and coord>1, right/down via the inverted coordinate),
  * grid indices clamped to the map,
  * CIoU box loss, obj target = clamped IoU (gr=1.0), BCE cls with
    cp/cn label smoothing hooks, optional focal loss,
  * per-level obj balance [4.0, 1.0, 0.4] (3-level) else 5-level table,
  * total loss scaled by batch size (loss.py:163).

Scatter note: when two expanded candidates land on the same (cell, anchor)
slot, the reference's dense tensor write keeps the last one; we take the max
IoU — deterministic under XLA scatter and at least as informative.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ..ops.boxes import bbox_iou


def smooth_bce(eps: float = 0.1) -> tuple[float, float]:
    """Positive/negative label-smoothing targets (loss.py:12-14)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise BCE-with-logits with positive weighting (no reduction)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def focal_modulation(logits, targets, loss, gamma: float, alpha: float = 0.25):
    """TF-style focal factor applied to a BCE loss (loss.py:34-61)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_f = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_f * (1.0 - p_t) ** gamma


class LossConfig(NamedTuple):
    nc: int
    anchors: tuple          # per-level ((w,h)*na,) pixel anchors
    strides: tuple          # per-level strides
    hyp_box: float = 0.05
    hyp_obj: float = 1.0
    hyp_cls: float = 0.5
    cls_pw: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0
    fl_gamma: float = 0.0
    gr: float = 1.0
    label_smoothing: float = 0.0

    @property
    def nl(self) -> int:
        return len(self.anchors)

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def balance(self) -> tuple:
        return {3: (4.0, 1.0, 0.4)}.get(
            self.nl, (4.0, 1.0, 0.25, 0.06, 0.02))


def build_targets_level(targets: jax.Array, tmask: jax.Array,
                        anchors_grid: jax.Array, ny: int, nx: int,
                        anchor_t: float):
    """Assign padded targets to one detection level, fixed shapes.

    targets: (B, M, 5) normalized [cls, cx, cy, w, h]; tmask: (B, M) bool.
    anchors_grid: (na, 2) anchors in grid units.
    Returns a dict of (B, M, na, 5)-shaped assignment tensors.
    """
    b, m, _ = targets.shape
    na = anchors_grid.shape[0]
    gain = jnp.array([nx, ny, nx, ny], jnp.float32)

    txywh = targets[..., 1:5] * gain  # grid-space boxes
    tcls = targets[..., 0]

    # anchor-ratio filter (loss.py:188-192): (B, M, na)
    r = txywh[..., None, 2:4] / anchors_grid[None, None]
    anchor_ok = jnp.max(jnp.maximum(r, 1.0 / r), axis=-1) < anchor_t

    gxy = txywh[..., 0:2]                    # (B, M, 2)
    gxi = gain[0:2] - gxy
    fx, fy = gxy[..., 0], gxy[..., 1]
    ix, iy = gxi[..., 0], gxi[..., 1]
    g = 0.5
    j = (fx % 1.0 < g) & (fx > 1.0)          # take left cell
    k = (fy % 1.0 < g) & (fy > 1.0)          # take top cell
    l = (ix % 1.0 < g) & (ix > 1.0)          # take right cell
    mm = (iy % 1.0 < g) & (iy > 1.0)         # take bottom cell

    ones = jnp.ones_like(j)
    off_ok = jnp.stack([ones, j, k, l, mm], axis=-1)     # (B, M, 5)
    offsets = jnp.array([[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]],
                        jnp.float32) * g                  # (5, 2)

    # expand to (B, M, na, 5)
    pos = tmask[..., None, None] & anchor_ok[..., None] & off_ok[:, :, None]

    gij = jnp.floor(gxy[:, :, None, None, :] - offsets[None, None, None])
    gi = jnp.clip(gij[..., 0], 0, nx - 1)                 # (B, M, 1, 5)
    gj = jnp.clip(gij[..., 1], 0, ny - 1)
    gi = jnp.broadcast_to(gi, (b, m, na, 5)).astype(jnp.int32)
    gj = jnp.broadcast_to(gj, (b, m, na, 5)).astype(jnp.int32)

    # box regression target: offset inside the chosen cell + wh (grid units)
    txy = gxy[:, :, None, None, :] - jnp.stack([gi, gj], axis=-1)
    twh = jnp.broadcast_to(txywh[:, :, None, None, 2:4], (b, m, na, 5, 2))
    tbox = jnp.concatenate([txy, twh], axis=-1)           # (B, M, na, 5, 4)

    anc = jnp.broadcast_to(anchors_grid[None, None, :, None, :],
                           (b, m, na, 5, 2))
    a_idx = jnp.broadcast_to(
        jnp.arange(na, dtype=jnp.int32)[None, None, :, None], (b, m, na, 5))
    cls_b = jnp.broadcast_to(tcls[:, :, None, None], (b, m, na, 5))

    return dict(pos=pos, gi=gi, gj=gj, a=a_idx, tbox=tbox, anchors=anc,
                tcls=cls_b.astype(jnp.int32))


def compute_loss(preds: Sequence[jax.Array], targets: jax.Array,
                 tmask: jax.Array, cfg: LossConfig):
    """Total detection loss.

    preds: per-level raw outputs (B, ny, nx, na, 5+nc) from Detect.
    targets/tmask: padded labels as in `build_targets_level`.
    Returns (loss_total, dict(box=, obj=, cls=)); loss_total already carries
    the reference's *batch_size scaling (loss.py:163).
    """
    bsz = preds[0].shape[0]
    nc = cfg.nc
    cp, cn = smooth_bce(cfg.label_smoothing)

    lbox = jnp.zeros((), jnp.float32)
    lobj = jnp.zeros((), jnp.float32)
    lcls = jnp.zeros((), jnp.float32)

    for li, p in enumerate(preds):
        b, ny, nx, na, no = p.shape
        anchors_grid = (jnp.asarray(cfg.anchors[li], jnp.float32)
                        .reshape(na, 2) / cfg.strides[li])
        asn = build_targets_level(targets, tmask, anchors_grid, ny, nx,
                                  cfg.anchor_t)
        pos = asn["pos"]                                   # (B, M, na, 5)
        npos = jnp.maximum(jnp.sum(pos), 1)

        # gather predictions at assigned slots: flatten spatial+anchor dims
        pf = p.reshape(b, ny * nx * na, no).astype(jnp.float32)
        flat_idx = (asn["gj"] * nx + asn["gi"]) * na + asn["a"]  # (B,M,na,5)
        fi = flat_idx.reshape(b, -1)
        ps = jnp.take_along_axis(pf, fi[..., None], axis=1)
        ps = ps.reshape(pos.shape + (no,))                 # (B,M,na,5,no)

        # box loss (CIoU)
        pxy = jax.nn.sigmoid(ps[..., 0:2]) * 2.0 - 0.5
        pwh = (jax.nn.sigmoid(ps[..., 2:4]) * 2.0) ** 2 * asn["anchors"]
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        iou = bbox_iou(pbox, asn["tbox"], xyxy=False, ciou=True)
        lbox += jnp.sum(jnp.where(pos, 1.0 - iou, 0.0)) / npos

        # objectness target map: scatter max IoU into (B, ny*nx*na)
        iou_d = jnp.clip(jax.lax.stop_gradient(iou), 0.0)
        tobj_val = (1.0 - cfg.gr) + cfg.gr * iou_d
        tobj_val = jnp.where(pos, tobj_val, 0.0).reshape(b, -1)
        tobj = jnp.zeros((b, ny * nx * na), jnp.float32)
        tobj = jax.vmap(lambda t, ix, v: t.at[ix].max(v))(tobj, fi, tobj_val)

        obj_logits = pf[..., 4]
        obj_loss = bce_with_logits(obj_logits, tobj, cfg.obj_pw)
        if cfg.fl_gamma > 0:
            obj_loss = focal_modulation(obj_logits, tobj, obj_loss,
                                        cfg.fl_gamma)
        lobj += jnp.mean(obj_loss) * cfg.balance[li]

        # classification loss at positives
        if nc > 1:
            t = jnp.full(pos.shape + (nc,), cn, jnp.float32)
            onehot = jax.nn.one_hot(asn["tcls"], nc, dtype=jnp.float32)
            t = t * (1 - onehot) + onehot * cp
            cls_logits = ps[..., 5:]
            cls_loss = bce_with_logits(cls_logits, t, cfg.cls_pw)
            if cfg.fl_gamma > 0:
                cls_loss = focal_modulation(cls_logits, t, cls_loss,
                                            cfg.fl_gamma)
            # reference: mean over (n_pos, nc) elements
            lcls += jnp.sum(jnp.where(pos[..., None], cls_loss, 0.0)) / (
                npos * nc)

    lbox *= cfg.hyp_box
    lobj *= cfg.hyp_obj
    lcls *= cfg.hyp_cls
    total = (lbox + lobj + lcls) * bsz
    return total, {"box": lbox, "obj": lobj, "cls": lcls}


def bce_blur_with_logits(pred, true, alpha: float = 0.05):
    """BCEBlurWithLogits (loss.py:17-31): BCE with reduced missing-label
    effect. Returns the mean like the reference."""
    loss = bce_with_logits(pred, true)
    p = jax.nn.sigmoid(pred)
    dx = p - true
    alpha_factor = 1 - jnp.exp((dx - 1) / (alpha + 1e-4))
    return jnp.mean(loss * alpha_factor)


def qfocal_modulation(logits, targets, loss, gamma: float,
                      alpha: float = 0.25):
    """Quality focal factor (loss.py:64-87)."""
    p = jax.nn.sigmoid(logits)
    alpha_f = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_f * jnp.abs(targets - p) ** gamma
