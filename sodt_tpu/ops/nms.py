"""Fixed-shape on-device NMS for TPU.

The reference offloads postprocessing to `torchvision.ops.nms` plus a python
per-image loop (/root/reference/basics/utils/general.py:425-512). On TPU that
would force a device->host sync per image; instead we run the whole pipeline
— confidence gating, multi-label expansion, class-offset batched greedy NMS,
and optional merge-NMS (weighted box fusion of survivors,
general.py:499-506) — as one jitted, fixed-shape program:

  1. score = obj * cls; multi-label expands every (box, class) pair.
  2. top-K candidates by score (K static) replace the dynamic conf filter;
     sub-threshold entries are masked to score 0 so they never win.
  3. boxes are offset by class * MAX_WH (general.py:494-495) so one IoU
     matrix handles per-class NMS.
  4. greedy selection runs max_det fixed iterations of argmax + suppress
     against the precomputed (K, K) IoU matrix.

Output is a padded (max_det, 6) [x1,y1,x2,y2,conf,cls] block plus a validity
mask — static shapes end to end, vmappable over the batch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .boxes import xywh2xyxy, box_iou

MAX_WH = 4096.0  # class-offset multiplier, matches reference general.py:436


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "multi_label", "agnostic",
                     "max_det", "top_k", "merge", "approx_topk"),
)
def single_image_nms(pred: jax.Array, *, conf_thres: float = 0.25,
                     iou_thres: float = 0.45, multi_label: bool = False,
                     agnostic: bool = False, max_det: int = 300,
                     top_k: int = 4096, merge: bool = True,
                     approx_topk: bool = False):
    """NMS for one image's raw predictions (N, 5+nc) in xywh+obj+cls layout.

    Returns (dets, valid): dets is (max_det, 6) xyxy+conf+cls, valid is a
    (max_det,) bool mask. Entries beyond the number of survivors are zero.
    """
    n, no = pred.shape
    nc = no - 5
    boxes_xywh = pred[:, :4]
    obj = pred[:, 4]
    cls_conf = pred[:, 5:] * obj[:, None]  # conf = obj * cls (general.py:465)
    boxes = xywh2xyxy(boxes_xywh)

    obj_ok = obj > conf_thres  # candidate gate (general.py:433)

    if multi_label and nc > 1:
        # every (box, class) pair is a candidate
        scores = jnp.where(obj_ok[:, None] & (cls_conf > conf_thres),
                           cls_conf, 0.0).reshape(-1)  # (N*nc,)
        cls_ids = jnp.tile(jnp.arange(nc, dtype=pred.dtype), (n,))
        cand_boxes = jnp.repeat(boxes, nc, axis=0)
    else:
        best = jnp.argmax(cls_conf, axis=1)
        # max == value at argmax; a reduce is ~100x faster than the row
        # gather take_along_axis lowers to on TPU (measured 35ms -> <1ms
        # at batch 64, 49k candidates)
        best_conf = jnp.max(cls_conf, axis=1)
        scores = jnp.where(obj_ok & (best_conf > conf_thres), best_conf, 0.0)
        cls_ids = best.astype(pred.dtype)
        cand_boxes = boxes

    # full candidate count BEFORE top-k truncation: gates merge-NMS exactly
    # like the reference's `1 < n < 3E3` (general.py:499). Whenever the gate
    # is open, n < 3000 <= top_k so truncation loses nothing and merge parity
    # is exact; at n >= 3000 the reference disables merge too, and only the
    # plain-NMS tail beyond top_k differs from its max_nms=30000.
    n_cand = jnp.sum(scores > 0.0)

    k = min(top_k, scores.shape[0])
    if approx_topk and k < scores.shape[0]:
        # serving-path knob: TPU-native approximate top-k (bitonic partial
        # reduction) instead of the full sort jax.lax.top_k lowers to —
        # measured ~6 ms/batch-64 on the exact path. Identical results
        # whenever the candidates that clear conf_thres fit in k (the
        # production conf=0.25 regime); at candidate counts beyond k the
        # ~0.95 recall target can drop low-score tail boxes, so the mAP
        # protocol (conf 0.001) keeps the exact sort.
        top_scores, top_idx = jax.lax.approx_max_k(scores, k)
    else:
        top_scores, top_idx = jax.lax.top_k(scores, k)
    top_boxes = cand_boxes[top_idx]
    top_cls = cls_ids[top_idx]
    cand_valid = top_scores > 0.0

    offset = jnp.where(agnostic, 0.0, top_cls * MAX_WH)
    off_boxes = top_boxes + offset[:, None]
    iou = box_iou(off_boxes, off_boxes)  # (K, K)

    def step(state, _):
        alive, scores_live = state
        idx = jnp.argmax(scores_live)
        score = scores_live[idx]
        ok = score > 0.0
        # suppress everything overlapping the winner (including itself)
        suppress = iou[idx] > iou_thres
        suppress = suppress | (jnp.arange(k) == idx)
        new_alive = alive & jnp.where(ok, ~suppress, alive)
        new_scores = jnp.where(new_alive, scores_live, 0.0)
        return (new_alive, new_scores), (idx, ok)

    (_, _), (kept_idx, kept_ok) = jax.lax.scan(
        step, (cand_valid, jnp.where(cand_valid, top_scores, 0.0)),
        None, length=max_det)

    out_boxes = top_boxes[kept_idx]
    out_scores = top_scores[kept_idx]
    out_cls = top_cls[kept_idx]

    if merge:
        # merge-NMS: weighted fusion of each winner with its >iou_thres
        # neighbours among all candidates, gated on 1 < n < 3000, plus the
        # redundancy requirement `i = i[iou.sum(1) > 1]` — winners with no
        # overlapping second candidate are dropped (general.py:499-506)
        merge_on = (n_cand > 1) & (n_cand < 3000)
        neigh = (iou[kept_idx] > iou_thres) & cand_valid[None, :]
        w = neigh * top_scores[None, :]  # (max_det, K)
        denom = jnp.sum(w, axis=1, keepdims=True)
        merged = (w @ top_boxes) / jnp.maximum(denom, 1e-12)
        use = merge_on & (denom[:, 0] > 0) & kept_ok
        out_boxes = jnp.where(use[:, None], merged, out_boxes)
        redundant_ok = jnp.sum(neigh, axis=1) > 1
        kept_ok = kept_ok & jnp.where(merge_on, redundant_ok, True)

    dets = jnp.concatenate(
        [out_boxes, out_scores[:, None], out_cls[:, None]], axis=1)
    dets = jnp.where(kept_ok[:, None], dets, 0.0)
    return dets, kept_ok


def batched_nms(preds: jax.Array, **kw):
    """vmapped NMS over a batch: (B, N, 5+nc) -> ((B, max_det, 6), (B, max_det))."""
    fn = functools.partial(single_image_nms, **kw)
    return jax.vmap(fn)(preds)
