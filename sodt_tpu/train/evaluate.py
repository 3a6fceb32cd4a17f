"""Evaluation runtime: batched inference -> on-device NMS -> mAP.

Re-design of the reference eval loop (/root/reference/basics/test.py:30-346):
the forward pass, Detect decode and NMS compile into ONE jitted program per
batch shape (the reference crosses to host for torchvision NMS per image,
test.py:152); only the greedy GT matching and AP accumulation run on host
numpy, like the reference.

Protocol parity (BASELINE.md): conf 0.001, iou 0.6, multi-label, merge-NMS
with the reference's 1 < n < 3000 gate and redundancy drop, IoU vector
0.5:0.95:10. Candidate truncation: top_k=4096 (static, vs the reference's
dynamic max_nms=30000, general.py:490) — whenever merge engages (n < 3000)
truncation loses nothing and parity is exact; above 4096 candidates only
the lowest-scoring tail of a plain-NMS pass can differ. Speed accounting
reports inference+NMS ms/img like test.py:301-303.
"""

from __future__ import annotations

import functools
import time
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from ..models.detect import decode_detections
from ..ops.nms import batched_nms
from ..ops.boxes import xywhn2xyxy
from ..utils.metrics import ap_per_class, match_predictions, ConfusionMatrix
from .loss import LossConfig, compute_loss


def make_eval_step(model, *, conf_thres: float = 0.001,
                   iou_thres: float = 0.6, max_det: int = 300,
                   top_k: int = 4096, merge: bool = True,
                   multi_label: bool = True,
                   loss_cfg: LossConfig | None = None,
                   augment: bool = False, approx_topk: bool = False,
                   hybrid_labels: bool = False):
    """Jitted (variables, img, ir[, targets, tmask]) -> (dets, valid[, loss]).

    augment=True runs test-time augmentation (reference test.py:360 ->
    Model(augment=True), model.py:156-184): three scale/flip passes whose
    de-scaled predictions are concatenated before NMS."""

    anchors = np.asarray(model.spec.anchors, np.float32).reshape(
        len(model.spec.anchors), -1, 2)
    strides = model.spec.detect_strides

    @jax.jit
    def step(variables, img, ir, targets=None, tmask=None):
        # images may arrive uint8 (4x less host->device traffic); the
        # cast + /255 scale runs on device. dtype is static under jit.
        if img.dtype == jnp.uint8:
            img = img.astype(jnp.float32) / 255.0
        if ir is not None and ir.dtype == jnp.uint8:
            ir = ir.astype(jnp.float32) / 255.0
        # a list/tuple of variable trees = NMS ensemble (reference
        # attempt_load + Ensemble, experimental.py:98-135): per-model
        # decoded predictions concatenated before one NMS pass
        vs = (variables if isinstance(variables, (list, tuple))
              else [variables])
        preds = []
        out = None
        for v in vs:
            if augment:
                from .tta import tta_forward
                preds.append(tta_forward(model, v, img, ir))
            else:
                out = model.apply(v, img, ir, train=False)
                preds.append(decode_detections(out["raw"], anchors,
                                               strides))
        pred = (preds[0] if len(preds) == 1
                else jnp.concatenate(preds, axis=1))
        if hybrid_labels and targets is not None:
            # --save-hybrid: seed NMS with the GT boxes as unit-confidence
            # candidates (reference autolabelling, general.py:447-453 via
            # test.py:136 `lb`); masked label slots get obj 0 and fall to
            # the conf gate
            nc_ = pred.shape[-1] - 5
            net = jnp.asarray([img.shape[2], img.shape[1],
                               img.shape[2], img.shape[1]], jnp.float32)
            gt_boxes = targets[..., 1:5] * net              # (B, M, 4) xywh
            obj = tmask.astype(pred.dtype)[..., None]       # (B, M, 1)
            onehot = jax.nn.one_hot(targets[..., 0].astype(jnp.int32),
                                    nc_, dtype=pred.dtype)
            v = jnp.concatenate([gt_boxes.astype(pred.dtype), obj,
                                 onehot * obj], axis=-1)
            pred = jnp.concatenate([pred, v], axis=1)
        dets, valid = batched_nms(
            pred, conf_thres=conf_thres, iou_thres=iou_thres,
            multi_label=multi_label, max_det=max_det, top_k=top_k,
            merge=merge, approx_topk=approx_topk)
        losses = None
        # val loss: single models only — for NMS ensembles the raw outputs
        # of one member would misstate the ensemble (the reference computes
        # loss only in training-time val, where the model is single)
        if (loss_cfg is not None and targets is not None
                and len(vs) == 1 and not augment):
            _, losses = compute_loss(out["raw"], targets, tmask, loss_cfg)
        return dets, valid, losses

    return step


def cache_rel_bias(model, variables, img_size: int):
    """Materialize every WindowAttention relative-position bias into a
    'bias_cache' collection with ONE extra apply, so the jitted eval step
    reads cached (nh, N, N) tensors instead of re-executing the gather
    every call (~1.9 ms for stage-3's 1M-row index at batch 64). The
    cache is a pure function of the weights — refresh after any load."""
    if isinstance(variables, (list, tuple)):
        return [cache_rel_bias(model, v, img_size) for v in variables]
    # only models with rel-pos bias tables have anything to cache (CNN
    # configs don't); detect by param name so real failures in the apply
    # below surface instead of silently degrading to per-call gathers
    import jax
    from jax.tree_util import tree_flatten_with_path, keystr
    leaves, _ = tree_flatten_with_path(variables.get("params", {}))
    if not any("relative_position_bias_table" in keystr(p)
               for p, _ in leaves):
        return variables
    import jax.numpy as jnp
    x0 = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
    _, caches = model.apply(variables, x0, x0, train=False,
                            mutable=["bias_cache"])
    return {**variables, **caches}


class EvalRunner:
    """Reusable eval executables: the jitted per-batch step, a lazily
    jitted whole-pass lax.scan runner, and a jitted rel-pos bias-cache
    refresh. Build ONE per training run and pass it to evaluate() via
    `runner=`: per-epoch eval then reuses the compiled programs instead
    of re-tracing them each epoch — on a remote-compile rig every
    re-trace is a fresh multi-second compile (the reference keeps its
    eval model resident across epochs the same way, Train.py:505-516).
    """

    def __init__(self, model, **step_kw):
        import inspect
        self.model = model
        self.step = make_eval_step(model, **step_kw)
        # record the step's FULLY-RESOLVED protocol kwargs so evaluate()
        # can reject a runner built under a different protocol
        sig = inspect.signature(make_eval_step)
        bound = sig.bind(model, **step_kw)
        bound.apply_defaults()
        self.step_kw = {k: v for k, v in bound.arguments.items()
                        if k != "model"}
        self._scan_fn = None
        self._cache_fns: dict[int, Any] = {}
        # stack_cache: device-resident stacked eval batches + host-side
        # metadata, keyed by evaluate(stack_cache=...) name. A fixed val
        # set uploads ONCE per run instead of once per eval epoch (at
        # 512px/64 imgs that is ~400 MB of f32 through the tunnel per
        # epoch otherwise).
        self._stacks: dict[str, Any] = {}

    def scan_fn(self):
        if self._scan_fn is None:
            self._scan_fn = _make_scan_runner(self.step)
        return self._scan_fn

    def cache_bias(self, variables, img_size: int):
        """cache_rel_bias, but through one persistent jitted apply
        (keyed by img_size — one compiled refresh per resolution)."""
        if isinstance(variables, (list, tuple)):
            return [self.cache_bias(v, img_size) for v in variables]
        from jax.tree_util import tree_flatten_with_path, keystr
        leaves, _ = tree_flatten_with_path(variables.get("params", {}))
        if not any("relative_position_bias_table" in keystr(p)
                   for p, _ in leaves):
            return variables
        if img_size not in self._cache_fns:
            model = self.model
            x0 = jnp.zeros((1, img_size, img_size, 3), jnp.float32)

            @jax.jit
            def cf(v):
                return model.apply(v, x0, x0, train=False,
                                   mutable=["bias_cache"])[1]

            self._cache_fns[img_size] = cf
        return {**variables, **self._cache_fns[img_size](variables)}


def _make_scan_runner(step):
    """One jitted whole-pass runner over a compiled eval step (shared by
    EvalRunner.scan_fn and the runnerless _try_scan_eval path)."""

    @jax.jit
    def run_all(variables, imgs, irs, tg, tm):
        def body(_, xs):
            im, ir_, t_, m_ = xs
            return None, step(variables, im, ir_, t_, m_)
        # None xs entries are empty pytrees: scan passes them through
        _, out = jax.lax.scan(body, None, (imgs, irs, tg, tm))
        return out

    return run_all


def _try_scan_eval(step, variables, batches, scan, runner=None,
                   stack_cache=None):
    """Run every eval (forward + NMS) pass in ONE jitted lax.scan.

    Returns (batch dicts carrying "_results", wall seconds) when
    eligible, else (the batches unchanged, None). Eligible = >1 batch,
    one uniform image shape (rect eval keeps per-batch dispatch), and —
    under auto mode (scan=None) — stacked images within ~1 GB.

    `stack_cache`: with a runner, cache the stacked device arrays and
    the per-batch host metadata under this key, and on later calls skip
    consuming `batches` entirely — the val set stays device-resident for
    the whole training run (one upload, not one per eval epoch). Only
    valid when every call under the key evaluates the SAME batches.
    """
    cached = (runner._stacks.get(stack_cache)
              if runner is not None and stack_cache else None)
    if cached is not None:
        blist, imgs, irs, tg, tm = cached
    else:
        blist = list(batches)
        if len(blist) < 2:
            return iter(blist), None
        shapes = {tuple(b["img"].shape) for b in blist}
        if len(shapes) != 1:
            return iter(blist), None
        itemsize = np.dtype(blist[0]["img"].dtype).itemsize
        est = 2 * len(blist) * int(np.prod(next(iter(shapes)))) * itemsize
        if scan is None and est > 1e9:
            return iter(blist), None
        has_t = all(b.get("targets") is not None for b in blist)
        imgs = jnp.stack([b["img"] for b in blist])
        irs = jnp.stack([b["ir"] for b in blist])
        tg = jnp.stack([b["targets"] for b in blist]) if has_t else None
        tm = jnp.stack([b["tmask"] for b in blist]) if has_t else None
        if runner is not None and stack_cache:
            # keep metadata only (the host AP loop never reads img/ir
            # once "_results" is attached) + the device-resident stacks
            blist = [{k: v for k, v in b.items() if k not in ("img", "ir")}
                     for b in blist]
            runner._stacks[stack_cache] = (blist, imgs, irs, tg, tm)

    run_all = runner.scan_fn() if runner is not None \
        else _make_scan_runner(step)

    t0 = time.perf_counter()
    dets_a, valid_a, losses_a = run_all(variables, imgs, irs, tg, tm)
    dets_a = np.asarray(dets_a)
    valid_a = np.asarray(valid_a)
    if losses_a is not None:
        losses_a = {k: np.asarray(v) for k, v in losses_a.items()}
    t_scan = time.perf_counter() - t0
    for i, b in enumerate(blist):
        li = ({k: v[i] for k, v in losses_a.items()}
              if losses_a is not None else None)
        b["_results"] = (dets_a[i], valid_a[i], li)
    return iter(blist), t_scan


def evaluate(model, variables, batches, *, nc: int, img_size: int,
             conf_thres: float = 0.001, iou_thres: float = 0.6,
             max_det: int = 300, top_k: int = 4096, merge: bool = True,
             loss_cfg: LossConfig | None = None, names=None,
             confusion: bool = False, verbose: bool = False,
             save_json: str | None = None, save_txt: str | None = None,
             augment: bool = False, anno_json: str | None = None,
             cache_bias: bool = True, save_conf: bool = False,
             save_hybrid: bool = False, scan: bool | None = None,
             runner: EvalRunner | None = None,
             stack_cache: str | None = None):
    """Run the full eval protocol. Returns a metrics dict.

    `batches` yields dicts from data.loader.make_eval_batches.

    `scan`: run ALL forward+NMS passes in ONE jitted lax.scan dispatch
    and fetch the stacked detections once, instead of one dispatch +
    fetch per batch — on a dispatch-latency-bound rig (tunnel-attached
    dev chip) per-epoch eval cost drops to a single round trip. None =
    auto: scan when there are >1 uniform-shape batches and the stacked
    images fit a ~1 GB budget. The host-side matching/AP loop is
    identical either way.

    `runner`: a prebuilt EvalRunner (must have been constructed with the
    same step kwargs) — reuses its compiled step/scan/bias-cache programs
    instead of re-tracing them, for callers that evaluate repeatedly
    (trainer per-epoch eval).

    `stack_cache`: with a runner, also cache the scan path's stacked
    device arrays + batch metadata under this key; later calls with the
    same key skip the host batch build AND the device upload entirely.
    Only pass it when every call under the key evaluates the same data.
    """
    if runner is not None:
        # the runner's compiled step bakes in ITS protocol — reject a
        # call that asks for a different one instead of silently running
        # under the wrong conf/iou/hybrid settings
        want = dict(conf_thres=conf_thres, iou_thres=iou_thres,
                    max_det=max_det, top_k=top_k, merge=merge,
                    loss_cfg=loss_cfg, augment=augment,
                    hybrid_labels=save_hybrid)
        diff = {k: (v, runner.step_kw[k]) for k, v in want.items()
                if k in runner.step_kw and runner.step_kw[k] != v}
        if diff:
            raise ValueError(
                "evaluate() protocol args disagree with the prebuilt "
                "runner's (requested, runner): "
                + ", ".join(f"{k}={v}" for k, v in sorted(diff.items()))
                + " — build the EvalRunner with matching kwargs")
        if cache_bias:
            variables = runner.cache_bias(variables, img_size)
        step = runner.step
    else:
        if cache_bias:
            variables = cache_rel_bias(model, variables, img_size)
        step = make_eval_step(model, conf_thres=conf_thres,
                              iou_thres=iou_thres, max_det=max_det,
                              top_k=top_k, merge=merge, loss_cfg=loss_cfg,
                              augment=augment, hybrid_labels=save_hybrid)

    if scan is not False:
        batches, t_scan = _try_scan_eval(step, variables, batches, scan,
                                         runner, stack_cache)
    else:
        t_scan = None
    iouv = np.linspace(0.5, 0.95, 10)
    stats = []
    cm = ConfusionMatrix(nc=nc) if confusion else None
    seen = 0
    t_infer = 0.0
    losses_acc = []
    jdict = []  # COCO-format detections (reference test.py:194-204)

    for batch in batches:
        pre = batch.pop("_results", None)
        t0 = time.perf_counter()
        if pre is not None:            # scanned eval: precomputed results
            dets, valid, losses = pre
        else:
            dets, valid, losses = step(
                variables, batch["img"], batch["ir"],
                batch.get("targets"), batch.get("tmask"))
            dets = np.asarray(dets)
            valid = np.asarray(valid)
        t_infer += time.perf_counter() - t0
        if losses is not None:
            losses_acc.append({k: float(v) for k, v in losses.items()})

        targets = np.asarray(batch["targets"])
        tmask = np.asarray(batch["tmask"])
        nvalid = batch.get("valid", dets.shape[0])
        # rect batches carry their own network shape (test.py:112 pad 0.5)
        net_h, net_w = batch.get("net_shape", (img_size, img_size))
        for si in range(nvalid):
            seen += 1
            d = dets[si][valid[si]]
            labs = targets[si][tmask[si]]
            tcls = labs[:, 0].tolist()
            if d.shape[0] == 0:
                if len(tcls):
                    stats.append((np.zeros((0, 10), bool), np.zeros(0),
                                  np.zeros(0), tcls))
                continue
            # GT to pixel xyxy at network resolution
            gt_xyxy = np.asarray(
                xywhn2xyxy(jnp.asarray(labs[:, 1:5]), net_w, net_h))
            labels5 = np.concatenate([labs[:, 0:1], gt_xyxy], axis=1)
            correct = match_predictions(d, labels5, iouv)
            if cm is not None:
                cm.process_batch(d, labels5)
            stats.append((correct, d[:, 4], d[:, 5], tcls))

            # real image id: file stem, int when numeric (test.py:197)
            stems = batch.get("stems")
            if stems is not None:
                stem = stems[si]
                image_id = int(stem) if str(stem).isnumeric() else stem
            else:
                ids = batch.get("indices")
                image_id = ids[si] if ids is not None else seen - 1
            if save_json is not None or save_txt is not None:
                # export in NATIVE image space like the reference
                # (test.py:171 scale_coords before save)
                shapes = batch.get("shapes")
                h0, w0 = (shapes[si] if shapes is not None
                          else (net_h, net_w))
                dn = d.copy()
                rps = batch.get("ratio_pads")
                if rps is not None or (h0, w0) != (net_h, net_w):
                    from ..ops.boxes import scale_coords
                    # rect batches carry the ACTUAL letterbox gain/pad
                    # (scaleup=False clamps the gain; recomputing it from
                    # shapes would mis-scale every exported box)
                    dn[:, :4] = np.asarray(scale_coords(
                        (net_h, net_w), jnp.asarray(d[:, :4]), (h0, w0),
                        ratio_pad=None if rps is None else rps[si]))
                if save_json is not None:
                    for x1, y1, x2, y2, conf_, cls_ in dn:
                        jdict.append({"image_id": image_id,
                                      "category_id": int(cls_),
                                      "bbox": [round(float(x1), 3),
                                               round(float(y1), 3),
                                               round(float(x2 - x1), 3),
                                               round(float(y2 - y1), 3)],
                                      "score": round(float(conf_), 5)})
                if save_txt is not None:
                    import os
                    os.makedirs(save_txt, exist_ok=True)
                    with open(f"{save_txt}/{image_id}.txt", "w") as fh:
                        for x1, y1, x2, y2, conf_, cls_ in dn:
                            cx = (x1 + x2) / 2 / w0
                            cy = (y1 + y2) / 2 / h0
                            bw = (x2 - x1) / w0
                            bh = (y2 - y1) / h0
                            # conf column only with --save-conf
                            # (reference test.py:166-168)
                            tail = f" {conf_:.5f}" if save_conf else ""
                            fh.write(f"{int(cls_)} {cx:.6f} {cy:.6f} "
                                     f"{bw:.6f} {bh:.6f}{tail}\n")

    if t_scan is not None:
        t_infer = t_scan               # the one scan dispatch did the work
    out: dict[str, Any] = {"seen": seen,
                           "speed_ms": 1000 * t_infer / max(seen, 1)}
    if stats:
        tp = np.concatenate([np.asarray(s[0]) for s in stats])
        conf = np.concatenate([s[1] for s in stats])
        pcls = np.concatenate([s[2] for s in stats])
        tcls = np.concatenate([np.asarray(s[3]) for s in stats])
        if tp.size and tp.any():
            p, r, ap, f1, cls_idx = ap_per_class(tp, conf, pcls, tcls)
            ap50, ap_mean = ap[:, 0], ap.mean(1)
            out.update(mp=float(p.mean()), mr=float(r.mean()),
                       map50=float(ap50.mean()), map=float(ap_mean.mean()),
                       per_class={int(c): dict(p=float(p[i]), r=float(r[i]),
                                               ap50=float(ap50[i]),
                                               ap=float(ap_mean[i]))
                                  for i, c in enumerate(cls_idx)})
        else:
            out.update(mp=0.0, mr=0.0, map50=0.0, map=0.0, per_class={})
        out["nt"] = np.bincount(tcls.astype(np.int64), minlength=nc).tolist()
    else:
        out.update(mp=0.0, mr=0.0, map50=0.0, map=0.0, per_class={}, nt=[0])
    if losses_acc:
        out["val_loss"] = {k: float(np.mean([l[k] for l in losses_acc]))
                           for k in losses_acc[0]}
    if cm is not None:
        out["confusion_matrix"] = cm.matrix
    if save_json is not None:
        import json
        with open(save_json, "w") as fh:
            json.dump(jdict, fh)
        if anno_json is not None:
            # optional COCOeval pass (reference test.py:314-330), gated on
            # pycocotools being installed (it is not baked into this image)
            try:
                from pycocotools.coco import COCO
                from pycocotools.cocoeval import COCOeval
                anno = COCO(anno_json)
                pred = anno.loadRes(save_json)
                ce = COCOeval(anno, pred, "bbox")
                ce.evaluate()
                ce.accumulate()
                ce.summarize()
                out["coco_map"], out["coco_map50"] = (
                    float(ce.stats[0]), float(ce.stats[1]))
            except ImportError:
                print("pycocotools not installed -- skipping COCOeval "
                      "(predictions json written)")
            except Exception as e:  # anno/pred mismatch: report, keep going
                print(f"COCOeval failed: {e}")
    if verbose and names and out.get("per_class"):
        print(f"{'class':>12} {'P':>8} {'R':>8} {'mAP50':>8} {'mAP':>8}")
        print(f"{'all':>12} {out['mp']:8.4f} {out['mr']:8.4f} "
              f"{out['map50']:8.4f} {out['map']:8.4f}")
        for c, v in out["per_class"].items():
            nm = names[c] if c < len(names) else str(c)
            print(f"{nm:>12} {v['p']:8.4f} {v['r']:8.4f} "
                  f"{v['ap50']:8.4f} {v['ap']:8.4f}")
    return out


def fitness_from_metrics(m: dict) -> float:
    """0.9*mAP50 + 0.1*mAP (reference general.py:36-39)."""
    return 0.9 * m.get("map50", 0.0) + 0.1 * m.get("map", 0.0)
