"""On-device fixed-shape NMS vs torchvision.ops.nms golden behavior."""

import numpy as np
import jax.numpy as jnp
import pytest

from sodt_tpu.ops import single_image_nms, batched_nms


def _make_pred(boxes_xywh, obj, cls_probs):
    """Assemble an (N, 5+nc) raw prediction tensor."""
    return np.concatenate(
        [np.asarray(boxes_xywh, np.float32),
         np.asarray(obj, np.float32)[:, None],
         np.asarray(cls_probs, np.float32)], axis=1)


def test_nms_suppresses_overlaps():
    pred = _make_pred(
        boxes_xywh=[[50, 50, 20, 20], [52, 50, 20, 20], [200, 200, 30, 30]],
        obj=[0.9, 0.8, 0.7],
        cls_probs=[[0.9, 0.1]] * 3,
    )
    dets, valid = single_image_nms(jnp.asarray(pred), conf_thres=0.25,
                                   iou_thres=0.45, merge=False, top_k=16)
    kept = np.asarray(dets)[np.asarray(valid)]
    assert kept.shape[0] == 2  # two clusters
    # highest score first
    assert kept[0, 4] >= kept[1, 4]


def test_nms_classes_do_not_suppress_each_other():
    pred = _make_pred(
        boxes_xywh=[[50, 50, 20, 20], [50, 50, 20, 20]],
        obj=[0.9, 0.8],
        cls_probs=[[1.0, 0.0], [0.0, 1.0]],
    )
    dets, valid = single_image_nms(jnp.asarray(pred), conf_thres=0.25,
                                   iou_thres=0.45, merge=False, top_k=16)
    kept = np.asarray(dets)[np.asarray(valid)]
    assert kept.shape[0] == 2
    assert set(kept[:, 5].astype(int)) == {0, 1}


def test_nms_conf_threshold_drops_all():
    pred = _make_pred([[50, 50, 20, 20]], [0.1], [[0.5, 0.5]])
    _, valid = single_image_nms(jnp.asarray(pred), conf_thres=0.9, top_k=8)
    assert not bool(np.asarray(valid).any())


def test_multi_label_expansion():
    # one box confidently two classes -> two detections at same location
    pred = _make_pred([[50, 50, 20, 20]], [0.9], [[0.9, 0.8, 0.01]])
    dets, valid = single_image_nms(jnp.asarray(pred), conf_thres=0.25,
                                   iou_thres=0.45, multi_label=True,
                                   merge=False, top_k=16)
    kept = np.asarray(dets)[np.asarray(valid)]
    assert kept.shape[0] == 2
    assert set(kept[:, 5].astype(int)) == {0, 1}


def test_against_torchvision():
    torchvision = pytest.importorskip("torchvision")
    if getattr(getattr(torchvision, "ops", None), "nms", None) is None:
        pytest.skip("torchvision is a parity-test shim, not the real pkg")
    import torch

    rng = np.random.default_rng(7)
    n = 200
    cx = rng.uniform(50, 450, n)
    cy = rng.uniform(50, 450, n)
    w = rng.uniform(5, 60, n)
    h = rng.uniform(5, 60, n)
    obj = rng.uniform(0, 1, n)
    cls = rng.dirichlet([1.0] * 3, n)
    pred = _make_pred(np.stack([cx, cy, w, h], 1), obj, cls)

    dets, valid = single_image_nms(jnp.asarray(pred), conf_thres=0.25,
                                   iou_thres=0.45, merge=False, top_k=512)
    ours = np.asarray(dets)[np.asarray(valid)]

    # reference pipeline (general.py:446-507, merge off, best-class only)
    x = torch.tensor(pred)
    keep0 = x[:, 4] > 0.25
    x = x[keep0]
    x[:, 5:] *= x[:, 4:5]
    boxes = torch.zeros_like(x[:, :4])
    boxes[:, 0] = x[:, 0] - x[:, 2] / 2
    boxes[:, 1] = x[:, 1] - x[:, 3] / 2
    boxes[:, 2] = x[:, 0] + x[:, 2] / 2
    boxes[:, 3] = x[:, 1] + x[:, 3] / 2
    conf, j = x[:, 5:].max(1, keepdim=True)
    keep1 = conf.view(-1) > 0.25
    det = torch.cat((boxes, conf, j.float()), 1)[keep1]
    c = det[:, 5:6] * 4096.0
    idx = torchvision.ops.nms(det[:, :4] + c, det[:, 4], 0.45)
    ref = det[idx].numpy()

    assert ours.shape[0] == ref.shape[0]
    # same boxes in same score order
    np.testing.assert_allclose(ours[:, 4], ref[:, 4], atol=1e-5)
    np.testing.assert_allclose(ours[:, :4], ref[:, :4], atol=1e-3)
    np.testing.assert_array_equal(ours[:, 5].astype(int), ref[:, 5].astype(int))


def _compare_to_ref(pred, *, conf_thres, iou_thres, multi_label, merge,
                    top_k, atol_box=1e-3):
    from ref_nms import ref_nms_numpy
    dets, valid = single_image_nms(
        jnp.asarray(pred), conf_thres=conf_thres, iou_thres=iou_thres,
        multi_label=multi_label, merge=merge, top_k=top_k)
    ours = np.asarray(dets)[np.asarray(valid)]
    ref = ref_nms_numpy(pred[None], conf_thres=conf_thres,
                        iou_thres=iou_thres, multi_label=multi_label,
                        merge=merge)[0]
    assert ours.shape[0] == ref.shape[0], (ours.shape, ref.shape)
    np.testing.assert_allclose(ours[:, 4], ref[:, 4], atol=1e-5)
    np.testing.assert_allclose(ours[:, :4], ref[:, :4], atol=atol_box)
    np.testing.assert_array_equal(ours[:, 5].astype(int),
                                  ref[:, 5].astype(int))
    return ours, ref


def _random_pred(rng, n, nc=3, lo=50, hi=450):
    cx = rng.uniform(lo, hi, n)
    cy = rng.uniform(lo, hi, n)
    w = rng.uniform(5, 60, n)
    h = rng.uniform(5, 60, n)
    obj = rng.uniform(0, 1, n)
    cls = rng.dirichlet([1.0] * nc, n)
    return _make_pred(np.stack([cx, cy, w, h], 1), obj, cls)


def test_golden_numpy_merge_off():
    """Always-running oracle (pure-numpy port of general.py:425-512)."""
    rng = np.random.default_rng(7)
    pred = _random_pred(rng, 300)
    _compare_to_ref(pred, conf_thres=0.25, iou_thres=0.45,
                    multi_label=False, merge=False, top_k=512)


def test_golden_numpy_multi_label():
    rng = np.random.default_rng(11)
    pred = _random_pred(rng, 300)
    _compare_to_ref(pred, conf_thres=0.25, iou_thres=0.45,
                    multi_label=True, merge=False, top_k=1024)


def test_golden_numpy_merge_on():
    """Merge-NMS parity: weighted box fusion AND the redundancy drop. Boxes
    are clustered so merge changes coordinates and isolated winners exist."""
    rng = np.random.default_rng(13)
    # clusters of jittered boxes -> redundant winners, merged coords
    centers = rng.uniform(80, 420, (12, 2))
    rows = []
    for c in centers:
        k = rng.integers(2, 6)
        for _ in range(k):
            rows.append([c[0] + rng.normal(0, 2), c[1] + rng.normal(0, 2),
                         30 + rng.normal(0, 1.5), 30 + rng.normal(0, 1.5)])
    # a few isolated boxes (no neighbor -> dropped by the redundancy rule)
    for _ in range(5):
        rows.append([rng.uniform(60, 440), rng.uniform(60, 440), 8, 8])
    n = len(rows)
    obj = rng.uniform(0.4, 1.0, n)
    cls = rng.dirichlet([2.0, 1.0], n)
    pred = _make_pred(np.asarray(rows), obj, cls)
    ours, ref = _compare_to_ref(pred, conf_thres=0.25, iou_thres=0.45,
                                multi_label=False, merge=True, top_k=256)
    assert ours.shape[0] > 0
    # the redundancy rule must have dropped at least one isolated winner
    no_merge, _ = _compare_to_ref(pred, conf_thres=0.25, iou_thres=0.45,
                                  multi_label=False, merge=False, top_k=256)
    assert ours.shape[0] < no_merge.shape[0]


def test_golden_numpy_merge_gate_large_n():
    """With >= 3000 candidates the reference disables merge (general.py:499);
    ours must reproduce the gate so dense eval batches stay comparable."""
    rng = np.random.default_rng(17)
    pred = _random_pred(rng, 3500, nc=2)
    pred[:, 4] = rng.uniform(0.3, 1.0, len(pred))  # all above conf
    _compare_to_ref(pred, conf_thres=0.25, iou_thres=0.45,
                    multi_label=False, merge=True, top_k=4096)


def test_golden_numpy_single_candidate():
    """n == 1 closes the merge gate (1 < n fails): the lone box survives."""
    pred = _make_pred([[100, 100, 20, 20]], [0.9], [[0.9, 0.1]])
    ours, ref = _compare_to_ref(pred, conf_thres=0.25, iou_thres=0.45,
                                multi_label=False, merge=True, top_k=16)
    assert ours.shape[0] == 1


def test_batched_shapes():
    rng = np.random.default_rng(3)
    preds = rng.uniform(0, 1, (4, 64, 13)).astype(np.float32)
    preds[..., :4] *= 500
    dets, valid = batched_nms(jnp.asarray(preds), conf_thres=0.1,
                              max_det=50, top_k=128)
    assert dets.shape == (4, 50, 6)
    assert valid.shape == (4, 50)


def test_approx_topk_matches_exact_when_candidates_fit():
    """The serving-path approx_topk knob must be a no-op whenever the
    candidates clearing conf_thres fit in top_k (the production regime:
    conf 0.25 passes a few hundred boxes, k=512). On CPU approx_max_k
    falls back to exact; the invariant still pins the wiring."""
    rng = np.random.default_rng(11)
    n = 2048
    pred = rng.uniform(0, 1, (n, 13)).astype(np.float32)
    pred[:, :4] = rng.uniform(20, 480, (n, 4))
    pred[:, 4] = rng.uniform(0, 0.3, n)
    pred[:100, 4] = rng.uniform(0.5, 1.0, 100)  # 100 real candidates
    kw = dict(conf_thres=0.4, iou_thres=0.45, multi_label=False,
              merge=True, top_k=512, max_det=50)
    d0, v0 = single_image_nms(jnp.asarray(pred), approx_topk=False, **kw)
    d1, v1 = single_image_nms(jnp.asarray(pred), approx_topk=True, **kw)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), atol=1e-6)
