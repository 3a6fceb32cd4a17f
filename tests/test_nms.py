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


def test_batched_shapes():
    rng = np.random.default_rng(3)
    preds = rng.uniform(0, 1, (4, 64, 13)).astype(np.float32)
    preds[..., :4] *= 500
    dets, valid = batched_nms(jnp.asarray(preds), conf_thres=0.1,
                              max_det=50, top_k=128)
    assert dets.shape == (4, 50, 6)
    assert valid.shape == (4, 50)
