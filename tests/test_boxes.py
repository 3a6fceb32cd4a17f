"""Unit tests for box geometry vs. hand-computed and torch-checked values."""

import numpy as np
import jax.numpy as jnp
import pytest

from sodt_tpu.ops import (
    xyxy2xywh, xywh2xyxy, xywhn2xyxy, bbox_iou, box_iou, wh_iou,
    clip_coords, scale_coords, letterbox_params,
)


def test_xywh_roundtrip():
    rng = np.random.default_rng(0)
    xyxy = rng.uniform(0, 100, (50, 4)).astype(np.float32)
    xyxy[:, 2:] = xyxy[:, :2] + np.abs(xyxy[:, 2:])  # ensure x2>x1, y2>y1
    back = np.asarray(xywh2xyxy(xyxy2xywh(jnp.asarray(xyxy))))
    np.testing.assert_allclose(back, xyxy, rtol=1e-5, atol=1e-4)


def test_xywhn2xyxy_known():
    x = jnp.array([[0.5, 0.5, 0.5, 0.5]])
    out = np.asarray(xywhn2xyxy(x, w=100, h=200, padw=10, padh=20))
    np.testing.assert_allclose(out, [[35.0, 70.0, 85.0, 170.0]], atol=1e-5)


def test_iou_identity_and_disjoint():
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    b = jnp.array([20.0, 20.0, 30.0, 30.0])
    assert float(bbox_iou(a, a)) == pytest.approx(1.0, abs=1e-5)
    assert float(bbox_iou(a, b)) == pytest.approx(0.0, abs=1e-7)


def test_iou_half_overlap():
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    b = jnp.array([5.0, 0.0, 15.0, 10.0])
    # inter 50, union 150
    assert float(bbox_iou(a, b)) == pytest.approx(1 / 3, abs=1e-5)


def test_ciou_less_than_iou_when_offset():
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    b = jnp.array([5.0, 5.0, 15.0, 15.0])
    iou = float(bbox_iou(a, b))
    ciou = float(bbox_iou(a, b, ciou=True))
    assert ciou < iou


def test_ciou_torch_parity():
    """Golden check vs the reference formula evaluated with torch."""
    torch = pytest.importorskip("torch")
    import math

    def ref_bbox_iou(box1, box2, eps=1e-7):  # CIoU, xywh input
        box2 = box2.T
        b1_x1, b1_x2 = box1[0] - box1[2] / 2, box1[0] + box1[2] / 2
        b1_y1, b1_y2 = box1[1] - box1[3] / 2, box1[1] + box1[3] / 2
        b2_x1, b2_x2 = box2[0] - box2[2] / 2, box2[0] + box2[2] / 2
        b2_y1, b2_y2 = box2[1] - box2[3] / 2, box2[1] + box2[3] / 2
        inter = (torch.min(b1_x2, b2_x2) - torch.max(b1_x1, b2_x1)).clamp(0) * \
                (torch.min(b1_y2, b2_y2) - torch.max(b1_y1, b2_y1)).clamp(0)
        w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
        w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
        union = w1 * h1 + w2 * h2 - inter + eps
        iou = inter / union
        cw = torch.max(b1_x2, b2_x2) - torch.min(b1_x1, b2_x1)
        ch = torch.max(b1_y2, b2_y2) - torch.min(b1_y1, b2_y1)
        c2 = cw ** 2 + ch ** 2 + eps
        rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2 +
                (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
        v = (4 / math.pi ** 2) * torch.pow(
            torch.atan(w2 / h2) - torch.atan(w1 / h1), 2)
        alpha = v / (v - iou + (1 + eps))
        return iou - (rho2 / c2 + v * alpha)

    rng = np.random.default_rng(1)
    b1 = rng.uniform(1, 50, (4, 32)).astype(np.float32)  # reference layout 4xN
    b2 = rng.uniform(1, 50, (32, 4)).astype(np.float32)
    ref = ref_bbox_iou(torch.tensor(b1), torch.tensor(b2)).numpy()
    ours = np.asarray(bbox_iou(jnp.asarray(b1.T), jnp.asarray(b2),
                               xyxy=False, ciou=True))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_box_iou_matrix_shape_and_values():
    a = jnp.array([[0.0, 0, 10, 10], [0, 0, 5, 5]])
    b = jnp.array([[0.0, 0, 10, 10], [5, 5, 10, 10], [100, 100, 110, 110]])
    m = np.asarray(box_iou(a, b))
    assert m.shape == (2, 3)
    assert m[0, 0] == pytest.approx(1.0, abs=1e-6)
    assert m[0, 1] == pytest.approx(0.25, abs=1e-6)
    assert m[0, 2] == pytest.approx(0.0)
    assert m[1, 1] == pytest.approx(0.0)


def test_wh_iou():
    m = np.asarray(wh_iou(jnp.array([[10.0, 10]]), jnp.array([[5.0, 5], [10, 10]])))
    np.testing.assert_allclose(m, [[0.25, 1.0]], atol=1e-6)


def test_clip_and_scale_coords():
    coords = jnp.array([[-5.0, -5.0, 700.0, 700.0, 0.9, 1.0]])
    clipped = np.asarray(clip_coords(coords, (480, 640)))
    np.testing.assert_allclose(clipped[0, :4], [0, 0, 640, 480])

    # letterbox 480x640 -> 512x512: gain=0.8, pad=(64,... ) then invert
    boxes = jnp.array([[64.0, 64.0, 448.0, 448.0]])
    out = np.asarray(scale_coords((512, 512), boxes, (480, 640)))
    g = min(512 / 480, 512 / 640)  # 0.8
    padw = (512 - 640 * g) / 2  # 0
    padh = (512 - 480 * g) / 2  # 64
    np.testing.assert_allclose(
        out[0],
        [(64 - padw) / g, (64 - padh) / g, (448 - padw) / g, (448 - padh) / g],
        atol=1e-4,
    )


def test_letterbox_params_matches_reference_math():
    # 1024x768 -> 512: r = 0.5, unpad (384, 512)... reference datasets.py:1151
    ratio, new_unpad, (dw, dh) = letterbox_params((1024, 768), 512)
    assert ratio == (0.5, 0.5)
    assert new_unpad == (384, 512)
    assert (dw, dh) == (64.0, 0.0)

    # no scaleup
    ratio, new_unpad, _ = letterbox_params((100, 100), 512, scaleup=False)
    assert ratio == (1.0, 1.0)
    assert new_unpad == (100, 100)
