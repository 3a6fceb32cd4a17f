"""Loss semantics: target assignment counts, masking, gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sodt_tpu.train.loss import (
    LossConfig, build_targets_level, compute_loss, smooth_bce,
    bce_with_logits,
)


def _cfg(nl=1, nc=3):
    return LossConfig(nc=nc,
                      anchors=tuple([(10, 13, 16, 30, 33, 23)] * nl),
                      strides=tuple([4.0, 8.0, 16.0][:nl]))


def test_smooth_bce():
    cp, cn = smooth_bce(0.0)
    assert (cp, cn) == (1.0, 0.0)
    cp, cn = smooth_bce(0.1)
    assert (cp, cn) == (0.95, 0.05)


def test_bce_matches_torch():
    torch = pytest.importorskip("torch")
    logits = np.random.default_rng(0).normal(size=(32,)).astype(np.float32)
    targets = (np.random.default_rng(1).uniform(size=32) > 0.5).astype(np.float32)
    ours = np.asarray(bce_with_logits(jnp.asarray(logits),
                                      jnp.asarray(targets), 1.3))
    ref = torch.nn.BCEWithLogitsLoss(
        pos_weight=torch.tensor([1.3]), reduction="none")(
        torch.tensor(logits), torch.tensor(targets)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_build_targets_center_cell_plus_neighbors():
    # one target at cell (8.3, 8.7) in a 16x16 grid: center + left (x frac
    # <0.5) + bottom (inverse y frac <0.5) -> 3 cells
    targets = np.zeros((1, 4, 5), np.float32)
    targets[0, 0] = [1, 8.3 / 16, 8.7 / 16, 12 / 64, 12 / 64]
    tmask = np.zeros((1, 4), bool)
    tmask[0, 0] = True
    anchors = jnp.asarray([[10, 13], [16, 30], [33, 23]], jnp.float32) / 4.0
    asn = build_targets_level(jnp.asarray(targets), jnp.asarray(tmask),
                              anchors, 16, 16, anchor_t=4.0)
    pos = np.asarray(asn["pos"])[0, 0]  # (na, 5)
    # wh in grid units: 12/4 = 3 px... anchor ratio filter:
    # anchors/4 = [2.5,3.25],[4,7.5],[8.25,5.75]; wh=3: ratios ok for first two
    offs_on = pos.any(axis=0)
    assert offs_on[0]          # center always
    assert offs_on[1]          # left neighbor (frac 0.3 < 0.5)
    assert offs_on[4]          # bottom neighbor (inv frac 0.3 < 0.5)
    assert not offs_on[2] and not offs_on[3]
    # grid indices: center (8,8); left (7,8); bottom (8,9)
    gi = np.asarray(asn["gi"])[0, 0, 0]
    gj = np.asarray(asn["gj"])[0, 0, 0]
    assert (gi[0], gj[0]) == (8, 8)
    assert (gi[1], gj[1]) == (7, 8)
    assert (gi[4], gj[4]) == (8, 9)


def test_build_targets_respects_mask_and_anchor_filter():
    targets = np.zeros((1, 2, 5), np.float32)
    targets[0, 0] = [0, 0.5, 0.5, 0.9, 0.9]   # huge box: 57.6 grid units
    targets[0, 1] = [0, 0.5, 0.5, 0.1, 0.1]   # masked off
    tmask = np.array([[True, False]])
    anchors = jnp.asarray([[2.5, 3.25]], jnp.float32)
    asn = build_targets_level(jnp.asarray(targets), jnp.asarray(tmask),
                              anchors, 64, 64, anchor_t=4.0)
    pos = np.asarray(asn["pos"])
    assert not pos[0, 1].any()          # masked target contributes nothing
    assert not pos[0, 0].any()          # ratio 57.6/2.5 > 4 filtered


def test_loss_runs_and_positive():
    cfg = _cfg()
    rng = np.random.default_rng(0)
    preds = [jnp.asarray(rng.normal(size=(2, 16, 16, 3, 8)).astype(np.float32))]
    targets = np.zeros((2, 8, 5), np.float32)
    targets[0, 0] = [1, 0.5, 0.5, 0.2, 0.2]
    tmask = np.zeros((2, 8), bool)
    tmask[0, 0] = True
    total, parts = compute_loss(preds, jnp.asarray(targets),
                                jnp.asarray(tmask), cfg)
    assert float(total) > 0
    assert all(np.isfinite(float(v)) for v in parts.values())


def test_loss_no_targets_only_obj():
    cfg = _cfg()
    preds = [jnp.zeros((2, 16, 16, 3, 8), jnp.float32)]
    targets = jnp.zeros((2, 8, 5), jnp.float32)
    tmask = jnp.zeros((2, 8), bool)
    total, parts = compute_loss(preds, targets, tmask, cfg)
    assert float(parts["box"]) == 0.0
    assert float(parts["cls"]) == 0.0
    assert float(parts["obj"]) > 0.0


def test_loss_scales_with_batch_size():
    cfg = _cfg()
    preds1 = [jnp.zeros((1, 8, 8, 3, 8), jnp.float32)]
    preds2 = [jnp.zeros((2, 8, 8, 3, 8), jnp.float32)]
    t1 = jnp.zeros((1, 4, 5), jnp.float32)
    t2 = jnp.zeros((2, 4, 5), jnp.float32)
    m1 = jnp.zeros((1, 4), bool)
    m2 = jnp.zeros((2, 4), bool)
    l1, _ = compute_loss(preds1, t1, m1, cfg)
    l2, _ = compute_loss(preds2, t2, m2, cfg)
    # reference multiplies by batch size (loss.py:163)
    assert float(l2) == pytest.approx(2 * float(l1), rel=1e-5)


def test_loss_gradients_finite():
    cfg = _cfg()
    rng = np.random.default_rng(3)
    p = jnp.asarray(rng.normal(size=(1, 16, 16, 3, 8)).astype(np.float32))
    targets = np.zeros((1, 4, 5), np.float32)
    targets[0, 0] = [2, 0.4, 0.6, 0.1, 0.15]
    targets[0, 1] = [0, 0.8, 0.2, 0.05, 0.08]
    tmask = np.array([[True, True, False, False]])

    def f(p):
        return compute_loss([p], jnp.asarray(targets), jnp.asarray(tmask),
                            cfg)[0]

    g = jax.grad(f)(p)
    assert bool(jnp.isfinite(g).all())
    assert float(jnp.abs(g).sum()) > 0
