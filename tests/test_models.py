"""Model compiler + module shape/semantics tests."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sodt_tpu.models.compiler import parse_config, make_divisible
from sodt_tpu.models import build_model
from sodt_tpu.models.swin import (SwinBlock, PatchMerging, window_partition,
                                  window_unpartition, shift_attn_mask,
                                  relative_position_index)
from sodt_tpu.models.cattention import CAttention, CAttentionBlock
from sodt_tpu.models.detect import detect_bias_init, decode_detections

ROOT = Path(__file__).parent.parent
TINY = str(Path(__file__).parent / "tiny.yaml")


def test_make_divisible():
    assert make_divisible(256 * 0.5) == 128
    assert make_divisible(100 * 0.5) == 56
    assert make_divisible(3) == 8


def test_parse_all_configs():
    expect = {
        "yolo5m.yaml": (3, "unified", (192, 384, 768), (8.0, 16.0, 32.0)),
        "SRyolo_PF.yaml": (4, "unified", (128,), (4.0,)),
        "SRyolo_MF.yaml": (3, "unified", (128,), (4.0,)),
        "model.yaml": (4, "split", (128,), (4.0,)),
        "SRyolo_resnet50.yaml": (3, "split", (128,), (4.0,)),
    }
    for name, (ch, mode, det_ch, strides) in expect.items():
        spec = parse_config(str(ROOT / "configs" / name), ch_in=ch)
        assert spec.mode == mode, name
        assert spec.detect_ch == det_ch, name
        assert spec.detect_strides == strides, name
        assert spec.head[-1].name == "Detect", name


def test_parse_depth_multiple():
    spec = parse_config(str(ROOT / "configs" / "yolo5m.yaml"))
    c3_reps = [ld.args[1] for ld in spec.backbone if ld.name == "C3"]
    # yolo5m gd=0.67: n=3 -> 2, n=9 -> 6
    assert c3_reps == [2, 6, 6, 2]


def test_sr_taps_parsed():
    spec = parse_config(str(ROOT / "configs" / "SRyolo_PF.yaml"), ch_in=4)
    assert spec.sr_taps == (4, 8)
    assert spec.sr_ch == (128, 512)


def test_window_partition_roundtrip():
    x = jnp.arange(2 * 16 * 16 * 3, dtype=jnp.float32).reshape(2, 16, 16, 3)
    w = window_partition(x, 8)
    assert w.shape == (2 * 4, 64, 3)
    back = window_unpartition(w, 8, (16, 16))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_shift_mask_blocks_cross_region_attention():
    m = shift_attn_mask(16, 16, 8, 2)
    assert m.shape == (4, 64, 64)
    assert (m == 0).any() and (m == -100).any()
    # the first window (interior) has no boundary crossings
    np.testing.assert_array_equal(m[0], np.zeros((64, 64)))


def test_relative_position_index_symmetry():
    idx = relative_position_index(4)
    assert idx.shape == (16, 16)
    assert idx.min() >= 0 and idx.max() < (2 * 4 - 1) ** 2
    # relative offset of (i, j) is the mirror of (j, i)
    assert idx[0, 15] != idx[15, 0]
    assert idx[3, 3] == idx[7, 7]  # same relative offset (0, 0)


def test_swin_block_shapes_and_shift():
    for shift, linear in [(0, True), (2, False)]:
        blk = SwinBlock(dim=32, input_resolution=(16, 16), num_heads=4,
                        window_size=8, shift_size=shift, linear_mlp=linear)
        x = jnp.ones((2, 256, 32))
        v = blk.init(jax.random.PRNGKey(0), x)
        y = blk.apply(v, x)
        assert y.shape == (2, 256, 32)


def test_patch_merging():
    pm = PatchMerging(dim=8)
    x = jnp.arange(1 * 16 * 8, dtype=jnp.float32).reshape(1, 16, 8)
    v = pm.init(jax.random.PRNGKey(0), x, (4, 4))
    y = pm.apply(v, x, (4, 4))
    assert y.shape == (1, 4, 16)


def test_cattention_single_token_returns_v():
    """ws=1 windows -> softmax over one logit -> output == V exactly."""
    att = CAttention(num_heads=4)
    q = jnp.asarray(np.random.default_rng(0).normal(size=(8, 1, 16)),
                    jnp.float32)
    k = jnp.asarray(np.random.default_rng(1).normal(size=(8, 1, 16)),
                    jnp.float32)
    v = jnp.asarray(np.random.default_rng(2).normal(size=(8, 1, 16)),
                    jnp.float32)
    out = att.apply({}, q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(v), atol=1e-6)


def test_cattention_block_fast_path_is_ln_of_sum():
    """Live config (ws=1, shift=0): x_r = LN(r+g) etc."""
    blk = CAttentionBlock(embedding_dim=16, num_heads=4)
    rng = np.random.default_rng(0)
    r, g, b, ir = (jnp.asarray(rng.normal(size=(2, 8, 8, 16)), jnp.float32)
                   for _ in range(4))
    variables = blk.init(jax.random.PRNGKey(0), r, g, b, ir)
    xr, xg, xb, xir = blk.apply(variables, r, g, b, ir)

    def ln(x):  # init LN has scale 1 bias 0
        mu = x.mean(-1, keepdims=True)
        var = ((x - mu) ** 2).mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(var + 1e-5)

    np.testing.assert_allclose(np.asarray(xr), ln(np.asarray(r + g)),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(xir), ln(np.asarray(ir + g)),
                               atol=1e-4)


def test_detect_bias_init_values():
    import math
    init = detect_bias_init(nc=8, stride=4.0)
    b = np.asarray(init(None, (3 * 13,))).reshape(3, 13)
    np.testing.assert_allclose(b[:, 4], math.log(8 / (640 / 4) ** 2),
                               rtol=1e-6)
    np.testing.assert_allclose(b[:, 5:], math.log(0.6 / (8 - 0.99)),
                               rtol=1e-6)
    np.testing.assert_allclose(b[:, :4], 0.0)


def test_decode_centers_on_grid():
    # zero logits -> sigmoid 0.5 -> xy = (0.5*2-0.5+grid)*stride = (grid+0.5)*s
    raw = [jnp.zeros((1, 4, 4, 3, 13))]
    anchors = np.array([[[10, 13], [16, 30], [33, 23]]], np.float32)
    out = np.asarray(decode_detections(raw, anchors, (4.0,)))
    assert out.shape == (1, 4 * 4 * 3, 13)
    # first cell, first anchor: xy = 0.5*4 = 2, wh = anchor
    np.testing.assert_allclose(out[0, 0, :4], [2.0, 2.0, 10.0, 13.0],
                               atol=1e-5)
    # last cell: grid (3,3) -> xy = 14
    np.testing.assert_allclose(out[0, -1, :2], [14.0, 14.0], atol=1e-5)


def test_flagship_model_builds_and_runs_small():
    model = build_model(str(ROOT / "configs" / "model.yaml"), ch_in=4)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    out = model.apply(variables, x, x, train=False)
    raw = out["raw"]
    assert len(raw) == 1
    assert raw[0].shape == (1, 16, 16, 3, 13)   # stride 4, na=3, 5+8


def test_steam_fusion_mode():
    """RGB+IR+fusion: learned stems on each modality, concatenated
    (reference model.py:104-105,186-189)."""
    cfg = {
        "nc": 3, "depth_multiple": 1.0, "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "steam": [[-1, 1, "Conv", [8, 3, 1]]],
        "backbone": [
            [-1, 1, "Conv", [16, 3, 2]],
            [-1, 1, "Conv", [32, 3, 2]],
        ],
        "head": [
            [-1, 1, "Conv", [32, 1, 1]],
            [[2], 1, "Detect", ["nc", "anchors"]],
        ],
    }
    # steam outputs 8ch per modality -> backbone sees 16ch
    model = build_model(cfg, ch_in=16, input_mode="RGB+IR+fusion")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, x, train=False)
    out = model.apply(v, x, x, train=False)
    assert out["raw"][0].shape == (1, 16, 16, 3, 8)


def test_mf_input_mode():
    """RGB+IR+MF: the MF block consumes the [rgb, ir] pair
    (reference model.py:197-198)."""
    from pathlib import Path
    ROOT = Path(__file__).parent.parent
    model = build_model(str(ROOT / "configs" / "SRyolo_MF.yaml"), ch_in=3,
                        input_mode="RGB+IR+MF")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, x, train=False)
    out = model.apply(v, x, x, train=False)
    # stride 4 single level
    assert out["raw"][0].shape == (1, 16, 16, 3, 13)


def test_pos_embed_interpolated_at_off_config_size():
    """At sizes other than the config img_size the learned pos_embed must be
    bilinearly resampled onto the runtime grid, not silently dropped
    (round-2 weakness; reference backbone_vit.py:215-217 shape-errors)."""
    from sodt_tpu.models.backbone import ImageEncoderViT
    enc = ImageEncoderViT(img_size=64, embed_dim=32, num_heads=4,
                          out_chans=16, chan_embed_dim=8)
    x128 = jnp.zeros((1, 128, 128, 4), jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x128)
    base = enc.apply(variables, x128)
    # a nonzero pos_embed must change the output at the off-config size
    import jax as _jax
    bumped = _jax.tree_util.tree_map(lambda v: v, variables)
    p = dict(bumped["params"])
    assert p["pos_embed"].shape == (1, 16, 16, 32)
    p["pos_embed"] = jnp.ones_like(p["pos_embed"])
    out = enc.apply({"params": p}, x128)
    diff = float(jnp.abs(out[0] - base[0]).max())
    assert diff > 1e-4, "pos_embed silently dropped at off-config size"


def test_swin_block_fast384_path_matches_fallback(monkeypatch):
    """The c>256 kernel-split branch (round 4: LN in XLA, no-LN Pallas
    attention + MLP tails) must match the XLA fallback bit-for-tolerance
    on the SAME params — run with kernels forced on + interpret mode."""
    import contextlib
    from jax.experimental import pallas as pl
    import sodt_tpu.models.swin as swin_mod

    @contextlib.contextmanager
    def interpret_mode():
        orig = pl.pallas_call
        try:
            pl.pallas_call = lambda *a, **kw: orig(*a, interpret=True, **kw)
            yield
        finally:
            pl.pallas_call = orig

    rng = np.random.default_rng(7)
    # dim > 256 triggers fast384; both block flavors of flagship stage 2
    for shift, linear in [(0, True), (2, False)]:
        blk = SwinBlock(dim=288, input_resolution=(16, 16), num_heads=4,
                        window_size=8, shift_size=shift, linear_mlp=linear)
        x = jnp.asarray(rng.normal(size=(1, 256, 288)).astype(np.float32))
        v = blk.init(jax.random.PRNGKey(0), x)
        ref = blk.apply(v, x)                      # kernels off (CPU)
        monkeypatch.setattr(swin_mod, "kernels_enabled", lambda: True)
        with interpret_mode():
            out = blk.apply(v, x)
        monkeypatch.setattr(swin_mod, "kernels_enabled",
                            swin_mod.kernels_enabled, raising=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-3, atol=2e-3)
        monkeypatch.undo()


@pytest.mark.slow
def test_flagship_cross_size_apply():
    """A 512-family init must APPLY at other sizes: stage-3 keeps its
    fixed 32-window rel-pos table (pad-to-window, reference
    window_partition semantics) and pos_embed resamples — val.py --task
    study sweeps depend on this (the reference itself shape-errors,
    backbone_vit.py:215-217; PARITY.md 'Off-config image sizes')."""
    import jax
    import jax.numpy as jnp
    from sodt_tpu.models import build_model

    m = build_model("configs/model.yaml", ch_in=4, input_mode="RGB+IR")
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, x, train=False)
    t = v["params"]["l0"]["stage3_0"]["attn"][
        "relative_position_bias_table"]
    assert t.shape == (63 * 63, 12)  # (2*32-1)^2, image-size-independent
    for s in (96, 160):  # 96: pad-free stages + padded stage3;
        # 160: shifted stage-2 at a non-multiple map (20 % 8 != 0)
        xi = jnp.ones((1, s, s, 3), jnp.float32) * 0.5
        out = m.apply(v, xi, xi, train=False)
        assert bool(jnp.isfinite(out["raw"][0]).all())
