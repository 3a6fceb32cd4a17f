"""Evaluator integration: structure, determinism, and the speed task."""

from pathlib import Path

import numpy as np
import jax
import jax.numpy as jnp

from sodt_tpu.models import build_model
from sodt_tpu.data.synthetic import SyntheticVedai
from sodt_tpu.data.loader import make_eval_batches
from sodt_tpu.train.evaluate import evaluate, fitness_from_metrics

TINY = str(Path(__file__).parent / "tiny.yaml")


def test_evaluate_untrained_model_runs():
    model = build_model(TINY, ch_in=3, input_mode="RGB")
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x0, x0, train=False)
    ds = SyntheticVedai(n=4, img_size=64, nc=3)
    m = evaluate(model, variables, make_eval_batches(ds, 2, 64),
                 nc=3, img_size=64, top_k=256, max_det=50)
    assert m["seen"] == 4
    assert 0.0 <= m["map50"] <= 1.0
    assert np.isfinite(m["speed_ms"])
    assert len(m["nt"]) == 3
    f = fitness_from_metrics(m)
    assert 0.0 <= f <= 1.0


def test_evaluate_deterministic():
    model = build_model(TINY, ch_in=3, input_mode="RGB")
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(1), x0, x0, train=False)
    ds = SyntheticVedai(n=4, img_size=64, nc=3)
    m1 = evaluate(model, variables, make_eval_batches(ds, 2, 64),
                  nc=3, img_size=64, top_k=256, max_det=50)
    m2 = evaluate(model, variables, make_eval_batches(ds, 2, 64),
                  nc=3, img_size=64, top_k=256, max_det=50)
    assert m1["map50"] == m2["map50"]
    assert m1["nt"] == m2["nt"]


def test_bias_cache_matches_gather():
    """cache_rel_bias: eval through the cached rel-pos biases must produce
    bit-identical detections to the per-call gather path (swin config)."""
    from sodt_tpu.train.evaluate import cache_rel_bias, make_eval_step
    import yaml, tempfile, os
    cfg = {
        "nc": 3, "depth_multiple": 1.0, "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23]],
        "backbone": [[-1, 1, "Focus", [16, 3]],
                     [-1, 1, "Conv", [32, 3, 2]]],
        "head": [[-1, 1, "Detect", ["nc", "anchors"]]],
    }
    # use the swin-bearing flagship-like tiny: SwinBlock lives in the
    # ImageEncoderViT backbone; a direct module test is sharper
    from sodt_tpu.models.swin import SwinBlock
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return SwinBlock(dim=32, input_resolution=(16, 16), num_heads=4,
                             window_size=8, shift_size=0)(x)

    m = M()
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(1, 16, 16, 32)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    assert "bias_cache" in v  # init materializes the cache
    y_cached = m.apply(v, x)
    y_gather = m.apply({"params": v["params"]}, x)
    np.testing.assert_array_equal(np.asarray(y_cached),
                                  np.asarray(y_gather))


def test_hybrid_labels_seed_nms():
    """--save-hybrid: GT boxes enter NMS as unit-confidence candidates
    (reference general.py:447-453); masked label slots don't."""
    from pathlib import Path as _P
    from sodt_tpu.train.evaluate import make_eval_step
    model = build_model(str(_P(__file__).parent / "tiny.yaml"), ch_in=3,
                        input_mode="RGB")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, x, train=False)
    targets = np.zeros((1, 4, 5), np.float32)
    targets[0, 0] = [1, 0.5, 0.5, 0.25, 0.25]
    targets[0, 1] = [2, 0.25, 0.25, 0.10, 0.10]  # masked out below
    tmask = np.zeros((1, 4), bool)
    tmask[0, 0] = True
    step = make_eval_step(model, conf_thres=0.5, top_k=64, max_det=10,
                          hybrid_labels=True)
    dets, valid, _ = step(variables, x, x, jnp.asarray(targets),
                          jnp.asarray(tmask))
    d = np.asarray(dets[0])[np.asarray(valid[0])]
    # exactly the one unmasked GT survives (untrained model clears
    # nothing at conf 0.5): cxcywh (32,32,16,16) -> xyxy (24,24,40,40)
    assert len(d) == 1
    np.testing.assert_allclose(d[0, :4], [24, 24, 40, 40], atol=0.5)
    assert d[0, 4] > 0.99 and int(d[0, 5]) == 1


def test_evaluate_scan_matches_per_batch():
    """scan=True (one lax.scan dispatch for all eval batches) must give
    bit-identical metrics to the per-batch dispatch path — same step, one
    round trip instead of K."""
    model = build_model(TINY, ch_in=3, input_mode="RGB")
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x0, x0, train=False)
    ds = SyntheticVedai(n=8, img_size=64, nc=3)
    kw = dict(nc=3, img_size=64, top_k=256, max_det=50)
    m_scan = evaluate(model, variables, make_eval_batches(ds, 2, 64),
                      scan=True, **kw)
    m_loop = evaluate(model, variables, make_eval_batches(ds, 2, 64),
                      scan=False, **kw)
    assert m_scan["seen"] == m_loop["seen"] == 8
    assert m_scan["map50"] == m_loop["map50"]
    assert m_scan["map"] == m_loop["map"]
    assert m_scan["nt"] == m_loop["nt"]


def test_evaluate_runner_reuses_compiled_programs():
    """Trainer-style repeated eval through one EvalRunner must (a) match
    the runnerless path exactly and (b) reuse the same jitted scan
    executable across calls instead of re-tracing per epoch."""
    from sodt_tpu.train.evaluate import EvalRunner
    model = build_model(TINY, ch_in=3, input_mode="RGB")
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x0, x0, train=False)
    ds = SyntheticVedai(n=8, img_size=64, nc=3)
    kw = dict(nc=3, img_size=64, top_k=256, max_det=50)
    runner = EvalRunner(model, top_k=256, max_det=50)
    m1 = evaluate(model, variables, make_eval_batches(ds, 2, 64),
                  runner=runner, **kw)
    fn_after_first = runner._scan_fn
    m2 = evaluate(model, variables, make_eval_batches(ds, 2, 64),
                  runner=runner, **kw)
    m0 = evaluate(model, variables, make_eval_batches(ds, 2, 64), **kw)
    assert fn_after_first is not None
    assert runner._scan_fn is fn_after_first        # no per-call rebuild
    assert m1["map50"] == m2["map50"] == m0["map50"]
    assert m1["map"] == m0["map"] and m1["nt"] == m0["nt"]


def test_evaluate_rejects_mismatched_runner_protocol():
    """A prebuilt EvalRunner bakes its protocol into the compiled step;
    evaluate() must refuse to run under DIFFERENT protocol args instead
    of silently using the runner's (e.g. trainer eval at conf 0.25
    through a conf 0.001 runner)."""
    import pytest
    from sodt_tpu.train.evaluate import EvalRunner
    model = build_model(TINY, ch_in=3, input_mode="RGB")
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x0, x0, train=False)
    ds = SyntheticVedai(n=4, img_size=64, nc=3)
    runner = EvalRunner(model, top_k=256, max_det=50)
    with pytest.raises(ValueError, match="conf_thres"):
        evaluate(model, variables, make_eval_batches(ds, 2, 64),
                 nc=3, img_size=64, top_k=256, max_det=50,
                 conf_thres=0.25, runner=runner)
    # matching args run fine
    m = evaluate(model, variables, make_eval_batches(ds, 2, 64),
                 nc=3, img_size=64, top_k=256, max_det=50, runner=runner)
    assert m["seen"] == 4


def test_evaluate_stack_cache_matches_and_skips_rebuild():
    """stack_cache: the second evaluate() under the same key must not
    consume the batches iterator at all (no host rebuild, no re-upload)
    and must produce identical metrics to the uncached path."""
    from sodt_tpu.train.evaluate import EvalRunner
    model = build_model(TINY, ch_in=3, input_mode="RGB")
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(2), x0, x0, train=False)
    ds = SyntheticVedai(n=8, img_size=64, nc=3)
    kw = dict(nc=3, img_size=64, top_k=256, max_det=50)
    runner = EvalRunner(model, top_k=256, max_det=50)

    m0 = evaluate(model, variables, make_eval_batches(ds, 2, 64), **kw)
    m1 = evaluate(model, variables, make_eval_batches(ds, 2, 64),
                  runner=runner, stack_cache="val", **kw)
    assert "val" in runner._stacks

    consumed = []

    def poisoned():
        for b in make_eval_batches(ds, 2, 64):
            consumed.append(1)
            yield b

    m2 = evaluate(model, variables, poisoned(),
                  runner=runner, stack_cache="val", **kw)
    assert not consumed                      # iterator never touched
    assert m0["map50"] == m1["map50"] == m2["map50"]
    assert m0["map"] == m1["map"] == m2["map"]
    assert m0["seen"] == m2["seen"] == 8
    assert m0["nt"] == m2["nt"]
