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
