"""Fused LayerNorm kernels: interpret-mode correctness vs flax + gradients.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from flax import linen as nn

from sodt_tpu.pallas import layernorm as L


def _ref(x, s, b, eps=1e-5):
    return nn.LayerNorm(epsilon=eps).apply(
        {"params": {"scale": s, "bias": b}}, x)


@pytest.fixture
def data():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 2, (64, 128)).astype(np.float32))
    s = jnp.asarray(rng.normal(1, 0.2, (128,)).astype(np.float32))
    b = jnp.asarray(rng.normal(0, 0.2, (128,)).astype(np.float32))
    return x, s, b


def test_reference_ln_matches_flax(data):
    x, s, b = data
    np.testing.assert_allclose(np.asarray(L._reference_ln(x, s, b, 1e-5)),
                               np.asarray(_ref(x, s, b)), atol=1e-5)


def test_pallas_ln_interpret(data):
    from jax.experimental.pallas import tpu as pltpu
    x, s, b = data
    with pltpu.force_tpu_interpret_mode():
        y = L._pallas_ln(x, s, b, 1e-5)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(x, s, b)),
                               atol=1e-5)


def test_pallas_add_ln_interpret(data):
    from jax.experimental.pallas import tpu as pltpu
    x, s, b = data
    a = x * 0.3 + 1.0
    with pltpu.force_tpu_interpret_mode():
        ssum, y = L._pallas_add_ln(a, x, s, b, 1e-5)
    np.testing.assert_allclose(np.asarray(ssum), np.asarray(a + x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(y), np.asarray(_ref(a + x, s, b)),
                               atol=1e-5)


def test_ln_grad_analytic_vs_autodiff(data):
    x, s, b = data

    def loss_ref(x_, s_, b_):
        return jnp.sum(jnp.sin(_ref(x_, s_, b_)))

    gx, gs, gb = jax.grad(loss_ref, argnums=(0, 1, 2))(x, s, b)
    g = jnp.cos(_ref(x, s, b))  # d loss / d LN-output
    dx, dscale, dbias = L._ln_grad(x, s, g, 1e-5)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(gx), atol=2e-5)
    np.testing.assert_allclose(np.asarray(dscale), np.asarray(gs), atol=2e-4)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(gb), atol=2e-4)


def test_add_ln_fallback_grads(data):
    """Public add_layernorm on CPU (fallback path) must be differentiable
    and match autodiff of the unfused expression."""
    x, s, b = data
    a = x * 0.5

    def fused(a_, b_, s_, bias_):
        ssum, y = L.add_layernorm(a_, b_, s_, bias_)
        return jnp.sum(y ** 2) + jnp.sum(ssum * 0.1)

    def unfused(a_, b_, s_, bias_):
        ssum = a_ + b_
        y = _ref(ssum, s_, bias_)
        return jnp.sum(y ** 2) + jnp.sum(ssum * 0.1)

    gf = jax.grad(fused, argnums=(0, 1, 2, 3))(a, x, s, b)
    gu = jax.grad(unfused, argnums=(0, 1, 2, 3))(a, x, s, b)
    for f, u in zip(gf, gu):
        np.testing.assert_allclose(np.asarray(f), np.asarray(u), atol=3e-4)
