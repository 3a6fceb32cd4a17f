"""Pallas window-attention kernel: interpreter-mode parity with the XLA
reference path (the kernel itself runs compiled only on TPU; tests exercise
the math via pallas interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sodt_tpu.pallas.window_attention import (
    _reference_attention, _pallas_attention, fused_window_attention,
    window_attention_core)
from sodt_tpu.models.swin import shift_attn_mask


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


def test_kernel_matches_reference_unmasked():
    w, nh, n, hd = 8, 2, 64, 16
    q, k, v = _rand((w, nh, n, hd), 0), _rand((w, nh, n, hd), 1), \
        _rand((w, nh, n, hd), 2)
    bias = _rand((nh, n, n), 3)
    ref = _reference_attention(q, k, v, bias, None, 4)
    from jax.experimental import pallas as pl
    import sodt_tpu.pallas.window_attention as wa
    # interpret mode: patch pallas_call
    orig = pl.pallas_call
    try:
        pl.pallas_call = lambda *a, **kw: orig(*a, interpret=True, **kw)
        out = wa._pallas_attention(q, k, v, bias, None, 4)
    finally:
        pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_kernel_matches_reference_masked():
    nh, n, hd = 2, 64, 16
    h_img = wimg = 16
    nw = 4
    b = 2
    w = b * nw
    q, k, v = _rand((w, nh, n, hd), 4), _rand((w, nh, n, hd), 5), \
        _rand((w, nh, n, hd), 6)
    bias = _rand((nh, n, n), 7)
    mask = shift_attn_mask(h_img, wimg, 8, 2)
    assert mask.shape[0] == nw
    ref = _reference_attention(q, k, v, bias, mask, nw)
    from jax.experimental import pallas as pl
    import sodt_tpu.pallas.window_attention as wa
    orig = pl.pallas_call
    try:
        pl.pallas_call = lambda *a, **kw: orig(*a, interpret=True, **kw)
        out = wa._pallas_attention(q, k, v, bias, mask, nw)
    finally:
        pl.pallas_call = orig
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_core_dispatches_to_reference_on_cpu():
    w, nh, n, hd = 4, 1, 16, 8
    q, k, v = _rand((w, nh, n, hd), 8), _rand((w, nh, n, hd), 9), \
        _rand((w, nh, n, hd), 10)
    bias = jnp.zeros((nh, n, n))
    out = window_attention_core(q, k, v, bias, None, 2)
    ref = _reference_attention(q, k, v, bias, None, 2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_custom_vjp_gradients_match_reference():
    w, nh, n, hd = 4, 1, 16, 8
    q, k, v = _rand((w, nh, n, hd), 11), _rand((w, nh, n, hd), 12), \
        _rand((w, nh, n, hd), 13)
    bias = _rand((nh, n, n), 14)

    def loss_ref(q, k, v, b):
        return jnp.sum(_reference_attention(q, k, v, b, None, 2) ** 2)

    from jax.experimental import pallas as pl
    import sodt_tpu.pallas.window_attention as wa
    orig = pl.pallas_call
    try:
        pl.pallas_call = lambda *a, **kw: orig(*a, interpret=True, **kw)

        def loss_pal(q, k, v, b):
            return jnp.sum(fused_window_attention(q, k, v, b, None, 2) ** 2)

        g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3))(q, k, v, bias)
    finally:
        pl.pallas_call = orig
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
