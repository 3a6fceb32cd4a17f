"""Pallas window-attention kernel: interpreter-mode parity with the XLA
reference path (the kernel runs compiled only on TPU; these tests exercise
the math via pallas interpret mode on CPU)."""

import contextlib

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from sodt_tpu.pallas.window_attention import (
    reference_attention_qkv, _pallas_attention, fused_window_attention,
    window_attention_core)
from sodt_tpu.models.swin import shift_attn_mask


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32))


@contextlib.contextmanager
def interpret_mode():
    from jax.experimental import pallas as pl
    orig = pl.pallas_call
    try:
        pl.pallas_call = lambda *a, **kw: orig(*a, interpret=True, **kw)
        yield
    finally:
        pl.pallas_call = orig


def test_kernel_matches_reference_unmasked():
    w, nh, n, c = 8, 2, 64, 32
    qkv = _rand((w, n, 3 * c), 0)
    bias = _rand((nh, n, n), 3)
    scale = (c // nh) ** -0.5
    ref = reference_attention_qkv(qkv, bias, None, 4, nh, scale)
    with interpret_mode():
        out = _pallas_attention(qkv, bias, None, 4, nh, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_kernel_matches_reference_masked():
    nh, n, c = 2, 64, 32
    nw = 4
    w = 2 * nw
    qkv = _rand((w, n, 3 * c), 4)
    bias = _rand((nh, n, n), 7)
    mask = shift_attn_mask(16, 16, 8, 2)
    assert mask.shape[0] == nw
    scale = (c // nh) ** -0.5
    ref = reference_attention_qkv(qkv, bias, mask, nw, nh, scale)
    with interpret_mode():
        out = _pallas_attention(qkv, bias, mask, nw, nh, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_core_dispatches_to_reference_on_cpu():
    w, nh, n, c = 4, 1, 16, 8
    qkv = _rand((w, n, 3 * c), 8)
    bias = jnp.zeros((nh, n, n))
    out = window_attention_core(qkv, bias, None, 2, nh, 0.5)
    ref = reference_attention_qkv(qkv, bias, None, 2, nh, 0.5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_custom_vjp_gradients_match_reference():
    w, nh, n, c = 4, 1, 16, 8
    qkv = _rand((w, n, 3 * c), 11)
    bias = _rand((nh, n, n), 14)
    scale = (c // nh) ** -0.5

    def loss_ref(qkv, b):
        return jnp.sum(
            reference_attention_qkv(qkv, b, None, 2, nh, scale) ** 2)

    with interpret_mode():
        def loss_pal(qkv, b):
            return jnp.sum(
                fused_window_attention(qkv, b, None, 2, nh, scale) ** 2)

        g_pal = jax.grad(loss_pal, argnums=(0, 1))(qkv, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1))(qkv, bias)
    for a, b in zip(g_pal, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pallas_backward_matches_autodiff():
    """The hand-written backward kernel (interpret mode) matches jax.vjp of
    the reference attention."""
    from sodt_tpu.pallas.window_attention import _pallas_attention_bwd
    nh, n, c = 2, 64, 32
    nw = 4
    w = 2 * nw
    qkv = _rand((w, n, 3 * c), 21)
    bias = _rand((nh, n, n), 22)
    gy = _rand((w, n, c), 23)
    scale = (c // nh) ** -0.5
    mask = shift_attn_mask(16, 16, 8, 2)

    for m in (None, mask):
        _, vjp = jax.vjp(
            lambda q_, b_: reference_attention_qkv(q_, b_, m, nw, nh, scale),
            qkv, bias)
        want_dqkv, want_dbias = vjp(gy)
        with interpret_mode():
            got_dqkv, got_dbias = _pallas_attention_bwd(
                qkv, bias, m, nw, nh, scale, gy)
        np.testing.assert_allclose(np.asarray(got_dqkv),
                                   np.asarray(want_dqkv),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got_dbias),
                                   np.asarray(want_dbias),
                                   rtol=2e-3, atol=2e-3)


def test_nhwc_strip_kernel_matches_reference():
    from sodt_tpu.pallas.window_attention import (
        reference_attention_nhwc, _pallas_attention_nhwc)
    nh, c, ws = 2, 32, 8
    b, h, w = 2, 16, 24
    qkv = _rand((b, h, w, 3 * c), 31)
    bias = _rand((nh, ws * ws, ws * ws), 32)
    scale = (c // nh) ** -0.5
    mask = shift_attn_mask(h, w, ws, 2)
    for m in (None, mask):
        ref = reference_attention_nhwc(qkv, bias, m, ws, nh, scale)
        with interpret_mode():
            out = _pallas_attention_nhwc(qkv, bias, m, ws, nh, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)


def test_nhwc_strip_backward_matches_autodiff():
    from sodt_tpu.pallas.window_attention import (
        reference_attention_nhwc, _pallas_attention_nhwc_bwd)
    nh, c, ws = 2, 16, 4
    b, h, w = 1, 8, 12
    qkv = _rand((b, h, w, 3 * c), 41)
    bias = _rand((nh, ws * ws, ws * ws), 42)
    gy = _rand((b, h, w, c), 43)
    scale = (c // nh) ** -0.5
    mask = shift_attn_mask(h, w, ws, 2)
    for m in (None, mask):
        _, vjp = jax.vjp(
            lambda q_, b_: reference_attention_nhwc(q_, b_, m, ws, nh,
                                                    scale), qkv, bias)
        want_dqkv, want_dbias = vjp(gy)
        with interpret_mode():
            got_dqkv, got_dbias = _pallas_attention_nhwc_bwd(
                qkv, bias, m, ws, nh, scale, gy)
        np.testing.assert_allclose(np.asarray(got_dqkv),
                                   np.asarray(want_dqkv),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got_dbias),
                                   np.asarray(want_dbias),
                                   rtol=2e-3, atol=2e-3)


def test_nhwc_packed_superwindows_forward():
    """Window packing (N<128 -> m windows per superwindow with NEG_PACK
    block-diagonal bias) must be numerically invisible."""
    from sodt_tpu.pallas.window_attention import (
        reference_attention_nhwc, _pallas_attention_nhwc, _pick_pack)
    for nh, c, ws, b, h, w in [(2, 32, 8, 2, 16, 32),   # N=64, gx=4, m=2
                               (2, 16, 4, 1, 8, 16)]:   # N=16, gx=4, m=4
        n = ws * ws
        assert _pick_pack(n, w // ws) > 1
        qkv = _rand((b, h, w, 3 * c), 51)
        bias = _rand((nh, n, n), 52)
        scale = (c // nh) ** -0.5
        mask = shift_attn_mask(h, w, ws, ws // 2)
        for m in (None, mask):
            ref = reference_attention_nhwc(qkv, bias, m, ws, nh, scale)
            with interpret_mode():
                out = _pallas_attention_nhwc(qkv, bias, m, ws, nh, scale)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)


def test_nhwc_packed_superwindows_backward():
    from sodt_tpu.pallas.window_attention import (
        reference_attention_nhwc, _pallas_attention_nhwc_bwd, _pick_pack)
    nh, c, ws = 2, 16, 4
    b, h, w = 1, 8, 16   # N=16, gx=4 -> packing engages
    n = ws * ws
    assert _pick_pack(n, w // ws) > 1
    qkv = _rand((b, h, w, 3 * c), 61)
    bias = _rand((nh, n, n), 62)
    gy = _rand((b, h, w, c), 63)
    scale = (c // nh) ** -0.5
    mask = shift_attn_mask(h, w, ws, 2)
    for m in (None, mask):
        _, vjp = jax.vjp(
            lambda q_, b_: reference_attention_nhwc(q_, b_, m, ws, nh,
                                                    scale), qkv, bias)
        want_dqkv, want_dbias = vjp(gy)
        with interpret_mode():
            got_dqkv, got_dbias = _pallas_attention_nhwc_bwd(
                qkv, bias, m, ws, nh, scale, gy)
        np.testing.assert_allclose(np.asarray(got_dqkv),
                                   np.asarray(want_dqkv),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(got_dbias),
                                   np.asarray(want_dbias),
                                   rtol=2e-3, atol=2e-3)


def test_global_attention_kernel_matches_reference():
    """Flash-style global kernel (stage-3 shape, scaled down)."""
    from sodt_tpu.pallas.window_attention import (
        _pallas_global_attention, reference_attention_nhwc)
    b, hw, c, nh = 2, 16, 64, 4
    qkv = _rand((b, hw, hw, 3 * c), 11)
    n = hw * hw
    bias = _rand((nh, n, n), 12)
    scale = (c // nh) ** -0.5
    ref = reference_attention_nhwc(qkv, bias, None, hw, nh, scale)
    with interpret_mode():
        out = _pallas_global_attention(qkv, bias, nh, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_global_attention_backward_matches_autodiff():
    from sodt_tpu.pallas.window_attention import (
        _pallas_global_attention_bwd, reference_attention_nhwc)
    b, hw, c, nh = 2, 16, 64, 4
    qkv = _rand((b, hw, hw, 3 * c), 13)
    n = hw * hw
    bias = _rand((nh, n, n), 14)
    scale = (c // nh) ** -0.5
    loss = lambda q, bi: (reference_attention_nhwc(
        q, bi, None, hw, nh, scale) ** 2).sum()
    out = reference_attention_nhwc(qkv, bias, None, hw, nh, scale)
    g = jax.grad(lambda q, bi: (reference_attention_nhwc(
        q, bi, None, hw, nh, scale) ** 2).sum(), argnums=(0, 1))(qkv, bias)
    with interpret_mode():
        dqkv, dbias = _pallas_global_attention_bwd(qkv, bias, nh, scale,
                                                   2.0 * out)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(g[0]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(g[1]),
                               rtol=2e-3, atol=2e-3)


def test_global_attention_backward_non256_rows():
    """N=400 (e.g. 640px stage-3: 20x20 tokens) does not divide 256: the
    row chunk must divide N or tail rows silently lose gradient. Regression
    for the rc=256 hard-code (round-2 advisor high)."""
    from sodt_tpu.pallas.window_attention import (
        _bwd_row_chunk, _pallas_global_attention_bwd,
        reference_attention_nhwc)
    assert _bwd_row_chunk(400) == 200
    assert _bwd_row_chunk(1024) == 256
    assert _bwd_row_chunk(257) is None  # prime > cap: caller must fall back
    b, hw, c, nh = 1, 20, 32, 2
    qkv = _rand((b, hw, hw, 3 * c), 15)
    n = hw * hw
    bias = _rand((nh, n, n), 16)
    scale = (c // nh) ** -0.5
    out = reference_attention_nhwc(qkv, bias, None, hw, nh, scale)
    g = jax.grad(lambda q, bi: (reference_attention_nhwc(
        q, bi, None, hw, nh, scale) ** 2).sum(), argnums=(0, 1))(qkv, bias)
    with interpret_mode():
        dqkv, dbias = _pallas_global_attention_bwd(qkv, bias, nh, scale,
                                                   2.0 * out)
    np.testing.assert_allclose(np.asarray(dqkv), np.asarray(g[0]),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(g[1]),
                               rtol=2e-3, atol=2e-3)


def test_block_attention_kernel_matches_compose():
    """Fused qkv+attn+proj kernel vs the XLA composition, masked and not,
    with and without the folded LayerNorm."""
    from sodt_tpu.pallas.window_attention import (
        _pallas_block_attention, _compose_block_attention)
    b, hw, c, nh, ws = 2, 16, 32, 4, 8
    x = _rand((b, hw, hw, c), 21)
    wqkv = _rand((c, 3 * c), 22) * 0.1
    bqkv = _rand((3 * c,), 23) * 0.1
    wp = _rand((c, c), 24) * 0.1
    bp = _rand((c,), 25) * 0.1
    n = ws * ws
    bias = _rand((nh, n, n), 26)
    lns = 1.0 + 0.2 * _rand((c,), 27)
    lnb = 0.2 * _rand((c,), 28)
    scale = (c // nh) ** -0.5
    for mask in (None, shift_attn_mask(hw, hw, ws, 2)):
        for ln in (None, (lns, lnb)):
            ref = _compose_block_attention(x, wqkv, bqkv, wp, bp, bias,
                                           mask, ws, nh, scale, ln=ln)
            with interpret_mode():
                out = _pallas_block_attention(x, wqkv, bqkv, wp, bp, bias,
                                              mask, ws, nh, scale, ln=ln)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-4, atol=1e-4)


def test_block_attention_gradients_match_compose():
    from sodt_tpu.pallas import window_attention as wa
    b, hw, c, nh, ws = 2, 16, 32, 4, 8
    x = _rand((b, hw, hw, c), 31)
    wqkv = _rand((c, 3 * c), 32) * 0.1
    bqkv = _rand((3 * c,), 33) * 0.1
    wp = _rand((c, c), 34) * 0.1
    bp = _rand((c,), 35) * 0.1
    n = ws * ws
    bias = _rand((nh, n, n), 36)
    scale = (c // nh) ** -0.5
    mask = shift_attn_mask(hw, hw, ws, 2)

    def loss_fused(*a):
        with interpret_mode():
            return (wa.fused_block_attention(*a, mask, ws, nh,
                                             scale) ** 2).sum()

    def loss_ref(*a):
        return (wa._compose_block_attention(*a, mask, ws, nh,
                                            scale) ** 2).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 3, 5))(x, wqkv, bqkv, wp, bp,
                                                    bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 3, 5))(x, wqkv, bqkv, wp, bp,
                                                  bias)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_fused_swin_block_megakernel_matches_compose():
    """Round-3 megakernel (LN1+qkv+attn+proj+res+LN2+MLP+res) vs the XLA
    composition, interpret mode."""
    from sodt_tpu.pallas.swin_block import (_pallas_swin_block,
                                            _compose_swin_block)
    b, hw, c, nh, ws = 2, 16, 32, 4, 8
    hid = 4 * c
    x = _rand((b, hw, hw, c), 41)
    lns1 = 1.0 + 0.1 * _rand((c,), 42)
    lnb1 = 0.1 * _rand((c,), 43)
    lns2 = 1.0 + 0.1 * _rand((c,), 44)
    lnb2 = 0.1 * _rand((c,), 45)
    wqkv = 0.1 * _rand((c, 3 * c), 46)
    bqkv = 0.1 * _rand((3 * c,), 47)
    wp = 0.1 * _rand((c, c), 48)
    bp = 0.1 * _rand((c,), 49)
    w1 = 0.1 * _rand((c, hid), 50)
    b1 = 0.1 * _rand((hid,), 51)
    w2 = 0.1 * _rand((hid, c), 52)
    b2 = 0.1 * _rand((c,), 53)
    bias = _rand((nh, ws * ws, ws * ws), 54)
    scale = (c // nh) ** -0.5
    args = (x, lns1, lnb1, wqkv, bqkv, wp, bp, lns2, lnb2, w1, b1, w2,
            b2, bias)
    ref = _compose_swin_block(*args, ws, nh, scale)
    with interpret_mode():
        out = _pallas_swin_block(*args, ws, nh, scale)
    # kernel GELU is tanh-form (no erf in Mosaic); compose uses exact erf
    # in f32 -> tolerance covers the <=5e-4 activation difference
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_conv_mlp_tail_matches_compose():
    """Conv-MLP tail kernel: halo row across the strip boundary and the
    zeroed bottom edge must reproduce the padded 2x2 conv exactly."""
    from sodt_tpu.pallas.swin_block import (_pallas_conv_tail,
                                            _compose_conv_tail)
    b, hw, c = 2, 16, 32
    x = _rand((b, hw, hw, c), 61)
    a = _rand((b, hw, hw, c), 62)
    lns = 1.0 + 0.1 * _rand((c,), 63)
    lnb = 0.1 * _rand((c,), 64)
    w1 = 0.1 * _rand((c, c), 65)
    b1 = 0.1 * _rand((c,), 66)
    wc = 0.1 * _rand((2, 2, c, c), 67)
    bc = 0.1 * _rand((c,), 68)
    w2 = 0.1 * _rand((c, c), 69)
    b2 = 0.1 * _rand((c,), 70)
    ref = _compose_conv_tail(x, a, lns, lnb, w1, b1, wc, bc, w2, b2)
    with interpret_mode():
        out = _pallas_conv_tail(x, a, lns, lnb, w1, b1, wc, bc, w2, b2, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_conv_mlp_tail_grad_matches_compose():
    """custom_vjp replay: grads of the fused tail equal the composition."""
    from sodt_tpu.pallas.swin_block import (fused_conv_mlp_tail,
                                            _compose_conv_tail)
    b, hw, c = 1, 8, 16
    x = _rand((b, hw, hw, c), 71)
    a = _rand((b, hw, hw, c), 72)
    lns = 1.0 + 0.1 * _rand((c,), 73)
    lnb = 0.1 * _rand((c,), 74)
    w1 = 0.1 * _rand((c, c), 75)
    b1 = 0.1 * _rand((c,), 76)
    wc = 0.1 * _rand((2, 2, c, c), 77)
    bc = 0.1 * _rand((c,), 78)
    w2 = 0.1 * _rand((c, c), 79)
    b2 = 0.1 * _rand((c,), 80)
    args = (x, a, lns, lnb, w1, b1, wc, bc, w2, b2)
    gref = jax.grad(lambda *aa: (_compose_conv_tail(*aa) ** 2).sum(),
                    argnums=tuple(range(10)))(*args)
    with interpret_mode():
        gfused = jax.grad(
            lambda *aa: (fused_conv_mlp_tail(*aa) ** 2).sum(),
            argnums=tuple(range(10)))(*args)
    for gr, gf in zip(gref, gfused):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-3, atol=1e-3)


def test_shift_folded_attention_matches_rolled_compose():
    """fused attention with shift>0 (VMEM strip assembly from two x views)
    must equal the composition on the explicitly rolled map."""
    from sodt_tpu.pallas.window_attention import (
        _pallas_block_attention, _compose_block_attention)
    b, hw, c, nh, ws, sh = 2, 16, 32, 4, 8, 2
    x = _rand((b, hw, hw, c), 81)
    wqkv = 0.1 * _rand((c, 3 * c), 82)
    bqkv = 0.1 * _rand((3 * c,), 83)
    wp = 0.1 * _rand((c, c), 84)
    bp = 0.1 * _rand((c,), 85)
    n = ws * ws
    bias = _rand((nh, n, n), 86)
    lns = 1.0 + 0.1 * _rand((c,), 87)
    lnb = 0.1 * _rand((c,), 88)
    scale = (c // nh) ** -0.5
    mask = shift_attn_mask(hw, hw, ws, sh)
    xr = jnp.roll(x, (-sh, -sh), (1, 2))
    ref = _compose_block_attention(xr, wqkv, bqkv, wp, bp, bias, mask,
                                   ws, nh, scale, ln=(lns, lnb))
    with interpret_mode():
        out = _pallas_block_attention(x, wqkv, bqkv, wp, bp, bias, mask,
                                      ws, nh, scale, ln=(lns, lnb),
                                      shift=sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_shift_folded_tail_matches_rolled_compose():
    """tail kernel with shift>0 un-rolls `a` while reading: must equal the
    composition on the explicitly rolled-back a."""
    from sodt_tpu.pallas.swin_block import (_pallas_conv_tail,
                                            _compose_conv_tail)
    b, hw, c, sh = 2, 16, 32, 2
    x = _rand((b, hw, hw, c), 91)
    a_s = _rand((b, hw, hw, c), 92)   # attention output, shifted coords
    lns = 1.0 + 0.1 * _rand((c,), 93)
    lnb = 0.1 * _rand((c,), 94)
    w1 = 0.1 * _rand((c, c), 95)
    b1 = 0.1 * _rand((c,), 96)
    wc = 0.1 * _rand((2, 2, c, c), 97)
    bc = 0.1 * _rand((c,), 98)
    w2 = 0.1 * _rand((c, c), 99)
    b2 = 0.1 * _rand((c,), 100)
    a_u = jnp.roll(a_s, (sh, sh), (1, 2))
    ref = _compose_conv_tail(x, a_u, lns, lnb, w1, b1, wc, bc, w2, b2)
    with interpret_mode():
        out = _pallas_conv_tail(x, a_s, lns, lnb, w1, b1, wc, bc, w2, b2,
                                8, shift=sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_shift_folded_pair_grads_match_rolled():
    """Gradients through the shift-folded attention+tail pair equal the
    explicit-roll composition (the custom_vjp replay applies the rolls)."""
    from sodt_tpu.pallas import window_attention as wa
    from sodt_tpu.pallas import swin_block as sb
    b, hw, c, nh, ws, sh = 1, 8, 16, 2, 4, 2
    x = _rand((b, hw, hw, c), 101)
    wqkv = 0.1 * _rand((c, 3 * c), 102)
    bqkv = 0.1 * _rand((3 * c,), 103)
    wp = 0.1 * _rand((c, c), 104)
    bp = 0.1 * _rand((c,), 105)
    n = ws * ws
    bias = _rand((nh, n, n), 106)
    lns1 = 1.0 + 0.1 * _rand((c,), 107)
    lnb1 = 0.1 * _rand((c,), 108)
    lns2 = 1.0 + 0.1 * _rand((c,), 109)
    lnb2 = 0.1 * _rand((c,), 110)
    w1 = 0.1 * _rand((c, c), 111)
    b1 = 0.1 * _rand((c,), 112)
    wc = 0.1 * _rand((2, 2, c, c), 113)
    bc = 0.1 * _rand((c,), 114)
    w2 = 0.1 * _rand((c, c), 115)
    b2 = 0.1 * _rand((c,), 116)
    scale = (c // nh) ** -0.5
    mask = shift_attn_mask(hw, hw, ws, sh)

    def loss_folded(x_, wqkv_, wp_, w1_, wc_, w2_):
        with interpret_mode():
            a = wa.fused_block_attention_ln(
                x_, lns1, lnb1, wqkv_, bqkv, wp_, bp, bias, mask, ws, nh,
                scale, sh)
            out = sb.fused_conv_mlp_tail(
                x_, a, lns2, lnb2, w1_, b1, wc_, bc, w2_, b2, sh)
        return (out ** 2).sum()

    def loss_ref(x_, wqkv_, wp_, w1_, wc_, w2_):
        xr = jnp.roll(x_, (-sh, -sh), (1, 2))
        a = wa._compose_block_attention(xr, wqkv_, bqkv, wp_, bp, bias,
                                        mask, ws, nh, scale,
                                        ln=(lns1, lnb1))
        a = jnp.roll(a, (sh, sh), (1, 2))
        out = sb._compose_conv_tail(x_, a, lns2, lnb2, w1_, b1, wc_, bc,
                                    w2_, b2)
        return (out ** 2).sum()

    args = (x, wqkv, wp, w1, wc, w2)
    gf = jax.grad(loss_folded, argnums=tuple(range(6)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
    for a_, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=2e-3, atol=2e-3)


def test_fused_swin_block_int8_close_to_compose():
    """int8 serving megakernel: the quantized projections must stay
    within per-channel-int8 tolerance of the bf16/f32 composition."""
    from sodt_tpu.pallas.swin_block import (_pallas_swin_block_q8,
                                            _compose_swin_block)
    b, hw, c, nh, ws = 2, 16, 32, 4, 8
    hid = 4 * c
    x = _rand((b, hw, hw, c), 121)
    lns1 = 1.0 + 0.1 * _rand((c,), 122)
    lnb1 = 0.1 * _rand((c,), 123)
    lns2 = 1.0 + 0.1 * _rand((c,), 124)
    lnb2 = 0.1 * _rand((c,), 125)
    wqkv = 0.1 * _rand((c, 3 * c), 126)
    bqkv = 0.1 * _rand((3 * c,), 127)
    wp = 0.1 * _rand((c, c), 128)
    bp = 0.1 * _rand((c,), 129)
    w1 = 0.1 * _rand((c, hid), 130)
    b1 = 0.1 * _rand((hid,), 131)
    w2 = 0.1 * _rand((hid, c), 132)
    b2 = 0.1 * _rand((c,), 133)
    bias = _rand((nh, ws * ws, ws * ws), 134)
    scale = (c // nh) ** -0.5
    args = (x, lns1, lnb1, wqkv, bqkv, wp, bp, lns2, lnb2, w1, b1, w2,
            b2, bias)
    ref = _compose_swin_block(*args, ws, nh, scale)
    with interpret_mode():
        out = _pallas_swin_block_q8(*args, ws, nh, scale)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err.max() / np.abs(np.asarray(ref)).max()
    assert rel < 0.05, f"int8 rel err {rel}"
    # and it must NOT be trivially identical (the quantization really ran)
    assert err.max() > 1e-6


def test_int8_shifted_pair_close_to_compose():
    """int8 variants of the shift-folded attention + conv tail stay within
    quantization tolerance of the bf16/f32 composition."""
    from sodt_tpu.pallas import window_attention as wa
    from sodt_tpu.pallas import swin_block as sb
    b, hw, c, nh, ws, sh = 1, 16, 32, 4, 8, 2
    x = _rand((b, hw, hw, c), 141)
    wqkv = 0.1 * _rand((c, 3 * c), 142)
    bqkv = 0.1 * _rand((3 * c,), 143)
    wp = 0.1 * _rand((c, c), 144)
    bp = 0.1 * _rand((c,), 145)
    bias = _rand((nh, ws * ws, ws * ws), 146)
    lns1 = 1.0 + 0.1 * _rand((c,), 147)
    lnb1 = 0.1 * _rand((c,), 148)
    lns2 = 1.0 + 0.1 * _rand((c,), 149)
    lnb2 = 0.1 * _rand((c,), 150)
    w1 = 0.1 * _rand((c, c), 151)
    b1 = 0.1 * _rand((c,), 152)
    wc = 0.1 * _rand((2, 2, c, c), 153)
    bc = 0.1 * _rand((c,), 154)
    w2 = 0.1 * _rand((c, c), 155)
    b2 = 0.1 * _rand((c,), 156)
    scale = (c // nh) ** -0.5
    mask = shift_attn_mask(hw, hw, ws, sh)

    xr = jnp.roll(x, (-sh, -sh), (1, 2))
    a_ref = wa._compose_block_attention(xr, wqkv, bqkv, wp, bp, bias,
                                        mask, ws, nh, scale,
                                        ln=(lns1, lnb1))
    out_ref = sb._compose_conv_tail(x, jnp.roll(a_ref, (sh, sh), (1, 2)),
                                    lns2, lnb2, w1, b1, wc, bc, w2, b2)
    with interpret_mode():
        a_q = wa._pallas_block_attention(x, wqkv, bqkv, wp, bp, bias,
                                         mask, ws, nh, scale,
                                         ln=(lns1, lnb1), shift=sh,
                                         int8=True)
        out_q = sb._pallas_conv_tail(x, a_q, lns2, lnb2, w1, b1, wc, bc,
                                     w2, b2, 8, shift=sh, int8=True)
    for got, ref in ((a_q, a_ref), (out_q, out_ref)):
        err = np.abs(np.asarray(got) - np.asarray(ref))
        rel = err.max() / np.abs(np.asarray(ref)).max()
        assert rel < 0.05, f"int8 rel err {rel}"
        assert err.max() > 1e-6  # quantization really ran


def test_q8_weight_and_dot_exactness():
    """Quantization helpers: _q8_weight per-channel scales reconstruct
    within one weight LSB; _q8_dot equals the manual numpy int8 GEMM."""
    from sodt_tpu.pallas.swin_block import _q8_weight, _q8_dot
    rng = np.random.default_rng(5)
    w = jnp.asarray(rng.normal(size=(64, 96)).astype(np.float32))
    wq, ws = _q8_weight(w)
    assert wq.dtype == jnp.int8 and ws.shape == (1, 96)
    recon = np.asarray(wq, np.float32) * np.asarray(ws)
    lsb = np.asarray(ws)  # one quant step per output channel
    assert (np.abs(recon - np.asarray(w)) <= lsb / 2 + 1e-7).all()

    x = jnp.asarray(rng.normal(size=(32, 64)).astype(np.float32))

    class _Ref:  # minimal ref-like wrapper for the helper's [...] reads
        def __init__(self, v):
            self.v = v

        def __getitem__(self, idx):
            return self.v

    out = _q8_dot(x, _Ref(wq), _Ref(jnp.asarray(ws)))
    sx = max(float(jnp.abs(x).max()), 1e-8) / 127.0
    xq = np.clip(np.round(np.asarray(x) / sx), -127, 127).astype(np.int32)
    manual = (xq @ np.asarray(wq, np.int32)).astype(np.float32) \
        * (np.asarray(ws) * sx)
    np.testing.assert_allclose(np.asarray(out), manual, rtol=1e-6)


# -------------------- c>256-safe split (round 4: no-LN kernels)

def test_fused_mlp_tail_matches_compose():
    """Linear-MLP no-LN tail: res1 + fc2(gelu(fc1(y)))."""
    from sodt_tpu.pallas.swin_block import (_pallas_mlp_tail,
                                            _compose_mlp_tail)
    b, hw, c = 2, 16, 32
    r = _rand((b, hw, hw, c), 101)
    y = _rand((b, hw, hw, c), 102)
    w1 = 0.1 * _rand((c, 4 * c), 103)
    b1 = 0.1 * _rand((4 * c,), 104)
    w2 = 0.1 * _rand((4 * c, c), 105)
    b2 = 0.1 * _rand((c,), 106)
    ref = _compose_mlp_tail(r, y, w1, b1, w2, b2)
    with interpret_mode():
        out = _pallas_mlp_tail(r, y, w1, b1, w2, b2, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_mlp_tail_grad_matches_compose():
    from sodt_tpu.pallas.swin_block import (fused_mlp_tail,
                                            _compose_mlp_tail)
    b, hw, c = 1, 8, 16
    r = _rand((b, hw, hw, c), 111)
    y = _rand((b, hw, hw, c), 112)
    w1 = 0.1 * _rand((c, 2 * c), 113)
    b1 = 0.1 * _rand((2 * c,), 114)
    w2 = 0.1 * _rand((2 * c, c), 115)
    b2 = 0.1 * _rand((c,), 116)
    args = (r, y, w1, b1, w2, b2)
    gref = jax.grad(lambda *aa: (_compose_mlp_tail(*aa) ** 2).sum(),
                    argnums=tuple(range(6)))(*args)
    with interpret_mode():
        gfused = jax.grad(lambda *aa: (fused_mlp_tail(*aa) ** 2).sum(),
                          argnums=tuple(range(6)))(*args)
    for gr, gf in zip(gref, gfused):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-3, atol=1e-3)


def test_fused_conv_mlp_tail_noln_matches_compose():
    """Conv-MLP no-LN tail: halo row comes from the NEXT strip of y and
    the bottom-edge fc1 halo is zeroed (reference pads the fc1 output)."""
    from sodt_tpu.pallas.swin_block import (_pallas_conv_tail_noln,
                                            _compose_conv_tail_noln)
    b, hw, c = 2, 16, 32
    r = _rand((b, hw, hw, c), 121)
    y = _rand((b, hw, hw, c), 122)
    w1 = 0.1 * _rand((c, c), 123)
    b1 = 0.1 * _rand((c,), 124)
    wc = 0.1 * _rand((2, 2, c, c), 125)
    bc = 0.1 * _rand((c,), 126)
    w2 = 0.1 * _rand((c, c), 127)
    b2 = 0.1 * _rand((c,), 128)
    ref = _compose_conv_tail_noln(r, y, w1, b1, wc, bc, w2, b2)
    with interpret_mode():
        out = _pallas_conv_tail_noln(r, y, w1, b1, wc, bc, w2, b2, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_conv_mlp_tail_noln_grad_matches_compose():
    from sodt_tpu.pallas.swin_block import (fused_conv_mlp_tail_noln,
                                            _compose_conv_tail_noln)
    b, hw, c = 1, 8, 16
    r = _rand((b, hw, hw, c), 131)
    y = _rand((b, hw, hw, c), 132)
    w1 = 0.1 * _rand((c, c), 133)
    b1 = 0.1 * _rand((c,), 134)
    wc = 0.1 * _rand((2, 2, c, c), 135)
    bc = 0.1 * _rand((c,), 136)
    w2 = 0.1 * _rand((c, c), 137)
    b2 = 0.1 * _rand((c,), 138)
    args = (r, y, w1, b1, wc, bc, w2, b2)
    gref = jax.grad(
        lambda *aa: (_compose_conv_tail_noln(*aa) ** 2).sum(),
        argnums=tuple(range(8)))(*args)
    with interpret_mode():
        gfused = jax.grad(
            lambda *aa: (fused_conv_mlp_tail_noln(*aa) ** 2).sum(),
            argnums=tuple(range(8)))(*args)
    for gr, gf in zip(gref, gfused):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   rtol=1e-3, atol=1e-3)


def test_noln_attention_shift_matches_rolled_compose():
    """fused_block_attention with shift>0 and NO in-kernel LN (the c=384
    front half) equals the composition on the explicitly rolled map."""
    from sodt_tpu.pallas.window_attention import (
        _pallas_block_attention, _compose_block_attention)
    b, hw, c, nh, ws, sh = 2, 16, 32, 4, 8, 2
    x = _rand((b, hw, hw, c), 141)
    wqkv = 0.1 * _rand((c, 3 * c), 142)
    bqkv = 0.1 * _rand((3 * c,), 143)
    wp = 0.1 * _rand((c, c), 144)
    bp = 0.1 * _rand((c,), 145)
    bias = _rand((nh, ws * ws, ws * ws), 146)
    scale = (c // nh) ** -0.5
    mask = shift_attn_mask(hw, hw, ws, sh)
    xr = jnp.roll(x, (-sh, -sh), (1, 2))
    ref = _compose_block_attention(xr, wqkv, bqkv, wp, bp, bias, mask,
                                   ws, nh, scale)
    with interpret_mode():
        out = _pallas_block_attention(x, wqkv, bqkv, wp, bp, bias, mask,
                                      ws, nh, scale, shift=sh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_noln_block_split_matches_xla_block():
    """End-to-end c>256 block split (LN1 -> no-LN attn(shift) -> unroll ->
    add+LN2 -> no-LN conv tail) equals the plain XLA block composition."""
    from sodt_tpu.pallas.window_attention import (
        _pallas_block_attention, _compose_block_attention)
    from sodt_tpu.pallas.swin_block import (_pallas_conv_tail_noln,
                                            _compose_conv_tail_noln)
    from sodt_tpu.pallas.layernorm import _reference_ln
    b, hw, c, nh, ws, sh = 1, 16, 32, 4, 8, 2
    x = _rand((b, hw, hw, c), 151)
    lns1 = 1.0 + 0.1 * _rand((c,), 152)
    lnb1 = 0.1 * _rand((c,), 153)
    lns2 = 1.0 + 0.1 * _rand((c,), 154)
    lnb2 = 0.1 * _rand((c,), 155)
    wqkv = 0.1 * _rand((c, 3 * c), 156)
    bqkv = 0.1 * _rand((3 * c,), 157)
    wp = 0.1 * _rand((c, c), 158)
    bp = 0.1 * _rand((c,), 159)
    w1 = 0.1 * _rand((c, c), 160)
    b1 = 0.1 * _rand((c,), 161)
    wc = 0.1 * _rand((2, 2, c, c), 162)
    bc = 0.1 * _rand((c,), 163)
    w2 = 0.1 * _rand((c, c), 164)
    b2 = 0.1 * _rand((c,), 165)
    bias = _rand((nh, ws * ws, ws * ws), 166)
    scale = (c // nh) ** -0.5
    mask = shift_attn_mask(hw, hw, ws, sh)

    # reference: the plain (pre-round-3) XLA block
    x1 = _reference_ln(x, lns1, lnb1, 1e-5)
    ar = _compose_block_attention(
        jnp.roll(x1, (-sh, -sh), (1, 2)), wqkv, bqkv, wp, bp, bias, mask,
        ws, nh, scale)
    a_u = jnp.roll(ar, (sh, sh), (1, 2))
    s = x + a_u
    yn = _reference_ln(s, lns2, lnb2, 1e-5)
    ref = _compose_conv_tail_noln(s, yn, w1, b1, wc, bc, w2, b2)

    with interpret_mode():
        a = _pallas_block_attention(x1, wqkv, bqkv, wp, bp, bias, mask,
                                    ws, nh, scale, shift=sh)
        a = jnp.roll(a, (sh, sh), (1, 2))
        s2 = x + a
        y2 = _reference_ln(s2, lns2, lnb2, 1e-5)
        out = _pallas_conv_tail_noln(s2, y2, w1, b1, wc, bc, w2, b2, 8)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_noln_tails_int8_close_to_compose():
    """int8 variants of the c>256-safe tails stay within per-channel-int8
    tolerance of the f32 composition (and actually quantize)."""
    from sodt_tpu.pallas.swin_block import (
        _pallas_mlp_tail, _compose_mlp_tail,
        _pallas_conv_tail_noln, _compose_conv_tail_noln)
    b, hw, c = 2, 16, 32
    r = _rand((b, hw, hw, c), 171)
    y = _rand((b, hw, hw, c), 172)
    w1l = 0.1 * _rand((c, 4 * c), 173)
    b1l = 0.1 * _rand((4 * c,), 174)
    w2l = 0.1 * _rand((4 * c, c), 175)
    b2l = 0.1 * _rand((c,), 176)
    ref = _compose_mlp_tail(r, y, w1l, b1l, w2l, b2l)
    with interpret_mode():
        out = _pallas_mlp_tail(r, y, w1l, b1l, w2l, b2l, 8, int8=True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err.max() / np.abs(np.asarray(ref)).max()
    assert 0 < rel < 0.05, f"int8 mlp tail rel err {rel}"

    w1 = 0.1 * _rand((c, c), 177)
    b1 = 0.1 * _rand((c,), 178)
    wc = 0.1 * _rand((2, 2, c, c), 179)
    bc = 0.1 * _rand((c,), 180)
    w2 = 0.1 * _rand((c, c), 181)
    b2 = 0.1 * _rand((c,), 182)
    ref = _compose_conv_tail_noln(r, y, w1, b1, wc, bc, w2, b2)
    with interpret_mode():
        out = _pallas_conv_tail_noln(r, y, w1, b1, wc, bc, w2, b2, 8,
                                     int8=True)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err.max() / np.abs(np.asarray(ref)).max()
    assert 0 < rel < 0.05, f"int8 conv tail rel err {rel}"
