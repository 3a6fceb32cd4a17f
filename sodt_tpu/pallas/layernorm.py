"""Fused LayerNorm (+ residual add) as Pallas TPU kernels.

The round-1 trace showed LayerNorms ("convert_reduce_fusion") at ~20% of
the eval step — XLA lowers each LN into multiple HBM passes with f32
conversions around the reductions. These kernels do one read and one write
per tensor: bf16 rows stream through VMEM, the mean/var reduction and the
normalize run in f32 registers, output is written once.

Two surfaces:
  * layernorm(x, scale, bias, eps)             -> LN(x)
  * add_layernorm(a, b, scale, bias, eps)      -> (a+b, LN(a+b))
    (the Swin residual+norm pattern, backbone_vit.py:1084-1130 — fusing the
    add saves one full read+write of the residual stream)

Backward is analytic XLA (standard LN gradient), registered via custom_vjp
so training works everywhere; the Pallas path is forward-only speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_rows(r: int, c: int, budget: int = 4 * 1024 * 1024) -> int:
    """Largest power-of-two row block dividing r with ~budget f32 bytes."""
    br = 1
    while (br * 2 <= r and r % (br * 2) == 0 and
           br * 2 * c * 4 * 3 <= budget and br * 2 <= 4096):
        br *= 2
    return br


def _ln_rows(x, mu_keep=False, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    return (x32 - mu) * rstd


def _ln_rows_mxu(x, eps=1e-5):
    """LN stats via the MXU: the lane-axis (feature) reduction is the slow
    path on the VPU (measured 11-17 GB/s round 2); a dot with a ones
    matrix turns sum(x) and sum(x^2) into one (br, C) @ (C, 128) matmul
    each, which the MXU does at full tile rate. All 128 output columns
    hold the same sum; column 0 broadcasts back over the lanes."""
    c = x.shape[-1]
    x32 = x.astype(jnp.float32)
    ones = jnp.ones((c, 128), jnp.float32)
    stacked = jnp.concatenate([x32, x32 * x32], axis=0)       # (2br, C)
    sums = jax.lax.dot_general(
        stacked, ones, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (2br, 128)
    br = x.shape[0]
    mu = sums[:br, :1] * (1.0 / c)
    ex2 = sums[br:, :1] * (1.0 / c)
    var = ex2 - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    return (x32 - mu) * rstd


def _ln_kernel(x_ref, s_ref, b_ref, out_ref, *, eps: float):
    y = _ln_rows_mxu(x_ref[...], eps=eps)
    out_ref[...] = (y * s_ref[...] + b_ref[...]).astype(out_ref.dtype)


def _add_ln_kernel(a_ref, b_ref, s_ref, bias_ref, sum_ref, out_ref, *,
                   eps: float):
    s = a_ref[...] + b_ref[...]
    sum_ref[...] = s.astype(sum_ref.dtype)
    y = _ln_rows_mxu(s, eps=eps)
    out_ref[...] = (y * s_ref[...] + bias_ref[...]).astype(out_ref.dtype)


def _reference_ln(x, scale, bias, eps):
    y = _ln_rows(x, eps=eps)
    return (y * scale.astype(jnp.float32)
            + bias.astype(jnp.float32)).astype(x.dtype)


def _use_pallas(r: int, c: int) -> bool:
    """Measured on the v5e (round 2): with VPU lane-axis reductions the
    Pallas LN ran at 11-17 GB/s; the MXU-stats rewrite (_ln_rows_mxu)
    brings it to ~209 GB/s — but XLA's convert_reduce fusion measures the
    same (~235 GB/s) on identical shapes, so there is no end-to-end win
    and dispatch prefers XLA. The kernels stay for reference/interpret
    tests and as the base for future block-level fusions."""
    return False


def _pallas_ln(x2, scale, bias, eps):
    r, c = x2.shape
    br = _pick_rows(r, c)
    s2 = scale.reshape(1, c).astype(jnp.float32)
    b2 = bias.reshape(1, c).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, c), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), x2.dtype),
    )(x2, s2, b2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ln_core(x2, scale, bias, eps):
    return _pallas_ln(x2, scale, bias, eps)


def _ln_core_fwd(x2, scale, bias, eps):
    return _pallas_ln(x2, scale, bias, eps), (x2, scale, bias)


def _ln_grad(x2, scale, g, eps):
    """Analytic LN backward (f32): returns (dx, dscale, dbias)."""
    x32 = x2.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mu) * rstd
    gs = g32 * scale.astype(jnp.float32)
    dx = rstd * (gs - jnp.mean(gs, axis=-1, keepdims=True)
                 - xhat * jnp.mean(gs * xhat, axis=-1, keepdims=True))
    dscale = jnp.sum(g32 * xhat, axis=0)
    dbias = jnp.sum(g32, axis=0)
    return dx.astype(x2.dtype), dscale, dbias


def _ln_core_bwd(eps, res, g):
    x2, scale, bias = res
    dx, dscale, dbias = _ln_grad(x2, scale, g, eps)
    return dx, dscale.astype(scale.dtype), dbias.astype(bias.dtype)


_ln_core.defvjp(_ln_core_fwd, _ln_core_bwd)


def layernorm(x, scale, bias, eps: float = 1e-5):
    """LN over the last axis; Pallas on TPU, XLA reference elsewhere."""
    c = x.shape[-1]
    r = x.size // c
    if not _use_pallas(r, c):
        return _reference_ln(x, scale, bias, eps)
    x2 = x.reshape(r, c)
    return _ln_core(x2, scale, bias, eps).reshape(x.shape)


def _pallas_add_ln(a2, b2, scale, bias, eps):
    r, c = a2.shape
    br = _pick_rows(r, c)
    s2 = scale.reshape(1, c).astype(jnp.float32)
    bb2 = bias.reshape(1, c).astype(jnp.float32)
    return pl.pallas_call(
        functools.partial(_add_ln_kernel, eps=eps),
        grid=(r // br,),
        in_specs=[
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((br, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((r, c), a2.dtype),
                   jax.ShapeDtypeStruct((r, c), a2.dtype)),
    )(a2, b2, s2, bb2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _add_ln_core(a2, b2, scale, bias, eps):
    return _pallas_add_ln(a2, b2, scale, bias, eps)


def _add_ln_core_fwd(a2, b2, scale, bias, eps):
    out = _pallas_add_ln(a2, b2, scale, bias, eps)
    return out, (a2, b2, scale, bias)


def _add_ln_core_bwd(eps, res, gs):
    a2, b2, scale, bias = res
    g_sum, g_ln = gs
    s = (a2.astype(jnp.float32) + b2.astype(jnp.float32)).astype(a2.dtype)
    dx, dscale, dbias = _ln_grad(s, scale, g_ln, eps)
    dsum = (g_sum.astype(jnp.float32) + dx.astype(jnp.float32)).astype(
        a2.dtype)
    return dsum, dsum, dscale.astype(scale.dtype), dbias.astype(bias.dtype)


_add_ln_core.defvjp(_add_ln_core_fwd, _add_ln_core_bwd)


def add_layernorm(a, b, scale, bias, eps: float = 1e-5):
    """(a+b, LN(a+b)) fused; Pallas on TPU, XLA elsewhere."""
    c = a.shape[-1]
    r = a.size // c
    if not _use_pallas(r, c):
        s = a + b
        return s, _reference_ln(s, scale, bias, eps)
    a2 = a.reshape(r, c)
    b2 = b.reshape(r, c)
    s2, y2 = _add_ln_core(a2, b2, scale, bias, eps)
    return s2.reshape(a.shape), y2.reshape(a.shape)
