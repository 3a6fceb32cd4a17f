"""Fused window attention as a Pallas TPU kernel.

The XLA path of W-MSA materializes the (B*nW, nh, N, N) attention matrices
in HBM between the QK^T and PV matmuls — for the flagship stage-1 that is
~1.6 GB of f32 per block per batch-32 step, three times over (write scores,
read+write softmax, read PV). This kernel keeps the whole
scores -> +bias(+mask) -> softmax -> PV chain resident in VMEM per tile:

  layout   q, k, v: (W, nh, N, hd)   — W = B * num_windows total windows
           (the natural layout after the qkv projection reshape, so no
           HBM-scrambling transposes are introduced around the kernel)
  grid     (W // G, nh)              — G windows per program, G | num_windows
  blocks   q/k/v (G, 1, N, hd), bias (1, N, N) per head,
           optional mask (G, N, N) selected by window position
  compute  per window-group batched dot_generals; f32 accumulation on the
           MXU; softmax in f32 in VMEM; output cast back to the input dtype

Backward: `fused_window_attention` carries a custom VJP that recomputes the
reference XLA attention under jax.vjp — Pallas speed forward, XLA-autodiff
backward (standard remat trade, see pallas_guide.md Custom VJP pattern).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_attention(q, k, v, bias, mask, nw: int):
    """XLA reference: q,k,v (W, nh, N, hd); bias (nh, N, N);
    mask (nw, N, N) or None."""
    w, nh, n, hd = q.shape
    attn = jnp.einsum("whnd,whmd->whnm", q, k,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        attn = attn.reshape(w // nw, nw, nh, n, n)
        attn = attn + jnp.asarray(mask, attn.dtype)[None, :, None]
        attn = attn.reshape(w, nh, n, n)
    p = jax.nn.softmax(attn, axis=-1).astype(q.dtype)
    return jnp.einsum("whnm,whmd->whnd", p, v)


def _kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
    q = q_ref[:, 0].astype(jnp.float32)       # (G, N, hd)
    k = k_ref[:, 0].astype(jnp.float32)
    v = v_ref[:, 0]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)    # (G, N, N)
    scores = scores + bias_ref[0][None]
    p = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[:, 0] = out.astype(out_ref.dtype)


def _kernel_masked(q_ref, k_ref, v_ref, bias_ref, mask_ref, out_ref):
    q = q_ref[:, 0].astype(jnp.float32)
    k = k_ref[:, 0].astype(jnp.float32)
    v = v_ref[:, 0]
    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    scores = scores + bias_ref[0][None] + mask_ref[:]
    p = jax.nn.softmax(scores, axis=-1)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    out_ref[:, 0] = out.astype(out_ref.dtype)


def _pick_group(num_windows: int, n: int, hd: int) -> int:
    """Windows per program: bounded by VMEM, must divide num_windows."""
    budget = 48  # ~ (G * N * (2*hd + 2*N) * 4B) stays well under VMEM
    g = min(num_windows, budget)
    while num_windows % g:
        g -= 1
    return max(g, 1)


def _pallas_attention(q, k, v, bias, mask, nw: int):
    w, nh, n, hd = q.shape
    g = _pick_group(nw, n, hd)
    grid = (w // g, nh)

    qkv_spec = pl.BlockSpec((g, 1, n, hd), lambda j, h: (j, h, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, n, n), lambda j, h: (h, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, 1, n, hd), lambda j, h: (j, h, 0, 0),
                            memory_space=pltpu.VMEM)

    if mask is None:
        return pl.pallas_call(
            _kernel,
            grid=grid,
            in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        )(q, k, v, bias)

    nblocks_per_img = nw // g
    mask_spec = pl.BlockSpec(
        (g, n, n), lambda j, h: (j % nblocks_per_img, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel_masked,
        grid=grid,
        in_specs=[qkv_spec, qkv_spec, qkv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v, bias, jnp.asarray(mask, jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_window_attention(q, k, v, bias, mask, nw: int):
    """Fused W-MSA core. q,k,v: (W, nh, N, hd); bias: (nh, N, N) f32;
    mask: (nw, N, N) f32 or None; returns (W, nh, N, hd)."""
    return _pallas_attention(q, k, v, bias, mask, nw)


def _fwa_fwd(q, k, v, bias, mask, nw):
    return _pallas_attention(q, k, v, bias, mask, nw), (q, k, v, bias, mask)


def _fwa_bwd(nw, res, g):
    q, k, v, bias, mask = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_, b_: _reference_attention(q_, k_, v_, b_, mask, nw),
        q, k, v, bias)
    dq, dk, dv, db = vjp(g)
    return dq, dk, dv, db, None


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)


def window_attention_core(q, k, v, bias, mask, nw: int, *,
                          use_pallas: bool | None = None):
    """Dispatch: Pallas on TPU, XLA elsewhere (and under interpretation)."""
    if use_pallas is None:
        use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas:
        return fused_window_attention(q, k, v, bias, mask, nw)
    return _reference_attention(q, k, v, bias, mask, nw)
