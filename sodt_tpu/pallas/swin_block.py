"""Full Swin-block megakernels (round 3).

Round-2 profiling showed the fused attention kernel surrounded by ~115 ms
of XLA LN/residual/MLP work plus ~35 ms of kernel-boundary overhead per
batch-64 eval step (isolated stage-1 attention kernel 9.1 ms vs 15 ms
in-model). These kernels close that gap by moving the ENTIRE Swin block
(reference /root/reference/basics/models/backbone_vit.py:1011-1130) into
Pallas, so only the block input and output ever touch HBM:

  * `fused_swin_block` — non-shifted block with linear MLP, one program
    per row-strip: LN1 -> qkv GEMM -> windowed attention -> output
    projection -> +residual -> LN2 -> fc1 -> GELU -> fc2 -> +residual.
    Weights stay resident in VMEM across grid steps; qkv, attention
    scores, normed rows and the MLP hidden never leave the chip.
  * `fused_conv_mlp_tail` — the back half of a *shifted* block
    (conv-augmented MLP, backbone_vit.py:863-908): residual add + LN2 +
    fc1 + 2x2 conv + GELU + fc2 + residual. The 2x2 conv consumes one
    halo row below the strip; the kernel reads the NEXT strip of both
    inputs through a second BlockSpec (index map r+1, clamped) and
    zeroes the halo at the bottom edge. Note the reference zero-pads the
    fc1 OUTPUT before the VALID conv (fc1(0) != 0), so the bottom-edge
    halo must be zeroed after fc1, not before.

Backward replays the XLA composition under jax.custom_vjp (whose
attention core dispatches back into the hand-written Pallas backward
kernels): forward-speed kernels with reference gradients.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .layernorm import _ln_rows_mxu, layernorm
from .window_attention import (_pick_pack, pack_bias,
                               window_attention_core_nhwc)
from ..ops.activations import gelu


def _ln_rows_vpu(x, eps=1e-5):
    """Plain VPU-reduction LN stats for VMEM-resident rows. The MXU-stats
    trick (_ln_rows_mxu) wins for HBM-streaming kernels where the lane
    reduction is the bottleneck, but inside the megakernel the rows are
    already on-chip and the trick's f32 ones-matmuls occupy the MXU at
    its slow f32 rate between the surrounding bf16 GEMMs."""
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True) - mu * mu
    return (x32 - mu) * jax.lax.rsqrt(var + eps)


def _gelu_in_kernel(x32, out_dtype):
    """Tanh GELU: Mosaic has no erf/erfc lowering, so the in-kernel GELU
    is always the tanh form (max |diff| vs exact erf ~5e-4 — an order
    below bf16 resolution; production compute is bf16). The f32 torch
    golden paths never dispatch here (they run the XLA composition)."""
    del out_dtype
    return jax.nn.gelu(x32, approximate=True)


# ------------------------------------------------- int8 GEMM helpers
#
# Serving-path quantization (v5e MXU: int8 runs at 2x the bf16 rate):
# weights per-output-channel symmetric int8 (quantized in-graph outside
# the kernel — a few KB, one VPU pass), activations per-strip dynamic
# symmetric int8 (absmax computed in VMEM right before the GEMM).

def _q8_weight(w):
    """(K, N) compute-dtype -> (int8 (K, N), f32 (1, N) scales)."""
    w32 = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=0), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return q, s.reshape(1, -1)


def _q8_dot(x32, wq_ref, ws_ref):
    """f32 (M, K) activations -> quantize -> s8xs8->s32 MXU GEMM ->
    dequantized f32 (M, N)."""
    sx = jnp.maximum(jnp.max(jnp.abs(x32)), 1e-8) / 127.0
    xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * (ws_ref[...] * sx)


# --------------------------------------------- full block (linear MLP)

def _mega_kernel(x_ref, lns1_ref, lnb1_ref, wqkv_ref, bqkv_ref, wp_ref,
                 bp_ref, lns2_ref, lnb2_ref, w1_ref, b1_ref, w2_ref,
                 b2_ref, bias_ref, out_ref, *, ws: int, nh: int,
                 scale: float, pack: int, ln_stats=_ln_rows_vpu):
    strip = x_ref[0]                                  # (ws, W, C)
    rows, wdim, c = strip.shape
    flat = strip.reshape(rows * wdim, c)
    x32 = flat.astype(jnp.float32)

    ln1 = (ln_stats(flat) * lns1_ref[...]
           + lnb1_ref[...]).astype(strip.dtype)
    qkv = jax.lax.dot_general(
        ln1, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...]).astype(strip.dtype)   # (ws*W, 3C)

    g = wdim // ws
    n = ws * ws
    c3 = 3 * c
    hd = c // nh
    gp, np_ = g // pack, pack * n
    xw = qkv.reshape(ws, g, ws, c3).transpose(1, 0, 2, 3).reshape(
        gp, np_, c3)
    # Per-head python loop, deliberately: batching heads into one grouped
    # dot needs a (gp, np_, c) -> (gp, np_, nh, hd) view, and Mosaic
    # rejects splitting the minormost (lane) dim ("unsupported shape
    # cast", measured 2026-08-17). Batched dot_general unrolls per batch
    # element on Mosaic anyway, so a grouped dot would not raise the
    # K=hd MXU utilization either.
    heads = []
    for hh in range(nh):
        q = xw[:, :, hh * hd:(hh + 1) * hd] * jnp.asarray(scale, xw.dtype)
        k = xw[:, :, c + hh * hd:c + (hh + 1) * hd]
        v = xw[:, :, 2 * c + hh * hd:2 * c + (hh + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[hh][None]
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        heads.append(o.astype(strip.dtype))
    attn = jnp.concatenate(heads, axis=-1)            # (G/m, m*N, C)
    attn = attn.reshape(g, ws, ws, c).transpose(1, 0, 2, 3).reshape(
        rows * wdim, c)

    proj = jax.lax.dot_general(
        attn, wp_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + bp_ref[...]
    res1 = x32 + proj                                 # f32 (ws*W, C)

    ln2 = (ln_stats(res1) * lns2_ref[...]
           + lnb2_ref[...]).astype(strip.dtype)
    h1 = jax.lax.dot_general(
        ln2, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...]
    h1 = _gelu_in_kernel(h1, strip.dtype).astype(strip.dtype)
    y = jax.lax.dot_general(
        h1, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[...]
    out = res1 + y
    out_ref[0] = out.astype(out_ref.dtype).reshape(rows, wdim, c)


def _mega_q8_kernel(x_ref, lns1_ref, lnb1_ref, wqkv_ref, sqkv_ref,
                    bqkv_ref, wp_ref, sp_ref, bp_ref, lns2_ref, lnb2_ref,
                    w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
                    bias_ref, out_ref, *, ws: int, nh: int, scale: float,
                    pack: int, ln_stats=_ln_rows_vpu):
    """int8-GEMM variant of _mega_kernel: the four projections run
    s8xs8->s32 on the MXU; the attention core (head_dim-16 dots, softmax)
    stays bf16/f32. Serving-path only — the custom_vjp backward replays
    the bf16 composition."""
    strip = x_ref[0]                                  # (ws, W, C)
    rows, wdim, c = strip.shape
    flat = strip.reshape(rows * wdim, c)
    x32 = flat.astype(jnp.float32)

    ln1 = ln_stats(flat) * lns1_ref[...] + lnb1_ref[...]      # f32
    qkv = (_q8_dot(ln1, wqkv_ref, sqkv_ref)
           + bqkv_ref[...]).astype(strip.dtype)       # (ws*W, 3C)

    g = wdim // ws
    n = ws * ws
    c3 = 3 * c
    hd = c // nh
    gp, np_ = g // pack, pack * n
    xw = qkv.reshape(ws, g, ws, c3).transpose(1, 0, 2, 3).reshape(
        gp, np_, c3)
    heads = []
    for hh in range(nh):
        q = xw[:, :, hh * hd:(hh + 1) * hd] * jnp.asarray(scale, xw.dtype)
        k = xw[:, :, c + hh * hd:c + (hh + 1) * hd]
        v = xw[:, :, 2 * c + hh * hd:2 * c + (hh + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[hh][None]
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        heads.append(o.astype(strip.dtype))
    attn = jnp.concatenate(heads, axis=-1)
    attn = attn.reshape(g, ws, ws, c).transpose(1, 0, 2, 3).reshape(
        rows * wdim, c).astype(jnp.float32)

    res1 = x32 + _q8_dot(attn, wp_ref, sp_ref) + bp_ref[...]

    ln2 = ln_stats(res1) * lns2_ref[...] + lnb2_ref[...]
    h1 = _q8_dot(ln2, w1_ref, s1_ref) + b1_ref[...]
    h1 = _gelu_in_kernel(h1, strip.dtype)             # f32
    out = res1 + _q8_dot(h1, w2_ref, s2_ref) + b2_ref[...]
    out_ref[0] = out.astype(out_ref.dtype).reshape(rows, wdim, c)


def _row2(v):
    return v.reshape(1, -1)


def _pallas_swin_block(x, lns1, lnb1, wqkv, bqkv, wp, bp, lns2, lnb2,
                       w1, b1, w2, b2, bias, ws: int, nh: int,
                       scale: float, ln_stats=_ln_rows_vpu):
    b, h, w, c = x.shape
    grid = (b, h // ws)
    n = ws * ws
    gx = w // ws
    m = _pick_pack(n, gx)
    bias_p = pack_bias(bias, m)
    np_ = m * n

    x_spec = pl.BlockSpec((1, ws, w, c), lambda bi, r: (bi, r, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda bi, r: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    f32row = lambda v: _row2(v).astype(jnp.float32)
    args = [x, f32row(lns1), f32row(lnb1), wqkv, _row2(bqkv), wp,
            _row2(bp), f32row(lns2), f32row(lnb2), w1, _row2(b1), w2,
            _row2(b2), bias_p]
    in_specs = [x_spec] + [full(a.shape) for a in args[1:-1]] + [
        pl.BlockSpec((nh, np_, np_), lambda bi, r: (0, 0, 0),
                     memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        functools.partial(_mega_kernel, ws=ws, nh=nh, scale=scale, pack=m,
                          ln_stats=ln_stats),
        grid=grid, in_specs=in_specs, out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
    )(*args)


def _pallas_swin_block_q8(x, lns1, lnb1, wqkv, bqkv, wp, bp, lns2, lnb2,
                          w1, b1, w2, b2, bias, ws: int, nh: int,
                          scale: float):
    b, h, w, c = x.shape
    grid = (b, h // ws)
    n = ws * ws
    gx = w // ws
    m = _pick_pack(n, gx)
    bias_p = pack_bias(bias, m)
    np_ = m * n

    wqkv_q, sqkv = _q8_weight(wqkv)
    wp_q, sp = _q8_weight(wp)
    w1_q, s1 = _q8_weight(w1)
    w2_q, s2 = _q8_weight(w2)

    x_spec = pl.BlockSpec((1, ws, w, c), lambda bi, r: (bi, r, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda bi, r: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    f32row = lambda v: _row2(v).astype(jnp.float32)
    args = [x, f32row(lns1), f32row(lnb1), wqkv_q, sqkv, f32row(bqkv),
            wp_q, sp, f32row(bp), f32row(lns2), f32row(lnb2), w1_q, s1,
            f32row(b1), w2_q, s2, f32row(b2), bias_p]
    in_specs = [x_spec] + [full(a.shape) for a in args[1:-1]] + [
        pl.BlockSpec((nh, np_, np_), lambda bi, r: (0, 0, 0),
                     memory_space=pltpu.VMEM)]
    return pl.pallas_call(
        functools.partial(_mega_q8_kernel, ws=ws, nh=nh, scale=scale,
                          pack=m),
        grid=grid, in_specs=in_specs, out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
    )(*args)


def _compose_swin_block(x, lns1, lnb1, wqkv, bqkv, wp, bp, lns2, lnb2,
                        w1, b1, w2, b2, bias, ws, nh, scale):
    """XLA composition: off-TPU forward and the backward recompute path
    (its attention core dispatches to the Pallas fwd/bwd kernels on TPU)."""
    dt = x.dtype
    t = layernorm(x, lns1, lnb1)
    qkv = t @ wqkv.astype(dt) + bqkv.astype(dt)
    a = window_attention_core_nhwc(qkv, bias, None, ws, nh, scale)
    res1 = x + (a @ wp.astype(dt) + bp.astype(dt))
    t2 = layernorm(res1, lns2, lnb2)
    h1 = gelu(t2 @ w1.astype(dt) + b1.astype(dt))
    return res1 + (h1 @ w2.astype(dt) + b2.astype(dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(14, 15, 16, 17))
def fused_swin_block(x, lns1, lnb1, wqkv, bqkv, wp, bp, lns2, lnb2,
                     w1, b1, w2, b2, bias, ws: int, nh: int, scale: float,
                     int8: bool = False):
    """Entire non-shifted Swin block (linear MLP) as one Pallas kernel.

    x (B, H, W, C); LN scales/biases f32 (C,); wqkv (C, 3C); wp (C, C);
    w1 (C, hidden); w2 (hidden, C) — weights in compute dtype;
    bias (nh, N, N) f32 relative-position bias. int8=True runs the four
    projection GEMMs quantized on the MXU (serving path; the backward
    replays the bf16 composition, so do not train with it)."""
    fn = _pallas_swin_block_q8 if int8 else _pallas_swin_block
    return fn(x, lns1, lnb1, wqkv, bqkv, wp, bp, lns2,
              lnb2, w1, b1, w2, b2, bias, ws, nh, scale)


def _fsb_fwd(x, lns1, lnb1, wqkv, bqkv, wp, bp, lns2, lnb2, w1, b1, w2,
             b2, bias, ws, nh, scale, int8):
    fn = _pallas_swin_block_q8 if int8 else _pallas_swin_block
    out = fn(x, lns1, lnb1, wqkv, bqkv, wp, bp, lns2,
             lnb2, w1, b1, w2, b2, bias, ws, nh, scale)
    return out, (x, lns1, lnb1, wqkv, bqkv, wp, bp, lns2, lnb2, w1, b1,
                 w2, b2, bias)


def _fsb_bwd(ws, nh, scale, int8, res, g):
    _, vjp = jax.vjp(
        lambda *a: _compose_swin_block(*a, ws, nh, scale), *res)
    return vjp(g)


fused_swin_block.defvjp(_fsb_fwd, _fsb_bwd)


# ------------------------------------------- conv-MLP tail (shifted blocks)

def _conv_tail_kernel(x_ref, a_ref, xn_ref, an_ref, lns_ref, lnb_ref,
                      w1_ref, b1_ref, wc_ref, bc_ref, w2_ref, b2_ref,
                      out_ref, *, ln_stats=_ln_rows_vpu, shift: int = 0,
                      s1_ref=None, sc_ref=None, s2_ref=None):
    sx = x_ref[0]                                     # (ws, W, C)
    rows, wdim, c = sx.shape
    if shift:
        # `a` arrives in SHIFTED coordinates (fused_block_attention_ln
        # shift>0 output); un-shift while reading instead of a jnp.roll
        # in HBM. Unshifted rows r0 .. r0+ws come from shifted rows
        # r0-shift .. r0+ws-shift: tail of the PREVIOUS (wrapped) strip
        # (an_ref) + head of this strip, then a cyclic +shift column roll.
        at = jnp.concatenate(
            [an_ref[0, rows - shift:], a_ref[0, :rows - shift + 1]],
            axis=0)                                   # (ws+1, W, C)
        # Mosaic-native cyclic column roll; rotate is 32-bit-only, and the
        # residual math downstream is f32 anyway
        at = pltpu.roll(at.astype(jnp.float32), shift, 1)
        sa, a_halo = at[:rows], at[rows]
    else:
        sa, a_halo = a_ref[0], an_ref[0, 0]
    res1 = sx.astype(jnp.float32) + sa.astype(jnp.float32)
    halo = (xn_ref[0, 0].astype(jnp.float32)
            + a_halo.astype(jnp.float32))             # (W, C)
    t = jnp.concatenate([res1.reshape(rows * wdim, c), halo], axis=0)

    ln = ln_stats(t) * lns_ref[...] + lnb_ref[...]    # f32
    if s1_ref is not None:
        f1 = _q8_dot(ln, w1_ref, s1_ref) + b1_ref[...]
    else:
        f1 = jax.lax.dot_general(
            ln.astype(sx.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[...]
    # bottom edge: the reference pads the fc1 OUTPUT with zeros before the
    # VALID conv — zero the halo rows on the last strip (fc1(0) != 0)
    last = pl.program_id(1) == pl.num_programs(1) - 1
    flag = jnp.where(last, 0.0, 1.0).astype(jnp.float32)
    f1 = jnp.concatenate(
        [f1[:rows * wdim], f1[rows * wdim:] * flag], axis=0)
    z = _conv_gelu_fc2(f1, rows, wdim, c, sx.dtype, wc_ref, bc_ref,
                       w2_ref, b2_ref, sc_ref=sc_ref, s2_ref=s2_ref)
    out = res1.reshape(rows * wdim, c) + z
    out_ref[0] = out.astype(out_ref.dtype).reshape(rows, wdim, c)


def _conv_gelu_fc2(f1, rows, wdim, c, dt, wc_ref, bc_ref, w2_ref, b2_ref,
                   *, sc_ref=None, s2_ref=None):
    """Shared tail middle: 2x2 VALID conv over the fc1 output (right edge
    zero column, bottom halo row already prepared/zeroed by the caller)
    -> GELU -> fc2. f1 is ((rows+1)*wdim, C) f32; returns (rows*wdim, C)
    f32 fc2 output (bias included, residual NOT added)."""
    if sc_ref is not None:
        # quantize the fc1 output ONCE; the four conv taps reuse it
        f1 = f1.reshape(rows + 1, wdim, c)
        sf = jnp.maximum(jnp.max(jnp.abs(f1)), 1e-8) / 127.0
        f1q = jnp.clip(jnp.round(f1 / sf), -127, 127).astype(jnp.int8)
        f1q = jnp.pad(f1q, ((0, 0), (0, 1), (0, 0)))
        acc = None
        for di in (0, 1):
            for dj in (0, 1):
                patch = f1q[di:di + rows, dj:dj + wdim].reshape(
                    rows * wdim, c)
                term = jax.lax.dot_general(
                    patch, wc_ref[di, dj], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                acc = term if acc is None else acc + term
        acc = acc.astype(jnp.float32) * (sc_ref[...] * sf) + bc_ref[...]
    else:
        f1 = f1.astype(dt).reshape(rows + 1, wdim, c)
        f1 = jnp.pad(f1, ((0, 0), (0, 1), (0, 0)))
        acc = None
        for di in (0, 1):
            for dj in (0, 1):
                patch = f1[di:di + rows, dj:dj + wdim].reshape(
                    rows * wdim, c)
                term = jax.lax.dot_general(
                    patch, wc_ref[di, dj], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = term if acc is None else acc + term
        acc = acc + bc_ref[...]
    y = _gelu_in_kernel(acc.astype(jnp.float32), dt)
    if s2_ref is not None:
        return _q8_dot(y, w2_ref, s2_ref) + b2_ref[...]
    return jax.lax.dot_general(
        y.astype(dt), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[...]


def _q8_weight_conv(wc):
    """(2, 2, C, C) conv kernel -> int8 with ONE per-output-channel scale
    shared across the four taps (their int32 partial sums are added
    before dequantization, so the scales must match)."""
    w32 = wc.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(w32), axis=(0, 1, 2)), 1e-8) / 127.0
    q = jnp.clip(jnp.round(w32 / s), -127, 127).astype(jnp.int8)
    return q, s.reshape(1, -1)


def _pallas_conv_tail(x, a, lns, lnb, w1, b1, wc, bc, w2, b2, ws: int,
                      shift: int = 0, int8: bool = False):
    b, h, w, c = x.shape
    nr = h // ws
    grid = (b, nr)
    x_spec = pl.BlockSpec((1, ws, w, c), lambda bi, r: (bi, r, 0, 0),
                          memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((1, ws, w, c),
                       lambda bi, r: (bi, jnp.minimum(r + 1, nr - 1), 0, 0),
                       memory_space=pltpu.VMEM)
    # shift > 0: the second `a` view is the PREVIOUS strip (cyclic) — the
    # kernel assembles the un-shifted rows from (prev, cur); shift == 0:
    # it is the NEXT strip supplying the conv halo row
    prv = pl.BlockSpec((1, ws, w, c), lambda bi, r: (bi, (r - 1) % nr, 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda bi, r: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    f32row = lambda v: _row2(v).astype(jnp.float32)
    args = [x, a, x, a, f32row(lns), f32row(lnb), w1, _row2(b1), wc,
            _row2(bc), w2, _row2(b2)]
    kern = functools.partial(_conv_tail_kernel, shift=shift)
    if int8:
        w1q, s1 = _q8_weight(w1)
        wcq, sc = _q8_weight_conv(wc)
        w2q, s2 = _q8_weight(w2)
        args[6], args[8], args[10] = w1q, wcq, w2q
        args += [s1, sc, s2]

        def kern(*refs):  # noqa: F811 — int8 ref plumbing
            _conv_tail_kernel(*refs[:12], refs[-1], shift=shift,
                              s1_ref=refs[12], sc_ref=refs[13],
                              s2_ref=refs[14])
    in_specs = [x_spec, x_spec, nxt, prv if shift else nxt] + [
        full(v.shape) for v in args[4:]]
    return pl.pallas_call(
        kern,
        grid=grid, in_specs=in_specs, out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
    )(*args)


def _compose_conv_tail(x, a, lns, lnb, w1, b1, wc, bc, w2, b2):
    dt = x.dtype
    res1 = x + a
    t = layernorm(res1, lns, lnb)
    f1 = t @ w1.astype(dt) + b1.astype(dt)
    f1 = jnp.pad(f1, ((0, 0), (0, 1), (0, 1), (0, 0)))
    y = jax.lax.conv_general_dilated(
        f1, wc.astype(dt), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bc.astype(dt)
    y = gelu(y)
    return res1 + (y @ w2.astype(dt) + b2.astype(dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 11))
def fused_conv_mlp_tail(x, a, lns, lnb, w1, b1, wc, bc, w2, b2,
                        shift: int = 0, int8: bool = False):
    """Residual + LN2 + fc1 + 2x2 conv + GELU + fc2 + residual, fused.

    x, a (B, H, W, C): block input and attention output; wc (2, 2, C, C)
    conv kernel (flax HWIO). H must divide by the strip height (the
    caller's window size). shift > 0: `a` is in SHIFTED coordinates
    (fused_block_attention_ln shift>0 output) and is un-rolled by
    (+shift, +shift) while reading — equivalent to
    fused_conv_mlp_tail(x, roll(a, (shift, shift), (1, 2)), ..., 0).
    int8=True quantizes fc1/conv/fc2 (serving path)."""
    ws = _tail_ws(x.shape[1])
    return _pallas_conv_tail(x, a, lns, lnb, w1, b1, wc, bc, w2, b2, ws,
                             shift, int8)


def _tail_ws(h: int, target: int = 8) -> int:
    """Strip height for the tail kernel: the window size when it divides
    H (always, in the backbone), else the largest divisor <= target."""
    if h % target == 0:
        return target
    for ws in range(min(target, h), 0, -1):
        if h % ws == 0:
            return ws
    return 1


def _fct_fwd(x, a, lns, lnb, w1, b1, wc, bc, w2, b2, shift, int8):
    out = _pallas_conv_tail(x, a, lns, lnb, w1, b1, wc, bc, w2, b2,
                            _tail_ws(x.shape[1]), shift, int8)
    return out, (x, a, lns, lnb, w1, b1, wc, bc, w2, b2)


def _fct_bwd(shift, int8, res, g):
    def f(x_, a_, *rest):
        ar = (jnp.roll(a_, (shift, shift), (1, 2)) if shift else a_)
        return _compose_conv_tail(x_, ar, *rest)

    _, vjp = jax.vjp(f, *res)
    return vjp(g)


fused_conv_mlp_tail.defvjp(_fct_fwd, _fct_bwd)


# ------------------- c>256-safe tails (ALL LayerNorms stay outside)
#
# At c=384 (flagship stage 2) ANY Pallas kernel containing an in-kernel
# LayerNorm is Mosaic-compile-pathological on the target (three
# independent confirmations — see ARCHITECTURE.md), while the standalone
# LN kernels (layernorm.py) and LN-free attention compile fine. These
# tails therefore take the block's second residual stream ALREADY
# normalized: the caller runs FusedAddLayerNorm in XLA/standalone-LN
# (res1 = x + attn_out, y = LN2(res1)) and the kernel fuses only the
# GEMM-dense remainder:
#
#   fused_mlp_tail(res1, y, ...)      = res1 + fc2(gelu(fc1(y)))
#   fused_conv_mlp_tail_noln(...)     = res1 + fc2(gelu(conv2x2(fc1(y))))
#
# Pair with fused_block_attention(shift=...) (no-LN front half) for the
# full c=384 block: only LN1/add-LN2 remain outside Pallas.

def _mlp_tail_kernel(r_ref, y_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                     out_ref, *, s1_ref=None, s2_ref=None):
    r = r_ref[0]                                      # (ws, W, C)
    rows, wdim, c = r.shape
    y = y_ref[0].reshape(rows * wdim, c)
    if s1_ref is not None:
        f1 = _q8_dot(y.astype(jnp.float32), w1_ref, s1_ref) + b1_ref[...]
    else:
        f1 = jax.lax.dot_general(
            y, w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[...]
    h = _gelu_in_kernel(f1.astype(jnp.float32), r.dtype)
    if s2_ref is not None:
        z = _q8_dot(h, w2_ref, s2_ref) + b2_ref[...]
    else:
        z = jax.lax.dot_general(
            h.astype(r.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b2_ref[...]
    out = r.reshape(rows * wdim, c).astype(jnp.float32) + z
    out_ref[0] = out.astype(out_ref.dtype).reshape(rows, wdim, c)


def _pallas_mlp_tail(r, y, w1, b1, w2, b2, ws: int, int8: bool = False):
    b, h, w, c = r.shape
    grid = (b, h // ws)
    x_spec = pl.BlockSpec((1, ws, w, c), lambda bi, ri: (bi, ri, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda bi, ri: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    args = [r, y, w1, _row2(b1), w2, _row2(b2)]
    kern = _mlp_tail_kernel
    if int8:
        w1q, s1 = _q8_weight(w1)
        w2q, s2 = _q8_weight(w2)
        args[2], args[4] = w1q, w2q
        args += [s1, s2]

        def kern(*refs):  # noqa: F811 — int8 ref plumbing
            _mlp_tail_kernel(*refs[:6], refs[-1],
                             s1_ref=refs[6], s2_ref=refs[7])
    in_specs = [x_spec, x_spec] + [full(v.shape) for v in args[2:]]
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(r.shape, r.dtype),
    )(*args)


def _compose_mlp_tail(r, y, w1, b1, w2, b2):
    dt = r.dtype
    f1 = y @ w1.astype(dt) + b1.astype(dt)
    return r + (gelu(f1) @ w2.astype(dt) + b2.astype(dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_mlp_tail(r, y, w1, b1, w2, b2, int8: bool = False):
    """Linear-MLP back half without LN: res1 + fc2(gelu(fc1(y))).

    r = x + attn_out (the block's second residual stream), y = LN2(r)
    computed by the caller (FusedAddLayerNorm). r, y (B, H, W, C);
    w1 (C, hidden); w2 (hidden, C). int8=True quantizes both GEMMs."""
    return _pallas_mlp_tail(r, y, w1, b1, w2, b2, _tail_ws(r.shape[1]),
                            int8)


def _fmt_fwd(r, y, w1, b1, w2, b2, int8):
    out = _pallas_mlp_tail(r, y, w1, b1, w2, b2, _tail_ws(r.shape[1]),
                           int8)
    return out, (r, y, w1, b1, w2, b2)


def _fmt_bwd(int8, res, g):
    _, vjp = jax.vjp(_compose_mlp_tail, *res)
    return vjp(g)


fused_mlp_tail.defvjp(_fmt_fwd, _fmt_bwd)


def _conv_tail_noln_kernel(r_ref, y_ref, yn_ref, w1_ref, b1_ref, wc_ref,
                           bc_ref, w2_ref, b2_ref, out_ref, *,
                           s1_ref=None, sc_ref=None, s2_ref=None):
    r = r_ref[0]                                      # (ws, W, C)
    rows, wdim, c = r.shape
    y = y_ref[0].reshape(rows * wdim, c)
    halo = yn_ref[0, 0]                               # (W, C): next strip's
    t = jnp.concatenate([y, halo], axis=0)            # first y row
    if s1_ref is not None:
        f1 = _q8_dot(t.astype(jnp.float32), w1_ref, s1_ref) + b1_ref[...]
    else:
        f1 = jax.lax.dot_general(
            t.astype(r.dtype), w1_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1_ref[...]
    # bottom edge: the reference zero-pads the fc1 OUTPUT before the
    # VALID conv — zero the halo rows on the last strip (fc1(0) != 0)
    last = pl.program_id(1) == pl.num_programs(1) - 1
    flag = jnp.where(last, 0.0, 1.0).astype(jnp.float32)
    f1 = jnp.concatenate(
        [f1[:rows * wdim], f1[rows * wdim:] * flag], axis=0)
    z = _conv_gelu_fc2(f1, rows, wdim, c, r.dtype, wc_ref, bc_ref,
                       w2_ref, b2_ref, sc_ref=sc_ref, s2_ref=s2_ref)
    out = r.reshape(rows * wdim, c).astype(jnp.float32) + z
    out_ref[0] = out.astype(out_ref.dtype).reshape(rows, wdim, c)


def _pallas_conv_tail_noln(r, y, w1, b1, wc, bc, w2, b2, ws: int,
                           int8: bool = False):
    b, h, w, c = r.shape
    nr = h // ws
    grid = (b, nr)
    x_spec = pl.BlockSpec((1, ws, w, c), lambda bi, ri: (bi, ri, 0, 0),
                          memory_space=pltpu.VMEM)
    nxt = pl.BlockSpec((1, ws, w, c),
                       lambda bi, ri: (bi, jnp.minimum(ri + 1, nr - 1), 0, 0),
                       memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda bi, ri: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    # y appears twice: as this strip and (via `nxt`) as the halo view
    args = [r, y, y, w1, _row2(b1), wc, _row2(bc), w2, _row2(b2)]
    kern = _conv_tail_noln_kernel
    if int8:
        w1q, s1 = _q8_weight(w1)
        wcq, sc = _q8_weight_conv(wc)
        w2q, s2 = _q8_weight(w2)
        args[3], args[5], args[7] = w1q, wcq, w2q
        args += [s1, sc, s2]

        def kern(*refs):  # noqa: F811 — int8 ref plumbing
            _conv_tail_noln_kernel(*refs[:9], refs[-1], s1_ref=refs[9],
                                   sc_ref=refs[10], s2_ref=refs[11])
    in_specs = [x_spec, x_spec, nxt] + [full(v.shape) for v in args[3:]]
    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(r.shape, r.dtype),
    )(*args)


def _compose_conv_tail_noln(r, y, w1, b1, wc, bc, w2, b2):
    dt = r.dtype
    f1 = y @ w1.astype(dt) + b1.astype(dt)
    f1 = jnp.pad(f1, ((0, 0), (0, 1), (0, 1), (0, 0)))
    z = jax.lax.conv_general_dilated(
        f1, wc.astype(dt), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + bc.astype(dt)
    return r + (gelu(z) @ w2.astype(dt) + b2.astype(dt))


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_conv_mlp_tail_noln(r, y, w1, b1, wc, bc, w2, b2,
                             int8: bool = False):
    """Conv-MLP back half without LN: res1 + fc2(gelu(conv2x2(fc1(y)))).

    r = x + attn_out, y = LN2(r) from the caller's FusedAddLayerNorm —
    both in UNSHIFTED coordinates (the caller un-rolls the shifted
    attention output before the add-LN). wc (2, 2, C, C) flax HWIO."""
    return _pallas_conv_tail_noln(r, y, w1, b1, wc, bc, w2, b2,
                                  _tail_ws(r.shape[1]), int8)


def _fctn_fwd(r, y, w1, b1, wc, bc, w2, b2, int8):
    out = _pallas_conv_tail_noln(r, y, w1, b1, wc, bc, w2, b2,
                                 _tail_ws(r.shape[1]), int8)
    return out, (r, y, w1, b1, wc, bc, w2, b2)


def _fctn_bwd(int8, res, g):
    _, vjp = jax.vjp(_compose_conv_tail_noln, *res)
    return vjp(g)


fused_conv_mlp_tail_noln.defvjp(_fctn_fwd, _fctn_bwd)
