"""Fused window attention as a Pallas TPU kernel.

The XLA path of W-MSA materializes the (B*nW, nh, N, N) attention matrices
in HBM between the QK^T and PV matmuls — for the flagship stage-1 that is
~1.6 GB of f32 per block per batch-32 step, times three accesses (write
scores, read+write softmax, read PV) — plus the head-split transposes of
q/k/v. This kernel consumes the *raw fused qkv projection* (W, N, 3C), the
exact layout the Dense layer produces, so no transpose or head-split ever
touches HBM; everything from head slicing through softmax to PV stays in
VMEM:

  layout   qkv: (W, N, 3C) — W = B * num_windows window tokens
  grid     (W // G,)       — G windows per program, G | num_windows
  blocks   qkv (G, N, 3C); bias full (nh, N, N); mask (G, N, N) selected by
           window position inside the image
  compute  static python loop over heads; per head a (G)-batched
           QK^T (f32 MXU accumulation), bias/mask add + f32 softmax in
           VMEM, PV matmul, slice-assign into the (G, N, C) output block

HBM traffic: qkv read once, attention output written once — the score
matrices never leave VMEM.

Backward: custom VJP recomputes the XLA reference attention under jax.vjp —
Pallas-speed forward, XLA-autodiff backward (pallas_guide.md Custom VJP).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernels_enabled


def reference_attention_qkv(qkv, bias, mask, nw: int, nh: int,
                            scale: float):
    """XLA reference on the fused layout: qkv (W, N, 3C) -> (W, N, C)."""
    w, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // nh
    q, k, v = qkv[..., :c], qkv[..., c:2 * c], qkv[..., 2 * c:]
    split = lambda t: t.reshape(w, n, nh, hd).transpose(0, 2, 1, 3)
    qh, kh, vh = split(q), split(k), split(v)
    attn = jnp.einsum("whnd,whmd->whnm", qh * scale, kh,
                      preferred_element_type=jnp.float32)
    attn = attn + bias[None].astype(attn.dtype)
    if mask is not None:
        attn = attn.reshape(w // nw, nw, nh, n, n)
        attn = attn + jnp.asarray(mask, attn.dtype)[None, :, None]
        attn = attn.reshape(w, nh, n, n)
    p = jax.nn.softmax(attn, axis=-1).astype(qkv.dtype)
    out = jnp.einsum("whnm,whmd->whnd", p, vh)
    return out.transpose(0, 2, 1, 3).reshape(w, n, c)


def _kernel(qkv_ref, bias_ref, out_ref, *, nh: int, scale: float,
            masked: bool, mask_ref=None):
    qkv = qkv_ref[...]                        # (G, N, 3C)
    g, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // nh
    for h in range(nh):
        q = qkv[:, :, h * hd:(h + 1) * hd] * jnp.asarray(scale, qkv.dtype)
        k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)   # (G, N, N)
        s = s + bias_ref[h][None]
        if masked:
            s = s + mask_ref[...]
        p = jax.nn.softmax(s, axis=-1)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        out_ref[:, :, h * hd:(h + 1) * hd] = out.astype(out_ref.dtype)


def _kernel_masked(qkv_ref, bias_ref, mask_ref, out_ref, *, nh, scale):
    _kernel(qkv_ref, bias_ref, out_ref, nh=nh, scale=scale, masked=True,
            mask_ref=mask_ref)


def _kernel_unmasked(qkv_ref, bias_ref, out_ref, *, nh, scale):
    _kernel(qkv_ref, bias_ref, out_ref, nh=nh, scale=scale, masked=False)


def _vmem_bytes(g: int, n: int, c3: int, nh: int, itemsize: int) -> int:
    """Rough VMEM footprint: double-buffered qkv in + out blocks, the full
    bias, one mask block, and the per-head f32 score/prob scratch."""
    c = c3 // 3
    io = 2 * (g * n * c3 * itemsize + g * n * c * itemsize)
    bias = nh * n * n * 4
    mask = g * n * n * 4
    scores = 2 * g * n * n * 4
    return io + bias + mask + scores


def _pick_group(num_windows: int, n: int, c3: int, nh: int,
                itemsize: int, cap: int = 32,
                budget: int = 12 * 1024 * 1024) -> int:
    """Largest divisor of num_windows up to `cap` fitting the VMEM budget."""
    g = min(num_windows, cap)
    while g > 1 and (num_windows % g or
                     _vmem_bytes(g, n, c3, nh, itemsize) > budget):
        g -= 1
    return max(g, 1)


def _pallas_attention(qkv, bias, mask, nw: int, nh: int, scale: float):
    w, n, c3 = qkv.shape
    c = c3 // 3
    itemsize = jnp.dtype(qkv.dtype).itemsize
    # masked: blocks must stay inside one image's window range (g | nw);
    # unmasked: any divisor of the total window count works
    nh_ = bias.shape[0]
    g = _pick_group(nw if mask is not None else w, n, c3, nh_, itemsize)
    grid = (w // g,)

    qkv_spec = pl.BlockSpec((g, n, c3), lambda j: (j, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, n, n), lambda j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((g, n, c), lambda j: (j, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((w, n, c), qkv.dtype)

    if mask is None:
        return pl.pallas_call(
            functools.partial(_kernel_unmasked, nh=nh, scale=scale),
            grid=grid,
            in_specs=[qkv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=out_shape,
        )(qkv, bias)

    nblocks_per_img = nw // g
    mask_spec = pl.BlockSpec(
        (g, n, n), lambda j: (j % nblocks_per_img, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel_masked, nh=nh, scale=scale),
        grid=grid,
        in_specs=[qkv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=out_shape,
    )(qkv, bias, jnp.asarray(mask, jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_window_attention(qkv, bias, mask, nw: int, nh: int, scale: float):
    """Fused W-MSA core on the raw qkv projection.

    qkv: (W, N, 3C); bias: (nh, N, N) f32; mask: (nw, N, N) f32 or None.
    Returns (W, N, C)."""
    return _pallas_attention(qkv, bias, mask, nw, nh, scale)


def _fwa_fwd(qkv, bias, mask, nw, nh, scale):
    return _pallas_attention(qkv, bias, mask, nw, nh, scale), \
        (qkv, bias, mask)


def _fwa_bwd(nw, nh, scale, res, g):
    qkv, bias, mask = res
    if kernels_enabled():
        dqkv, dbias = _pallas_attention_bwd(qkv, bias, mask, nw, nh, scale,
                                            g)
        return dqkv, dbias, None
    _, vjp = jax.vjp(
        lambda q_, b_: reference_attention_qkv(q_, b_, mask, nw, nh, scale),
        qkv, bias)
    dqkv, dbias = vjp(g)
    return dqkv, dbias, None


fused_window_attention.defvjp(_fwa_fwd, _fwa_bwd)


def window_attention_core(qkv, bias, mask, nw: int, nh: int, scale: float,
                          *, use_pallas: bool | None = None):
    """Dispatch: Pallas on TPU for VMEM-sized windows, XLA otherwise.

    The kernel holds the full (nh, N, N) bias block in VMEM, so it only
    pays off for genuinely windowed attention (N <= 256 tokens). Global
    blocks (e.g. the flagship stage-3 at N=1024) stay on the XLA path —
    there a single big attention matrix is what the MXU wants anyway."""
    n = qkv.shape[1]
    if use_pallas is None:
        # bf16-only auto-dispatch (f32 VMEM doubling — see
        # window_attention_core_nhwc)
        use_pallas = (kernels_enabled() and n <= 256
                      and qkv.dtype == jnp.bfloat16)
    if use_pallas:
        return fused_window_attention(qkv, bias, mask, nw, nh, scale)
    return reference_attention_qkv(qkv, bias, mask, nw, nh, scale)


# ----------------------------------------------------------- backward pass

def _bwd_kernel(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref, *,
                nh: int, scale: float, mask_ref=None):
    """Recompute-scores attention backward, one window-group per program.

    dV = P^T dO;  dP = dO V^T;  dS = P*(dP - rowsum(dP*P));
    dQ = scale * dS K;  dK = scale * dS^T Q;  dbias[h] += sum_g dS.
    dbias accumulates across the sequential TPU grid into the same block.
    """
    j = pl.program_id(0)
    qkv = qkv_ref[...]                       # (G, N, 3C)
    gy = g_ref[...]                          # (G, N, C)
    g_, n, c3 = qkv.shape
    c = c3 // 3
    hd = c // nh

    @pl.when(j == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for h in range(nh):
        q = qkv[:, :, h * hd:(h + 1) * hd]
        k = qkv[:, :, c + h * hd:c + (h + 1) * hd]
        v = qkv[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd]
        do = gy[:, :, h * hd:(h + 1) * hd].astype(jnp.float32)

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s * scale + bias_ref[h][None]
        if mask_ref is not None:
            s = s + mask_ref[...]
        p = jax.nn.softmax(s, axis=-1)        # (G, N, N) f32

        # dV = P^T @ dO  (per window)
        dv = jax.lax.dot_general(
            p, do, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        # dP = dO @ V^T
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))

        dq = scale * jax.lax.dot_general(
            ds, k.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = scale * jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

        dqkv_ref[:, :, h * hd:(h + 1) * hd] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, :, c + h * hd:c + (h + 1) * hd] = dk.astype(
            dqkv_ref.dtype)
        dqkv_ref[:, :, 2 * c + h * hd:2 * c + (h + 1) * hd] = dv.astype(
            dqkv_ref.dtype)
        dbias_ref[h] = dbias_ref[h] + jnp.sum(ds, axis=0)


def _pallas_attention_bwd(qkv, bias, mask, nw: int, nh: int, scale: float,
                          gy):
    w, n, c3 = qkv.shape
    itemsize = jnp.dtype(qkv.dtype).itemsize
    # backward holds ~2x the forward live set (p, ds, dp) -> halve the budget
    g = _pick_group(nw if mask is not None else w, n, c3, nh, itemsize,
                    budget=6 * 1024 * 1024)
    grid = (w // g,)

    qkv_spec = pl.BlockSpec((g, n, c3), lambda j: (j, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, n, n), lambda j: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((g, n, c3 // 3), lambda j: (j, 0, 0),
                          memory_space=pltpu.VMEM)
    dqkv_spec = pl.BlockSpec((g, n, c3), lambda j: (j, 0, 0),
                             memory_space=pltpu.VMEM)
    # all programs write the same dbias block; the TPU grid is sequential,
    # so read-modify-write accumulation is well-defined
    dbias_spec = pl.BlockSpec((nh, n, n), lambda j: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
                 jax.ShapeDtypeStruct(bias.shape, jnp.float32))

    if mask is None:
        kern = functools.partial(_bwd_kernel, nh=nh, scale=scale)
        return pl.pallas_call(
            kern, grid=grid,
            in_specs=[qkv_spec, bias_spec, g_spec],
            out_specs=(dqkv_spec, dbias_spec),
            out_shape=out_shape,
        )(qkv, bias, gy)

    def kern(qkv_ref, bias_ref, g_ref, mask_ref, dqkv_ref, dbias_ref):
        _bwd_kernel(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref,
                    nh=nh, scale=scale, mask_ref=mask_ref)

    nblocks_per_img = nw // g
    mask_spec = pl.BlockSpec(
        (g, n, n), lambda j: (j % nblocks_per_img, 0, 0),
        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[qkv_spec, bias_spec, g_spec, mask_spec],
        out_specs=(dqkv_spec, dbias_spec),
        out_shape=out_shape,
    )(qkv, bias, gy, jnp.asarray(mask, jnp.float32))


# ------------------------------------------------- NHWC (v3) kernel surface
#
# The (W, N, 3C) interface above still requires the caller to window-
# partition tokens in HBM (reshape+transpose "copy" kernels — measured at
# ~20% of the whole eval step). This surface takes the UNPARTITIONED
# (B, H, W, 3C) qkv map and carves row-strips of windows out of HBM with
# BlockSpecs; the partition/unpartition becomes a VMEM-local reorganize.

def reference_attention_nhwc(qkv, bias, mask, ws: int, nh: int,
                             scale: float):
    """XLA reference: qkv (B, H, W, 3C) -> (B, H, W, C)."""
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    g = (h // ws) * (w // ws)
    x = qkv.reshape(b, h // ws, ws, w // ws, ws, c3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b * g, ws * ws, c3)
    out = reference_attention_qkv(x, bias, mask, g, nh, scale)
    out = out.reshape(b, h // ws, w // ws, ws, ws, c)
    return out.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, c)


NEG_PACK = -1e9  # off-diagonal fill for window packing; exp() == 0 in f32


def _pick_pack(n: int, gx: int) -> int:
    """Windows to pack into one attention 'superwindow'.

    N=ws*ws window tokens are tiny against the 128x128 MXU (stage-1: N=64,
    hd=32 -> both matmuls half/quarter-filled). Packing m consecutive
    windows into one m*N-token attention with a block-diagonal bias fills
    the MXU (PV contraction 64 -> 128); the off-diagonal NEG_PACK entries
    make softmax weights exactly 0 across windows, so the math is
    unchanged at 2x the (cheap) attention FLOPs."""
    if n >= 128:
        return 1
    m = 128 // n
    while m > 1 and gx % m:
        m //= 2
    return max(m, 1)


def pack_bias(bias, m: int):
    """(nh, N, N) -> (nh, mN, mN) block-diagonal, NEG_PACK off-diagonal."""
    if m == 1:
        return bias
    nh, n, _ = bias.shape
    out = jnp.full((nh, m * n, m * n), NEG_PACK, bias.dtype)
    for i in range(m):
        out = out.at[:, i * n:(i + 1) * n, i * n:(i + 1) * n].set(bias)
    return out


def pack_mask(mask, m: int):
    """(nW, N, N) -> (nW/m, mN, mN): consecutive windows on the diagonal
    (zeros off-diagonal — pack_bias already carries the NEG_PACK fill)."""
    if m == 1:
        return mask
    nw, n, _ = mask.shape
    mm = mask.reshape(nw // m, m, n, n)
    out = jnp.zeros((nw // m, m * n, m * n), mask.dtype)
    for i in range(m):
        out = out.at[:, i * n:(i + 1) * n, i * n:(i + 1) * n].set(mm[:, i])
    return out


def _strip_kernel(qkv_ref, bias_ref, out_ref, *, ws: int, nh: int,
                  scale: float, pack: int = 1, mask_ref=None,
                  softmax_max: bool = True):
    strip = qkv_ref[0]                       # (R*ws, W, 3C)
    rows, wdim, c3 = strip.shape
    rv = rows // ws
    g = wdim // ws
    n = ws * ws
    c = c3 // 3
    hd = c // nh
    gp, np_ = rv * g // pack, pack * n
    # (R*ws, W, 3C) -> (G windows, N tokens, 3C) -> packed (G/m, m*N, 3C):
    # VMEM-local reorganize; consecutive windows share a superwindow
    if rv == 1:
        x = strip.reshape(ws, g, ws, c3).transpose(1, 0, 2, 3).reshape(
            gp, np_, c3)
    else:
        x = strip.reshape(rv, ws, g, ws, c3).transpose(
            0, 2, 1, 3, 4).reshape(gp, np_, c3)
    heads = []
    for hh in range(nh):
        # scale folded onto q: one multiply over (G, N, hd) instead of a
        # full VPU pass over the (G, N, N) scores
        q = x[:, :, hh * hd:(hh + 1) * hd] * jnp.asarray(scale, x.dtype)
        k = x[:, :, c + hh * hd:c + (hh + 1) * hd]
        v = x[:, :, 2 * c + hh * hd:2 * c + (hh + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[hh][None]
        if mask_ref is not None:
            s = s + mask_ref[...]
        if softmax_max:
            p = jax.nn.softmax(s, axis=-1)
        else:
            # BENCHMARK-ONLY knob (off by default, unreachable from model
            # code): unstabilized softmax overflows to inf/NaN for scores
            # above ~88 in f32. Measured within noise of the safe path
            # anyway — kept only so the microbench can reproduce that.
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        heads.append(o.astype(out_ref.dtype))
    out = jnp.concatenate(heads, axis=-1)            # (G/m, m*N, C)
    if rv == 1:
        out_ref[0] = out.reshape(g, ws, ws, c).transpose(
            1, 0, 2, 3).reshape(ws, wdim, c)
    else:
        out_ref[0] = out.reshape(rv, g, ws, ws, c).transpose(
            0, 2, 1, 3, 4).reshape(rows, wdim, c)


def _pallas_attention_nhwc(qkv, bias, mask, ws: int, nh: int, scale: float,
                           *, pack: int | None = None, rv: int = 1,
                           softmax_max: bool = True):
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    rows = rv * ws
    grid = (b, h // rows)
    n = ws * ws
    gx = w // ws
    m = _pick_pack(n, gx) if pack is None else pack
    np_ = m * n
    bias_p = pack_bias(bias, m)

    qkv_spec = pl.BlockSpec((1, rows, w, c3), lambda bi, r: (bi, r, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, np_, np_),
                             lambda bi, r: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, rows, w, c), lambda bi, r: (bi, r, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, h, w, c), qkv.dtype)

    if mask is None:
        return pl.pallas_call(
            functools.partial(_strip_kernel, ws=ws, nh=nh, scale=scale,
                              pack=m, softmax_max=softmax_max),
            grid=grid,
            in_specs=[qkv_spec, bias_spec],
            out_specs=out_spec,
            out_shape=out_shape,
        )(qkv, bias_p)

    def kern(qkv_ref, bias_ref, mask_ref, out_ref):
        _strip_kernel(qkv_ref, bias_ref, out_ref, ws=ws, nh=nh, scale=scale,
                      pack=m, mask_ref=mask_ref, softmax_max=softmax_max)

    # mask windows are row-major, so row r owns mask rows [r*rv*gx/m, ...)
    mask_p = pack_mask(jnp.asarray(mask, jnp.float32), m)
    mask_spec = pl.BlockSpec((rv * gx // m, np_, np_),
                             lambda bi, r: (r, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern, grid=grid,
        in_specs=[qkv_spec, bias_spec, mask_spec],
        out_specs=out_spec,
        out_shape=out_shape,
    )(qkv, bias_p, mask_p)


# --------------------------------------------- fused qkv+attention+proj
#
# One kernel per row-strip: qkv GEMM (weights resident in VMEM) -> window
# attention -> output projection. The (B, H, W, 3C) qkv tensor and the
# attention output never touch HBM (for flagship stage-1 that is ~2.4 GB
# of HBM traffic per block per batch-64 step), and the Pallas boundary
# relayout copies XLA inserts around a separate qkv Dense disappear.
# Token order is irrelevant to a GEMM, so the matmuls run on the raw
# strip rows and only the attention core sees the window reorganize.

def _block_attn_kernel(x_ref, wqkv_ref, bqkv_ref, wp_ref, bp_ref, bias_ref,
                       out_ref, *, ws: int, nh: int, scale: float,
                       pack: int, mask_ref=None, lns_ref=None,
                       lnb_ref=None, xn_ref=None, shift: int = 0,
                       sqkv_ref=None, sp_ref=None):
    strip = x_ref[0]                         # (ws, W, C)
    if shift:
        # shifted-window read: assemble the cyclically (-shift, -shift)
        # rolled strip in VMEM from this strip and the next (wrapped) one
        # instead of materializing jnp.roll(x) in HBM (~1.6 ms per roll
        # at flagship stage-1 batch 64). Rows r0+shift .. r0+ws+shift-1
        # concatenate on the untiled axis; the column roll uses Mosaic's
        # native rotate (pltpu.roll == jnp.roll with positive shift),
        # which only supports 32-bit lanes — roll in f32 (exact for bf16
        # values; the LN stats math is f32 anyway) and cast back.
        nxt = xn_ref[0]
        dt0 = strip.dtype
        strip = jnp.concatenate([strip[shift:], nxt[:shift]], axis=0)
        strip = pltpu.roll(strip.astype(jnp.float32),
                           strip.shape[1] - shift, 1).astype(dt0)
    rows, wdim, c = strip.shape
    flat = strip.reshape(rows * wdim, c)
    if lns_ref is not None:
        # pre-attention LayerNorm folded in: VPU-reduction stats (the
        # rows are VMEM resident; MXU-stats ones-dots ran at the slow f32
        # MXU rate and doubled the whole megakernel's time — see
        # swin_block._ln_rows_vpu), then straight into the qkv GEMM —
        # the normed tensor never exists in HBM
        from .swin_block import _ln_rows_vpu
        flat = (_ln_rows_vpu(flat) * lns_ref[...]
                + lnb_ref[...]).astype(strip.dtype)
    if sqkv_ref is not None:
        # int8 serving: qkv projection as a quantized MXU GEMM
        from .swin_block import _q8_dot
        qkv = _q8_dot(flat.astype(jnp.float32), wqkv_ref, sqkv_ref)
    else:
        qkv = jax.lax.dot_general(
            flat, wqkv_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[...]).astype(strip.dtype)   # (rows*W, 3C)

    g = wdim // ws
    n = ws * ws
    c3 = 3 * c
    hd = c // nh
    gp, np_ = g // pack, pack * n
    x = qkv.reshape(ws, g, ws, c3).transpose(1, 0, 2, 3).reshape(
        gp, np_, c3)
    heads = []
    for hh in range(nh):
        q = x[:, :, hh * hd:(hh + 1) * hd] * jnp.asarray(scale, x.dtype)
        k = x[:, :, c + hh * hd:c + (hh + 1) * hd]
        v = x[:, :, 2 * c + hh * hd:2 * c + (hh + 1) * hd]
        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        s = s + bias_ref[hh][None]
        if mask_ref is not None:
            s = s + mask_ref[...]
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        heads.append(o.astype(strip.dtype))
    attn = jnp.concatenate(heads, axis=-1)            # (G/m, m*N, C)
    attn = attn.reshape(g, ws, ws, c).transpose(1, 0, 2, 3).reshape(
        rows * wdim, c)
    if sp_ref is not None:
        from .swin_block import _q8_dot
        y = _q8_dot(attn.astype(jnp.float32), wp_ref, sp_ref)
    else:
        y = jax.lax.dot_general(
            attn, wp_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y = y + bp_ref[...]
    out_ref[0] = y.astype(out_ref.dtype).reshape(rows, wdim, c)


def _pallas_block_attention(x, wqkv, bqkv, wp, bp, bias, mask, ws: int,
                            nh: int, scale: float, ln=None,
                            shift: int = 0, int8: bool = False):
    b, h, w, c = x.shape
    nr = h // ws
    grid = (b, nr)
    n = ws * ws
    gx = w // ws
    m = _pick_pack(n, gx)
    np_ = m * n
    bias_p = pack_bias(bias, m)

    if int8:
        from .swin_block import _q8_weight
        wqkv, sqkv = _q8_weight(wqkv)
        wp, sp = _q8_weight(wp)

    x_spec = pl.BlockSpec((1, ws, w, c), lambda bi, r: (bi, r, 0, 0),
                          memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda bi, r: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((nh, np_, np_), lambda bi, r: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    args = [x, wqkv, bqkv.reshape(1, -1), wp, bp.reshape(1, -1), bias_p]
    in_specs = [x_spec, full(wqkv.shape), full((1, bqkv.size)),
                full(wp.shape), full((1, bp.size)), bias_spec]
    names = ["x_ref", "wqkv_ref", "bqkv_ref", "wp_ref", "bp_ref",
             "bias_ref"]
    if int8:
        args += [sqkv, sp]
        in_specs += [full(sqkv.shape), full(sp.shape)]
        names += ["sqkv_ref", "sp_ref"]
    if shift:
        # second view of x: the next row-strip (cyclic) for the in-VMEM
        # shifted-window assembly
        args.append(x)
        in_specs.append(pl.BlockSpec(
            (1, ws, w, c), lambda bi, r: (bi, (r + 1) % nr, 0, 0),
            memory_space=pltpu.VMEM))
        names.append("xn_ref")
    if ln is not None:
        lns, lnb = ln
        args += [lns.reshape(1, c).astype(jnp.float32),
                 lnb.reshape(1, c).astype(jnp.float32)]
        in_specs += [full((1, c)), full((1, c))]
        names += ["lns_ref", "lnb_ref"]
    if mask is not None:
        args.append(pack_mask(jnp.asarray(mask, jnp.float32), m))
        in_specs.append(pl.BlockSpec((gx // m, np_, np_),
                                     lambda bi, r: (r, 0, 0),
                                     memory_space=pltpu.VMEM))
        names.append("mask_ref")
    out_shape = jax.ShapeDtypeStruct((b, h, w, c), x.dtype)

    def kern(*refs):
        kw = dict(zip(names, refs[:-1]))
        _block_attn_kernel(kw.pop("x_ref"), kw.pop("wqkv_ref"),
                           kw.pop("bqkv_ref"), kw.pop("wp_ref"),
                           kw.pop("bp_ref"), kw.pop("bias_ref"), refs[-1],
                           ws=ws, nh=nh, scale=scale, pack=m, shift=shift,
                           **kw)

    return pl.pallas_call(
        kern, grid=grid, in_specs=in_specs, out_specs=x_spec,
        out_shape=out_shape,
    )(*args)


def _compose_block_attention(x, wqkv, bqkv, wp, bp, bias, mask, ws, nh,
                             scale, ln=None):
    """XLA composition used off-TPU and as the backward recompute path.
    The attention core still dispatches to the Pallas fwd/bwd kernels on
    TPU, so the VJP of this composition reuses the hand-written backward."""
    if ln is not None:
        from .layernorm import layernorm
        x = layernorm(x, ln[0], ln[1])
    qkv = (x @ wqkv.astype(x.dtype)) + bqkv.astype(x.dtype)
    out = window_attention_core_nhwc(qkv, bias, mask, ws, nh, scale)
    return (out @ wp.astype(x.dtype)) + bp.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def fused_block_attention(x, wqkv, bqkv, wp, bp, bias, mask, ws: int,
                          nh: int, scale: float, shift: int = 0,
                          int8: bool = False):
    """qkv projection + W-MSA + output projection in one Pallas kernel —
    NO in-kernel LayerNorm (the c>256-safe front half: at c=384 any
    megakernel containing an LN is Mosaic-compile-pathological on the
    target, while this LN-free variant compiles fine).

    x (B, H, W, C); wqkv (C, 3C); bqkv (3C,); wp (C, C); bp (C,) — all
    compute-dtype; bias (nh, N, N) f32; mask (nW, N, N) or None.
    shift > 0 assembles the (-shift, -shift)-rolled strips in VMEM (same
    folding as fused_block_attention_ln); the output stays in SHIFTED
    coordinates. int8=True quantizes the qkv/proj GEMMs (serving)."""
    return _pallas_block_attention(x, wqkv, bqkv, wp, bp, bias, mask, ws,
                                   nh, scale, shift=shift, int8=int8)


def _fba_fwd(x, wqkv, bqkv, wp, bp, bias, mask, ws, nh, scale, shift,
             int8):
    out = _pallas_block_attention(x, wqkv, bqkv, wp, bp, bias, mask, ws,
                                  nh, scale, shift=shift, int8=int8)
    return out, (x, wqkv, bqkv, wp, bp, bias, mask)


def _fba_bwd(ws, nh, scale, shift, int8, res, g):
    x, wqkv, bqkv, wp, bp, bias, mask = res

    def f(x_, *a):
        xr = (jnp.roll(x_, (-shift, -shift), (1, 2)) if shift else x_)
        return _compose_block_attention(xr, *a, mask, ws, nh, scale)

    _, vjp = jax.vjp(f, x, wqkv, bqkv, wp, bp, bias)
    return (*vjp(g), None)


fused_block_attention.defvjp(_fba_fwd, _fba_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def fused_block_attention_ln(x, lns, lnb, wqkv, bqkv, wp, bp, bias, mask,
                             ws: int, nh: int, scale: float,
                             shift: int = 0, int8: bool = False):
    """LN + qkv projection + W-MSA + output projection, one Pallas kernel.

    shift > 0 computes on the cyclically (-shift, -shift) rolled map
    WITHOUT materializing the roll in HBM: each grid program assembles
    its shifted row-strip in VMEM from two views of x (this strip and the
    next, wrapped). The output stays in SHIFTED coordinates — pair with
    `fused_conv_mlp_tail(..., shift=shift)`, which un-shifts while
    reading. Equivalent to fused_block_attention_ln(roll(x), ..., 0).
    int8=True quantizes the qkv/proj GEMMs (serving path; backward
    replays the bf16 composition)."""
    return _pallas_block_attention(x, wqkv, bqkv, wp, bp, bias, mask, ws,
                                   nh, scale, ln=(lns, lnb), shift=shift,
                                   int8=int8)


def _fbal_fwd(x, lns, lnb, wqkv, bqkv, wp, bp, bias, mask, ws, nh, scale,
              shift, int8):
    out = _pallas_block_attention(x, wqkv, bqkv, wp, bp, bias, mask, ws,
                                  nh, scale, ln=(lns, lnb), shift=shift,
                                  int8=int8)
    return out, (x, lns, lnb, wqkv, bqkv, wp, bp, bias, mask)


def _fbal_bwd(ws, nh, scale, shift, int8, res, g):
    x, lns, lnb, wqkv, bqkv, wp, bp, bias, mask = res

    def f(x_, s_, b_, *a):
        xr = (jnp.roll(x_, (-shift, -shift), (1, 2)) if shift else x_)
        return _compose_block_attention(xr, *a, mask, ws, nh, scale,
                                        ln=(s_, b_))

    _, vjp = jax.vjp(f, x, lns, lnb, wqkv, bqkv, wp, bp, bias)
    return (*vjp(g), None)


fused_block_attention_ln.defvjp(_fbal_fwd, _fbal_bwd)


def block_attention_nhwc(x, wqkv, bqkv, wp, bp, bias, mask, ws: int,
                         nh: int, scale: float, ln=None):
    """Dispatch: fused (LN+)qkv+attn+proj kernel on TPU for windowed
    shapes, XLA composition (with the Pallas attention core) elsewhere.
    bf16-only: the kernels' VMEM residents double in f32 and the c=384
    backward exceeds the 16 MB scoped-vmem limit (observed r5)."""
    if (kernels_enabled() and x.dtype == jnp.bfloat16 and ws * ws <= 256
            and x.shape[1] % ws == 0 and x.shape[2] % ws == 0):
        if ln is not None:
            return fused_block_attention_ln(x, ln[0], ln[1], wqkv, bqkv,
                                            wp, bp, bias, mask, ws, nh,
                                            scale)
        return fused_block_attention(x, wqkv, bqkv, wp, bp, bias, mask,
                                     ws, nh, scale)
    return _compose_block_attention(x, wqkv, bqkv, wp, bp, bias, mask, ws,
                                    nh, scale, ln=ln)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_window_attention_nhwc(qkv, bias, mask, ws: int, nh: int,
                                scale: float):
    """Fused W-MSA over an unpartitioned (B, H, W, 3C) qkv map."""
    return _pallas_attention_nhwc(qkv, bias, mask, ws, nh, scale)


def _fwa_nhwc_fwd(qkv, bias, mask, ws, nh, scale):
    return _pallas_attention_nhwc(qkv, bias, mask, ws, nh, scale), \
        (qkv, bias, mask)


def _bwd_strip_kernel(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref, *,
                      ws: int, nh: int, scale: float, n_chunks: int = 1,
                      pack: int = 1, mask_ref=None):
    strip = qkv_ref[0]
    _, wdim, c3 = strip.shape
    n = ws * ws
    c = c3 // 3
    hd = c // nh

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    # column chunks bound the live f32 set (backward holds ~4 (G,N,N)
    # intermediates per head); windows g in [g0, g1) occupy contiguous
    # strip columns, so chunking is a static slice on both ends
    wchunk = wdim // n_chunks
    gchunk = wchunk // ws
    gp, np_ = gchunk // pack, pack * n
    for ci in range(n_chunks):
        xs = strip[:, ci * wchunk:(ci + 1) * wchunk]
        x = xs.reshape(ws, gchunk, ws, c3).transpose(1, 0, 2, 3).reshape(
            gp, np_, c3)
        gys = g_ref[0][:, ci * wchunk:(ci + 1) * wchunk]
        gy = gys.reshape(ws, gchunk, ws, c).transpose(1, 0, 2, 3).reshape(
            gp, np_, c)
        dqs, dks, dvs = [], [], []
        for hh in range(nh):
            q = x[:, :, hh * hd:(hh + 1) * hd]
            k = x[:, :, c + hh * hd:c + (hh + 1) * hd]
            v = x[:, :, 2 * c + hh * hd:2 * c + (hh + 1) * hd]
            do = gy[:, :, hh * hd:(hh + 1) * hd].astype(jnp.float32)
            s = jax.lax.dot_general(
                q, k, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            s = s * scale + bias_ref[hh][None]
            if mask_ref is not None:
                s = s + mask_ref[ci * gp:(ci + 1) * gp]
            p = jax.nn.softmax(s, axis=-1)
            dv = jax.lax.dot_general(
                p, do, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dp = jax.lax.dot_general(
                do, v.astype(jnp.float32), (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
            dq = scale * jax.lax.dot_general(
                ds, k.astype(jnp.float32), (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dk = scale * jax.lax.dot_general(
                ds, q.astype(jnp.float32), (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            dt = dqkv_ref.dtype
            dqs.append(dq.astype(dt))
            dks.append(dk.astype(dt))
            dvs.append(dv.astype(dt))
            dbias_ref[hh] = dbias_ref[hh] + jnp.sum(ds, axis=0)
        dx = jnp.concatenate(dqs + dks + dvs, axis=-1)  # (Gc/m, m*N, 3C)
        dqkv_ref[0, :, ci * wchunk:(ci + 1) * wchunk] = dx.reshape(
            gchunk, ws, ws, c3).transpose(1, 0, 2, 3).reshape(
            ws, wchunk, c3)


def _unpack_dbias(dbias_p, m: int, n: int):
    """(nh, mN, mN) packed cotangent -> (nh, N, N): sum the diagonal blocks
    (each packed window contributed an identical-bias diagonal block)."""
    if m == 1:
        return dbias_p
    nh = dbias_p.shape[0]
    out = jnp.zeros((nh, n, n), dbias_p.dtype)
    for i in range(m):
        out = out + dbias_p[:, i * n:(i + 1) * n, i * n:(i + 1) * n]
    return out


def _pallas_attention_nhwc_bwd(qkv, bias, mask, ws, nh, scale, gy):
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    grid = (b, h // ws)
    n = ws * ws
    qkv_spec = pl.BlockSpec((1, ws, w, c3), lambda bi, r: (bi, r, 0, 0),
                            memory_space=pltpu.VMEM)
    g_spec = pl.BlockSpec((1, ws, w, c), lambda bi, r: (bi, r, 0, 0),
                          memory_space=pltpu.VMEM)

    # Mosaic accounts every live SSA temporary on its VMEM stack, which for
    # this backward is far more than the arithmetic minimum; keep chunks at
    # <= 4 windows so the f32 intermediates stay small
    gx = w // ws
    n_chunks = 1
    while gx // n_chunks > 4:
        n_chunks *= 2
    while gx % n_chunks:
        n_chunks //= 2

    m = min(_pick_pack(n, gx), gx // n_chunks)
    np_ = m * n
    bias_p = pack_bias(bias, m)
    bias_spec = pl.BlockSpec((nh, np_, np_), lambda bi, r: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    dbias_spec = pl.BlockSpec((nh, np_, np_), lambda bi, r: (0, 0, 0),
                              memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct(qkv.shape, qkv.dtype),
                 jax.ShapeDtypeStruct((nh, np_, np_), jnp.float32))

    if mask is None:
        kern = functools.partial(_bwd_strip_kernel, ws=ws, nh=nh,
                                 scale=scale, n_chunks=n_chunks, pack=m)
        dqkv, dbias_p = pl.pallas_call(
            kern, grid=grid,
            in_specs=[qkv_spec, bias_spec, g_spec],
            out_specs=(qkv_spec, dbias_spec),
            out_shape=out_shape,
        )(qkv, bias_p, gy)
        return dqkv, _unpack_dbias(dbias_p, m, n)

    def kern(qkv_ref, bias_ref, g_ref, mask_ref, dqkv_ref, dbias_ref):
        _bwd_strip_kernel(qkv_ref, bias_ref, g_ref, dqkv_ref, dbias_ref,
                          ws=ws, nh=nh, scale=scale, n_chunks=n_chunks,
                          pack=m, mask_ref=mask_ref)
    mask_p = pack_mask(jnp.asarray(mask, jnp.float32), m)
    mask_spec = pl.BlockSpec((gx // m, np_, np_), lambda bi, r: (r, 0, 0),
                             memory_space=pltpu.VMEM)
    dqkv, dbias_p = pl.pallas_call(
        kern, grid=grid,
        in_specs=[qkv_spec, bias_spec, g_spec, mask_spec],
        out_specs=(qkv_spec, dbias_spec),
        out_shape=out_shape,
    )(qkv, bias_p, gy, mask_p)
    return dqkv, _unpack_dbias(dbias_p, m, n)


def _fwa_nhwc_bwd(ws, nh, scale, res, g):
    qkv, bias, mask = res
    if kernels_enabled():
        dqkv, dbias = _pallas_attention_nhwc_bwd(qkv, bias, mask, ws, nh,
                                                 scale, g)
        return dqkv, dbias, None
    _, vjp = jax.vjp(
        lambda q_, b_: reference_attention_nhwc(q_, b_, mask, ws, nh, scale),
        qkv, bias)
    dqkv, dbias = vjp(g)
    return dqkv, dbias, None


fused_window_attention_nhwc.defvjp(_fwa_nhwc_fwd, _fwa_nhwc_bwd)


def window_attention_core_nhwc(qkv, bias, mask, ws: int, nh: int,
                               scale: float, *,
                               use_pallas: bool | None = None):
    """NHWC dispatch: strips kernel on TPU, XLA reference elsewhere.

    Single-window "global" blocks (flagship stage-3: ws=32 covers the whole
    32x32 map, N=1024 tokens) route to the flash-style global kernel — the
    XLA path materializes the f32 (B, nh, N, N) scores (3.2 GB at batch 64)
    in HBM plus head-split transposes of the 300 MB qkv tensor."""
    # bf16-only auto-dispatch: f32 doubles the kernels' VMEM residents
    # and the c=384 backward blows the 16 MB scoped-vmem limit (r5)
    on_tpu = kernels_enabled() and qkv.dtype == jnp.bfloat16
    auto = use_pallas is None
    if auto:
        use_pallas = on_tpu and ws * ws <= 256
    if use_pallas:
        return fused_window_attention_nhwc(qkv, bias, mask, ws, nh, scale)
    if (auto and on_tpu and mask is None
            and qkv.shape[1] == ws and qkv.shape[2] == ws):
        return fused_global_attention(qkv, bias, nh, scale)
    return reference_attention_nhwc(qkv, bias, mask, ws, nh, scale)


# ------------------------------------------------- global (single-window)
#
# Stage-3 attention is one global window: N = H*W = 1024 tokens, hd = 64.
# The (nh, N, N) bias alone is 50 MB f32, so unlike the windowed kernels it
# cannot live in VMEM whole; the grid is (head, batch) with batch innermost,
# so each head's (N, N) bias block is fetched once and then revisited for
# every batch element. Scores never touch HBM: q rows are processed in
# chunks so the live f32 set stays a few MB.

def _global_kernel(qkv_ref, bias_ref, out_ref, *, scale: float,
                   row_chunk: int):
    x = qkv_ref[0]                            # (3, 1, N, hd)
    n = x.shape[2]
    q = x[0, 0] * jnp.asarray(scale, x.dtype)
    k = x[1, 0]
    v = x[2, 0]
    for r0 in range(0, n, row_chunk):
        s = jax.lax.dot_general(
            q[r0:r0 + row_chunk], k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)      # (rc, N)
        s = s + bias_ref[0, r0:r0 + row_chunk]
        p = jax.nn.softmax(s, axis=-1)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (rc, hd)
        out_ref[0, 0, r0:r0 + row_chunk] = o.astype(out_ref.dtype)


def _split_heads_qkv(qkv, nh: int):
    """(B, H, W, 3C) -> (B, 3, nh, N, hd): the fused Dense layout
    [q | k | v], each [head0 | head1 | ...], is a reshape + transpose."""
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    hd = c // nh
    return qkv.reshape(b, h * w, 3, nh, hd).transpose(0, 2, 3, 1, 4)


def _pallas_global_attention(qkv, bias, nh: int, scale: float):
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    hd = c // nh
    n = h * w
    x = _split_heads_qkv(qkv, nh)

    grid = (nh, b)  # batch innermost: bias block reused across b
    x_spec = pl.BlockSpec((1, 3, 1, n, hd), lambda hh, bi: (bi, 0, hh, 0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, n, n), lambda hh, bi: (hh, 0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, n, hd), lambda hh, bi: (bi, hh, 0, 0),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_global_kernel, scale=scale, row_chunk=256),
        grid=grid,
        in_specs=[x_spec, bias_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, nh, n, hd), qkv.dtype),
    )(x, bias)
    return out.transpose(0, 2, 1, 3).reshape(b, h, w, c)


def _bwd_row_chunk(n: int, cap: int = 256) -> int | None:
    """Largest divisor of n that is <= cap; None when too small to tile.

    The backward grids step q-rows in uniform chunks of rc with grid
    n // rc, so rc MUST divide n — a remainder would leave dq rows
    unwritten and drop dk/dv/dbias contributions (silent wrong grads)."""
    for rc in range(min(cap, n), 7, -1):
        if n % rc == 0:
            return rc
    return None


def _global_chunk_grads(qkv_ref, bias_chunk, g_ref, r0, rc, scale):
    """Shared recompute for one q-row chunk: returns (p, ds, qc, k, v)."""
    k = qkv_ref[0, 1, 0]
    v = qkv_ref[0, 2, 0]
    qc = qkv_ref[0, 0, 0, pl.ds(r0, rc)]
    doc = g_ref[0, 0, pl.ds(r0, rc)].astype(jnp.float32)
    s = jax.lax.dot_general(
        qc, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    s = s * scale + bias_chunk
    p = jax.nn.softmax(s, axis=-1)                 # (rc, N)
    dp = jax.lax.dot_general(
        doc, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)        # (rc, N)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    return p, ds, doc, qc, k, v


def _global_bwd_dqkv_kernel(qkv_ref, bias_ref, g_ref, dqkv_ref, *,
                            scale: float):
    """Grid (head, batch, chunk), chunk innermost: dq written per chunk,
    dk/dv accumulated read-modify-write across the consecutive chunk
    programs that share the (batch, head) dqkv block."""
    ci = pl.program_id(2)
    rc = bias_ref.shape[1]
    r0 = ci * rc

    @pl.when(ci == 0)
    def _():
        dqkv_ref[0, 1, 0] = jnp.zeros_like(dqkv_ref[0, 1, 0])
        dqkv_ref[0, 2, 0] = jnp.zeros_like(dqkv_ref[0, 2, 0])

    p, ds, doc, qc, k, v = _global_chunk_grads(qkv_ref, bias_ref[0], g_ref,
                                               r0, rc, scale)
    dq = scale * jax.lax.dot_general(
        ds, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dk = scale * jax.lax.dot_general(
        ds, qc.astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dv = jax.lax.dot_general(
        p, doc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dqkv_ref[0, 0, 0, pl.ds(r0, rc)] = dq.astype(dqkv_ref.dtype)
    dqkv_ref[0, 1, 0] = dqkv_ref[0, 1, 0] + dk.astype(dqkv_ref.dtype)
    dqkv_ref[0, 2, 0] = dqkv_ref[0, 2, 0] + dv.astype(dqkv_ref.dtype)


def _global_bwd_dbias_kernel(qkv_ref, bias_ref, g_ref, dbias_ref, *,
                             scale: float):
    """Grid (head, chunk, batch), batch innermost: dbias accumulated
    read-modify-write across the consecutive batch programs that share the
    (head, chunk) dbias block. Recomputes ds (2 matmuls + softmax) — the
    price of keeping both accumulations on consecutive grid visits."""
    rc = bias_ref.shape[1]
    r0 = pl.program_id(1) * rc

    @pl.when(pl.program_id(2) == 0)
    def _():
        dbias_ref[...] = jnp.zeros_like(dbias_ref)

    _, ds, _, _, _, _ = _global_chunk_grads(qkv_ref, bias_ref[0], g_ref,
                                            r0, rc, scale)
    dbias_ref[0] = dbias_ref[0] + ds


def _pallas_global_attention_bwd(qkv, bias, nh, scale, gy):
    b, h, w, c3 = qkv.shape
    c = c3 // 3
    hd = c // nh
    n = h * w
    x = _split_heads_qkv(qkv, nh)
    g = gy.reshape(b, n, nh, hd).transpose(0, 2, 1, 3)   # (B, nh, N, hd)

    rc = _bwd_row_chunk(n)
    assert rc is not None, f"no row-chunk divides n={n}; caller must fall back"
    x_spec3 = lambda ix: pl.BlockSpec((1, 3, 1, n, hd), ix,
                                      memory_space=pltpu.VMEM)
    g_spec3 = lambda ix: pl.BlockSpec((1, 1, n, hd), ix,
                                      memory_space=pltpu.VMEM)
    bias_spec3 = lambda ix: pl.BlockSpec((1, rc, n), ix,
                                         memory_space=pltpu.VMEM)

    dqkv = pl.pallas_call(
        functools.partial(_global_bwd_dqkv_kernel, scale=scale),
        grid=(nh, b, n // rc),
        in_specs=[x_spec3(lambda hh, bi, ci: (bi, 0, hh, 0, 0)),
                  bias_spec3(lambda hh, bi, ci: (hh, ci, 0)),
                  g_spec3(lambda hh, bi, ci: (bi, hh, 0, 0))],
        out_specs=x_spec3(lambda hh, bi, ci: (bi, 0, hh, 0, 0)),
        # f32 output: dk/dv are accumulated read-modify-write across n//rc
        # chunk programs; bf16 round-trips each visit would degrade grads.
        out_shape=jax.ShapeDtypeStruct((b, 3, nh, n, hd), jnp.float32),
    )(x, bias, g)

    dbias = pl.pallas_call(
        functools.partial(_global_bwd_dbias_kernel, scale=scale),
        grid=(nh, n // rc, b),
        in_specs=[x_spec3(lambda hh, ci, bi: (bi, 0, hh, 0, 0)),
                  bias_spec3(lambda hh, ci, bi: (hh, ci, 0)),
                  g_spec3(lambda hh, ci, bi: (bi, hh, 0, 0))],
        out_specs=bias_spec3(lambda hh, ci, bi: (hh, ci, 0)),
        out_shape=jax.ShapeDtypeStruct(bias.shape, jnp.float32),
    )(x, bias, g)

    dqkv = dqkv.transpose(0, 3, 1, 2, 4).reshape(qkv.shape)
    return dqkv.astype(qkv.dtype), dbias


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_global_attention(qkv, bias, nh: int, scale: float):
    """Flash-style global attention: qkv (B, H, W, 3C), bias (nh, N, N)."""
    return _pallas_global_attention(qkv, bias, nh, scale)


def _fga_fwd(qkv, bias, nh, scale):
    return _pallas_global_attention(qkv, bias, nh, scale), (qkv, bias)


def _fga_bwd(nh, scale, res, g):
    qkv, bias = res
    n = qkv.shape[1] * qkv.shape[2]
    if (kernels_enabled()
            and _bwd_row_chunk(n) is not None):
        return _pallas_global_attention_bwd(qkv, bias, nh, scale, g)
    ws = qkv.shape[1]
    _, vjp = jax.vjp(
        lambda q_, b_: reference_attention_nhwc(q_, b_, None, ws, nh, scale),
        qkv, bias)
    return vjp(g)


fused_global_attention.defvjp(_fga_fwd, _fga_bwd)
