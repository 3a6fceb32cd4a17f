#!/usr/bin/env python
"""Round-4 TPU compile probes — run FIRST when the tunnel relay returns.

Protocol (memory/verify skill): each new Pallas kernel variant compiles
once at TINY batch under `timeout 120`, one probe per process invocation,
NOTHING valuable running concurrently. A pathological Mosaic compile
wedges the shared remote queue for ~an hour and stalls running jobs, so
probes must be serialized and bounded.

Usage:
    timeout 120 python tools/probe_r4.py attn384          # no-LN attention, shift=0
    timeout 120 python tools/probe_r4.py attn384_shift    # no-LN attention, shift=2
    timeout 120 python tools/probe_r4.py mlp_tail384      # linear no-LN tail
    timeout 120 python tools/probe_r4.py conv_tail384     # conv no-LN tail
    timeout 120 python tools/probe_r4.py block384         # full stage-2 block split
    timeout 120 python tools/probe_r4.py int8_dot         # tiny int8 GEMM sanity

Each probe prints PROBE_OK <name> <seconds> on success. Run them in the
order above; stop at the first timeout and gate that kernel off.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def _rand(shape, seed, dtype=np.float32):
    return np.random.default_rng(seed).normal(size=shape).astype(dtype)


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "attn384"
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    b, hw, c, nh, ws = 1, 16, 384, 12, 8   # tiny batch, REAL c/nh/ws
    dt = jnp.bfloat16
    x = jnp.asarray(_rand((b, hw, hw, c), 0), dt)
    wqkv = jnp.asarray(0.05 * _rand((c, 3 * c), 1), dt)
    bqkv = jnp.asarray(0.05 * _rand((3 * c,), 2), dt)
    wp = jnp.asarray(0.05 * _rand((c, c), 3), dt)
    bp = jnp.asarray(0.05 * _rand((c,), 4), dt)
    bias = jnp.asarray(_rand((nh, ws * ws, ws * ws), 5))
    scale = (c // nh) ** -0.5

    if name in ("attn384", "attn384_shift"):
        from sodt_tpu.pallas.window_attention import fused_block_attention
        from sodt_tpu.models.swin import shift_attn_mask
        sh = 2 if name.endswith("shift") else 0
        mask = shift_attn_mask(hw, hw, ws, sh) if sh else None
        out = fused_block_attention(x, wqkv, bqkv, wp, bp, bias, mask,
                                    ws, nh, scale, sh, False)
        assert np.isfinite(float(out.sum()))
    elif name == "mlp_tail384":
        from sodt_tpu.pallas.swin_block import fused_mlp_tail
        hid = 4 * c
        r = jnp.asarray(_rand((b, hw, hw, c), 6), dt)
        y = jnp.asarray(_rand((b, hw, hw, c), 7), dt)
        w1 = jnp.asarray(0.05 * _rand((c, hid), 8), dt)
        b1 = jnp.asarray(0.05 * _rand((hid,), 9), dt)
        w2 = jnp.asarray(0.05 * _rand((hid, c), 10), dt)
        b2 = jnp.asarray(0.05 * _rand((c,), 11), dt)
        out = fused_mlp_tail(r, y, w1, b1, w2, b2, False)
        assert np.isfinite(float(out.sum()))
    elif name == "conv_tail384":
        from sodt_tpu.pallas.swin_block import fused_conv_mlp_tail_noln
        r = jnp.asarray(_rand((b, hw, hw, c), 6), dt)
        y = jnp.asarray(_rand((b, hw, hw, c), 7), dt)
        w1 = jnp.asarray(0.05 * _rand((c, c), 8), dt)
        b1 = jnp.asarray(0.05 * _rand((c,), 9), dt)
        wc = jnp.asarray(0.05 * _rand((2, 2, c, c), 10), dt)
        bc = jnp.asarray(0.05 * _rand((c,), 11), dt)
        w2 = jnp.asarray(0.05 * _rand((c, c), 12), dt)
        b2 = jnp.asarray(0.05 * _rand((c,), 13), dt)
        out = fused_conv_mlp_tail_noln(r, y, w1, b1, wc, bc, w2, b2,
                                       False)
        assert np.isfinite(float(out.sum()))
    elif name == "block384":
        # the full stage-2 block through SwinBlock's fast384 branch,
        # both flavors (linear shift=0, conv shift=2)
        from sodt_tpu.models.swin import SwinBlock
        for shift, linear in [(0, True), (2, False)]:
            blk = SwinBlock(dim=c, input_resolution=(hw, hw),
                            num_heads=nh, window_size=ws,
                            shift_size=shift, linear_mlp=linear,
                            dtype=dt)
            xt = jnp.asarray(_rand((b, hw * hw, c), 20 + shift))
            v = blk.init(jax.random.PRNGKey(0), xt)
            out = jax.jit(lambda v, xx: blk.apply(v, xx))(v, xt)
            assert np.isfinite(float(out.sum()))
            print(f"  block384 shift={shift} linear={linear} ok "
                  f"@{time.time() - t0:.1f}s", flush=True)
    elif name == "int8_dot":
        a8 = jnp.asarray(
            np.random.default_rng(0).integers(-127, 127, (256, 256)),
            jnp.int8)
        out = jax.jit(lambda p, q: jax.lax.dot_general(
            p, q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32))(a8, a8)
        assert int(np.asarray(out).sum()) is not None
    else:
        raise SystemExit(f"unknown probe {name}")

    print(f"PROBE_OK {name} {time.time() - t0:.1f}")


if __name__ == "__main__":
    main()
