#!/usr/bin/env python
"""Microbenchmarks for the hot ops, run on the real chip.

Timing rule for this rig (remote-tunnel dispatch): run K iterations inside
one jitted lax.scan feeding a checksum, fetch once. Reports ms/op.

  python -u tools/microbench.py attn   # window attention variants
  python -u tools/microbench.py gelu   # exact vs tanh GELU on MLP shapes
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, iters=4, repeats=3):
    """Best-of-N of a scan-amortized jitted loop; returns seconds/iter."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(*a):
        def body(acc, _):
            out = fn(*a)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc + leaf.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32),
                              None, length=iters)
        return acc

    float(run(*args))  # compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def bench_attn(batch: int):
    import jax.numpy as jnp
    from sodt_tpu.pallas import window_attention as wa

    rng = np.random.default_rng(0)
    cases = [
        # (name, B, H, W, C, nh, ws, masked)
        ("stage1 shift", batch, 128, 128, 192, 12, 8, True),
        ("stage1 plain", batch, 128, 128, 192, 12, 8, False),
        ("stage2 plain", batch, 64, 64, 384, 12, 8, False),
        ("stage3 global", batch, 32, 32, 768, 12, 32, False),
    ]
    for name, b, h, w, c, nh, ws, masked in cases:
        qkv = jnp.asarray(rng.standard_normal((b, h, w, 3 * c)),
                          jnp.bfloat16)
        n = ws * ws
        bias = jnp.asarray(rng.standard_normal((nh, n, n)), jnp.float32)
        mask = None
        if masked:
            from sodt_tpu.models.swin import shift_attn_mask
            mask = shift_attn_mask(h, w, ws, 2)
        scale = (c // nh) ** -0.5
        flops = 4 * b * h * w * n * c  # 2 matmuls, unpacked tokens

        variants = [
            ("pallas", lambda q: wa.window_attention_core_nhwc(
                q, bias, mask, ws, nh, scale, use_pallas=True)),
            ("xla", lambda q: wa.reference_attention_nhwc(
                q, bias, mask, ws, nh, scale)),
        ]
        if n > 256:
            variants = [v for v in variants if v[0] != "pallas"]
            if hasattr(wa, "global_attention_core"):
                variants.insert(0, ("pallas-glb", lambda q:
                                    wa.global_attention_core(
                                        q, bias, nh, scale)))
        for label, fn in variants:
            try:
                dt = timed(fn, qkv)
            except Exception as e:  # noqa: BLE001
                print(f"  {name:14s} {label:10s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:120]}", flush=True)
                continue
            print(f"  {name:14s} {label:10s} {dt*1e3:8.2f} ms  "
                  f"{flops/dt/1e12:6.1f} TF/s-equiv", flush=True)


def bench_gelu(batch: int):
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    for shape in [(batch, 128, 128, 768), (batch, 64, 64, 1536)]:
        x = jnp.asarray(rng.standard_normal(shape), jnp.bfloat16)
        n = int(np.prod(shape))
        for label, fn in [
            ("erf exact", lambda t: jax.nn.gelu(t, approximate=False)),
            ("tanh approx", lambda t: jax.nn.gelu(t, approximate=True)),
        ]:
            dt = timed(fn, x)
            print(f"  {str(shape):22s} {label:12s} {dt*1e3:7.2f} ms  "
                  f"{n/dt/1e9:6.1f} Gelem/s", flush=True)
        a = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
        b = jax.nn.gelu(x.astype(jnp.float32), approximate=True)
        print(f"  {str(shape):22s} max |exact-tanh| = "
              f"{float(jnp.abs(a - b).max()):.3e}", flush=True)


def bench_block(batch: int):
    """Stage-1 megakernel, bf16 vs int8 serving GEMMs, at flagship shape
    (128x128 map, c=192, ws=8, nh=12)."""
    import numpy as np
    import jax.numpy as jnp
    from sodt_tpu.pallas.swin_block import (_pallas_swin_block,
                                            _pallas_swin_block_q8)

    hw, c, nh, ws = 128, 192, 12, 8
    hid = 4 * c
    rng = np.random.default_rng(0)
    r = lambda s_: jnp.asarray(
        rng.normal(size=s_).astype(np.float32) * 0.1)
    x = r((batch, hw, hw, c)).astype(jnp.bfloat16)
    lns1, lnb1 = 1.0 + r((c,)), r((c,))
    lns2, lnb2 = 1.0 + r((c,)), r((c,))
    wqkv, bqkv = r((c, 3 * c)).astype(jnp.bfloat16), r((3 * c,)).astype(jnp.bfloat16)
    wp, bp = r((c, c)).astype(jnp.bfloat16), r((c,)).astype(jnp.bfloat16)
    w1, b1 = r((c, hid)).astype(jnp.bfloat16), r((hid,)).astype(jnp.bfloat16)
    w2, b2 = r((hid, c)).astype(jnp.bfloat16), r((c,)).astype(jnp.bfloat16)
    bias = r((nh, ws * ws, ws * ws))
    scale = (c // nh) ** -0.5
    args = (x, lns1, lnb1, wqkv, bqkv, wp, bp, lns2, lnb2, w1, b1, w2,
            b2, bias)
    t_bf = timed(lambda *a: _pallas_swin_block(*a, ws, nh, scale), *args)
    print(f"block bf16  b{batch}: {t_bf*1e3:8.2f} ms")
    t_q8 = timed(lambda *a: _pallas_swin_block_q8(*a, ws, nh, scale),
                 *args)
    print(f"block int8  b{batch}: {t_q8*1e3:8.2f} ms "
          f"({t_bf/t_q8:.2f}x)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("which", choices=["attn", "gelu", "block", "all"],
                   nargs="?",
                   default="all")
    p.add_argument("--batch", type=int, default=16)
    a = p.parse_args()
    if a.which in ("attn", "all"):
        print("window attention (bf16):", flush=True)
        bench_attn(a.batch)
    if a.which in ("block", "all"):
        bench_block(a.batch)
    if a.which in ("gelu", "all"):
        print("GELU:", flush=True)
        bench_gelu(a.batch)


if __name__ == "__main__":
    main()
