"""Profiling / tracing: per-function timing, FLOPs, XLA traces.

TPU-native replacement for the reference's profiling surface (SURVEY.md
§5.1: CUDA-synchronized per-module timers model.py:224-277, thop GFLOPs
torch_utils.py:216-223, op microbenchmark torch_utils.py:97-133):

  * `flops_estimate(fn, *args)` — analytical FLOPs from the lowered HLO
    cost analysis (replaces thop),
  * `time_fn(fn, *args)` — compile-excluded steady-state timing with
    dispatch-proof result materialization,
  * `model_info(model, variables)` — params/FLOPs summary like
    torch_utils.model_info,
  * `trace(path)` — context manager around jax.profiler for full XLA
    timelines viewable in TensorBoard/xprof.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable

import numpy as np
import jax


def flops_estimate(fn: Callable, *args) -> float | None:
    """Analytical FLOPs of jit(fn)(*args) from XLA's cost analysis."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
    except Exception:
        return None


def time_fn(fn: Callable, *args, iters: int = 10, warmup: int = 2) -> dict:
    """Steady-state wall time of a jitted callable (per call, seconds)."""
    jfn = jax.jit(fn) if not hasattr(fn, "lower") else fn
    out = None
    for _ in range(warmup):
        out = jfn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    acc = None
    for _ in range(iters):
        out = jfn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    flops = flops_estimate(fn, *args) if not hasattr(fn, "lower") else None
    res = {"seconds": dt}
    if flops:
        res["gflops"] = flops / 1e9
        res["tflops_per_s"] = flops / dt / 1e12
    return res


def model_info(model, variables, img_size: int = 512, batch: int = 1,
               ch: int = 3) -> dict:
    """Params + forward GFLOPs summary (reference model_info,
    torch_utils.py:205-227)."""
    import jax.numpy as jnp
    n_params = sum(p.size for p in jax.tree.leaves(variables["params"]))
    x = jnp.zeros((batch, img_size, img_size, ch), jnp.float32)
    flops = flops_estimate(
        lambda v, a, b: model.apply(v, a, b, train=False), variables, x, x)
    info = {"params_m": n_params / 1e6}
    if flops:
        info["gflops"] = flops / 1e9 / batch
    return info


@contextlib.contextmanager
def trace(log_dir: str):
    """XLA trace context (view with tensorboard --logdir)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
