"""Pallas TPU kernels and their dispatch policy.

`kernels_enabled()` is the single gate every fast path consults: kernels
dispatch on TPU-like backends unless disabled for the current trace.
Disabling matters for (a) FLOPs accounting — XLA's cost analysis cannot
see inside Pallas custom calls, so an honest MFU denominator lowers the
pure-XLA composition (bench.py) — and (b) A/B timing of kernel vs XLA.
"""

from __future__ import annotations

import contextlib

import jax

_disabled = False
_int8 = False


def kernels_enabled() -> bool:
    """True when Pallas fast paths should dispatch (TPU backend, not
    explicitly disabled; SODT_NO_KERNELS=1 disables from the
    environment — e.g. to keep odd-shape sweeps off the Mosaic remote
    compiler)."""
    import os

    if _disabled or os.environ.get("SODT_NO_KERNELS"):
        return False
    return jax.default_backend() not in ("cpu",)


@contextlib.contextmanager
def no_kernels():
    """Force the XLA composition paths within the context (trace-time
    switch: re-jit/lower inside the context to take effect)."""
    global _disabled
    prev = _disabled
    _disabled = True
    try:
        yield
    finally:
        _disabled = prev


def int8_enabled() -> bool:
    """True when the int8 serving path should dispatch: megakernel GEMMs
    run s8xs8->s32 on the MXU (v5e: 2x the bf16 rate) with per-output-
    channel weight scales and per-strip dynamic activation scales."""
    return _int8 and kernels_enabled()


@contextlib.contextmanager
def int8_serving():
    """Quantized-GEMM serving mode within the context (trace-time switch
    like no_kernels: the flag is read when the model traces, so wrap BOTH
    step construction and its first (compiling) call)."""
    global _int8
    prev = _int8
    _int8 = True
    try:
        yield
    finally:
        _int8 = prev
