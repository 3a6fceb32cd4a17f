"""ctypes bindings for the C++ prefetching tile loader (native/loader.cpp).

Async submit/wait over a GIL-free worker: Python submits the NEXT step's
tile indices before blocking on the device, so decode/resize overlaps TPU
compute — the role torch DataLoader workers play in the reference
(datasets.py:118-147), rebuilt for a 1-core host. Falls back cleanly when
the shared library hasn't been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_LIB_PATH = Path(__file__).parent.parent.parent / "native" / "libsodt_loader.so"
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        try:  # best-effort build
            subprocess.run(["make", "-C", str(_LIB_PATH.parent)], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError:
        return None
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int, ctypes.c_int, ctypes.c_size_t]
    lib.loader_submit.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int]
    lib.loader_wait.restype = ctypes.c_int
    lib.loader_wait.argtypes = [
        ctypes.c_void_p, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8)]
    lib.loader_last_error.restype = ctypes.c_int
    lib.loader_last_error.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def available() -> bool:
    return _load_lib() is not None


class NativeTileLoader:
    """Decode-and-resize service over (rgb, ir) path pairs."""

    def __init__(self, rgb_paths: list[str], ir_paths: list[str],
                 img_size: int, cache_gb: float = 8.0):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native loader not built (make -C native)")
        self._lib = lib
        self.img_size = img_size
        self.n = len(rgb_paths)
        enc = lambda ps: (ctypes.c_char_p * len(ps))(
            *[p.encode() for p in ps])
        self._rgb_arr = enc(rgb_paths)   # keep refs alive
        self._ir_arr = enc(ir_paths)
        self._handle = lib.loader_create(
            self._rgb_arr, self._ir_arr, self.n, img_size,
            int(cache_gb * (1 << 30)))
        self._next_id = 0

    def submit(self, indices: np.ndarray) -> int:
        idx = np.ascontiguousarray(indices, dtype=np.int32)
        job = self._next_id
        self._next_id += 1
        self._lib.loader_submit(
            self._handle, job,
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), len(idx))
        self._pending_sizes = getattr(self, "_pending_sizes", {})
        self._pending_sizes[job] = len(idx)
        return job

    def wait(self, job: int):
        n = self._pending_sizes.pop(job)
        s = self.img_size
        rgb = np.empty((n, s, s, 3), np.uint8)
        ir = np.empty((n, s, s, 3), np.uint8)
        ok = self._lib.loader_wait(
            self._handle, job,
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            ir.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        if not ok:
            buf = ctypes.create_string_buffer(4096)
            self._lib.loader_last_error(self._handle, buf, len(buf))
            detail = buf.value.decode(errors="replace") or "unknown error"
            raise RuntimeError(f"native loader job failed: {detail}")
        return rgb, ir

    def get(self, indices: np.ndarray):
        return self.wait(self.submit(indices))

    def close(self):
        if self._handle:
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
