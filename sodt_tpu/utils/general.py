"""Misc utilities (reference basics/utils/general.py surface)."""

from __future__ import annotations

import logging
import math
import re
from pathlib import Path

import numpy as np


def enable_compile_cache(path: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache.

    Compiled executables are keyed by HLO hash and reloaded across process
    restarts — on this rig every TPU compile goes through a remote-compile
    relay, so cache hits remove the dominant cold-start cost of the train /
    eval / bench CLIs (the reference amortizes nothing: torch re-traces every
    run). Safe everywhere: backends that cannot serialize executables just
    log a warning and compile normally.

    Disable with SODT_NO_COMPILE_CACHE=1; override the location with
    SODT_COMPILE_CACHE=<dir>. Returns the cache dir, or None when disabled.
    """
    import os

    if os.environ.get("SODT_NO_COMPILE_CACHE"):
        return None
    cache_dir = path or os.environ.get(
        "SODT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "sodt_tpu",
                     "jax_cache"))
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything: even sub-second CPU compiles pay off across the
        # test suite, and remote TPU compiles are all far above any floor.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # pragma: no cover - best-effort knob
        logging.getLogger(__name__).warning("compile cache disabled: %s", e)
        return None
    return cache_dir


def resolve_config_path(path) -> str:
    """Resolve a default-style config path for installed (non-repo) use.

    Returns ``path`` untouched when it exists. When it does not AND it
    looks like a repo default — ``configs/<name>`` or a bare ``<name>``
    with no directory — fall back to the copy shipped inside the package
    (``sodt_tpu/configs/``). Any other missing path (user-specified
    directories like ``experiments/model.yaml``) is returned unchanged so
    the caller still raises its normal FileNotFoundError rather than
    silently substituting a same-named packaged default.
    """
    import os
    p = str(path)
    if os.path.exists(p):
        return p
    norm = p.replace("\\", "/")
    if norm.startswith("configs/") or "/" not in norm:
        cand = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                            "configs", os.path.basename(p))
        if os.path.exists(cand):
            return cand
    return p


def set_logging(rank: int = 0):
    logging.basicConfig(
        format="%(message)s",
        level=logging.INFO if rank in (-1, 0) else logging.WARN)


def check_img_size(img_size: int, s: int = 32) -> int:
    """Round img_size up to a multiple of stride s (general.py:127-132)."""
    new_size = int(math.ceil(img_size / s) * s)
    if new_size != img_size:
        print(f"WARNING: --img-size {img_size} must be multiple of {s}, "
              f"updating to {new_size}")
    return new_size


def colorstr(*inputs):
    """ANSI-colored string (general.py:195-217)."""
    *args, string = inputs if len(inputs) > 1 else ("blue", "bold", inputs[0])
    colors = {"black": "\033[30m", "red": "\033[31m", "green": "\033[32m",
              "yellow": "\033[33m", "blue": "\033[34m",
              "magenta": "\033[35m", "cyan": "\033[36m", "white": "\033[37m",
              "bright_red": "\033[91m", "bright_green": "\033[92m",
              "end": "\033[0m", "bold": "\033[1m", "underline": "\033[4m"}
    return "".join(colors[x] for x in args) + f"{string}" + colors["end"]


def clean_str(s: str) -> str:
    return re.sub(pattern="[|@#!¡·$€%&()=?¿^*;:,¨´><+]", repl="_", string=s)


def labels_to_class_weights(labels, nc: int = 80) -> np.ndarray:
    """Inverse-frequency class weights (general.py:220-236)."""
    if not len(labels) or labels[0] is None:
        return np.zeros(0)
    cat = np.concatenate(labels, 0)
    classes = cat[:, 0].astype(np.int32)
    weights = np.bincount(classes, minlength=nc).astype(np.float64)
    weights[weights == 0] = 1
    weights = 1 / weights
    return weights / weights.sum()


def labels_to_image_weights(labels, nc: int = 80,
                            class_weights=None) -> np.ndarray:
    """Per-image sampling weights (general.py:239-244)."""
    if class_weights is None:
        class_weights = np.ones(nc)
    counts = np.array([np.bincount(x[:, 0].astype(int), minlength=nc)
                       for x in labels])
    return (class_weights.reshape(1, nc) * counts).sum(1)


def increment_path(path, exist_ok: bool = False) -> Path:
    """runs/exp -> runs/exp{2,3,...} (general.py increment_path)."""
    path = Path(path)
    if not path.exists() or exist_ok:
        return path
    for n in range(2, 9999):
        p = Path(f"{path}{n}")
        if not p.exists():
            return p
    raise RuntimeError("increment_path exhausted")


def get_latest_run(search_dir: str = ".") -> str:
    """Most recent last* checkpoint dir for --resume (general.py:54-57)."""
    paths = sorted(Path(search_dir).rglob("last*"),
                   key=lambda p: p.stat().st_mtime)
    return str(paths[-1]) if paths else ""
