"""Checkpoint save/resume via orbax (reference lifecycle: SURVEY.md §3.5).

The reference pickles the whole fp16 nn.Module into last.pt/best.pt
(Train.py:527-552) and strips the optimizer at the end
(general.py:566-579). Here checkpoints are explicit pytrees:

  {step, params, batch_stats, ema_params, ema_batch_stats, opt_state,
   best_fitness, epoch}

`strip` produces an eval-only checkpoint holding the EMA weights as the
final model, matching strip_optimizer semantics.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str | Path, state, *, epoch: int,
                    best_fitness: float, extra: dict | None = None):
    path = Path(path).absolute()
    ckpt = {
        "step": np.asarray(state.step),
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "ema_params": _to_host(state.ema_params),
        "ema_batch_stats": _to_host(state.ema_batch_stats),
        "ema_updates": np.asarray(state.ema_updates),
        "epoch": np.asarray(epoch),
        "best_fitness": np.asarray(best_fitness),
    }
    if extra:
        ckpt["extra"] = extra
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, ckpt, force=True)


def load_checkpoint(path: str | Path) -> dict:
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(Path(path).absolute())


def strip_checkpoint(path: str | Path, out_path: str | Path):
    """Keep EMA weights as the final model (general.py:566-579)."""
    ckpt = load_checkpoint(path)
    final = {
        "params": ckpt["ema_params"],
        "batch_stats": ckpt["ema_batch_stats"],
        "epoch": ckpt["epoch"],
    }
    ocp.PyTreeCheckpointer().save(Path(out_path).absolute(), final,
                                  force=True)


def eval_variables(ckpt: dict, *, ema: bool = True) -> dict:
    """Assemble flax variables from a checkpoint (attempt_load parity:
    pick ema else model, experimental.py:113-135)."""
    if ema and "ema_params" in ckpt:
        return {"params": ckpt["ema_params"],
                "batch_stats": ckpt["ema_batch_stats"]}
    return {"params": ckpt["params"], "batch_stats": ckpt["batch_stats"]}
