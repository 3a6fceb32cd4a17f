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
import jax.numpy as jnp
import numpy as np
import orbax.checkpoint as ocp


_PACK_CACHE: dict = {}


def _to_host(tree):
    """Device->host fetch of a checkpoint pytree, packed per dtype.

    On a high-latency link the per-array fetch overhead dominates: the
    flagship state (hundreds of leaves, ~80 MB) costs ~6 s as a batched
    multi-leaf device_get but ~1.7 s as ONE contiguous array (measured,
    r5). ONE jitted pack program (reshape + concat per dtype group) keeps
    it to a single device dispatch and a single compile — per-leaf eager
    concats cost a compile round-trip per op on a remote-compile rig
    (observed: 79 s first save)."""
    leaves, treedef = jax.tree.flatten(tree)
    dev = [i for i, x in enumerate(leaves) if isinstance(x, jax.Array)]
    if len(dev) > 4:
        sig = tuple((leaves[i].shape, str(leaves[i].dtype)) for i in dev)
        pack = _PACK_CACHE.get(sig)
        if pack is None:
            def _pack(*xs):
                groups: dict = {}
                for x in xs:
                    groups.setdefault(str(x.dtype), []).append(
                        x.reshape(-1))
                return {k: jnp.concatenate(v) if len(v) > 1 else v[0]
                        for k, v in groups.items()}
            pack = _PACK_CACHE[sig] = jax.jit(_pack)
        host = jax.device_get(pack(*[leaves[i] for i in dev]))
        offs = {k: 0 for k in host}
        for i in dev:
            x = leaves[i]
            k = str(x.dtype)
            n = int(np.prod(x.shape)) if x.shape else 1
            leaves[i] = np.asarray(
                host[k][offs[k]:offs[k] + n]).reshape(x.shape)
            offs[k] += n
    else:  # small trees: plain overlapped fetch
        for i in dev:
            leaves[i].copy_to_host_async()
        for i in dev:
            leaves[i] = np.asarray(leaves[i])
    leaves = [np.asarray(x) if not isinstance(x, np.ndarray) else x
              for x in leaves]
    return jax.tree.unflatten(treedef, leaves)


def checkpoint_tree(state, *, epoch: int, best_fitness: float,
                    extra: dict | None = None) -> dict:
    """Assemble the host-side checkpoint pytree (one batched fetch).

    Split from the disk write so a caller saving the same state to several
    paths (trainer: last + best) pays the device->host transfer once.
    """
    # Optimizer state (momentum buffers, MultiSteps counters, schedule step
    # — reference restores optimizer.state_dict on resume, Train.py:171-195)
    # is stored as its flattened leaves; the nested optax namedtuple
    # structure is rebuilt at restore time from a fresh tx.init template
    # via restore_opt_state().
    ckpt = {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "ema_params": state.ema_params,
        "ema_batch_stats": state.ema_batch_stats,
        "ema_updates": state.ema_updates,
        "opt_state": {str(i): x
                      for i, x in enumerate(jax.tree.leaves(state.opt_state))},
        "epoch": epoch,
        "best_fitness": best_fitness,
    }
    ckpt = _to_host(ckpt)
    ckpt["epoch"] = np.asarray(epoch)
    ckpt["best_fitness"] = np.asarray(best_fitness)
    if extra:
        ckpt["extra"] = extra
    return ckpt


def write_checkpoint(path: str | Path, ckpt: dict):
    ocp.PyTreeCheckpointer().save(Path(path).absolute(), ckpt, force=True)


def clone_checkpoint(src: str | Path, dst: str | Path):
    """Duplicate a finished checkpoint directory (last -> best).

    Orbax serialization is the expensive half of a save on this rig
    (r5 telemetry: 8-23 s blocking per eval epoch when best re-serializes
    the same pytree); a file-level copy of the completed directory is the
    same artifact for a fraction of the cost. Callers must only clone
    after the source save returned (the trainer's ckpt worker is a single
    thread, so last/best are naturally sequential)."""
    import shutil

    src, dst = Path(src).absolute(), Path(dst).absolute()
    tmp = dst.with_name(dst.name + ".tmp_clone")
    if tmp.exists():
        shutil.rmtree(tmp)
    shutil.copytree(src, tmp)
    if dst.exists():
        shutil.rmtree(dst)
    tmp.rename(dst)


def save_checkpoint(path: str | Path, state, *, epoch: int,
                    best_fitness: float, extra: dict | None = None):
    write_checkpoint(path, checkpoint_tree(state, epoch=epoch,
                                           best_fitness=best_fitness,
                                           extra=extra))


def load_checkpoint(path: str | Path) -> dict:
    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(Path(path).absolute())


def restore_opt_state(template, ckpt: dict):
    """Rebuild the optax state pytree from checkpointed leaves.

    `template` is a freshly initialized opt_state (tx.init(params)) built
    with the SAME optimizer configuration as the checkpointed run; its
    treedef carries the namedtuple structure that orbax cannot serialize.
    """
    if "opt_state" not in ckpt or ckpt["opt_state"] is None:
        raise KeyError("checkpoint has no opt_state (pre-round-2 format)")
    stored = ckpt["opt_state"]
    leaves = [stored[str(i)] for i in range(len(stored))]
    treedef = jax.tree.structure(template)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"opt_state leaf count mismatch: checkpoint has {len(leaves)}, "
            f"fresh optimizer expects {treedef.num_leaves} — was the "
            "optimizer configuration changed between runs?")
    tmpl_leaves = jax.tree.leaves(template)
    leaves = [jnp.asarray(l, dtype=t.dtype) if hasattr(t, "dtype") else l
              for l, t in zip(leaves, tmpl_leaves)]
    return jax.tree.unflatten(treedef, leaves)


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


def load_pretrained_variables(variables: dict, path: str | Path,
                              exclude: tuple = ("anchor",)):
    """Initial-weights load for training (reference Train.py:150-160:
    `intersect_dicts(state_dict, model.state_dict(), exclude=['anchor'])`
    + non-strict load): copy checkpoint leaves into the freshly
    initialized tree wherever the path avoids `exclude` substrings and
    the shape matches; everything else keeps its fresh init. The
    optimizer starts fresh — use --resume for a full-state restart.

    Returns (variables, n_loaded, n_total)."""
    import jax.numpy as jnp
    ckpt = load_checkpoint(path)
    src = eval_variables(ckpt) if (
        "ema_params" in ckpt or "params" in ckpt) else ckpt
    counts = [0, 0]

    def merge(dst, s, p=""):
        out = {}
        for k, v in dst.items():
            sv = s.get(k) if isinstance(s, dict) else None
            q = f"{p}/{k}"
            if isinstance(v, dict):
                out[k] = merge(v, sv if isinstance(sv, dict) else {}, q)
            else:
                counts[1] += 1
                if (sv is not None and not isinstance(sv, dict)
                        and not any(e in q for e in exclude)
                        and getattr(sv, "shape", None) == v.shape):
                    out[k] = jnp.asarray(sv, v.dtype)
                    counts[0] += 1
                else:
                    out[k] = v
        return out

    merged = {c: merge(variables[c], src.get(c, {}))
              for c in ("params", "batch_stats") if c in variables}
    merged.update({c: variables[c] for c in variables if c not in merged})
    return merged, counts[0], counts[1]
