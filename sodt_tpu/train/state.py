"""TrainState + the single jitted train step.

The reference spreads training-step state across mutable objects (model
buffers, GradScaler, ModelEMA, LambdaLR — Train.py:280-453). Here the entire
step is one pure function `train_step(state, batch) -> (state, metrics)`
over an explicit pytree, which jits once and shards over the device mesh:

  * forward (bf16-capable) with BN stats carried in `batch_stats`,
  * detection loss (+ optional SR L1, Train.py:407-427),
  * grads -> optax update (schedules + warmup are functions of state.step),
  * EMA of params and BN stats (gated on real optimizer steps when
    gradient accumulation wraps the transformation).

No GradScaler: bf16 on TPU keeps the fp32 exponent range so loss scaling is
unnecessary (SURVEY.md §2.5 AMP row).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .loss import LossConfig, compute_loss
from .optim import ema_update


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any
    ema_params: Any
    ema_batch_stats: Any
    ema_updates: jax.Array  # EMA update counter (torch_utils.py:287)

    @classmethod
    def create(cls, params, batch_stats, tx):
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   batch_stats=batch_stats, opt_state=tx.init(params),
                   ema_params=jax.tree.map(jnp.asarray, params),
                   ema_batch_stats=jax.tree.map(jnp.asarray, batch_stats),
                   ema_updates=jnp.zeros((), jnp.int32))


def make_train_step(model, tx, loss_cfg: LossConfig, *, sr: bool = False,
                    down_factor: int = 1, accumulate: int = 1,
                    freeze: tuple = ()):
    """Build the jittable train step for a DetectionModel.

    `freeze`: substrings of parameter paths to freeze (reference
    Train.py:116-121 sets requires_grad=False by name substring); matching
    params get zero grads AND zero optimizer updates, so neither the
    gradient step nor weight decay moves them.

    batch: dict with
      img   (B, H, W, 3) float in [0, 1]
      ir    (B, H, W, 3) float in [0, 1]
      targets (B, M, 5) [cls, cx, cy, w, h] normalized; tmask (B, M) bool

    SR regime (reference Train.py:364-379,405-427): with down_factor > 1
    the model consumes bilinear-downsampled inputs while the SR branch
    reconstructs the ORIGINAL resolution; L1 weights are 0.5 for single
    modality and 0.1 * (rgb + ir) for fused modes.
    """

    def loss_fn(params, batch_stats, batch):
        img, ir = batch["img"], batch.get("ir")
        img_in, ir_in = img, ir
        if down_factor > 1:
            b, h, w, c = img.shape
            ns = (b, h // down_factor, w // down_factor, c)
            img_in = jax.image.resize(img, ns, "bilinear")
            ir_in = (jax.image.resize(ir, ns, "bilinear")
                     if ir is not None else None)
        out, mut = model.apply(
            {"params": params, "batch_stats": batch_stats},
            img_in, ir_in, train=True, mutable=["batch_stats"])
        total, parts = compute_loss(out["raw"], batch["targets"],
                                    batch["tmask"], loss_cfg)
        if sr and "sr" in out:
            sr_out = out["sr"].astype(jnp.float32)
            mode = model.input_mode
            if mode == "IR":
                sr_loss = 0.5 * jnp.mean(jnp.abs(sr_out - ir))
            elif mode == "RGB":
                sr_loss = 0.5 * jnp.mean(jnp.abs(sr_out - img))
            else:
                sr_loss = 0.1 * (
                    jnp.mean(jnp.abs(sr_out[..., 0:3] - img))
                    + jnp.mean(jnp.abs(sr_out[..., 3:4] - ir[..., 0:1])))
            total = total + sr_loss
            parts = dict(parts, sr=sr_loss)
        return total, (parts, mut["batch_stats"])

    def _freeze_mask(tree):
        from jax.tree_util import tree_map_with_path, keystr
        return tree_map_with_path(
            lambda p, g: (jnp.zeros_like(g)
                          if any(f in keystr(p) for f in freeze) else g),
            tree)

    def train_step(state: TrainState, batch):
        (total, (parts, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch)
        if freeze:
            grads = _freeze_mask(grads)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        if freeze:
            updates = _freeze_mask(updates)
        new_params = optax.apply_updates(state.params, updates)

        if accumulate > 1:
            did_step = (new_opt.just_stepped
                        if hasattr(new_opt, "just_stepped")
                        else new_opt.mini_step == 0)
        else:
            did_step = jnp.asarray(True)

        new_updates = state.ema_updates + did_step.astype(jnp.int32)
        ema_p = ema_update(state.ema_params, new_params, new_updates)
        ema_b = ema_update(state.ema_batch_stats, new_bs, new_updates)
        keep = lambda new, old: jax.tree.map(
            lambda n, o: jnp.where(did_step, n, o), new, old)
        ema_p = keep(ema_p, state.ema_params)
        ema_b = keep(ema_b, state.ema_batch_stats)

        new_state = state.replace(
            step=state.step + 1, params=new_params, batch_stats=new_bs,
            opt_state=new_opt, ema_params=ema_p, ema_batch_stats=ema_b,
            ema_updates=new_updates)
        metrics = {"loss": total, **{k: v for k, v in parts.items()}}
        return new_state, metrics

    return train_step


def make_epoch_scan(train_step: Callable, bank_aug_fn: Callable,
                    mesh=None):
    """One jitted dispatch per EPOCH: lax.scan over (gather -> augment ->
    train_step) against a device-resident tile bank.

    The reference amortizes host work with a cv2 worker pool feeding CUDA
    streams (datasets.py:118-147); the TPU answer is to remove the host from
    the steady state entirely. With the dataset's u8 tiles parked in HBM
    (loader.BankFeed) the whole epoch's data dependency is the (K, B, 4)
    index schedule + (K, B) RNG keys — everything else (tile gather,
    u8->f32 cast, mosaic/perspective/HSV augmentation, fwd/bwd, optimizer)
    runs device-side in ONE XLA program. On a dispatch-latency-bound rig
    (this one: HTTP tunnel) that is the difference between ~15 and the
    full device-rate img/s.

    `train_step` and `bank_aug_fn` must be the raw (un-jitted) callables.
    Metrics come back stacked along the leading (step) axis.

    `mesh`: on a multi-device mesh the bank is replicated and the
    augmented batch gets a `P("data")` sharding constraint inside the
    scan body, so the train step runs data-parallel exactly like the
    per-step `shard_batch` path (XLA inserts the gradient/BN collectives).
    """
    if mesh is not None and len(mesh.devices.ravel()) > 1:
        from jax.sharding import NamedSharding, PartitionSpec as SP
        sh = NamedSharding(mesh, SP("data"))

        def constrain(t):
            return jax.lax.with_sharding_constraint(t, sh)
    else:
        def constrain(t):
            return t

    def epoch_fn(state, banks, prim, sec, keys):
        def body(st, xs):
            p, s_, k = xs
            img, irr, targets, tmask = bank_aug_fn(*banks, p, s_, k)
            batch = {"img": constrain(img), "ir": constrain(irr),
                     "targets": constrain(targets),
                     "tmask": constrain(tmask)}
            return train_step(st, batch)
        return jax.lax.scan(body, state, (prim, sec, keys))

    # no donation: TrainState.create aliases params/ema buffers, and XLA
    # rejects donating the same buffer twice
    return jax.jit(epoch_fn)
