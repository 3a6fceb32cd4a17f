"""Optimizer, LR/momentum schedules, param grouping, EMA — optax-based.

Re-design of the reference training optimization stack:
  * param grouping: no weight decay for 1-D params (BN scales, biases,
    norms), decay for conv/dense kernels, with the reference's hardcoded
    0.00048 decay quirk reproduced as the default
    (/root/reference/basics/optimizer.py:35-50),
  * SGD(nesterov) or Adam(beta1=momentum) (Train.py:147-150),
  * cosine one-cycle LR 1 -> lrf over epochs (general.py:190-192) or linear,
  * per-iteration warmup (>=1000 iters or 3 epochs): LR ramps from 0
    (biases from warmup_bias_lr) and momentum from warmup_momentum
    (Train.py:280,384-392) — expressed as jit-friendly schedules via
    optax.inject_hyperparams,
  * EMA with decay 0.9999 * (1 - exp(-step/2000))
    (torch_utils.py:271-305), applied to params and BN stats.

Gradient accumulation (nominal batch 64, Train.py:124-126) reproduces the
reference exactly: gradients are SUMMED across data iterations (backward()
accumulates; the loss is already scaled by batch size) and the optimizer
fires when `ni % accumulate == 0` (Train.py:448-453), with `accumulate`
itself warmup-interpolated 1 -> nbs/bs over the warmup span (Train.py:387).
optax.MultiSteps would average gradients and use a fixed cadence — both
deviations round 1 carried; see reference_accumulate().
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

REFERENCE_WD = 0.00048  # optimizer.py:49 hardcodes this over hyp weight_decay


def one_cycle(y1: float = 0.0, y2: float = 1.0, steps: int = 100):
    """Cosine ramp y1 -> y2 (reference general.py:190-192)."""
    def f(x):
        return ((1 - jnp.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1
    return f


def linear_lf(lrf: float, epochs: int):
    def f(x):
        return (1 - x / (epochs - 1)) * (1.0 - lrf) + lrf
    return f


def warmup_iters_of(hyp: dict, nb: int) -> int:
    """Warmup span in data iterations: max(3 epochs, 1000) (Train.py:280);
    hyp["warmup_iters"] overrides for tests/short runs."""
    wi = hyp.get("warmup_iters",
                 max(round(hyp.get("warmup_epochs", 3.0) * nb), 1000))
    return max(int(wi), 1)


def warmup_accumulate_plan(accumulate_final: int, warmup_iters: int):
    """Replay the reference accumulation exactly (Train.py:387,448-453).

    For each data iteration ni in [0, warmup_iters] the reference sets
    accumulate = max(1, round(interp(ni, [0, nw], [1, nbs/bs]))) and fires
    the optimizer when ni % accumulate == 0. Returns:
      gate_fn(ni) -> bool   (optimizer fires at data iteration ni)
      ni_of_step(g) -> ni   (data iteration of the g-th optimizer step)
    Both are closed over host-precomputed tables for the warmup span and
    exact closed forms after it.
    """
    k_final = max(int(accumulate_final), 1)
    nw = int(warmup_iters)
    gates, ni_steps = [], []
    for ni in range(nw + 1):
        k = max(1, int(round(np.interp(ni, [0, nw], [1.0, float(k_final)]))))
        fire = ni % k == 0
        gates.append(fire)
        if fire:
            ni_steps.append(ni)
    gate_table = jnp.asarray(gates)
    step_table = jnp.asarray(ni_steps, jnp.int32)
    n_warm_steps = len(ni_steps)
    first_tail_ni = (nw // k_final + 1) * k_final  # first multiple > nw

    def gate_fn(ni):
        ni = jnp.asarray(ni, jnp.int32)
        warm = gate_table[jnp.clip(ni, 0, nw)]
        return jnp.where(ni <= nw, warm, ni % k_final == 0)

    def ni_of_step(g):
        g = jnp.asarray(g, jnp.int32)
        warm = step_table[jnp.clip(g, 0, n_warm_steps - 1)]
        tail = first_tail_ni + (g - n_warm_steps) * k_final
        return jnp.where(g < n_warm_steps, warm, tail)

    return gate_fn, ni_of_step


class ReferenceAccumulateState(NamedTuple):
    ni: jax.Array            # data iteration counter
    acc: Any                 # summed gradients since the last fire
    inner: Any               # inner transformation state
    just_stepped: jax.Array  # did the last update() fire the optimizer?


def reference_accumulate(inner: optax.GradientTransformation, gate_fn):
    """Reference-exact gradient accumulation wrapper.

    Sums incoming gradients (backward() semantics — the loss already
    carries the *batch_size scale, loss.py:163) and applies `inner` to the
    SUM whenever gate_fn(ni) fires; between fires the update is zero.
    """
    def init(params):
        return ReferenceAccumulateState(
            ni=jnp.zeros((), jnp.int32),
            acc=jax.tree.map(jnp.zeros_like, params),
            inner=inner.init(params),
            just_stepped=jnp.asarray(False))

    def update(grads, state, params=None):
        acc = jax.tree.map(lambda a, g: a + g, state.acc, grads)
        do = gate_fn(state.ni)

        def fire(_):
            ups, inner2 = inner.update(acc, state.inner, params)
            return ups, inner2, jax.tree.map(jnp.zeros_like, acc)

        def skip(_):
            return jax.tree.map(jnp.zeros_like, acc), state.inner, acc

        ups, inner2, acc2 = jax.lax.cond(do, fire, skip, None)
        return ups, ReferenceAccumulateState(
            ni=state.ni + 1, acc=acc2, inner=inner2, just_stepped=do)

    return optax.GradientTransformation(init, update)


def lr_schedules(hyp: dict, epochs: int, nb: int, *, linear_lr: bool = False,
                 accumulate: int = 1, ni_of_step=None):
    """Per-optimizer-step LR schedules (weights/bn vs bias) + momentum.

    `nb` = batches per epoch. Warmup spans max(3 epochs, 1000 iters) of
    *data* iterations (Train.py:280). `ni_of_step` maps optimizer step ->
    data iteration (exact under warmup-interpolated accumulation); without
    it the static `step * accumulate` approximation is used.
    """
    lr0 = hyp["lr0"]
    lrf = hyp["lrf"]
    lf = (linear_lf(lrf, epochs) if linear_lr
          else one_cycle(1.0, lrf, epochs))
    warmup_iters = warmup_iters_of(hyp, nb)
    if ni_of_step is None:
        ni_of_step = lambda step: step * accumulate

    def base_lr(ni):
        epoch = ni / nb
        return lr0 * lf(epoch)

    def _interp(ni, y0, y1):
        t = jnp.clip(ni / warmup_iters, 0.0, 1.0)
        return y0 + t * (y1 - y0)

    def lr_weights(step):
        ni = ni_of_step(step)
        warm = _interp(ni, 0.0, base_lr(ni))
        return jnp.where(ni < warmup_iters, warm, base_lr(ni))

    def lr_bias(step):
        ni = ni_of_step(step)
        warm = _interp(ni, hyp.get("warmup_bias_lr", 0.1), base_lr(ni))
        return jnp.where(ni < warmup_iters, warm, base_lr(ni))

    def momentum(step):
        ni = ni_of_step(step)
        warm = _interp(ni, hyp.get("warmup_momentum", 0.8), hyp["momentum"])
        return jnp.where(ni < warmup_iters, warm, hyp["momentum"])

    return lr_weights, lr_bias, momentum, warmup_iters


def param_labels(params) -> Any:
    """'decay' for >=2-D kernels, 'bias' for *bias leaves, 'nodecay' else.

    Mirrors set_weight_decay's split (optimizer.py:35-50) plus the separate
    bias warmup group (Train.py:138-150).
    """
    def label(path, p):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if p.ndim >= 2 and "bias" not in name:
            return "decay"
        if name == "bias":
            return "bias"
        return "nodecay"
    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(hyp: dict, params, epochs: int, nb: int, *,
                   adam: bool = False, linear_lr: bool = False,
                   accumulate: int = 1,
                   weight_decay: float | None = None,
                   wrap_accumulate: bool = True):
    """Build the full optax chain (grouped wd + schedules + accumulation)."""
    ni_of_step = None
    gate_fn = None
    if accumulate > 1 and wrap_accumulate:
        gate_fn, ni_of_step = warmup_accumulate_plan(
            accumulate, warmup_iters_of(hyp, nb))
    lr_w, lr_b, mom, _ = lr_schedules(hyp, epochs, nb, linear_lr=linear_lr,
                                      accumulate=accumulate,
                                      ni_of_step=ni_of_step)
    wd = REFERENCE_WD if weight_decay is None else weight_decay

    def sgd_group(lr_fn, use_wd):
        chain = []
        if use_wd:
            chain.append(optax.add_decayed_weights(wd))
        if adam:
            chain.append(optax.inject_hyperparams(
                lambda b1: optax.scale_by_adam(b1=b1))(b1=mom))
        else:
            chain.append(optax.inject_hyperparams(
                lambda momentum: optax.trace(decay=momentum, nesterov=True))(
                    momentum=mom))
        chain.append(optax.inject_hyperparams(
            lambda learning_rate: optax.scale_by_learning_rate(
                learning_rate))(learning_rate=lr_fn))
        return optax.chain(*chain)

    tx = optax.multi_transform(
        {"decay": sgd_group(lr_w, True),
         "nodecay": sgd_group(lr_w, False),
         "bias": sgd_group(lr_b, False)},
        param_labels(params))
    if gate_fn is not None:
        tx = reference_accumulate(tx, gate_fn)
    return tx


def ema_decay(step, base: float = 0.9999, tau: float = 2000.0):
    """EMA decay ramp (torch_utils.py:283): d = base*(1 - e^{-t/tau})."""
    return base * (1.0 - jnp.exp(-step / tau))


def ema_update(ema_tree, new_tree, step):
    """One EMA step over an arbitrary pytree (params + batch_stats)."""
    d = ema_decay(step.astype(jnp.float32))
    return jax.tree.map(lambda e, p: e * d + (1.0 - d) * p.astype(e.dtype),
                        ema_tree, new_tree)
