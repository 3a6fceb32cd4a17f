"""Sharpness-Aware Minimization (reference basics/utils/sam.py:4-62).

The reference carries a two-step SAM wrapper (ascend to the worst-case
neighborhood, then descend) plus BN-bypass helpers (bypass_bn.py) on its
import surface. Here SAM composes as an optax transformation around any base
optimizer; `make_sam_optimizer` mirrors `make_optimizer`'s grouping.

Note: SAM doubles the gradient computations per step (the adversarial
ascent needs a second forward/backward), which optax.contrib.sam expresses
via its `opaque_mode`/gradient-transform contract.
"""

from __future__ import annotations

import optax
import optax.contrib

from .optim import (make_optimizer, reference_accumulate,
                    warmup_accumulate_plan, warmup_iters_of)


def make_sam_optimizer(hyp: dict, params, epochs: int, nb: int, *,
                       rho: float = 0.05, adam: bool = False,
                       linear_lr: bool = False, accumulate: int = 1):
    """SAM(base) with the reference's rho=0.05 default (sam.py:7)."""
    # schedules calibrated for `accumulate`, but the accumulation wrapper
    # goes OUTSIDE the SAM composition (ascent must see summed gradients)
    base = make_optimizer(hyp, params, epochs=epochs, nb=nb, adam=adam,
                          linear_lr=linear_lr, accumulate=accumulate,
                          wrap_accumulate=False)
    adv = optax.chain(optax.contrib.normalize(), optax.scale(rho))
    tx = optax.contrib.sam(base, adv, opaque_mode=True)
    if accumulate > 1:
        gate_fn, _ = warmup_accumulate_plan(accumulate,
                                            warmup_iters_of(hyp, nb))
        tx = reference_accumulate(tx, gate_fn)
    return tx
