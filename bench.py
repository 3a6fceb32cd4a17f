#!/usr/bin/env python
"""Benchmark: VEDAI end-to-end images/sec/chip at 512 px (BASELINE.json).

Measures the full inference path on the flagship config (model.yaml:
cross-channel attention + enhanced SWIN + YOLO head) — forward, Detect
decode, and on-device NMS — as one jitted program in bf16, end to end from
[0,1] float image batches.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` divides by an estimated PyTorch-GPU end-to-end throughput for
the same model at 512 px. The reference repo publishes no numbers
(BASELINE.md), so the denominator is an engineering estimate for a single
modern datacenter GPU running the reference eval loop (fp16, batched, CUDA
NMS); treat it as a stable yardstick across rounds rather than a measured
opponent.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

ESTIMATED_REFERENCE_GPU_IPS = 120.0  # see module docstring


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true",
                   help="small shapes for CPU verification")
    p.add_argument("--batch-size", type=int, default=0,
                   help="0 = auto")
    p.add_argument("--img-size", type=int, default=0)
    p.add_argument("--cfg", default="configs/model.yaml")
    p.add_argument("--iters", type=int, default=0)
    p.add_argument("--top-k", type=int, default=0, help="NMS candidate cap")
    p.add_argument("--platform", default="", help="force jax platform (e.g. cpu)")
    a = p.parse_args()

    import jax
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    import jax.numpy as jnp
    from sodt_tpu.models import build_model
    from sodt_tpu.train.evaluate import make_eval_step

    img_size = a.img_size or (128 if a.quick else 512)
    batch = a.batch_size or (2 if a.quick else 128)
    iters = a.iters or (3 if a.quick else 8)

    model = build_model(a.cfg, ch_in=4, dtype=jnp.bfloat16,
                        input_mode="RGB+IR")
    x0 = jnp.zeros((batch, img_size, img_size, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
        jax.random.PRNGKey(0))

    # production inference settings: conf 0.25, best-class only (the
    # reference's detect-path defaults; multi_label stays an eval-protocol
    # feature for mAP runs)
    step = make_eval_step(model, conf_thres=0.25, iou_thres=0.45,
                          multi_label=False,
                          top_k=a.top_k or (1024 if a.quick else 2048))

    rng = np.random.default_rng(0)
    n_inputs = 4  # rotate inputs so no runtime-level memoization can hide work
    imgs = [jnp.asarray(rng.uniform(size=x0.shape).astype(np.float32))
            for _ in range(n_inputs)]
    irs = [jnp.asarray(rng.uniform(size=x0.shape).astype(np.float32))
           for _ in range(n_inputs)]

    dets, valid, _ = step(variables, imgs[0], irs[0])  # compile
    np.asarray(dets)  # materialize on host

    # timed windows: every iteration's output feeds a running checksum that
    # is fetched to host at the window end, so async dispatch can't fake
    # completion. Best-of-3 windows damps host/tunnel dispatch jitter.
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        acc = 0.0
        for i in range(iters):
            dets, valid, _ = step(variables, imgs[i % n_inputs],
                                  irs[i % n_inputs])
            acc = acc + dets.sum()
        acc_host = float(acc)
        assert np.isfinite(acc_host)
        best = min(best, time.perf_counter() - t0)
    dt = best

    n_chips = jax.device_count()
    ips_per_chip = batch * iters / dt / n_chips
    print(json.dumps({
        "metric": "VEDAI end-to-end images/sec/chip at 512px",
        "value": round(ips_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips_per_chip / ESTIMATED_REFERENCE_GPU_IPS, 3),
    }))


if __name__ == "__main__":
    main()
