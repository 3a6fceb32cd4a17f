#!/usr/bin/env python
"""Trace the eval step on the TPU and print a per-op-category breakdown.

Usage: python tools/profile_eval.py [--batch 64] [--iters 3]
Parses the xprof trace (trace.json.gz) for TensorCore op durations and
aggregates by fusion category so kernel work can be ranked.
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--img-size", type=int, default=512)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--train", action="store_true")
    ap.add_argument("--aug", action="store_true",
                    help="profile the device-bank augmentation dispatch "
                         "(mosaic+perspective+HSV+flips), not the model")
    ap.add_argument("--out", default="/tmp/sodt_trace")
    a = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from sodt_tpu.models import build_model
    from sodt_tpu.train.evaluate import make_eval_step
    from sodt_tpu.utils.general import enable_compile_cache
    enable_compile_cache()

    if a.aug:
        from sodt_tpu.data.synthetic import SyntheticVedai
        from sodt_tpu.data.loader import make_bank_feed
        hyp = {"mosaic": 1.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
               "degrees": 0.0, "translate": 0.1, "scale": 0.5,
               "shear": 0.0, "perspective": 0.0, "flipud": 0.0,
               "fliplr": 0.5, "mixup": 0.0}
        ds = SyntheticVedai(n=max(4 * a.batch, 64), img_size=a.img_size)
        feed = make_bank_feed(ds, a.batch, a.img_size, hyp, seed=0,
                              device_bank=True)

        def step(v, x, x2):
            b = feed.augment_step()
            return (b["img"].sum()[None].astype(jnp.float32),
                    b["targets"])
        variables = img = None
        _profile_loop(a, step, variables, img)
        return

    model = build_model("configs/model.yaml", ch_in=4, dtype=jnp.bfloat16,
                        input_mode="RGB+IR")
    x0 = jnp.zeros((a.batch, a.img_size, a.img_size, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, x0, x0, train=False))(
        jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=x0.shape).astype(np.float32))

    if a.train:
        import optax
        from sodt_tpu.train.state import TrainState, make_train_step
        from sodt_tpu.train.loss import LossConfig
        tx = optax.sgd(0.01, momentum=0.937, nesterov=True)
        state = TrainState.create(variables["params"],
                                  variables["batch_stats"], tx)
        loss_cfg = LossConfig(
            nc=8, anchors=model.spec.anchors,
            strides=model.spec.detect_strides,
            hyp_box=0.05, hyp_obj=1.0, hyp_cls=0.5)
        tstep = jax.jit(make_train_step(model, tx, loss_cfg))
        targets = jnp.zeros((a.batch, 60, 5), jnp.float32)
        targets = targets.at[:, :3].set(
            jnp.asarray([0, 0.5, 0.5, 0.1, 0.1], jnp.float32))
        tmask = jnp.zeros((a.batch, 60), bool).at[:, :3].set(True)
        batch = {"img": img, "ir": img, "targets": targets, "tmask": tmask}

        def step(v, x, x2):
            ns, metrics = tstep(state, batch)
            return (metrics["loss"][None], ns.step)
    else:
        estep = make_eval_step(model, conf_thres=0.25, iou_thres=0.45,
                               multi_label=False, top_k=512,
                               approx_topk=True)

        def step(v, x, x2):
            return estep(v, x, x2)

    _profile_loop(a, step, variables, img)


def _profile_loop(a, step, variables, img):
    import glob
    import gzip
    import json
    import time
    from collections import defaultdict

    import jax

    out = step(variables, img, img)
    jax.block_until_ready(out[0])

    t0 = time.perf_counter()
    acc = 0.0
    for _ in range(a.iters):
        o = step(variables, img, img)
        acc = acc + o[0].sum()
    float(acc)
    dt = (time.perf_counter() - t0) / a.iters
    print(f"steady-state: {dt*1e3:.1f} ms/iter, "
          f"{a.batch/dt:.1f} img/s")

    jax.profiler.start_trace(a.out)
    acc = 0.0
    for _ in range(a.iters):
        o = step(variables, img, img)
        acc = acc + o[0].sum()
    float(acc)
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(a.out + "/**/*.trace.json.gz",
                              recursive=True), key=os.path.getmtime)
    if not traces:
        print("no trace file found under", a.out)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)

    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # aggregate ONLY the device "XLA Ops" thread — the "Steps" and
    # "XLA Modules" threads are whole-step parent spans that double-count
    names, tnames = {}, {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e.get("args", {}).get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tnames[(e["pid"], e["tid"])] = e.get("args", {}).get("name", "")
    op_tracks = {k for k, n in tnames.items()
                 if n == "XLA Ops" and "TPU" in names.get(k[0], "")}
    agg = defaultdict(float)
    indiv = defaultdict(float)
    total = 0.0
    for e in events:
        if op_tracks and (e.get("pid"), e.get("tid")) not in op_tracks:
            continue
        name = e.get("name", "?")
        if name.startswith("jit_") or name.startswith("main"):
            continue  # parent module event double-counts its children
        # collapse uniquifying suffixes
        key = name.split(".")[0].rstrip("0123456789_")
        agg[key] += e["dur"]
        indiv[name] += e["dur"]
        total += e["dur"]
    print(f"\ntop op categories ({total/1e3/a.iters:.1f} ms/iter on device):")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {v/total*100:5.1f}%  {v/1e3/a.iters:8.2f} ms  {k}")
    print("\ntop individual ops:")
    for k, v in sorted(indiv.items(), key=lambda kv: -kv[1])[:40]:
        print(f"  {v/total*100:5.1f}%  {v/1e3/a.iters:8.2f} ms  {k}")


if __name__ == "__main__":
    main()
