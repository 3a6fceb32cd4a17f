#!/usr/bin/env python
"""Evaluation CLI — the reference `python -m basics.test` surface
(/root/reference/basics/test.py:348-408), TPU-native.

Tasks: val/test (mAP), speed (latency sweep), study (accuracy/latency vs
image size 256..1536 step 128, test.py:395-408).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
import yaml

from sodt_tpu.models import build_model
from sodt_tpu.data import SyntheticVedai, VedaiDataset
from sodt_tpu.data.loader import make_eval_batches
from sodt_tpu.train.evaluate import evaluate, make_eval_step
from sodt_tpu.train.checkpoint import load_checkpoint, eval_variables


def build(a, img_size: int):
    from sodt_tpu.utils.general import resolve_config_path
    with open(resolve_config_path(a.data)) as f:
        data_cfg = yaml.safe_load(f)
    nc = int(data_cfg.get("nc", 8))
    names = data_cfg.get("names", [str(i) for i in range(nc)])
    ch_in = {"RGB": 3, "IR": 3, "RGB+IR": 4, "RGB+IR+fusion": 8,
             "RGB+IR+MF": 3}[a.input_mode]
    dtype = jnp.bfloat16 if a.bf16 else jnp.float32
    model = build_model(a.cfg, ch_in=ch_in, nc=nc, dtype=dtype,
                        input_mode=a.input_mode)
    if a.weights:
        from sodt_tpu.utils.downloads import attempt_download
        paths = [attempt_download(p) for p in a.weights.split(",")]
        # multi-checkpoint NMS ensemble (reference attempt_load/Ensemble,
        # experimental.py:98-135): predictions concatenated before NMS
        variables = [eval_variables(load_checkpoint(p)) for p in paths]
        if len(variables) == 1:
            variables = variables[0]
    else:
        x0 = jnp.zeros((1, img_size, img_size, 3), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x0, x0, train=False)
    if a.synthetic:
        ds = SyntheticVedai(n=a.synthetic_n, img_size=img_size, nc=nc,
                            seed=1)
    else:
        ds = VedaiDataset(data_cfg.get(a.task if a.task in ("val", "test",
                                                            "train")
                                       else "val", data_cfg["val"]),
                          img_size=img_size)
    if getattr(a, "single_cls", False):
        from sodt_tpu.data.vedai import apply_single_cls
        apply_single_cls(ds)
        nc, names = 1, ["item"]
    return model, variables, ds, nc, names


def run_map(a, img_size: int):
    from pathlib import Path
    model, variables, ds, nc, names = build(a, img_size)
    save_dir = Path(a.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    m = evaluate(model, variables,
                 make_eval_batches(ds, a.batch_size, img_size,
                                   rect=a.rect),
                 nc=nc, img_size=img_size, conf_thres=a.conf_thres,
                 iou_thres=a.iou_thres, names=names, verbose=a.verbose,
                 confusion=a.plots, augment=a.augment,
                 anno_json=a.anno_json or None,
                 save_json=str(save_dir / "predictions.json")
                 if a.save_json else None,
                 save_txt=str(save_dir / "labels") if a.save_txt else None,
                 save_conf=a.save_conf, save_hybrid=a.save_hybrid)
    if a.plots and "confusion_matrix" in m:
        from sodt_tpu.utils.plots import plot_confusion_matrix
        plot_confusion_matrix(m["confusion_matrix"],
                              save_dir / "confusion_matrix.png", names)
    from sodt_tpu.utils.metrics import write_per_class_csv
    from sodt_tpu.utils.xlsx import write_per_class_xlsx
    write_per_class_csv(m, names, save_dir / "per_class.csv")
    # the reference's xlsx workbook artifact (test.py:271-297), stdlib-built
    write_per_class_xlsx(m, names, save_dir / "per_class.xlsx")
    return m


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cfg", default="configs/model.yaml")
    p.add_argument("--data", default="configs/data_vedai.yaml")
    p.add_argument("--weights", default="")
    p.add_argument("--task", default="val",
                   choices=["val", "test", "train", "speed", "study"])
    p.add_argument("--study-sizes", default="",
                   help="comma list of sizes for --task study (default: "
                        "the reference's 256..1536 step 128 sweep, "
                        "test.py:398 — each size is a fresh compile; "
                        "bound the list on remote-compile rigs)")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--conf-thres", type=float, default=0.001)
    p.add_argument("--iou-thres", type=float, default=0.6)
    p.add_argument("--input_mode", default="RGB+IR")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-n", type=int, default=16)
    p.add_argument("--no-bf16", action="store_false", dest="bf16")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--plots", action="store_true",
                   help="write PR/confusion plots to --save-dir")
    p.add_argument("--save-dir", default="runs/val/exp")
    p.add_argument("--save-json", action="store_true")
    p.add_argument("--save-txt", action="store_true")
    p.add_argument("--save-conf", action="store_true",
                   help="include confidences in --save-txt labels")
    p.add_argument("--save-hybrid", action="store_true",
                   help="seed NMS with GT labels (autolabelling, "
                        "reference test.py:136)")
    p.add_argument("--single-cls", action="store_true",
                   help="treat as single-class dataset")
    p.add_argument("--rect", action="store_true",
                   help="rectangular eval batching (datasets.py:724-747, "
                        "pad 0.5) — one compile per distinct batch shape")
    p.add_argument("--augment", action="store_true",
                   help="test-time augmentation (reference test.py:360)")
    p.add_argument("--anno-json", default="",
                   help="COCO annotations json for an optional COCOeval "
                        "pass on --save-json (reference test.py:314-330)")
    p.add_argument("--int8", action="store_true",
                   help="score the int8 serving kernels (quantized "
                        "projection GEMMs) — measures the mAP cost of "
                        "the quantized path; TPU only")
    p.add_argument("--platform", default="", help="force jax platform (e.g. cpu)")
    a = p.parse_args(argv)
    if a.platform:
        jax.config.update("jax_platforms", a.platform)
    from sodt_tpu.utils.general import enable_compile_cache
    enable_compile_cache()

    if a.int8:
        # trace-time gate: everything built under this context traces the
        # quantized megakernel GEMMs (and compiles on first call inside
        # run_map, also under the context)
        import contextlib
        from sodt_tpu.pallas import int8_serving
        ctx = int8_serving()
    else:
        import contextlib
        ctx = contextlib.nullcontext()

    # the int8 trace-time gate wraps EVERY task (study/speed included)
    with ctx:
        if a.task in ("val", "test", "train"):
            m = run_map(a, a.img_size)
            print(json.dumps({k: v for k, v in m.items()
                              if isinstance(v, (int, float))}))
        elif a.task == "speed":
            model, variables, ds, nc, names = build(a, a.img_size)
            step = make_eval_step(model, conf_thres=0.25, iou_thres=0.45)
            x = jnp.zeros((a.batch_size, a.img_size, a.img_size, 3))
            dets, valid, _ = step(variables, x, x)
            jax.block_until_ready(dets)
            t0 = time.perf_counter()
            n = 20
            for _ in range(n):
                dets, valid, _ = step(variables, x, x)
            jax.block_until_ready(dets)
            dt = (time.perf_counter() - t0) / (n * a.batch_size) * 1000
            print(json.dumps({"ms_per_image": dt, "img_size": a.img_size,
                              "batch_size": a.batch_size}))
        elif a.task == "study":
            rows = []
            sizes = ([int(s) for s in a.study_sizes.split(",")]
                     if a.study_sizes else range(256, 1537, 128))
            for s in sizes:
                try:
                    m = run_map(a, s)
                    rows.append({"img_size": s, "map50": m["map50"],
                                 "map": m["map"], "speed_ms": m["speed_ms"]})
                    print(rows[-1])
                except Exception as e:  # keep sweeping like the reference
                    print({"img_size": s, "error": str(e)})
            print(json.dumps(rows))
            if a.plots and rows:
                from pathlib import Path
                from sodt_tpu.utils.plots import plot_study
                Path(a.save_dir).mkdir(parents=True, exist_ok=True)
                plot_study(rows, Path(a.save_dir) / "study.png")


if __name__ == "__main__":
    main()
