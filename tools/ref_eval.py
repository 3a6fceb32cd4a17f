#!/usr/bin/env python
"""Run the REFERENCE's evaluator (basics/test.py test()) on a .pt.

Drives test() exactly the way the reference trainer does
(Train.py:237-242 + 489-501): attempt_load the checkpoint, build a
rect=False pad=0.5 dataloader, pass model+dataloader in. The standalone
`python -m basics.test` path cannot evaluate the flagship ViT at all:
it forces rect=True (test.py:112), which pads square images to
ceil(512/32+0.5)*32 = 544 px and trips the hardcoded 128^2 stage-1
resolution (backbone_vit.py:1087) — a reference defect documented in
PARITY.md; training-time eval avoids it with rect=False.

Usage (needs PYTHONPATH=/root/reference:tools/ref_shims and
TORCH_FORCE_NO_WEIGHTS_ONLY_LOAD=1; run from a scratch cwd):

    python tools/ref_eval.py --weights ours_as_ref.pt \
        --data data_ref.yaml --img 512 --batch 4
"""

from __future__ import annotations

import argparse
import json
from types import SimpleNamespace


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", required=True)
    ap.add_argument("--data", required=True)
    ap.add_argument("--img", type=int, default=512)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--input_mode", default="RGB+IR")
    ap.add_argument("--task", default="val")
    ap.add_argument("--conf", type=float, default=0.001)
    ap.add_argument("--iou", type=float, default=0.6)
    a = ap.parse_args(argv)

    import torch
    import yaml
    from basics.test import test
    from basics.models.experimental import attempt_load
    from basics.utils.datasets import create_dataloader_sr

    model = attempt_load(a.weights, map_location=torch.device("cpu"))
    with open(a.data) as f:
        data = yaml.safe_load(f)
    opt = SimpleNamespace(single_cls=False)
    loader = create_dataloader_sr(
        data[a.task], a.img, a.batch, 32, opt, pad=0.5, rect=False,
        fold="labels_refeval")[0]
    from pathlib import Path
    results, maps, times = test(
        a.data, batch_size=a.batch, imgsz=a.img, input_mode=a.input_mode,
        conf_thres=a.conf, iou_thres=a.iou, model=model,
        dataloader=loader, save_dir=Path("."), plots=False, verbose=True)
    mp, mr, map50, map_, *losses = results
    print(json.dumps({"p": mp, "r": mr, "map50": map50, "map": map_,
                      "speed_ms": times[2] if len(times) > 2 else None,
                      "per_class_map50_95": list(map(float, maps))}))


if __name__ == "__main__":
    main()
