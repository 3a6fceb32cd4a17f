"""Experiment logging: TensorBoard + JSONL + optional W&B.

Covers the reference's L6 observability surface (SURVEY.md §5.5):
TensorBoard scalar tags per epoch (Train.py:509-516), results.txt append
(Train.py:503-505), and the W&B lifecycle (wandb_utils.py) — the W&B path
is import-gated and becomes a no-op when wandb isn't installed (it is not
in this image). A JSONL event stream is added as the machine-readable
ground truth for every run.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

try:
    from torch.utils.tensorboard import SummaryWriter  # torch cpu is baked in
    _HAS_TB = True
except Exception:
    try:
        from tensorboardX import SummaryWriter
        _HAS_TB = True
    except Exception:
        _HAS_TB = False

try:
    import wandb as _wandb
    _HAS_WANDB = True
except Exception:
    _HAS_WANDB = False

from .wandb_utils import WandbLifecycle

# the 13 per-epoch scalar tags the reference logs (Train.py:509-516)
TAGS = ["train/box_loss", "train/obj_loss", "train/cls_loss",
        "metrics/precision", "metrics/recall", "metrics/mAP_0.5",
        "metrics/mAP_0.5:0.95", "val/box_loss", "val/obj_loss",
        "val/cls_loss", "x/lr0", "x/lr1", "x/lr2"]


class RunLogger:
    def __init__(self, save_dir: str | Path, use_tb: bool = True,
                 use_wandb: bool = False, config: dict | None = None,
                 project: str = "sodt_tpu"):
        self.save_dir = Path(save_dir)
        self.save_dir.mkdir(parents=True, exist_ok=True)
        self.jsonl = open(self.save_dir / "events.jsonl", "a")
        self.tb = (SummaryWriter(log_dir=str(self.save_dir / "tb"))
                   if use_tb and _HAS_TB else None)
        self.wandb_run = None
        if use_wandb and _HAS_WANDB:
            self.wandb_run = _wandb.init(project=project, config=config,
                                         dir=str(self.save_dir),
                                         resume="allow")
        # artifact/media lifecycle (resume detection, model/dataset
        # versioning, bbox panels) — inert when wandb is absent
        self.lifecycle = WandbLifecycle(self.wandb_run)

    @property
    def wandb_id(self) -> str | None:
        return self.wandb_run.id if self.wandb_run is not None else None

    def log_scalars(self, scalars: dict[str, float], step: int):
        rec = {"t": time.time(), "step": step, **scalars}
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            for k, v in scalars.items():
                self.tb.add_scalar(k, v, step)
        if self.wandb_run is not None:
            self.wandb_run.log(scalars, step=step)

    def log_epoch(self, epoch: int, train_losses: dict, metrics: dict,
                  lrs: tuple = ()):
        scalars = {}
        for k, tag in (("box", "train/box_loss"), ("obj", "train/obj_loss"),
                       ("cls", "train/cls_loss")):
            if k in train_losses:
                scalars[tag] = train_losses[k]
        for k, tag in (("mp", "metrics/precision"), ("mr", "metrics/recall"),
                       ("map50", "metrics/mAP_0.5"),
                       ("map", "metrics/mAP_0.5:0.95")):
            if k in metrics:
                scalars[tag] = metrics[k]
        for k, v in (metrics.get("val_loss") or {}).items():
            scalars[f"val/{k}_loss"] = v
        for i, lr in enumerate(lrs):
            scalars[f"x/lr{i}"] = float(lr)
        self.log_scalars(scalars, epoch)

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
        if self.wandb_run is not None:
            self.wandb_run.finish()
