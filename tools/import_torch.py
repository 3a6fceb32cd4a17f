#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pt) into an orbax checkpoint
usable by `val.py --weights`, `detect.py --weights` and
`train.py --weights`.

The reference pickles whole nn.Modules (Train.py:531-532), so unpickling
such a file needs the reference package importable (`--ref-path`) — the
same requirement the reference's own attempt_load has. Plain state_dict
.pt files need nothing.

Name mapping lives in sodt_tpu/utils/torch_import.py (golden-tested
against the actual reference modules): flagship ViT checkpoints are
detected by their `image_encoder.*` keys, everything else goes through
the generic CNN importer (`model.{i}.*` -> `l{i}`).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def convert(src: str, cfg: str, out: str, *, input_mode: str = "RGB+IR",
            nc: int = 8, key: str = "auto", ref_path: str = "") -> dict:
    import torch
    if ref_path:
        sys.path.insert(0, ref_path)
    # safe path first: weights_only=True refuses arbitrary pickle code.
    # Full unpickling is only needed for whole-nn.Module checkpoints
    # (Train.py:531-532) and executes the checkpoint's (and --ref-path's
    # import-time) code — warn so the trust decision is explicit.
    try:
        obj = torch.load(src, map_location="cpu", weights_only=True)
    except Exception:
        print(f"WARNING: {src} is not a plain-tensor checkpoint; falling "
              "back to full unpickling, which executes code from the "
              ".pt file" + (" and imports the --ref-path package"
                            if ref_path else "") + ".", file=sys.stderr)
        obj = torch.load(src, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and not hasattr(
            next(iter(obj.values())), "shape"):
        # training checkpoint dict: pick ema, else model (Train.py:525-534)
        keys = [key] if key != "auto" else ["ema", "model"]
        for k in keys:
            if obj.get(k) is not None:
                obj = obj[k]
                break
        else:
            raise KeyError(f"none of {keys} in checkpoint {list(obj)}")
    sd = obj.state_dict() if hasattr(obj, "state_dict") else dict(obj)
    sd = {k[len("module."):] if k.startswith("module.") else k: v
          for k, v in sd.items()}   # strip DDP prefix

    ch_in = {"RGB": 3, "IR": 3, "RGB+IR": 4, "RGB+IR+fusion": 8,
             "RGB+IR+MF": 3}[input_mode]
    from sodt_tpu.models.compiler import parse_config
    from sodt_tpu.utils.torch_import import (import_flagship_model,
                                             import_unified_model)
    spec = parse_config(cfg, ch_in=ch_in, nc=nc)
    if any(k.startswith("image_encoder.") for k in sd):
        variables = import_flagship_model(sd, spec)
    else:
        variables = import_unified_model(sd, spec)

    import orbax.checkpoint as ocp
    ckpt = {"params": variables["params"],
            "batch_stats": variables.get("batch_stats", {}),
            "epoch": -1}
    ocp.PyTreeCheckpointer().save(Path(out).absolute(), ckpt, force=True)
    return {"out": str(out), "torch_keys": len(sd)}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("src", help=".pt checkpoint (pickled module dict or "
                               "plain state_dict)")
    p.add_argument("--cfg", default="configs/model.yaml",
                   help="matching model yaml")
    p.add_argument("--out", required=True, help="orbax checkpoint dir")
    p.add_argument("--input_mode", default="RGB+IR")
    p.add_argument("--nc", type=int, default=8)
    p.add_argument("--key", default="auto",
                   help="checkpoint dict entry: ema / model / auto")
    p.add_argument("--ref-path", default="",
                   help="path to the reference repo for pickled-module "
                        "checkpoints")
    a = p.parse_args(argv)
    from sodt_tpu.utils.downloads import attempt_download
    a.src = attempt_download(a.src)  # URL / missing-release .pt support
    print(convert(**vars(a)))


if __name__ == "__main__":
    main()
