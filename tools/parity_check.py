#!/usr/bin/env python
"""One-command reference-parity check: torch .pt -> orbax -> VEDAI mAP.

Wires tools/import_torch.py and val.py's mAP protocol into a single
command for the BASELINE.md acceptance test (mAP@0.5 within 0.3 pts of
the PyTorch reference, eval protocol of /root/reference/basics/test.py:348-408):

    python tools/parity_check.py --pt /path/to/reference_best.pt \
        --data configs/data_vedai.yaml [--ref-map50 0.764]

Steps:
  1. convert the reference checkpoint (state_dict or whole-module .pt;
     the latter needs --ref-path, see import_torch.py),
  2. run the full mAP protocol (conf 0.001, IoU 0.6, multi-label,
     rect-capable) on the dataset named by --data,
  3. print one JSON line {map50, map, ref_map50, delta_pts, pass} —
     `pass` is |delta| <= 0.3 when --ref-map50 is given.

No VEDAI data in this environment -> --synthetic runs the same wiring
end-to-end against the synthetic fixture (smoke-tested in
tests/test_torch_parity_cnn.py::test_parity_check_synthetic_smoke).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))


def run(pt: str, cfg: str, data: str, *, out: str = "",
        input_mode: str = "RGB+IR", nc: int = 8, key: str = "auto",
        ref_path: str = "", img_size: int = 512, batch_size: int = 8,
        task: str = "val", rect: bool = False, synthetic: bool = False,
        synthetic_n: int = 16, bf16: bool = True,
        ref_map50: float | None = None, save_dir: str = "runs/parity",
        single_cls: bool = False) -> dict:
    from import_torch import convert
    import val as val_cli

    out = out or str(Path(save_dir) / "imported")
    Path(save_dir).mkdir(parents=True, exist_ok=True)
    convert(pt, cfg, out, input_mode=input_mode, nc=nc, key=key,
            ref_path=ref_path)

    a = SimpleNamespace(
        cfg=cfg, data=data, weights=out, task=task, batch_size=batch_size,
        img_size=img_size, conf_thres=0.001, iou_thres=0.6,
        input_mode=input_mode, synthetic=synthetic,
        synthetic_n=synthetic_n, bf16=bf16, verbose=False, plots=False,
        save_dir=save_dir, save_json=False, save_txt=False,
        save_conf=False, save_hybrid=False, single_cls=single_cls,
        rect=rect, augment=False, anno_json="")
    m = val_cli.run_map(a, img_size)

    result = {"map50": round(float(m["map50"]), 4),
              "map": round(float(m["map"]), 4),
              "weights": out}
    if ref_map50 is not None:
        # accept the reference number in either convention (0.764 or 76.4)
        ref01 = ref_map50 / 100.0 if ref_map50 > 1 else ref_map50
        delta = 100.0 * (float(m["map50"]) - ref01)
        result.update(ref_map50=ref01, delta_pts=round(delta, 2),
                      **{"pass": bool(abs(delta) <= 0.3)})
    return result


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pt", required=True,
                   help="reference PyTorch checkpoint (.pt)")
    p.add_argument("--cfg", default="configs/model.yaml")
    p.add_argument("--data", default="configs/data_vedai.yaml")
    p.add_argument("--out", default="", help="orbax output path "
                   "(default <save-dir>/imported)")
    p.add_argument("--input_mode", default="RGB+IR")
    p.add_argument("--nc", type=int, default=8)
    p.add_argument("--key", default="auto", help="checkpoint dict key "
                   "(ema/model/auto)")
    p.add_argument("--ref-path", default="", help="reference repo path "
                   "for whole-module .pt unpickling")
    p.add_argument("--img-size", type=int, default=512)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--task", default="val", choices=["val", "test"])
    p.add_argument("--rect", action="store_true")
    p.add_argument("--single-cls", action="store_true")
    p.add_argument("--synthetic", action="store_true",
                   help="smoke the wiring on the synthetic dataset")
    p.add_argument("--synthetic-n", type=int, default=16)
    p.add_argument("--no-bf16", action="store_false", dest="bf16")
    p.add_argument("--ref-map50", type=float, default=None,
                   help="reference mAP@0.5 to compare against "
                        "(0-1 or percent); enables the ±0.3 pt gate")
    p.add_argument("--save-dir", default="runs/parity")
    p.add_argument("--platform", default="")
    a = p.parse_args(argv)
    if a.platform:
        import jax
        jax.config.update("jax_platforms", a.platform)
    from sodt_tpu.utils.general import enable_compile_cache
    enable_compile_cache()
    result = run(a.pt, a.cfg, a.data, out=a.out, input_mode=a.input_mode,
                 nc=a.nc, key=a.key, ref_path=a.ref_path,
                 img_size=a.img_size, batch_size=a.batch_size,
                 task=a.task, rect=a.rect, synthetic=a.synthetic,
                 synthetic_n=a.synthetic_n, bf16=a.bf16,
                 ref_map50=a.ref_map50, save_dir=a.save_dir,
                 single_cls=a.single_cls)
    print(json.dumps(result))
    return 0 if result.get("pass", True) else 1


if __name__ == "__main__":
    raise SystemExit(main())
