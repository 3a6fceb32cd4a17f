#!/usr/bin/env python
"""Training-parity A/B: the actual PyTorch reference vs sodt_tpu.

The strongest accuracy evidence obtainable without real VEDAI data
(VERDICT r4 item 3): export the synthetic dataset into the reference's
on-disk layout (`/root/reference/basics/utils/datasets.py:368-376` path
rules), train BOTH frameworks for the same epochs with matched hyps and
augmentation disabled, then compare per-epoch loss-component
trajectories and final mAP on the same val images. Additionally
cross-evaluates: the reference's trained best.pt is imported
(tools/import_torch.py) and scored by OUR val protocol — eval parity on
real trained weights, not just random init.

Usage:
    python tools/ab_train_parity.py --workdir runs/ab_parity \
        --n 64 --img 256 --epochs 12 --batch 8 [--phase all]

Phases: export | ref | ours | compare | all. Each phase is resumable
(artifacts live under --workdir). The reference run needs only baked-in
deps plus tools/ref_shims (pure-torch torchvision.ops.nms, CSV-emitting
xlsxwriter).

Reference call surface driven here: Train.py:599-642 CLI, results.txt
row format Train.py:459-505 (box/obj/cls/total losses then
P/R/mAP50/mAP and val box/obj/cls).
"""

from __future__ import annotations

import argparse
import json
import os
import re
import subprocess
import sys
from pathlib import Path

import numpy as np
import yaml

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

# augmentation keys zeroed for the A/B: with aug off both frameworks see
# the identical letterboxed pixels every epoch, so loss trajectories are
# comparable (mosaic/perspective/HSV pipelines differ cv2-vs-device by
# design and are goldened separately in tests/test_augment_golden.py)
AUG_OFF = {"hsv_h": 0.0, "hsv_s": 0.0, "hsv_v": 0.0, "degrees": 0.0,
           "translate": 0.0, "scale": 0.0, "shear": 0.0,
           "perspective": 0.0, "flipud": 0.0, "fliplr": 0.0,
           "mosaic": 0.0, "mixup": 0.0}


def export_dataset(workdir: Path, n: int, img: int, val_n: int) -> dict:
    """Write the synthetic set in the reference's VEDAI layout.

    Layout (datasets.py:368-376,684-685): fold txt lists path stems; the
    loader appends `_co.png`, derives IR by `co->ir` and labels by
    `images->labels` + strip `_co`.
    """
    from PIL import Image
    from sodt_tpu.data.synthetic import SyntheticVedai

    root = workdir / "data"
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "labels").mkdir(parents=True, exist_ok=True)
    ds = SyntheticVedai(n=n, img_size=img)
    stems = []
    for i in range(n):
        rgb, ir, labels = ds[i]
        stem = root / "images" / f"img{i:05d}"
        Image.fromarray(rgb).save(str(stem) + "_co.png")
        Image.fromarray(ir[..., 0]).save(str(stem) + "_ir.png")
        with open(root / "labels" / f"img{i:05d}.txt", "w") as f:
            for c, cx, cy, w, h in labels:
                f.write(f"{int(c)} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}\n")
        stems.append(str(stem))
    train_stems, val_stems = stems[:-val_n], stems[-val_n:]
    # reference-style lists (stems) and ours (full _co.png paths)
    for name, rows in [("fold_train.txt", train_stems),
                       ("fold_val.txt", val_stems)]:
        (root / name).write_text("\n".join(rows) + "\n")
        (root / name.replace(".txt", "_co.txt")).write_text(
            "\n".join(r + "_co.png" for r in rows) + "\n")

    names = ["car", "pickup", "camping", "truck", "other", "tractor",
             "boat", "van"]
    for tag, suffix in [("ref", ""), ("ours", "_co")]:
        with open(workdir / f"data_{tag}.yaml", "w") as f:
            yaml.safe_dump(
                {"train": str(root / f"fold_train{suffix}.txt"),
                 "val": str(root / f"fold_val{suffix}.txt"),
                 "test": str(root / f"fold_val{suffix}.txt"),
                 "nc": 8, "names": names}, f)

    # matched hyps: reference hyp.scratch.yaml values with aug zeroed
    hyp = yaml.safe_load((REPO / "configs/hyp.scratch.yaml").read_text())
    hyp.update(AUG_OFF)
    with open(workdir / "hyp_ab.yaml", "w") as f:
        yaml.safe_dump(hyp, f)

    # flagship config at the A/B image size (ImageEncoderViT args[0])
    cfg = yaml.safe_load((REPO / "configs/model.yaml").read_text())
    for row in cfg["backbone"]:
        if row[2] == "ImageEncoderViT":
            row[1] = 1            # ensure plain int, not yaml anchors
            row[3][0] = img
    cfg["head"] = [[f, num, m, a] for f, num, m, a in cfg["head"]]
    with open(workdir / "model_ab.yaml", "w") as f:
        yaml.safe_dump(cfg, f, default_flow_style=None)
    return {"root": str(root), "train_n": len(train_stems),
            "val_n": len(val_stems)}


def run_reference(workdir: Path, img: int, epochs: int, batch: int,
                  log: Path) -> Path:
    """Train the actual reference (torch CPU) on the exported data."""
    rundir = workdir / "refrun"
    rundir.mkdir(parents=True, exist_ok=True)
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{REF}:{REPO / 'tools' / 'ref_shims'}"
    env.setdefault("MPLBACKEND", "Agg")
    env["OMP_NUM_THREADS"] = str(max(1, os.cpu_count() or 1))
    # the reference round-trips its label cache and checkpoints through
    # torch.save/torch.load with pickled numpy objects (datasets.py:693,
    # Train.py:531); torch>=2.6 defaults weights_only=True and refuses its
    # own files. All content here is generated by this harness — trusted.
    env["TORCH_FORCE_NO_WEIGHTS_ONLY_LOAD"] = "1"
    cmd = [sys.executable, str(REF / "Train.py"),
           "--cfg", str(workdir / "model_ab.yaml"),
           "--data", str(workdir / "data_ref.yaml"),
           "--hyp", str(workdir / "hyp_ab.yaml"),
           "--device", "cpu", "--epochs", str(epochs),
           "--batch-size", str(batch),
           "--train_img_size", str(img), "--test_img_size", str(img),
           "--input_mode", "RGB+IR", "--noautoanchor",
           "--workers", "0",
           "--project", str(workdir / "ref_runs"),
           "--name", "exp", "--exist-ok"]
    with open(log, "w") as lf:
        rc = subprocess.run(cmd, cwd=rundir, env=env, stdout=lf,
                            stderr=subprocess.STDOUT).returncode
    save_dir = workdir / "ref_runs" / "exp"
    # the reference calls dist.destroy_process_group() unconditionally at
    # exit (Train.py:701) and crashes post-training when DDP was never
    # initialized — a complete results.txt IS success.
    done = ((save_dir / "results.txt").exists()
            and len(parse_ref_results(save_dir / "results.txt")) >= epochs)
    if not done:
        raise RuntimeError(
            f"reference Train.py failed rc={rc}; see {log} (tail: "
            + "".join(open(log).readlines()[-15:]))
    if rc != 0:
        print(f"note: reference exited rc={rc} after training completed "
              "(its unconditional destroy_process_group, Train.py:701)",
              flush=True)
    return save_dir


def run_ours(workdir: Path, img: int, epochs: int, batch: int,
             log: Path) -> Path:
    """Train sodt_tpu on the same data/hyp/config/protocol."""
    save_dir = workdir / "ours_runs" / "exp"
    cmd = [sys.executable, str(REPO / "train.py"),
           "--cfg", str(workdir / "model_ab.yaml"),
           "--data", str(workdir / "data_ours.yaml"),
           "--hyp", str(workdir / "hyp_ab.yaml"),
           "--epochs", str(epochs), "--batch-size", str(batch),
           "--img-size", str(img), "--input_mode", "RGB+IR",
           "--noautoanchor", "--save-dir", str(save_dir),
           "--eval-every", "1", "--no-bf16", "--seed", "0"]
    with open(log, "w") as lf:
        rc = subprocess.run(cmd, cwd=REPO, stdout=lf,
                            stderr=subprocess.STDOUT).returncode
    if rc != 0 or not (save_dir / "results.txt").exists():
        raise RuntimeError(
            f"our train.py failed rc={rc}; see {log} (tail: "
            + "".join(open(log).readlines()[-15:]))
    return save_dir


def parse_ref_results(path: Path) -> list[dict]:
    """results.txt rows (Train.py:459-505): epoch mem box obj cls total
    ntargets imgsz P R mAP50 mAP vbox vobj vcls."""
    rows = []
    for line in path.read_text().splitlines():
        t = line.split()
        if not t or "/" not in t[0]:
            continue
        v = [float(x) for x in t[2:]]
        rows.append({"epoch": int(t[0].split("/")[0]),
                     "box": v[0], "obj": v[1], "cls": v[2],
                     "p": v[6], "r": v[7], "map50": v[8], "map": v[9]})
    return rows


def parse_our_results(path: Path) -> list[dict]:
    """our results.txt: `epoch k/N box=.. cls=.. loss=.. obj=..` plus
    optional mAP fields on eval epochs."""
    rows = []
    for line in path.read_text().splitlines():
        kv = dict(re.findall(r"(\w+)=([-\d.einf]+)", line))
        m = re.match(r"epoch (\d+)/", line)
        if not m or "box" not in kv:
            continue
        rows.append({"epoch": int(m.group(1)),
                     "box": float(kv["box"]), "obj": float(kv["obj"]),
                     "cls": float(kv["cls"]),
                     "map50": float(kv.get("mAP50", "nan")),
                     "map": float(kv.get("mAP", "nan"))})
    return rows


def cross_eval(workdir: Path, img: int) -> dict:
    """Import the reference's trained best.pt and score it with OUR val
    protocol on the same val list — eval parity at real weights.
    (The ours->reference direction — OUR weights through the REFERENCE
    evaluator — lives in tools/export_torch.py + tools/ref_eval.py.)"""
    # unpickling the reference's whole-module .pt imports reference code,
    # which needs the torchvision/timm/numba stand-ins
    sys.path.insert(0, str(REPO / "tools" / "ref_shims"))
    os.environ.setdefault("TORCH_FORCE_NO_WEIGHTS_ONLY_LOAD", "1")
    from parity_check import run as parity_run
    best = workdir / "ref_runs" / "exp" / "weights" / "best.pt"
    if not best.exists():
        best = workdir / "ref_runs" / "exp" / "weights" / "last.pt"
    return parity_run(
        str(best), str(workdir / "model_ab.yaml"),
        str(workdir / "data_ours.yaml"), out=str(workdir / "imported"),
        input_mode="RGB+IR", img_size=img, batch_size=8, task="val",
        ref_path=str(REF), bf16=False,
        save_dir=str(workdir / "cross_eval"))


def compare(workdir: Path, img: int) -> dict:
    ref = parse_ref_results(workdir / "ref_runs" / "exp" / "results.txt")
    ours = parse_our_results(workdir / "ours_runs" / "exp" /
                             "results.txt")
    ne = min(len(ref), len(ours))

    def tail_mean(rows, k):
        n = max(1, min(3, len(rows)))
        return float(np.mean([r[k] for r in rows[-n:]]))

    rep = {"epochs_compared": ne,
           "ref_final": {k: tail_mean(ref, k)
                         for k in ("box", "obj", "cls", "map50", "map")},
           "ours_final": {k: tail_mean(ours, k)
                          for k in ("box", "obj", "cls", "map50", "map")},
           "trajectory": [
               {"epoch": e,
                "ref": {k: ref[e][k] for k in ("box", "obj", "cls")},
                "ours": {k: ours[e][k] for k in ("box", "obj", "cls")}}
               for e in range(ne)]}
    try:
        rep["cross_eval_ref_weights_our_val"] = cross_eval(workdir, img)
        ref_last_map = next((r["map50"] for r in reversed(ref)
                             if np.isfinite(r["map50"])), float("nan"))
        rep["cross_eval_delta_map50"] = (
            rep["cross_eval_ref_weights_our_val"]["map50"] - ref_last_map)
    except Exception as e:  # cross-eval is additive evidence, not a gate
        rep["cross_eval_error"] = f"{type(e).__name__}: {e}"
    (workdir / "ab_report.json").write_text(json.dumps(rep, indent=2))
    return rep


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--workdir", default="runs/ab_parity")
    p.add_argument("--n", type=int, default=64)
    p.add_argument("--val-n", type=int, default=16)
    p.add_argument("--img", type=int, default=512)
    p.add_argument("--epochs", type=int, default=12)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--phase", default="all",
                   choices=["export", "ref", "ours", "compare", "all"])
    a = p.parse_args(argv)
    # absolute: the reference leg runs with cwd inside the workdir, so
    # relative --workdir paths would dangle in its check_file()
    wd = Path(a.workdir).resolve()
    wd.mkdir(parents=True, exist_ok=True)

    if a.phase in ("export", "all"):
        info = export_dataset(wd, a.n, a.img, a.val_n)
        print("exported:", info, flush=True)
    if a.phase in ("ref", "all"):
        d = run_reference(wd, a.img, a.epochs, a.batch,
                          wd / "ref_train.log")
        print("reference run done:", d, flush=True)
    if a.phase in ("ours", "all"):
        d = run_ours(wd, a.img, a.epochs, a.batch, wd / "our_train.log")
        print("our run done:", d, flush=True)
    if a.phase in ("compare", "all"):
        rep = compare(wd, a.img)
        print(json.dumps({k: rep[k] for k in rep
                          if k != "trajectory"}, indent=2))


if __name__ == "__main__":
    main()
