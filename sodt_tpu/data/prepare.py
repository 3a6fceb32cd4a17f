"""VEDAI dataset preparation (reference data_transform.py:9-63).

Converts raw VEDAI annotation txts to YOLO label format with the
reference's class remap {1:0, 11:1, 2:3, 5:2, 4:5, 10:4, 23:6, 9:7} and
corner-coordinates -> normalized xywh conversion, plus fold list rewriting.
Pure stdlib/numpy (the reference uses pandas).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

# VEDAI class id -> contiguous training id (data_transform.py:13-21)
CLASS_REMAP = {1: 0, 11: 1, 2: 3, 5: 2, 4: 5, 10: 4, 23: 6, 9: 7}


def update_annotation_row(row: list[float], img_w: float = 512.0,
                          img_h: float = 512.0):
    """One raw VEDAI annotation row -> (cls, cx, cy, w, h) normalized.

    Raw format (annotation1024/512 txt): the 4 corner x coords then 4 corner
    y coords follow the class column (data_transform.py:9-29).
    """
    cls_raw = int(row[0])
    if cls_raw not in CLASS_REMAP:
        return None
    xs = np.asarray(row[1:5], np.float32)
    ys = np.asarray(row[5:9], np.float32)
    x1, x2 = xs.min(), xs.max()
    y1, y2 = ys.min(), ys.max()
    cx = (x1 + x2) / 2 / img_w
    cy = (y1 + y2) / 2 / img_h
    w = (x2 - x1) / img_w
    h = (y2 - y1) / img_h
    return CLASS_REMAP[cls_raw], cx, cy, w, h


def makelabels(annotation_file: str, out_dir: str, img_w: float = 512.0,
               img_h: float = 512.0):
    """Annotation dump -> per-image YOLO label txts (data_transform.py:31-37).

    `annotation_file` rows: image_id cls x1 x2 x3 x4 y1 y2 y3 y4 ...
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    per_image: dict[str, list[str]] = {}
    with open(annotation_file) as f:
        for line in f:
            parts = line.split()
            if len(parts) < 10:
                continue
            img_id = parts[0]
            row = update_annotation_row([float(x) for x in parts[1:10]],
                                        img_w, img_h)
            if row is None:
                continue
            cls, cx, cy, w, h = row
            per_image.setdefault(img_id, []).append(
                f"{cls} {cx:.6f} {cy:.6f} {w:.6f} {h:.6f}")
    for img_id, rows in per_image.items():
        (out / f"{img_id}.txt").write_text("\n".join(rows) + "\n")
    return len(per_image)


def changepath(fold_file: str, out_file: str, image_root: str,
               suffix: str = "_co.png"):
    """Fold id list -> absolute image path list (data_transform.py:39-63)."""
    with open(fold_file) as f:
        ids = [ln.strip() for ln in f if ln.strip()]
    lines = [str(Path(image_root) / f"{i}{suffix}") for i in ids]
    Path(out_file).write_text("\n".join(lines) + "\n")
    return len(lines)


def main(argv=None):
    """CLI: python -m sodt_tpu.data.prepare annotations.txt out_labels/
    [--fold fold01.txt --fold-out fold01_write.txt --image-root imgs/]"""
    import argparse
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("annotations")
    ap.add_argument("out_dir")
    ap.add_argument("--img-size", type=float, default=512.0)
    ap.add_argument("--fold", default="")
    ap.add_argument("--fold-out", default="")
    ap.add_argument("--image-root", default="")
    a = ap.parse_args(argv)
    n = makelabels(a.annotations, a.out_dir, a.img_size, a.img_size)
    print(f"wrote labels for {n} images to {a.out_dir}")
    if a.fold and a.fold_out:
        m = changepath(a.fold, a.fold_out, a.image_root)
        print(f"wrote {m} image paths to {a.fold_out}")


if __name__ == "__main__":
    main()
