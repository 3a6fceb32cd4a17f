"""Plotting: detection mosaics, PR/F1 curves, label stats, results curves.

Covers the reference plots surface (/root/reference/basics/utils/plots.py +
metrics.py:71-75,160-175): train/test batch mosaics with boxes, PR and
metric-confidence curves, confusion-matrix heatmap, per-run results curves,
label statistics. Matplotlib-only (no seaborn/PIL-draw dependencies);
everything degrades to a no-op if matplotlib is missing.
"""

from __future__ import annotations

import json
import math
from pathlib import Path

import numpy as np

try:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import matplotlib.patches as mpatches
    _HAS_MPL = True
except Exception:
    _HAS_MPL = False


def color_for(cls: int):
    rng = np.random.default_rng(int(cls) + 7)
    return tuple(rng.uniform(0.2, 0.95, 3))


def plot_images(images: np.ndarray, targets: np.ndarray,
                tmasks: np.ndarray, path: str | Path, names=None,
                max_images: int = 16):
    """Batch mosaic with normalized-xywh boxes (reference plots.py
    plot_images). images: (B,H,W,3) in [0,1]; targets: (B,M,5)."""
    if not _HAS_MPL:
        return
    b = min(images.shape[0], max_images)
    cols = int(math.ceil(math.sqrt(b)))
    rows = int(math.ceil(b / cols))
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 4 * rows),
                             squeeze=False)
    for i in range(rows * cols):
        ax = axes[i // cols][i % cols]
        ax.axis("off")
        if i >= b:
            continue
        img = np.clip(np.asarray(images[i]), 0, 1)
        h, w = img.shape[:2]
        ax.imshow(img)
        for t, ok in zip(np.asarray(targets[i]), np.asarray(tmasks[i])):
            if not ok:
                continue
            cls, cx, cy, bw, bh = t[:5]
            x1, y1 = (cx - bw / 2) * w, (cy - bh / 2) * h
            rect = mpatches.Rectangle((x1, y1), bw * w, bh * h,
                                      fill=False, lw=1.5,
                                      edgecolor=color_for(int(cls)))
            ax.add_patch(rect)
            label = (names[int(cls)] if names and int(cls) < len(names)
                     else str(int(cls)))
            ax.text(x1, y1 - 2, label, fontsize=7,
                    color=color_for(int(cls)))
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)


def plot_pr_curve(px, py, ap, path: str | Path, names=()):
    """(reference metrics.py plot_pr_curve)"""
    if not _HAS_MPL:
        return
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    py = np.stack(py, axis=1) if len(py) else np.zeros((1000, 0))
    if 0 < len(names) < 21:
        for i in range(py.shape[1]):
            ax.plot(px, py[:, i], linewidth=1,
                    label=f"{names[i]} {ap[i, 0]:.3f}")
    else:
        ax.plot(px, py, linewidth=1, color="grey")
    if py.shape[1]:
        ax.plot(px, py.mean(1), linewidth=3, color="blue",
                label=f"all classes {ap[:, 0].mean():.3f} mAP@0.5")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(loc="lower left", fontsize=8)
    fig.savefig(path, dpi=250)
    plt.close(fig)


def plot_mc_curve(px, py, path: str | Path, names=(), xlabel="Confidence",
                  ylabel="Metric"):
    if not _HAS_MPL:
        return
    fig, ax = plt.subplots(1, 1, figsize=(9, 6), tight_layout=True)
    if 0 < len(names) < 21:
        for i in range(py.shape[0]):
            ax.plot(px, py[i], linewidth=1, label=names[i])
    else:
        ax.plot(px, py.T, linewidth=1, color="grey")
    y = py.mean(0)
    ax.plot(px, y, linewidth=3, color="blue",
            label=f"all classes {y.max():.2f} at {px[y.argmax()]:.3f}")
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_xlim(0, 1)
    ax.set_ylim(0, 1)
    ax.legend(loc="lower left", fontsize=8)
    fig.savefig(path, dpi=250)
    plt.close(fig)


def plot_confusion_matrix(matrix: np.ndarray, path: str | Path, names=()):
    """(reference metrics.py:160-175, without seaborn)"""
    if not _HAS_MPL:
        return
    nc = matrix.shape[0] - 1
    norm = matrix / (matrix.sum(0, keepdims=True) + 1e-6)
    fig, ax = plt.subplots(figsize=(10, 8), tight_layout=True)
    im = ax.imshow(norm, cmap="Blues", vmin=0, vmax=1)
    fig.colorbar(im)
    labels = (list(names) + ["background"]
              if names and len(names) == nc else None)
    if labels:
        ax.set_xticks(range(nc + 1))
        ax.set_xticklabels(labels, rotation=90, fontsize=8)
        ax.set_yticks(range(nc + 1))
        ax.set_yticklabels(labels, fontsize=8)
    if nc < 30:
        for i in range(nc + 1):
            for j in range(nc + 1):
                if norm[i, j] >= 0.005:
                    ax.text(j, i, f"{norm[i, j]:.2f}", ha="center",
                            va="center", fontsize=7)
    ax.set_xlabel("True")
    ax.set_ylabel("Predicted")
    fig.savefig(path, dpi=250)
    plt.close(fig)


def plot_labels(labels: np.ndarray, path_dir: str | Path, nc: int,
                names=()):
    """Label statistics panel (reference plots.py:272-318)."""
    if not _HAS_MPL or labels.shape[0] == 0:
        return
    c, boxes = labels[:, 0], labels[:, 1:5]
    fig, axes = plt.subplots(2, 2, figsize=(10, 10), tight_layout=True)
    axes[0, 0].hist(c, bins=np.arange(nc + 1) - 0.5, rwidth=0.8)
    axes[0, 0].set_xlabel("classes")
    axes[0, 1].scatter(boxes[:, 0], boxes[:, 1], s=3, alpha=0.4)
    axes[0, 1].set_xlabel("cx")
    axes[0, 1].set_ylabel("cy")
    axes[1, 0].scatter(boxes[:, 2], boxes[:, 3], s=3, alpha=0.4)
    axes[1, 0].set_xlabel("w")
    axes[1, 0].set_ylabel("h")
    axes[1, 1].hist2d(boxes[:, 2], boxes[:, 3], bins=50)
    axes[1, 1].set_xlabel("wh density")
    fig.savefig(Path(path_dir) / "labels.png", dpi=200)
    plt.close(fig)


def plot_results(results_jsonl: str | Path, path: str | Path):
    """Training curves from the events.jsonl stream (reference results.png,
    plots.py:400)."""
    if not _HAS_MPL:
        return
    rows = []
    with open(results_jsonl) as f:
        for line in f:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                continue
    if not rows:
        return
    keys = [k for k in rows[-1] if k not in ("t", "step")]
    n = len(keys)
    cols = 4
    r = int(math.ceil(n / cols))
    fig, axes = plt.subplots(r, cols, figsize=(4 * cols, 3 * r),
                             squeeze=False)
    for i, k in enumerate(keys):
        ax = axes[i // cols][i % cols]
        xs = [row["step"] for row in rows if k in row]
        ys = [row[k] for row in rows if k in row]
        ax.plot(xs, ys, marker=".")
        ax.set_title(k, fontsize=9)
    for i in range(n, r * cols):
        axes[i // cols][i % cols].axis("off")
    fig.tight_layout()
    fig.savefig(path, dpi=150)
    plt.close(fig)


def plot_evolution(evolve_file, path, keys=None):
    """Per-hyp fitness scatter grid after --evolve (reference
    plots.py:321-343 plot_evolution): one panel per hyperparameter,
    fitness vs value, best point highlighted."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    if keys is None:
        from ..train.evolve import META
        keys = list(META.keys())
    data = np.loadtxt(str(evolve_file), ndmin=2)
    if data.size == 0:
        return
    fit = data[:, 0]
    best = int(fit.argmax())
    n = len(keys)
    cols = 5
    rows = (n + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(3 * cols, 2.5 * rows))
    for i, k in enumerate(keys):
        ax = axes.ravel()[i]
        v = data[:, i + 1]
        ax.scatter(v, fit, c=fit, cmap="viridis", alpha=0.8,
                   edgecolors="none", s=16)
        ax.scatter(v[best], fit[best], marker="+", color="r", s=80)
        ax.set_title(f"{k} = {v[best]:.3g}", fontsize=8)
        ax.tick_params(labelsize=6)
    for j in range(n, rows * cols):
        axes.ravel()[j].axis("off")
    fig.tight_layout()
    fig.savefig(str(path), dpi=150)
    plt.close(fig)


def plot_study(rows, path):
    """mAP-vs-latency curve for `val.py --task study` (reference
    plots.py:240-270 plot_study_txt): one marker per image size."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    rows = [r for r in rows if "map50" in r]
    if not rows:
        return
    ms = [r["speed_ms"] for r in rows]
    m50 = [100 * r["map50"] for r in rows]
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(ms, m50, ".-", linewidth=2, markersize=8)
    for r, x, y in zip(rows, ms, m50):
        ax.annotate(str(r["img_size"]), (x, y), fontsize=7,
                    textcoords="offset points", xytext=(4, 4))
    ax.set_xlabel("latency (ms/img)")
    ax.set_ylabel("mAP@0.5 (%)")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(str(path), dpi=150)
    plt.close(fig)


def plot_lr_schedule(lr_fns, steps: int, path, labels=("weights", "bias")):
    """LR-vs-step curves for the configured schedules (reference
    plots.py:193-207 plot_lr_scheduler, which steps a live scheduler;
    here schedules are pure functions of the optimizer step)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    xs = np.arange(steps)
    fig, ax = plt.subplots(figsize=(6, 4))
    for fn, lab in zip(lr_fns, labels):
        ax.plot(xs, [float(fn(int(x))) for x in xs], label=lab)
    ax.set_xlabel("optimizer step")
    ax.set_ylabel("LR")
    ax.legend()
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(str(path), dpi=150)
    plt.close(fig)
