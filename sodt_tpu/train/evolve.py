"""Hyperparameter evolution (reference Train.py:703-781).

Genetic search over the 28 training hyps: weighted parent selection from the
top results so far, clipped gaussian mutation with per-hyp scale/bounds
(`META`, matching the reference's meta table), re-train per generation,
select by fitness = 0.9*mAP50 + 0.1*mAP. Results append to evolve.txt like
print_mutation (general.py:582-610).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np
import yaml

# (mutation scale, lower, upper) per hyp — reference Train.py:706-733
META = {
    "lr0": (1, 1e-5, 1e-1),
    "lrf": (1, 0.01, 1.0),
    "momentum": (0.3, 0.6, 0.98),
    "weight_decay": (1, 0.0, 0.001),
    "warmup_epochs": (1, 0.0, 5.0),
    "warmup_momentum": (1, 0.0, 0.95),
    "warmup_bias_lr": (1, 0.0, 0.2),
    "box": (1, 0.02, 0.2),
    "cls": (1, 0.2, 4.0),
    "cls_pw": (1, 0.5, 2.0),
    "obj": (1, 0.2, 4.0),
    "obj_pw": (1, 0.5, 2.0),
    "iou_t": (0, 0.1, 0.7),
    "anchor_t": (1, 2.0, 8.0),
    "fl_gamma": (0, 0.0, 2.0),
    "hsv_h": (1, 0.0, 0.1),
    "hsv_s": (1, 0.0, 0.9),
    "hsv_v": (1, 0.0, 0.9),
    "degrees": (1, 0.0, 45.0),
    "translate": (1, 0.0, 0.9),
    "scale": (1, 0.0, 0.9),
    "shear": (1, 0.0, 10.0),
    "perspective": (0, 0.0, 0.001),
    "flipud": (1, 0.0, 1.0),
    "fliplr": (0, 0.0, 1.0),
    "mosaic": (1, 0.0, 1.0),
    "mixup": (1, 0.0, 1.0),
}


def mutate(hyp: dict, evolve_file: Path, rng: np.random.Generator,
           mp: float = 0.8, sigma: float = 0.2) -> dict:
    """One generation's mutation (Train.py:741-762)."""
    hyp = dict(hyp)
    if evolve_file.exists():
        rows = np.loadtxt(evolve_file, ndmin=2)
        n = min(5, len(rows))
        rows = rows[np.argsort(-rows[:, 0])][:n]  # top n by fitness
        w = rows[:, 0] - rows[:, 0].min() + 1e-6
        # weighted combination parent selection
        parent = (rows[rng.choice(n, p=w / w.sum())]
                  if rng.random() < 0.5 else (rows * w[:, None]).sum(0) / w.sum())
        keys = list(META.keys())
        for i, k in enumerate(keys):
            if k in hyp:
                hyp[k] = float(parent[i + 1])

    keys = [k for k in META if k in hyp]
    g = np.array([META[k][0] for k in keys], float)
    v = np.ones(len(keys))
    while (v == 1).all():
        # per-hyp gain scales the perturbation magnitude (Train.py:752-756)
        v = (g * (rng.random(len(keys)) < mp) * rng.random()
             * rng.standard_normal(len(keys)) * sigma + 1).clip(0.3, 3.0)
    for k, gi, vi in zip(keys, g, v):
        if gi:
            lo, hi = META[k][1], META[k][2]
            hyp[k] = float(np.clip(hyp[k] * vi, lo, hi))
    return hyp


def log_generation(evolve_file: Path, fitness: float, hyp: dict):
    keys = list(META.keys())
    row = [fitness] + [float(hyp.get(k, 0.0)) for k in keys]
    with open(evolve_file, "a") as f:
        f.write(" ".join(f"{x:.6g}" for x in row) + "\n")


def evolve(base_config, generations: int = 300, seed: int = 0):
    """Run the full evolution loop. `base_config` is a TrainConfig; each
    generation trains with mutated hyps and logs fitness."""
    from .trainer import train, TrainConfig

    rng = np.random.default_rng(seed)
    save_dir = Path(base_config.save_dir)
    save_dir.mkdir(parents=True, exist_ok=True)
    evolve_file = save_dir / "evolve.txt"
    with open(base_config.hyp) as f:
        base_hyp = yaml.safe_load(f)

    best_fit, best_hyp = -1.0, dict(base_hyp)
    for gen in range(generations):
        hyp = mutate(base_hyp, evolve_file, rng)
        hyp_path = save_dir / f"hyp_gen{gen}.yaml"
        hyp_path.write_text(yaml.dump(hyp))
        tc = dataclasses.replace(
            base_config, hyp=str(hyp_path),
            save_dir=str(save_dir / f"gen{gen}"))
        metrics = train(tc)
        fit = float(metrics.get("best_fitness", 0.0))
        log_generation(evolve_file, fit, hyp)
        if fit > best_fit:
            best_fit, best_hyp = fit, hyp
            (save_dir / "hyp_evolved.yaml").write_text(yaml.dump(hyp))
        print(f"evolve gen {gen}: fitness {fit:.4f} (best {best_fit:.4f})")
    try:
        from ..utils.plots import plot_evolution
        plot_evolution(evolve_file, save_dir / "evolve.png")
    except Exception:
        pass
    return best_hyp, best_fit
