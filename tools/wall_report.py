#!/usr/bin/env python3
"""Summarize the trainer's per-epoch wall-clock telemetry.

Reads a run's events.jsonl (trainer.py logs wall/sched, wall/dispatch,
wall/fetch, wall/eval, wall/ckpt, wall/epoch, wall/chunk per epoch) and
prints a breakdown table: where the wall time goes versus the device-
capable rate, i.e. the data VERDICT r3 asked for on the 15.8-vs-56 img/s
train gap. Usage:

    python tools/wall_report.py runs/flagship_synth512_150ep [--csv]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np


def load(run_dir: Path) -> list[dict]:
    path = run_dir / "events.jsonl" if run_dir.is_dir() else run_dir
    recs = []
    with open(path) as fh:
        for ln in fh:
            try:
                r = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if any(k.startswith("wall/") for k in r):
                recs.append(r)
    return recs


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run", help="run dir (or events.jsonl path)")
    ap.add_argument("--skip", type=int, default=1,
                    help="drop the first N epochs (compile noise)")
    ap.add_argument("--csv", action="store_true")
    a = ap.parse_args(argv)

    recs = load(Path(a.run))
    if len(recs) <= a.skip:
        sys.exit(f"only {len(recs)} wall records in {a.run} "
                 f"(need > --skip {a.skip})")
    recs = recs[a.skip:]
    keys = sorted({k for r in recs for k in r if k.startswith("wall/")})
    cols = {k: np.asarray([r[k] for r in recs if k in r], float)
            for k in keys}
    total = cols.get("wall/epoch")
    print(f"{len(recs)} epochs after skipping {a.skip} "
          f"(run: {a.run})")
    if a.csv:
        print("phase,mean_s,p50_s,max_s,share_pct")
    else:
        print(f"{'phase':<14}{'mean s':>9}{'p50 s':>9}{'max s':>9}"
              f"{'share %':>9}")
    for k in keys:
        v = cols[k]
        # Share of total run wall time: sum-over-sum, NOT mean-over-mean.
        # In chunked runs sched/dispatch/fetch are logged only on a chunk's
        # first epoch carrying the whole chunk's cost, so their per-record
        # mean is inflated by the chunk factor and mean/mean shares could
        # exceed 100%.
        share = (100 * v.sum() / total.sum()
                 if total is not None and k != "wall/epoch"
                 and k != "wall/chunk" else float("nan"))
        row = (k.removeprefix("wall/"), v.mean(), np.median(v), v.max(),
               share)
        if a.csv:
            print(",".join(f"{x:.3f}" if isinstance(x, float) else str(x)
                           for x in row))
        else:
            print(f"{row[0]:<14}{row[1]:>9.3f}{row[2]:>9.3f}"
                  f"{row[3]:>9.3f}{row[4]:>9.1f}")


if __name__ == "__main__":
    main()
