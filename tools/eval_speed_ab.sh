#!/usr/bin/env bash
# Same-host CPU eval-speed A/B (VERDICT r4 "weak" 4: put a MEASURED
# opponent next to bench.py's estimated vs_baseline denominator).
#
# Runs the REFERENCE's evaluator (basics/test.py test(), torch f32 CPU,
# driven train-style by tools/ref_eval.py — reference call surface
# Train.py:237-242) and OUR val.py forced onto the SAME single host CPU
# core, with the same weights (the TPU-trained flagship checkpoint
# exported to a reference .pt), the same 16 512-px val images and the
# same protocol (conf 0.001, IoU 0.6, f32). Prints both JSON results;
# the speed_ms fields are per-image inference+NMS ms (reference
# test.py:301 t0+t1; ours evaluate.py speed_ms).
#
# Ours runs TWICE: val.py enables the persistent compile cache, so run 2
# pays only a cached-executable load on the first batch instead of a
# full XLA compile — the steady-state number. The reference (eager
# torch) has no compile cost by construction.
#
# Usage: tools/eval_speed_ab.sh [workdir]   (default /tmp/evalspeed)
# Needs runs/ab_parity/data_{ref,ours}.yaml (tools/ab_train_parity.py
# --phase export) and the flagship checkpoint.
set -euo pipefail
cd "$(dirname "$0")/.."
WORK=${1:-/tmp/evalspeed}
CKPT=${CKPT:-runs/flagship_r5_150ep/best_stripped}
mkdir -p "$WORK"

echo "== export our checkpoint to a reference .pt =="
python tools/export_torch.py --ckpt "$CKPT" --out "$WORK/ours_as_ref.pt"

echo "== reference evaluator (torch f32, 1 CPU core) =="
(cd "$WORK" && \
 PYTHONPATH=/root/reference:/root/repo/tools/ref_shims \
 TORCH_FORCE_NO_WEIGHTS_ONLY_LOAD=1 MPLBACKEND=Agg \
 python /root/repo/tools/ref_eval.py \
     --weights "$WORK/ours_as_ref.pt" \
     --data /root/repo/runs/ab_parity/data_ref.yaml \
     --img 512 --batch 4 | tee ref_eval.json)

echo "== ours (JAX f32, same CPU core) — run 1 (cold compile) =="
python val.py --weights "$CKPT" --data runs/ab_parity/data_ours.yaml \
    --task val --img-size 512 --batch-size 4 --no-bf16 --platform cpu \
    | tee "$WORK/ours_eval_cold.json"

echo "== ours — run 2 (warm persistent compile cache) =="
python val.py --weights "$CKPT" --data runs/ab_parity/data_ours.yaml \
    --task val --img-size 512 --batch-size 4 --no-bf16 --platform cpu \
    | tee "$WORK/ours_eval_warm.json"

echo "== summary =="
python - "$WORK" <<'EOF'
import json, sys
from pathlib import Path
w = Path(sys.argv[1])
ref = json.loads((w / "ref_eval.json").read_text().splitlines()[-1])
ours = json.loads((w / "ours_eval_warm.json").read_text().splitlines()[-1])
print(json.dumps({
    "ref_speed_ms_per_img": ref.get("speed_ms"),
    "ours_speed_ms_per_img": ours.get("speed_ms"),
    "ratio_ref_over_ours": (ref.get("speed_ms") or 0)
                           / max(ours.get("speed_ms") or 1e-9, 1e-9),
    "ref_map50": ref.get("map50"), "ours_map50": ours.get("map50"),
}))
EOF
