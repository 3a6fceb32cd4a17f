#!/bin/bash
# Round-4 TPU measurement sequence (run when the axon relay is back).
#
# Protocol (memory/axon-tpu-tunnel-hazards): serialize everything, tiny
# probe first, bounded timeouts, nothing valuable running concurrently.
# Logs to /tmp/tpu_r4_measure.log; bench JSON saved to /tmp/bench_r4*.json.
set -u -o pipefail
cd /root/repo
LOG=/tmp/tpu_r4_measure.log
exec > >(tee -a "$LOG") 2>&1
echo "=== $(date -Is) round-4 TPU measurement ==="

# 0. relay liveness (Errno 111 = dead -> abort)
python - <<'EOF' || { echo "relay DEAD, aborting"; exit 1; }
import socket
s = socket.socket(); s.settimeout(5)
s.connect(("127.0.0.1", 8082))
print("relay alive")
EOF

# 1. tiny backend probe: trivial jit + checksum fetch (first compile 20-40 s)
timeout 300 python - <<'EOF' || { echo "tiny probe FAILED"; exit 1; }
import numpy as np, jax, jax.numpy as jnp
x = jnp.asarray(np.random.default_rng(0).standard_normal((256, 256), dtype=np.float32))
y = jax.jit(lambda a: a @ a)(x)
print("probe ok", float(y.sum()), jax.default_backend())
EOF

# Compile-hazard protocol: a timeout-killed step may leave its remote
# compile RUNNING and wedged (killed clients don't cancel compiles), so a
# failed step means STOP — piling more work onto a wedged queue stalls
# everything and garbles every number after the first failure.

# 2. eval-step device profile, batch 64 (the round-3 stack, first hardware look)
echo "--- profile_eval b64 ---"
timeout 1200 python tools/profile_eval.py --batch 64 --iters 2 \
    || { echo "profile_eval FAILED/TIMED OUT -- queue may be wedged, aborting"; exit 1; }

# 3. headline bench (+ int8 serving path in the same run)
echo "--- bench --int8 ---"
timeout 1800 python bench.py --int8 | tee /tmp/bench_r4.json \
    || { echo "bench FAILED -- aborting"; exit 1; }

# 4. train-step device profile, batch 16 (wall-clock gap numerator)
echo "--- profile_eval --train b16 ---"
timeout 1200 python tools/profile_eval.py --batch 16 --train --iters 2 \
    || { echo "train profile FAILED -- aborting"; exit 1; }

# 5. kernel microbench: bf16 vs int8 block megakernel
echo "--- microbench block ---"
timeout 900 python tools/microbench.py block \
    || { echo "microbench FAILED -- aborting"; exit 1; }

echo "=== $(date -Is) measurement done; next: resume 150-ep run ==="
echo "  python train.py --resume runs/flagship_synth512_150ep/last"
