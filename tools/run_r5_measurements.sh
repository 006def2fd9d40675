#!/bin/bash
# One-shot runner for the on-chip measurements pending in round 5
# (VERDICT r4 items 1, 5, 6, 7). Probes the chip first; each step is
# bounded and logged so a short tunnel-recovery window still captures as
# much as possible, in priority order.
# Usage: bash tools/run_r5_measurements.sh [outdir]
set -u -o pipefail
OUT=${1:-/tmp/wf_measurements_r5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe() {
  # backend init through the tunnel has been observed at 40-90s when the
  # pool is busy; give the probe real headroom before declaring it down
  timeout 240 python -c "
import jax, numpy as np
x = jax.numpy.ones((128,128)) @ jax.numpy.ones((128,128))
print('tpu ok', float(np.asarray(x)[0,0]))" 2>/dev/null
}

if ! probe; then
  echo "tunnel still down; aborting" | tee "$OUT/status.txt"
  exit 1
fi
echo "tunnel up $(date)" | tee "$OUT/status.txt"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$t" "$@" 2>&1 | tee "$OUT/$name.log"
  echo "$name exit=${PIPESTATUS[0]} $(date +%H:%M:%S)" >> "$OUT/status.txt"
}

# 1. headline bench incl. the NEW flamingo beam-15 rows (VERDICT #1)
run bench 5400 python bench.py
# 2. pooled-CB residual ablation (VERDICT #5)
run cb_residual 2400 python tools/cb_residual.py small 32 8
# 3. word-timestamp decomposition (VERDICT #7)
run timing_probe 2400 python tools/timing_probe.py small 20 80
# 4. same-session train-row A/B (VERDICT #6)
run train_ab 3600 python tools/train_row_ab.py small 12
echo "done $(date)" >> "$OUT/status.txt"
