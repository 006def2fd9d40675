#!/bin/bash
# One-shot runner for every on-chip measurement pending in r4 (kept in
# sync with the round's punch list). Probes the chip first; each step is
# bounded and logged so a short tunnel-recovery window still captures as
# much as possible, in priority order.
# Usage: bash tools/run_pending_measurements.sh [outdir]
set -u -o pipefail
OUT=${1:-/tmp/wf_measurements_r4}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe() {
  timeout 90 python -c "
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
  echo "$name exit=${PIPESTATUS[0]}" >> "$OUT/status.txt"
}

# 1. continuous batching incl. the POOLED device-side refill leg
run cb_ab 2400 python tools/cb_ab.py small 32 8
# 2. trained-pair speculative decoding (measured acceptance + speedup)
run spec_train 3600 python tools/spec_train_ab.py small tiny 12 900
# 3. int8kv beam rows at the r4b fori defaults (refresh stale docs rows)
run int8_small 2400 python tools/int8_ab.py small 8 15 int8,int8kv
run int8_large 2400 python tools/int8_ab.py large-v2 3 15 int8,int8kv
# 4. headline bench (also warms the driver's compile cache)
run bench 5400 python bench.py
# 5. fresh beam decomposition at the r4b defaults (ledger)
run decode_probe 2400 python tools/decode_probe.py small 8 6 15
echo "done $(date)" >> "$OUT/status.txt"
