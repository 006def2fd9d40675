#!/bin/bash
# One-shot runner for every measurement that was blocked on the TPU
# tunnel outage (r3). Probes the chip first; each step is bounded and
# logged so a short recovery window still captures everything.
# Usage: bash tools/run_pending_measurements.sh [outdir]
set -u -o pipefail
OUT=${1:-/tmp/wf_measurements}
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

# 1. driver artifact sanity: the bench with the new int8 legs
run bench 3600 python bench.py
# 2. flash64 forward variants (FWD_SUM decision)
run flash64_fwd 1800 python tools/flash64_fwd_probe.py
# 3. fused decode-MLP kernel A/B (ENABLED decision)
run decode_mlp_ab 2400 python tools/decode_mlp_ab.py small 12
# 4. speculative decoding bounds + cost model
run spec_ab 2400 python tools/spec_ab.py small tiny 8
# 5. continuous vs padded batching under variable-length traffic
run cb_ab 2400 python tools/cb_ab.py small 32 8
# 5. train-step A/B with the FWD_SUM winner is manual: flip
#    ops/flash64.py FWD_SUM and run tools/mfu_probe.py twice.
echo "done $(date)" >> "$OUT/status.txt"
