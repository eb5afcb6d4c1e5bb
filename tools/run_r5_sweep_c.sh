#!/bin/bash
# Round-5 sweep C: the double-buffered Pallas pooler (inference pool part,
# full inference graph, train step via the new pallas+skip DEFAULTS) and
# the serial-upload trainloop. Usage: bash tools/run_r5_sweep_c.sh [logfile]
set -u
LOG="${1:-/tmp/r5_sweep_c.log}"
cd "$(dirname "$0")/.."

probe() {
  for i in $(seq 1 40); do
    timeout 240 python -c "
import jax, jax.numpy as jnp
print('alive', float((jnp.ones((8,8))@jnp.ones((8,8)))[0,0]))" \
      >> "$LOG" 2>&1 && return 0
    echo "# probe attempt $i failed; sleeping 60s" >> "$LOG"
    sleep 60
  done
  return 1
}

run() {
  local name="$1"; shift
  echo "=== $name $(date +%H:%M:%S) ===" | tee -a "$LOG"
  timeout 1800 "$@" >> "$LOG" 2>&1
  echo "=== rc=$? $(date +%H:%M:%S) ===" >> "$LOG"
  probe || { echo "# TPU never recovered after $name" >> "$LOG"; exit 1; }
}

run pooldb     python tools/bench_infer_parts.py pool
run inferdb    python tools/bench_infer_parts.py full
run traindb    env BENCH_SKIP_DEPTH=1 BENCH_SKIP_INFER=1 python bench.py --stage train
run trainloop3 python bench.py --stage trainloop
run inferbench python bench.py --stage inference
echo "R5 SWEEP C DONE $(date +%H:%M:%S)" | tee -a "$LOG"
