#!/bin/bash
# Serialized round-5 P2 decomposition sweep on the real TPU: one variant
# per process (crash isolation), a liveness probe between variants so a
# worker crash costs one recovery wait, crash-risk variants last.
# Usage: bash tools/run_p2_sweep.sh [logfile]
set -u
LOG="${1:-/tmp/p2_sweep.log}"
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
  timeout 1200 "$@" >> "$LOG" 2>&1
  echo "=== rc=$? ===" >> "$LOG"
  probe || { echo "# TPU never recovered after $name" >> "$LOG"; exit 1; }
}

run p2base    python tools/bench_p2_profile.py p2
run fwdonly   python tools/bench_p2_profile.py fwdonly
run ransac    python tools/bench_p2_profile.py ransac
run ransac256 python tools/bench_p2_profile.py ransac256
run pool      python tools/bench_p2_profile.py pool
run poolbwd   python tools/bench_p2_profile.py poolbwd
run noransac  python tools/bench_p2_profile.py noransac
run iouonly   python tools/bench_p2_profile.py iouonly
run noboxhead python tools/bench_p2_profile.py noboxhead
run chunk64   env WEAKCUBE_RA_CHUNK=64 python tools/bench_p2_profile.py p2
run chunk256  env WEAKCUBE_RA_CHUNK=256 python tools/bench_p2_profile.py p2
# P3 (backbone bwd) and inference decompositions — separate tools, same
# serialized pattern
run p3_all    python tools/bench_p3_parts.py all
run infer_all python tools/bench_infer_parts.py all
# crash-risk last: Pallas forward inside the (backbone-free) rest program
echo "SWEEP DONE $(date +%H:%M:%S)" | tee -a "$LOG"
