#!/bin/bash
# Round-5 sweep B: the stacked candidate (Pallas windowed-DMA train fwd +
# level-skip matmul bwd) that sweep A measured separately — pallasmm 164.6
# vs p2skip 185.1 vs ~200 baseline — in the rest program, the full step,
# and the merged backbone2 step. One process per variant, probe between.
# Usage: bash tools/run_r5_sweep_b.sh [logfile]
set -u
LOG="${1:-/tmp/r5_sweep_b.log}"
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

run p2pallasskip    env WEAKCUBE_RA_LEVEL_SKIP=1 python tools/bench_p2_profile.py pallasmm
run trainpallasskip env WEAKCUBE_RA_TRAIN_FWD=pallas WEAKCUBE_RA_LEVEL_SKIP=1 BENCH_SKIP_DEPTH=1 BENCH_SKIP_INFER=1 python bench.py --stage train
# tunnel bulk-upload bandwidth: compressible (zeros) vs incompressible
# (noise) 33.6 MB payloads — decides whether the train loop can ever
# overlap its upload under the step on this host
run tunnelbw python tools/bench_tunnel_bw.py
# trainloop re-run on an IDLE host (the sweep-A numbers ran concurrently
# with a CPU pytest suite on this 1-core host and are invalid)
run trainloop2 env WEAKCUBE_RA_LEVEL_SKIP=1 python bench.py --stage trainloop
echo "R5 SWEEP B DONE $(date +%H:%M:%S)" | tee -a "$LOG"
