#!/bin/bash
# Round-5 follow-up TPU sweep: the corrected tick-OFF p2 baseline, the
# pallas-fwd + matmul-bwd candidate (pallasmm), remaining chunk points,
# end-to-end trainloop bench, backbone2 step bench, and the depth sweep.
# Same serialized one-process-per-variant pattern as run_p2_sweep.sh.
# Usage: bash tools/run_p2_sweep2.sh [logfile]
set -u
LOG="${1:-/tmp/p2_sweep2.log}"
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
  echo "=== rc=$? ===" >> "$LOG"
  probe || { echo "# TPU never recovered after $name" >> "$LOG"; exit 1; }
}

run p2tickoff  python tools/bench_p2_profile.py p2
# pooler-only chunk sweep: chunk=512 -> nc=1, the scan body reads the
# feature pyramid ONCE per level instead of 4x (HBM re-read hypothesis)
run pool512    env WEAKCUBE_RA_CHUNK=512 python tools/bench_p2_profile.py pool
run poolbwd512 env WEAKCUBE_RA_CHUNK=512 python tools/bench_p2_profile.py poolbwd
run pool256    env WEAKCUBE_RA_CHUNK=256 python tools/bench_p2_profile.py pool
# level-sorted chunk skipping (TPU.ROI_ALIGN_LEVEL_SKIP, bit-exact)
run poolskip     env WEAKCUBE_RA_LEVEL_SKIP=1 python tools/bench_p2_profile.py pool
run poolbwdskip  env WEAKCUBE_RA_LEVEL_SKIP=1 python tools/bench_p2_profile.py poolbwd
run fwd_parts  python tools/bench_fwd_parts.py
# end-to-end loop throughput (VERDICT r4 item 2) + full step baseline
run trainstep  env BENCH_SKIP_DEPTH=1 BENCH_SKIP_INFER=1 python bench.py --stage train
run trainloop  python bench.py --stage trainloop
# backbone2 (merged bwd+update) on-chip comparison (VERDICT r4 item 3)
run bb2step    env WEAKCUBE_SPLIT_STEP=backbone2 python bench.py --stage train
# depth regression recovery (VERDICT r4 item 4): re-sweep the faithful
# decoder (batch + encoder/head split)
run depthsweep python tools/bench_depth_sweep.py --quick
# mild crash-risk (new cond-in-scan structure inside the rest program)
run p2skip     env WEAKCUBE_RA_LEVEL_SKIP=1 python tools/bench_p2_profile.py p2
# crash-risk: pallas fwd + matmul bwd inside the rest program
run pallasmm   python tools/bench_p2_profile.py pallasmm
echo "SWEEP2 DONE $(date +%H:%M:%S)" | tee -a "$LOG"
