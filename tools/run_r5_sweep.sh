#!/bin/bash
# Round-5 session sweep: measure the level-skip pooler, the pallas-fwd
# candidate, the chunk=512 point, then the full step / loop / backbone2 /
# depth / P3 / inference decompositions. Highest-information-first so an
# early wall-clock cutoff still yields the P2 decision; crash-risk
# variants after the safe pooler-only runs. One process per variant.
# Usage: bash tools/run_r5_sweep.sh [logfile]
set -u
LOG="${1:-/tmp/r5_sweep.log}"
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

# 1. Level-skip pooler (bit-exact; the big P2 lever: chunks currently pay
#    all 4 FPN levels' einsums for every RoI)
run poolskip    env WEAKCUBE_RA_LEVEL_SKIP=1 python tools/bench_p2_profile.py pool
run poolbwdskip env WEAKCUBE_RA_LEVEL_SKIP=1 python tools/bench_p2_profile.py poolbwd
# 2. chunk=512 (one scan iter -> pyramid read once, HBM re-read hypothesis)
run pool512     env WEAKCUBE_RA_CHUNK=512 python tools/bench_p2_profile.py pool
run poolbwd512  env WEAKCUBE_RA_CHUNK=512 python tools/bench_p2_profile.py poolbwd
run poolskip512 env WEAKCUBE_RA_LEVEL_SKIP=1 WEAKCUBE_RA_CHUNK=512 python tools/bench_p2_profile.py pool
# 3. rest program with skip (mild crash risk: cond-in-scan)
run p2skip      env WEAKCUBE_RA_LEVEL_SKIP=1 python tools/bench_p2_profile.py p2
# 4. pallas fwd + matmul bwd in the rest program (crash risk)
run pallasmm    python tools/bench_p2_profile.py pallasmm
# 5. full step with the skip candidate, then the current default baseline
run trainskip   env WEAKCUBE_RA_LEVEL_SKIP=1 BENCH_SKIP_DEPTH=1 BENCH_SKIP_INFER=1 python bench.py --stage train
# 6. end-to-end loop throughput (VERDICT item 2)
run trainloop   python bench.py --stage trainloop
run trainloopskip env WEAKCUBE_RA_LEVEL_SKIP=1 python bench.py --stage trainloop
# 7. backbone2 merged bwd+update (VERDICT item 3)
run bb2step     env WEAKCUBE_SPLIT_STEP=backbone2 WEAKCUBE_RA_LEVEL_SKIP=1 python bench.py --stage train
# 8. depth recovery sweep (VERDICT item 4)
run depthsweep  python tools/bench_depth_sweep.py --quick
# 9. P3 backbone-bwd decomposition and inference decomposition (item 5)
run p3_all      python tools/bench_p3_parts.py all
run infer_all   python tools/bench_infer_parts.py all
echo "R5 SWEEP DONE $(date +%H:%M:%S)" | tee -a "$LOG"
