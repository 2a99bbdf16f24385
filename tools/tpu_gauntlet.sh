#!/bin/bash
# Serialized post-outage TPU run: gate the pending shared-matrix kernel,
# then re-bench. NEVER run two TPU processes at once (tunnel contention
# wedges compiles) — this script is the single driver; babysit its log.
#
# Usage: bash tools/tpu_gauntlet.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/gauntlet}
mkdir -p "$OUT"
export PYTHONPATH=/root/repo:/root/.axon_site

log() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$OUT/gauntlet.log"; }

run_step() { # name timeout_s cmd...
  local name=$1 t=$2; shift 2
  log "=== $name start"
  timeout "$t" "$@" > "$OUT/$name.out" 2> "$OUT/$name.err"
  local rc=$?
  log "=== $name exit=$rc (tail of stderr below)"
  tail -5 "$OUT/$name.err" | tee -a "$OUT/gauntlet.log"
  return $rc
}

# 0. probe (fast fail if the tunnel is still down)
run_step probe 120 python -c "import jax; print(jax.devices())" || {
  log "tunnel still down — aborting"; exit 1; }

# 1. numerics + perf gate for the shared-matrix fused kernel.
#    On FAILURE (Mosaic lowering / bad rel-RMS) the remaining steps run
#    with FDC_TPU_FUSED=static so a diagnosed failure is not re-burned
#    three more times; consider making that the code default too.
if ! run_step ablate19 3000 python tools/ablate19_tpu.py; then
  export FDC_TPU_FUSED=static
  log "ablate19 FAILED — remaining steps run with FDC_TPU_FUSED=static"
fi

# 2. flagship bench (the BENCH_r02 number). bench.py self-falls-back
#    through FDC_TPU_FUSED if a kernel fails to lower.
run_step bench 3000 python bench.py
cat "$OUT/bench.out" | tee -a "$OUT/gauntlet.log"

# 3. BASELINE config benchmarks
run_step bench_configs 6000 python tools/bench_configs.py

# 4. sharded 1x1 overhead after the degenerate-axis collective removal
run_step verify_sharded 3000 python tools/verify_sharded_tpu.py

log "gauntlet done — results in $OUT"
