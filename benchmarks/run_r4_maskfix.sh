#!/bin/bash
# Validation of the cancellation-robust top-k truncation mask (the round-4
# root-cause fix for the "16q rand failure"): the previously-failing
# configurations must now be clean, the bands must hold for every impl,
# and the production rates must be re-confirmed under the fixed rule.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/results/r4/maskfix.log}
mkdir -p "$(dirname "$LOG")"
: > "$LOG"

step() {
  echo "=== $1 ($(date -u)) ===" >> "$LOG"
  shift
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "[exit $?]" >> "$LOG"
}

step "walk 16q os16 unfused (previously diverged at hl 1)" \
  env AQC_TPU_RAND_OVERSAMPLE=16 AQC_TPU_FUSED_PAIR=0 AQC_TPU_ALLOW_UNFUSED_RAND=1 \
  python benchmarks/probe_rand_target_walk.py 16 64 --thr=1e-8
step "jitloop 16q unfused rand os16 (the ORIGINAL failing jitloop)" \
  env AQC_TPU_SVD_IMPL=rand AQC_TPU_RAND_OVERSAMPLE=16 AQC_TPU_FUSED_PAIR=0 AQC_TPU_ALLOW_UNFUSED_RAND=1 \
  python benchmarks/probe_mps_jit_loop.py 16 64 2 15
step "jitloop 16q jacobi (band under the fixed rule)" \
  env AQC_TPU_SVD_IMPL=jacobi python benchmarks/probe_mps_jit_loop.py 16 64 2 15
step "jitloop 16q production default (fused-rand os8)" \
  python benchmarks/probe_mps_jit_loop.py 16 64 2 15
step "bench_mps 20q perturbed (auto, fixed rule)" \
  python benchmarks/bench_mps.py 20 64 4 1 --perturb=0.05
step "bench_mps 28q perturbed (auto, fixed rule)" \
  python benchmarks/bench_mps.py 28 128 4 1 --perturb=0.05
step "bench.py refresh" python bench.py

echo "MASKFIX DONE ($(date -u))" >> "$LOG"
