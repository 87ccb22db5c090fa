#!/bin/bash
# Round-4 batch 2 (post default-flip): root-cause + next-lever measurements.
#   1. divergence localization of the TPU-only unfused-rand 16q failure
#      (host-driven L-BFGS, per-iteration bond health, theta dump),
#   2. stage-split timing of the rand route at both production shapes
#      (where does the 3x gap to the 105 sweeps/s roofline live?),
#   3. oversample=8 candidate (fused route; +8% unfused in the A/B) with a
#      16q jitloop convergence canary.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/results/r4/batch2.log}
mkdir -p "$(dirname "$LOG")"
: > "$LOG"

step() {
  echo "=== $1 ($(date -u)) ===" >> "$LOG"
  shift
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "[exit $?]" >> "$LOG"
}

step "divergence 16q jacobi (reference)" \
  env AQC_TPU_SVD_IMPL=jacobi python benchmarks/probe_rand_divergence.py 16 64 2 15
step "divergence 16q rand UNFUSED (the failing config)" \
  env AQC_TPU_SVD_IMPL=rand AQC_TPU_FUSED_PAIR=0 AQC_TPU_ALLOW_UNFUSED_RAND=1 \
  python benchmarks/probe_rand_divergence.py 16 64 2 15 --dump=/root/repo/results/r4/div16_unfused.npz
step "divergence 16q rand fused (production default)" \
  env AQC_TPU_SVD_IMPL=rand python benchmarks/probe_rand_divergence.py 16 64 2 15

step "rand stages 20q shape (b=10 n=128 chi=64)" \
  python benchmarks/probe_rand_stages.py 10 128 64
step "rand stages 28q shape (b=9 n=256 chi=128)" \
  python benchmarks/probe_rand_stages.py 9 256 128

step "os8 fused-rand 20q init" \
  env AQC_TPU_RAND_OVERSAMPLE=8 python benchmarks/bench_mps.py 20 64 4 1
step "os8 fused-rand 20q perturbed" \
  env AQC_TPU_RAND_OVERSAMPLE=8 python benchmarks/bench_mps.py 20 64 4 1 --perturb=0.05
step "os8 fused-rand 28q perturbed" \
  env AQC_TPU_RAND_OVERSAMPLE=8 python benchmarks/bench_mps.py 28 128 4 1 --perturb=0.05
step "os8 jitloop 16q canary" \
  env AQC_TPU_RAND_OVERSAMPLE=8 python benchmarks/probe_mps_jit_loop.py 16 64 2 15

step "roofline 28q rand" \
  python -m aqc_research_tpu.ops.roofline 28 128 4

echo "BATCH2 DONE ($(date -u))" >> "$LOG"
