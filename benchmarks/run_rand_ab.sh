#!/bin/bash
# Sweep-level A/B of the randomized-projection truncated SVD (svd_impl=rand)
# vs the production Jacobi kernel, at the two MPS production shapes
# (BASELINE.md configs 3/5), plus a convergence check (short jitted L-BFGS
# run at 16q chi=64 where the rand path is active: n = 2*chi = 128).
#
# Each step is individually time-bounded; partial results survive in the log.
# Jacobi reference numbers for the same harness (previous session, warm
# cache): 20q init 33.77, 20q perturbed 21.82, 28q init 7.18, 28q perturbed
# 4.25 sweeps/s.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/rand_ab.log}
: > "$LOG"

step() {
  echo "=== $1 ===" >> "$LOG"
  shift
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "[exit $?]" >> "$LOG"
}

step "rand 20q init"       python benchmarks/bench_mps.py 20 64 4 1 --svd-impl=rand
step "rand 20q perturbed"  python benchmarks/bench_mps.py 20 64 4 1 --svd-impl=rand --perturb=0.05
# At 28q chi=128 the fused-pair auto policy (chi >= 96) routes rand through
# the fused-rand megakernel (ops/fused_rand.py); measure both routes.
step "fusedrand 28q init"      python benchmarks/bench_mps.py 28 128 4 1 --svd-impl=rand
step "fusedrand 28q perturbed" python benchmarks/bench_mps.py 28 128 4 1 --svd-impl=rand --perturb=0.05
step "rand-nofuse 28q init"      env AQC_TPU_FUSED_PAIR=0 python benchmarks/bench_mps.py 28 128 4 1 --svd-impl=rand
step "rand-nofuse 28q perturbed" env AQC_TPU_FUSED_PAIR=0 python benchmarks/bench_mps.py 28 128 4 1 --svd-impl=rand --perturb=0.05
# Fused-rand at the 20q shape (fused auto is off below chi=96; force it).
step "fusedrand 20q init"      env AQC_TPU_FUSED_PAIR=1 python benchmarks/bench_mps.py 20 64 4 1 --svd-impl=rand
step "fusedrand 20q perturbed" env AQC_TPU_FUSED_PAIR=1 python benchmarks/bench_mps.py 20 64 4 1 --svd-impl=rand --perturb=0.05
# power_iters=0 drops 2 of the 3 Householder QRs; accuracy-validated on
# real matrices (probe_rand_real_mats with q=0: leak 1.4e-11/1.8e-11 —
# still 10-20x better than the plain kernel, sigma err 2.3e-6).
step "rand-q0 20q init"        env AQC_TPU_RAND_POWER_ITERS=0 python benchmarks/bench_mps.py 20 64 4 1 --svd-impl=rand
step "rand-q0 20q perturbed"   env AQC_TPU_RAND_POWER_ITERS=0 python benchmarks/bench_mps.py 20 64 4 1 --svd-impl=rand --perturb=0.05
step "fusedrand-q0 28q init"      env AQC_TPU_RAND_POWER_ITERS=0 python benchmarks/bench_mps.py 28 128 4 1 --svd-impl=rand
step "fusedrand-q0 28q perturbed" env AQC_TPU_RAND_POWER_ITERS=0 python benchmarks/bench_mps.py 28 128 4 1 --svd-impl=rand --perturb=0.05
# colnorm intermediates: q=1 sharpening at 1-QR cost, counts in between
# (4.90/3.84 vs 2.97/2.82 full-QR, 5.30/4.88 q=0 — RESULTS.md).
step "rand-colnorm 20q perturbed"  env AQC_TPU_RAND_INTERMEDIATE=colnorm python benchmarks/bench_mps.py 20 64 4 1 --svd-impl=rand --perturb=0.05
step "fusedrand-colnorm 28q perturbed" env AQC_TPU_RAND_INTERMEDIATE=colnorm python benchmarks/bench_mps.py 28 128 4 1 --svd-impl=rand --perturb=0.05
# oversample 8: identical accuracy/counts on real matrices, ~10% fewer flops.
step "rand-os8 20q perturbed"      env AQC_TPU_RAND_OVERSAMPLE=8 python benchmarks/bench_mps.py 20 64 4 1 --svd-impl=rand --perturb=0.05
# Fleet: decompositions are flops-bound (RESULTS), so halving per-matrix
# flops may finally lift the 8-start amortization past the 4x target
# (round-3 plateau: 3.93x, aggregate 21.82 sweeps/s at 20q).
step "rand 20q fleet8"     python benchmarks/bench_mps.py 20 64 4 8 --svd-impl=rand
# Convergence: fobj after 15 L-BFGS iters must land in the same band for
# both impls (the fixed-low-sweep trap of round 2 showed rate benches alone
# are NOT safe evidence).
step "jitloop 16q chi=64 jacobi" env AQC_TPU_SVD_IMPL=jacobi python benchmarks/probe_mps_jit_loop.py 16 64 2 15
step "jitloop 16q chi=64 rand"   env AQC_TPU_SVD_IMPL=rand   python benchmarks/probe_mps_jit_loop.py 16 64 2 15
step "jitloop 16q chi=64 fusedrand" env AQC_TPU_SVD_IMPL=rand AQC_TPU_FUSED_PAIR=1 python benchmarks/probe_mps_jit_loop.py 16 64 2 15
step "jitloop 16q chi=64 rand-q0"   env AQC_TPU_SVD_IMPL=rand AQC_TPU_RAND_POWER_ITERS=0 python benchmarks/probe_mps_jit_loop.py 16 64 2 15
# Same-session jacobi baselines (the header numbers above are from an
# earlier session; dispatch latency varies session to session).
step "jacobi 20q init"      python benchmarks/bench_mps.py 20 64 4 1
step "jacobi 20q perturbed" python benchmarks/bench_mps.py 20 64 4 1 --perturb=0.05
step "jacobi 28q init"      python benchmarks/bench_mps.py 28 128 4 1
step "jacobi 28q perturbed" python benchmarks/bench_mps.py 28 128 4 1 --perturb=0.05
# Hybrid convergence criterion (round-4: fixes the degenerate-cut
# contamination; costs ~+30% sweeps on the synthetic graded+junk model —
# measure the REAL-matrix cost + convergence band before any default flip).
step "jacobi-hybrid 20q init"      env AQC_TPU_JACOBI_CRITERION=hybrid python benchmarks/bench_mps.py 20 64 4 1
step "jacobi-hybrid 20q perturbed" env AQC_TPU_JACOBI_CRITERION=hybrid python benchmarks/bench_mps.py 20 64 4 1 --perturb=0.05
step "jitloop 16q chi=64 hybrid"   env AQC_TPU_JACOBI_CRITERION=hybrid python benchmarks/probe_mps_jit_loop.py 16 64 2 15
# Rand roofline: measured rand sweep + the model's reduced-problem bound.
step "roofline 20q rand"    env AQC_TPU_SVD_IMPL=rand python -m aqc_research_tpu.ops.roofline 20 64 4
# Headline refresh in the same tunnel window.
step "bench.py headline"    python bench.py
echo "ALL DONE" >> "$LOG"
