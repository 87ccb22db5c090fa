#!/bin/bash
# Shifted-CholeskyQR gauntlet v2 — under the REPAIRED shift keying
# (b184f79: shift keyed to the gram's max diagonal, not tr(G); attenuated
# columns re-enter at unit scale after the triangular solve).  Gauntlet v1
# (results/r4/cholqr.log) measured +14%/+11% sweeps/s at the production
# shapes but FAILED the 16q jitloop canary (fobj 1.8e-2, 7x out of band)
# — the trace-keyed shift inflated ~70x on flat mid-optimization spectra.
# This rerun decides the default: all four steps must pass.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/results/r4/cholqr_v2.log}
mkdir -p "$(dirname "$LOG")"

step() {
  echo "=== $1 ($(date -u)) ===" >> "$LOG"
  shift
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "[exit $?]" >> "$LOG"
}

E="env AQC_TPU_RAND_INTERMEDIATE=cholqr"

step "cholqr-v2 20q chi=64 init (degenerate-point grad_norm; qr ref 4.6303)" \
  $E python benchmarks/bench_mps.py 20 64 4 1
step "cholqr-v2 20q chi=64 perturbed (qr same-day ref 34.78, grad 1.7213)" \
  $E python benchmarks/bench_mps.py 20 64 4 1 --perturb=0.05
step "cholqr-v2 28q chi=128 perturbed (qr ref ~10.1-10.5, grad 3.1537)" \
  $E python benchmarks/bench_mps.py 28 128 4 1 --perturb=0.05
step "cholqr-v2 jitloop 16q chi=64 canary (fobj band: 2.42-2.46e-3)" \
  $E python benchmarks/probe_mps_jit_loop.py 16 64 2 15
# v1 never reached the 12q convergence check; include it so a default
# flip has the same evidence set the rand flip had.
step "cholqr-v2 jitloop 12q chi=32 (band ~7.6-7.9e-4)" \
  $E python benchmarks/probe_mps_jit_loop.py 12 32 2 20

echo "CHOLQR_V2 DONE ($(date -u))" >> "$LOG"
