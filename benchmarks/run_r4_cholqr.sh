#!/bin/bash
# Shifted-CholeskyQR intermediate A/B (AQC_TPU_RAND_INTERMEDIATE=cholqr):
# replaces the two intermediate stabilization QRs of the range-finder
# with shifted CholeskyQR (gram on the MXU + small (l,l) Cholesky +
# blocked trisolve; final basis stays Householder).  Primitive cost
# measured 1.9x under Householder QR at both production shapes
# (results/r4/cholqr.log "prim" lines).  CPU canaries green first
# (tests/test_rand_svd.py cholqr trio + jitloop band + real-mat leak).
# Decides: production-shape sweeps/s, the degenerate 20q init gradient,
# and the 16q jitloop band — the gauntlet that disqualified qrlite.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/results/r4/cholqr.log}
mkdir -p "$(dirname "$LOG")"

step() {
  echo "=== $1 ($(date -u)) ===" >> "$LOG"
  shift
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "[exit $?]" >> "$LOG"
}

E="env AQC_TPU_RAND_INTERMEDIATE=cholqr"

step "cholqr 20q chi=64 init (degenerate-point grad_norm; qr ref 4.6303)" \
  $E python benchmarks/bench_mps.py 20 64 4 1
step "cholqr 20q chi=64 perturbed (qr same-day ref 34.78, grad 1.7213)" \
  $E python benchmarks/bench_mps.py 20 64 4 1 --perturb=0.05
step "cholqr 28q chi=128 perturbed (qr ref ~10.1-10.5, grad 3.1537)" \
  $E python benchmarks/bench_mps.py 28 128 4 1 --perturb=0.05
step "cholqr jitloop 16q chi=64 canary (fobj band: 2.42-2.46e-3)" \
  $E python benchmarks/probe_mps_jit_loop.py 16 64 2 15

echo "CHOLQR_AB DONE ($(date -u))" >> "$LOG"
