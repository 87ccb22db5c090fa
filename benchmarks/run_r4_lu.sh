#!/bin/bash
# LU power-iteration normalizer A/B (AQC_TPU_RAND_INTERMEDIATE=lu):
# replaces the two intermediate stabilization QRs of the range-finder
# with partial-pivot LU (P@L basis; sklearn randomized_svd's default
# normalizer) and leaves the last power leg to the final Householder QR
# (2 LUs + 1 QR vs the default's 3 QRs).  CPU canaries first (graded
# +junk model: sigma/recon at qr class).  Decides: LU primitive cost on
# this TPU, production-shape sweeps/s at both shapes, the degenerate 20q
# init gradient, and the 16q jitloop band.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/results/r4/lu_ab.log}
mkdir -p "$(dirname "$LOG")"
: > "$LOG"

step() {
  echo "=== $1 ($(date -u)) ===" >> "$LOG"
  shift
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "[exit $?]" >> "$LOG"
}

E="env AQC_TPU_RAND_INTERMEDIATE=lu"

step "LU vs QR primitive cost, rand shapes 20q (b=10 n=128 ell=72)" \
  python benchmarks/probe_lu_prim.py 10 128 72
step "LU vs QR primitive cost, rand shapes 28q (b=9 n=256 ell=136)" \
  python benchmarks/probe_lu_prim.py 9 256 136
step "lu 20q chi=64 init (degenerate-point grad_norm; qr ref 4.6303)" \
  $E python benchmarks/bench_mps.py 20 64 4 1
step "lu 20q chi=64 perturbed (qr same-day ref 34.78, grad 1.7213)" \
  $E python benchmarks/bench_mps.py 20 64 4 1 --perturb=0.05
step "lu 28q chi=128 perturbed (qr ref ~10.1-10.5, grad 3.1537)" \
  $E python benchmarks/bench_mps.py 28 128 4 1 --perturb=0.05
step "lu jitloop 16q chi=64 canary (fobj band: 2.42-2.46e-3)" \
  $E python benchmarks/probe_mps_jit_loop.py 16 64 2 15

echo "LU_AB DONE ($(date -u))" >> "$LOG"
