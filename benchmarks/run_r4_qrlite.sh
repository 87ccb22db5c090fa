#!/bin/bash
# qrlite A/B: AQC_TPU_RAND_INTERMEDIATE=qrlite drops the z-side
# stabilization QR of the range-finder (3 Householder QRs -> 2; the QRs
# are ~95% of the in-jit middle, RESULTS "Rand-route stage budget").
# CPU canaries passed (real-matrix leak 2.5e-11 = full-qr class, 10q
# jitloop in band, rand parity tests green); this batch decides the
# on-chip disposition: speed at both production shapes, the degenerate
# 20q init gradient (the point that disqualified q=0), and the 16q
# jitloop band.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/results/r4/qrlite.log}
mkdir -p "$(dirname "$LOG")"
: > "$LOG"

step() {
  echo "=== $1 ($(date -u)) ===" >> "$LOG"
  shift
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "[exit $?]" >> "$LOG"
}

E="env AQC_TPU_RAND_INTERMEDIATE=qrlite"

step "qrlite 20q chi=64 init (degenerate-point grad_norm check)" \
  $E python benchmarks/bench_mps.py 20 64 4 1
step "qrlite 20q chi=64 perturbed" \
  $E python benchmarks/bench_mps.py 20 64 4 1 --perturb=0.05
step "qrlite 28q chi=128 perturbed" \
  $E python benchmarks/bench_mps.py 28 128 4 1 --perturb=0.05
step "qrlite jitloop 16q chi=64 canary" \
  $E python benchmarks/probe_mps_jit_loop.py 16 64 2 15

echo "QRLITE DONE ($(date -u))" >> "$LOG"
