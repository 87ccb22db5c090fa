#!/bin/bash
# qrlite A/B continuation (the 12:48Z batch lost its session after step 2;
# 28q step hit a transient tunnel read error).  Adds the SAME-SESSION qr
# controls the first script lacked, retries 28q, and runs the decisive
# 16q jitloop canary.  Disposition context: qrlite's 20q numbers were
# 40.33/40.04 sweeps/s but grad_norm deviated (init 1.382 vs qr's 4.630,
# perturbed 1.548 vs 1.721 — 100x the normal impl-to-impl spread).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/results/r4/qrlite2.log}
mkdir -p "$(dirname "$LOG")"
: > "$LOG"

step() {
  echo "=== $1 ($(date -u)) ===" >> "$LOG"
  shift
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "[exit $?]" >> "$LOG"
}

E="env AQC_TPU_RAND_INTERMEDIATE=qrlite"

step "qr CONTROL 20q chi=64 perturbed" \
  python benchmarks/bench_mps.py 20 64 4 1 --perturb=0.05
step "qrlite 20q chi=64 perturbed (same-session twin)" \
  $E python benchmarks/bench_mps.py 20 64 4 1 --perturb=0.05
step "qrlite 28q chi=128 perturbed (retry)" \
  $E python benchmarks/bench_mps.py 28 128 4 1 --perturb=0.05
step "qr CONTROL 28q chi=128 perturbed" \
  python benchmarks/bench_mps.py 28 128 4 1 --perturb=0.05
step "qrlite jitloop 16q chi=64 canary (fobj band: 2.42-2.46e-3)" \
  $E python benchmarks/probe_mps_jit_loop.py 16 64 2 15

echo "QRLITE2 DONE ($(date -u))" >> "$LOG"
