#!/bin/bash
# Round-4 continuation: re-capture the on-chip artifacts lost in the
# Aug-19 VM reset (results/r4/{batch2,phase23}.log were never committed),
# under the REPAIRED fused-rand kernel (Mosaic toolchain regression fix).
# Production rates at the os=8 default, the scale-wall probes, and the
# in-jit sweep composition split.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/results/r4/recapture.log}
mkdir -p "$(dirname "$LOG")"
: > "$LOG"

step() {
  echo "=== $1 ($(date -u)) ===" >> "$LOG"
  shift
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "[exit $?]" >> "$LOG"
}

step "bench_mps 20q chi=64 init (production default)" \
  python benchmarks/bench_mps.py 20 64 4 1
step "bench_mps 20q chi=64 perturbed" \
  python benchmarks/bench_mps.py 20 64 4 1 --perturb=0.05
step "bench_mps 28q chi=128 perturbed" \
  python benchmarks/bench_mps.py 28 128 4 1 --perturb=0.05
step "sweep composition split 20q chi=64 (in-jit decomposition share)" \
  python benchmarks/probe_sweep_composition.py 20 64 4
step "scale wall: 28q chi=256 init" \
  python benchmarks/bench_mps.py 28 256 4 1
step "scale wall: 32q chi=128 init" \
  python benchmarks/bench_mps.py 32 128 4 1
step "fleet of 8, 20q chi=64 (rand fleet economics)" \
  python benchmarks/bench_mps.py 20 64 4 8

echo "RECAPTURE DONE ($(date -u))" >> "$LOG"
