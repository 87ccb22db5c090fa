#!/bin/bash
# Round-4 phases 2-3, relaunched AFTER the svd_impl default decision so the
# long runs measure the production default (the original run_r4_queue.sh
# would have run them under the pre-decision default).
#   0. flip validation — 12q jitted-L-BFGS band check on chip + headline
#      bench refresh under the new default.
#   1. config-5 horizons — full 6-horizon run_simulation at 28q chi=128
#      (VERDICT #7; the 28q twin of the capstone depth table).
#   2. scale-wall probes — 28q chi=256 and 32q chi=128 single-chip sweep
#      rates (VERDICT #9: locate the HBM/compile wall the chain-sharded
#      engine must beat).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4_phase23.log}
: > "$LOG"

echo "=== phase 0: flip validation ($(date -u)) ===" >> "$LOG"
# 12q chi=32: 2chi < RAND_MIN_N — validates the jacobi fallback band.
timeout 2700 python benchmarks/probe_mps_jit_loop.py 12 32 2 20 >> "$LOG" 2>&1
echo "[jitloop 12q exit $?]" >> "$LOG"
# 20q chi=64: the production config-3 shape under the NEW auto default
# (fused-rand) — convergence + sweep rate with no env overrides.
timeout 2700 python benchmarks/probe_mps_jit_loop.py 20 64 2 15 >> "$LOG" 2>&1
echo "[jitloop 20q exit $?]" >> "$LOG"
timeout 2700 python benchmarks/bench_mps.py 20 64 4 1 --perturb=0.05 >> "$LOG" 2>&1
echo "[bench_mps 20q auto exit $?]" >> "$LOG"
timeout 2700 python bench.py >> "$LOG" 2>&1
echo "[bench exit $?] ($(date -u))" >> "$LOG"

echo "=== phase 2: config-5 six horizons ($(date -u)) ===" >> "$LOG"
timeout 14400 python benchmarks/run_config3.py 28 128 6 >> "$LOG" 2>&1
echo "[config5 exit $?] ($(date -u))" >> "$LOG"

echo "=== phase 3: scale-wall probes ($(date -u)) ===" >> "$LOG"
timeout 5400 python benchmarks/bench_mps.py 28 256 4 1 >> "$LOG" 2>&1
echo "[28q chi256 exit $?]" >> "$LOG"
timeout 5400 python benchmarks/bench_mps.py 32 128 4 1 >> "$LOG" 2>&1
echo "[32q chi128 exit $?]" >> "$LOG"
timeout 5400 python benchmarks/bench_mps.py 28 256 4 1 --perturb=0.05 >> "$LOG" 2>&1
echo "[28q chi256 perturbed exit $?]" >> "$LOG"

echo "ALL PHASES DONE ($(date -u))" >> "$LOG"
