#!/bin/bash
# Round-4 tunnel-recovery master batch: everything blocked on the axon
# tunnel, in leverage order.  Each phase is individually bounded; partial
# results survive in the logs.
#   1. run_rand_ab.sh      — the stranded rand/fused-rand/hybrid A/B + fleet
#                            + convergence jitloops + same-session jacobi
#                            baselines + bench.py refresh (VERDICT #1/#5).
#   2. config-5 horizons   — full 6-horizon run_simulation at 28q chi=128
#                            (VERDICT #7; the 28q twin of the capstone
#                            depth table).
#   3. scale-wall probes   — 28q chi=256 and 32q chi=128 single-chip sweep
#                            rates (VERDICT #9: locate the HBM/compile wall
#                            the chain-sharded engine must beat).
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/r4_queue.log}
: > "$LOG"

echo "=== phase 1: rand A/B batch ($(date -u)) ===" >> "$LOG"
bash benchmarks/run_rand_ab.sh /tmp/rand_ab.log
echo "rand_ab done ($(date -u)); log at /tmp/rand_ab.log" >> "$LOG"

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
