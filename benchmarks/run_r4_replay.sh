#!/bin/bash
# Localize the unfused-rand TPU keep/drop divergence: capture the
# divergent pair batch on chip, replay the decomposition on BOTH
# backends, diff every quantity the keep decision consumes.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/root/repo/results/r4/replay.log}
mkdir -p "$(dirname "$LOG")" /root/repo/results/r4
: > "$LOG"

step() {
  echo "=== $1 ($(date -u)) ===" >> "$LOG"
  shift
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "[exit $?]" >> "$LOG"
}

NPZ=/root/repo/results/r4/walk16_thetas.npz

step "walk 16q os16 unfused + dump divergent batch" \
  env AQC_TPU_RAND_OVERSAMPLE=16 AQC_TPU_FUSED_PAIR=0 AQC_TPU_ALLOW_UNFUSED_RAND=1 \
  python benchmarks/probe_rand_target_walk.py 16 64 --thr=1e-8 --dump=$NPZ
step "replay on TPU" \
  env AQC_TPU_RAND_OVERSAMPLE=16 AQC_TPU_ALLOW_UNFUSED_RAND=1 \
  python benchmarks/probe_rand_tpu_replay.py $NPZ --thr=1e-8 \
    --out=/root/repo/results/r4/replay_tpu.npz
step "replay on CPU (the same c64 math; CPU is the reference)" \
  env AQC_TPU_RAND_OVERSAMPLE=16 AQC_TPU_ALLOW_UNFUSED_RAND=1 \
  python benchmarks/probe_rand_tpu_replay.py $NPZ --thr=1e-8 --cpu \
    --out=/root/repo/results/r4/replay_cpu.npz
step "compare" \
  python benchmarks/probe_rand_tpu_replay.py --compare \
    /root/repo/results/r4/replay_tpu.npz /root/repo/results/r4/replay_cpu.npz

echo "REPLAY DONE ($(date -u))" >> "$LOG"
