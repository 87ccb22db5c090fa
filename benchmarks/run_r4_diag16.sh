#!/bin/bash
# Chained TPU diagnosis of the 16q chi=64 unfused-rand q=1 jitloop failure
# (fobj=1.0 on TPU; CPU f32 repro converges fine at 2.43e-3 — the failure is
# TPU-only, so it lives in the real Mosaic kernel path or TPU batched
# complex QR, not in the algorithm).  Waits for the rand A/B batch (pid in
# /tmp/rand_ab.pid) to release the tunnel, then runs the point probe per
# variant: value path (chi-growth forward sweep) vs value+grad path.
set -u
cd "$(dirname "$0")/.."
LOG=${1:-results/r4/diag16.log}
: > "$LOG"

if [ -f /tmp/rand_ab.pid ]; then
  while kill -0 "$(cat /tmp/rand_ab.pid)" 2>/dev/null; do sleep 60; done
fi
echo "tunnel free, starting diagnostics ($(date -u))" >> "$LOG"

step() {
  echo "=== $1 ===" >> "$LOG"
  shift
  timeout 2700 "$@" >> "$LOG" 2>&1
  echo "[exit $?]" >> "$LOG"
}

# Primitive discriminators first (cheap): batched complex QR orthonormality
# + rand_svd_top_k on synthetic rank-deficient/graded matrices.  CPU
# reference: QR resid 7e-7; recon errs 4e-7 / 5e-7 / 9.6e-3, orth 5e-7.
step "on-chip primitives (QR + rand_svd_top_k)" \
  python benchmarks/probe_tpu_rand_prims.py

# CPU f32 reference for the same probe: jacobi/rand agree at ~5e-6
# (value(x0)=0.5884).  Any TPU line far from that localizes the failure.
step "rand q=1 unfused (the failing variant)" \
  env AQC_TPU_FUSED_PAIR=0 python benchmarks/probe_rand_16q_point.py 16 64 2
step "rand q=0 unfused (passed in the jitloop)" \
  env AQC_TPU_FUSED_PAIR=0 AQC_TPU_RAND_POWER_ITERS=0 \
  python benchmarks/probe_rand_16q_point.py 16 64 2
step "rand q=1 fused (passed in the jitloop)" \
  env AQC_TPU_FUSED_PAIR=1 python benchmarks/probe_rand_16q_point.py 16 64 2
step "rand q=1 colnorm unfused" \
  env AQC_TPU_FUSED_PAIR=0 AQC_TPU_RAND_INTERMEDIATE=colnorm \
  python benchmarks/probe_rand_16q_point.py 16 64 2
echo "DIAG16 DONE ($(date -u))" >> "$LOG"
