#!/bin/bash
# TPU tunnel watchdog: probe the axon backend with a bounded timeout every
# INTERVAL seconds; the first time a probe succeeds, launch the queued batch
# script (default: benchmarks/run_rand_ab.sh) and exit.
#
# Usage: tpu_watchdog.sh [batch_script] [log] [interval_sec]
# Writes its pid to /tmp/tpu_watch.pid so it can be killed by pid (never by
# pattern).  Safe to restart; idempotent via a completion marker.
set -u
cd "$(dirname "$0")/.."
BATCH=${1:-benchmarks/run_rand_ab.sh}
LOG=${2:-/tmp/tpu_watch.log}
INTERVAL=${3:-510}
MARKER=/tmp/tpu_watch_launched
echo $$ > /tmp/tpu_watch.pid
echo "watchdog started pid=$$ batch=$BATCH at $(date -u)" >> "$LOG"
i=0
while true; do
  i=$((i+1))
  if timeout 110 python -c "
import jax, jax.numpy as jnp
d = jax.devices()
x = jnp.ones((8, 8), jnp.float32)
y = (x @ x).sum()
assert float(y) == 512.0
print('tpu ok:', d[0])
" >> "$LOG" 2>&1; then
    echo "probe $i SUCCEEDED at $(date -u)" >> "$LOG"
    if [ -f "$MARKER" ]; then
      echo "batch already launched; exiting" >> "$LOG"
      exit 0
    fi
    touch "$MARKER"
    echo "launching $BATCH at $(date -u)" >> "$LOG"
    bash "$BATCH" >> "$LOG" 2>&1
    echo "batch finished at $(date -u)" >> "$LOG"
    exit 0
  else
    echo "probe $i failed at $(date -u)" >> "$LOG"
  fi
  sleep "$INTERVAL"
done
