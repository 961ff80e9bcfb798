#!/bin/bash
# Drive tools/probe_criterion_bisect.py through one healthy TPU window.
#
# Runs criterion sub-components in increasing-suspicion order and STOPS at
# the first crash (a crash wedges the backend for minutes-to-hours, so every
# PASS before it is the information we keep). Verifies backend health before
# each part; logs to tools/records/bisect_$(date).log.
set -u
cd "$(dirname "$0")/.."
LOG=tools/records/bisect_$(date -u +%Y%m%d_%H%M%S).log
PARTS=${PARTS:-"matcher lap uncertainty masks single full"}

health() {
  timeout 120 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512))
(x @ x).block_until_ready()
print('healthy')
" >>"$LOG" 2>&1
}

echo "bisect driver start $(date -u)" | tee -a "$LOG"
for part in $PARTS; do
  if ! health; then
    echo "BACKEND DOWN before PART=$part — stopping" | tee -a "$LOG"
    exit 1
  fi
  echo "--- PART=$part $(date -u +%H:%M:%S)" | tee -a "$LOG"
  if PART=$part timeout 420 python tools/probe_criterion_bisect.py >>"$LOG" 2>&1; then
    echo "PART=$part PASS" | tee -a "$LOG"
  else
    echo "PART=$part CRASH/FAIL — stopping (see $LOG)" | tee -a "$LOG"
    exit 2
  fi
done
echo "ALL PARTS PASSED $(date -u)" | tee -a "$LOG"
