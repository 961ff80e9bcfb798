#!/bin/bash
# Round-5 on-chip evidence queue: input-pipeline overlap probe with the new
# order-swap/threaded arms + fixed scalar-fetch step calibration (VERDICT
# r4 #4), train-b4 duty re-measure (same ask), and warm-cache serving
# start-up (VERDICT r4 #8). Health-gated like tpu_queue.sh; logs to
# /tmp/tpu_queue_r5.log.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${QUEUE_LOG:-/tmp/tpu_queue_r5.log}
POLL_S=${POLL_S:-300}
MAX_POLLS=${MAX_POLLS:-36}

log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

health() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
print(float((x @ x).sum()))
" >>"$LOG" 2>&1
}

wait_healthy() {
  for i in $(seq 1 "$MAX_POLLS"); do
    if health; then log "backend healthy (poll $i)"; return 0; fi
    log "backend down (poll $i/$MAX_POLLS), sleeping ${POLL_S}s"
    sleep "$POLL_S"
  done
  return 1
}

run_job() {  # run_job NAME TIMEOUT_S CMD...
  local name=$1 tmo=$2; shift 2
  if ! wait_healthy; then log "giving up before $name"; exit 1; fi
  log "=== JOB $name start"
  if timeout "$tmo" "$@" >>"$LOG" 2>&1; then
    log "=== JOB $name OK"
  else
    log "=== JOB $name FAILED rc=$? (see $LOG)"
  fi
}

log "r5 queue start"
# 1. overlap probe with order-swap + threaded arms and the fixed (scalar-
#    fetch) step calibration — decides whether the round-4 'serializes'
#    verdict was real or a block_until_ready artifact
run_job probe_overlap 2400 python tools/probe_input_pipeline.py
# 2. b4 overlap probe arm: the duty shortfall reproduces at b4 (0.783);
#    probe the b4 batch bytes specifically
run_job probe_overlap_b4 2400 env BENCH_TRAIN_BATCH=4 PROBE_OUT_SUFFIX=_b4 \
  python tools/probe_input_pipeline.py
# 3. train b4 duty re-measure (record lands in the queue log; harvested
#    into tools/records/train_b4_duty_r5.json afterwards)
run_job train_b4_duty 3000 env BENCH_MODE=train BENCH_TRAIN_BATCH=4 \
  BENCH_TRAIN_ITERS=6 python bench.py
# 4. warm-cache serving start-up (cold vs warm compile in fresh processes)
run_job serving_warm 5400 python tools/serving_warm_start.py
log "r5 queue done"
