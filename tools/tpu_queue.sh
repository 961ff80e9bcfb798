#!/bin/bash
# On-chip work queue for outage windows (2026-08-18 incident follow-up).
#
# Polls backend health every POLL_S seconds; when a window opens, runs the
# queued on-chip jobs in priority order, re-checking health between jobs
# (a backend crash mid-queue must not burn the remaining items against a
# wedged runtime). Logs to /tmp/tpu_queue2.log; durable artifacts land in
# tools/records/ via each job's own output path.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"  # tools/*.py import the package
LOG=${QUEUE_LOG:-/tmp/tpu_queue2.log}
POLL_S=${POLL_S:-300}
MAX_POLLS=${MAX_POLLS:-120}

log() { echo "[$(date -u +%H:%M:%S)] $*" | tee -a "$LOG"; }

health() {
  timeout 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((512, 512), jnp.bfloat16)
(x @ x).block_until_ready()
print('healthy')
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

log "queue start"
run_job bench 3600 env BENCH_MODE=all python bench.py
run_job overfit_f32 7200 env OG_DTYPE=float32 OG_STEPS=1400 OG_ARCH=swin-tiny python tools/overfit_gate.py
run_job serving_sweep 4500 python tools/sweep_serving_batch.py
run_job train_buckets 2700 python tools/profile_train_buckets.py
log "queue done"
