#!/bin/bash
# Round-4 on-chip evidence queue (VERDICT r4 asks #2, #3, #4, #10).
# Same health-gated structure as tpu_queue.sh; logs to /tmp/tpu_queue_r4.log.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${QUEUE_LOG:-/tmp/tpu_queue_r4.log}
POLL_S=${POLL_S:-300}
MAX_POLLS=${MAX_POLLS:-60}

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

log "r4 queue start"
# 1. e2e inference with the optimized post-process (VERDICT #2: >=8.0 goal)
run_job infer_bench 2400 env BENCH_MODE=infer python bench.py
# 2. MSDA gather-row timing arm (VERDICT #3)
run_job msda_points 2400 env AB_ARM=timing python tools/ab_msda_points.py
# 3. serving batch sweep (VERDICT #2 second half)
run_job serving_sweep 5400 python tools/sweep_serving_batch.py
# 4. f32 overfit gate on the chip (VERDICT #4; r4-tightened thresholds)
run_job overfit_f32 7200 env OG_DTYPE=float32 OG_STEPS=1400 OG_ARCH=swin-tiny python tools/overfit_gate.py
# 5. post-varsort train bucket profile (VERDICT #4)
run_job train_buckets 3600 python tools/profile_train_buckets.py
# 6. varsort-vs-topk on-chip criterion timing record (VERDICT #4)
run_job varsort 1800 bash -c 'echo "=== WISTPU_UNCERTAIN=varsort"; WISTPU_UNCERTAIN=varsort python tools/profile_criterion.py; echo "=== WISTPU_UNCERTAIN=topk"; WISTPU_UNCERTAIN=topk python tools/profile_criterion.py' 
# 7. compile retries (VERDICT #10): do train b4 / remat-off compile today?
run_job train_b4_retry 3000 env BENCH_MODE=train BENCH_TRAIN_BATCH=4 BENCH_TRAIN_ITERS=4 python bench.py
run_job remat_off_retry 3000 env BENCH_MODE=train BENCH_REMAT=0 BENCH_TRAIN_ITERS=4 python bench.py
log "r4 queue done"
