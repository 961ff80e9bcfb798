#!/bin/bash
# Round-4 remainder queue (second window): the on-chip evidence still open
# after the first round-4 window — serving sweep retry (VERDICT #2; the
# params-as-traced-arg fix landed after the failed attempt), the
# varsort-vs-topk criterion timing record (VERDICT #4), the bf16 arm of the
# trajectory-parity study (VERDICT #6), and the blocked-compile retries
# (VERDICT #10). Health-gated like tpu_queue.sh; logs to /tmp/tpu_queue_r4b.log.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
LOG=${QUEUE_LOG:-/tmp/tpu_queue_r4b.log}
POLL_S=${POLL_S:-300}
MAX_POLLS=${MAX_POLLS:-36}

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

log "r4b queue start"
# 0. e2e inference headline re-measure (VERDICT #2): post-process now uses
#    the matmul upsample (ledger D13, ~18 -> ~11.7 ms/b4) and the bench
#    reduce dispatches were merged (one ~2 ms tunnel dispatch saved).
run_job bench_infer 3000 env BENCH_MODE=infer python bench.py
# 1. serving batch sweep retry (VERDICT #2): previous attempt predates the
#    params-as-traced-argument fix (commit 7617d63) and died on HTTP 413 /
#    broken pipe in the remote compiler.
run_job serving_sweep 5400 python tools/sweep_serving_batch.py
# fallback: if any config still fails to compile remotely, retry id-map-only
# (emit_masks=0 shrinks the compiled program, which is what the HTTP 413
# length limit is about) into a separate record
if grep -q '"error"' tools/records/serving_sweep.json 2>/dev/null; then
  run_job serving_sweep_nomasks 5400 env SWEEP_EMIT_MASKS=0 \
    SWEEP_OUT=tools/records/serving_sweep_nomasks.json \
    python tools/sweep_serving_batch.py
fi
# 2. varsort-vs-topk on-chip criterion timing (VERDICT #4): back the
#    "varsort beats topk at bench shapes" docstring with a record.
run_job varsort 2400 bash -c '
  echo "=== WISTPU_UNCERTAIN=varsort";
  WISTPU_UNCERTAIN=varsort python tools/profile_criterion.py;
  echo "=== WISTPU_UNCERTAIN=topk";
  WISTPU_UNCERTAIN=topk python tools/profile_criterion.py'
# 3. bf16 trajectory-parity arm (VERDICT #6): ours at the shipping compute
#    dtype vs torch f32, 200 steps, wider band for the real bf16 rounding.
run_job parity_bf16 5400 env PT_DTYPE=bfloat16 PT_STEPS=200 PT_REL_BAND=0.30 \
  PT_OUT=tools/records/parity_trajectory_bfloat16.json \
  python tools/parity_trajectory.py
# 4. compile retries (VERDICT #10): train b4 and remat-off were
#    remote-compiler-blocked (HTTP 500) in rounds 2-3; refresh the fact.
run_job train_b4_retry 3000 env BENCH_MODE=train BENCH_TRAIN_BATCH=4 BENCH_TRAIN_ITERS=4 python bench.py
run_job remat_off_retry 3000 env BENCH_MODE=train BENCH_REMAT=0 BENCH_TRAIN_ITERS=4 python bench.py
log "r4b queue done"
# 5. post-varsort train-step bucket profile at the bench config (VERDICT #4):
#    the round-4 commit title claims it but no record file landed.
run_job train_buckets 3600 python tools/profile_train_buckets.py
log "r4b queue really done"
