"""Decompose the train-loop input gap (BENCH_r03: host duty 0.691, ~98 ms/step
of non-overlapped input on top of a 758.6 ms device step).

Answers three questions the round-3 wire codec left open (VERDICT r3 weak #2),
with a record under tools/records/:

1. BYTES — what the tunnel link actually sustains: blocking ``device_put`` of
   the real encoded/plain train batch, device idle.
2. OVERLAP — whether a ``device_put`` issued while a step is executing
   completes inside the step's shadow (DMA overlap) or serializes after it.
   A synthetic ~matmul chain of tunable duration stands in for the train step
   so the probe needs no Swin-L compile.
3. HOST — what the host-side producer costs per batch (npz read → collate →
   static pad → wire encode), no device involved.

The overlap experiment is the decision point for round 4's duty-cycle fix:
if transfers overlap, the gap must come from the host producer or dispatch
accounting (fix: cheaper host work / deeper prefetch); if they serialize,
bytes are the only lever (fix: smaller wire format, e.g. uint8 pixels).

Reference workload being fed: /root/reference/models/mask2former/train.py:191-206.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from weed_instance_segmentation_tpu import config
from weed_instance_segmentation_tpu.datasets.dataset_utils import PreprocessedDataset
from weed_instance_segmentation_tpu.datasets.loader import DataLoader
from weed_instance_segmentation_tpu.engine.train import _device_batches
from weed_instance_segmentation_tpu.parallel.mesh import create_mesh
from weed_instance_segmentation_tpu.processing.wire import encode_batch

HW = int(os.environ.get('BENCH_HW', '800'))
BATCH = int(os.environ.get('BENCH_TRAIN_BATCH', '2'))
MAX_INSTANCES = int(os.environ.get('BENCH_MAX_INSTANCES', '10'))
REPS = int(os.environ.get('PROBE_REPS', '8'))


def nbytes(tree) -> int:
    return sum(
        np.asarray(v).nbytes for v in tree.values() if hasattr(v, 'nbytes')
    )


def host_batches(n):
    """n host batches through the real producer path (no device_put):
    npz cache → DataLoader → static pad → wire encode."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import _synth_cache

    cache_dir = _synth_cache(num_labels=5)
    dataset = PreprocessedDataset(cache_dir)
    loader = DataLoader(dataset, BATCH, shuffle=False, prefetch=0)
    from weed_instance_segmentation_tpu.datasets.dataset_utils import pad_batch_static

    out = []
    for batch in loader:
        samples = [
            {k: batch[k][i] for k in ('pixel_values', 'mask_labels', 'class_labels')}
            for i in range(len(batch['file_names']))
        ]
        b = pad_batch_static(samples, (HW, HW), MAX_INSTANCES)
        out.append(b)
        if len(out) >= n:
            break
    return out


def main():
    rec = {
        'hw': HW, 'batch': BATCH, 'max_instances': MAX_INSTANCES,
        'platform': jax.devices()[0].platform,
        'device': str(jax.devices()[0]),
    }
    dev = jax.devices()[0]

    # ---- 3. HOST: producer cost per batch (loader+collate+pad, then encode)
    t0 = time.perf_counter()
    batches = host_batches(REPS)
    rec['host_pipeline_ms_per_batch'] = round(
        1000 * (time.perf_counter() - t0) / len(batches), 1
    )
    t0 = time.perf_counter()
    enc = [encode_batch(b, pixels_dtype=jnp.bfloat16) for b in batches]
    rec['host_encode_ms_per_batch'] = round(
        1000 * (time.perf_counter() - t0) / len(enc), 1
    )
    rec['plain_mb'] = round(nbytes(batches[0]) / 1e6, 2)
    rec['encoded_mb'] = round(nbytes(enc[0]) / 1e6, 2)

    # ---- 1. BYTES: blocking device_put, device idle ----------------------
    for name, payloads in (('encoded', enc), ('plain', batches)):
        jax.block_until_ready(jax.device_put(payloads[0], dev))  # warm path
        t0 = time.perf_counter()
        for b in payloads:
            jax.block_until_ready(jax.device_put(b, dev))
        dt = (time.perf_counter() - t0) / len(payloads)
        rec[f'put_{name}_ms'] = round(1000 * dt, 1)
        rec[f'put_{name}_mb_s'] = round(nbytes(payloads[0]) / 1e6 / dt, 1)

    # ---- 2. OVERLAP: put during a running step vs device idle ------------
    # synthetic step: chained matmuls sized to ~600-900 ms on v5e
    n = 4096
    x = jax.device_put(jnp.ones((n, n), jnp.bfloat16), dev)

    @jax.jit
    def burn(x, iters):
        def body(_, y):
            return y @ y * (1.0 / n)
        return jax.lax.fori_loop(0, iters, body, x)

    def drain(out) -> None:
        # tunnel rule (tools/README.md): block_until_ready alone has
        # mis-measured by 600× on the axon backend (the round-4 record's
        # synthetic_step_ms=0.1 was this artifact); a scalar fetch is the
        # only reliable execution barrier
        float(jnp.asarray(out).reshape(-1)[0])

    drain(burn(x, 1))
    t0 = time.perf_counter()
    drain(burn(x, 64))
    per64 = time.perf_counter() - t0
    iters = max(2, int(64 * 0.7 / per64))  # aim ~700 ms
    drain(burn(x, iters))
    t0 = time.perf_counter()
    for _ in range(3):
        drain(burn(x, iters))
    step_s = (time.perf_counter() - t0) / 3
    rec['synthetic_step_ms'] = round(1000 * step_s, 1)

    # (a) put while idle (already measured: put_encoded_ms)
    # (b) dispatch step, then put + block; then drain the step
    overlap_ms = []
    serial_ms = []
    for k in range(REPS):
        b = enc[k % len(enc)]
        out = burn(x, iters)          # async dispatch
        t0 = time.perf_counter()
        jax.block_until_ready(jax.device_put(b, dev))
        overlap_ms.append(1000 * (time.perf_counter() - t0))
        t0 = time.perf_counter()
        drain(out)                    # remaining step time (scalar fetch)
        serial_ms.append(1000 * (time.perf_counter() - t0))
    rec['put_during_step_ms'] = round(float(np.median(overlap_ms)), 1)
    rec['step_remainder_after_put_ms'] = round(float(np.median(serial_ms)), 1)

    # (b2) order swap — issue the put FIRST (async), dispatch the step
    # immediately, then block on both. If the runtime can run DMA and
    # compute concurrently the wall is ~step; if it serializes in either
    # order the wall is ~step + put. (VERDICT r5 #4: decide whether the
    # round-4 'serializes' verdict is an ordering artifact or a runtime
    # property.)
    walls = []
    for k in range(REPS):
        b = enc[k % len(enc)]
        t0 = time.perf_counter()
        db = jax.device_put(b, dev)   # async issue
        out = burn(x, iters)
        drain(out)
        jax.block_until_ready(db)
        walls.append(1000 * (time.perf_counter() - t0))
    rec['put_first_then_step_wall_ms'] = round(float(np.median(walls)), 1)

    # (b3) threaded put — a producer thread calls device_put + block while
    # the main thread blocks on the running step (exactly the shape of the
    # train loop's prefetch thread). Records how long the THREAD's put took
    # and the combined wall.
    import threading

    thread_put_ms = []
    walls = []
    for k in range(REPS):
        b = enc[k % len(enc)]
        done = {}

        def _put():
            t1 = time.perf_counter()
            done['db'] = jax.device_put(b, dev)
            jax.block_until_ready(done['db'])
            done['ms'] = 1000 * (time.perf_counter() - t1)

        t0 = time.perf_counter()
        out = burn(x, iters)
        th = threading.Thread(target=_put)
        th.start()
        drain(out)
        th.join()
        walls.append(1000 * (time.perf_counter() - t0))
        thread_put_ms.append(done['ms'])
    rec['threaded_put_ms'] = round(float(np.median(thread_put_ms)), 1)
    rec['threaded_put_wall_ms'] = round(float(np.median(walls)), 1)
    if (rec['put_first_then_step_wall_ms'] < rec['synthetic_step_ms']
            + 0.5 * rec['put_encoded_ms']):
        rec['overlap_order_swap'] = 'overlaps when the put is issued first'
    else:
        rec['overlap_order_swap'] = 'serializes regardless of issue order'
    # verdict: if put_during_step ≈ put idle AND remainder ≈ step - put,
    # the transfer rode the step's shadow (overlap). If put_during_step
    # ≈ step (blocked until the step finished) or remainder ≈ full step
    # (transfer pushed the step), the link serializes.
    put_idle = rec['put_encoded_ms']
    step_ms = rec['synthetic_step_ms']
    if rec['put_during_step_ms'] > 0.6 * step_ms:
        verdict = 'serializes: put blocks until the running step completes'
    elif rec['step_remainder_after_put_ms'] > 0.9 * step_ms:
        verdict = 'serializes: put delays the dispatched step'
    elif rec['put_during_step_ms'] < 2.5 * put_idle:
        verdict = 'overlaps: transfer completes in the step shadow'
    else:
        verdict = 'partial overlap'
    rec['overlap_verdict'] = verdict

    # (c) end-to-end pipelined mini-loop with the synthetic step, wire on/off
    for name, payloads in (('encoded', enc), ('plain', batches)):
        it_batches = payloads * 2
        drain(burn(x, iters))
        t0 = time.perf_counter()
        pending = None
        from weed_instance_segmentation_tpu.datasets.loader import prefetch_iterator

        def gen():
            for b in it_batches:
                yield jax.device_put(b, dev)

        for db in prefetch_iterator(gen(), depth=2):
            if pending is not None:
                drain(pending)
            pending = burn(x, iters)
        drain(pending)
        wall = (time.perf_counter() - t0) / len(it_batches)
        rec[f'pipelined_{name}_wall_ms'] = round(1000 * wall, 1)
        rec[f'pipelined_{name}_gap_ms'] = round(1000 * wall - rec['synthetic_step_ms'], 1)

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'records',
        f'probe_input_pipeline{os.environ.get("PROBE_OUT_SUFFIX", "")}.json',
    )
    with open(out_path, 'w') as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == '__main__':
    main()
