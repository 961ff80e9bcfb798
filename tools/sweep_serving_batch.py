"""Serving-path batch sweep: the micro-batched e2e pipeline at b ≥ 8.

Round-2 found the single-dispatch inference path collapses past b4
(b1 5.2 → b4 8.0 → b8 2.4 img/s, tools/sweep_infer_batch.py): the
200-query mask-logit chain + 384² upsample spills HBM at larger liveness.
``make_serving_fn(micro_batch=4)`` caps activation liveness at the b4
sweet spot while serving the full request batch in one compiled program
(lax.map over sub-batches). This sweep measures the TRUE e2e serving
chain (uint8 → fused preprocess → forward → device post-process) across
request batches, micro-batched vs single-dispatch, on the real chip.

One compile per config (4-10 min each through the tunnel). Timing chains
a data dependency between iterations and fetches a scalar at the end
(tools/README.md timing rule).

Env: SWEEP_CONFIGS "batch:micro,..." (default "4:0,8:4,16:4"),
BENCH_HW, BENCH_HW_IN, BENCH_ARCH, BENCH_DTYPE, BENCH_ITERS as bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.engine.export import make_serving_fn
from weed_instance_segmentation_tpu.engine.model_utils import config_for_arch, init_params
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

CONFIGS = [
    tuple(int(v) for v in c.split(':'))
    for c in os.environ.get('SWEEP_CONFIGS', '4:0,8:4,16:4').split(',')
]
HW = int(os.environ.get('BENCH_HW', '800'))
HW_IN = int(os.environ.get('BENCH_HW_IN', '1024'))
ITERS = int(os.environ.get('BENCH_ITERS', '10'))
ARCH = os.environ.get('BENCH_ARCH', 'swin-large')
DTYPE = os.environ.get('BENCH_DTYPE', 'bfloat16')
# SWEEP_EMIT_MASKS=0 drops the (B,Q,H,W) masks output (id-map-only serving,
# engine/export.py emit_masks) — also shrinks the single compiled program,
# which matters on remote compilers that crash on the full-masks chain
EMIT_MASKS = os.environ.get('SWEEP_EMIT_MASKS', '1') == '1'

cfg = config_for_arch(ARCH, num_labels=5)
model = Mask2Former(cfg, dtype=jnp.dtype(DTYPE))
params = init_params(model, cfg, image_hw=(128, 128))
params = jax.device_put(params)  # steady arg placement from call 1

record = {
    'arch': ARCH, 'hw': HW, 'hw_in': HW_IN, 'dtype': DTYPE, 'iters': ITERS,
    'emit_masks': EMIT_MASKS,
    'platform': jax.devices()[0].platform, 'configs': {},
}
RECORD_PATH = os.environ.get('SWEEP_OUT') or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'records', 'serving_sweep.json'
)

for batch, micro in CONFIGS:
    # params as a TRACED ARGUMENT, not a closure: closed-over params become
    # HLO constants and the remote-compile request then carries the full
    # 830 MB Swin-L weight blob — measured HTTP 413 "length limit exceeded"
    # / broken-pipe failures (records/serving_sweep.json, 2026-08-19). The
    # jax.export artifact path intentionally keeps constants (local
    # lowering, no compile RPC).
    def serve(p, raw, micro=micro):
        return make_serving_fn(
            model, p, out_hw=(HW, HW), threshold=0.5, micro_batch=micro,
            emit_masks=EMIT_MASKS,
        )(raw)

    serve = jax.jit(serve)

    def step(raw, jitter):
        res = serve(params, raw + jitter)
        return res['segmentation'].sum() + res['scores'].sum()

    rng = np.random.default_rng(0)
    raw = jnp.asarray(
        rng.integers(0, 256, size=(batch, HW_IN, HW_IN, 3), dtype=np.uint8)
    )
    t0 = time.perf_counter()
    try:
        float(step(raw, jnp.uint8(0)))
    except Exception as e:
        print(f'b{batch} micro{micro}: FAILED: {type(e).__name__}: {e}'[:300],
              flush=True)
        record['configs'][f'b{batch}_micro{micro}'] = {
            'error': f'{type(e).__name__}: {e}'[:200]
        }
        continue
    compile_s = time.perf_counter() - t0

    for _ in range(2):  # two rounds; report the steady second
        t0 = time.perf_counter()
        delta = jnp.uint8(0)
        for _ in range(ITERS):
            delta = (step(raw, delta) > 1e30).astype(jnp.uint8)
        float(delta)
        dt = time.perf_counter() - t0
    ips = batch * ITERS / dt
    print(
        f'b{batch} micro{micro}: {ips:7.2f} img/s  {1000 * dt / ITERS:7.1f}'
        f' ms/step  (compile {compile_s:.0f}s)', flush=True,
    )
    record['configs'][f'b{batch}_micro{micro}'] = {
        'images_per_sec': round(ips, 2),
        'ms_per_step': round(1000 * dt / ITERS, 1),
        'compile_s': round(compile_s, 0),
    }

import json  # noqa: E402

with open(RECORD_PATH, 'w') as f:
    json.dump(record, f, indent=2)
print(f'record -> {RECORD_PATH}')
