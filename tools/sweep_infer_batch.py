"""Inference batch sweep: img/s/chip vs batch size at the bench config.

The bench default is b4 (BENCH_r01 lineage); this measures whether larger
batches amortize per-dispatch/tunnel overhead and fixed per-step work on
the v5e. One compile per batch size (4-10 min each through the tunnel), so
run with a generous timeout and keep the list short. Timing uses the
chained-scalar pattern (see tools/README.md) — block_until_ready alone
mis-measures through the tunneled backend.

Env: SWEEP_BATCHES (comma list, default "2,4,8"), BENCH_HW, BENCH_HW_IN,
BENCH_ARCH, BENCH_DTYPE, BENCH_ITERS as in bench.py.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.engine.model_utils import config_for_arch, init_params
from weed_instance_segmentation_tpu.engine.steps import make_forward_fn
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former
from weed_instance_segmentation_tpu.processing.fused import fused_preprocess

BATCHES = [int(b) for b in os.environ.get('SWEEP_BATCHES', '2,4,8').split(',')]
HW = int(os.environ.get('BENCH_HW', '800'))
HW_IN = int(os.environ.get('BENCH_HW_IN', '1024'))
ITERS = int(os.environ.get('BENCH_ITERS', '10'))
ARCH = os.environ.get('BENCH_ARCH', 'swin-large')
DTYPE = os.environ.get('BENCH_DTYPE', 'bfloat16')

cfg = config_for_arch(ARCH, num_labels=5)
model = Mask2Former(cfg, dtype=jnp.dtype(DTYPE))
params = init_params(model, cfg, image_hw=(128, 128))
forward = make_forward_fn(model)


@jax.jit
def reduce_out(out):
    return out.class_queries_logits.mean() + out.masks_queries_logits.mean()


def step(params, raw, jitter):
    pixel_values, _ = fused_preprocess(raw + jitter, (HW, HW), (HW, HW))
    return reduce_out(forward(params, pixel_values))


for batch in BATCHES:
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, size=(batch, HW_IN, HW_IN, 3), dtype=np.uint8))
    t0 = time.perf_counter()
    try:
        float(step(params, raw, jnp.uint8(0)))
    except Exception as e:
        print(f'b{batch}: FAILED compile/run: {type(e).__name__}: {e}'[:300], flush=True)
        continue
    compile_s = time.perf_counter() - t0

    for _ in range(2):  # two rounds; report the steady second
        t0 = time.perf_counter()
        delta = jnp.uint8(0)
        for _ in range(ITERS):
            delta = (step(params, raw, delta) > 1e30).astype(jnp.uint8)
        float(delta)
        dt = time.perf_counter() - t0
    ips = batch * ITERS / dt
    print(
        f'b{batch}: {ips:7.2f} img/s  {1000 * dt / ITERS:7.1f} ms/step'
        f'  (compile {compile_s:.0f}s)', flush=True,
    )
