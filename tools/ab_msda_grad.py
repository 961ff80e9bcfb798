"""A/B the BACKWARD of the two MSDA formulations (fused flat-table vs
patch-packed) at pixel-decoder scale.

The forward choice (ops/msda_select.py) was measured forward-only; training
cares about the transpose: fused's backward scatters 12×(B·Q·H·P) rows per
layer (3 levels × 4 corners), packed's scatters 3×(B·Q·H·P) rows of 4×
width plus dense shifted adds. Env: B, HW (input image side), DT, ITERS.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.ops.msda_fused import msda_fused
from weed_instance_segmentation_tpu.ops.msda_packed import msda_packed

B = int(os.environ.get('B', '2'))
HW = int(os.environ.get('HW', '800'))
DT = jnp.dtype(os.environ.get('DT', 'bfloat16'))
ITERS = int(os.environ.get('ITERS', '8'))
HEADS, HEAD_DIM, POINTS = 8, 32, 4

# pixel-decoder levels: strides 8/16/32 of the /32-padded input
side = (HW + 31) // 32 * 32
shapes = tuple((side // s, side // s) for s in (8, 16, 32))
L = sum(h * w for h, w in shapes)
Q = L  # encoder self-attention: every token is a query

rng = np.random.default_rng(0)
value = jnp.asarray(rng.standard_normal((B, L, HEADS, HEAD_DIM)), DT)
loc = jnp.asarray(rng.uniform(0, 1, (B, Q, HEADS, len(shapes), POINTS, 2)), jnp.float32)
w = jax.nn.softmax(
    jnp.asarray(rng.standard_normal((B, Q, HEADS, len(shapes), POINTS)), jnp.float32),
    axis=-1,
)


def bench(name, op):
    def loss(value, loc, w):
        return op(value, shapes, loc, w).astype(jnp.float32).sum()

    # the tunneled backend enqueues without executing unless a data
    # dependency chains iterations (block_until_ready alone mis-measures;
    # see bench.py): fold a scalar of each grad into the next input
    @jax.jit
    def g(value, loc, w, jitter):
        gv, gl, gw = jax.grad(loss, argnums=(0, 1, 2))(value + jitter, loc, w)
        s = gv.astype(jnp.float32).mean() + gl.mean() + gw.mean()
        return (s > 1e30).astype(DT)

    t0 = time.perf_counter()
    float(g(value, loc, w, jnp.zeros((), DT)))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        t0 = time.perf_counter()
        jit = jnp.zeros((), DT)
        for _ in range(ITERS):
            jit = g(value, loc, w, jit)
        float(jit)
        dt = (time.perf_counter() - t0) / ITERS
    print(f'{name:22s} grad: {dt * 1000:8.1f} ms/layer  (compile {compile_s:.0f}s)',
          flush=True)
    return dt


t_fused = bench('fused flat-table', msda_fused)
t_packed = bench('patch-packed', msda_packed)
print(f'\npacked/fused grad ratio: {t_packed / t_fused:.2f} (B={B}, {HW}², {DT})')
