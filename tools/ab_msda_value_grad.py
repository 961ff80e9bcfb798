"""A/B the MSDA value-transpose: AD-of-packed (scatter-add, the current
hybrid backward) vs a dense separable-einsum formulation (no scatter).

grad_V[y,x,d] = Σ_s a[s]·wy[s,y]·wx[s,x]·g[s,d] — the same tri-weight
trick as losses/criterion.py::_sample_points_einsum, per (batch, head,
level), chunked over the sample axis so the (S, W, D) intermediate stays
~50 MB.

Measures, at encoder self-attention bench shapes (B2, 800² → Q=13294,
4 levels, 8 heads, d32):
  1. full AD grad of msda_packed (value+locations+weights) — baseline
  2. AD grad wrt (locations, weights) only, value stopped (gather-only bwd)
  3. einsum value-grad (the candidate replacement for 1 = 2 + 3)
and checks 3 == AD value-grad to f32 tolerance on a small case first.

Chained-scalar timing (tunnel-safe). Env: B, ITERS, CHUNK.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.ops.msda_packed import msda_packed

B = int(os.environ.get('B', '2'))
ITERS = int(os.environ.get('ITERS', '8'))
CHUNK = int(os.environ.get('CHUNK', '8192'))
HEADS, D, P = 8, 32, 4
SHAPES = ((100, 100), (50, 50), (25, 25), (13, 13))
L_TOTAL = sum(h * w for h, w in SHAPES)
Q = L_TOTAL
DTYPE = jnp.bfloat16


from weed_instance_segmentation_tpu.ops.msda_transpose import (  # noqa: E402
    msda_value_grad_einsum as _vg,
)


PRECISION = os.environ.get('PRECISION', 'high')


def msda_value_grad_einsum(spatial_shapes, sampling_locations, attention_weights,
                           g, chunk=CHUNK):
    return _vg(spatial_shapes, sampling_locations, attention_weights, g, DTYPE,
               chunk=chunk, precision=PRECISION)


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    value = jnp.asarray(rng.standard_normal((B, L_TOTAL, HEADS, D)), DTYPE)
    loc = jnp.asarray(rng.random((B, Q, HEADS, len(SHAPES), P, 2)), jnp.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, Q, HEADS, len(SHAPES) * P)), jnp.float32)
    ).reshape(B, Q, HEADS, len(SHAPES), P)
    g = jnp.asarray(rng.standard_normal((B, Q, HEADS * D)), DTYPE)
    return value, loc, aw, g


def timeit(name, jfn, *args):
    t0 = time.perf_counter()
    float(jfn(*args, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        t0 = time.perf_counter()
        chain = jnp.float32(0.0)
        for _ in range(ITERS):
            chain = jfn(*args, chain)
        float(chain)
        dt = (time.perf_counter() - t0) / ITERS
    print(f'{name:34s} {dt * 1000:8.1f} ms  (compile {compile_s:.0f}s)', flush=True)
    return dt


def main():
    value, loc, aw, g = make_inputs()

    def full_grad(value, loc, aw, jitter):
        _, vjp = jax.vjp(
            lambda v, l, a: msda_packed(v, SHAPES, l, a), value, loc + jitter, aw
        )
        gv, gl, ga = vjp(g)
        return (gv.astype(jnp.float32).sum() + gl.sum() + ga.sum()) * 1e-9

    def locw_grad(value, loc, aw, jitter):
        _, vjp = jax.vjp(
            lambda l, a: msda_packed(value, SHAPES, l, a), loc + jitter, aw
        )
        gl, ga = vjp(g)
        return (gl.sum() + ga.sum()) * 1e-9

    def val_grad_einsum(value, loc, aw, jitter):
        gv = msda_value_grad_einsum(SHAPES, loc + jitter, aw, g)
        return gv.astype(jnp.float32).sum() * 1e-9

    t1 = timeit('AD full grad (baseline)', jax.jit(full_grad), value, loc, aw)
    t2 = timeit('AD loc+weight grad (value stop)', jax.jit(locw_grad), value, loc, aw)
    t3 = timeit('einsum value grad', jax.jit(val_grad_einsum), value, loc, aw)
    print(
        f'\nhybrid candidate (2+3): {(t2 + t3) * 1000:.1f} ms '
        f'vs baseline {t1 * 1000:.1f} ms'
    )


if __name__ == '__main__':
    main()
