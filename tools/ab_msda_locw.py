"""A/B the MSDA loc/weight gradient: AD-of-packed vs AD-of-fused (value
stopped in both).

The hybrid backward (ops/msda_select.py) currently computes the
locations/weights cotangents by differentiating the PACKED formulation with
the value table held constant (38.5 ms/layer at bench shapes). That choice
came from the full-grad A/B (tools/ab_msda_grad.py) where packed won — but
the full grad includes the value scatter, which the hybrid has since
replaced with dense einsums (ops/msda_transpose.py). With value stopped,
the backward is gathers + elementwise only, and the FUSED formulation's
narrow bf16 rows gather measurably faster than packed's 4×-wide rows
(tools/profile_gather.py) — so the winner may flip.

Correctness first (both formulations compute the same function, so either
VJP is valid for the hybrid), then chained-scalar timing at encoder
self-attention bench shapes (B2, 800² → Q=13294, 4 levels, 8 heads, d32).

Env: B, ITERS, DT.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.ops.msda_fused import msda_fused
from weed_instance_segmentation_tpu.ops.msda_packed import msda_packed

B = int(os.environ.get('B', '2'))
ITERS = int(os.environ.get('ITERS', '8'))
HEADS, D, P = 8, 32, 4
SHAPES = ((100, 100), (50, 50), (25, 25), (13, 13))
L_TOTAL = sum(h * w for h, w in SHAPES)
Q = L_TOTAL
DTYPE = jnp.dtype(os.environ.get('DT', 'bfloat16'))


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    value = jnp.asarray(rng.standard_normal((B, L_TOTAL, HEADS, D)), DTYPE)
    loc = jnp.asarray(rng.random((B, Q, HEADS, len(SHAPES), P, 2)), jnp.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, Q, HEADS, len(SHAPES) * P)), jnp.float32)
    ).reshape(B, Q, HEADS, len(SHAPES), P)
    g = jnp.asarray(rng.standard_normal((B, Q, HEADS * D)), DTYPE)
    return value, loc, aw, g


def locw_grad(form):
    def fn(value, loc, aw, g, jitter):
        _, vjp = jax.vjp(lambda l, a: form(value, SHAPES, l, a), loc + jitter, aw)
        gl, ga = vjp(g)
        return gl, ga, (gl.sum() + ga.sum()) * 1e-9

    return fn


def timeit(name, jfn, *args):
    t0 = time.perf_counter()
    jax.block_until_ready(jfn(*args, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        t0 = time.perf_counter()
        chain = jnp.float32(0.0)
        for _ in range(ITERS):
            chain = jfn(*args, chain)[2]
        float(chain)
        dt = (time.perf_counter() - t0) / ITERS
    print(f'{name:34s} {dt * 1000:8.1f} ms  (compile {compile_s:.0f}s)', flush=True)
    return dt


def main():
    value, loc, aw, g = make_inputs()

    packed = jax.jit(locw_grad(msda_packed))
    fused = jax.jit(locw_grad(msda_fused))

    # correctness: both VJPs agree (small tolerance: bf16 taps, f32 accumulate)
    gl_p, ga_p, _ = packed(value, loc, aw, g, jnp.float32(0.0))
    gl_f, ga_f, _ = fused(value, loc, aw, g, jnp.float32(0.0))
    scale = float(jnp.abs(gl_p).max())
    dl = float(jnp.abs(gl_p - gl_f).max()) / max(scale, 1e-9)
    da = float(jnp.abs(ga_p - ga_f).max()) / max(float(jnp.abs(ga_p).max()), 1e-9)
    print(f'rel agreement: loc {dl:.2e}, weights {da:.2e}', flush=True)

    t_p = timeit('AD-of-packed loc+weight grad', packed, value, loc, aw, g)
    t_f = timeit('AD-of-fused  loc+weight grad', fused, value, loc, aw, g)
    print(f'\nfused/packed: {t_f / t_p:.2f}x  (winner: '
          f'{"fused" if t_f < t_p else "packed"})')


if __name__ == '__main__':
    main()
