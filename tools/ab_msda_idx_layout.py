"""A/B: MSDA gather-index arithmetic layout (VERDICT r5 #2's named lever).

The round-5 trace decomposition (tools/records/forward_trace_decomposition
.json) shows the in-context MSDA forward paying ~7 ms/layer of 'data
formatting' on the gather INDEX arithmetic: XLA propagates the gather
operand's degenerate ``s32[N,1]{0,1:T(1,128)}`` layout (one useful element
per 128-lane vreg) backward into the muls/converts that build the flat
index, scalarizing them (measured 10.8 ms per mul/convert per 3 iters at
b4 — microseconds of real work). Variants:

- fused          — shipped ``ops/msda_fused.msda_fused`` (baseline)
- barrier        — ``optimization_barrier`` between the index arithmetic
                   and ``take``: the arithmetic compiles with natural dense
                   layouts; one relayout copy feeds the gather
- int-barrier    — barrier + integer index math (floor→int32 once per
                   level; per-corner adds/clips in s32, halving converts)
- flat128        — barrier + lane-dense weighted P-reduction: the gather
                   output ``(B·Q·H·P, 32)`` bitcasts to ``(B·Q·H, 128)``
                   (points are fastest-varying in the index layout), the
                   weight broadcast repeats each w_p across its 32 lanes,
                   and the P-sum becomes three static 32-lane slice adds —
                   replacing the ``multiply_reduce_fusion`` over a
                   ``(…, 4, 32)`` minor tile that fills only 12.5% of each
                   (8, 128) vreg (trace finding #2)

Numerics: identical indices and weights by construction (floor/clip on
integer-valued floats commutes with int casts); asserted exact vs fused.

Encoder bench shapes (B, 800² levels), chained-scalar timing (tunnel
rule). Env: B (4), ITERS (10), DTYPE=bf16|f32.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.ops.msda_fused import msda_fused

B = int(os.environ.get('B', '4'))
ITERS = int(os.environ.get('ITERS', '10'))
HEADS, D, P = 8, 32, 4
SHAPES = ((100, 100), (50, 50), (25, 25), (13, 13))
L_TOTAL = sum(h * w for h, w in SHAPES)
Q = L_TOTAL
DTYPE = {'bf16': jnp.bfloat16, 'f32': jnp.float32}[os.environ.get('DTYPE', 'bf16')]


def msda_fused_variant(value, spatial_shapes, sampling_locations,
                       attention_weights, barrier=True, int_idx=False,
                       flat128=False):
    """msda_fused with the index-layout experiments; contract identical."""
    b, l_total, num_heads, head_dim = value.shape
    _, q, _, n_levels, n_points, _ = sampling_locations.shape
    dtype = value.dtype

    table = value.transpose(0, 2, 1, 3).reshape(b * num_heads * l_total, head_dim)
    level_offsets = np.concatenate(
        [[0], np.cumsum([hw[0] * hw[1] for hw in spatial_shapes])]
    )[:-1]
    bh_base = (
        jnp.arange(b * num_heads, dtype=jnp.int32).reshape(b, num_heads) * l_total
    )

    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)

    out = jnp.zeros((b, q, num_heads, head_dim), dtype)
    for level, (hl, wl) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, level]
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        base = bh_base[:, None, :, None] + int(level_offsets[level])
        if int_idx:
            x0i = x0.astype(jnp.int32)
            y0i = y0.astype(jnp.int32)

        for dy in (0, 1):
            yw = jnp.where(dy, wy1, 1.0 - wy1)
            if int_idx:
                iyi = y0i + dy
                y_ok = (iyi >= 0) & (iyi <= hl - 1)
                row = jnp.clip(iyi, 0, hl - 1) * wl
            else:
                iy = y0 + dy
                y_ok = (iy >= 0) & (iy <= hl - 1)
                row = jnp.clip(iy, 0, hl - 1).astype(jnp.int32) * wl
            for dx in (0, 1):
                xw = jnp.where(dx, wx1, 1.0 - wx1)
                if int_idx:
                    ixi = x0i + dx
                    valid = y_ok & (ixi >= 0) & (ixi <= wl - 1)
                    idx = base + row + jnp.clip(ixi, 0, wl - 1)
                else:
                    ix = x0 + dx
                    valid = y_ok & (ix >= 0) & (ix <= wl - 1)
                    idx = base + row + jnp.clip(ix, 0, wl - 1).astype(jnp.int32)
                idx_flat = idx.reshape(-1)
                if barrier:
                    idx_flat = jax.lax.optimization_barrier(idx_flat)
                wgt = (xw * yw * valid
                       * attention_weights[:, :, :, level]).astype(dtype)
                rows2d = jnp.take(table, idx_flat, axis=0, mode='clip')
                if flat128:
                    # (B·Q·H·P, D) → (B·Q·H, P·D): pure bitcast (p fastest)
                    rows128 = rows2d.reshape(b * q * num_heads,
                                             n_points * head_dim)
                    w128 = jnp.repeat(
                        wgt.reshape(-1, n_points), head_dim, axis=1)
                    weighted = rows128 * w128
                    # f32 accumulation matches jnp.sum's bf16→f32 promote
                    acc = sum(
                        weighted[:, p * head_dim:(p + 1) * head_dim]
                        .astype(jnp.float32)
                        for p in range(n_points)
                    ).astype(dtype)
                    out = out + acc.reshape(b, q, num_heads, head_dim)
                else:
                    rows = rows2d.reshape(b, q, num_heads, n_points, head_dim)
                    out = out + (rows * wgt[..., None]).sum(axis=3)

    return out.reshape(b, q, num_heads * head_dim)


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    value = jnp.asarray(rng.standard_normal((B, L_TOTAL, HEADS, D)), DTYPE)
    loc = jnp.asarray(rng.random((B, Q, HEADS, len(SHAPES), P, 2)), jnp.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, Q, HEADS, len(SHAPES) * P)), jnp.float32)
    ).reshape(B, Q, HEADS, len(SHAPES), P)
    return value, loc, aw


def timeit(name, fn, value, loc, aw):
    def step(value, loc, aw, jitter):
        out = fn(value, loc + jitter, aw)
        return out.astype(jnp.float32).sum() * 1e-9

    jfn = jax.jit(step)
    t0 = time.perf_counter()
    float(jfn(value, loc, aw, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    dt = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        chain = jnp.float32(0.0)
        for _ in range(ITERS):
            chain = jfn(value, loc, aw, chain)
        float(chain)
        dt = (time.perf_counter() - t0) / ITERS
    print(f'{name:34s} {dt * 1000:8.1f} ms  (compile {compile_s:.0f}s)', flush=True)
    return dt


def main():
    value, loc, aw = make_inputs()
    ref = np.asarray(msda_fused(value, SHAPES, loc, aw), np.float32)
    for name, kw in (('barrier', dict(barrier=True)),
                     ('int-barrier', dict(barrier=True, int_idx=True)),
                     ('flat128', dict(barrier=True, flat128=True))):
        got = np.asarray(
            msda_fused_variant(value, SHAPES, loc, aw, **kw), np.float32)
        err = np.abs(got - ref).max()
        print(f'{name} vs fused max abs err: {err:.4g}')
        assert err == 0.0, f'{name} changed numerics'

    t1 = timeit('fused gather (shipped)',
                lambda v, l, a: msda_fused(v, SHAPES, l, a), value, loc, aw)
    t2 = timeit('idx barrier',
                lambda v, l, a: msda_fused_variant(v, SHAPES, l, a),
                value, loc, aw)
    t3 = timeit('int idx + barrier',
                lambda v, l, a: msda_fused_variant(v, SHAPES, l, a,
                                                   int_idx=True),
                value, loc, aw)
    t4 = timeit('flat128 + barrier',
                lambda v, l, a: msda_fused_variant(v, SHAPES, l, a,
                                                   flat128=True),
                value, loc, aw)
    print(f'\nbarrier vs shipped: {t1 / t2:.2f}x   '
          f'int+barrier vs shipped: {t1 / t3:.2f}x   '
          f'flat128 vs shipped: {t1 / t4:.2f}x')


if __name__ == '__main__':
    main()
