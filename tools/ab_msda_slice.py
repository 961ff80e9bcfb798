"""A/B the MSDA forward gather formulations: fused flat-table (4 gathers
of D-wide rows), packed patch-table (1 gather of 4·D rows, 4× table
materialization), and slice-gather (1 lax.gather of a (2, 2·D) slice,
no patch table — msda_slice below).

MEASURED REJECTION (v5e-1, encoder bench shapes B2, 800² → Q=13294,
4 levels, 8 heads, d32, bf16): fused 42.1 ms/layer, packed 69.5,
slice-gather **6050** — XLA:TPU scalarizes multi-dimensional gather
slices (each (2, 2·D) slice becomes per-slice serial work) instead of
lowering them like the flat per-row gather. The 4-corners-in-one-row
trick only pays when the packing is materialized (msda_packed, which
wins for f32 where rows are 4× wider); for bf16 the 4-separate-gathers
fused form remains the floor.

Chained-scalar timing (tunnel-safe). Env: B, ITERS, DTYPE=bf16|f32.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.ops.msda_fused import msda_fused
from weed_instance_segmentation_tpu.ops.msda_packed import msda_packed

B = int(os.environ.get('B', '2'))
ITERS = int(os.environ.get('ITERS', '10'))
HEADS, D, P = 8, 32, 4
SHAPES = ((100, 100), (50, 50), (25, 25), (13, 13))
L_TOTAL = sum(h * w for h, w in SHAPES)
Q = L_TOTAL
DTYPE = {'bf16': jnp.bfloat16, 'f32': jnp.float32}[os.environ.get('DTYPE', 'bf16')]


def msda_slice(
    value: jnp.ndarray,
    spatial_shapes: tuple,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """Contract of ``msda_reference``: value (B, L, H, D), locations
    (B, Q, H, LVL, P, 2) in [0,1], weights (B, Q, H, LVL, P) → (B, Q, H·D)."""
    b, l_total, num_heads, head_dim = value.shape
    _, q, _, n_levels, n_points, _ = sampling_locations.shape
    dtype = value.dtype

    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )

    out = jnp.zeros((b, q, num_heads, head_dim), dtype)
    start = 0
    for level, (hl, wl) in enumerate(spatial_shapes):
        v = value[:, start : start + hl * wl]  # (B, HW, H, D)
        start += hl * wl
        v = v.transpose(0, 2, 1, 3).reshape(b, num_heads, hl, wl, head_dim)
        # one pad row + col: the clamped top-left keeps y0+1/x0+1 in range
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        table = vp.reshape(b * num_heads * (hl + 1), (wl + 1) * head_dim)

        loc = sampling_locations[:, :, :, level]  # (B, Q, H, P, 2)
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0c = jnp.clip(jnp.floor(x), 0, wl - 1)
        y0c = jnp.clip(jnp.floor(y), 0, hl - 1)

        bh = jnp.arange(b * num_heads, dtype=jnp.int32).reshape(b, 1, num_heads, 1)
        row = bh * (hl + 1) + y0c.astype(jnp.int32)  # (B, Q, H, P)
        col = x0c.astype(jnp.int32) * head_dim
        starts = jnp.stack([row, col], axis=-1).reshape(-1, 2)

        rows = jax.lax.gather(
            table,
            starts,
            dimension_numbers=dnums,
            slice_sizes=(2, 2 * head_dim),
            mode=jax.lax.GatherScatterMode.CLIP,
        ).reshape(b, q, num_heads, n_points, 2, 2, head_dim)

        aw = attention_weights[:, :, :, level]  # (B, Q, H, P)
        acc = 0.0
        for ly in (0, 1):
            py = y0c + ly
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(y - py)) * (py <= hl - 1)
            for lx in (0, 1):
                px = x0c + lx
                tri = wy * jnp.maximum(0.0, 1.0 - jnp.abs(x - px)) * (px <= wl - 1)
                wgt = (tri * aw).astype(dtype)  # (B, Q, H, P)
                acc = acc + rows[:, :, :, :, ly, lx] * wgt[..., None]
        out = out + acc.sum(axis=3)

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
    ref = np.asarray(msda_packed(value, SHAPES, loc, aw), np.float32)
    out = np.asarray(msda_slice(value, SHAPES, loc, aw), np.float32)
    err = np.abs(out - ref).max()
    print(f'slice vs packed max abs err: {err:.4g}')
    assert err == 0.0

    t1 = timeit('fused (4 gathers, D rows)', lambda v, l, a: msda_fused(v, SHAPES, l, a), value, loc, aw)
    t2 = timeit('packed (1 gather, 4D patch rows)', lambda v, l, a: msda_packed(v, SHAPES, l, a), value, loc, aw)
    t3 = timeit('slice  (1 gather, (2,2D) slice)', lambda v, l, a: msda_slice(v, SHAPES, l, a), value, loc, aw)
    print(f'\nslice vs best-of-current: {min(t1, t2) / t3:.2f}x')


if __name__ == '__main__':
    main()
