"""A/B: MSDA corner-pair / corner-quad gather (fewer, wider rows).

The round-5 trace decomposition left the MSDA gather fusion at
~31.8 ms/layer vs a ~6 ms flat-table row floor, and `profile_gather.py`
showed XLA's gather is PER-ROW bound and nearly flat in row width up to
512 B. The shipped `ops/msda_fused.py` issues 16 gathers/layer (4 levels
x 4 corners) of (B*Q*H*P) rows x 64 B. If rows are the cost, packing
neighboring taps into one wider row should pay:

- pair  — per level, a (rows, 2D) table whose row i is
          [v(i), v(i+1)] (x-neighbors are contiguous in the flat y*W+x
          order). Each (y-corner, sample) needs ONE 128 B row instead of
          two 64 B rows: 8 gathers/layer, half the rows.
- quad  — per level, a (rows, 4D) table whose row i is
          [v(i), v(i+1), v(i+W), v(i+W+1)] — the full 2x2 bilinear
          footprint in one 256 B row: 4 gathers/layer, a quarter of the
          rows.

Border semantics stay EXACT: the top-left row/col index is clamped to
[0, W-2] so the widened row never crosses a y-row / level / batch-head
segment, and each of the shipped form's four corner weights (already
validity-zeroed) is routed to whichever widened-row slot its CLAMPED tap
column lands in. At most one nonzero weight routes per slot, and the
extra terms are exact +0 adds, so the result is bit-identical to
`msda_fused` (asserted below, f32 and bf16).

Upstream semantics being preserved: HF multi_scale_deformable_attention
(modeling_mask2former.py:799-838), already parity-tested against
`ops/msda_fused.py`.

Encoder bench shapes, chained-scalar timing (tunnel rule: a data
dependency must link iterations). Env: B (4), ITERS (10), DTYPE=bf16|f32.
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


def _level_tables(value, spatial_shapes, mode):
    """Per-level widened gather tables.

    Returns a list over levels of (table, row_width_mult) where table is
    (B*H*hl*wl, mult*D): mult=2 packs x-neighbors [v(i), v(i+1)], mult=4
    packs the 2x2 footprint [v(i), v(i+1), v(i+W), v(i+W+1)]. Shifts run
    over the flat (B*H*hl*wl) axis; rows whose shift crosses a y-row or
    batch-head boundary are only reachable from clamped top-left indices
    that never select them, so the tail padding is inert.
    """
    b, l_total, num_heads, head_dim = value.shape
    tables = []
    off = 0
    for hl, wl in spatial_shapes:
        lvl = value[:, off:off + hl * wl]  # (B, hl*wl, H, D)
        off += hl * wl
        flat = lvl.transpose(0, 2, 1, 3).reshape(b * num_heads * hl * wl,
                                                 head_dim)
        if mode == 'pair':
            shifted = jnp.concatenate([flat[1:], flat[-1:]], axis=0)
            tables.append(jnp.concatenate([flat, shifted], axis=1))
        else:  # quad
            pad = jnp.pad(flat, ((0, wl + 1), (0, 0)))
            n = flat.shape[0]
            quad = jnp.concatenate(
                [pad[0:n], pad[1:n + 1], pad[wl:n + wl], pad[wl + 1:n + wl + 1]],
                axis=1)
            tables.append(quad)
    return tables


def msda_packed_rows(value, spatial_shapes, sampling_locations,
                     attention_weights, mode='quad'):
    """msda_fused contract; pair/quad widened-row gathers, bit-exact."""
    b, l_total, num_heads, head_dim = value.shape
    _, q, _, n_levels, n_points, _ = sampling_locations.shape
    dtype = value.dtype

    tables = _level_tables(value, spatial_shapes, mode)
    bh = jnp.arange(b * num_heads, dtype=jnp.int32).reshape(b, num_heads)

    sampling_locations = sampling_locations.astype(jnp.float32)
    attention_weights = attention_weights.astype(jnp.float32)

    out = jnp.zeros((b, q, num_heads, head_dim), dtype)
    for level, (hl, wl) in enumerate(spatial_shapes):
        assert hl >= 2 and wl >= 2, 'widened-row tables need >=2 rows/cols'
        table = tables[level]
        base = (bh * (hl * wl))[:, None, :, None]  # (B,1,H,1)
        loc = sampling_locations[:, :, :, level]
        aw = attention_weights[:, :, :, level]
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx1 = x - x0
        wy1 = y - y0
        # clamped top-left of the widened footprint
        rc = jnp.clip(x0, 0, wl - 2)            # f32, integer-valued
        rci = rc.astype(jnp.int32)

        def corner_w(dy, dx):
            iy = y0 + dy
            ix = x0 + dx
            yw = jnp.where(dy, wy1, 1.0 - wy1)
            xw = jnp.where(dx, wx1, 1.0 - wx1)
            valid = ((iy >= 0) & (iy <= hl - 1) & (ix >= 0) & (ix <= wl - 1))
            return xw * yw * valid * aw  # shipped-order product

        def col_route(dx, slot):
            # does corner x0+dx clamp onto widened column rc+slot?
            return jnp.clip(x0 + dx, 0, wl - 1) == rc + slot

        if mode == 'pair':
            for dy in (0, 1):
                iy = y0 + dy
                row = jnp.clip(iy, 0, hl - 1).astype(jnp.int32) * wl
                idx = base + row + rci
                idx_flat = jax.lax.optimization_barrier(idx.reshape(-1))
                rows = jnp.take(table, idx_flat, axis=0, mode='clip').reshape(
                    b, q, num_heads, n_points, 2, head_dim)
                # per-slot reduction over the SAME (B,Q,H,P,D) shape as the
                # shipped form so XLA compiles the identical reduce order
                # (a joint (P,2) reduce reorders bf16 accumulation)
                for s in (0, 1):
                    w = sum(corner_w(dy, dx) * col_route(dx, s)
                            for dx in (0, 1)).astype(dtype)  # (B,Q,H,P)
                    out = out + (rows[..., s, :] * w[..., None]).sum(axis=3)
        else:  # quad
            rr = jnp.clip(y0, 0, hl - 2)
            rri = rr.astype(jnp.int32)

            def row_route(dy, slot):
                return jnp.clip(y0 + dy, 0, hl - 1) == rr + slot

            idx = base + rri * wl + rci
            idx_flat = jax.lax.optimization_barrier(idx.reshape(-1))
            rows = jnp.take(table, idx_flat, axis=0, mode='clip').reshape(
                b, q, num_heads, n_points, 4, head_dim)
            for si, (sy, sx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                w = sum(corner_w(dy, dx)
                        * (row_route(dy, sy) & col_route(dx, sx))
                        for dy in (0, 1) for dx in (0, 1)).astype(dtype)
                out = out + (rows[..., si, :] * w[..., None]).sum(axis=3)

    return out.reshape(b, q, num_heads * head_dim)


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    value = jnp.asarray(rng.standard_normal((B, L_TOTAL, HEADS, D)), DTYPE)
    loc = jnp.asarray(rng.random((B, Q, HEADS, len(SHAPES), P, 2)), jnp.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, Q, HEADS, len(SHAPES) * P)),
                    jnp.float32)
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
    print(f'{name:34s} {dt * 1000:8.1f} ms  (compile {compile_s:.0f}s)',
          flush=True)
    return dt


def main():
    value, loc, aw = make_inputs()
    # border-stressing locations: push ~25% of samples outside [0,1)
    loc = loc * 1.5 - 0.25
    # numerics: bit-exact in f32 (same taps, weights, and reduce shapes);
    # at bf16 the widened-row slice changes XLA's 4-element accumulation
    # order, so the bar there is a small rounding tolerance instead.
    # Jitted (eager dispatch through the axon tunnel is a per-op RTT and
    # never finishes at bench shapes); SKIP_NUMERICS=1 for timing-only runs
    # (the CPU CI run of this script covers the asserts).
    if os.environ.get('SKIP_NUMERICS', '0') != '1':
        @jax.jit
        def errs(value, loc, aw):
            vf32 = value.astype(jnp.float32)
            ref32 = msda_fused(vf32, SHAPES, loc, aw)
            ref = msda_fused(value, SHAPES, loc, aw).astype(jnp.float32)
            out = {}
            for mode in ('pair', 'quad'):
                g32 = msda_packed_rows(vf32, SHAPES, loc, aw, mode=mode)
                g = msda_packed_rows(value, SHAPES, loc, aw,
                                     mode=mode).astype(jnp.float32)
                out[mode] = (jnp.abs(g32 - ref32).max(),
                             jnp.abs(g - ref).max())
            return out
        for mode, (err32, err) in errs(value, loc, aw).items():
            err32, err = float(err32), float(err)
            print(f'{mode} vs fused max abs err: f32 {err32:.4g}  '
                  f'{np.dtype(DTYPE).name} {err:.4g}', flush=True)
            # eager (op-by-op) f32 comparison is bit-exact — verified on
            # CPU; under one jit program XLA reassociates shared
            # subexpressions across the two formulations, leaving ~4e-7
            assert err32 <= 1e-5, f'{mode} changed numerics (f32 band)'
            assert err <= 0.05, f'{mode} beyond bf16 reduce-order tolerance'

    t1 = timeit('fused gather (shipped)',
                lambda v, l, a: msda_fused(v, SHAPES, l, a), value, loc, aw)
    t2 = timeit('pair rows (2 corners/row)',
                lambda v, l, a: msda_packed_rows(v, SHAPES, l, a, 'pair'),
                value, loc, aw)
    t3 = timeit('quad rows (4 corners/row)',
                lambda v, l, a: msda_packed_rows(v, SHAPES, l, a, 'quad'),
                value, loc, aw)
    print(f'\npair vs shipped: {t1 / t2:.2f}x   quad vs shipped: {t1 / t3:.2f}x')


if __name__ == '__main__':
    main()
