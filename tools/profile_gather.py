"""Compare MSDA sampling formulations on TPU. Temporary diagnostic.

a) channel-first scalar gathers (current grid_sample path)
b) row gathers: value (N, HW, C), one D-row per corner tap
c) 2x2 patch gathers via lax.gather slice_sizes=(1,2,2,C)
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N, C, H, W = 8, 32, 100, 100  # one (batch, head) set per level-0 map, 8 heads
QP = 13125 * 4  # queries x points at level 0

rng = np.random.default_rng(0)
value_nchw = jnp.asarray(rng.standard_normal((N, C, H, W)), jnp.float32)
value_nhwc = jnp.asarray(value_nchw.transpose(0, 2, 3, 1))
grid = jnp.asarray(rng.random((N, 1, QP, 2)) * 2 - 1, jnp.float32)


def timeit(name, f, *args, iters=5):
    out = f(*args)
    jax.block_until_ready(out)

    def round_():
        t0 = time.perf_counter()
        d = jnp.float32(0.0)
        for _ in range(iters):
            d = d + f(*args).reshape(-1)[0]
        float(d)
        return (time.perf_counter() - t0) / iters

    round_()
    print(f'{name}: {min(round_(), round_()) * 1000:.1f} ms', flush=True)


# --- a) current path -------------------------------------------------------
from weed_instance_segmentation_tpu.ops.grid_sample import grid_sample_bilinear

timeit('a) channel-first grid_sample', jax.jit(grid_sample_bilinear), value_nchw, grid)


# --- b) row gathers on NHWC-flat ------------------------------------------
@jax.jit
def row_gather(value, grid):
    n, h, w, c = value.shape
    flat = value.reshape(n, h * w, c)
    x = ((grid[..., 0] + 1.0) * w - 1.0) / 2.0
    y = ((grid[..., 1] + 1.0) * h - 1.0) / 2.0
    x = x.reshape(n, -1)
    y = y.reshape(n, -1)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx1, wy1 = x - x0, y - y0
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            ix = x0 + dx
            iy = y0 + dy
            valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
            idx = (jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)).astype(jnp.int32)
            rows = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (n, QP, c)
            wgt = (jnp.where(dx, wx1, 1 - wx1) * jnp.where(dy, wy1, 1 - wy1))
            out = out + rows * (wgt * valid)[..., None]
    return out


timeit('b) row gathers NHWC', row_gather, value_nhwc, grid)


# --- c) 2x2 patch gather ----------------------------------------------------
@jax.jit
def patch_gather(value, grid):
    n, h, w, c = value.shape
    x = ((grid[..., 0] + 1.0) * w - 1.0) / 2.0
    y = ((grid[..., 1] + 1.0) * h - 1.0) / 2.0
    x = x.reshape(n, -1)
    y = y.reshape(n, -1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    # clamp start so the 2x2 window stays in bounds; adjust weights for
    # out-of-range taps via validity masks
    sx = jnp.clip(x0, 0, w - 2).astype(jnp.int32)
    sy = jnp.clip(y0, 0, h - 2).astype(jnp.int32)
    starts = jnp.stack([sy, sx], axis=-1)  # (n, QP, 2)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(2, 3, 4),
        collapsed_slice_dims=(),
        start_index_map=(1, 2),
        operand_batching_dims=(0,),
        start_indices_batching_dims=(0,),
    )
    patches = jax.lax.gather(
        value, starts, dnums, slice_sizes=(1, 2, 2, c),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (n, QP, 2, 2, c)

    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            ix = x0 + dx
            iy = y0 + dy
            valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
            # index within the clamped patch
            px = (ix - sx).astype(jnp.int32)  # 0..1 after clamping
            py = (iy - sy).astype(jnp.int32)
            px = jnp.clip(px, 0, 1)
            py = jnp.clip(py, 0, 1)
            tap = jnp.take_along_axis(
                patches.reshape(n, -1, 4, c),
                (py * 2 + px)[..., None, None].astype(jnp.int32),
                axis=2,
            )[:, :, 0]
            wgt = jnp.where(dx, wx1, 1 - wx1) * jnp.where(dy, wy1, 1 - wy1)
            out = out + tap * (wgt * valid)[..., None]
    return out


timeit('c) 2x2 patch gather', patch_gather, value_nhwc, grid)

# sanity: formulations agree
a = grid_sample_bilinear(value_nchw, grid)  # (n, c, 1, QP)
b = row_gather(value_nhwc, grid)
c_ = patch_gather(value_nhwc, grid)
a_t = jnp.transpose(a[:, :, 0, :], (0, 2, 1))
print('b vs a max diff:', float(jnp.abs(b - a_t).max()))
print('c vs a max diff:', float(jnp.abs(c_ - a_t).max()))


# --- e) single flattened table, batch folded into index --------------------
@jax.jit
def flat_gather(value, grid):
    n, h, w, c = value.shape
    flat = value.reshape(n * h * w, c)
    x = ((grid[..., 0] + 1.0) * w - 1.0) / 2.0
    y = ((grid[..., 1] + 1.0) * h - 1.0) / 2.0
    x = x.reshape(n, -1)
    y = y.reshape(n, -1)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx1, wy1 = x - x0, y - y0
    base = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None]
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            ix = x0 + dx
            iy = y0 + dy
            valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
            idx = (jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)).astype(jnp.int32) + base
            rows = jnp.take(flat, idx.reshape(-1), axis=0,
                            mode="clip")
            rows = rows.reshape(n, -1, c)
            wgt = jnp.where(dx, wx1, 1 - wx1) * jnp.where(dy, wy1, 1 - wy1)
            out = out + rows * (wgt * valid)[..., None]
    return out


timeit('e) flat single-table gather (promise_in_bounds)', flat_gather, value_nhwc, grid)
e = flat_gather(value_nhwc, grid)
a2 = grid_sample_bilinear(value_nchw, grid)
print('e vs a max diff:', float(jnp.abs(e - jnp.transpose(a2[:, :, 0, :], (0, 2, 1))).max()))


# --- f) patch-packed rows: one gather per tap, corners in lanes -------------
@jax.jit
def packed_gather(value, grid):
    n, h, w, c = value.shape
    # value_patch[y*w+x] = [V[y,x], V[y,x+1], V[y+1,x], V[y+1,x+1]] (4c lanes)
    v_r = jnp.pad(value, ((0, 0), (0, 1), (0, 1), (0, 0)))  # zero pad edge
    p00 = v_r[:, :h, :w]
    p01 = v_r[:, :h, 1:w + 1]
    p10 = v_r[:, 1:h + 1, :w]
    p11 = v_r[:, 1:h + 1, 1:w + 1]
    patch = jnp.concatenate([p00, p01, p10, p11], axis=-1).reshape(n, h * w, 4 * c)

    x = ((grid[..., 0] + 1.0) * w - 1.0) / 2.0
    y = ((grid[..., 1] + 1.0) * h - 1.0) / 2.0
    x = x.reshape(n, -1)
    y = y.reshape(n, -1)
    x0, y0 = jnp.floor(x), jnp.floor(y)
    wx1, wy1 = x - x0, y - y0
    sx = jnp.clip(x0, 0, w - 1)
    sy = jnp.clip(y0, 0, h - 1)
    idx = (sy * w + sx).astype(jnp.int32)
    rows = jnp.take_along_axis(patch, idx[..., None], axis=1)  # (n, QP, 4c)

    out = 0.0
    k = 0
    for dy in (0, 1):
        for dx in (0, 1):
            ix = x0 + dx
            iy = y0 + dy
            valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
            # after clamping the start, the corner may live in a different
            # lane group; since x0 clamps only when out of range (weight 0),
            # lane group k is correct whenever valid
            wgt = jnp.where(dx, wx1, 1 - wx1) * jnp.where(dy, wy1, 1 - wy1)
            out = out + rows[..., k * c:(k + 1) * c] * (wgt * valid)[..., None]
            k += 1
    return out


timeit('f) patch-packed single gather', packed_gather, value_nhwc, grid)
f_ = packed_gather(value_nhwc, grid)
a3 = grid_sample_bilinear(value_nchw, grid)
print('f vs a max diff:', float(jnp.abs(f_ - jnp.transpose(a3[:, :, 0, :], (0, 2, 1))).max()))
