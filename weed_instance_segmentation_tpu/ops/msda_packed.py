"""Patch-packed MSDA sampling: one gather per tap, 2×2 corners in lanes.

Same semantics as ``msda_reference`` / ``msda_fused``. XLA's TPU gather
cost is per-ROW and nearly flat in row width up to ≥512 B (measured
10.9 ms → 14.0 ms for 4× wider rows on 420k rows), so packing each 2×2
bilinear neighborhood into one 4·D-lane row cuts gather rows 4×:

    P[y·W + x] = [V(y,x) | V(y,x+1) | V(y+1,x) | V(y+1,x+1)]

One gather at the (clamped) top-left corner then yields all four taps as
lane groups. Edge handling: instead of tracking which corner got clamped,
each lane group g at absolute position p_g gets the closed-form bilinear
triangle weight  max(0, 1−|x−p_gx|)·max(0, 1−|y−p_gy|)  masked by p_g
being in range — identical tap weights to the corner formulation for all
interior AND boundary cases (zeros padding semantics).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def msda_packed(
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

    # --- build the patch table per level, concat: (B·H·L_total, 4·D) -------
    level_offsets = np.concatenate(
        [[0], np.cumsum([hw[0] * hw[1] for hw in spatial_shapes])]
    )[:-1]
    tables = []
    start = 0
    for hl, wl in spatial_shapes:
        v = value[:, start : start + hl * wl]  # (B, HW, H, D)
        v = v.transpose(0, 2, 1, 3).reshape(b, num_heads, hl, wl, head_dim)
        vp = jnp.pad(v, ((0, 0), (0, 0), (0, 1), (0, 1), (0, 0)))
        patch = jnp.stack(
            [
                vp[:, :, :hl, :wl],
                vp[:, :, :hl, 1 : wl + 1],
                vp[:, :, 1 : hl + 1, :wl],
                vp[:, :, 1 : hl + 1, 1 : wl + 1],
            ],
            axis=4,
        )  # (B, H, hl, wl, 4, D)
        tables.append(patch.reshape(b, num_heads, hl * wl, 4 * head_dim))
        start += hl * wl
    table = jnp.concatenate(tables, axis=2).reshape(b * num_heads * l_total, 4 * head_dim)

    bh_base = (
        jnp.arange(b * num_heads, dtype=jnp.int32).reshape(b, num_heads) * l_total
    )  # (B, H)

    out = jnp.zeros((b, q, num_heads, head_dim), dtype)
    for level, (hl, wl) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, level]  # (B, Q, H, P, 2)
        x = loc[..., 0] * wl - 0.5
        y = loc[..., 1] * hl - 0.5
        x0c = jnp.clip(jnp.floor(x), 0, wl - 1)
        y0c = jnp.clip(jnp.floor(y), 0, hl - 1)
        idx = (
            bh_base[:, None, :, None]
            + int(level_offsets[level])
            + (y0c * wl + x0c).astype(jnp.int32)
        )  # (B, Q, H, P)
        # layout barrier: keep the index arithmetic off the gather
        # operand's scalarized s32[N,1]{0,1:T(1,128)} layout (same round-5
        # trace finding as ops/msda_fused.py; bit-exact)
        idx_flat = jax.lax.optimization_barrier(idx.reshape(-1))
        rows = jnp.take(table, idx_flat, axis=0, mode='clip').reshape(
            b, q, num_heads, n_points, 4, head_dim
        )

        aw = attention_weights[:, :, :, level]  # (B, Q, H, P)
        acc = 0.0
        for g, (ly, lx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
            px = x0c + lx
            py = y0c + ly
            tri = jnp.maximum(0.0, 1.0 - jnp.abs(x - px)) * jnp.maximum(
                0.0, 1.0 - jnp.abs(y - py)
            )
            in_range = (px <= wl - 1) & (py <= hl - 1)
            wgt = (tri * in_range * aw).astype(dtype)  # (B, Q, H, P)
            acc = acc + rows[:, :, :, :, g] * wgt[..., None]
        out = out + acc.sum(axis=3)

    return out.reshape(b, q, num_heads * head_dim)
