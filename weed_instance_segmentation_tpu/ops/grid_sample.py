"""Bilinear grid sampling with torch ``F.grid_sample`` parity.

Semantics replicated: ``mode='bilinear', padding_mode='zeros',
align_corners=False`` — the exact call used by both the HF multi-scale
deformable attention (HF:modeling_mask2former.py:823-825) and the point
sampling inside the matcher/loss (HF:modeling_mask2former.py:119 sample_point).

Implementation is pure gathers + FMAs; XLA fuses it into surrounding work.
The Pallas deformable-attention kernel reuses the same math.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_bilinear(value: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.functional.grid_sample(value, grid, mode='bilinear',
    padding_mode='zeros', align_corners=False).

    Args:
        value: (N, C, H, W)
        grid:  (N, Hg, Wg, 2), normalized coords in [-1, 1], last dim (x, y)
    Returns:
        (N, C, Hg, Wg)
    """
    n, c, h, w = value.shape
    x = grid[..., 0]
    y = grid[..., 1]
    # unnormalize (align_corners=False): pixel = ((coord + 1) * size - 1) / 2
    x = ((x + 1.0) * w - 1.0) / 2.0
    y = ((y + 1.0) * h - 1.0) / 2.0

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def gather(ix, iy):
        # zeros padding: out-of-range taps contribute 0
        valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
        ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
        iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
        flat = value.reshape(n, c, h * w)
        idx = iyc * w + ixc  # (N, Hg, Wg)
        g = jnp.take_along_axis(
            flat, idx.reshape(n, 1, -1).astype(jnp.int32), axis=2
        ).reshape(n, c, *ix.shape[1:])
        return g * valid[:, None].astype(value.dtype)

    out = (
        gather(x0, y0) * (wx0 * wy0)[:, None]
        + gather(x1, y0) * (wx1 * wy0)[:, None]
        + gather(x0, y1) * (wx0 * wy1)[:, None]
        + gather(x1, y1) * (wx1 * wy1)[:, None]
    )
    return out.astype(value.dtype)


def sample_points(mask: jnp.ndarray, point_coordinates: jnp.ndarray) -> jnp.ndarray:
    """HF ``sample_point`` twin: sample (N, C, H, W) features at normalized
    [0, 1] point coords (N, P, 2), returning (N, C, P).

    HF adds a dummy dim, calls grid_sample with ``2.0 * coords - 1.0``
    (HF:modeling_mask2former.py:96-126, align_corners=False default).
    """
    grid = 2.0 * point_coordinates - 1.0  # (N, P, 2) in [-1, 1]
    out = grid_sample_bilinear(mask, grid[:, None])  # (N, C, 1, P)
    return out[:, :, 0, :]
