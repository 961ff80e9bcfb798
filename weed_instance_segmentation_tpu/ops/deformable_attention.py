"""Multi-scale deformable attention sampling core (SURVEY.md X4).

Numerics match HF ``multi_scale_deformable_attention``
(HF:modeling_mask2former.py:799-838): per level, bilinear grid-sample of the
per-head value maps at the sampling locations (align_corners=False, zeros
padding), then weighted sum over levels × points.

Implementations with one signature (dispatched by ``ops.msda_select``):
- ``msda_reference``: pure-jnp per-level grid_sample gathers (this file) —
  the parity oracle.
- ``ops.msda_fused.msda_fused``: flat-table gather across all levels, the
  production path (a Pallas kernel was measured and rejected — see the
  decision record at the top of ``ops/msda_fused.py``).
- ``ops.msda_packed.msda_packed``: corner-packed variant, faster for f32.
"""

from __future__ import annotations

import jax.numpy as jnp

from weed_instance_segmentation_tpu.ops.grid_sample import grid_sample_bilinear


def msda_reference(
    value: jnp.ndarray,
    spatial_shapes: tuple,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
) -> jnp.ndarray:
    """
    Args:
        value: (B, L_total, num_heads, head_dim) — per-level feature maps
            flattened and concatenated along L_total.
        spatial_shapes: static tuple of (H_l, W_l) per level.
        sampling_locations: (B, Q, num_heads, num_levels, num_points, 2),
            normalized [0, 1] (x, y).
        attention_weights: (B, Q, num_heads, num_levels, num_points),
            already softmaxed over levels×points.
    Returns:
        (B, Q, num_heads * head_dim)
    """
    b, _, num_heads, head_dim = value.shape
    _, q, _, num_levels, num_points, _ = sampling_locations.shape

    sampling_grids = 2 * sampling_locations - 1
    start = 0
    sampled = []
    for level, (h, w) in enumerate(spatial_shapes):
        # (B, H*W, heads, dim) → (B*heads, dim, H, W)
        v = value[:, start : start + h * w]
        v = v.transpose(0, 2, 3, 1).reshape(b * num_heads, head_dim, h, w)
        # (B, Q, heads, P, 2) → (B*heads, Q, P, 2)
        g = sampling_grids[:, :, :, level].transpose(0, 2, 1, 3, 4).reshape(
            b * num_heads, q, num_points, 2
        )
        sampled.append(grid_sample_bilinear(v, g))  # (B*heads, dim, Q, P)
        start += h * w

    # (B*heads, dim, Q, L, P)
    stacked = jnp.stack(sampled, axis=3)
    weights = attention_weights.transpose(0, 2, 1, 3, 4).reshape(
        b * num_heads, 1, q, num_levels, num_points
    )
    out = (stacked * weights).sum(axis=(3, 4))  # (B*heads, dim, Q)
    out = out.reshape(b, num_heads, head_dim, q).transpose(0, 3, 1, 2)
    return out.reshape(b, q, num_heads * head_dim)
