"""Dtype-aware MSDA formulation selection.

Measured on v5e (B=4, 800×800 pixel-decoder scale, one encoder layer):

| dtype | flat-table fused | patch-packed |
|---|---|---|
| bfloat16 | **70.5 ms** | 105.3 ms |
| float32 | 365.8 ms | **131.3 ms** |

XLA's gather behaves very differently per dtype here: bf16 rows gather
~5× faster than f32 in the fused form, while f32 prefers 4× fewer rows of
4× width (the packed form). Both match the reference to ~2e-6 in f32.
"""

from __future__ import annotations

import jax.numpy as jnp

from weed_instance_segmentation_tpu.ops.msda_fused import msda_fused
from weed_instance_segmentation_tpu.ops.msda_packed import msda_packed


def msda(value, spatial_shapes, sampling_locations, attention_weights):
    if value.dtype == jnp.bfloat16:
        return msda_fused(value, spatial_shapes, sampling_locations, attention_weights)
    return msda_packed(value, spatial_shapes, sampling_locations, attention_weights)
