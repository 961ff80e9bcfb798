"""MSDA formulation selection: fastest forward per dtype, fastest transpose
always.

Forward, measured on v5e (B=4, 800×800 pixel-decoder scale, one encoder
layer):

| dtype | flat-table fused | patch-packed |
|---|---|---|
| bfloat16 | **70.5 ms** | 105.3 ms |
| float32 | 365.8 ms | **131.3 ms** |

XLA's gather behaves very differently per dtype here: bf16 rows gather
~5× faster than f32 in the fused form, while f32 prefers 4× fewer rows of
4× width (the packed form). Both match the reference to ~2e-6 in f32.

Backward (tools/ab_msda_grad.py, B=2, 800², bf16): grad-of-fused
**201.6 ms/layer** vs grad-of-packed **132.2 ms/layer** — the fused
transpose scatters 12×(B·Q·H·P) rows per layer (3 levels × 4 corners)
while packed's scatters 3× that row count at 4× width plus dense shifted
adds, and TPU scatter cost is per-row. Since both formulations compute the
same function, the packed VJP is a valid VJP of the fused primal — so the
bf16 path wraps the fused forward in a ``custom_vjp`` whose backward is
``jax.vjp`` over the packed formulation: fastest primal for inference and
the forward pass, fastest transpose for training. Measured on the full
train step (Swin-L 800² b2 bf16): 1910 → 1533 ms/step.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from weed_instance_segmentation_tpu.ops.msda_fused import msda_fused
from weed_instance_segmentation_tpu.ops.msda_packed import msda_packed


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _msda_hybrid(value, spatial_shapes, sampling_locations, attention_weights):
    return msda_fused(value, spatial_shapes, sampling_locations, attention_weights)


def _msda_hybrid_fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = msda_fused(value, spatial_shapes, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _msda_hybrid_bwd(spatial_shapes, residuals, g):
    value, sampling_locations, attention_weights = residuals
    _, vjp = jax.vjp(
        lambda v, loc, w: msda_packed(v, spatial_shapes, loc, w),
        value, sampling_locations, attention_weights,
    )
    return vjp(g)


_msda_hybrid.defvjp(_msda_hybrid_fwd, _msda_hybrid_bwd)


def msda(value, spatial_shapes, sampling_locations, attention_weights):
    if value.dtype == jnp.bfloat16:
        return _msda_hybrid(value, spatial_shapes, sampling_locations, attention_weights)
    return msda_packed(value, spatial_shapes, sampling_locations, attention_weights)
