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
adds, and TPU scatter cost is per-row. Since every formulation computes
the same function, any formulation's VJP is a valid VJP of any primal —
so ``msda`` wraps the fastest per-dtype forward in a ``custom_vjp`` whose
backward splits by output (tools/ab_msda_value_grad.py, same config):

- locations/weights grads: ``jax.vjp`` of the packed formulation with the
  value table held constant — gathers only, 38.5 ms/layer;
- value grad: dense separable einsums (``msda_transpose``) — MXU matmuls
  instead of the ~425k-row scatter-add, 16.2 ms/layer.

Total 54.7 ms/layer vs 146.1 for AD-of-packed (2.67×); full-step numbers
in tools/README.md.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from weed_instance_segmentation_tpu.ops.msda_fused import msda_fused
from weed_instance_segmentation_tpu.ops.msda_packed import msda_packed
from weed_instance_segmentation_tpu.ops.msda_transpose import msda_value_grad_einsum


def _msda_primal(value, spatial_shapes, sampling_locations, attention_weights):
    # fastest forward per dtype (table above); dtype is trace-time static
    if value.dtype == jnp.bfloat16:
        return msda_fused(value, spatial_shapes, sampling_locations, attention_weights)
    return msda_packed(value, spatial_shapes, sampling_locations, attention_weights)


@partial(jax.custom_vjp, nondiff_argnums=(1,))
def _msda_hybrid(value, spatial_shapes, sampling_locations, attention_weights):
    return _msda_primal(value, spatial_shapes, sampling_locations, attention_weights)


def _msda_hybrid_fwd(value, spatial_shapes, sampling_locations, attention_weights):
    out = _msda_primal(value, spatial_shapes, sampling_locations, attention_weights)
    return out, (value, sampling_locations, attention_weights)


def _msda_hybrid_bwd(spatial_shapes, residuals, g):
    value, sampling_locations, attention_weights = residuals
    # locations/weights grads: AD with the value table held constant — the
    # backward is then gathers only, so the fastest-gathering formulation
    # per dtype wins, same dispatch as the forward. For bf16 that's fused
    # (narrow rows): 40.1 vs 43.0 ms/layer at bench shapes
    # (tools/ab_msda_locw.py; packed won the *full*-grad A/B only because
    # of its cheaper value scatter, which msda_transpose has replaced).
    _, vjp = jax.vjp(
        lambda loc, w: _msda_primal(value, spatial_shapes, loc, w),
        sampling_locations, attention_weights,
    )
    g_loc, g_w = vjp(g)
    # value grad: dense separable einsums, no scatter (msda_transpose —
    # measured 2.67× over AD-of-packed, tools/ab_msda_value_grad.py)
    g_value = msda_value_grad_einsum(
        spatial_shapes, sampling_locations, attention_weights, g, value.dtype
    )
    return g_value, g_loc, g_w


_msda_hybrid.defvjp(_msda_hybrid_fwd, _msda_hybrid_bwd)


def msda(value, spatial_shapes, sampling_locations, attention_weights):
    return _msda_hybrid(value, spatial_shapes, sampling_locations, attention_weights)
