"""Scatter-free MSDA value-transpose via dense separable einsums.

The gradient of multi-scale deformable attention (HF:799-986 semantics)
with respect to the value table is, per (batch, head, level),

    grad_V[y, x, d] = Σ_s a[s] · wy[s, y] · wx[s, x] · g[s, d]

over the flattened sample axis s = (query, point), where wx/wy are the
bilinear tri-weight rows ``relu(1 − |x_s − cell|)`` — exactly 2 nonzeros
each, zero beyond the border (grid_sample zeros-padding semantics, same
trick as ``losses.criterion._sample_points_einsum``). Autodiff of any
gather formulation realizes this as a scatter-add over ~425k rows per
encoder layer, which TPUs execute row-serially; expressed as two dense
contractions it is MXU work instead. Measured on v5e-1 at encoder
self-attention bench shapes (B2, 800², 8 heads, d32): AD-of-packed full
grad 146.1 ms/layer → 38.5 (loc+weight AD, value stopped) + 16.2 (this
transpose) = 54.7 ms/layer — 2.67× (tools/ab_msda_value_grad.py).

The sample axis is processed in chunks under ``lax.scan`` so the
(chunk, W, D) intermediate stays ~50 MB — the remote compile helper
rejects large-liveness programs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def msda_value_grad_einsum(
    spatial_shapes: tuple,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    g: jnp.ndarray,
    out_dtype,
    chunk: int = 8192,
    precision: str = 'high',
) -> jnp.ndarray:
    """Cotangent g (B, Q, H·D) → grad wrt value (B, L_total, H, D).

    locations (B, Q, H, LVL, P, 2) in [0,1], weights (B, Q, H, LVL, P) —
    the contract of ``msda_packed``/``msda_fused``. Weights and tri factors
    are cast to ``out_dtype`` before the contraction, mirroring the packed
    formulation's ``wgt.astype(dtype)``; accumulation is f32.
    """
    b, q, _ = g.shape
    heads = attention_weights.shape[2]
    d = g.shape[-1] // heads
    n_points = attention_weights.shape[-1]
    g = g.reshape(b, q, heads, d)
    # sample axis S = Q·P per (B, H); the cotangent row repeats per point
    gq = jnp.broadcast_to(
        g.transpose(0, 2, 1, 3)[:, :, :, None, :], (b, heads, q, n_points, d)
    ).reshape(b, heads, q * n_points, d)

    s = q * n_points
    chunk = min(chunk, s)
    n_chunks = -(-s // chunk)
    pad = n_chunks * chunk - s

    out_levels = []
    for level, (hl, wl) in enumerate(spatial_shapes):
        loc = sampling_locations[:, :, :, level].astype(jnp.float32)
        x = (loc[..., 0] * wl - 0.5).transpose(0, 2, 1, 3).reshape(b, heads, s)
        y = (loc[..., 1] * hl - 0.5).transpose(0, 2, 1, 3).reshape(b, heads, s)
        a = attention_weights[:, :, :, level].astype(jnp.float32)
        a = a.transpose(0, 2, 1, 3).reshape(b, heads, s)

        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
            y = jnp.pad(y, ((0, 0), (0, 0), (0, pad)))
            a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))  # a=0 → no contribution
            gqp = jnp.pad(gq, ((0, 0), (0, 0), (0, pad), (0, 0)))
        else:
            gqp = gq
        xc = x.reshape(b, heads, n_chunks, chunk).transpose(2, 0, 1, 3)
        yc = y.reshape(b, heads, n_chunks, chunk).transpose(2, 0, 1, 3)
        ac = a.reshape(b, heads, n_chunks, chunk).transpose(2, 0, 1, 3)
        gc = gqp.reshape(b, heads, n_chunks, chunk, d).transpose(2, 0, 1, 3, 4)

        cols = jnp.arange(wl, dtype=jnp.float32)
        rows = jnp.arange(hl, dtype=jnp.float32)

        def one(acc, args):
            xk, yk, ak, gk = args  # (B, H, C) ×3, (B, H, C, D)
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(xk[..., None] - cols))  # (B,H,C,Wl)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(yk[..., None] - rows))  # (B,H,C,Hl)
            t = (wx[..., None] * (ak[..., None] * gk)[..., None, :]).astype(out_dtype)
            acc = acc + jnp.einsum(
                'bhsy,bhswd->bhywd', wy.astype(out_dtype), t, precision=precision
            )
            return acc, None

        acc0 = jnp.zeros((b, heads, hl, wl, d), jnp.float32)
        gv, _ = jax.lax.scan(one, acc0, (xc, yc, ac, gc))
        # back to the value layout (B, HW, H, D)
        out_levels.append(gv.transpose(0, 2, 3, 1, 4).reshape(b, hl * wl, heads, d))
    return jnp.concatenate(out_levels, axis=1).astype(out_dtype)
