"""A/B: Pallas fused Swin window attention vs the XLA einsum path in
models/swin.py WindowAttention (VERDICT r1 item 3 — the second kernel
candidate named by SURVEY.md §7.1.4).

Workload = Swin-L stage-1 at 800×800: 200×200 feature map, window 12 →
204×204 padded → 17×17 = 289 windows/image, B=4 → NW = 1156 window-batches,
6 heads, T = 144 tokens, D = 32 head dim, learned relative position bias
(heads, T, T) shared across windows. The kernel fuses QKᵀ + bias + softmax
+ PV for G windows per grid step so the (NW, H, T, T) score tensor never
touches HBM (XLA materializes it: 1156·6·144²·4B ≈ 575 MB/block f32).

Run: python tools/ab_window_attn.py  (on the TPU chip)
"""

import functools
import math
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def xla_window_attention(q, k, v, bias):
    """models/swin.py formulation: q/k/v (NW, H, T, D), bias (H, T, T)."""
    scores = jnp.einsum('whqd,whkd->whqk', q, k) / math.sqrt(q.shape[-1])
    scores = scores + bias[None].astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum('whqk,whkd->whqd', probs, v)


def _win_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    q = q_ref[:]  # (G, T, D)
    k = k_ref[:]
    v = v_ref[:]
    s = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    ) * scale  # (G, T, T)
    s = s + bias_ref[0].astype(jnp.float32)[None]
    m = s.max(axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / p.sum(axis=-1, keepdims=True)
    o_ref[:] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('group',))
def pallas_window_attention(q, k, v, bias, group: int = 34):
    """q/k/v (NW, H, T, D), bias (H, T, T). Head-major flattening so each
    G-window block sees a single head's bias."""
    nw, h, t, d = q.shape
    assert nw % group == 0, (nw, group)
    qf = q.transpose(1, 0, 2, 3).reshape(h * nw, t, d)
    kf = k.transpose(1, 0, 2, 3).reshape(h * nw, t, d)
    vf = v.transpose(1, 0, 2, 3).reshape(h * nw, t, d)

    grid = (h * nw // group,)
    blocks_per_head = nw // group
    out = pl.pallas_call(
        functools.partial(_win_kernel, scale=1.0 / math.sqrt(d)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((group, t, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, t, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((group, t, d), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, t, t), lambda i: (i // blocks_per_head, 0, 0)),
        ],
        out_specs=pl.BlockSpec((group, t, d), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((h * nw, t, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',),
        ),
    )(qf, kf, vf, bias)
    return out.reshape(h, nw, t, d).transpose(1, 0, 2, 3)


def bench(name, fn, args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f'  {name:22s} {dt * 1e3:8.3f} ms')
    return dt


def main():
    rng = np.random.default_rng(0)
    print(f'device: {jax.devices()[0]}')
    # (stage, NW, heads): Swin-L 800² stages 1-2 (where windows dominate)
    # group sized to the 16 MB VMEM limit (G=34 OOMs: 17.9 MB scoped)
    cases = [('stage1', 1156, 6, 17), ('stage2', 324, 12, 18)]
    for dt_name, dtype in (('bfloat16', jnp.bfloat16), ('float32', jnp.float32)):
        for name, nw, h, group in cases:
            t, d = 144, 32
            q = jnp.asarray(rng.standard_normal((nw, h, t, d)), dtype)
            k = jnp.asarray(rng.standard_normal((nw, h, t, d)), dtype)
            v = jnp.asarray(rng.standard_normal((nw, h, t, d)), dtype)
            bias = jnp.asarray(rng.standard_normal((h, t, d * 0 + t)), jnp.float32)

            ref = jax.jit(xla_window_attention)
            a = np.asarray(ref(q, k, v, bias), np.float32)
            b_ = np.asarray(pallas_window_attention(q, k, v, bias, group=group), np.float32)
            rel = np.abs(a - b_).max() / max(np.abs(a).max(), 1e-9)
            print(f'{dt_name} {name} (NW={nw}, H={h}): max rel err {rel:.2e}')
            t_x = bench('xla einsum+softmax', ref, (q, k, v, bias))
            t_p = bench('pallas fused window',
                        lambda *args: pallas_window_attention(*args, group=group),
                        (q, k, v, bias))
            print(f'  speedup: {t_x / t_p:.2f}x')


if __name__ == '__main__':
    main()
