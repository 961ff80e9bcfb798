"""A/B: Pallas flash-style masked cross-attention vs the XLA additive-bias
softmax path used in models/transformer_decoder.py (VERDICT r1 item 3).

Workload = one decoder cross-attention at Swin-L 800×800 geometry:
B=4, H=8 heads, Q=200 queries, D=32 head dim, S ∈ {10000, 2500, 625}
(the three pixel-decoder levels cycled by the 9 layers), plus the additive
mask bias (B, 1, Q, S) shared across heads (HF:1880-1882 semantics).

Run: python tools/ab_masked_attn.py  (on the TPU chip)
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# ---------------------------------------------------------------- XLA path
def xla_masked_attention(q, k, v, bias):
    """Current production formulation (transformer_decoder.MultiheadAttention
    core): scores einsum → +bias → softmax → PV einsum. q is pre-scaled."""
    scores = jnp.einsum('bhtd,bhsd->bhts', q, k)
    scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum('bhts,bhsd->bhtd', probs, v)


# ------------------------------------------------------------- Pallas path
def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref,
                  acc_ref, m_ref, l_ref, *, block_s, s_total):
    si = pl.program_id(1)
    ns = pl.num_programs(1)

    @pl.when(si == 0)
    def _init():
        m_ref[:] = jnp.full(m_ref.shape, -1e30, jnp.float32)
        l_ref[:] = jnp.zeros(l_ref.shape, jnp.float32)
        acc_ref[:] = jnp.zeros(acc_ref.shape, jnp.float32)

    q = q_ref[0]  # (Q, D), pre-scaled
    k = k_ref[0]  # (BS, D)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Q, BS)
    s = s + bias_ref[0].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + si * block_s
    s = jnp.where(col < s_total, s, -jnp.inf)

    m_prev = m_ref[:, 0:1]  # (Q, 1)
    l_prev = l_ref[:, 0:1]
    m_cur = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_cur)
    p = jnp.exp(s - m_cur)  # (Q, BS)
    l_ref[:] = jnp.broadcast_to(l_prev * alpha + p.sum(axis=1, keepdims=True), l_ref.shape)
    m_ref[:] = jnp.broadcast_to(m_cur, m_ref.shape)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(si == ns - 1)
    def _done():
        o_ref[0] = (acc_ref[:] / l_ref[:, 0:1]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=('block_s',))
def pallas_masked_attention(q, k, v, bias, block_s: int = 1024):
    """q (B,H,Q,D) pre-scaled; k/v (B,H,S,D); bias (B,1,Q,S) additive.
    Flash-style: scores/probs never touch HBM."""
    b, h, qlen, d = q.shape
    s_total = k.shape[2]
    s_pad = -(-s_total // block_s) * block_s
    if s_pad != s_total:
        pad = ((0, 0), (0, 0), (0, s_pad - s_total), (0, 0))
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, 0), (0, s_pad - s_total)))

    bh = b * h
    qf = q.reshape(bh, qlen, d)
    kf = k.reshape(bh, s_pad, d)
    vf = v.reshape(bh, s_pad, d)
    biasf = bias.reshape(b, qlen, s_pad)

    grid = (bh, s_pad // block_s)
    kernel = functools.partial(_flash_kernel, block_s=block_s, s_total=s_total)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, qlen, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, block_s, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, block_s, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, qlen, block_s), lambda i, j, h=h: (i // h, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, qlen, d), lambda i, j: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, qlen, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((qlen, d), jnp.float32),
            pltpu.VMEM((qlen, 128), jnp.float32),
            pltpu.VMEM((qlen, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary'),
        ),
    )(qf, kf, vf, biasf)
    return out.reshape(b, h, qlen, d)


def bench(name, fn, args, iters=20):
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
    B, H, Q, D = 4, 8, 200, 32
    rng = np.random.default_rng(0)
    print(f'device: {jax.devices()[0]}')
    for dt_name, dtype in (('bfloat16', jnp.bfloat16), ('float32', jnp.float32)):
        for S in (10000, 2500, 625):
            q = jnp.asarray(rng.standard_normal((B, H, Q, D)) * D ** -0.5, dtype)
            k = jnp.asarray(rng.standard_normal((B, H, S, D)), dtype)
            v = jnp.asarray(rng.standard_normal((B, H, S, D)), dtype)
            mask = rng.random((B, 1, Q, S)) < 0.7
            bias = jnp.asarray(np.where(mask, -1e9, 0.0), jnp.float32)

            ref = jax.jit(xla_masked_attention)
            a = np.asarray(ref(q, k, v, bias), np.float32)
            b_ = np.asarray(pallas_masked_attention(q, k, v, bias), np.float32)
            rel = np.abs(a - b_).max() / max(np.abs(a).max(), 1e-9)
            print(f'{dt_name} S={S}: max rel err {rel:.2e}')
            t_x = bench('xla softmax+bias', ref, (q, k, v, bias))
            t_p = bench('pallas flash', pallas_masked_attention, (q, k, v, bias))
            print(f'  speedup: {t_x / t_p:.2f}x')


if __name__ == '__main__':
    main()
