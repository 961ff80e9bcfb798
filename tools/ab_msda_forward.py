"""A/B the MSDA forward: fused flat-table gather (the shipped primal)
vs dense einsum formulations (no gather, MXU GEMMs — the mirror of the
value-grad einsum in ops/msda_transpose.py), in two shapes: separable
(contract y into a (chunk, W·D) GEMM, then a batched x-reduce) and
direct-2d (one GEMM over all H·W cells with the 4-nonzero bilinear
row generated as a fused dot operand).

MEASURED REJECTION (v5e-1, encoder bench shapes B2, 800² → Q=13294,
4 levels, 8 heads, d32, bf16): fused gather 42.2 ms/layer; separable
einsum 71.8; direct-2d 75.8 (72.6 at chunk/4). The einsum trick beats
*scatter* (the backward's bottleneck, row-serial RMW) but not *gather* —
XLA's gather reads only the 4 useful taps per sample while the dense
forms burn ~780 GFLOP/layer of mostly-zero contraction. The forward
therefore stays on the fused gather; the einsum transpose stays in the
backward only.

Encoder self-attention bench shapes, chained-scalar timing
(tunnel-safe). Env: B, ITERS, CHUNK, DTYPE=bf16|f32.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.ops.msda_fused import msda_fused
from weed_instance_segmentation_tpu.ops.msda_packed import msda_packed

B = int(os.environ.get('B', '2'))
ITERS = int(os.environ.get('ITERS', '10'))
CHUNK = int(os.environ.get('CHUNK', '8192'))
HEADS, D, P = 8, 32, 4
SHAPES = ((100, 100), (50, 50), (25, 25), (13, 13))
L_TOTAL = sum(h * w for h, w in SHAPES)
Q = L_TOTAL
DTYPE = {'bf16': jnp.bfloat16, 'f32': jnp.float32}[os.environ.get('DTYPE', 'bf16')]


def msda_einsum(
    value: jnp.ndarray,
    spatial_shapes: tuple,
    sampling_locations: jnp.ndarray,
    attention_weights: jnp.ndarray,
    chunk: int = 8192,
    direct: bool = False,
) -> jnp.ndarray:
    """Same contract as ``msda_fused``: value (B, L_total, H, D),
    static spatial_shapes, locations (B, Q, H, LVL, P, 2) in [0, 1],
    softmaxed weights (B, Q, H, LVL, P) → (B, Q, H·D)."""
    b, l_total, heads, d = value.shape
    _, q, _, n_levels, n_points, _ = sampling_locations.shape
    dtype = value.dtype

    s = q * n_points
    chunk = min(chunk, s)
    n_chunks = -(-s // chunk)
    pad = n_chunks * chunk - s

    level_offsets = np.concatenate(
        [[0], np.cumsum([hw[0] * hw[1] for hw in spatial_shapes])]
    )[:-1]

    out = jnp.zeros((n_chunks, b, heads, chunk, d), jnp.float32)
    for level, (hl, wl) in enumerate(spatial_shapes):
        # (B, H, Hl, Wl·D) — GEMM rhs
        v = value[:, level_offsets[level]:level_offsets[level] + hl * wl]
        v = v.transpose(0, 2, 1, 3).reshape(b, heads, hl, wl * d)

        loc = sampling_locations[:, :, :, level].astype(jnp.float32)
        # torch grid_sample unnormalize (align_corners=False)
        x = (loc[..., 0] * wl - 0.5).transpose(0, 2, 1, 3).reshape(b, heads, s)
        y = (loc[..., 1] * hl - 0.5).transpose(0, 2, 1, 3).reshape(b, heads, s)
        a = attention_weights[:, :, :, level].astype(jnp.float32)
        a = a.transpose(0, 2, 1, 3).reshape(b, heads, s)

        if pad:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
            y = jnp.pad(y, ((0, 0), (0, 0), (0, pad)))
            a = jnp.pad(a, ((0, 0), (0, 0), (0, pad)))  # a=0 → no contribution
        xc = x.reshape(b, heads, n_chunks, chunk).transpose(2, 0, 1, 3)
        yc = y.reshape(b, heads, n_chunks, chunk).transpose(2, 0, 1, 3)
        ac = a.reshape(b, heads, n_chunks, chunk).transpose(2, 0, 1, 3)

        cols = jnp.arange(wl, dtype=jnp.float32)
        rows = jnp.arange(hl, dtype=jnp.float32)

        def one(_, args):
            xk, yk, ak = args  # (B, H, C)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(yk[..., None] - rows))  # (B,H,C,Hl)
            # fold the attention weight into the x tri-row: 2 nonzeros stay 2
            wx = ak[..., None] * jnp.maximum(
                0.0, 1.0 - jnp.abs(xk[..., None] - cols)
            )  # (B,H,C,Wl)
            m = jnp.einsum(
                'bhcy,bhyk->bhck', wy.astype(dtype), v, precision='high'
            ).reshape(b, heads, chunk, wl, d)
            o = jnp.einsum(
                'bhcw,bhcwd->bhcd', wx.astype(dtype), m, precision='high',
                preferred_element_type=jnp.float32,
            )
            return None, o

        def one_direct(_, args):
            xk, yk, ak = args  # (B, H, C)
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(yk[..., None] - rows))  # (B,H,C,Hl)
            wx = ak[..., None] * jnp.maximum(
                0.0, 1.0 - jnp.abs(xk[..., None] - cols)
            )  # (B,H,C,Wl)
            # 4-nonzero bilinear row over all Hl·Wl cells; one GEMM per chunk.
            # Relies on XLA fusing the outer-product generator into the dot
            # operand — A/B'd against the separable form in tools/ab_msda_forward.py
            w2 = (wy[..., :, None] * wx[..., None, :]).reshape(
                b, heads, chunk, hl * wl
            )
            o = jnp.einsum(
                'bhck,bhkd->bhcd', w2.astype(dtype), v2, precision='high',
                preferred_element_type=jnp.float32,
            )
            return None, o

        if direct:
            v2 = v.reshape(b, heads, hl, wl, d).reshape(b, heads, hl * wl, d)
            _, o_chunks = jax.lax.scan(one_direct, None, (xc, yc, ac))
        else:
            _, o_chunks = jax.lax.scan(one, None, (xc, yc, ac))
        out = out + o_chunks

    # (n_chunks, B, H, C, D) → (B, H, S, D) → (B, Q, P, …) → sum points
    out = out.transpose(1, 2, 0, 3, 4).reshape(b, heads, n_chunks * chunk, d)
    out = out[:, :, :s].reshape(b, heads, q, n_points, d).sum(axis=3)
    return out.transpose(0, 2, 1, 3).reshape(b, q, heads * d).astype(dtype)


def make_inputs(seed=0):
    rng = np.random.default_rng(seed)
    value = jnp.asarray(rng.standard_normal((B, L_TOTAL, HEADS, D)), DTYPE)
    loc = jnp.asarray(rng.random((B, Q, HEADS, len(SHAPES), P, 2)), jnp.float32)
    aw = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, Q, HEADS, len(SHAPES) * P)), jnp.float32)
    ).reshape(B, Q, HEADS, len(SHAPES), P)
    return value, loc, aw


def timeit(name, fn, value, loc, aw):
    def step(value, loc, aw, jitter):
        out = fn(value, loc + jitter, aw)
        return out.astype(jnp.float32).sum() * 1e-9

    jfn = jax.jit(step)
    t0 = time.perf_counter()
    float(jfn(value, loc, aw, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        t0 = time.perf_counter()
        chain = jnp.float32(0.0)
        for _ in range(ITERS):
            chain = jfn(value, loc, aw, chain)
        float(chain)
        dt = (time.perf_counter() - t0) / ITERS
    print(f'{name:34s} {dt * 1000:8.1f} ms  (compile {compile_s:.0f}s)', flush=True)
    return dt


def main():
    value, loc, aw = make_inputs()
    # correctness first, at full shapes
    ref = np.asarray(msda_packed(value, SHAPES, loc, aw), np.float32)
    out = np.asarray(
        msda_einsum(value, SHAPES, loc, aw, chunk=CHUNK), np.float32
    )
    err = np.abs(out - ref).max()
    print(f'einsum vs packed max abs err: {err:.4g}')
    assert err < (0.08 if DTYPE == jnp.bfloat16 else 1e-4)

    t1 = timeit('fused gather forward (baseline)', lambda v, l, a: msda_fused(v, SHAPES, l, a), value, loc, aw)
    t2 = timeit('separable einsum forward', lambda v, l, a: msda_einsum(v, SHAPES, l, a, chunk=CHUNK), value, loc, aw)
    t3 = timeit('direct-2d einsum forward', lambda v, l, a: msda_einsum(v, SHAPES, l, a, chunk=CHUNK, direct=True), value, loc, aw)
    t4 = timeit('direct-2d einsum fwd chunk/4', lambda v, l, a: msda_einsum(v, SHAPES, l, a, chunk=CHUNK // 4, direct=True), value, loc, aw)
    best = min(t2, t3, t4)
    print(f'\nbest einsum vs gather: {t1 / best:.2f}x')


if __name__ == '__main__':
    main()
