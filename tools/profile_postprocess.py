"""Device post-process split at bench shapes (VERDICT r4 #2: e2e is 7.75
img/s vs the 8.0 bar; post-process costs ~19 ms of the 516 ms b4 step).

Isolates the stages of `post_process_instance_arrays` (with_masks=False,
the bench/serving id-map path) on (B, 200, 200, 200) f32 mask logits:

- full         — the shipped function
- upsample     — gather-form bilinear 200² → 384² + scalar reduce
- upsample_mm  — the same resize as two separable matmuls (Wy @ x @ Wx^T):
                 candidate MXU lever; bilinear weights have 2 taps/row so
                 the dense matmul does 100× the FLOPs of the gather but
                 lands on the MXU instead of the gather unit
- score_chain  — softmax/top-k/keep bookkeeping only (no masks)
- overwrite    — the (Q,384,384) last-covering-slot max-reduce + id gather

Chained-scalar timing (tunnel rule, tools/README.md). Env: B, HW, ITERS.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weed_instance_segmentation_tpu.ops.resize import (
    _bilinear_weights, bilinear_resize_matrix,
)
from weed_instance_segmentation_tpu.processing.postprocess import (
    SCORE_RESOLUTION, post_process_instance_arrays,
)

B = int(os.environ.get('B', '4'))
HW = int(os.environ.get('HW', '800'))
ITERS = int(os.environ.get('ITERS', '20'))
Q, NL = 200, 5
HP = 200  # mask-logit resolution at 800² (H/4)

rng = np.random.default_rng(0)
cls = jnp.asarray(rng.standard_normal((B, Q, NL + 1)), jnp.float32)
msk = jnp.asarray(rng.standard_normal((B, Q, HP, HP)) * 2, jnp.float32)


resize_matrix = bilinear_resize_matrix  # now shipped in ops/resize.py

WY = jnp.asarray(resize_matrix(HP, SCORE_RESOLUTION[0]))
WX = jnp.asarray(resize_matrix(HP, SCORE_RESOLUTION[1]))


def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    float(jfn(*args, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        t0 = time.perf_counter()
        acc = jnp.float32(0.0)
        for _ in range(ITERS):
            acc = jfn(*args, acc)
        float(acc)
        dt = (time.perf_counter() - t0) / ITERS
    print(f'{name:24s} {1000 * dt:8.2f} ms  (compile {compile_s:5.1f}s)',
          flush=True)
    return dt


def full(cls, msk, acc):
    res = post_process_instance_arrays(cls, msk, (HW, HW), 0.5, with_masks=False)
    return acc + res.segmentation.sum(dtype=jnp.int32).astype(jnp.float32) + res.scores.sum()


def upsample(cls, msk, acc):
    ylo, yhi, yf = _bilinear_weights(HP, SCORE_RESOLUTION[0])
    xlo, xhi, xf = _bilinear_weights(HP, SCORE_RESOLUTION[1])
    yf = jnp.asarray(yf)[:, None]
    xf = jnp.asarray(xf)[None, :]
    rows = msk[..., ylo, :] * (1.0 - yf) + msk[..., yhi, :] * yf
    up = rows[..., xlo] * (1.0 - xf) + rows[..., xhi] * xf
    binf = (up > 0).astype(jnp.float32)
    ms = (jax.nn.sigmoid(up) * binf).sum((-1, -2)) / (binf.sum((-1, -2)) + 1e-6)
    return acc + ms.sum()


def upsample_mm(cls, msk, acc):
    up = jnp.einsum('oh,bqhw,pw->bqop', WY, msk, WX,
                    precision=jax.lax.Precision.HIGHEST)
    binf = (up > 0).astype(jnp.float32)
    ms = (jax.nn.sigmoid(up) * binf).sum((-1, -2)) / (binf.sum((-1, -2)) + 1e-6)
    return acc + ms.sum()


def full_fused(cls, msk, acc):
    prev = os.environ.get('WISTPU_POSTPROC_RESIZE')
    os.environ['WISTPU_POSTPROC_RESIZE'] = 'fused'
    try:
        res = post_process_instance_arrays(cls, msk, (HW, HW), 0.5, with_masks=False)
    finally:
        if prev is None:
            os.environ.pop('WISTPU_POSTPROC_RESIZE', None)
        else:
            os.environ['WISTPU_POSTPROC_RESIZE'] = prev
    return acc + res.segmentation.sum(dtype=jnp.int32).astype(jnp.float32) + res.scores.sum()


def fused_stats(cls, msk, acc):
    from weed_instance_segmentation_tpu.ops.postprocess_kernel import (
        fused_upsample_stats, pick_q_tile,
    )
    sig_sum, pos_cnt, bin_i8 = fused_upsample_stats(
        msk, SCORE_RESOLUTION, q_tile=pick_q_tile(msk.shape[1]),
        interpret=jax.default_backend() != 'tpu',
    )
    return acc + sig_sum.sum() + pos_cnt.sum() \
        + bin_i8.sum(dtype=jnp.int32).astype(jnp.float32)


def score_chain(cls, msk, acc):
    scores = jax.nn.softmax(cls, axis=-1)[..., :-1]
    flat = scores.reshape(B, -1)
    sc, idx = jax.lax.top_k(flat, Q)
    labels = idx % NL
    qi = idx // NL
    keep = sc >= 0.5
    seg_ids = jnp.where(keep, jnp.cumsum(keep, -1) - 1, -1)
    return acc + seg_ids.sum().astype(jnp.float32) + labels.sum().astype(jnp.float32) + qi.sum().astype(jnp.float32)


def overwrite(cls, msk, acc):
    up = jnp.einsum('oh,bqhw,pw->bqop', WY, msk, WX,
                    precision=jax.lax.Precision.HIGHEST)
    bin_orig = up > 0
    maxslot = jnp.asarray(rng.integers(-1, Q, (B, Q)), jnp.int32)
    last_slot = jnp.max(
        jnp.where(bin_orig, maxslot[:, :, None, None], -1), axis=1
    )
    ys = np.minimum(np.floor(np.arange(HW) * (SCORE_RESOLUTION[0] / HW)).astype(np.int64),
                    SCORE_RESOLUTION[0] - 1)
    xs = np.minimum(np.floor(np.arange(HW) * (SCORE_RESOLUTION[1] / HW)).astype(np.int64),
                    SCORE_RESOLUTION[1] - 1)
    seg = last_slot[:, ys][:, :, xs]
    return acc + seg.sum(dtype=jnp.int32).astype(jnp.float32)


if __name__ == '__main__':
    print(f'platform={jax.devices()[0].platform} B={B} HW={HW} iters={ITERS}')
    timeit('full', full, cls, msk)
    timeit('full(fused pallas)', full_fused, cls, msk)
    timeit('fused_stats kernel', fused_stats, cls, msk)
    timeit('upsample(gather)', upsample, cls, msk)
    timeit('upsample(matmul)', upsample_mm, cls, msk)
    timeit('score_chain', score_chain, cls, msk)
    timeit('overwrite(mm up)', overwrite, cls, msk)
