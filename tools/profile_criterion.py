"""Criterion-internals split at the bench config: full vs no-aux vs
matcher-only vs LAP-only. Chained-scalar timing (tunnel-safe).

Env: B, HW, NI, ITERS. Shapes mirror the Swin-L 800² decoder outputs:
mask logits (B, 200, 200, 200), 10 aux layers.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.losses.criterion import (
    hungarian_match, total_loss,
)
from weed_instance_segmentation_tpu.models.mask2former import Mask2FormerOutput
from weed_instance_segmentation_tpu.ops.lap import linear_sum_assignment

B = int(os.environ.get('B', '2'))
HW = int(os.environ.get('HW', '800'))
NI = int(os.environ.get('NI', '10'))
ITERS = int(os.environ.get('ITERS', '8'))
Q, NL = 200, 5
HP = (HW + 31) // 32 * 32 // 4  # mask-logit resolution (H/4)

rng = np.random.default_rng(0)
cls = jnp.asarray(rng.standard_normal((B, Q, NL + 1)), jnp.float32)
msk = jnp.asarray(rng.standard_normal((B, Q, HP, HP)), jnp.float32)
aux_cls = tuple(cls * (1 + 0.01 * i) for i in range(10))
aux_msk = tuple(msk * (1 + 0.01 * i) for i in range(10))
tgt_m = jnp.asarray(rng.random((B, NI, HW, HW)) > 0.8, jnp.float32)
tgt_c = jnp.asarray(rng.integers(0, NL, (B, NI)), jnp.int32)
valid = jnp.ones((B, NI), bool)
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args):
    jfn = jax.jit(fn)
    t0 = time.perf_counter()
    float(jfn(*args, jnp.float32(0.0)))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        t0 = time.perf_counter()
        jit = jnp.float32(0.0)
        for _ in range(ITERS):
            jit = jfn(*args, jit)
        float(jit)
        dt = (time.perf_counter() - t0) / ITERS
    print(f'{name:28s} {dt * 1000:8.1f} ms  (compile {compile_s:.0f}s)', flush=True)
    return dt


# NOTE: cls/msk must be jit ARGUMENTS, not closures — closed-over arrays
# are serialized into the HLO upload and the remote compile helper rejects
# the body with HTTP 413 (~64 MB × 11 aux layers of baked constants).


def loss_fwd(naux):
    def f(cls, msk, tgt_m, tgt_c, jitter):
        aux_cls = tuple(cls * (1 + 0.01 * i) for i in range(naux))
        aux_msk = tuple(msk * (1 + 0.01 * i) for i in range(naux))
        loss, _ = total_loss(
            Mask2FormerOutput(cls, msk + jitter, aux_cls, aux_msk),
            tgt_m, tgt_c, valid, key, num_labels=NL,
            use_auxiliary_loss=naux > 0,
        )
        return loss * 1e-9
    return f


def matcher_only(cls, msk, tgt_m, tgt_c, jitter):
    a = hungarian_match(msk + jitter, cls, tgt_m, tgt_c, valid, key,
                        12544, 2.0, 5.0, 5.0)
    return a.sum().astype(jnp.float32) * 1e-9


def lap_only(cls, msk, tgt_m, tgt_c, jitter):
    cost = jnp.einsum('bnhw,bqhw->bnq', tgt_m[:, :, :HP, :HP], msk) * 1e-4 + jitter
    out = 0.0
    for k in range(11):  # 11 LAP solves = one per layer
        out = out + jax.vmap(linear_sum_assignment)(cost + k * 1e-6).sum()
    return out.astype(jnp.float32) * 1e-9


t_full = timeit('total_loss (10 aux)', loss_fwd(10), cls, msk, tgt_m, tgt_c)
t_noaux = timeit('total_loss (no aux)', loss_fwd(0), cls, msk, tgt_m, tgt_c)
t_match = timeit('matcher only (1 layer)', matcher_only, cls, msk, tgt_m, tgt_c)
t_lap = timeit('11x LAP solves only', lap_only, cls, msk, tgt_m, tgt_c)
print(
    f'\nper-aux-layer: {(t_full - t_noaux) / 10 * 1000:.1f} ms | '
    f'matcher {t_match * 1000:.1f} | LAP(11) {t_lap * 1000:.1f}'
)
