"""A/B the pred-point sampler inside the criterion backward: gather
(flat-table + scatter-add transpose) vs einsum (separable tri-weight
matmuls — see losses/criterion.py::_sample_points_einsum).

Times jax.grad of total_loss wrt ALL mask/class logits (main + 10 aux) at
the bench config's decoder shapes. The sampler is selected by
WISTPU_PRED_SAMPLER (read at trace time) — run once per setting:

    WISTPU_PRED_SAMPLER=gather python tools/ab_point_sampler.py
    WISTPU_PRED_SAMPLER=einsum python tools/ab_point_sampler.py

Chained-scalar timing (tunnel-safe). Env: B, HW, NI, ITERS.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.losses.criterion import total_loss
from weed_instance_segmentation_tpu.models.mask2former import Mask2FormerOutput

B = int(os.environ.get('B', '2'))
HW = int(os.environ.get('HW', '800'))
NI = int(os.environ.get('NI', '10'))
ITERS = int(os.environ.get('ITERS', '8'))
# DT=bfloat16 mirrors the bf16 train step (the model emits bf16 logits and
# the sampler then runs single-pass bf16 MXU — criterion._sample_points_einsum)
DT = jnp.dtype(os.environ.get('DT', 'float32'))
Q, NL = 200, 5
HP = (HW + 31) // 32 * 32 // 4

rng = np.random.default_rng(0)
cls = jnp.asarray(rng.standard_normal((B, Q, NL + 1)), DT)
msk = jnp.asarray(rng.standard_normal((B, Q, HP, HP)), DT)
tgt_m = jnp.asarray(rng.random((B, NI, HW, HW)) > 0.8, jnp.float32)
tgt_c = jnp.asarray(rng.integers(0, NL, (B, NI)), jnp.int32)
valid = jnp.ones((B, NI), bool)
key = jax.random.PRNGKey(0)


def loss_fn(cls, msk, jitter):
    out = Mask2FormerOutput(
        cls, msk,
        tuple(cls * (1 + 0.01 * i) for i in range(10)),
        tuple(msk * (1 + 0.01 * i) for i in range(10)),
    )
    loss, _ = total_loss(
        out, tgt_m + jitter, tgt_c, valid, key, num_labels=NL,
        use_auxiliary_loss=True,
    )
    return loss * 1e-9


grad_fn = jax.jit(
    lambda cls, msk, jitter: sum(
        g.sum() for g in jax.tree_util.tree_leaves(
            jax.grad(loss_fn, argnums=(0, 1))(cls, msk, jitter)
        )
    ).astype(jnp.float32)
)

t0 = time.perf_counter()
float(grad_fn(cls, msk, jnp.float32(0.0)))
print(f'compile {time.perf_counter() - t0:.0f}s', flush=True)
for round_i in range(2):
    t0 = time.perf_counter()
    chain = jnp.float32(0.0)
    for _ in range(ITERS):
        chain = grad_fn(cls, msk, chain)
    float(chain)
    dt = (time.perf_counter() - t0) / ITERS
    print(
        f"sampler={os.environ.get('WISTPU_PRED_SAMPLER', 'einsum')!s:7s} dt={DT.name} "
        f'round {round_i}: grad(total_loss, 11 layers) {dt * 1000:8.1f} ms',
        flush=True,
    )
