"""Split the backward cost: model backward vs criterion backward.

Two separately-jitted grads at the bench config:
  1. grad through the MODEL only (surrogate scalar on the outputs) —
     Swin + pixel decoder (MSDA) + transformer decoder backward.
  2. grad of the CRITERION only w.r.t. the model outputs (treated as free
     variables) — matcher + point-sampled losses backward, no model.
Env: ARCH, HW, B, NI, DT, REMAT, ITERS.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.engine.model_utils import config_for_arch, init_params
from weed_instance_segmentation_tpu.losses.criterion import total_loss
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former, Mask2FormerOutput

ARCH = os.environ.get('ARCH', 'swin-large')
HW = int(os.environ.get('HW', '800'))
B = int(os.environ.get('B', '2'))
NI = int(os.environ.get('NI', '10'))
DT = jnp.dtype(os.environ.get('DT', 'bfloat16'))
REMAT = os.environ.get('REMAT', '1') == '1'
ITERS = int(os.environ.get('ITERS', '6'))

cfg = config_for_arch(ARCH, num_labels=5)
model = Mask2Former(cfg, dtype=DT, remat=REMAT)
params = init_params(model, cfg, image_hw=(128, 128))

rng = np.random.default_rng(0)
pixel_values = jnp.asarray(rng.standard_normal((B, 3, HW, HW)), jnp.float32)
mask_labels = jnp.asarray(rng.random((B, NI, HW, HW)) > 0.8, jnp.float32)
class_labels = jnp.asarray(rng.integers(0, 5, (B, NI)), jnp.int32)
instance_valid = jnp.ones((B, NI), bool)
key = jax.random.PRNGKey(0)


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    for _ in range(2):
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS
    print(f'{name:34s} {dt * 1000:8.1f} ms/iter  (compile {compile_s:.0f}s)', flush=True)
    return dt


def surrogate(params, pixel_values):
    out = model.apply({'params': params}, pixel_values, deterministic=False,
                      rngs={'dropout': key})
    s = out.class_queries_logits.astype(jnp.float32).mean() + \
        out.masks_queries_logits.astype(jnp.float32).mean()
    for c, m in zip(out.aux_class_queries_logits, out.aux_masks_queries_logits):
        s = s + c.astype(jnp.float32).mean() * 1e-3
        s = s + m.astype(jnp.float32).mean() * 1e-3
    return s


@jax.jit
def model_backward(params, pixel_values):
    g = jax.grad(surrogate)(params, pixel_values)
    return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in jax.tree.leaves(g))


# fixed model outputs once (forward only), then grad the criterion wrt them
fwd = jax.jit(lambda p, x: model.apply({'params': p}, x, deterministic=True))
outputs0 = fwd(params, pixel_values)


def criterion_loss(outs_vars):
    out = Mask2FormerOutput(
        class_queries_logits=outs_vars['cls'],
        masks_queries_logits=outs_vars['msk'],
        aux_class_queries_logits=tuple(a['cls'] for a in outs_vars['aux']),
        aux_masks_queries_logits=tuple(a['msk'] for a in outs_vars['aux']),
    )
    loss, _ = total_loss(
        out, mask_labels, class_labels, instance_valid, key,
        num_labels=cfg.num_labels, no_object_weight=cfg.no_object_weight,
        train_num_points=cfg.train_num_points,
        oversample_ratio=cfg.oversample_ratio,
        importance_sample_ratio=cfg.importance_sample_ratio,
        class_weight=cfg.class_weight, mask_weight=cfg.mask_weight,
        dice_weight=cfg.dice_weight, use_auxiliary_loss=cfg.use_auxiliary_loss,
    )
    return loss


outs_vars = {
    'cls': outputs0.class_queries_logits.astype(jnp.float32),
    'msk': outputs0.masks_queries_logits.astype(jnp.float32),
    'aux': [
        {'cls': c.astype(jnp.float32), 'msk': m.astype(jnp.float32)}
        for c, m in zip(
            outputs0.aux_class_queries_logits, outputs0.aux_masks_queries_logits
        )
    ],
}
jax.block_until_ready(outs_vars)


@jax.jit
def criterion_backward(outs_vars):
    g = jax.grad(criterion_loss)(outs_vars)
    return sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in jax.tree.leaves(g))


t_model = timeit('grad through model (surrogate)', model_backward, params, pixel_values)
t_crit = timeit('grad of criterion wrt outputs', criterion_backward, outs_vars)
print(f'\nmodel fwd+bwd {t_model*1000:.0f} ms | criterion fwd+bwd {t_crit*1000:.0f} ms')
