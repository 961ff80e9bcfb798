"""Bucket the train step's time: forward vs +criterion vs +backward+AdamW.

Three separately-jitted programs at the bench config (Swin-L 800x800 b2
bf16, remat like the bench) — the deltas bucket where the step time goes.
Diagnostic; each program is its own (remote) compile. Env: ARCH, HW, B, NI,
DT, REMAT.
"""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.engine.model_utils import config_for_arch, init_params
from weed_instance_segmentation_tpu.engine.steps import (
    create_train_state, make_loss_fn, make_train_step,
)
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

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
batch = {
    'pixel_values': jnp.asarray(rng.standard_normal((B, 3, HW, HW)), jnp.float32),
    'pixel_mask': jnp.ones((B, HW, HW), jnp.float32),
    'mask_labels': jnp.asarray(rng.random((B, NI, HW, HW)) > 0.8, jnp.uint8),
    'class_labels': jnp.asarray(rng.integers(0, 5, (B, NI)), jnp.int32),
    'instance_valid': jnp.ones((B, NI), jnp.float32),
    'sample_valid': jnp.ones((B,), jnp.float32),
}
key = jax.random.PRNGKey(0)
loss_fn = make_loss_fn(model, cfg)


@jax.jit
def fwd_only(params, pixel_values):
    out = model.apply({'params': params}, pixel_values, deterministic=False,
                      rngs={'dropout': key})
    return out.class_queries_logits.mean() + out.masks_queries_logits.mean()


@jax.jit
def fwd_loss(params, batch, rng):
    return loss_fn(params, batch, rng)[0]


def timeit(name, fn, *args):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    # two rounds; report the second (tunnel warmup)
    for _ in range(2):
        t0 = time.perf_counter()
        out = None
        for _ in range(ITERS):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / ITERS
    print(f'{name:28s} {dt * 1000:8.1f} ms/iter  (compile {compile_s:.0f}s)', flush=True)
    return dt


t_fwd = timeit('forward only', fwd_only, params, batch['pixel_values'])
t_loss = timeit('forward + criterion', fwd_loss, params, batch, key)

state, tx = create_train_state(params, 5e-5, gradient_accumulation=2)
train_step = make_train_step(model, cfg, tx)
t0 = time.perf_counter()
state, loss = train_step(state, batch, key)
jax.block_until_ready(loss)
print(f'full step compile {time.perf_counter() - t0:.0f}s', flush=True)
for _ in range(2):
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = train_step(state, batch, key)
    jax.block_until_ready(loss)
    t_full = (time.perf_counter() - t0) / ITERS
print(f'{"full step (grad+AdamW)":28s} {t_full * 1000:8.1f} ms/iter', flush=True)

print(
    f'\nbuckets: forward {t_fwd*1000:.0f} ms | criterion +{(t_loss-t_fwd)*1000:.0f} ms '
    f'| backward+update +{(t_full-t_loss)*1000:.0f} ms | total {t_full*1000:.0f} ms'
)
