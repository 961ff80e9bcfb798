"""A/B the optimization_barrier in WindowAttention within ONE process:
same device session, interleaved repeats, full Swin-L forward at 800x800."""

import time

import jax
import jax.numpy as jnp
import numpy as np

import weed_instance_segmentation_tpu.models.swin as swin_mod
from weed_instance_segmentation_tpu.engine.model_utils import config_for_arch, init_params
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

HW = 800

_orig = jax.lax.optimization_barrier

del swin_mod  # imported for clarity: the patched symbol is jax.lax.optimization_barrier

cfg = config_for_arch('swin-large', num_labels=5)
model = Mask2Former(cfg)
params = init_params(model, cfg, image_hw=(128, 128))
x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 3, HW, HW)), jnp.float32)


def fwd_with(barrier: bool):
    import unittest.mock as mock

    if barrier:
        ctx = mock.patch.object(jax.lax, 'optimization_barrier', _orig)
    else:
        ctx = mock.patch.object(jax.lax, 'optimization_barrier', lambda v: v)
    with ctx:
        @jax.jit
        def f(params, x):
            out = model.apply({'params': params}, x, deterministic=True)
            return out.class_queries_logits.mean() + out.masks_queries_logits.mean()

        # force trace+compile inside the patch context
        r = f(params, x)
        jax.block_until_ready(r)
    return f


f_bar = fwd_with(True)
f_nobar = fwd_with(False)


def measure(f, iters=6):
    d = jnp.float32(0.0)
    t0 = time.perf_counter()
    for _ in range(iters):
        d = f(params, x + d * 1e-20)
    float(d)
    return (time.perf_counter() - t0) / iters * 1000


for rep in range(3):
    print(f'rep {rep}: barrier={measure(f_bar):.0f} ms  no_barrier={measure(f_nobar):.0f} ms', flush=True)
