"""Train-step timing on the current device: swin-tiny, 512x512, b2.
Exercises forward+backward+matcher(LAP)+AdamW. Diagnostic."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.engine.model_utils import config_for_arch, init_params
from weed_instance_segmentation_tpu.engine.steps import create_train_state, make_train_step
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

ARCH = os.environ.get('ARCH', 'swin-tiny')
HW = int(os.environ.get('HW', '512'))
B = int(os.environ.get('B', '2'))
NI = int(os.environ.get('NI', '10'))  # instances per image

cfg = config_for_arch(ARCH, num_labels=5)
model = Mask2Former(cfg)
params = init_params(model, cfg, image_hw=(128, 128))
state, tx = create_train_state(params, 5e-5, gradient_accumulation=2)
train_step = make_train_step(model, cfg, tx)

rng = np.random.default_rng(0)
batch = {
    'pixel_values': jnp.asarray(rng.standard_normal((B, 3, HW, HW)), jnp.float32),
    'pixel_mask': jnp.ones((B, HW, HW), jnp.float32),
    'mask_labels': jnp.asarray(rng.random((B, NI, HW, HW)) > 0.8, jnp.float32),
    'class_labels': jnp.asarray(rng.integers(0, 5, (B, NI)), jnp.int32),
    'instance_valid': jnp.ones((B, NI), jnp.float32),
}
key = jax.random.PRNGKey(0)

t0 = time.perf_counter()
state, loss = train_step(state, batch, key)
print(f'compile+first step: {time.perf_counter() - t0:.1f}s loss={float(loss):.3f}', flush=True)

for rep in range(3):
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        state, loss = train_step(state, batch, key)
    float(loss)
    dt = (time.perf_counter() - t0) / iters
    print(f'rep {rep}: {dt * 1000:.0f} ms/step ({B / dt:.2f} img/s)', flush=True)
