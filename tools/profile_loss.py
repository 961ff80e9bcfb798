"""Split train-step cost: forward vs loss(total incl matcher) vs grad. Diagnostic."""
import os, time
import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.engine.model_utils import config_for_arch, init_params
from weed_instance_segmentation_tpu.engine.steps import make_loss_fn
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former
from weed_instance_segmentation_tpu.losses.criterion import total_loss, hungarian_match, _uncertainty_points

HW, B, NI = 512, 2, 10
cfg = config_for_arch('swin-tiny', num_labels=5)
model = Mask2Former(cfg)
params = init_params(model, cfg, image_hw=(128, 128))
rng = np.random.default_rng(0)
batch = {
    'pixel_values': jnp.asarray(rng.standard_normal((B, 3, HW, HW)), jnp.float32),
    'mask_labels': jnp.asarray(rng.random((B, NI, HW, HW)) > 0.8, jnp.float32),
    'class_labels': jnp.asarray(rng.integers(0, 5, (B, NI)), jnp.int32),
    'instance_valid': jnp.ones((B, NI), jnp.float32),
}
key = jax.random.PRNGKey(0)

def timeit(name, f, *args, iters=5):
    o = f(*args); jax.block_until_ready(o)
    def round_():
        t0 = time.perf_counter(); d = jnp.float32(0.0)
        for _ in range(iters):
            d = d + jax.tree.leaves(f(*args))[0].reshape(-1)[0]
        float(d); return (time.perf_counter()-t0)/iters
    round_()
    print(f'{name}: {min(round_(), round_())*1000:.0f} ms', flush=True)

fwd = jax.jit(lambda p, x: model.apply({'params': p}, x, deterministic=True))
timeit('forward only', fwd, params, batch['pixel_values'])

out = fwd(params, batch['pixel_values'])
out = jax.tree.map(lambda t: t, out)

loss_only = jax.jit(lambda o, m, c, v: total_loss(
    o, m, c, v.astype(bool), key, num_labels=5)[0])
timeit('loss only (10 layers aux)', loss_only, out, batch['mask_labels'], batch['class_labels'], batch['instance_valid'])

match_only = jax.jit(lambda o, m, c, v: hungarian_match(
    o.masks_queries_logits, o.class_queries_logits, m, c, v.astype(bool),
    key, 12544, 2.0, 5.0, 5.0))
timeit('matcher only (1 layer)', match_only, out, batch['mask_labels'], batch['class_labels'], batch['instance_valid'])

# uncertainty points for 20 pairs
pred = out.masks_queries_logits.reshape(-1, *out.masks_queries_logits.shape[2:])[:B*NI]
unc = jax.jit(lambda p: _uncertainty_points(p, key, 12544, 3.0, 0.75))
timeit('uncertainty points (B*NI pairs, 1 layer)', unc, pred)

loss_fn = make_loss_fn(model, cfg)
grad = jax.jit(lambda p, b: jax.value_and_grad(lambda pp: loss_fn(pp, b, key)[0])(p)[0])
timeit('full fwd+loss+grad', grad, params, batch)
