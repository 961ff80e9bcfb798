"""Stage-level steady-state timing of the Swin-L forward (800x800, f32/bf16):
backbone vs pixel decoder vs transformer decoder vs MSDA core.
Temporary diagnostic (not part of the framework)."""

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.engine.model_utils import config_for_arch, init_params
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

HW = int(os.environ.get('HW', '800'))
B = int(os.environ.get('B', '1'))
DTYPE = jnp.dtype(os.environ.get('DT', 'float32'))

cfg = config_for_arch('swin-large', num_labels=5)
model = Mask2Former(cfg, dtype=DTYPE)
params = init_params(model, cfg, image_hw=(128, 128))
x = jnp.asarray(np.random.default_rng(0).standard_normal((B, 3, HW, HW)), jnp.float32)


def timeit(name, fn, *args, iters=5):
    out = fn(*args)  # compile
    jax.block_until_ready(out)

    def round_():
        t0 = time.perf_counter()
        d = jnp.float32(0.0)
        for _ in range(iters):
            o = fn(*args)
            d = d + jax.tree.leaves(o)[0].reshape(-1)[0].astype(jnp.float32)
        float(d)
        return (time.perf_counter() - t0) / iters

    round_()  # discard: tunnel warmup
    dt = min(round_(), round_())
    print(f'{name}: {dt * 1000:.1f} ms/iter', flush=True)
    return out


@jax.jit
def full_forward(params, x):
    return model.apply({'params': params}, x, deterministic=True)


@jax.jit
def backbone_only(params, x):
    def fwd(mdl, px):
        return mdl.backbone(px.transpose(0, 2, 3, 1).astype(DTYPE), deterministic=True)
    return model.apply({'params': params}, x, method=fwd)


feats = timeit('backbone', backbone_only, params, x)


@jax.jit
def pixel_decoder_only(params, feats):
    def fwd(mdl, feats):
        return mdl.pixel_decoder(list(feats), deterministic=True)
    return model.apply({'params': params}, feats, method=fwd)


pd_out = timeit('pixel_decoder', pixel_decoder_only, params, tuple(feats))
mask_features, multi_scale = pd_out


@jax.jit
def decoder_only(params, args):
    def fwd(mdl, a):
        return mdl.transformer_module(list(a[0]), a[1], deterministic=True)
    return model.apply({'params': params}, args, method=fwd)


timeit('transformer_decoder', decoder_only, params, (tuple(multi_scale), mask_features))
timeit('FULL forward', full_forward, params, x)

# --- MSDA core isolation at pixel-decoder scale --------------------------
from weed_instance_segmentation_tpu.ops.deformable_attention import msda_reference

hq = HW // 8
shapes = ((hq, hq), (hq // 2, hq // 2), (hq // 4, hq // 4))
L = sum(h * w for h, w in shapes)
heads, dim, pts = 8, 32, 4
rng = np.random.default_rng(0)
value = jnp.asarray(rng.standard_normal((B, L, heads, dim)), DTYPE)
locs = jnp.asarray(rng.random((B, L, heads, 3, pts, 2)), DTYPE)
wts = jnp.asarray(rng.random((B, L, heads, 3, pts)), DTYPE)


@jax.jit
def msda_once(value, locs, wts):
    return msda_reference(value, shapes, locs, wts)


timeit(f'msda_core (1 layer, L={L}, random locs)', msda_once, value, locs, wts)
