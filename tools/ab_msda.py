"""A/B msda_fused vs msda_packed on TPU at pixel-decoder scale."""
import time
import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.ops.deformable_attention import msda_reference
from weed_instance_segmentation_tpu.ops.msda_fused import msda_fused
from weed_instance_segmentation_tpu.ops.msda_packed import msda_packed

B = 4
hq = 100
shapes = ((hq, hq), (hq // 2, hq // 2), (hq // 4, hq // 4))
L = sum(h * w for h, w in shapes)
heads, dim, pts = 8, 32, 4
Q = L
rng = np.random.default_rng(0)
DT = jnp.float32
value = jnp.asarray(rng.standard_normal((B, L, heads, dim)), DT)
locs = jnp.asarray(rng.random((B, Q, heads, 3, pts, 2)) * 1.1 - 0.05, DT)
wts = jnp.asarray(rng.random((B, Q, heads, 3, pts)), DT)
wts = wts / wts.sum(axis=(-1, -2), keepdims=True)

ref = jax.jit(lambda v, l, w: msda_reference(v.astype(jnp.float32), shapes, l.astype(jnp.float32), w.astype(jnp.float32)))
fus = jax.jit(lambda v, l, w: msda_fused(v, shapes, l, w))
pck = jax.jit(lambda v, l, w: msda_packed(v, shapes, l, w))

a = np.asarray(ref(value, locs, wts))
bf = np.asarray(fus(value, locs, wts)).astype(np.float32)
bp = np.asarray(pck(value, locs, wts)).astype(np.float32)
scale = np.abs(a).max()
print('fused  vs f32ref rel:', np.abs(bf - a).max() / scale, flush=True)
print('packed vs f32ref rel:', np.abs(bp - a).max() / scale, flush=True)
print('packed vs fused  rel:', np.abs(bp - bf).max() / scale, flush=True)

def timeit(name, f, iters=8):
    o = f(value, locs, wts); jax.block_until_ready(o)
    def round_():
        t0 = time.perf_counter(); d = jnp.float32(0.0)
        for _ in range(iters):
            d = d + f(value, locs, wts).astype(jnp.float32).reshape(-1)[0]
        float(d); return (time.perf_counter()-t0)/iters
    round_()
    print(f'{name}: {min(round_(), round_())*1000:.1f} ms', flush=True)

timeit('fused ', fus)
timeit('packed', pck)
