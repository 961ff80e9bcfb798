"""Benchmark harness: flagship Mask2Former inference throughput.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}

The workload is the north-star metric from BASELINE.json: Mask2Former
(Swin-L, the reference's checkpoint family) batched inference at the
processor's working resolution for the 1024-long-side datasets
(pheno_bench 1024×1024 → shortest-edge 800 → 800×800).

``vs_baseline`` compares against the PyTorch reference on CPU
(transformers==4.57.6, the exact stack the reference runs —
SURVEY.md §6: the reference publishes no numbers, so the baseline is
measured once with ``python bench.py --measure-baseline`` and stored in
BASELINE_MEASURED.json).
"""

import json
import os
import sys
import time

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'BASELINE_MEASURED.json')

BATCH = int(os.environ.get('BENCH_BATCH', '4'))
HW = int(os.environ.get('BENCH_HW', '800'))
ITERS = int(os.environ.get('BENCH_ITERS', '10'))
ARCH = os.environ.get('BENCH_ARCH', 'swin-large')
DTYPE = os.environ.get('BENCH_DTYPE', 'bfloat16')


def measure_ours() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weed_instance_segmentation_tpu.engine.model_utils import config_for_arch, init_params
    from weed_instance_segmentation_tpu.engine.steps import make_forward_fn
    from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

    cfg = config_for_arch(ARCH, num_labels=5)
    model = Mask2Former(cfg, dtype=jnp.dtype(DTYPE))
    params = init_params(model, cfg, image_hw=(128, 128))
    forward = make_forward_fn(model)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BATCH, 3, HW, HW)), jnp.float32)

    @jax.jit
    def step(params, x):
        out = forward(params, x)
        # scalar feedback serializes iterations and defeats any async
        # enqueue-without-execute behavior in tunneled backends
        return out.class_queries_logits.mean() + out.masks_queries_logits.mean()

    # warmup / compile
    float(step(params, x))

    def round_():
        t0 = time.perf_counter()
        delta = jnp.float32(0.0)
        for _ in range(ITERS):
            delta = step(params, x + delta * 1e-12)
        float(delta)  # device_get: full chain executed
        return time.perf_counter() - t0

    # first measured round through a tunneled backend can include lazy
    # transfers / server-side warmup (observed 68s vs 0.4s steady) — run two
    # rounds and report the steady one
    round_()
    dt = round_()
    return BATCH * ITERS / dt


def measure_torch_baseline(iters: int = 2) -> float:
    """The PyTorch reference stack on CPU: HF Mask2Former Swin-L forward."""
    import numpy as np
    import torch
    from transformers.models.mask2former import modeling_mask2former as hf
    from transformers.models.swin.configuration_swin import SwinConfig as HFSwinConfig

    swin = HFSwinConfig(
        embed_dim=192, depths=[2, 2, 18, 2], num_heads=[6, 12, 24, 48],
        window_size=12, out_features=['stage1', 'stage2', 'stage3', 'stage4'],
        use_absolute_embeddings=False,
    )
    cfg = hf.Mask2FormerConfig(backbone_config=swin, num_queries=200, num_labels=5)
    model = hf.Mask2FormerForUniversalSegmentation(cfg).eval()
    x = torch.from_numpy(
        np.random.default_rng(0).standard_normal((BATCH, 3, HW, HW)).astype(np.float32)
    )
    with torch.no_grad():
        model(pixel_values=x)  # warmup
        t0 = time.perf_counter()
        for _ in range(iters):
            model(pixel_values=x)
        dt = time.perf_counter() - t0
    return BATCH * iters / dt


def main():
    if '--measure-baseline' in sys.argv:
        ips = measure_torch_baseline()
        with open(BASELINE_FILE, 'w') as f:
            json.dump(
                {
                    'torch_cpu_images_per_sec': ips,
                    'arch': ARCH, 'batch': BATCH, 'hw': HW,
                    'stack': 'torch-cpu transformers==4.57.6',
                },
                f, indent=2,
            )
        print(json.dumps({'baseline_images_per_sec': ips}))
        return

    value = measure_ours()
    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f).get('torch_cpu_images_per_sec')
    vs = (value / baseline) if baseline else 1.0
    print(json.dumps({
        'metric': f'mask2former_{ARCH}_inference_{HW}x{HW}_b{BATCH}_{DTYPE}',
        'value': round(value, 4),
        'unit': 'images/sec/chip',
        'vs_baseline': round(vs, 4),
    }))


if __name__ == '__main__':
    main()
