"""Benchmark harness: flagship Mask2Former throughput (inference + training).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N,
     "train_images_per_sec_chip": N, "train_step_ms": N, "train_duty_cycle": N}

Headline metric (BASELINE.json north star): Mask2Former Swin-L batched
INFERENCE images/sec/chip at the processor's working resolution for the
1024-long-side datasets (pheno_bench 1024×1024 → shortest-edge 800 →
800×800). The measured path is uint8-in end-to-end: the fused on-device
preprocess (processing/fused.py — MXU-matmul resize + normalize + pad) and
the model forward run as one XLA program chain per step.

The extra ``train_*`` keys time the full jitted TRAINING step (forward +
Hungarian matching + point-sampled losses + AdamW with GA=2, bf16 compute)
fed through the real host input pipeline (background-prefetch DataLoader →
static-pad collation → device transfer), and report the input duty cycle
(BASELINE config 5: ≥80%).

``vs_baseline`` compares against the PyTorch reference stack on CPU
(transformers==4.57.6, measured at the SAME batch/resolution with
``python bench.py --measure-baseline``, stored in BASELINE_MEASURED.json).

Env knobs: BENCH_MODE=all|infer|train, BENCH_BATCH, BENCH_HW, BENCH_ITERS,
BENCH_ARCH, BENCH_DTYPE, BENCH_TRAIN_BATCH, BENCH_MAX_INSTANCES.
"""

import json
import os
import sys
import time

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), 'BASELINE_MEASURED.json')

MODE = os.environ.get('BENCH_MODE', 'all')
BATCH = int(os.environ.get('BENCH_BATCH', '4'))
HW = int(os.environ.get('BENCH_HW', '800'))
HW_IN = int(os.environ.get('BENCH_HW_IN', '1024'))  # raw uint8 long side
ITERS = int(os.environ.get('BENCH_ITERS', '10'))
ARCH = os.environ.get('BENCH_ARCH', 'swin-large')
DTYPE = os.environ.get('BENCH_DTYPE', 'bfloat16')
# b4 exceeds v5e-1 HBM by ~0.6 GB even with remat (measured); b2 fits
TRAIN_BATCH = int(os.environ.get('BENCH_TRAIN_BATCH', '2'))
TRAIN_ITERS = int(os.environ.get('BENCH_TRAIN_ITERS', '8'))
MAX_INSTANCES = int(os.environ.get('BENCH_MAX_INSTANCES', '10'))


def _model(num_labels: int = 5, remat: bool = False):
    import jax.numpy as jnp

    from weed_instance_segmentation_tpu.engine.model_utils import config_for_arch, init_params
    from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

    cfg = config_for_arch(ARCH, num_labels=num_labels)
    model = Mask2Former(cfg, dtype=jnp.dtype(DTYPE), remat=remat)
    params = init_params(model, cfg, image_hw=(128, 128))
    return cfg, model, params


def measure_infer() -> float:
    """uint8 (B, HW_IN, HW_IN, 3) → fused device preprocess → forward."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weed_instance_segmentation_tpu.engine.steps import make_forward_fn
    from weed_instance_segmentation_tpu.processing.fused import fused_preprocess

    _, model, params = _model()
    forward = make_forward_fn(model)

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, size=(BATCH, HW_IN, HW_IN, 3), dtype=np.uint8))

    @jax.jit
    def reduce_out(out):
        # scalar feedback serializes iterations and defeats any async
        # enqueue-without-execute behavior in tunneled backends
        return out.class_queries_logits.mean() + out.masks_queries_logits.mean()

    def step(params, raw, jitter):
        # preprocess and forward as two dispatches: inlining the uint8
        # resize chain into the Swin-L program sent XLA's fusion search
        # pathological (>9 min compile vs ~2 s + ~40 s separately)
        pixel_values, _ = fused_preprocess(raw + jitter, (HW, HW), (HW, HW))
        return reduce_out(forward(params, pixel_values))

    float(step(params, raw, jnp.uint8(0)))  # warmup / compile

    def round_():
        t0 = time.perf_counter()
        delta = jnp.uint8(0)
        for _ in range(ITERS):
            delta = (step(params, raw, delta) > 1e30).astype(jnp.uint8)
        float(delta)  # device_get: full chain executed
        return time.perf_counter() - t0

    # first measured round through a tunneled backend can include lazy
    # transfers / server-side warmup (observed 68s vs 0.4s steady) — run two
    # rounds and report the steady one
    round_()
    dt = round_()
    return BATCH * ITERS / dt


def measure_train() -> dict:
    """Full jitted train step (Swin-L bf16, GA=2) fed by the real host
    input pipeline; reports img/s/chip, step time, and input duty cycle."""
    import jax
    import numpy as np

    from weed_instance_segmentation_tpu.datasets.dataset_utils import pad_batch_static
    from weed_instance_segmentation_tpu.datasets.loader import DataLoader, prefetch_iterator
    from weed_instance_segmentation_tpu.engine.steps import (
        create_train_state, make_train_step,
    )
    from weed_instance_segmentation_tpu.parallel.mesh import (
        create_mesh, replicate_tree, shard_batch,
    )

    # remat: Swin-L 800² training activations exceed HBM without it.
    # BENCH_REMAT: 1 (backbone+encoder), encoder (encoder only), 0 (off)
    remat_env = os.environ.get('BENCH_REMAT', '1')
    remat = {'0': False, '1': True}.get(remat_env, remat_env)
    cfg, model, params = _model(remat=remat)
    state, tx = create_train_state(params, 5e-5, gradient_accumulation=2)
    train_step = make_train_step(model, cfg, tx)
    mesh = create_mesh()
    # pre-place the state with its steady sharding: otherwise call 1 (numpy
    # state) and call 2 (device state) have different arg shardings and the
    # step compiles TWICE (~4-8 min each through the tunnel)
    state = replicate_tree(state, mesh)

    rng = np.random.default_rng(0)

    class Synth:
        """Synthetic samples in the preprocessed-cache schema. A small pool
        is pre-generated so per-item host cost resembles reading the .npz
        cache (the real path), not numpy RNG throughput; masks are uint8
        binary exactly like the cache stores them."""

        _POOL = 8

        def __init__(self):
            self._samples = []
            for i in range(self._POOL):
                r = np.random.default_rng(i)
                n_inst = MAX_INSTANCES
                masks = np.zeros((n_inst, HW, HW), np.uint8)
                for j in range(n_inst):
                    y, x = r.integers(0, HW - 64, size=2)
                    masks[j, y : y + 64, x : x + 64] = 1
                self._samples.append({
                    'pixel_values': r.standard_normal((3, HW, HW)).astype(np.float32),
                    'mask_labels': masks,
                    'class_labels': r.integers(0, cfg.num_labels, size=(n_inst,)),
                })

        def __len__(self):
            return TRAIN_BATCH * (TRAIN_ITERS + 4)

        def __getitem__(self, i):
            return dict(self._samples[i % self._POOL], file_name=f'synth_{i}.png')

    def collate(items):
        return {
            'pixel_values': [it['pixel_values'] for it in items],
            'mask_labels': [it['mask_labels'] for it in items],
            'class_labels': [it['class_labels'] for it in items],
            'file_names': [it['file_name'] for it in items],
        }

    loader = DataLoader(Synth(), TRAIN_BATCH, shuffle=False, collate=collate, prefetch=2)

    def device_batches():
        for batch in loader:
            samples = [
                {'pixel_values': batch['pixel_values'][k],
                 'mask_labels': batch['mask_labels'][k],
                 'class_labels': batch['class_labels'][k]}
                for k in range(len(batch['file_names']))
            ]
            yield shard_batch(pad_batch_static(samples, (HW, HW), MAX_INSTANCES), mesh)

    key = jax.random.PRNGKey(0)
    # pad+transfer prefetched off the dispatch thread, as in the train driver
    it = prefetch_iterator(device_batches(), depth=2)
    # warmup: 2 steps (compile + MultiSteps inner path)
    for _ in range(2):
        state, loss = train_step(state, next(it), key)
    float(loss)

    input_wait = 0.0
    device_time = 0.0
    t0 = time.perf_counter()
    t_mark = t0
    steps = 0
    for batch in it:
        t_have = time.perf_counter()
        input_wait += t_have - t_mark
        state, loss = train_step(state, batch, key)
        if steps == TRAIN_ITERS - 1:
            float(loss)  # drain the async chain before the last timestamp
        t_mark = time.perf_counter()
        device_time += t_mark - t_have
        steps += 1
        if steps >= TRAIN_ITERS:
            break
    dt = time.perf_counter() - t0
    return {
        'train_images_per_sec_chip': round(TRAIN_BATCH * steps / dt, 4),
        'train_step_ms': round(1000 * dt / steps, 1),
        'train_duty_cycle': round(device_time / max(input_wait + device_time, 1e-9), 4),
    }


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


def measure_torch_train_baseline(iters: int = 2) -> float:
    """The reference stack's TRAINING step on CPU: HF Mask2Former Swin-L
    forward-with-labels + backward + AdamW at the train-bench config
    (BASELINE.md config 5's denominator)."""
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
    model = hf.Mask2FormerForUniversalSegmentation(cfg).train()
    opt = torch.optim.AdamW(model.parameters(), lr=5e-5)
    rng = np.random.default_rng(0)
    x = torch.from_numpy(
        rng.standard_normal((TRAIN_BATCH, 3, HW, HW)).astype(np.float32)
    )
    masks = [
        torch.from_numpy((rng.random((MAX_INSTANCES, HW, HW)) > 0.9).astype(np.float32))
        for _ in range(TRAIN_BATCH)
    ]
    classes = [
        torch.from_numpy(rng.integers(0, 5, (MAX_INSTANCES,)))
        for _ in range(TRAIN_BATCH)
    ]

    def step():
        out = model(pixel_values=x, mask_labels=masks, class_labels=classes)
        out.loss.backward()
        opt.step()
        opt.zero_grad()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    return TRAIN_BATCH * iters / dt


def main():
    if '--measure-baseline' in sys.argv:
        ips = measure_torch_baseline()
        baseline = {
            'torch_cpu_images_per_sec': ips,
            'arch': ARCH, 'batch': BATCH, 'hw': HW,
            'stack': 'torch-cpu transformers==4.57.6',
        }
        if '--train' in sys.argv:
            baseline['torch_cpu_train_images_per_sec'] = measure_torch_train_baseline()
            baseline['train_batch'] = TRAIN_BATCH
        with open(BASELINE_FILE, 'w') as f:
            json.dump(baseline, f, indent=2)
        print(json.dumps({k: v for k, v in baseline.items() if 'images_per_sec' in k}))
        return

    result = {}
    if MODE in ('all', 'infer'):
        value = measure_infer()
        baseline = None
        if os.path.exists(BASELINE_FILE):
            with open(BASELINE_FILE) as f:
                baseline = json.load(f).get('torch_cpu_images_per_sec')
        result.update({
            'metric': f'mask2former_{ARCH}_e2e_inference_{HW}x{HW}_b{BATCH}_{DTYPE}',
            'value': round(value, 4),
            'unit': 'images/sec/chip',
            'vs_baseline': round(value / baseline, 4) if baseline else 1.0,
        })
    if MODE == 'all':
        # isolate train mode in a subprocess with a hard timeout: a remote-
        # compile hang or HBM OOM must never lose the inference number
        import subprocess

        # observed full train-mode wall time through the tunnel: 13-19 min
        # healthy, up to ~37 min with a degraded compile server
        budget = int(os.environ.get('BENCH_TRAIN_TIMEOUT', '2700'))
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env={**os.environ, 'BENCH_MODE': 'train'},
                capture_output=True, text=True, timeout=budget,
            )
            lines = [l for l in p.stdout.strip().splitlines() if l.startswith('{')]
            sub = json.loads(lines[-1]) if lines else {}
            train = {k: v for k, v in sub.items() if k.startswith('train_')}
            if not train:
                train = {'train_error': (p.stdout + p.stderr)[-200:]}
        except subprocess.TimeoutExpired:
            train = {'train_error': f'train bench exceeded {budget}s (compile hang?)'}
        result.update(train)
    if MODE == 'train':
        try:
            train = measure_train()
        except Exception as e:  # never lose the JSON line to a train failure
            train = {'train_error': f'{type(e).__name__}: {e}'[:200]}
        if 'train_images_per_sec_chip' in train and os.path.exists(BASELINE_FILE):
            with open(BASELINE_FILE) as f:
                tb = json.load(f).get('torch_cpu_train_images_per_sec')
            if tb:
                train['train_vs_baseline'] = round(
                    train['train_images_per_sec_chip'] / tb, 4
                )
        if 'train_images_per_sec_chip' in train:
            result.update({
                'metric': f'mask2former_{ARCH}_train_{HW}x{HW}_b{TRAIN_BATCH}_{DTYPE}',
                'value': train['train_images_per_sec_chip'],
                'unit': 'images/sec/chip',
                'vs_baseline': train.get('train_vs_baseline', 1.0),
            })
        result.update(train)
    print(json.dumps(result))


if __name__ == '__main__':
    main()
