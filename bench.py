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
    """uint8 (B, HW_IN, HW_IN, 3) → fused device preprocess → forward →
    device post-process (the full serving chain — VERDICT r2 weak #3: the
    metric is named e2e, so post-processing is now in the timed path;
    BENCH_POSTPROC=0 reverts to forward-only for A/B)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weed_instance_segmentation_tpu.engine.steps import make_forward_fn
    from weed_instance_segmentation_tpu.processing.fused import fused_preprocess
    from weed_instance_segmentation_tpu.processing.postprocess import (
        post_process_instance_arrays,
    )

    postproc = os.environ.get('BENCH_POSTPROC', '1') == '1'
    _, model, params = _model()
    forward = make_forward_fn(model)

    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, size=(BATCH, HW_IN, HW_IN, 3), dtype=np.uint8))

    @jax.jit
    def reduce_out(out):
        # scalar feedback serializes iterations and defeats any async
        # enqueue-without-execute behavior in tunneled backends. The
        # post-process reduce lives in the SAME dispatch: each jitted call
        # through the tunnel costs ~2 ms fixed (tools/profile_postprocess.py
        # score_chain: 1.9 ms for KB-scale tensors), so the scalar reduce and
        # the post-process must not pay that twice.
        r = out.class_queries_logits.mean() + out.masks_queries_logits.mean()
        if postproc:
            # full device post-process (384² scoring, top-k, id map at
            # target size); reduced to a scalar so only the id-map/score
            # work remains after DCE — the (B,Q,H,W) binary-mask output is
            # not a serving deliverable here (the id map is) and would
            # dominate HBM traffic
            res = post_process_instance_arrays(
                out.class_queries_logits, out.masks_queries_logits,
                (HW, HW), 0.5, with_masks=False,
            )
            r = (
                r
                + res.segmentation.sum(dtype=jnp.int32).astype(jnp.float32)
                + res.scores.sum()
            )
        return r

    def step(params, raw, jitter):
        # preprocess and forward as two dispatches: inlining the uint8
        # resize chain into the Swin-L program sent XLA's fusion search
        # pathological (>9 min compile vs ~2 s + ~40 s separately)
        pixel_values, _ = fused_preprocess(raw + jitter, (HW, HW), (HW, HW))
        out = forward(params, pixel_values)
        return reduce_out(out)

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


def _synth_cache(num_labels: int) -> str:
    """Materialize (once) an on-disk ``.npz`` cache of synthetic samples in
    the REAL preprocessed-cache schema — full-size pixel_values, uint8 binary
    masks, full-res original_map — via the production ``process_and_save``.
    The train bench then pays the actual per-item cost of the training
    driver's input path (npz decode + f32 cast + static pad), answering
    VERDICT r2 weak #1 (the old 8-sample in-memory pool only *resembled* it).
    Reference cache contract: /root/reference/datasets/dataset_utils.py:7-70."""
    import numpy as np

    from weed_instance_segmentation_tpu.datasets.dataset_utils import process_and_save

    n_samples = TRAIN_BATCH * (TRAIN_ITERS + 4)
    cache_dir = os.environ.get(
        'BENCH_CACHE_DIR',
        f'/tmp/wistpu_bench_cache_{HW}_{MAX_INSTANCES}_{n_samples}',
    )
    sidecar = os.path.join(cache_dir, '_shapes.json')
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            if len(json.load(f)) >= n_samples:
                return cache_dir

    class SynthRaw:
        """8 distinct geometries cycled over n_samples files (distinct file
        names so every step reads from disk, like a real epoch)."""

        def __len__(self):
            return n_samples

        def __getitem__(self, i):
            r = np.random.default_rng(i % 8)
            masks = np.zeros((MAX_INSTANCES, HW, HW), np.uint8)
            for j in range(MAX_INSTANCES):
                y, x = r.integers(0, HW - 64, size=2)
                masks[j, y : y + 64, x : x + 64] = 1
            return {
                'pixel_values': r.standard_normal((3, HW, HW)).astype(np.float32),
                'mask_labels': masks,
                'class_labels': r.integers(0, num_labels, size=(MAX_INSTANCES,)),
                'target_size': (HW, HW),
                'original_map': np.zeros((HW, HW), np.int32),
                'id_to_semantic': {j + 1: 0 for j in range(MAX_INSTANCES)},
                'file_name': f'synth_{i:04d}.png',
            }

    process_and_save(SynthRaw(), output_dir=cache_dir)
    return cache_dir


def measure_train() -> dict:
    """Full jitted train step (Swin-L bf16, GA=2) fed by the training
    driver's ACTUAL input path (PreprocessedDataset over an on-disk .npz
    cache → DataLoader → static-pad collation → device transfer); reports
    img/s/chip, step time, and TWO duty cycles: host-derived (fraction of
    the loop not blocked on input) and device-derived (pure-device step
    time × steps / pipelined wall — free of async-dispatch skew, VERDICT
    r2 weak #5)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from weed_instance_segmentation_tpu.datasets.dataset_utils import (
        TRAIN_SAMPLE_KEYS, PreprocessedDataset, make_train_collate,
    )
    from weed_instance_segmentation_tpu.datasets.loader import DataLoader, prefetch_iterator
    from weed_instance_segmentation_tpu.engine.steps import (
        create_train_state, make_train_step,
    )
    from weed_instance_segmentation_tpu.engine.train import _device_batches
    from weed_instance_segmentation_tpu.parallel.mesh import create_mesh, replicate_tree

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

    cache_dir = _synth_cache(cfg.num_labels)
    # the training driver's fast input path (engine/train.py): keys-filtered
    # npz decode + single-pass static collate + wire encode, all in the
    # loader thread; BENCH_FASTPATH=0 reverts to the staged r3 path for A/B
    fastpath = os.environ.get('BENCH_FASTPATH', '1') == '1'
    if fastpath:
        dataset = PreprocessedDataset(cache_dir, keys=TRAIN_SAMPLE_KEYS)
        collate = make_train_collate(
            (HW, HW), MAX_INSTANCES, TRAIN_BATCH,
            pixels_dtype=(jnp.bfloat16 if DTYPE == 'bfloat16' else None),
        )
    else:
        from weed_instance_segmentation_tpu.datasets.dataset_utils import collate_fn

        dataset = PreprocessedDataset(cache_dir)
        collate = collate_fn

    def fresh_iter():
        loader = DataLoader(dataset, TRAIN_BATCH, shuffle=False, prefetch=2,
                            collate=collate)
        return prefetch_iterator(
            _device_batches(loader, (HW, HW), MAX_INSTANCES, mesh, TRAIN_BATCH),
            depth=2,
        )

    key = jax.random.PRNGKey(0)
    it = fresh_iter()
    # warmup: 2 steps (compile + MultiSteps inner path)
    for _ in range(2):
        state, loss = train_step(state, next(it), key)
    float(loss)

    # --- phase 1: pure device step time (input pipeline excluded) --------
    # two preloaded batches alternate; iterations chain through the donated
    # state, and the final float() drains the chain (tunnel timing rule)
    pre = [next(it), next(it)]
    t0 = time.perf_counter()
    for k in range(TRAIN_ITERS):
        state, loss = train_step(state, pre[k % 2], key)
    float(loss)
    t_dev_step = (time.perf_counter() - t0) / TRAIN_ITERS
    del pre

    # --- phase 2: pipelined run through the real input path --------------
    input_wait = 0.0
    device_time = 0.0
    t0 = time.perf_counter()
    t_mark = t0
    steps = 0
    for batch in fresh_iter():
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
        'train_device_step_ms': round(1000 * t_dev_step, 1),
        'train_duty_cycle': round(device_time / max(input_wait + device_time, 1e-9), 4),
        'train_duty_cycle_device': round(min(t_dev_step * steps / dt, 1.0), 4),
        'train_input': 'disk_npz_cache',
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
    (BASELINE.md config 5's denominator). Workload-matched to our train
    bench (VERDICT r2 weak #6): the SAME 64×64-box mask generator our
    synthetic cache uses, and the reference's GA accounting
    (loss/GA → backward each micro-batch, optimizer step every GA —
    /root/reference/models/mask2former/train.py:196-206)."""
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
    ga = 2  # reference config.py GRADIENT_ACCUMULATION, as in our train bench
    rng = np.random.default_rng(0)
    x = torch.from_numpy(
        rng.standard_normal((TRAIN_BATCH, 3, HW, HW)).astype(np.float32)
    )
    masks = []
    for b in range(TRAIN_BATCH):
        r = np.random.default_rng(b % 8)
        m = np.zeros((MAX_INSTANCES, HW, HW), np.float32)
        for j in range(MAX_INSTANCES):
            y, xx = r.integers(0, HW - 64, size=2)
            m[j, y : y + 64, xx : xx + 64] = 1.0
        masks.append(torch.from_numpy(m))
    classes = [
        torch.from_numpy(rng.integers(0, 5, (MAX_INSTANCES,)))
        for _ in range(TRAIN_BATCH)
    ]

    def micro_step(step):
        out = model(pixel_values=x, mask_labels=masks, class_labels=classes)
        (out.loss / ga).backward()
        if (step + 1) % ga == 0:
            opt.step()
            opt.zero_grad()

    micro_step(0)  # warmup (no optimizer update, like our 2-step warmup)
    t0 = time.perf_counter()
    for k in range(iters):
        micro_step(k + 1)
    dt = time.perf_counter() - t0
    return TRAIN_BATCH * iters / dt


def _wait_for_backend() -> bool:
    """Poll until the JAX backend accepts clients (subprocess probe, so a
    failed init can't poison this process's backend cache).

    The tunneled TPU backend goes fully unavailable for stretches (client
    init fails 'Unavailable', or a trivial program never returns); a bench
    run launched into such a window would fail outright. Wait up to
    BENCH_HEALTH_WAIT seconds (default 900) for a 128² matmul to succeed.
    """
    import subprocess

    deadline = time.time() + float(os.environ.get('BENCH_HEALTH_WAIT', '900'))
    # import the package first: it re-asserts JAX_PLATFORMS against the
    # plugin's force-override, so a CPU-directed bench probes CPU
    probe = ('import weed_instance_segmentation_tpu, jax, jax.numpy as jnp; '
             'print(float((jnp.ones((128,128)) @ jnp.ones((128,128))).sum()))')
    env = dict(os.environ)
    env['PYTHONPATH'] = (os.path.dirname(os.path.abspath(__file__))
                         + os.pathsep + env.get('PYTHONPATH', ''))
    while True:
        try:
            r = subprocess.run([sys.executable, '-c', probe],
                               capture_output=True, timeout=300, env=env)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        if time.time() > deadline:
            print(json.dumps({'error': 'backend unhealthy past BENCH_HEALTH_WAIT'}),
                  file=sys.stderr)
            return False
        print('backend unhealthy; retrying...', file=sys.stderr, flush=True)
        time.sleep(60)


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

    if MODE != 'train':  # the train subprocess inherits a vetted backend
        _wait_for_backend()
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
            'includes_postprocess': os.environ.get('BENCH_POSTPROC', '1') == '1',
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
