"""Subprocess worker for tests/test_multihost.py.

Runs a short training loop through the REAL engine path — DataLoader with
per-host input sharding → ``_device_batches`` → jitted train step over the
global data mesh — on the CPU backend, either as a single 8-device process
or as one member of a 2-process × 4-device simulated cluster
(``jax.distributed`` over localhost + gloo CPU collectives).

Launched with PYTHONPATH excluding the image's axon sitecustomize so the
CPU platform selection sticks (the sitecustomize force-registers the TPU
tunnel backend).

argv[1] is a JSON config: {pid, nproc, port, devices, out, steps, mp}.
``mp`` > 1 builds the 2-D ('data','model') mesh and weight-shards the train
state over 'model' (parallel.mesh.shard_tree); the final state is then
assembled host-locally via ``fetch_tree`` — the collective checkpoint path.
Writes the per-step loss sequence (+ a params checksum) as JSON to ``out``
(process 0 only).
"""

import json
import os
import sys


def build_dataset(n_samples: int = 10, h: int = 64, w: int = 64):
    """Deterministic synthetic samples in the preprocessed-cache schema
    (identical on every process — seeded host RNG). ``original_map`` /
    ``id_to_semantic`` carry the real instances so the metrics path
    (GT rebuild in engine/metrics.py) evaluates meaningfully."""
    import numpy as np

    rng = np.random.default_rng(1234)
    data = []
    for i in range(n_samples):
        n_inst = int(rng.integers(1, 4))
        masks = np.zeros((n_inst, h, w), np.float32)
        original_map = np.full((h, w), 255, np.int32)  # 255 = ignore/background
        id_to_semantic = {}
        classes = rng.integers(0, 3, size=(n_inst,)).astype(np.int64)
        for j in range(n_inst):
            y, x = rng.integers(0, h - 16), rng.integers(0, w - 16)
            masks[j, y : y + 16, x : x + 16] = 1.0
            original_map[y : y + 16, x : x + 16] = j + 1
            id_to_semantic[j + 1] = int(classes[j])
        data.append({
            'pixel_values': rng.standard_normal((3, h, w)).astype(np.float32),
            'mask_labels': masks,
            'class_labels': classes,
            'target_size': (h, w),
            'original_map': original_map,
            'id_to_semantic': id_to_semantic,
            'file_name': f'sample_{i:03d}.png',
        })
    return data


def _kv_barrier(name: str, pid: int, nproc: int) -> None:
    """Rendezvous via the coordination-service KV store — NOT a gloo
    collective. Gloo context initialization has a hard 30 s timeout baked
    into the C++ KV store, so any program point where one process can lag
    more than 30 s behind its partner (first train-step compile on a
    starved 1-core CI host: two workers contending for one core) must be
    lined up BEFORE the first collective executes. The coordination
    service's own timeouts are minutes, so this barrier absorbs the skew
    the gloo handshake cannot."""
    from jax._src import distributed

    client = distributed.global_state.client
    client.key_value_set(f'{name}/{pid}', 'ok')
    for p in range(nproc):
        client.blocking_key_value_get(f'{name}/{p}', 600_000)


def main():
    cfg = json.loads(sys.argv[1])

    import jax

    jax.config.update('jax_platforms', 'cpu')
    jax.config.update('jax_num_cpu_devices', int(cfg['devices']))
    jax.config.update('jax_default_matmul_precision', 'highest')
    if cfg['nproc'] > 1:
        os.environ['WISTPU_COORDINATOR'] = f"localhost:{cfg['port']}"
        os.environ['WISTPU_NUM_PROCESSES'] = str(cfg['nproc'])
        os.environ['WISTPU_PROCESS_ID'] = str(cfg['pid'])

    from weed_instance_segmentation_tpu.datasets.loader import DataLoader
    from weed_instance_segmentation_tpu.engine.model_utils import init_params
    from weed_instance_segmentation_tpu.engine.steps import (
        create_train_state, make_train_step,
    )
    from weed_instance_segmentation_tpu.engine.train import _device_batches
    from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
    from weed_instance_segmentation_tpu.models.mask2former import Mask2Former
    from weed_instance_segmentation_tpu.parallel.mesh import (
        create_mesh, fetch_tree, maybe_initialize_distributed, replicate_tree,
        shard_tree,
    )

    multihost = maybe_initialize_distributed()
    assert jax.process_count() == cfg['nproc'], (jax.process_count(), cfg['nproc'])
    assert jax.device_count() == 8, jax.device_count()

    from weed_instance_segmentation_tpu.engine import checkpoint as ckpt

    model_cfg = Mask2FormerConfig.tiny_test(num_labels=3)
    model = Mask2Former(model_cfg)
    params = init_params(model, model_cfg, image_hw=(64, 64))
    state, tx = create_train_state(params, 1e-4, gradient_accumulation=2)
    start_epoch = 0
    if cfg.get('resume_from'):
        # the real resume path: keyed opt-state restore + epoch carry-over
        state, meta = ckpt.load_train_checkpoint(cfg['resume_from'], state)
        start_epoch = int(meta['epoch'])
    mp = int(cfg.get('mp', 1))
    mesh = create_mesh(None, mp)
    if mp > 1:
        # tiny-test weights sit below the production threshold — lower it so
        # some leaves really shard across the model axis
        state = shard_tree(state, mesh, min_weight_size=256)
    elif multihost:
        state = replicate_tree(state, mesh)
    train_step = make_train_step(model, model_cfg, tx)

    batch_size = 8  # 10 samples → one full batch + one partial (padding path)
    loader = DataLoader(
        build_dataset(), batch_size, shuffle=True, seed=7, prefetch=0,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )
    # resumed runs continue the shuffle sequence (engine/train.py does the
    # same via set_epoch after restore)
    loader.set_epoch(start_epoch)

    rng = jax.random.PRNGKey(42)
    losses = []
    precompiled = not multihost
    for _ in range(start_epoch, int(cfg.get('epochs', 2))):
        for batch in _device_batches(loader, (64, 64), 4, mesh, batch_size):
            if not precompiled:
                # compile WITHOUT executing (lower/compile runs no
                # collective), then rendezvous so both processes enter the
                # first gloo context init together (see _kv_barrier)
                train_step.lower(state, batch, rng).compile()
                _kv_barrier('train_step_compiled', cfg['pid'], cfg['nproc'])
                precompiled = True
            state, loss = train_step(state, batch, rng)
            losses.append(float(loss))

    # the collective checkpoint path: every process assembles a host-local
    # copy (model-sharded leaves cross hosts via process_allgather)
    import numpy as np

    fetched = fetch_tree(state)
    for init_leaf, out_leaf in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(fetched.params)
    ):
        assert np.shape(out_leaf) == np.shape(init_leaf)
    param_sum = float(
        sum(np.abs(leaf).sum() for leaf in jax.tree_util.tree_leaves(fetched.params))
    )

    if cfg.get('save_to') and jax.process_index() == 0:
        ckpt.save_train_checkpoint(
            cfg['save_to'], fetched, extra={'epoch': int(cfg.get('epochs', 2))}
        )

    result = {'losses': losses, 'param_sum': param_sum}

    if cfg.get('test_metrics'):
        # the distributed test phase: each host reads only ITS 1/P slice of
        # the split, post-processes its own rows of the sharded forward, and
        # the per-image metric entries merge on host 0 (engine/metrics.py)
        from weed_instance_segmentation_tpu.datasets.dataset_utils import collate_fn
        from weed_instance_segmentation_tpu.engine.metrics import test_with_metrics
        from weed_instance_segmentation_tpu.engine.steps import make_forward_fn

        class CountingDataset:
            """Asserts the no-read-amplification contract: this host must
            read at most ceil(n / nproc) + per-batch-repeat samples."""

            def __init__(self, data):
                self.data = data
                self.reads = 0

            def __len__(self):
                return len(self.data)

            def __getitem__(self, i):
                self.reads += 1
                return self.data[i]

        counting = CountingDataset(build_dataset())
        test_loader = DataLoader(
            counting, 4, shuffle=False, collate=collate_fn, prefetch=0,
            process_index=jax.process_index(), process_count=jax.process_count(),
        )
        metrics = test_with_metrics(
            make_forward_fn(model), state.params, test_loader, mesh=mesh,
            pad_hw=(64, 64),
        )
        n_batches = len(test_loader)
        local_bs = 4 // jax.process_count()
        assert counting.reads <= n_batches * local_bs, (
            f'test phase read {counting.reads} samples on one host; '
            f'expected ≤ {n_batches * local_bs}'
        )
        if jax.process_index() == 0:
            result['test_map'] = float(np.asarray(metrics['map']))
            result['test_map_50'] = float(np.asarray(metrics['map_50']))
            result['test_mar_100'] = float(np.asarray(metrics['mar_100']))

    if jax.process_index() == 0:
        with open(cfg['out'], 'w') as f:
            json.dump(result, f)
    print(f"worker {cfg['pid']}/{cfg['nproc']} done: {losses}", flush=True)


if __name__ == '__main__':
    main()
