"""Training driver (SURVEY.md C10; reference models/mask2former/train.py).

Same orchestration as the reference, re-hosted on the TPU stack:

- unified label maps with first-wins collision warnings (train.py:40-61);
- lazy per-split preprocessing into the .npz cache (train.py:95-126);
- concatenated multi-dataset loaders (train.py:133-164);
- epoch loop with gradient accumulation (GA inside the jitted step via
  optax.MultiSteps — train.py:196-206), per-epoch val loss (train.py:18-37,
  averaged per batch like the reference's ``/len(data_loader)`` quirk
  §2.5.10), best-val checkpointing (train.py:221-226), final save, test
  phase on the best model (train.py:238-258);
- ``metadata.json`` with the reference's exact keys and phase timings
  (train.py:275-311), written up-front for crash forensics, the whole
  train() wrapped in try/except returning partial metadata (train.py:270).

TPU-first: one static batch shape for the whole run (computed from the
cache sidecars) so the train step compiles exactly once; batches are
sharded over the 1-D data mesh; everything between host batch assembly and
the loss scalar is a single XLA program.
"""

from __future__ import annotations

import json
import os
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu import config
from weed_instance_segmentation_tpu.datasets.dataset_utils import (
    TRAIN_SAMPLE_KEYS, ConcatDataset, PreprocessedDataset, collate_fn,
    compute_static_pad_hw, make_train_collate, pad_batch_static,
    process_and_save,
)
from weed_instance_segmentation_tpu.datasets.factory import get_dataset_and_config
from weed_instance_segmentation_tpu.datasets.loader import DataLoader, prefetch_iterator
from weed_instance_segmentation_tpu.engine import checkpoint as ckpt
from weed_instance_segmentation_tpu.engine.metrics import (
    prepare_metrics_for_json, print_metrics_evaluation, test_with_metrics,
)
from weed_instance_segmentation_tpu.engine.model_utils import build_model, default_processor
from weed_instance_segmentation_tpu.engine.steps import (
    create_train_state, make_eval_step, make_forward_fn, make_train_step,
)
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former
from weed_instance_segmentation_tpu.parallel.mesh import (
    create_mesh, fetch_tree, maybe_initialize_distributed, replicate_tree,
    shard_batch, shard_tree,
)
from weed_instance_segmentation_tpu.processing.wire import encode_batch

SPECIFIC_OUTPUT_DIR = os.path.join(config.MODELS_OUTPUT_DIR, 'mask2former_fine_tuned/')


def _wire_enabled() -> bool:
    """Host→device wire codec (processing/wire.py); on by default, settable
    off for debugging transfers. Read per use so tests/notebooks can flip
    WISTPU_WIRE after import (ADVICE r3)."""
    return os.environ.get('WISTPU_WIRE', '1') == '1'


def get_unified_labels(dataset_list: list) -> tuple[dict, dict]:
    """Merge per-dataset ID2LABEL maps; first label wins on id collision with
    a warning (reference train.py:40-61, quirk §2.5.9)."""
    unified_id2label: dict = {}
    for ds_name in dataset_list:
        _, ds_config = get_dataset_and_config(ds_name)
        for id_num, label in ds_config.ID2LABEL.items():
            if id_num in unified_id2label and unified_id2label[id_num] != label:
                print(
                    f'WARNING: ID collision for {id_num} '
                    f'({unified_id2label[id_num]} vs {label}). '
                    f'Keeping {unified_id2label[id_num]}.'
                )
            else:
                unified_id2label[id_num] = label
    unified_label2id = {v: k for k, v in unified_id2label.items()}
    print(f'Unified Classes: {unified_id2label}')
    return unified_id2label, unified_label2id


def format_duration(start_dt: datetime, end_dt: datetime) -> str:
    return str(end_dt - start_dt).split('.')[0]


def _round_up(n: int, k: int) -> int:
    return -(-n // k) * k


def _device_batches(loader, pad_hw, max_instances, mesh, batch_size):
    """Static-pad + shard each ragged host batch. Partial final batches are
    padded with repeats of the last sample to keep the static batch shape;
    the repeats are marked invalid in ``sample_valid`` so the loss excludes
    them — batch averages match the reference's true-batch averaging
    (train.py:18-37).

    Multi-host: the loader already yields this host's 1/process_count slice
    of the global batch (with ``num_valid`` marking trailing repeats), so
    padding here targets the LOCAL batch size and ``shard_batch`` assembles
    the global array from process-local rows.

    Loaders collating with ``make_train_collate`` yield device-ready static
    batches (the fast input path); those only need the multi-host
    ``num_valid`` re-zeroing and sharding here."""
    local_bs = batch_size // jax.process_count()
    wire = _wire_enabled()
    for batch in loader:
        if 'sample_valid' in batch:  # already statically collated
            n = batch.pop('num_valid', local_bs)
            if n < local_bs:
                batch['sample_valid'][n:] = 0.0
                batch['instance_valid'][n:] = 0.0
            yield shard_batch(batch, mesh)
            continue
        n_samples = len(batch['file_names'])
        n = batch.get('num_valid', n_samples)
        samples = [
            {
                'pixel_values': batch['pixel_values'][k],
                'mask_labels': batch['mask_labels'][k],
                'class_labels': batch['class_labels'][k],
            }
            for k in range(n_samples)
        ]
        while len(samples) < local_bs:
            samples.append(samples[-1])
        device_batch = pad_batch_static(samples, pad_hw, max_instances)
        device_batch['sample_valid'][n:] = 0.0
        device_batch['instance_valid'][n:] = 0.0
        if wire:
            # bit-pack masks / extent-code pixel_mask / compute-dtype pixels
            # on the host; the jitted step unpacks (processing/wire.py) —
            # ~3.5× fewer bytes over the host→device link
            device_batch = encode_batch(
                device_batch,
                pixels_dtype=(jnp.bfloat16
                              if config.COMPUTE_DTYPE == 'bfloat16' else None),
            )
        yield shard_batch(device_batch, mesh)


def evaluate(eval_step, params, loader, pad_hw, max_instances, mesh, batch_size,
             description: str | None = None) -> float:
    """Average per-batch loss (reference evaluate, train.py:18-37)."""
    count = 0
    if description is not None:
        print(f'\tStarting {description}')
    rng = jax.random.PRNGKey(0)
    losses = []
    for i, batch in enumerate(prefetch_iterator(
        _device_batches(loader, pad_hw, max_instances, mesh, batch_size)
    )):
        # keep losses on device so dispatch pipelines; sync only to print
        loss = eval_step(params, batch, jax.random.fold_in(rng, i))
        losses.append(loss)
        count += 1
        if description is not None and (i + 1) % 10 == 0:
            print(f'\t\t{description} Step {i + 1}/{len(loader)} - Loss: {float(loss):.4f}')
    total = float(np.sum([float(l) for l in losses])) if losses else 0.0
    return total / max(count, 1)


def ensure_preprocessed(dataset_name: str, processor, unified_label2id: dict) -> dict:
    """Lazy per-split preprocessing (reference train.py:95-126). Returns the
    three processed dirs."""
    WeedDataset, ds_config = get_dataset_and_config(dataset_name)
    paths = {s: os.path.join(ds_config.PROCESSED_DIR, s)
             for s in ('Train', 'Validate', 'Test')}

    if hasattr(ds_config, 'TRAIN_VAL_TEST_SPLIT'):
        # dynamic-split datasets (crop_weed) have no per-split raw dirs —
        # delegate to the preprocess driver's seeded split (preprocess.py)
        from weed_instance_segmentation_tpu.datasets.preprocess import preprocess_dataset

        missing = any(
            not os.path.exists(p) or len(os.listdir(p)) == 0
            for s, p in paths.items()
            if ds_config.TRAIN_VAL_TEST_SPLIT[('Train', 'Validate', 'Test').index(s)] > 0
        )
        if missing or config.FORCE_PREPROCESSING:
            preprocess_dataset(dataset_name, processor, unified_label2id, force=True)
        # splits with ratio 0 have no directory; PreprocessedDataset handles
        # them as empty (warning + len 0), like the reference's missing dirs
        return paths

    for split, img_attr, ann_attr in (
        ('Train', 'TRAIN_IMG_DIR', 'TRAIN_ANNOTATIONS'),
        ('Validate', 'VAL_IMG_DIR', 'VAL_ANNOTATIONS'),
        ('Test', 'TEST_IMG_DIR', 'TEST_ANNOTATIONS'),
    ):
        proc_path = paths[split]
        needs = (
            not os.path.exists(proc_path)
            or len(os.listdir(proc_path)) == 0
            or config.FORCE_PREPROCESSING
        )
        if needs:
            print(f'\tPre-processing {dataset_name} {split} data...')
            raw = WeedDataset(
                image_folder_path=getattr(ds_config, img_attr),
                annotation_path=getattr(ds_config, ann_attr),
                processor=processor,
                label2id=unified_label2id,
            )
            process_and_save(raw, output_dir=proc_path)
    return paths


def train(output_dir: str, metadata: dict, dataset_list: list) -> dict:
    try:
        start_time = datetime.now()
        multihost = maybe_initialize_distributed()
        proc_idx, proc_cnt = jax.process_index(), jax.process_count()
        is_main = proc_idx == 0
        mesh = create_mesh(config.DATA_PARALLEL, config.MODEL_PARALLEL)
        print(
            f'Training on mesh: {dict(mesh.shape)} over {mesh.devices.size} device(s)'
            + (f', {proc_cnt} hosts (this is host {proc_idx})' if multihost else '')
        )

        # 1. unified labels + processor
        unified_id2label, unified_label2id = get_unified_labels(dataset_list)
        processor = default_processor()

        # 2. lazy preprocessing + cache datasets. Multi-host: host 0 fills
        # the cache (shared filesystem assumed, as on TPU pods), the rest
        # wait at a barrier then read it.
        train_datasets, val_datasets, test_datasets = [], [], []
        processed_dirs = []
        if multihost:
            from jax.experimental import multihost_utils
        for dataset_name in dataset_list:
            print(f'\n--- Preparing Dataset: {dataset_name} ---')
            if is_main:
                paths = ensure_preprocessed(dataset_name, processor, unified_label2id)
            if multihost:
                multihost_utils.sync_global_devices(f'preprocessed_{dataset_name}')
            if not is_main:
                _, ds_config = get_dataset_and_config(dataset_name)
                paths = {s: os.path.join(ds_config.PROCESSED_DIR, s)
                         for s in ('Train', 'Validate', 'Test')}
            # train/val only feed the jitted loss — decode just the three
            # keys it needs (fast input path); the test split keeps the full
            # reference sample schema (metrics rebuild GT from original_map)
            train_datasets.append(PreprocessedDataset(paths['Train'], keys=TRAIN_SAMPLE_KEYS))
            val_datasets.append(PreprocessedDataset(paths['Validate'], keys=TRAIN_SAMPLE_KEYS))
            test_datasets.append(PreprocessedDataset(paths['Test']))
            processed_dirs.extend(paths.values())

        full_train = ConcatDataset(train_datasets)
        full_val = ConcatDataset(val_datasets)
        full_test = ConcatDataset(test_datasets)
        print(f'\n\tCombined Training Samples: {len(full_train)}')
        print(f'\tCombined Validation Samples: {len(full_val)}')
        print(f'\tCombined Test Samples: {len(full_test)}')

        # static shapes for the whole run
        pad_hw, data_max_instances = compute_static_pad_hw(processed_dirs)
        max_instances = min(max(data_max_instances, 1), config.MAX_INSTANCES)
        print(f'\tStatic batch shape: {pad_hw}, max_instances={max_instances}')

        end_time = datetime.now()
        elapsed = format_duration(start_time, end_time)
        print(f'\tData preprocessing completed in {elapsed}')
        metadata['preprocessing_time'] = elapsed
        start_time = end_time

        # batch size must fill the data axis (the batch is replicated
        # across 'model', so the model axis adds no rows)
        n_dev = mesh.shape['data']
        batch_size = _round_up(config.BATCH_SIZE, n_dev)
        if batch_size != config.BATCH_SIZE:
            print(f'\tBATCH_SIZE {config.BATCH_SIZE} rounded to {batch_size} for {n_dev} devices')

        shard_kw = dict(process_index=proc_idx, process_count=proc_cnt)
        # single-pass static collate in the loader thread (≥80% duty north
        # star): pad + wire-encode happen where the npz bytes are already hot
        fast_collate = make_train_collate(
            pad_hw, max_instances, batch_size // proc_cnt,
            pixels_dtype=(jnp.bfloat16
                          if config.COMPUTE_DTYPE == 'bfloat16' else None),
        )
        train_loader = DataLoader(full_train, batch_size, shuffle=True, collate=fast_collate, **shard_kw)
        val_loader = DataLoader(full_val, batch_size, shuffle=False, collate=fast_collate, **shard_kw)
        # test phase: each host reads 1/P of the split (engine/metrics.py
        # post-processes locally and merges per-image metric entries)
        test_loader = DataLoader(full_test, batch_size, shuffle=False, collate=collate_fn,
                                 **shard_kw)

        # 3. model + optimizer + jitted steps
        model, params, model_cfg = build_model(unified_id2label, unified_label2id)
        state, tx = create_train_state(
            params, config.LEARNING_RATE, config.GRADIENT_ACCUMULATION
        )
        # WISTPU_AUGMENT=1 → device-side flip/scale/color augmentation fused
        # into the compiled step (processing/augment.py); default off =
        # reference parity (the reference trains without augmentation)
        from weed_instance_segmentation_tpu.processing.augment import from_env as _augment_env

        augment = _augment_env()
        if augment is not None:
            print(f'Device-side augmentation enabled: {augment}')
            metadata['augmentation'] = str(augment)
        train_step = make_train_step(model, model_cfg, tx, augment=augment)
        eval_step = make_eval_step(model, model_cfg)

        best_val_loss = float('inf')
        start_epoch = 0
        metadata['training_history'] = []
        if config.RESUME:
            # WISTPU_RESUME: restore params + optimizer + epoch/history from
            # a prior run (capability the reference lacks — SURVEY.md §5.4).
            # The checkpoint must come from the same arch/label config.
            resume_dir = config.RESUME
            if not os.path.exists(os.path.join(resume_dir, ckpt.OPT_STATE_FILE)):
                resume_dir = os.path.join(resume_dir, 'train_state')
            state, resume_meta = ckpt.load_train_checkpoint(resume_dir, state)
            start_epoch = int(resume_meta.get('epoch', 0))
            best_val_loss = float(resume_meta.get('best_val_loss', float('inf')))
            metadata['training_history'] = list(resume_meta.get('training_history', []))
            metadata['resumed_from'] = resume_dir
            print(
                f'Resumed from {resume_dir}: epoch {start_epoch}, '
                f'micro-step {int(state.step)}, best val loss {best_val_loss:.4f}'
            )
            # continue the shuffle sequence where the interrupted run left
            # off: epoch k draws the same batch order whether or not the
            # process restarted (the loader seeds per epoch)
            train_loader.set_epoch(start_epoch)
        # Pre-place the state with its steady mesh sharding: replicated on
        # a 1-D mesh, weight-sharded over 'model' on a 2-D one. Multi-host:
        # multi-controller jit needs every input as a global array
        # (params/opt state are identical on all hosts — deterministic init
        # or shared-fs checkpoint — so placement is local-only).
        # Single-host: skipping this leaves call 1 with numpy-backed state
        # and call 2 with device state → two full XLA compiles of the step.
        state = shard_tree(state, mesh)
        print('Starting Training...')

        end_time = datetime.now()
        elapsed = format_duration(start_time, end_time)
        print(f'\tData and model loading completed in {elapsed}')
        metadata['data_and_model_loading_time'] = elapsed
        start_time = end_time

        # tracing hook (SURVEY.md §5.1 — the reference has only wall-clock
        # timers): WISTPU_PROFILE=<dir> captures a jax.profiler trace of
        # training steps 3..8 of the first epoch (post-compile steady state)
        profile_dir = os.environ.get('WISTPU_PROFILE')

        rng = jax.random.PRNGKey(42)
        global_step = 0
        input_wait = 0.0  # host time spent waiting on the input pipeline
        device_time = 0.0  # host time spent in (async-dispatched) steps
        import time as _time

        # Per-step float(loss) would block the host every step, stalling
        # dispatch of step k+1 (and its host→HBM transfer) behind compute k.
        # Keep losses on device and sync every SYNC_EVERY steps — deep
        # enough to pipeline, shallow enough to bound in-flight batches in
        # HBM (≤ SYNC_EVERY live batches).
        SYNC_EVERY = 8
        for epoch in range(start_epoch, config.EPOCHS):
            epoch_losses = []
            steps = 0
            print(f'\nEpoch {epoch + 1}/{config.EPOCHS}')
            t_mark = _time.perf_counter()
            # prefetch_iterator moves static-pad collation + host→HBM
            # transfer off the step-dispatch thread (≥80% duty north star)
            for batch in prefetch_iterator(_device_batches(
                train_loader, pad_hw, max_instances, mesh, batch_size
            )):
                t_have_batch = _time.perf_counter()
                input_wait += t_have_batch - t_mark
                if profile_dir and global_step == 3:
                    jax.profiler.start_trace(profile_dir)
                state, loss = train_step(state, batch, rng)
                epoch_losses.append(loss)
                steps += 1
                global_step += 1
                if steps % SYNC_EVERY == 0:
                    jax.block_until_ready(loss)
                if profile_dir and global_step == 8:
                    jax.profiler.stop_trace()
                    print(f'\tProfiler trace written to {profile_dir}')
                    # true device-busy fraction over the traced window,
                    # recorded beside the host-derived duty cycle (which
                    # counts async dispatch as device time)
                    try:
                        from weed_instance_segmentation_tpu.engine.trace import (
                            device_busy_fraction,
                        )

                        busy = device_busy_fraction(profile_dir)
                        if busy is not None:
                            metadata['device_duty_profiled'] = round(busy, 4)
                            print(f'\tProfiled device-busy fraction: {100 * busy:.1f}%')
                    except Exception as e:
                        print(f'\tTrace parse failed (non-fatal): {e}')
                    profile_dir = None
                t_mark = _time.perf_counter()
                device_time += t_mark - t_have_batch
            avg_train_loss = (
                float(np.mean([float(l) for l in epoch_losses])) if epoch_losses else 0.0
            )
            print(f'\tEpoch {epoch + 1} Avg Loss: {avg_train_loss:.4f}')

            avg_val_loss = evaluate(
                eval_step, state.params, val_loader, pad_hw, max_instances, mesh, batch_size
            )
            print(f'\tEpoch {epoch + 1} Val Loss: {avg_val_loss:.4f}')

            metadata['training_history'].append({
                'epoch': epoch + 1,
                'train_loss': avg_train_loss,
                'val_loss': avg_val_loss,
            })

            # Model-sharded leaves aren't addressable from host 0 alone;
            # assemble a host-local copy (collective — all hosts call it)
            # before the main-host-only writes below.
            state_save = (
                fetch_tree(state)
                if multihost and 'model' in mesh.axis_names else state
            )
            if avg_val_loss < best_val_loss:
                best_val_loss = avg_val_loss
                if is_main:
                    save_path = os.path.join(output_dir, 'best_model')
                    ckpt.save_pretrained(save_path, state_save.params, model_cfg, processor)
                    print(f'\tSaved new best model (Loss: {best_val_loss:.4f})')

            # per-epoch resume point (WISTPU_RESUME target)
            if is_main:
                ckpt.save_train_checkpoint(
                    os.path.join(output_dir, 'train_state'), state_save,
                    extra={
                        'epoch': epoch + 1,
                        'best_val_loss': best_val_loss,
                        'training_history': metadata['training_history'],
                    },
                )

        end_time = datetime.now()
        elapsed = format_duration(start_time, end_time)
        print(f'\tTraining completed in {elapsed}')
        metadata['training_time'] = elapsed
        # input-pipeline duty cycle (north star ≥80%): fraction of the train
        # loop the device had work, i.e. not blocked on host batch assembly
        total_loop = input_wait + device_time
        if total_loop > 0:
            duty = device_time / total_loop
            metadata['input_duty_cycle'] = round(duty, 4)
            print(f'\tInput-pipeline duty cycle: {100 * duty:.1f}%')

        state_save = (
            fetch_tree(state)
            if multihost and 'model' in mesh.axis_names else state
        )
        if is_main:
            final_path = os.path.join(output_dir, 'final_model')
            ckpt.save_pretrained(final_path, state_save.params, model_cfg, processor)
            # final resume point (per-epoch saves above cover mid-run crashes)
            ckpt.save_train_checkpoint(
                os.path.join(output_dir, 'train_state'), state_save,
                extra={
                    'epoch': config.EPOCHS,
                    'best_val_loss': best_val_loss,
                    'training_history': metadata['training_history'],
                },
            )

        # --- test phase on the best model (reference train.py:238-258) ----
        # All hosts run the forwards together over the full mesh, each
        # reading only ITS slice of the split and post-processing its own
        # images; per-image metric entries merge on host 0, which writes
        # the result (engine/metrics.py).
        start_time = datetime.now()
        best_model_path = os.path.join(output_dir, 'best_model')
        if multihost:
            # best_model/ must be fully written by host 0 before anyone loads
            multihost_utils.sync_global_devices('wistpu_pre_test')
        if is_main:
            print('\n--- Starting Test Phase (Best Model) ---')
        if os.path.exists(best_model_path):
            if is_main:
                print(f'\tLoading best model from {best_model_path}')
            best_cfg, best_params = ckpt.load_pretrained(best_model_path)
            forward_fn = make_forward_fn(Mask2Former(best_cfg))
            if multihost:
                best_params = replicate_tree(best_params, mesh)
            test_results = test_with_metrics(
                forward_fn, best_params, test_loader, mesh=mesh, pad_hw=pad_hw,
            )
            if is_main:
                print_metrics_evaluation(test_results, model_name='Best Model')
                metadata['test_metrics'] = prepare_metrics_for_json(test_results)
        elif is_main:
            print('\tBest model not found, skipping test phase.')

        end_time = datetime.now()
        elapsed = format_duration(start_time, end_time)
        print(f'\tTest completed in {elapsed}')
        metadata['test_time'] = elapsed
        if multihost:
            multihost_utils.sync_global_devices('wistpu_run_done')
        return metadata

    except Exception as e:  # partial metadata on crash (reference train.py:270-272)
        import traceback

        traceback.print_exc()
        print(f'\nError during training/testing:\n\t{e}')
        return metadata


def main():
    multihost = maybe_initialize_distributed()
    global_start_time = datetime.now()
    if multihost:
        # all hosts must agree on the timestamped run dir (host clocks can
        # straddle a second boundary) — host 0's wall clock wins
        from jax.experimental import multihost_utils

        stamp = multihost_utils.broadcast_one_to_all(
            np.int64(int(global_start_time.timestamp()))
        )
        global_start_time = datetime.fromtimestamp(int(stamp))
    run_output_dir = os.path.join(
        SPECIFIC_OUTPUT_DIR, global_start_time.strftime('%Y-%m-%d_%H-%M-%S')
    )
    if jax.process_index() == 0:
        os.makedirs(run_output_dir, exist_ok=True)
    print(f'Training started at {global_start_time.strftime("%Y-%m-%d %H:%M:%S")}')

    metadata = {
        'start_time': global_start_time.strftime('%Y-%m-%d_%H-%M-%S'),
        'dataset_list': config.DATASET_LIST,
        'base_model': config.MODEL_CHECKPOINT,
        'batch_size': config.BATCH_SIZE,
        'learning_rate': config.LEARNING_RATE,
        'epochs': config.EPOCHS,
        'gradient_accumulation': config.GRADIENT_ACCUMULATION,
        'max_input_dim': config.MAX_INPUT_DIM,
    }
    metadata_path = os.path.join(run_output_dir, 'metadata.json')
    if jax.process_index() == 0:
        try:
            with open(metadata_path, 'w') as f:
                json.dump(metadata, f, indent=4)
        except Exception as e:
            print(f'\nError in saving metadata to "{metadata_path}":\n\t {e}')

    updated = train(output_dir=run_output_dir, metadata=metadata,
                    dataset_list=config.DATASET_LIST)
    global_end_time = datetime.now()
    updated['end_time'] = global_end_time.strftime('%Y-%m-%d_%H-%M-%S')
    updated['total_time'] = format_duration(global_start_time, global_end_time)
    print(
        f"Training finished at {updated['end_time']}, "
        f"total duration: {updated['total_time']}"
    )
    if jax.process_index() == 0:
        try:
            with open(metadata_path, 'w') as f:
                json.dump(updated, f, indent=4)
        except Exception as e:
            print(f'\nError in updating metadata to "{metadata_path}":\n\t {e}')


if __name__ == '__main__':
    main()
