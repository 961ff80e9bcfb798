"""Integration tests: the five entry points end-to-end on synthetic
fixtures (SURVEY.md §4 — the reference has no tests; its de-facto
validation is running these flows, so we automate exactly that).

Run as subprocesses because the dataset ``definitions`` modules read their
roots from env vars at import time.
"""

import glob
import json
import os
import subprocess
import sys

import numpy as np
import pytest

from fixtures import make_pheno_bench

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope='module')
def workdir(tmp_path_factory):
    root = tmp_path_factory.mktemp('e2e')
    rng = np.random.default_rng(0)
    make_pheno_bench(str(root / 'pheno'), rng, n=2)
    from fixtures import make_crop_weed_png

    make_crop_weed_png(str(root / 'cw'), rng, n=4)
    return root


def _env(root):
    env = dict(os.environ)
    env.update({
        'JAX_PLATFORMS': 'cpu',
        # shared across test sessions: subprocesses reuse compiled programs
        'JAX_COMPILATION_CACHE_DIR': '/tmp/wistpu_xla_cache',
        'WISTPU_PHENO_BENCH_ROOT': str(root / 'pheno'),
        'WISTPU_CROP_WEED_ROOT': str(root / 'cw'),
        # multi-dataset training: exercises unified-label merge (C10) and
        # crop_weed's seeded dynamic split with an empty Test ratio
        'WISTPU_DATASET_LIST': 'pheno_bench,crop_weed',
        'WISTPU_OUTPUT_DIR': str(root / 'out') + '/',
        'WISTPU_EPOCHS': '1',
        'WISTPU_MAX_IMAGES': '2',
        'WISTPU_BATCH_SIZE': '2',
        'WISTPU_MODEL_ARCH': 'tiny-test',
        'WISTPU_SHORTEST_EDGE': '64',
        'WISTPU_LONGEST_EDGE': '96',
        'WISTPU_MAX_INSTANCES': '8',
        'WISTPU_DATA_PARALLEL': '1',
    })
    return env


def _run(module, env, timeout=1500):
    # generous timeout: the first run on a cold XLA compilation cache pays
    # several minutes of compile on a 1-core host; warm-cache runs are fast
    proc = subprocess.run(
        [sys.executable, '-m', module],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=timeout,
    )
    assert proc.returncode == 0, f'{module} failed:\n{proc.stdout}\n{proc.stderr}'
    return proc.stdout


def test_train_then_eval_entry_points(workdir):
    env = _env(workdir)
    # multi-dataset training WITH the device-side augmentation pipeline
    # enabled — the BASELINE.md config-4 shape (full augmentation e2e)
    env['WISTPU_AUGMENT'] = '1'

    # --- train: preprocess → epoch → checkpoints → test phase → metadata ---
    out = _run('weed_instance_segmentation_tpu.engine.train', env)
    assert 'Saved new best model' in out
    assert 'Device-side augmentation enabled' in out

    runs = sorted(glob.glob(str(workdir / 'out/models/mask2former_fine_tuned/*')))
    assert runs, out
    run_dir = runs[-1]
    with open(os.path.join(run_dir, 'metadata.json')) as f:
        metadata = json.load(f)
    # the reference's metadata keys (train.py:281-311)
    for key in (
        'start_time', 'dataset_list', 'base_model', 'batch_size', 'learning_rate',
        'epochs', 'gradient_accumulation', 'max_input_dim', 'preprocessing_time',
        'data_and_model_loading_time', 'training_history', 'training_time',
        'test_metrics', 'test_time', 'end_time', 'total_time',
        'input_duty_cycle', 'augmentation',
    ):
        assert key in metadata, key
    assert len(metadata['training_history']) == 1
    assert np.isfinite(metadata['training_history'][0]['train_loss'])
    assert 'map' in metadata['test_metrics']
    for sub in ('best_model', 'final_model', 'train_state'):
        assert os.path.isdir(os.path.join(run_dir, sub))
    assert os.path.exists(os.path.join(run_dir, 'best_model/params.npz'))
    assert os.path.exists(os.path.join(run_dir, 'best_model/preprocessor_config.json'))

    model_id = os.path.relpath(os.path.join(run_dir, 'best_model'),
                               str(workdir / 'out/models'))
    env['WISTPU_MODEL_ID'] = model_id

    # --- standalone test driver (C14) ---
    out = _run('weed_instance_segmentation_tpu.engine.test', env)
    assert 'mAP' in out

    # --- single-image inference (C13) ---
    env['WISTPU_IMAGE_PATH'] = str(workdir / 'pheno/test/images/test_000.png')
    out = _run('weed_instance_segmentation_tpu.engine.inference', env)
    assert 'Saved visualization' in out
    assert os.path.exists(str(workdir / 'out/inference.png'))

    # --- worst-prediction explorer (C15) ---
    out = _run('weed_instance_segmentation_tpu.engine.show_worst_predictions', env)
    assert 'Worst Predictions' in out


def test_standalone_test_dynamic_split_fallback(workdir):
    """engine.test on a dynamic-split dataset (crop_weed): the reference
    crashes on the missing TEST_IMG_DIR attribute (test.py:29-35); we fall
    back to the preprocessed Test cache — or, when the split assigns the
    test set ratio 0, explain instead of raising (documented deviation,
    SURVEY.md §2.5)."""
    env = _env(workdir)
    env['WISTPU_DATASET_LIST'] = 'crop_weed'

    # a checkpoint to evaluate: reuse the main e2e run's if present,
    # otherwise train one epoch here (warm compile cache keeps this fast)
    runs = sorted(glob.glob(str(workdir / 'out/models/mask2former_fine_tuned/*')))
    if not runs:
        _run('weed_instance_segmentation_tpu.engine.train', env)
        runs = sorted(glob.glob(str(workdir / 'out/models/mask2former_fine_tuned/*')))
    env['WISTPU_MODEL_ID'] = os.path.relpath(
        os.path.join(runs[-1], 'best_model'), str(workdir / 'out/models'))

    # default crop_weed split has test ratio 0 → no cache: clean message
    out = _run('weed_instance_segmentation_tpu.engine.test', env)
    assert 'no preprocessed cache' in out

    # nonzero test ratio: preprocess materializes Processed/Test, and the
    # standalone driver evaluates it through the real metrics path
    env['WISTPU_CROP_WEED_SPLIT'] = '0.5,0.25,0.25'
    env['WISTPU_FORCE_PREPROCESSING'] = '1'
    _run('weed_instance_segmentation_tpu.datasets.preprocess', env)
    assert glob.glob(str(workdir / 'cw/Processed/Test/*.npz'))
    out = _run('weed_instance_segmentation_tpu.engine.test', env)
    assert 'mAP' in out


def test_resume_continues_training(workdir):
    """Kill after epoch 1, resume with WISTPU_RESUME, and the metadata of
    the resumed run shows a continuous 2-epoch history."""
    env = _env(workdir)
    env['WISTPU_OUTPUT_DIR'] = str(workdir / 'out_resume') + '/'
    env['WISTPU_EPOCHS'] = '1'
    _run('weed_instance_segmentation_tpu.engine.train', env)
    runs = sorted(glob.glob(str(workdir / 'out_resume/models/mask2former_fine_tuned/*')))
    first_run = runs[-1]
    with open(os.path.join(first_run, 'train_state/train_state.json')) as f:
        state_meta = json.load(f)
    assert state_meta['epoch'] == 1
    first_steps = state_meta['step']
    assert first_steps > 0

    env['WISTPU_EPOCHS'] = '2'
    env['WISTPU_RESUME'] = first_run  # run dir; train_state/ resolved inside
    out = _run('weed_instance_segmentation_tpu.engine.train', env)
    assert 'Resumed from' in out
    runs = sorted(glob.glob(str(workdir / 'out_resume/models/mask2former_fine_tuned/*')))
    second_run = runs[-1]
    assert second_run != first_run
    with open(os.path.join(second_run, 'metadata.json')) as f:
        metadata = json.load(f)
    assert metadata['resumed_from'] == os.path.join(first_run, 'train_state')
    epochs = [h['epoch'] for h in metadata['training_history']]
    assert epochs == [1, 2], metadata['training_history']
    with open(os.path.join(second_run, 'train_state/train_state.json')) as f:
        state_meta2 = json.load(f)
    # optimizer micro-step counter continued, not restarted
    assert state_meta2['step'] > first_steps


def test_train_checkpoint_layout_mismatch_raises(tmp_path):
    """Keyed opt-state serialization: restoring into a differently-shaped
    optimizer fails loudly instead of mis-assigning leaves by position."""
    import pytest as _pytest

    from weed_instance_segmentation_tpu.engine import checkpoint as ckpt
    from weed_instance_segmentation_tpu.engine.model_utils import init_params
    from weed_instance_segmentation_tpu.engine.steps import create_train_state
    from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
    from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

    cfg = Mask2FormerConfig.tiny_test(num_labels=3)
    params = init_params(Mask2Former(cfg), cfg)
    state, _ = create_train_state(params, 1e-4, gradient_accumulation=2)
    d = str(tmp_path / 'ckpt')
    ckpt.save_train_checkpoint(d, state)
    # GA=1 drops the MultiSteps wrapper → different opt-state tree
    other, _ = create_train_state(params, 1e-4, gradient_accumulation=1)
    with _pytest.raises(ValueError, match='layout mismatch'):
        ckpt.load_train_checkpoint(d, other)


def test_checkpoint_roundtrip(tmp_path):
    """save_pretrained → load_pretrained preserves params bit-exactly, and
    the train_state roundtrip restores opt_state + step."""
    import jax.numpy as jnp

    from weed_instance_segmentation_tpu.engine import checkpoint as ckpt
    from weed_instance_segmentation_tpu.engine.model_utils import init_params
    from weed_instance_segmentation_tpu.engine.steps import create_train_state
    from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
    from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

    cfg = Mask2FormerConfig.tiny_test(num_labels=3)
    model = Mask2Former(cfg)
    params = init_params(model, cfg)
    d = str(tmp_path / 'ckpt')
    ckpt.save_pretrained(d, params, cfg)
    cfg2, params2 = ckpt.load_pretrained(d)
    assert cfg2.num_labels == 3
    import jax

    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    state, tx = create_train_state(params, 1e-4, gradient_accumulation=2)
    state = state._replace(step=jnp.int32(7))
    d2 = str(tmp_path / 'train_ckpt')
    ckpt.save_train_checkpoint(d2, state, extra={'epoch': 3})
    fresh, _ = create_train_state(params, 1e-4, gradient_accumulation=2)
    restored, meta = ckpt.load_train_checkpoint(d2, fresh)
    assert int(restored.step) == 7
    assert meta['epoch'] == 3
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
