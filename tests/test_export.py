"""Serving export (engine/export.py): the exported StableHLO artifact
reproduces the live pipeline and round-trips with only jax available."""

import json
import os

import numpy as np

import jax.numpy as jnp

from weed_instance_segmentation_tpu.engine.export import (
    ARTIFACT_NAME, MANIFEST_NAME, export_serving, load_serving, make_serving_fn,
)
from weed_instance_segmentation_tpu.engine.model_utils import init_params
from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former


def _tiny_model():
    cfg = Mask2FormerConfig.tiny_test(num_labels=3)
    model = Mask2Former(cfg)
    params = init_params(model, cfg, image_hw=(64, 64))
    return cfg, model, params


def test_export_roundtrip_matches_live_pipeline(tmp_path, rng):
    _, model, params = _tiny_model()
    batch, in_hw, out_hw = 2, (96, 96), (64, 64)

    artifact = export_serving(
        model, params, str(tmp_path),
        batch=batch, in_hw=in_hw, out_hw=out_hw, threshold=0.1,
        platforms=('cpu',), manifest_extra={'arch': 'tiny-test'},
    )
    assert os.path.exists(artifact)

    raw = rng.integers(0, 256, (batch, *in_hw, 3), dtype=np.uint8)
    live = make_serving_fn(model, params, out_hw=out_hw, threshold=0.1)(
        jnp.asarray(raw)
    )
    served_fn, manifest = load_serving(str(tmp_path))
    served = served_fn(jnp.asarray(raw))

    assert manifest['input']['shape'] == [batch, *in_hw, 3]
    assert manifest['arch'] == 'tiny-test'
    assert set(served) == set(live)
    for key in live:
        np.testing.assert_allclose(
            np.asarray(served[key], np.float32),
            np.asarray(live[key], np.float32),
            atol=1e-5,
            err_msg=key,
        )
    # shape contract: batch-leading fixed-size result arrays at out_hw
    assert served['segmentation'].shape == (batch, *out_hw)
    assert served['masks'].shape[0] == batch and served['masks'].shape[2:] == out_hw


def test_micro_batched_serving_matches_full(rng):
    """micro_batch caps activation liveness by mapping over sub-batches
    inside the one program; results must equal the single-dispatch path
    exactly (same ops per image, just scheduled in chunks)."""
    import jax

    _, model, params = _tiny_model()
    batch, in_hw, out_hw = 4, (96, 96), (64, 64)
    raw = jnp.asarray(rng.integers(0, 256, (batch, *in_hw, 3), dtype=np.uint8))

    full = jax.jit(make_serving_fn(model, params, out_hw=out_hw, threshold=0.1))(raw)
    micro = jax.jit(make_serving_fn(
        model, params, out_hw=out_hw, threshold=0.1, micro_batch=2,
    ))(raw)

    assert set(full) == set(micro)
    for key in full:
        np.testing.assert_allclose(
            np.asarray(micro[key], np.float32),
            np.asarray(full[key], np.float32),
            atol=1e-5, err_msg=key,
        )
    # a request batch ≤ micro_batch short-circuits to the plain path
    small = jax.jit(make_serving_fn(
        model, params, out_hw=out_hw, threshold=0.1, micro_batch=4,
    ))(raw)
    for key in full:
        np.testing.assert_allclose(
            np.asarray(small[key], np.float32),
            np.asarray(full[key], np.float32),
            atol=1e-5, err_msg=key,
        )


def test_export_cli_smoke(tmp_path, monkeypatch):
    """The env-driven entry point writes artifact + manifest."""
    from weed_instance_segmentation_tpu.engine import export as export_mod

    monkeypatch.setenv('WISTPU_EXPORT_DIR', str(tmp_path))
    monkeypatch.setenv('WISTPU_MODEL_ARCH', 'tiny-test')
    monkeypatch.setenv('WISTPU_NUM_LABELS', '3')
    monkeypatch.setenv('WISTPU_EXPORT_BATCH', '1')
    monkeypatch.setenv('WISTPU_EXPORT_HW_IN', '96')
    monkeypatch.setenv('WISTPU_EXPORT_HW', '64')
    monkeypatch.setenv('WISTPU_COMPUTE_DTYPE', 'float32')
    export_mod.main()

    assert os.path.exists(tmp_path / ARTIFACT_NAME)
    manifest = json.loads((tmp_path / MANIFEST_NAME).read_text())
    assert manifest['platforms'] == ['tpu', 'cpu']
    assert manifest['model_input_hw'] == [64, 64]
