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


def test_emit_masks_false_id_map_only(rng):
    """emit_masks=False drops the per-instance masks from the response; the
    remaining fields match the mask-emitting pipeline exactly (the id map
    is computed identically either way)."""
    import jax

    _, model, params = _tiny_model()
    out_hw = (64, 64)
    raw = jnp.asarray(rng.integers(0, 256, (2, 96, 96, 3), dtype=np.uint8))

    full = jax.jit(make_serving_fn(model, params, out_hw=out_hw, threshold=0.1))(raw)
    lean = jax.jit(make_serving_fn(
        model, params, out_hw=out_hw, threshold=0.1, emit_masks=False,
    ))(raw)
    assert set(lean) == set(full) - {'masks'}
    for key in lean:
        # int/bool fields (id map, labels, validity) must match exactly;
        # float scores may differ by an ulp — XLA fuses the sigmoid-sum
        # reduce differently when the masks output isn't materialized
        got, want = np.asarray(lean[key]), np.asarray(full[key])
        if got.dtype.kind in 'fc':
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=key)
        else:
            np.testing.assert_array_equal(got, want, err_msg=key)
    # micro-batched lean path agrees too
    lean_mb = jax.jit(make_serving_fn(
        model, params, out_hw=out_hw, threshold=0.1, micro_batch=1,
        emit_masks=False,
    ))(raw)
    for key in lean:
        got, want = np.asarray(lean_mb[key]), np.asarray(lean[key])
        if got.dtype.kind in 'fc':
            np.testing.assert_allclose(got, want, atol=1e-6, err_msg=key)
        else:
            np.testing.assert_array_equal(got, want, err_msg=key)
