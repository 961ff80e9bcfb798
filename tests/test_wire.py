"""Host→device wire codec (processing/wire.py): losslessness and
step-equivalence.

The codec ships train batches as 1-bit masks + extent-coded pixel_mask
(+ compute-dtype pixels); these tests pin (a) bit-exact round trips for
every payload, (b) the non-rectangular pixel_mask fallback, and (c) that
the jitted train step computes the identical loss from an encoded batch
(f32 pixels → the decode is exact, so the full step must match bitwise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weed_instance_segmentation_tpu.processing.wire import decode_batch, encode_batch


def _batch(b=2, n_inst=3, h=48, w=56, seed=0):
    rng = np.random.default_rng(seed)
    pm = np.zeros((b, h, w), np.float32)
    for k in range(b):  # per-sample top-left rectangles, like pad_batch_static
        pm[k, : h - 8 * k, : w - 16 * k] = 1.0
    return {
        'pixel_values': rng.standard_normal((b, 3, h, w)).astype(np.float32),
        'pixel_mask': pm,
        'mask_labels': (rng.random((b, n_inst, h, w)) > 0.7).astype(np.uint8),
        'class_labels': rng.integers(0, 3, (b, n_inst)).astype(np.int32),
        'instance_valid': np.ones((b, n_inst), np.float32),
        'sample_valid': np.ones((b,), np.float32),
    }


def test_round_trip_exact():
    batch = _batch()
    enc = encode_batch(batch)
    # rectangle masks take the 2-int extent path, masks pack 8×
    assert 'pixel_mask_hw' in enc and enc['pixel_mask_hw'].shape == (2, 2)
    assert enc['mask_labels_packed'].shape == (2, 3, 48, 7)
    dec = jax.jit(decode_batch)(enc)
    np.testing.assert_array_equal(np.asarray(dec['mask_labels']), batch['mask_labels'])
    np.testing.assert_array_equal(np.asarray(dec['pixel_mask']), batch['pixel_mask'])
    np.testing.assert_array_equal(np.asarray(dec['pixel_values']), batch['pixel_values'])


def test_round_trip_width_not_multiple_of_8():
    batch = _batch(w=53)
    dec = decode_batch(encode_batch(batch))
    np.testing.assert_array_equal(np.asarray(dec['mask_labels']), batch['mask_labels'])
    np.testing.assert_array_equal(np.asarray(dec['pixel_mask']), batch['pixel_mask'])


def test_non_rectangular_pixel_mask_falls_back_to_bits():
    batch = _batch()
    batch['pixel_mask'][0, 5, 5] = 0.0  # hole → not h×w-consistent
    enc = encode_batch(batch)
    assert 'pixel_mask_packed' in enc and 'pixel_mask_hw' not in enc
    dec = decode_batch(enc)
    np.testing.assert_array_equal(np.asarray(dec['pixel_mask']), batch['pixel_mask'])


def test_pixels_dtype_cast():
    batch = _batch()
    enc = encode_batch(batch, pixels_dtype=jnp.bfloat16)
    assert enc['pixel_values'].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(enc['pixel_values']),
        batch['pixel_values'].astype(jnp.bfloat16),
    )


def test_decode_passthrough_on_plain_batch():
    batch = _batch()
    assert decode_batch(batch) is batch


def test_train_step_identical_loss_from_encoded_batch():
    """f32 pixels decode exactly, so wire on/off must produce the SAME jitted
    step results (loss and updated params) — the equivalence behind
    WISTPU_WIRE=1 being the default."""
    from weed_instance_segmentation_tpu.engine.model_utils import init_params
    from weed_instance_segmentation_tpu.engine.steps import (
        create_train_state, make_train_step,
    )
    from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
    from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

    cfg = Mask2FormerConfig.tiny_test(num_labels=3)
    model = Mask2Former(cfg)
    params = jax.tree_util.tree_map(
        np.asarray, init_params(model, cfg, image_hw=(64, 64))
    )
    batch = _batch(b=2, h=64, w=64)

    def run(feed):
        state, tx = create_train_state(params, 1e-3)
        step = make_train_step(model, cfg, tx)
        state, loss = step(state, feed, jax.random.PRNGKey(3))
        return float(loss), jax.device_get(state.params)

    loss_plain, params_plain = run(batch)
    loss_wire, params_wire = run(encode_batch(batch))
    assert loss_plain == pytest.approx(loss_wire, rel=0, abs=0)
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, params_plain, params_wire
    )


def _raw_samples(n, h, w, n_inst=3, seed=0):
    """TRAIN_SAMPLE_KEYS samples as PreprocessedDataset(keys=...) yields
    them: f32 pixels, uint8 binary masks, int64 classes."""
    rng = np.random.default_rng(seed)
    return [
        {
            'pixel_values': rng.standard_normal((3, h - 4 * k, w - 8 * k)).astype(np.float32),
            'mask_labels': (rng.random((2 + k, h - 4 * k, w - 8 * k)) > 0.7).astype(np.uint8),
            'class_labels': rng.integers(0, 3, (2 + k,)).astype(np.int64),
        }
        for k in range(n)
    ]


@pytest.mark.parametrize('pixels_dtype', [None, jnp.bfloat16])
def test_train_collate_matches_staged_path(pixels_dtype):
    """The single-pass fast collate (dataset_utils.make_train_collate) must
    produce bit-identical encoded batches to the round-3 staged path
    (pad_batch_static → encode_batch) — same keys, same bytes."""
    from weed_instance_segmentation_tpu.datasets.dataset_utils import (
        make_train_collate, pad_batch_static,
    )

    samples = _raw_samples(2, 48, 56)
    fast = make_train_collate((48, 56), 4, 2, wire=True, pixels_dtype=pixels_dtype)(samples)
    staged = encode_batch(
        pad_batch_static(samples, (48, 56), 4), pixels_dtype=pixels_dtype
    )
    assert set(fast) == set(staged)
    for k in staged:
        assert fast[k].dtype == np.asarray(staged[k]).dtype, k
        np.testing.assert_array_equal(np.asarray(fast[k]), np.asarray(staged[k]), err_msg=k)


def test_train_collate_short_batch_padded_and_invalidated():
    from weed_instance_segmentation_tpu.datasets.dataset_utils import make_train_collate

    samples = _raw_samples(1, 48, 56)
    out = make_train_collate((48, 56), 4, 3, wire=True)(samples)
    assert out['pixel_values'].shape[0] == 3
    np.testing.assert_array_equal(out['sample_valid'], [1.0, 0.0, 0.0])
    assert out['instance_valid'][1:].sum() == 0.0
    # repeats carry the real sample's pixels (shape filler only)
    np.testing.assert_array_equal(out['pixel_values'][1], out['pixel_values'][0])


def test_train_collate_wire_off_is_plain_static_batch():
    from weed_instance_segmentation_tpu.datasets.dataset_utils import (
        make_train_collate, pad_batch_static,
    )

    samples = _raw_samples(2, 48, 56)
    out = make_train_collate((48, 56), 4, 2, wire=False)(samples)
    ref = pad_batch_static(samples, (48, 56), 4)
    assert set(out) == set(ref)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(ref[k]), err_msg=k)


def test_encode_rejects_unanchored_rectangle():
    """ADVICE r3: a rectangle NOT anchored top-left must take the packbits
    fallback (the extents decode would silently relocate it)."""
    batch = _batch()
    pm = np.zeros_like(batch['pixel_mask'])
    pm[:, 8:40, 8:40] = 1.0  # interior rectangle: area == h*w but shifted
    batch['pixel_mask'] = pm
    enc = encode_batch(batch)
    assert 'pixel_mask_packed' in enc and 'pixel_mask_hw' not in enc
    dec = decode_batch(enc)
    np.testing.assert_array_equal(np.asarray(dec['pixel_mask']), pm)
