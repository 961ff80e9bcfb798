"""Device-side augmentation (processing/augment.py — BASELINE.md config 4).

The invariants that matter: labels ride the same geometry as pixels,
disabled == bit-identical passthrough, everything stays static-shape and
jit-compatible, and the train step consumes it end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weed_instance_segmentation_tpu.processing.augment import (
    AugmentConfig, augment_batch, from_env,
)
from weed_instance_segmentation_tpu.processing.image_processor import (
    IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD,
)

MEAN = np.asarray(IMAGENET_DEFAULT_MEAN, np.float32).reshape(3, 1, 1)
STD = np.asarray(IMAGENET_DEFAULT_STD, np.float32).reshape(3, 1, 1)


def _batch(b=2, h=32, w=32, n=3, seed=0):
    r = np.random.default_rng(seed)
    raw = r.uniform(0.1, 0.9, size=(b, 3, h, w)).astype(np.float32)
    masks = np.zeros((b, n, h, w), np.float32)
    for k in range(b):
        for j in range(n):
            y, x = r.integers(4, h - 12, size=2)
            masks[k, j, y : y + 8, x : x + 8] = 1.0
    return {
        'pixel_values': jnp.asarray((raw - MEAN) / STD),
        'pixel_mask': jnp.ones((b, h, w), jnp.float32),
        'mask_labels': jnp.asarray(masks),
        'class_labels': jnp.zeros((b, n), jnp.int32),
        'instance_valid': jnp.ones((b, n), jnp.float32),
        'sample_valid': jnp.ones((b,), jnp.float32),
    }


def test_disabled_is_passthrough():
    batch = _batch()
    out = augment_batch(batch, jax.random.PRNGKey(0), AugmentConfig(0.0, 0.0, (1.0, 1.0), 0.0, 0.0))
    assert out is batch


def test_hflip_mirrors_pixels_and_masks_together():
    batch = _batch()
    cfg = AugmentConfig(hflip_prob=1.0, scale_prob=0.0, brightness=0.0, contrast=0.0)
    out = augment_batch(batch, jax.random.PRNGKey(1), cfg)
    # a pure flip lands output pixel centers exactly on source centers →
    # bilinear resample is exact
    np.testing.assert_allclose(
        np.asarray(out['pixel_values']),
        np.asarray(batch['pixel_values'])[..., ::-1],
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(out['mask_labels']),
        np.asarray(batch['mask_labels'])[..., ::-1],
    )
    np.testing.assert_array_equal(np.asarray(out['pixel_mask']), np.asarray(batch['pixel_mask']))


def test_masks_track_pixels_under_scale_jitter():
    # paint the image equal to its (single) mask: after any geometric
    # transform the nearest-sampled mask must sit where the image content is
    b, h, w = 1, 48, 48
    mask = np.zeros((b, 1, h, w), np.float32)
    mask[:, :, 12:28, 8:30] = 1.0
    batch = {
        'pixel_values': jnp.asarray(np.repeat(mask, 3, axis=1)),
        'pixel_mask': jnp.ones((b, h, w), jnp.float32),
        'mask_labels': jnp.asarray(mask),
        'class_labels': jnp.zeros((b, 1), jnp.int32),
        'instance_valid': jnp.ones((b, 1), jnp.float32),
    }
    cfg = AugmentConfig(hflip_prob=0.0, scale_prob=1.0, scale_range=(0.7, 1.4),
                        brightness=0.0, contrast=0.0)
    for seed in range(6):
        out = augment_batch(batch, jax.random.PRNGKey(seed), cfg)
        img = np.asarray(out['pixel_values'][0, 0])
        m = np.asarray(out['mask_labels'][0, 0])
        # NOTE: image clipped to [0,1] in raw space then renormalized —
        # invert to raw for comparison
        img_raw = img * STD[0] + MEAN[0]
        inter = ((img_raw > 0.5) & (m > 0.5)).sum()
        union = ((img_raw > 0.5) | (m > 0.5)).sum()
        # boundary pixels differ (image: bilinear, mask: nearest) — on a
        # 16×22 rect a one-pixel rim is ~10% of the area, so gate at 0.85
        assert union > 0 and inter / union > 0.85, f'seed {seed}: IoU {inter/union}'


def test_zoom_out_updates_instance_valid_when_mask_vanishes():
    # tiny corner mask + strong zoom-in away from it → cropped out
    b, h, w = 1, 40, 40
    mask = np.zeros((b, 1, h, w), np.float32)
    mask[:, :, :3, :3] = 1.0
    batch = {
        'pixel_values': jnp.zeros((b, 3, h, w), jnp.float32),
        'pixel_mask': jnp.ones((b, h, w), jnp.float32),
        'mask_labels': jnp.asarray(mask),
        'class_labels': jnp.zeros((b, 1), jnp.int32),
        'instance_valid': jnp.ones((b, 1), jnp.float32),
    }
    cfg = AugmentConfig(hflip_prob=0.0, scale_prob=1.0, scale_range=(3.0, 3.0),
                        brightness=0.0, contrast=0.0)
    vanished = False
    for seed in range(12):
        out = augment_batch(batch, jax.random.PRNGKey(seed), cfg)
        m = np.asarray(out['mask_labels'][0, 0])
        iv = float(out['instance_valid'][0, 0])
        assert iv == (1.0 if m.sum() > 0 else 0.0)
        vanished |= iv == 0.0
    assert vanished  # 3x zoom with random shift must crop the corner sometimes


def test_brightness_is_raw_space_multiply():
    batch = _batch()
    cfg = AugmentConfig(hflip_prob=0.0, scale_prob=0.0, brightness=0.4, contrast=0.0)
    key = jax.random.PRNGKey(7)
    out = augment_batch(batch, key, cfg)
    raw_in = np.asarray(batch['pixel_values']) * STD + MEAN
    raw_out = np.asarray(out['pixel_values']) * STD + MEAN
    # per-sample scalar factor: ratio constant across unclipped pixels
    for k in range(raw_in.shape[0]):
        sel = (raw_out[k] > 1e-3) & (raw_out[k] < 0.999)
        ratio = raw_out[k][sel] / raw_in[k][sel]
        assert ratio.std() < 1e-4
        assert 0.6 - 1e-5 <= ratio.mean() <= 1.4 + 1e-5


def test_determinism_and_jit():
    batch = _batch(seed=3)
    cfg = AugmentConfig()
    f = jax.jit(lambda b, k: augment_batch(b, k, cfg))
    a1 = f(batch, jax.random.PRNGKey(5))
    a2 = f(batch, jax.random.PRNGKey(5))
    for k in ('pixel_values', 'mask_labels', 'pixel_mask', 'instance_valid'):
        np.testing.assert_array_equal(np.asarray(a1[k]), np.asarray(a2[k]))
    a3 = f(batch, jax.random.PRNGKey(6))
    assert not np.array_equal(np.asarray(a1['pixel_values']), np.asarray(a3['pixel_values']))


def test_train_step_with_augmentation():
    from weed_instance_segmentation_tpu.engine.model_utils import init_params
    from weed_instance_segmentation_tpu.engine.steps import create_train_state, make_train_step
    from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
    from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

    cfg = Mask2FormerConfig.tiny_test(num_labels=3)
    model = Mask2Former(cfg)
    params = init_params(model, cfg, image_hw=(64, 64))
    state, tx = create_train_state(params, 1e-4)
    step = make_train_step(model, cfg, tx, augment=AugmentConfig())
    batch = _batch(b=2, h=64, w=64, n=4)
    state, loss = step(state, batch, jax.random.PRNGKey(0))
    loss = float(loss)
    assert np.isfinite(loss)


def test_from_env(monkeypatch):
    monkeypatch.delenv('WISTPU_AUGMENT', raising=False)
    assert from_env() is None
    monkeypatch.setenv('WISTPU_AUGMENT', '1')
    monkeypatch.setenv('WISTPU_AUG_BRIGHTNESS', '0.33')
    cfg = from_env()
    assert cfg is not None and cfg.brightness == pytest.approx(0.33)
