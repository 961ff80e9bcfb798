"""Fused device preprocessing (processing.fused) vs the host PIL parity
path (SURVEY.md X8)."""

import numpy as np
from PIL import Image

import jax.numpy as jnp

from weed_instance_segmentation_tpu.processing.fused import (
    fused_preprocess, fused_resize_mask, pil_bilinear_weights, pil_nearest_indices,
    preprocess_batch_on_device,
)
from weed_instance_segmentation_tpu.processing.image_processor import (
    IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD, Mask2FormerImageProcessor,
)


def test_bilinear_weight_rows_normalized(rng):
    for in_s, out_s in [(1024, 800), (97, 64), (64, 96), (50, 50)]:
        m = pil_bilinear_weights(in_s, out_s)
        np.testing.assert_allclose(m.sum(1), 1.0, atol=1e-6)
        assert (m >= 0).all()


def test_resize_matches_pil_within_1lsb(rng):
    img = rng.integers(0, 256, (96, 128, 3), np.uint8)
    out_hw = (64, 96)
    want = np.asarray(
        Image.fromarray(img).resize((out_hw[1], out_hw[0]), Image.BILINEAR)
    ).astype(np.float32)

    rh = pil_bilinear_weights(96, 64)
    rw = pil_bilinear_weights(128, 96)
    x = img.astype(np.float32)
    x = np.einsum('pw,hwc->hpc', rw, x)
    x = np.clip(np.round(np.einsum('oh,hpc->opc', rh, x)), 0, 255)
    # PIL uses 22-bit fixed-point coefficients with inter-pass uint8
    # rounding; the float emulation is within ±1 LSB, most pixels exact
    assert np.abs(x - want).max() <= 1.0
    assert (np.abs(x - want) > 0).mean() < 0.25


def test_fused_preprocess_matches_host_processor(rng):
    img = rng.integers(0, 256, (96, 128, 3), np.uint8)
    proc = Mask2FormerImageProcessor(
        size={'shortest_edge': 64, 'longest_edge': 96}, size_divisor=32
    )
    host = proc([img])  # PIL path
    out_hw = proc.output_size_for((96, 128))

    pv, mask = fused_preprocess(jnp.asarray(img[None]), out_hw, out_hw)
    got = np.asarray(pv[0])
    want = host['pixel_values'][0]
    assert got.shape == want.shape
    # tolerance: ±1 uint8 LSB propagated through normalize (≈1/255/std)
    tol = (1.0 / 255.0) / min(IMAGENET_DEFAULT_STD) + 1e-6
    assert np.abs(got - want).max() <= tol
    assert np.asarray(mask).min() == 1.0  # pad == out → all valid


def test_fused_preprocess_padding():
    img = np.zeros((64, 64, 3), np.uint8)
    pv, mask = fused_preprocess(jnp.asarray(img[None]), (64, 64), (96, 128))
    assert pv.shape == (1, 3, 96, 128)
    m = np.asarray(mask[0])
    assert m[:64, :64].min() == 1.0
    assert m[64:].max() == 0.0 and m[:, 64:].max() == 0.0
    # padded region is zeros in pixel space (post-normalize values come from
    # zero-padding after normalization, matching HF zero padding)
    assert np.asarray(pv)[0, :, 64:, :].max() == 0.0


def test_nearest_mask_resize_matches_pil(rng):
    mask = rng.integers(0, 7, (96, 128), np.int32)
    for out_hw in [(64, 96), (48, 48), (128, 160)]:
        want = np.asarray(
            Image.fromarray(mask, mode='I').resize((out_hw[1], out_hw[0]), Image.NEAREST)
        )
        got = np.asarray(fused_resize_mask(jnp.asarray(mask[None]), out_hw)[0])
        np.testing.assert_array_equal(got, want)


def test_preprocess_batch_on_device(rng):
    imgs = [rng.integers(0, 256, (96, 128, 3), np.uint8) for _ in range(2)]
    proc = Mask2FormerImageProcessor(
        size={'shortest_edge': 64, 'longest_edge': 96}, size_divisor=32
    )
    pv, mask = preprocess_batch_on_device(imgs, proc)
    assert pv.shape[0] == 2 and pv.shape[1] == 3
