"""Parity tests: our image processor vs HF transformers==4.57.6 slow processor.

The HF processor is the exact component the reference delegates to
(reference: datasets/pheno_bench/dataset.py:119-125, models/mask2former/train.py:79).
"""

import numpy as np
import pytest

from weed_instance_segmentation_tpu.processing.image_processor import (
    Mask2FormerImageProcessor,
    compute_output_size,
    convert_segmentation_map_to_binary_masks,
)

hf_proc_mod = pytest.importorskip('transformers.models.mask2former.image_processing_mask2former')
HFProcessor = hf_proc_mod.Mask2FormerImageProcessor


def make_sample(rng, h=123, w=201, n_inst=4):
    image = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    seg = np.full((h, w), 255, dtype=np.int32)
    mapping = {}
    for i in range(1, n_inst + 1):
        y, x = rng.integers(0, h - 24), rng.integers(0, w - 24)
        seg[y : y + 20, x : x + 20] = i
        mapping[i] = int(rng.integers(0, 3))
    return image, seg, mapping


@pytest.mark.parametrize('hw', [(123, 201), (800, 1333), (1024, 768), (32, 32), (1200, 300)])
def test_output_size_matches_hf(hw):
    img = np.zeros((*hw, 3), dtype=np.uint8)
    expected = hf_proc_mod.get_mask2former_resize_output_image_size(
        img, size=800, max_size=1333, size_divisor=32, default_to_square=False
    )
    got = compute_output_size(hw, 800, 1333, 32)
    assert got == tuple(expected)


def test_binary_mask_conversion_matches_hf(rng):
    _, seg, mapping = make_sample(rng)
    ours_m, ours_c = convert_segmentation_map_to_binary_masks(seg, mapping, ignore_index=255)
    hf_m, hf_c = hf_proc_mod.convert_segmentation_map_to_binary_masks(seg, mapping, ignore_index=255)
    np.testing.assert_array_equal(ours_m, hf_m)
    np.testing.assert_array_equal(ours_c, hf_c)


def test_full_preprocess_matches_hf(rng):
    image, seg, mapping = make_sample(rng, h=240, w=320)
    ours = Mask2FormerImageProcessor()(
        images=[image], segmentation_maps=[seg], instance_id_to_semantic_id=mapping,
        return_tensors='np', ignore_index=255,
    )
    theirs = HFProcessor()(
        images=[image], segmentation_maps=[seg], instance_id_to_semantic_id=mapping,
        return_tensors='pt', ignore_index=255,
    )
    np.testing.assert_allclose(
        ours['pixel_values'], theirs['pixel_values'].numpy(), rtol=0, atol=1e-6
    )
    np.testing.assert_array_equal(ours['pixel_mask'], theirs['pixel_mask'].numpy())
    assert len(ours['mask_labels']) == len(theirs['mask_labels']) == 1
    np.testing.assert_array_equal(ours['mask_labels'][0], theirs['mask_labels'][0].numpy())
    np.testing.assert_array_equal(ours['class_labels'][0], theirs['class_labels'][0].numpy())


def test_preprocess_no_segmentation(rng):
    image = rng.integers(0, 256, size=(100, 160, 3), dtype=np.uint8)
    ours = Mask2FormerImageProcessor()(images=[image], return_tensors='np')
    theirs = HFProcessor()(images=[image], return_tensors='pt')
    np.testing.assert_allclose(
        ours['pixel_values'], theirs['pixel_values'].numpy(), rtol=0, atol=1e-6
    )


def test_empty_segmentation(rng):
    image = rng.integers(0, 256, size=(64, 64, 3), dtype=np.uint8)
    seg = np.full((64, 64), 255, dtype=np.int32)
    ours = Mask2FormerImageProcessor()(
        images=[image], segmentation_maps=[seg], instance_id_to_semantic_id={},
        return_tensors='np', ignore_index=255,
    )
    assert ours['mask_labels'][0].shape[0] == 0
    assert ours['class_labels'][0].shape[0] == 0


def test_save_and_load_roundtrip(tmp_path):
    proc = Mask2FormerImageProcessor(size={'shortest_edge': 400, 'longest_edge': 666})
    proc.save_pretrained(str(tmp_path))
    loaded = Mask2FormerImageProcessor.from_pretrained(str(tmp_path))
    assert loaded.size == proc.size
    assert loaded.image_mean == proc.image_mean
