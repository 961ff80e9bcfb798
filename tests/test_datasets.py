"""Loader + cache + preprocess-driver tests on synthetic fixtures, including
a differential test against the actual reference loaders (which are runnable
here since torch-cpu + cv2 + transformers are installed)."""

import os
import sys

import numpy as np
import pytest

from weed_instance_segmentation_tpu.datasets.dataset_utils import (
    ConcatDataset, PreprocessedDataset, collate_fn, pad_batch_static, process_and_save,
)
from weed_instance_segmentation_tpu.datasets.factory import get_dataset_and_config
from weed_instance_segmentation_tpu.datasets.preprocess import split_lengths
from weed_instance_segmentation_tpu.processing.image_processor import Mask2FormerImageProcessor

from fixtures import make_crop_weed_png, make_crop_weed_yaml, make_pheno_bench, make_sorghum_weed

# Use small processor so tests are fast: images stay near fixture size.
SMALL = dict(size={'shortest_edge': 96, 'longest_edge': 160})


def _check_sample(item, expected_instances=None):
    assert set(item.keys()) == {
        'pixel_values', 'mask_labels', 'class_labels', 'target_size',
        'original_map', 'id_to_semantic', 'file_name',
    }
    assert item['pixel_values'].ndim == 3 and item['pixel_values'].shape[0] == 3
    n = item['mask_labels'].shape[0]
    assert item['class_labels'].shape == (n,)
    assert len(item['id_to_semantic']) == n
    if expected_instances is not None:
        assert n == expected_instances
    # masks binary
    assert set(np.unique(item['mask_labels'])) <= {0.0, 1.0}


def test_factory_resolves_all():
    for name in ('sorghum_weed', 'pheno_bench', 'crop_weed'):
        cls, cfg = get_dataset_and_config(name)
        assert cls.__name__ == name.title().replace('_', '') + 'Dataset'
        assert hasattr(cfg, 'ID2LABEL')


def test_factory_unknown_dataset():
    with pytest.raises(ValueError):
        get_dataset_and_config('no_such_dataset')


def test_pheno_bench_loader(tmp_path, rng):
    make_pheno_bench(str(tmp_path), rng)
    from weed_instance_segmentation_tpu.datasets.pheno_bench.dataset import PhenoBenchDataset

    proc = Mask2FormerImageProcessor(**SMALL)
    ds = PhenoBenchDataset(
        image_folder_path=os.path.join(tmp_path, 'train/images'),
        annotation_path=os.path.join(tmp_path, 'train/semantics'),
        processor=proc,
        label2id={'background': 0, 'crop': 1, 'weed': 2},
    )
    assert len(ds) == 3
    item = ds[0]
    _check_sample(item, expected_instances=3)  # 2 crop blobs + 1 weed blob
    assert sorted(item['id_to_semantic'].values()) == [1, 1, 2]


def test_crop_weed_png_loader(tmp_path, rng):
    make_crop_weed_png(str(tmp_path), rng)
    from weed_instance_segmentation_tpu.datasets.crop_weed.annotation_dependent_implementations.dataset_from_png_annotations import (
        CropWeedDataset,
    )

    ds = CropWeedDataset(
        image_folder_path=os.path.join(tmp_path, 'images'),
        annotation_path=os.path.join(tmp_path, 'annotations'),
        processor=Mask2FormerImageProcessor(**SMALL),
        label2id={'crop': 0, 'weed': 1},
    )
    assert len(ds) == 4
    item = ds[0]
    _check_sample(item, expected_instances=3)
    assert sorted(item['id_to_semantic'].values()) == [0, 0, 1]


def test_crop_weed_yaml_loader(tmp_path, rng):
    make_crop_weed_yaml(str(tmp_path), rng)
    from weed_instance_segmentation_tpu.datasets.crop_weed.annotation_dependent_implementations.dataset_from_yaml_annotations import (
        CropWeedDataset,
    )

    ds = CropWeedDataset(
        image_folder_path=os.path.join(tmp_path, 'images'),
        annotation_path=os.path.join(tmp_path, 'annotations'),
        processor=Mask2FormerImageProcessor(**SMALL),
        label2id={'crop': 0, 'weed': 1},
    )
    assert len(ds) == 4
    item = ds[0]
    # crop rect + weed triangle; malformed + unknown-type regions skipped.
    # NB the skipped weed still consumed an instance id in the reference's
    # numbering (id increments only on success — so ids are 1 and 2 here).
    _check_sample(item, expected_instances=2)
    assert sorted(item['id_to_semantic'].values()) == [0, 1]


def test_sorghum_weed_loader(tmp_path, rng):
    make_sorghum_weed(str(tmp_path), rng)
    from weed_instance_segmentation_tpu.datasets.sorghum_weed.dataset import SorghumWeedDataset

    ds = SorghumWeedDataset(
        image_folder_path=os.path.join(tmp_path, 'Train'),
        annotation_path=os.path.join(tmp_path, 'Annotations/TrainSorghumWeed_json.json'),
        processor=Mask2FormerImageProcessor(**SMALL),
        label2id={'Sorghum': 0, 'BLweed': 1, 'Grass': 2},
    )
    assert len(ds) == 3
    item = ds[0]
    _check_sample(item, expected_instances=2)
    assert sorted(item['id_to_semantic'].values()) == [0, 1]
    # accepts the reference's stale kwarg spelling too (SURVEY.md §2.5.1)
    ds2 = SorghumWeedDataset(
        image_folder_path=os.path.join(tmp_path, 'Train'),
        annotation_file_path=os.path.join(tmp_path, 'Annotations/TrainSorghumWeed_json.json'),
        processor=Mask2FormerImageProcessor(**SMALL),
        label2id={'Sorghum': 0},
    )
    assert len(ds2) == 3


def test_cache_roundtrip_and_collate(tmp_path, rng):
    make_crop_weed_png(str(tmp_path / 'raw'), rng)
    from weed_instance_segmentation_tpu.datasets.crop_weed.annotation_dependent_implementations.dataset_from_png_annotations import (
        CropWeedDataset,
    )

    ds = CropWeedDataset(
        image_folder_path=os.path.join(tmp_path, 'raw/images'),
        annotation_path=os.path.join(tmp_path, 'raw/annotations'),
        processor=Mask2FormerImageProcessor(**SMALL),
        label2id={'crop': 0, 'weed': 1},
    )
    out = str(tmp_path / 'processed')
    process_and_save(ds, out)
    cached = PreprocessedDataset(out)
    assert len(cached) == len(ds)

    raw_item, cached_item = ds[0], cached[0]
    np.testing.assert_array_equal(raw_item['pixel_values'], cached_item['pixel_values'])
    np.testing.assert_array_equal(raw_item['mask_labels'], cached_item['mask_labels'])
    np.testing.assert_array_equal(raw_item['class_labels'], cached_item['class_labels'])
    assert raw_item['id_to_semantic'] == cached_item['id_to_semantic']
    assert raw_item['target_size'] == cached_item['target_size']

    batch = collate_fn([cached[0], cached[1]])
    assert batch['pixel_values'].shape[0] == 2
    assert len(batch['mask_labels']) == 2

    static = pad_batch_static([cached[0], cached[1]], pad_hw=(128, 160), max_instances=8)
    assert static['pixel_values'].shape == (2, 3, 128, 160)
    assert static['mask_labels'].shape == (2, 8, 128, 160)
    assert static['instance_valid'].sum() == 6  # 3 instances per image

    concat = ConcatDataset([cached, cached])
    assert len(concat) == 2 * len(cached)
    np.testing.assert_array_equal(
        concat[len(cached)]['pixel_values'], cached[0]['pixel_values']
    )


def test_split_lengths():
    assert split_lengths(81, [0.8, 0.2, 0]) == [64, 17, 0]
    assert split_lengths(10, [0.8, 0, 0.2]) == [8, 0, 2]
    assert split_lengths(7, [0.5, 0.25, 0.25]) == [3, 1, 3]


def test_differential_vs_reference_pheno_bench(tmp_path, rng):
    """Our pheno_bench loader + processor vs the actual reference loader +
    HF processor on identical fixture data. Masks must agree as a multiset
    of (class, mask) pairs (instance numbering may permute with CCL label
    order)."""
    make_pheno_bench(str(tmp_path), rng, n=1)
    sys.path.insert(0, '/root/reference')
    try:
        import importlib

        import config as ref_config  # /root/reference/config.py
        ref_mod = importlib.import_module('datasets.pheno_bench.dataset')
        from transformers.models.mask2former.image_processing_mask2former import (
            Mask2FormerImageProcessor as HFProcessor,
        )

        label2id = {'background': 0, 'crop': 1, 'weed': 2}
        ref_ds = ref_mod.PhenoBenchDataset(
            image_folder_path=os.path.join(tmp_path, 'train/images'),
            annotation_path=os.path.join(tmp_path, 'train/semantics'),
            processor=HFProcessor(**SMALL),
            label2id=label2id,
        )
        ref_item = ref_ds[0]
    finally:
        sys.path.remove('/root/reference')
        for m in list(sys.modules):
            if m == 'config' or m.startswith('datasets'):
                del sys.modules[m]

    from weed_instance_segmentation_tpu.datasets.pheno_bench.dataset import PhenoBenchDataset

    ours = PhenoBenchDataset(
        image_folder_path=os.path.join(tmp_path, 'train/images'),
        annotation_path=os.path.join(tmp_path, 'train/semantics'),
        processor=Mask2FormerImageProcessor(**SMALL),
        label2id={'background': 0, 'crop': 1, 'weed': 2},
    )[0]

    np.testing.assert_allclose(
        ours['pixel_values'], ref_item['pixel_values'].numpy(), atol=1e-6
    )
    ref_masks = ref_item['mask_labels'].numpy()
    ref_classes = ref_item['class_labels'].numpy()
    assert ours['mask_labels'].shape == ref_masks.shape
    # match our masks to reference masks exactly (order-insensitive)
    used = set()
    for i in range(ours['mask_labels'].shape[0]):
        found = False
        for j in range(ref_masks.shape[0]):
            if j in used:
                continue
            if np.array_equal(ours['mask_labels'][i], ref_masks[j]):
                assert ours['class_labels'][i] == ref_classes[j]
                used.add(j)
                found = True
                break
        assert found, f'our mask {i} has no exact match in reference masks'
