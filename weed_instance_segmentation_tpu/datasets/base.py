"""Shared loader machinery for the raw (un-cached) datasets.

Every concrete dataset produces the reference's 7-key sample dict
(pixel_values, mask_labels, class_labels, target_size, original_map,
id_to_semantic, file_name — reference: datasets/sorghum_weed/dataset.py:96-104)
with numpy arrays instead of torch tensors.

The per-dataset classes differ only in how they turn annotations into an
``(instance_map, instance_id_to_semantic_id)`` pair; the resize / processor /
packaging logic lives here once instead of being copy-pasted per loader.
"""

from __future__ import annotations

import os

import numpy as np
from PIL import Image

from weed_instance_segmentation_tpu import config

IGNORE_INDEX = 255


class WeedInstanceDataset:
    """Base class: sequence of 7-key sample dicts."""

    def __init__(self, image_folder_path=None, annotation_path=None, processor=None,
                 label2id: dict | None = None, **kwargs):
        # The reference calls loaders with two different kwarg spellings
        # (`annotation_path` in train.py:100 vs `annotation_file_path` in
        # preprocess.py:40 — a latent TypeError there, SURVEY.md §2.5.1).
        # We accept both.
        if annotation_path is None:
            annotation_path = kwargs.pop('annotation_file_path', None)
        else:
            kwargs.pop('annotation_file_path', None)
        if kwargs:
            raise TypeError(f'Unexpected kwargs: {sorted(kwargs)}')
        self.image_folder = image_folder_path
        self.annotation_path = annotation_path
        self.processor = processor
        self.label2id = label2id or {}

    # -- subclass hooks -----------------------------------------------------

    def _entries(self):
        """List of per-sample descriptors (set in subclass __init__)."""
        raise NotImplementedError

    def _load_sample(self, idx: int):
        """Return (image: PIL RGB, instance_map int32 HxW, id_to_semantic,
        file_name). The instance map must already be at the (possibly
        resized-to-MAX_INPUT_DIM) image resolution, background/ignore=255."""
        raise NotImplementedError

    # -- shared ---------------------------------------------------------------

    @staticmethod
    def _resize_to_max_dim(image: Image.Image) -> tuple[Image.Image, float]:
        """Long-side resize to config.MAX_INPUT_DIM (bilinear), as every
        reference loader does before calling the processor."""
        width, height = image.size
        scale_factor = 1.0
        if max(width, height) > config.MAX_INPUT_DIM:
            scale_factor = config.MAX_INPUT_DIM / max(width, height)
            new_width = int(width * scale_factor)
            new_height = int(height * scale_factor)
            image = image.resize(size=(new_width, new_height), resample=Image.BILINEAR)
        return image, scale_factor

    def __len__(self) -> int:
        return len(self._entries())

    def __getitem__(self, idx: int) -> dict:
        image, instance_map, id_to_semantic, file_name = self._load_sample(idx)
        width, height = image.size
        target_size = (height, width)

        inputs = self.processor(
            images=[image],
            segmentation_maps=[instance_map],
            instance_id_to_semantic_id=id_to_semantic,
            return_tensors='np',
            ignore_index=IGNORE_INDEX,
        )
        return {
            'pixel_values': inputs['pixel_values'][0],
            'mask_labels': inputs['mask_labels'][0],
            'class_labels': inputs['class_labels'][0],
            'target_size': target_size,
            'original_map': instance_map,
            'id_to_semantic': id_to_semantic,
            'file_name': file_name,
        }


def truncate_to_max_images(items: list) -> list:
    """Honor config.MAX_IMAGES the way every reference loader does."""
    if config.MAX_IMAGES is not None:
        return items[: config.MAX_IMAGES]
    return items


def open_rgb(path: str) -> Image.Image:
    return Image.open(path).convert('RGB')


def skip_255(current_instance_id: int) -> int:
    """Instance id 255 is reserved as ignore_index; every reference loader
    skips it when numbering instances (e.g. pheno_bench/dataset.py:104-105)."""
    return current_instance_id + 1 if current_instance_id == IGNORE_INDEX else current_instance_id


__all__ = ['WeedInstanceDataset', 'truncate_to_max_images', 'open_rgb', 'skip_255',
           'IGNORE_INDEX']


def basename(path: str) -> str:
    return os.path.basename(path)
