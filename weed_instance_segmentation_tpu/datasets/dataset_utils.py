"""Preprocessed cache + batching.

Mirrors the reference's ``datasets/dataset_utils.py`` (PreprocessedDataset /
collate_fn / process_and_save) with an ``.npz``-per-sample cache instead of
``.pt`` and, on top, the TPU-specific static-shape batcher that turns the
reference's ragged Python lists into fixed-size arrays a jitted train step
can consume (SURVEY.md §7.3.2).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np

from weed_instance_segmentation_tpu import config


# ---------------------------------------------------------------------------
# npz sample serialization
# ---------------------------------------------------------------------------

def _sample_to_npz_dict(item: dict) -> dict:
    ids = sorted(item['id_to_semantic'].keys())
    return {
        'pixel_values': item['pixel_values'].astype(np.float32),
        # binary masks — store compactly, restore float32 on load
        'mask_labels': item['mask_labels'].astype(np.uint8),
        'class_labels': item['class_labels'].astype(np.int64),
        'target_size': np.asarray(item['target_size'], dtype=np.int64),
        'original_map': item['original_map'].astype(np.int32),
        'id_keys': np.asarray(ids, dtype=np.int64),
        'id_vals': np.asarray([item['id_to_semantic'][k] for k in ids], dtype=np.int64),
        'file_name': np.asarray(item['file_name']),
    }


def _npz_dict_to_sample(z) -> dict:
    return {
        'pixel_values': z['pixel_values'].astype(np.float32),
        'mask_labels': z['mask_labels'].astype(np.float32),
        'class_labels': z['class_labels'].astype(np.int64),
        'target_size': tuple(int(v) for v in z['target_size']),
        'original_map': z['original_map'],
        'id_to_semantic': {int(k): int(v) for k, v in zip(z['id_keys'], z['id_vals'])},
        'file_name': str(z['file_name']),
    }


class PreprocessedDataset:
    """Loader for pre-processed per-sample ``.npz`` files (reference:
    datasets/dataset_utils.py:7-33 with ``.pt``).

    ``keys``: optional tuple restricting which arrays each ``__getitem__``
    decodes — the training loop needs only ``TRAIN_SAMPLE_KEYS``, and the
    full reference-schema sample costs ~2.5× more host time per item
    (original_map decode + the uint8→float32 mask cast that the static
    batcher immediately casts back). ``keys=None`` keeps the full
    reference-parity sample."""

    def __init__(self, processed_dir: str, keys: tuple[str, ...] | None = None):
        self.processed_dir = processed_dir
        self.keys = keys
        self.files = sorted(glob.glob(os.path.join(processed_dir, '*' + config.CACHE_SUFFIX)))
        if len(self.files) == 0:
            print(f'WARNING: No {config.CACHE_SUFFIX} files found in "{processed_dir}"')
        else:
            print(f'Loaded {len(self.files)} pre-processed samples from "{processed_dir}"')

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> dict:
        with np.load(self.files[idx], allow_pickle=False) as z:
            if self.keys is None:
                return _npz_dict_to_sample(z)
            # raw stored dtypes: f32 pixels, uint8 masks, int64 classes
            return {k: z[k] for k in self.keys}


class ConcatDataset:
    """Minimal torch-free ConcatDataset (reference uses
    torch.utils.data.ConcatDataset, train.py:133-135)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        self._offsets = np.cumsum([0] + [len(d) for d in self.datasets])

    def __len__(self) -> int:
        return int(self._offsets[-1])

    def __getitem__(self, idx: int):
        if idx < 0:
            idx += len(self)
        ds = int(np.searchsorted(self._offsets, idx, side='right')) - 1
        return self.datasets[ds][idx - int(self._offsets[ds])]


class Subset:
    """Minimal torch-free Subset."""

    def __init__(self, dataset, indices):
        self.dataset = dataset
        self.indices = list(indices)

    def __len__(self):
        return len(self.indices)

    def __getitem__(self, idx):
        return self.dataset[self.indices[idx]]


def collate_fn(batch: list[dict]) -> dict:
    """Reference-compatible ragged collation (datasets/dataset_utils.py:36-55):
    stacks pixel_values (padding to the batch max if sizes differ), keeps the
    per-sample label structures as lists."""
    shapes = [item['pixel_values'].shape for item in batch]
    max_h = max(s[1] for s in shapes)
    max_w = max(s[2] for s in shapes)
    pixel_values = np.zeros((len(batch), 3, max_h, max_w), dtype=np.float32)
    for k, item in enumerate(batch):
        _, h, w = item['pixel_values'].shape
        pixel_values[k, :, :h, :w] = item['pixel_values']
    return {
        'pixel_values': pixel_values,
        'mask_labels': [item['mask_labels'] for item in batch],
        'class_labels': [item['class_labels'] for item in batch],
        'target_sizes': [item['target_size'] for item in batch],
        'original_maps': [item['original_map'] for item in batch],
        'id_mappings': [item['id_to_semantic'] for item in batch],
        'file_names': [item['file_name'] for item in batch],
    }


def pad_batch_static(
    batch: list[dict],
    pad_hw: tuple[int, int],
    max_instances: int | None = None,
) -> dict:
    """TPU collation: one static shape for the whole run.

    Returns arrays (no lists) so the jitted train step never recompiles:
      pixel_values  (B, 3, H, W) float32
      pixel_mask    (B, H, W)    float32   1=real pixel
      mask_labels   (B, I, H, W) uint8     binary, zero-padded
      class_labels  (B, I)       int32     zero-padded
      instance_valid(B, I)       float32   1=real instance
      sample_valid  (B,)         float32   1=real sample (callers that pad
                                 short batches with repeats zero these so
                                 padding contributes nothing to the loss)

    ``mask_labels`` travel as uint8: the masks are exactly 0/1 and dominate
    the per-batch host→HBM bytes (I·H·W vs 3·H·W), so shipping them at 1
    byte instead of float32 cuts the transfer ~4× — the consumer (the loss,
    or augment) casts on device where the cast fuses for free.
    """
    if max_instances is None:
        max_instances = config.MAX_INSTANCES
    ph, pw = pad_hw
    b = len(batch)
    pixel_values = np.zeros((b, 3, ph, pw), dtype=np.float32)
    pixel_mask = np.zeros((b, ph, pw), dtype=np.float32)
    mask_labels = np.zeros((b, max_instances, ph, pw), dtype=np.uint8)
    class_labels = np.zeros((b, max_instances), dtype=np.int32)
    instance_valid = np.zeros((b, max_instances), dtype=np.float32)

    for k, item in enumerate(batch):
        _, h, w = item['pixel_values'].shape
        if h > ph or w > pw:
            raise ValueError(f'sample {k} ({h}x{w}) exceeds static pad size {pad_hw}')
        pixel_values[k, :, :h, :w] = item['pixel_values']
        pixel_mask[k, :h, :w] = 1.0
        n = min(item['mask_labels'].shape[0], max_instances)
        if item['mask_labels'].shape[0] > max_instances:
            print(
                f'WARNING: sample has {item["mask_labels"].shape[0]} instances, '
                f'truncating to MAX_INSTANCES={max_instances}'
            )
        if n > 0:
            mh, mw = item['mask_labels'].shape[1:]
            mask_labels[k, :n, :mh, :mw] = item['mask_labels'][:n]
            class_labels[k, :n] = item['class_labels'][:n]
            instance_valid[k, :n] = 1.0
    return {
        'pixel_values': pixel_values,
        'pixel_mask': pixel_mask,
        'mask_labels': mask_labels,
        'class_labels': class_labels,
        'instance_valid': instance_valid,
        'sample_valid': np.ones((b,), dtype=np.float32),
    }


TRAIN_SAMPLE_KEYS = ('pixel_values', 'mask_labels', 'class_labels')


def make_train_collate(
    pad_hw: tuple[int, int],
    max_instances: int,
    batch_rows: int,
    wire: bool | None = None,
    pixels_dtype=None,
):
    """Collate ``TRAIN_SAMPLE_KEYS`` samples straight into the device-ready
    static batch, inside the DataLoader's producer thread.

    The round-3 input path did this in three stages (ragged ``collate_fn`` →
    ``pad_batch_static`` → ``processing.wire.encode_batch``) across two
    threads, costing ~200 ms of host time per b2 800² batch — more than the
    ~98 ms/step of non-overlapped input BENCH_r03 charged against the 0.80
    duty-cycle north star. This single pass skips the uint8→f32→uint8 mask
    round-trip, never materializes the (B, H, W) f32 ``pixel_mask`` (the
    wire format is two extents per sample), and casts pixels to the compute
    dtype during their one unavoidable copy (~55 ms/batch measured,
    tools/records/probe_input_pipeline.json).

    Short batches are padded with repeats of the last sample and the repeats
    zeroed in ``sample_valid``/``instance_valid`` (multi-host loaders pad
    indices themselves and pass the true count as ``num_valid`` — the
    consumer re-zeroes from it). ``wire=None`` reads ``WISTPU_WIRE`` per
    batch (ADVICE r3: env knobs are read at use time); wire off yields the
    plain ``pad_batch_static`` layout for A/B and f32 debugging. Decoded
    bits are identical to the staged path (tests/test_wire.py).

    Reference workload being fed: /root/reference/models/mask2former/train.py:191-206.
    """
    ph, pw = pad_hw

    def collate(samples: list[dict]) -> dict:
        n = len(samples)
        samples = list(samples) + [samples[-1]] * (batch_rows - n)
        use_wire = wire if wire is not None else os.environ.get('WISTPU_WIRE', '1') == '1'
        if not use_wire:
            out = pad_batch_static(samples, pad_hw, max_instances)
        else:
            b = len(samples)
            pixels = np.zeros((b, 3, ph, pw), dtype=pixels_dtype or np.float32)
            masks = np.zeros((b, max_instances, ph, pw), dtype=np.uint8)
            hw = np.zeros((b, 2), dtype=np.int32)
            class_labels = np.zeros((b, max_instances), dtype=np.int32)
            instance_valid = np.zeros((b, max_instances), dtype=np.float32)
            for k, item in enumerate(samples):
                _, h, w = item['pixel_values'].shape
                if h > ph or w > pw:
                    raise ValueError(
                        f'sample {k} ({h}x{w}) exceeds static pad size {pad_hw}'
                    )
                pixels[k, :, :h, :w] = item['pixel_values']
                hw[k] = (h, w)
                ni = min(item['mask_labels'].shape[0], max_instances)
                if item['mask_labels'].shape[0] > max_instances:
                    print(
                        f'WARNING: sample has {item["mask_labels"].shape[0]} '
                        f'instances, truncating to MAX_INSTANCES={max_instances}'
                    )
                if ni > 0:
                    mh, mw = item['mask_labels'].shape[1:]
                    np.not_equal(
                        item['mask_labels'][:ni], 0, out=masks[k, :ni, :mh, :mw]
                    )
                    class_labels[k, :ni] = item['class_labels'][:ni]
                    instance_valid[k, :ni] = 1.0
            out = {
                'pixel_values': pixels,
                'mask_labels_packed': np.packbits(masks, axis=-1),
                'pixel_mask_hw': hw,
                'class_labels': class_labels,
                'instance_valid': instance_valid,
                'sample_valid': np.ones((b,), dtype=np.float32),
            }
        out['sample_valid'][n:] = 0.0
        out['instance_valid'][n:] = 0.0
        return out

    return collate


def process_and_save(dataset, output_dir: str) -> None:
    """Materialize every sample of ``dataset`` into ``output_dir`` as one
    ``.npz`` per image (reference: dataset_utils.py:56-70), plus a
    ``_shapes.json`` sidecar so the static pad size for XLA is computed
    without re-reading every array."""
    os.makedirs(output_dir, exist_ok=True)
    print(f'\t\tSaving to "{output_dir}"')
    total = len(dataset)
    shapes = {}
    for i in range(total):
        if (i + 1) % 10 == 0:
            print(f'\t\tProcessed {i + 1}/{total} images...', end='\r')
        item = dataset[i]
        base_name = os.path.splitext(item['file_name'])[0]
        save_path = os.path.join(output_dir, base_name + config.CACHE_SUFFIX)
        arrays = _sample_to_npz_dict(item)
        with open(save_path, 'wb') as f:
            np.savez(f, **arrays)
        shapes[base_name] = [
            int(item['pixel_values'].shape[1]),
            int(item['pixel_values'].shape[2]),
            int(item['mask_labels'].shape[0]),
        ]
    with open(os.path.join(output_dir, SHAPES_SIDECAR), 'w') as f:
        json.dump(shapes, f)
    print(f'\t\tProcessed {total}/{total} images')


SHAPES_SIDECAR = '_shapes.json'


def compute_static_pad_hw(processed_dirs: list[str], multiple: int | None = None) -> tuple[tuple[int, int], int]:
    """((max H, max W) ceil'd to ``multiple``, max instance count) across the
    given preprocessed dirs — the one static shape the train step compiles
    for. Uses the ``_shapes.json`` sidecars; falls back to scanning arrays
    for caches written before the sidecar existed."""
    multiple = multiple or config.PAD_TO_MULTIPLE
    max_h = max_w = max_i = 1
    for d in processed_dirs:
        sidecar = os.path.join(d, SHAPES_SIDECAR)
        if os.path.exists(sidecar):
            with open(sidecar) as f:
                shapes = json.load(f)
            for h, w, n in shapes.values():
                max_h, max_w, max_i = max(max_h, h), max(max_w, w), max(max_i, n)
        else:
            ds = PreprocessedDataset(d)
            for k in range(len(ds)):
                item = ds[k]
                _, h, w = item['pixel_values'].shape
                max_h, max_w = max(max_h, h), max(max_w, w)
                max_i = max(max_i, item['mask_labels'].shape[0])

    def ceil_to(v):
        return int(-(-v // multiple) * multiple)

    return (ceil_to(max_h), ceil_to(max_w)), max_i
