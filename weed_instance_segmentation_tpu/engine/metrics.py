"""Evaluation driver: batched COCO mAP over a data loader (SURVEY.md C11;
reference models/metrics.py:6-122).

Same flow as the reference: per batch, rebuild GT masks/labels from the
cached ``original_map`` + ``id_mapping`` (skipping 255 / unmapped ids,
metrics.py:33-41, empty-target fallback :48-52), run the model forward
without labels, post-process at threshold 0.5 / mask_threshold 0.5
(:58-63), reformat segments into per-instance mask stacks (:65-86), and
accumulate ``MeanAveragePrecision(iou_type='segm')``.

TPU split: forward + post-process + the IoU matmuls run on device; the GT
rebuild and the tiny PR bookkeeping stay on host. Unlike the reference
(which flips the model back to ``.train()`` on exit — quirk §2.5.3) there
is no mode bit here: the forward fn is pure/deterministic.
"""

from __future__ import annotations

import numpy as np

from weed_instance_segmentation_tpu.evaluation.mean_ap import MeanAveragePrecision
from weed_instance_segmentation_tpu.processing.postprocess import (
    post_process_instance_segmentation,
)


def targets_from_original_maps(original_maps, id_mappings) -> list[dict]:
    """GT dicts for the metric from cached instance maps
    (reference metrics.py:27-52)."""
    targets = []
    for gt_map, mapping in zip(original_maps, id_mappings):
        gt_map = np.asarray(gt_map)
        masks, labels = [], []
        for uid in np.unique(gt_map):
            if uid == 255 or int(uid) not in mapping:
                continue
            masks.append(gt_map == uid)
            labels.append(mapping[int(uid)])
        if masks:
            targets.append({
                'masks': np.stack(masks),
                'labels': np.asarray(labels, np.int64),
            })
        else:
            targets.append({
                'masks': np.zeros((0, *gt_map.shape), bool),
                'labels': np.zeros((0,), np.int64),
            })
    return targets


def predictions_from_postprocess(predictions: list[dict]) -> list[dict]:
    """Reformat post-processed segments into the metric's input dicts
    (reference metrics.py:65-86)."""
    formatted = []
    for pred in predictions:
        segments_info = pred['segments_info']
        seg = np.asarray(pred['segmentation'])
        if not segments_info:
            formatted.append({
                'masks': np.zeros((0, *seg.shape), bool),
                'scores': np.zeros((0,), np.float32),
                'labels': np.zeros((0,), np.int64),
            })
            continue
        formatted.append({
            'masks': np.stack([seg == info['id'] for info in segments_info]),
            'scores': np.asarray([info['score'] for info in segments_info], np.float32),
            'labels': np.asarray([info['label_id'] for info in segments_info], np.int64),
        })
    return formatted


class _FinalLogits:
    """Minimal stand-in for Mask2FormerOutput once the final-layer logits
    have been gathered to the host (post-process needs only these two)."""

    def __init__(self, class_queries_logits, masks_queries_logits):
        self.class_queries_logits = class_queries_logits
        self.masks_queries_logits = masks_queries_logits


def test_with_metrics(forward_fn, params, data_loader, threshold: float = 0.5,
                      mesh=None) -> dict:
    """COCO segm mAP over a loader of reference-style ragged batches
    (``dataset_utils.collate_fn``). ``forward_fn(params, pixel_values)`` is
    the jitted inference step. With ``mesh``, full batches are sharded over
    the 'data' axis so the forward data-parallelizes like training (the
    post-process + PR bookkeeping stay host-side per image).

    Multi-host: EVERY process calls this with the same (unsharded) loader —
    each host reads the full batch, the global sharded array is assembled
    from the local copy, the forward spreads over all hosts' devices, and
    the final-layer logits are all-gathered (a collective — lockstep
    batches required). Host 0 alone does the per-image post-process + PR
    bookkeeping and returns the metrics; other hosts return {} (VERDICT r2
    weak #7: the test split no longer serializes onto host 0's devices)."""
    import jax

    multiprocess = mesh is not None and jax.process_count() > 1
    is_main = not multiprocess or jax.process_index() == 0
    map_metric = MeanAveragePrecision(iou_type='segm')

    if is_main:
        print('Calculating Metrics...')
    num_batches = len(data_loader)
    padded_b = None
    for i, batch in enumerate(data_loader):
        if is_main and (i + 1) % 5 == 0:
            print(f'  Processing batch {i + 1}/{num_batches}')

        targets = targets_from_original_maps(batch['original_maps'], batch['id_mappings'])

        pixel_values = np.asarray(batch['pixel_values'])
        # Pad short (final) batches up to one static, data-axis-divisible
        # shape so every batch reuses the FIRST batch's compiled executable
        # with the same sharding — a ragged tail would otherwise trigger a
        # second full XLA compile (expensive on tunneled backends). Padded
        # rows repeat the last image; their predictions are dropped below.
        n_rows = pixel_values.shape[0]
        if padded_b is None:
            data_size = mesh.shape['data'] if mesh is not None else 1
            padded_b = -(-n_rows // data_size) * data_size
        if n_rows < padded_b:
            pad = np.repeat(pixel_values[-1:], padded_b - n_rows, axis=0)
            pixel_values = np.concatenate([pixel_values, pad], axis=0)
        if mesh is not None and pixel_values.shape[0] % mesh.shape['data'] == 0:
            from weed_instance_segmentation_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(mesh)
            if multiprocess:
                # every host holds the FULL batch → feed each addressable
                # shard from the local copy (no cross-host transfer)
                pv = pixel_values
                pixel_values = jax.make_array_from_callback(
                    pv.shape, sharding, lambda idx: pv[idx]
                )
            else:
                pixel_values = jax.device_put(pixel_values, sharding)
        outputs = forward_fn(params, pixel_values)
        if multiprocess:
            from jax.experimental import multihost_utils

            cls, msk = multihost_utils.process_allgather(
                (outputs.class_queries_logits, outputs.masks_queries_logits),
                tiled=True,
            )
            if not is_main:
                continue
            outputs = _FinalLogits(cls[:n_rows], msk[:n_rows])
        elif pixel_values.shape[0] != n_rows:
            outputs = jax.tree_util.tree_map(lambda x: x[:n_rows], outputs)
        predictions = post_process_instance_segmentation(
            outputs,
            threshold=threshold,
            mask_threshold=0.5,
            target_sizes=batch['target_sizes'],
        )
        map_metric.update(predictions_from_postprocess(predictions), targets)

    return map_metric.compute() if is_main else {}


def print_metrics_evaluation(metrics_evaluation: dict, model_name: str = 'Model') -> None:
    """Console summary (reference metrics.py:95-107)."""
    print(f'\n--- {model_name} Metrics ---')
    if not metrics_evaluation:
        print('No metrics calculated.')
        return

    def get_scalar(key) -> float:
        val = metrics_evaluation.get(key)
        if val is None:
            return -1.0
        val = np.asarray(val)
        return float(val) if val.size == 1 else -1.0

    print(f'  mAP:            {100 * get_scalar("map"):.2f} %')
    print(f'  mAP (IoU=0.50): {100 * get_scalar("map_50"):.2f} %')
    print(f'  mAP (IoU=0.75): {100 * get_scalar("map_75"):.2f} %')


def prepare_metrics_for_json(results: dict) -> dict | None:
    """Array → scalar/list for json.dump (reference metrics.py:110-122)."""
    if not results:
        return None
    clean = {}
    for key, value in results.items():
        arr = np.asarray(value)
        clean[key] = arr.item() if arr.size == 1 else arr.tolist()
    return clean
