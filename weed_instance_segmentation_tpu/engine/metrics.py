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


def test_with_metrics(forward_fn, params, data_loader, threshold: float = 0.5,
                      mesh=None) -> dict:
    """COCO segm mAP over a loader of reference-style ragged batches
    (``dataset_utils.collate_fn``). ``forward_fn(params, pixel_values)`` is
    the jitted inference step. With ``mesh``, full batches are sharded over
    the 'data' axis so the forward data-parallelizes like training (the
    post-process + PR bookkeeping stay host-side per image)."""
    map_metric = MeanAveragePrecision(iou_type='segm')

    print('Calculating Metrics...')
    num_batches = len(data_loader)
    for i, batch in enumerate(data_loader):
        if (i + 1) % 5 == 0:
            print(f'  Processing batch {i + 1}/{num_batches}')

        targets = targets_from_original_maps(batch['original_maps'], batch['id_mappings'])

        pixel_values = np.asarray(batch['pixel_values'])
        if mesh is not None and pixel_values.shape[0] % mesh.shape['data'] == 0:
            import jax

            from weed_instance_segmentation_tpu.parallel.mesh import batch_sharding

            pixel_values = jax.device_put(pixel_values, batch_sharding(mesh))
        outputs = forward_fn(params, pixel_values)
        predictions = post_process_instance_segmentation(
            outputs,
            threshold=threshold,
            mask_threshold=0.5,
            target_sizes=batch['target_sizes'],
        )
        map_metric.update(predictions_from_postprocess(predictions), targets)

    return map_metric.compute()


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
