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


def _local_logit_rows(arr, expected_rows: int):
    """Rows of a batch-sharded global array that live on THIS host's
    devices, in global-row order, or None if they don't form this host's
    contiguous loader slice (caller falls back to an allgather). Shards
    replicated over a 'model' axis dedupe by row offset."""
    by_start = {}
    for s in arr.addressable_shards:
        start = s.index[0].start or 0
        if start not in by_start:
            by_start[start] = np.asarray(s.data)
    rows = np.concatenate([by_start[k] for k in sorted(by_start)], axis=0)
    return rows if rows.shape[0] == expected_rows else None


def test_with_metrics(forward_fn, params, data_loader, threshold: float = 0.5,
                      mesh=None, pad_hw: tuple[int, int] | None = None) -> dict:
    """COCO segm mAP over a loader of reference-style ragged batches
    (``dataset_utils.collate_fn``). ``forward_fn(params, pixel_values)`` is
    the jitted inference step. With ``mesh``, batches are sharded over the
    'data' axis so the forward data-parallelizes like training (the
    post-process + PR bookkeeping stay host-side per image).

    Multi-host (VERDICT r3 #7 — no N× read amplification): every process
    calls this with a PROCESS-SHARDED loader (``DataLoader(process_index=,
    process_count=)``), so each host reads only its 1/P slice of the split.
    The global batch is assembled from process-local rows, the forward runs
    over the full mesh, and each host extracts its own rows of the
    final-layer logits from its addressable shards (nothing device-wide is
    gathered), post-processes its own images, and accumulates a local
    metric. At the end the tiny per-(image, class) metric entries — scores
    + (P, G) IoU matrices + areas — are pickle-allgathered and merged in
    global image order on host 0, which alone returns the metrics (other
    hosts return {}). ``pad_hw`` (required multi-host when image sizes can
    vary) pads every image to one static H×W so all hosts trace identical
    shapes; single-process keeps per-batch ragged shapes like the
    reference."""
    import jax

    multiprocess = mesh is not None and jax.process_count() > 1
    is_main = not multiprocess or jax.process_index() == 0
    map_metric = MeanAveragePrecision(iou_type='segm')
    entries_per_batch: list[int] = []

    if is_main:
        print('Calculating Metrics...')
    num_batches = len(data_loader)
    padded_b = None
    for i, batch in enumerate(data_loader):
        if is_main and (i + 1) % 5 == 0:
            print(f'  Processing batch {i + 1}/{num_batches}')

        pixel_values = np.asarray(batch['pixel_values'])
        n_rows = pixel_values.shape[0]
        # sharded loaders pad short batches with repeats and report the
        # true local count; repeats are dropped from the metric below
        n_valid = int(batch.get('num_valid', n_rows))
        targets = targets_from_original_maps(
            batch['original_maps'][:n_valid], batch['id_mappings'][:n_valid]
        )

        if multiprocess and pad_hw is not None:
            ph, pw = pad_hw
            _, _, h, w = pixel_values.shape
            if (h, w) != (ph, pw):
                padded = np.zeros(
                    (n_rows, pixel_values.shape[1], ph, pw), pixel_values.dtype
                )
                padded[:, :, :h, :w] = pixel_values
                pixel_values = padded
        # Pad short (final) batches up to one static, data-axis-divisible
        # shape so every batch reuses the FIRST batch's compiled executable
        # with the same sharding — a ragged tail would otherwise trigger a
        # second full XLA compile (expensive on tunneled backends). Padded
        # rows repeat the last image; their predictions are dropped below.
        if padded_b is None:
            data_size = mesh.shape['data'] if mesh is not None else 1
            if multiprocess:
                data_size = max(data_size // jax.process_count(), 1)
            padded_b = -(-n_rows // data_size) * data_size
        if n_rows < padded_b:
            pad = np.repeat(pixel_values[-1:], padded_b - n_rows, axis=0)
            pixel_values = np.concatenate([pixel_values, pad], axis=0)
        if mesh is not None:
            from weed_instance_segmentation_tpu.parallel.mesh import batch_sharding

            sharding = batch_sharding(mesh)
            if multiprocess:
                # local rows → global sharded batch (rows never leave the
                # host that loaded them, mirroring the training input path)
                pixel_values = jax.make_array_from_process_local_data(
                    sharding, pixel_values
                )
            elif pixel_values.shape[0] % mesh.shape['data'] == 0:
                pixel_values = jax.device_put(pixel_values, sharding)
        outputs = forward_fn(params, pixel_values)
        if multiprocess:
            cls = _local_logit_rows(outputs.class_queries_logits, padded_b)
            msk = _local_logit_rows(outputs.masks_queries_logits, padded_b)
            if cls is None or msk is None:
                # output sharding didn't land batch-major on this host's
                # devices (unusual mesh) — fall back to a full allgather
                from jax.experimental import multihost_utils

                cls, msk = multihost_utils.process_allgather(
                    (outputs.class_queries_logits, outputs.masks_queries_logits),
                    tiled=True,
                )
                lo = jax.process_index() * padded_b
                cls, msk = cls[lo : lo + padded_b], msk[lo : lo + padded_b]
            outputs = _FinalLogits(cls[:n_valid], msk[:n_valid])
        elif pixel_values.shape[0] != n_valid:
            outputs = jax.tree_util.tree_map(lambda x: x[:n_valid], outputs)
        predictions = post_process_instance_segmentation(
            outputs,
            threshold=threshold,
            mask_threshold=0.5,
            target_sizes=batch['target_sizes'][:n_valid],
        )
        map_metric.update(predictions_from_postprocess(predictions), targets)
        entries_per_batch.append(n_valid)

    if not multiprocess:
        return map_metric.compute()

    # merge per-image entries in GLOBAL image order (batch-major, host-minor
    # — each host's slice of global batch i is contiguous), so the final
    # stable score sort is identical to a single-process run
    from weed_instance_segmentation_tpu.parallel.mesh import gather_pyobjects

    payloads = gather_pyobjects({
        'entries': map_metric._entries,
        'counts': entries_per_batch,
        'classes': sorted(map_metric._classes),
        'pred_classes': sorted(map_metric._pred_classes),
    })
    if not is_main:
        return {}
    merged = MeanAveragePrecision(iou_type='segm')
    iters = [iter(p['entries']) for p in payloads]
    for bi in range(max(len(p['counts']) for p in payloads)):
        for hi, p in enumerate(payloads):
            if bi < len(p['counts']):
                for _ in range(p['counts'][bi]):
                    merged._entries.append(next(iters[hi]))
    for p in payloads:
        merged._classes |= set(p['classes'])
        merged._pred_classes |= set(p['pred_classes'])
    return merged.compute()


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
