"""Instance-segmentation post-processing, device-side (SURVEY.md X9).

Replicates HF ``post_process_instance_segmentation``
(image_processing_mask2former.py:1069-1188) exactly, including the quirks
SURVEY.md §2.5.5 flags for mask parity:

- mask logits are bilinearly upsampled to a HARD-CODED (384, 384) before
  scoring (HF:1122-1124);
- scores = softmax(class logits)[:, :-1], flattened (Q·C) top-k with
  k = num_queries (HF:1138-1141);
- binary masks = logits > 0 at 384×384; mask score = mean sigmoid prob
  inside the binary mask with +1e-6 (HF:1148-1151); final score =
  class·mask score;
- binary masks nearest-resized (torch legacy nearest = floor) to the
  target size (HF:1156-1160);
- sequential overwrite into an int id map starting at -1 background, ids
  assigned 0,1,2,… in top-k order over kept queries only (HF:1162-1177);
  empty (all-zero) masks are skipped even above threshold.

TPU-first design: the per-query Python loop becomes a max-reduce — for
each pixel the LAST kept query whose mask covers it wins (identical to the
sequential overwrite); segments_info becomes fixed-size arrays + a
validity mask instead of a Python list, so the whole function jits.
Ordering note: HF uses ``topk(sorted=False)`` (order implementation-
defined, in practice sorted); we use ``lax.top_k`` (sorted descending) —
documented tie-ordering deviation per SURVEY.md §7.3.5. Resize note: the
default 384² upsample is the separable-MATMUL bilinear (ledger D13,
≤2e-6 vs the gather form); ``WISTPU_POSTPROC_RESIZE=gather`` restores
exact HF arithmetic.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.ops.resize import (
    interpolate_bilinear, interpolate_bilinear_mm, interpolate_nearest,
)

SCORE_RESOLUTION = (384, 384)  # HF:1122 — hard-coded for all models


def _upsample(mask_pred: jnp.ndarray, resize_mode: str) -> jnp.ndarray:
    """200²→384² logit upsample. Default ``'matmul'``: separable-matmul
    bilinear (MXU; 11.6 → 5.7 ms per b4 batch,
    tools/profile_postprocess.py) — same taps/weights as the gather form
    but not bit-identical (matmul accumulation; ≤2e-6 abs on logits, 0
    binarization flips measured; deviation ledger entry D13).
    ``WISTPU_POSTPROC_RESIZE=gather`` restores the exact HF:1122-1124
    arithmetic."""
    if resize_mode == 'gather':
        return interpolate_bilinear(mask_pred, SCORE_RESOLUTION)
    return interpolate_bilinear_mm(mask_pred, SCORE_RESOLUTION)


class InstanceSegmentationResult(NamedTuple):
    """Fixed-size device-side result for one image (batch-leading when
    batched): ``segmentation`` (H, W) int32 id map with -1 background;
    per-slot arrays aligned with top-k order."""

    segmentation: jnp.ndarray  # (H, W) int32, -1 = background
    segment_ids: jnp.ndarray  # (Q,) int32, -1 for dropped slots
    labels: jnp.ndarray  # (Q,) int32 class label per slot
    scores: jnp.ndarray  # (Q,) float32 final score per slot
    valid: jnp.ndarray  # (Q,) bool — slot kept
    masks: jnp.ndarray  # (Q, H, W) bool binary masks at target size


def post_process_instance_arrays(
    class_queries_logits: jnp.ndarray,
    masks_queries_logits: jnp.ndarray,
    target_size: tuple[int, int],
    threshold: float = 0.5,
    with_masks: bool = True,
) -> InstanceSegmentationResult:
    """Batched jit post-processing. Inputs (B, Q, C+1) and (B, Q, Hm, Wm);
    returns batch-leading fixed-size arrays.

    The resize mode env knob is resolved HERE, outside the jit cache, so
    flipping ``WISTPU_POSTPROC_RESIZE`` between calls retraces instead of
    silently reusing the first compile (the ADVICE-r3 import-time-env rule).
    """
    resize_mode = os.environ.get('WISTPU_POSTPROC_RESIZE', 'matmul')
    return _post_process_impl(
        class_queries_logits, masks_queries_logits, target_size,
        threshold, with_masks, resize_mode,
    )


@partial(jax.jit, static_argnames=('target_size', 'threshold', 'with_masks',
                                   'resize_mode'))
def _post_process_impl(
    class_queries_logits: jnp.ndarray,
    masks_queries_logits: jnp.ndarray,
    target_size: tuple[int, int],
    threshold: float = 0.5,
    with_masks: bool = True,
    resize_mode: str = 'matmul',
) -> InstanceSegmentationResult:
    """HF-sequence post-processing restructured for HBM (the naive
    transcription moved ~900 MB/image at 800²; VERDICT r3 #2). Bit-identical
    to HF with ``resize_mode='gather'``; the default ``'matmul'`` upsample
    deviates ≤2e-6 on logits (deviation ledger D13, 2× faster on the MXU):

    - everything runs at the 384² scoring resolution; the target-size
      nearest resize (HF:1156-1160) is a floor gather, which commutes with
      the per-pixel last-covering-slot max, so only the final (H, W) int32
      id map is gathered to target size — never (Q, H, W) f32 masks;
    - the (Q, 384²) top-k query gather (HF:1146) is replaced by a per-query
      reduction: for each ORIGINAL query, the maximum kept top-k slot that
      selects it; the overwrite max then runs over un-gathered masks;
    - per-query coverage (the empty-mask skip, HF:1162) is evaluated on the
      statically-known set of 384² source pixels the target grid actually
      samples, which equals coverage at target size exactly;
    - ``with_masks=False`` (serving id-map/bench path) skips materializing
      the (Q, H, W) target-size binary masks entirely (``masks=None``);
      metrics/export keep the default.
    """
    th, tw = target_size
    sh, sw = SCORE_RESOLUTION
    # torch legacy nearest: src = floor(dst * in/out) (ops/resize.py)
    ys = np.minimum(np.floor(np.arange(th) * (sh / th)).astype(np.int64), sh - 1)
    xs = np.minimum(np.floor(np.arange(tw) * (sw / tw)).astype(np.int64), sw - 1)
    hit_rows = np.unique(ys)  # source pixels the target grid samples —
    hit_cols = np.unique(xs)  # all of them when upsampling, a subset when not

    def one(mask_cls, mask_pred):
        up = _upsample(mask_pred, resize_mode)  # (Q, 384, 384)
        bin_orig = up > 0  # (Q, 384, 384) bool, original query order
        binf = bin_orig.astype(jnp.float32)
        mask_scores_q = (jax.nn.sigmoid(up) * binf).sum((-1, -2)) / (
            binf.sum((-1, -2)) + 1e-6
        )  # (Q,) per original query (slots sharing a query dedup for free)
        if len(hit_rows) == sh and len(hit_cols) == sw:
            # upsampling: every 384² source pixel is sampled — the slice is
            # an identity gather XLA won't always elide; skip it
            covers_target_q = bin_orig.any((-1, -2))
        else:
            covers_target_q = bin_orig[:, hit_rows][:, :, hit_cols].any((-1, -2))
        return _finish(mask_cls, mask_scores_q, covers_target_q, bin_orig)

    def one_fused(mask_cls, sig_sum, pos_cnt, bin_i8):
        # kernel already reduced sigmoid-sum / positive-count per query;
        # only the int8 bins (4× smaller than the f32 logits) are re-read
        bin_orig = bin_i8 != 0
        mask_scores_q = sig_sum / (pos_cnt + 1e-6)
        if len(hit_rows) == sh and len(hit_cols) == sw:
            covers_target_q = pos_cnt > 0
        else:
            covers_target_q = bin_orig[:, hit_rows][:, :, hit_cols].any((-1, -2))
        return _finish(mask_cls, mask_scores_q, covers_target_q, bin_orig)

    def _finish(mask_cls, mask_scores_q, covers_target_q, bin_orig):
        num_queries, num_classes_p1 = mask_cls.shape
        num_classes = num_classes_p1 - 1

        scores = jax.nn.softmax(mask_cls, axis=-1)[:, :-1]  # (Q, C)
        flat_scores = scores.reshape(-1)
        scores_per_image, topk_indices = jax.lax.top_k(flat_scores, num_queries)
        labels_per_image = topk_indices % num_classes
        query_indices = topk_indices // num_classes
        pred_scores = scores_per_image * mask_scores_q[query_indices]

        keep = (pred_scores >= threshold) & covers_target_q[query_indices]
        # ids 0,1,2,… assigned in slot order over kept slots (HF:1171)
        seg_ids = jnp.where(keep, jnp.cumsum(keep) - 1, -1).astype(jnp.int32)

        # sequential overwrite: per pixel, the LAST kept covering slot wins.
        # Dense (Q, Q) form instead of a scatter-max: per original query,
        # the max kept slot selecting it (slots can repeat queries — one
        # query may pass top-k under several classes).
        slots = jnp.arange(num_queries, dtype=jnp.int32)
        selects = (query_indices[None, :] == slots[:, None]) & keep[None, :]
        maxslot_q = jnp.max(
            jnp.where(selects, slots[None, :], -1), axis=1
        )  # (Q,) in original query order, -1 if never kept
        last_slot = jnp.max(
            jnp.where(bin_orig, maxslot_q[:, None, None], -1), axis=0
        )  # (384, 384), -1 if no kept mask covers the pixel
        seg_small = jnp.where(
            last_slot >= 0, seg_ids[jnp.clip(last_slot, 0, num_queries - 1)], -1
        ).astype(jnp.int32)
        segmentation = seg_small[ys][:, xs]  # (H, W) — the one target gather

        return InstanceSegmentationResult(
            segmentation=segmentation,
            segment_ids=seg_ids,
            labels=labels_per_image.astype(jnp.int32),
            scores=pred_scores.astype(jnp.float32),
            valid=keep,
            masks=bin_orig[query_indices][:, ys][:, :, xs] if with_masks else None,
        )

    if resize_mode == 'fused':
        from weed_instance_segmentation_tpu.ops.postprocess_kernel import (
            fused_upsample_stats, pick_q_tile,
        )

        sig_sum, pos_cnt, bin_i8 = fused_upsample_stats(
            masks_queries_logits, SCORE_RESOLUTION,
            q_tile=pick_q_tile(masks_queries_logits.shape[1]),
            # Mosaic lowering exists only on TPU; every other backend
            # (cpu, gpu) falls back to the Pallas interpreter (ADVICE r4)
            interpret=jax.default_backend() != 'tpu',
        )
        return jax.vmap(one_fused)(class_queries_logits, sig_sum,
                                   pos_cnt, bin_i8)
    return jax.vmap(one)(class_queries_logits, masks_queries_logits)


def post_process_instance_segmentation(
    outputs,
    threshold: float = 0.5,
    mask_threshold: float = 0.5,  # accepted for API parity (HF binarizes at logits>0)
    overlap_mask_area_threshold: float = 0.8,  # API parity; unused like HF's instance path
    target_sizes: list[tuple[int, int]] | None = None,
    return_binary_maps: bool = False,
) -> list[dict]:
    """HF-compatible wrapper: list of {'segmentation', 'segments_info'}
    per image (reference consumes this in models/metrics.py:58-86 and
    inference.py:30)."""
    class_logits = jnp.asarray(outputs.class_queries_logits)
    mask_logits = jnp.asarray(outputs.masks_queries_logits)
    b = class_logits.shape[0]
    if target_sizes is None:
        target_sizes = [SCORE_RESOLUTION] * b

    results = []
    # per-image loop; post_process_instance_arrays compiles once per
    # distinct (target_size, threshold) and is cached across images
    for i in range(b):
        res = post_process_instance_arrays(
            class_logits[i : i + 1], mask_logits[i : i + 1],
            tuple(target_sizes[i]), float(threshold),
        )
        seg = np.asarray(res.segmentation[0])
        valid = np.asarray(res.valid[0])
        labels = np.asarray(res.labels[0])
        scores = np.asarray(res.scores[0])
        ids = np.asarray(res.segment_ids[0])
        segments_info = [
            {
                'id': int(ids[j]),
                'label_id': int(labels[j]),
                'was_fused': False,
                'score': round(float(scores[j]), 6),
            }
            for j in range(len(valid))
            if valid[j]
        ]
        out = {'segmentation': seg.astype(np.float32), 'segments_info': segments_info}
        if return_binary_maps:
            masks = np.asarray(res.masks[0])[valid]
            out['segmentation'] = masks.astype(np.float32)
        results.append(out)
    return results
