"""Test-only oracle for COCO-style segmentation mAP.

Neither ``pycocotools`` nor ``torchmetrics`` is installed in this
environment (the reference delegates to torchmetrics, which delegates to
the pycocotools COCOeval protocol — reference models/metrics.py:3,12). This
module is a deliberately *literal*, loop-per-detection transcription of
COCOeval's evaluateImg + accumulate semantics for iouType='segm', used to
cross-check the vectorized production implementation
(``weed_instance_segmentation_tpu.evaluation.mean_ap``) on randomized
inputs. Everything here favors obviousness over speed; nothing from this
file is imported by the framework.

Semantics transcribed:
- per (image, class): GTs stably sorted ignored-last (ignore = area outside
  the range); detections stably sorted by descending score, truncated to
  maxDet=100 before matching;
- per IoU threshold, per detection in order: scan GTs in sorted order,
  skipping matched ones; stop at the first ignored GT if a real match is
  already held; otherwise keep the best (>= running best, so exact ties go
  to the later GT);
- dtIg = matched-to-ignored-GT OR (unmatched AND detection area outside the
  range);
- accumulate: concatenate over images in update order, stable-sort by
  score, cumulate TP/FP excluding ignored, 101-point interpolated PR with
  a monotone precision envelope and searchsorted('left') recall lookup;
- recall = last rc if any detections else 0 (npig > 0), -1 if npig == 0;
- final metrics are means over entries > -1; -1 when nothing is valid.
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.round(np.arange(0.50, 1.0, 0.05), 2)
REC_THRS = np.linspace(0.0, 1.00, 101)
AREA_RNGS = [(0.0, 1e10), (0.0, 32.0 ** 2), (32.0 ** 2, 96.0 ** 2), (96.0 ** 2, 1e10)]
AREA_NAMES = ['all', 'small', 'medium', 'large']
MAX_DETS = [1, 10, 100]


def _flat(m: np.ndarray) -> np.ndarray:
    """(N, H, W) → (N, H·W); explicit so N=0 works (reshape -1 rejects it)."""
    return m.reshape(m.shape[0], int(np.prod(m.shape[1:], dtype=np.int64)))


def _mask_iou(d_masks: np.ndarray, g_masks: np.ndarray) -> np.ndarray:
    d = _flat(d_masks).astype(np.float64)
    g = _flat(g_masks).astype(np.float64)
    inter = d @ g.T
    union = d.sum(1)[:, None] + g.sum(1)[None, :] - inter
    with np.errstate(invalid='ignore', divide='ignore'):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou


def _evaluate_img(dt_scores, dt_areas, gt_areas, ious, a_rng, max_det):
    """One (image, class, areaRng) evaluation. Inputs already score-sorted.
    Returns (dtm bool (T,D), dtIg bool (T,D), gtIg bool (G,), scores (D,))."""
    t_count = len(IOU_THRS)
    gt_ig = np.array([a < a_rng[0] or a > a_rng[1] for a in gt_areas], bool)
    # stable sort: non-ignored GTs first, original order within groups
    gtind = np.argsort(gt_ig, kind='mergesort')
    gt_ig = gt_ig[gtind]
    dt_scores = dt_scores[:max_det]
    dt_areas = dt_areas[:max_det]
    ious = ious[:max_det][:, gtind] if ious.size else ious[:max_det]

    d_count, g_count = len(dt_scores), len(gt_ig)
    gtm = np.zeros((t_count, g_count), np.int64) - 1
    dtm = np.zeros((t_count, d_count), np.int64) - 1
    dt_ig_match = np.zeros((t_count, d_count), bool)
    for tind, t in enumerate(IOU_THRS):
        for dind in range(d_count):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind in range(g_count):
                if gtm[tind, gind] > -1:
                    continue
                if m > -1 and not gt_ig[m] and gt_ig[gind]:
                    break
                if ious[dind, gind] < iou:
                    continue
                iou = ious[dind, gind]
                m = gind
            if m == -1:
                continue
            dt_ig_match[tind, dind] = gt_ig[m]
            dtm[tind, dind] = m
            gtm[tind, m] = dind
    a_out = np.array([a < a_rng[0] or a > a_rng[1] for a in dt_areas], bool)
    dt_ig = np.logical_or(dt_ig_match, np.logical_and(dtm == -1, a_out[None, :]))
    return dtm > -1, dt_ig, gt_ig, dt_scores


def coco_map_oracle(all_preds: list[dict], all_targets: list[dict],
                    class_metrics: bool = False) -> dict:
    """Full-protocol mAP over per-image pred/target dicts (the
    MeanAveragePrecision.update schema)."""
    classes = sorted(
        {int(c) for t in all_targets for c in np.asarray(t['labels']).tolist()}
        | {int(c) for p in all_preds for c in np.asarray(p['labels']).tolist()}
    )
    t_count, r_count = len(IOU_THRS), len(REC_THRS)
    precision = -np.ones((t_count, r_count, len(classes), len(AREA_RNGS), len(MAX_DETS)))
    recall = -np.ones((t_count, len(classes), len(AREA_RNGS), len(MAX_DETS)))

    # per (image, class): score-sorted detections + IoU vs that class's GTs
    per_img_cls = []
    for pred, tgt in zip(all_preds, all_targets):
        p_masks = np.asarray(pred['masks'], bool)
        p_scores = np.asarray(pred['scores'], np.float64)
        p_labels = np.asarray(pred['labels'])
        g_masks = np.asarray(tgt['masks'], bool)
        g_labels = np.asarray(tgt['labels'])
        by_cls = {}
        for c in classes:
            di = np.nonzero(p_labels == c)[0]
            gi = np.nonzero(g_labels == c)[0]
            if len(di) == 0 and len(gi) == 0:
                continue
            order = np.argsort(-p_scores[di], kind='mergesort')
            di = di[order]
            dm, gm = p_masks[di], g_masks[gi]
            by_cls[c] = {
                'scores': p_scores[di],
                'dt_areas': _flat(dm).sum(1).astype(np.float64),
                'gt_areas': _flat(gm).sum(1).astype(np.float64),
                'ious': _mask_iou(dm, gm),
            }
        per_img_cls.append(by_cls)

    for ki, c in enumerate(classes):
        entries = [e[c] for e in per_img_cls if c in e]
        for ai, a_rng in enumerate(AREA_RNGS):
            evals = [
                _evaluate_img(e['scores'], e['dt_areas'], e['gt_areas'],
                              e['ious'], a_rng, MAX_DETS[-1])
                for e in entries
            ]
            for mi, max_det in enumerate(MAX_DETS):
                scores = np.concatenate([ev[3][:max_det] for ev in evals]) \
                    if evals else np.zeros((0,))
                order = np.argsort(-scores, kind='mergesort')
                dtm = np.concatenate([ev[0][:, :max_det] for ev in evals], axis=1)[:, order] \
                    if evals else np.zeros((t_count, 0), bool)
                dt_ig = np.concatenate([ev[1][:, :max_det] for ev in evals], axis=1)[:, order] \
                    if evals else np.zeros((t_count, 0), bool)
                npig = int(sum((~ev[2]).sum() for ev in evals))
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, ~dt_ig)
                fps = np.logical_and(~dtm, ~dt_ig)
                tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                for tind in range(t_count):
                    tp, fp = tp_sum[tind], fp_sum[tind]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((r_count,))
                    recall[tind, ki, ai, mi] = rc[-1] if nd else 0.0
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds = np.searchsorted(rc, REC_THRS, side='left')
                    for ri, pi in enumerate(inds):
                        try:
                            q[ri] = pr[pi]
                        except IndexError:
                            pass
                    precision[tind, :, ki, ai, mi] = q

    def _mean(arr):
        valid = arr > -1
        return np.float32(arr[valid].mean()) if valid.any() else np.float32(-1.0)

    def _ap(t=slice(None), area='all', max_det=100):
        return _mean(precision[t, :, :, AREA_NAMES.index(area), MAX_DETS.index(max_det)])

    def _ar(area='all', max_det=100):
        return _mean(recall[:, :, AREA_NAMES.index(area), MAX_DETS.index(max_det)])

    t50 = int(np.argwhere(np.isclose(IOU_THRS, 0.5))[0][0])
    t75 = int(np.argwhere(np.isclose(IOU_THRS, 0.75))[0][0])
    result = {
        'map': _ap(),
        'map_50': _ap(slice(t50, t50 + 1)),
        'map_75': _ap(slice(t75, t75 + 1)),
        'map_small': _ap(area='small'),
        'map_medium': _ap(area='medium'),
        'map_large': _ap(area='large'),
        'mar_1': _ar(max_det=1),
        'mar_10': _ar(max_det=10),
        'mar_100': _ar(max_det=100),
        'mar_small': _ar(area='small'),
        'mar_medium': _ar(area='medium'),
        'mar_large': _ar(area='large'),
        'classes': np.asarray(classes, np.int32),
    }
    if class_metrics and classes:
        ai, mi = AREA_NAMES.index('all'), MAX_DETS.index(100)
        result['map_per_class'] = np.asarray(
            [_mean(precision[:, :, ki, ai, mi]) for ki in range(len(classes))], np.float32)
        result['mar_100_per_class'] = np.asarray(
            [_mean(recall[:, ki, ai, mi]) for ki in range(len(classes))], np.float32)
    else:
        result['map_per_class'] = np.float32(-1.0)
        result['mar_100_per_class'] = np.float32(-1.0)
    return result
