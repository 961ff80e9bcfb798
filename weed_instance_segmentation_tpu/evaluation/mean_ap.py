"""COCO-style instance-segmentation mAP (SURVEY.md X10).

API-compatible replacement for ``torchmetrics.detection.MeanAveragePrecision
(iou_type='segm')`` — the metric the reference computes in
models/metrics.py:3,12,88-90 and reads as ``map / map_50 / map_75``
(models/metrics.py:105-107) then serializes wholesale
(``prepare_metrics_for_json``, metrics.py:110-122).

Semantics follow the COCO evaluation protocol that torchmetrics delegates
to (pycocotools COCOeval, iouType='segm'):

- IoU thresholds 0.50:0.05:0.95 on masks; 101-point interpolated PR;
- per-(image, class, area-range) greedy matching: predictions in
  score-descending order each claim the still-unmatched GT with the highest
  IoU ≥ t (exact ties → the later GT, as in COCOeval's scan order), with
  GTs outside the area range marked *ignore* and sorted last — a prediction
  prefers any qualifying in-range GT and falls back to ignored ones;
- predictions matched to an ignored GT, or unmatched with area outside the
  range, are ignored (neither TP nor FP);
- max detections 1/10/100 per (image, class) for mar_1/mar_10/mar_100
  (score-descending truncation of the match columns);
- classes with no GT anywhere contribute nothing; empty → -1.0
  (torchmetrics convention).

Fidelity is cross-checked against a literal per-detection transcription of
COCOeval's evaluateImg/accumulate in ``tests/cocoeval_oracle.py`` on
randomized multi-image/multi-class/area-bucket cases
(``tests/test_mean_ap.py``).

TPU-first split: the O(N·H·W) work — pairwise mask intersections — is one
(P, HW)@(HW, G) matmul on the MXU via :func:`mask_iou_matrix`; the tiny
O(P·G) greedy matching and PR accumulation stay on host.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

IOU_THRESHOLDS = np.round(np.arange(0.50, 1.0, 0.05), 2)  # 10 thresholds
REC_THRESHOLDS = np.linspace(0.0, 1.00, 101)
AREA_RANGES = {
    'all': (0.0, 1e10),
    'small': (0.0, 32.0 ** 2),
    'medium': (32.0 ** 2, 96.0 ** 2),
    'large': (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


@partial(jax.jit, static_argnames=())
def _inter_kernel(preds: jnp.ndarray, gts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(P, HW) bool, (G, HW) bool → intersections (P, G), pred areas (P,),
    gt areas (G,). One f32 matmul → MXU; all values are exact integer counts
    (< 2^24 pixels per mask)."""
    p = preds.astype(jnp.float32)
    g = gts.astype(jnp.float32)
    return p @ g.T, p.sum(-1), g.sum(-1)


def mask_iou_matrix(pred_masks: np.ndarray, gt_masks: np.ndarray):
    """Pairwise mask IoU: the O(N·H·W) intersection matmul runs on device;
    the (P, G) division happens in float64 on host so IoU values are
    bit-identical to the float64 COCO protocol (threshold comparisons at
    0.55 etc. are sensitive to the rounding of the quotient).

    pred_masks (P, H, W), gt_masks (G, H, W) →
    (iou (P, G) f64, pred_areas (P,), gt_areas (G,)) as numpy."""
    pred_masks = np.asarray(pred_masks)
    gt_masks = np.asarray(gt_masks)
    p = pred_masks.reshape(len(pred_masks), -1) if pred_masks.size else np.zeros((len(pred_masks), 0))
    g = gt_masks.reshape(len(gt_masks), -1) if gt_masks.size else np.zeros((len(gt_masks), 0))
    if len(p) == 0 or len(g) == 0:
        return (
            np.zeros((len(p), len(g)), np.float64),
            p.sum(-1).astype(np.float64),
            g.sum(-1).astype(np.float64),
        )
    inter, pa, ga = (np.asarray(v, np.float64) for v in
                     _inter_kernel(jnp.asarray(p, jnp.bool_), jnp.asarray(g, jnp.bool_)))
    union = pa[:, None] + ga[None, :] - inter
    with np.errstate(invalid='ignore', divide='ignore'):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou, pa, ga


def _greedy_match(iou: np.ndarray, gt_ignore: np.ndarray,
                  thresholds: np.ndarray = IOU_THRESHOLDS) -> np.ndarray:
    """COCOeval.evaluateImg matching, vectorized over IoU thresholds.

    iou (P, G) with P already score-sorted/truncated; gt_ignore (G,) marks
    GTs outside the area range. Returns dtm (T, P) int — matched gt index
    or -1.

    Semantics (all from COCOeval's scan order, where GTs are stably sorted
    ignored-last): a detection takes the highest-IoU still-unmatched
    *in-range* GT with IoU ≥ t if one exists, else the highest-IoU unmatched
    ignored GT; exact IoU ties resolve to the later GT in original order.
    The inner per-GT loop is replaced by two masked arg-maxes per detection
    across all T thresholds at once (the sequential dependency is only over
    detections)."""
    p, g = iou.shape
    t_count = len(thresholds)
    dtm = np.full((t_count, p), -1, np.int64)
    if p == 0 or g == 0:
        return dtm
    gt_ignore = np.asarray(gt_ignore, bool)
    unmatched = np.ones((t_count, g), bool)
    thr = np.minimum(thresholds, 1 - 1e-10)[:, None]  # (T, 1)
    t_idx = np.arange(t_count)
    for di in range(p):
        row = iou[di][None, :]  # (1, G)
        qualifies = unmatched & (row >= thr)  # (T, G)
        for group_mask in (~gt_ignore, gt_ignore):
            cand = qualifies & group_mask[None, :]
            has = cand.any(axis=1)
            if not has.any():
                continue
            # argmax of row within cand, ties → LAST gt (reverse-scan argmax)
            masked = np.where(cand, row, -np.inf)
            pick = (g - 1) - np.argmax(masked[:, ::-1], axis=1)
            take = has & (dtm[:, di] < 0)
            dtm[take, di] = pick[take]
            unmatched[t_idx[take], pick[take]] = False
    return dtm


class MeanAveragePrecision:
    """Drop-in for ``torchmetrics.detection.MeanAveragePrecision`` as used
    by the reference: ``update(preds, target)`` with per-image dicts
    {'masks' (N,H,W) bool, 'scores' (N,), 'labels' (N,)} (preds) and
    {'masks', 'labels'} (target); ``compute()`` → dict of scalar arrays
    (``.item()``-able) + 'classes'; ``reset()``."""

    def __init__(self, iou_type: str = 'segm', class_metrics: bool = False):
        if iou_type != 'segm':
            raise NotImplementedError('only iou_type="segm" is implemented')
        self.class_metrics = class_metrics
        self.reset()

    def reset(self) -> None:
        # per (image, class): dict(scores, iou, pred_areas, gt_areas)
        self._entries: list[dict] = []
        self._classes: set[int] = set()  # classes with GT (drive the means)
        self._pred_classes: set[int] = set()  # union for the 'classes' key

    def update(self, preds: list[dict], target: list[dict]) -> None:
        for pred, tgt in zip(preds, target):
            p_masks = np.asarray(_to_np(pred['masks']), bool)
            p_scores = np.asarray(_to_np(pred['scores']), np.float32)
            p_labels = np.asarray(_to_np(pred['labels']), np.int64)
            g_masks = np.asarray(_to_np(tgt['masks']), bool)
            g_labels = np.asarray(_to_np(tgt['labels']), np.int64)

            classes = set(p_labels.tolist()) | set(g_labels.tolist())
            self._classes |= set(g_labels.tolist())
            self._pred_classes |= set(p_labels.tolist())
            per_class = {}
            for c in classes:
                pi = np.nonzero(p_labels == c)[0]
                gi = np.nonzero(g_labels == c)[0]
                order = np.argsort(-p_scores[pi], kind='stable')
                pi = pi[order]
                iou, pa, ga = mask_iou_matrix(p_masks[pi], g_masks[gi])
                per_class[int(c)] = {
                    'scores': p_scores[pi],
                    'iou': iou,
                    'pred_areas': pa,
                    'gt_areas': ga,
                }
            self._entries.append(per_class)

    def compute(self) -> dict:
        classes = sorted(self._classes | self._pred_classes)
        t_count = len(IOU_THRESHOLDS)
        # precision[T, R, K, A, M], recall[T, K, A, M]
        shape_p = (t_count, len(REC_THRESHOLDS), len(classes), len(AREA_RANGES), len(MAX_DETS))
        precision = -np.ones(shape_p)
        recall = -np.ones((t_count, len(classes), len(AREA_RANGES), len(MAX_DETS)))

        for ki, c in enumerate(classes):
            per_img = [entry[c] for entry in self._entries if c in entry]
            # matching depends on the area range only through the GT-ignore
            # pattern (COCOeval evaluateImg sorts out-of-range GTs last);
            # cache per image by that pattern — the 'all' range and any
            # bucket where every GT is in/out of range share one match
            dtm_cache: list[dict[bytes, np.ndarray]] = [{} for _ in per_img]
            for ai, (a_lo, a_hi) in enumerate(AREA_RANGES.values()):
                matched_imgs = []
                for e, cache in zip(per_img, dtm_cache):
                    ga = e['gt_areas']
                    gt_ig = (ga < a_lo) | (ga > a_hi)
                    key = gt_ig.tobytes()
                    dtm = cache.get(key)
                    if dtm is None:
                        dtm = _greedy_match(e['iou'][: MAX_DETS[-1]], gt_ig)
                        cache[key] = dtm
                    matched_imgs.append((e, gt_ig, dtm))

                for mi, max_det in enumerate(MAX_DETS):
                    scores_all, tps_all, igs_all = [], [], []
                    npig = 0
                    for e, gt_ig, dtm_full in matched_imgs:
                        ga = e['gt_areas']
                        npig += int((~gt_ig).sum())
                        n_dt = min(len(e['scores']), max_det)
                        if n_dt == 0:
                            continue
                        dtm = dtm_full[:, :n_dt]
                        pa = e['pred_areas'][:n_dt]
                        matched = dtm >= 0
                        # ignore: matched to an ignored gt, or unmatched with
                        # out-of-range area (COCOeval dtIg)
                        safe = np.clip(dtm, 0, max(len(ga) - 1, 0))
                        m_ig = np.where(matched, gt_ig[safe] if len(ga) else False, False)
                        out_of_range = (pa < a_lo) | (pa > a_hi)
                        dt_ig = m_ig | (~matched & out_of_range[None, :])
                        scores_all.append(e['scores'][:n_dt])
                        tps_all.append(matched & ~dt_ig)
                        igs_all.append(dt_ig)
                    if npig == 0:
                        continue
                    if scores_all:
                        scores = np.concatenate(scores_all)
                        order = np.argsort(-scores, kind='mergesort')
                        tps = np.concatenate(tps_all, axis=1)[:, order]
                        igs = np.concatenate(igs_all, axis=1)[:, order]
                        fps = ~tps & ~igs
                        tp_cum = np.cumsum(tps, axis=1).astype(np.float64)
                        fp_cum = np.cumsum(fps, axis=1).astype(np.float64)
                        for ti in range(t_count):
                            tp, fp = tp_cum[ti], fp_cum[ti]
                            rc = tp / npig
                            pr = tp / (fp + tp + np.spacing(1))
                            recall[ti, ki, ai, mi] = rc[-1] if len(rc) else 0.0
                            # precision envelope (monotone non-increasing)
                            pr = np.maximum.accumulate(pr[::-1])[::-1]
                            inds = np.searchsorted(rc, REC_THRESHOLDS, side='left')
                            q = np.zeros(len(REC_THRESHOLDS))
                            in_range = inds < len(pr)
                            q[in_range] = pr[inds[in_range]]
                            precision[ti, :, ki, ai, mi] = q
                    else:
                        recall[:, ki, ai, mi] = 0.0
                        precision[:, :, ki, ai, mi] = 0.0

        def _ap(t_slice=slice(None), area='all', max_det=100):
            ai = list(AREA_RANGES).index(area)
            mi = MAX_DETS.index(max_det)
            s = precision[t_slice, :, :, ai, mi]
            valid = s > -1
            return np.float32(s[valid].mean()) if valid.any() else np.float32(-1.0)

        def _ar(area='all', max_det=100):
            ai = list(AREA_RANGES).index(area)
            mi = MAX_DETS.index(max_det)
            s = recall[:, :, ai, mi]
            valid = s > -1
            return np.float32(s[valid].mean()) if valid.any() else np.float32(-1.0)

        t50 = int(np.argwhere(np.isclose(IOU_THRESHOLDS, 0.5))[0][0])
        t75 = int(np.argwhere(np.isclose(IOU_THRESHOLDS, 0.75))[0][0])
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
        ai_all, mi_100 = 0, MAX_DETS.index(100)
        if self.class_metrics and classes:
            per_cls_ap, per_cls_ar = [], []
            for ki in range(len(classes)):
                s = precision[:, :, ki, ai_all, mi_100]
                r = recall[:, ki, ai_all, mi_100]
                per_cls_ap.append(s[s > -1].mean() if (s > -1).any() else -1.0)
                per_cls_ar.append(r[r > -1].mean() if (r > -1).any() else -1.0)
            result['map_per_class'] = np.asarray(per_cls_ap, np.float32)
            result['mar_100_per_class'] = np.asarray(per_cls_ar, np.float32)
        else:
            result['map_per_class'] = np.float32(-1.0)
            result['mar_100_per_class'] = np.float32(-1.0)
        return result


def _to_np(x):
    if hasattr(x, 'detach'):  # torch tensor
        return x.detach().cpu().numpy()
    return np.asarray(x)
