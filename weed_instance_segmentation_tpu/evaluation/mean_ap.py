"""COCO-style instance-segmentation mAP (SURVEY.md X10).

API-compatible replacement for ``torchmetrics.detection.MeanAveragePrecision
(iou_type='segm')`` — the metric the reference computes in
models/metrics.py:3,12,88-90 and reads as ``map / map_50 / map_75``
(models/metrics.py:105-107) then serializes wholesale
(``prepare_metrics_for_json``, metrics.py:110-122).

Semantics follow the COCO evaluation protocol that torchmetrics delegates
to (pycocotools COCOeval, iouType='segm'):

- IoU thresholds 0.50:0.05:0.95 on masks; 101-point interpolated PR;
- per-(image, class) greedy matching: predictions in score-descending
  order each claim the still-unmatched GT with the highest IoU ≥ t (ties →
  first GT);
- area ranges all/small/medium/large = [0,1e10]/[0,32²]/[32²,96²]/[96²,1e10]
  on GT pixel counts; unmatched predictions with area outside the range are
  ignored (neither TP nor FP);
- max detections 1/10/100 per (image, class) for mar_1/mar_10/mar_100;
- classes with no GT anywhere are excluded; empty → -1.0 (torchmetrics
  convention).

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
def _iou_kernel(preds: jnp.ndarray, gts: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(P, HW) bool, (G, HW) bool → IoU (P, G), pred areas (P,), gt areas (G,).

    The intersection matrix is a single f32 matmul → MXU."""
    p = preds.astype(jnp.float32)
    g = gts.astype(jnp.float32)
    inter = p @ g.T
    pa = p.sum(-1)
    ga = g.sum(-1)
    union = pa[:, None] + ga[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0), pa, ga


def mask_iou_matrix(pred_masks: np.ndarray, gt_masks: np.ndarray):
    """Device-side pairwise mask IoU. pred_masks (P, H, W), gt_masks (G, H, W)
    → (iou (P, G), pred_areas (P,), gt_areas (G,)) as numpy."""
    pred_masks = np.asarray(pred_masks)
    gt_masks = np.asarray(gt_masks)
    p = pred_masks.reshape(len(pred_masks), -1) if pred_masks.size else np.zeros((len(pred_masks), 0))
    g = gt_masks.reshape(len(gt_masks), -1) if gt_masks.size else np.zeros((len(gt_masks), 0))
    if len(p) == 0 or len(g) == 0:
        return (
            np.zeros((len(p), len(g)), np.float32),
            p.sum(-1).astype(np.float32),
            g.sum(-1).astype(np.float32),
        )
    iou, pa, ga = _iou_kernel(jnp.asarray(p, jnp.bool_), jnp.asarray(g, jnp.bool_))
    return np.asarray(iou), np.asarray(pa), np.asarray(ga)


def _greedy_match(iou: np.ndarray, thresholds: np.ndarray) -> np.ndarray:
    """COCOeval.evaluateImg matching. iou (P, G) with P already
    score-sorted/truncated. Returns dtm (T, P) int — matched gt index or -1."""
    p, g = iou.shape
    t_count = len(thresholds)
    dtm = np.full((t_count, p), -1, np.int64)
    gtm = np.zeros((t_count, g), bool)
    for ti, t in enumerate(thresholds):
        for di in range(p):
            best = min(t, 1 - 1e-10)
            m = -1
            for gi in range(g):
                if gtm[ti, gi]:
                    continue
                if iou[di, gi] < best:
                    continue
                best = iou[di, gi]
                m = gi
            if m >= 0:
                dtm[ti, di] = m
                gtm[ti, m] = True
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
        self._classes: set[int] = set()

    def update(self, preds: list[dict], target: list[dict]) -> None:
        for pred, tgt in zip(preds, target):
            p_masks = np.asarray(_to_np(pred['masks']), bool)
            p_scores = np.asarray(_to_np(pred['scores']), np.float32)
            p_labels = np.asarray(_to_np(pred['labels']), np.int64)
            g_masks = np.asarray(_to_np(tgt['masks']), bool)
            g_labels = np.asarray(_to_np(tgt['labels']), np.int64)

            classes = set(p_labels.tolist()) | set(g_labels.tolist())
            self._classes |= set(g_labels.tolist())
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
        classes = sorted(self._classes)
        t_count = len(IOU_THRESHOLDS)
        # precision[T, R, K, A, M], recall[T, K, A, M]
        shape_p = (t_count, len(REC_THRESHOLDS), len(classes), len(AREA_RANGES), len(MAX_DETS))
        precision = -np.ones(shape_p)
        recall = -np.ones((t_count, len(classes), len(AREA_RANGES), len(MAX_DETS)))

        for ki, c in enumerate(classes):
            # matching is area-independent; compute once per image at maxDet=100
            per_img = []
            for entry in self._entries:
                e = entry.get(c)
                if e is None:
                    continue
                iou = e['iou'][: MAX_DETS[-1]]
                dtm = _greedy_match(iou, IOU_THRESHOLDS)
                per_img.append((e, dtm))

            for ai, (a_lo, a_hi) in enumerate(AREA_RANGES.values()):
                for mi, max_det in enumerate(MAX_DETS):
                    scores_all, tps_all, igs_all = [], [], []
                    npig = 0
                    for e, dtm_full in per_img:
                        ga = e['gt_areas']
                        gt_ig = (ga < a_lo) | (ga > a_hi)
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
                            pr = pr.tolist()
                            for i in range(len(pr) - 1, 0, -1):
                                if pr[i] > pr[i - 1]:
                                    pr[i - 1] = pr[i]
                            inds = np.searchsorted(rc, REC_THRESHOLDS, side='left')
                            q = np.zeros(len(REC_THRESHOLDS))
                            for ri, pi_ in enumerate(inds):
                                if pi_ < len(pr):
                                    q[ri] = pr[pi_]
                            precision[:, :, ki, ai, mi][ti] = q
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
