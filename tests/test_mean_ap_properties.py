"""Metamorphic / property tests for the COCO segm mAP (VERDICT r2 weak #4).

The randomized differential tests in test_mean_ap.py validate against
tests/cocoeval_oracle.py — but implementation and oracle share one author,
so a shared misreading of the COCO protocol would pass both. These tests
are ORACLE-FREE: each asserts either an invariance the protocol guarantees
by construction (reference: pycocotools COCOeval semantics, as consumed by
the reference via torchmetrics in models/metrics.py:88-107) or a small
analytic case whose exact value follows from the 101-point interpolated-AP
definition by hand.
"""

import numpy as np

from weed_instance_segmentation_tpu.evaluation.mean_ap import MeanAveragePrecision

H, W = 48, 64
KEYS = ('map', 'map_50', 'map_75', 'map_small', 'map_medium', 'map_large',
        'mar_1', 'mar_10', 'mar_100')


def _blob(rng, margin=8):
    """Random rectangular blob kept `margin` px inside the canvas (so a
    translation by < margin cannot clip it)."""
    m = np.zeros((H, W), bool)
    h = int(rng.integers(4, 16))
    w = int(rng.integers(4, 16))
    y = int(rng.integers(margin, H - margin - h))
    x = int(rng.integers(margin, W - margin - w))
    m[y:y + h, x:x + w] = True
    return m


def _scenario(seed, n_images=3, margin=8):
    """Random (preds, targets) lists with overlapping prediction blobs."""
    rng = np.random.default_rng(seed)
    preds, targets = [], []
    for _ in range(n_images):
        n_gt = int(rng.integers(1, 4))
        gt_masks = np.stack([_blob(rng, margin) for _ in range(n_gt)])
        gt_labels = rng.integers(0, 3, n_gt).astype(np.int64)
        n_pr = int(rng.integers(1, 6))
        pr_masks = []
        pr_labels = []
        for k in range(n_pr):
            if k < n_gt and rng.random() < 0.7:
                # jittered copy of a GT: shift by a couple of px
                dy, dx = rng.integers(-2, 3, 2)
                pr_masks.append(np.roll(gt_masks[k], (dy, dx), (0, 1)))
                pr_labels.append(gt_labels[k] if rng.random() < 0.8
                                 else int(rng.integers(0, 3)))
            else:
                pr_masks.append(_blob(rng, margin))
                pr_labels.append(int(rng.integers(0, 3)))
        preds.append({
            'masks': np.stack(pr_masks),
            'scores': rng.random(n_pr).astype(np.float32),
            'labels': np.asarray(pr_labels, np.int64),
        })
        targets.append({'masks': gt_masks, 'labels': gt_labels})
    return preds, targets


def _compute(preds, targets):
    m = MeanAveragePrecision(iou_type='segm')
    m.update(preds, targets)
    return m.compute()


def _assert_same(a, b):
    for k in KEYS:
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), atol=1e-7, err_msg=k
        )


# ---------------------------------------------------------------------------
# invariances the COCO protocol guarantees by construction
# ---------------------------------------------------------------------------

def test_score_monotone_transform_invariance():
    """Only the score RANKING matters: any strictly increasing transform of
    all scores leaves every metric unchanged."""
    for seed in (0, 1, 2):
        preds, targets = _scenario(seed)
        base = _compute(preds, targets)
        warped = [
            dict(p, scores=(0.05 + 0.9 / (1 + np.exp(-3.0 * p['scores']))).astype(np.float32))
            for p in preds
        ]
        _assert_same(base, _compute(warped, targets))


def test_image_duplication_invariance():
    """Duplicating EVERY image (preds + GT) doubles all TP/FP counts and the
    recall denominator at identical score cuts → every metric unchanged."""
    for seed in (3, 4):
        preds, targets = _scenario(seed)
        base = _compute(preds, targets)
        dup = _compute(preds + preds, targets + targets)
        _assert_same(base, dup)


def test_mask_translation_invariance():
    """Translating every mask (pred and GT) of an image by one common offset
    preserves all pairwise IoUs and areas → metrics unchanged. Blobs are
    generated ≥8 px inside the border, so a 5-px roll never wraps content."""
    for seed in (5, 6):
        preds, targets = _scenario(seed, margin=8)
        base = _compute(preds, targets)
        shift = lambda m: np.roll(m, (5, -4), (1, 2))  # noqa: E731
        moved_p = [dict(p, masks=shift(p['masks'])) for p in preds]
        moved_t = [dict(t, masks=shift(t['masks'])) for t in targets]
        _assert_same(base, _compute(moved_p, moved_t))


def test_mask_flip_invariance():
    """Horizontally flipping every mask preserves IoUs/areas → unchanged."""
    preds, targets = _scenario(7)
    base = _compute(preds, targets)
    flip = lambda m: m[:, :, ::-1]  # noqa: E731
    _assert_same(base, _compute(
        [dict(p, masks=flip(p['masks'])) for p in preds],
        [dict(t, masks=flip(t['masks'])) for t in targets],
    ))


def test_class_relabeling_invariance():
    """A consistent permutation of class ids permutes per-class APs but
    leaves the class-mean metrics unchanged."""
    perm = {0: 7, 1: 5, 2: 9}
    for seed in (8, 9):
        preds, targets = _scenario(seed)
        base = _compute(preds, targets)
        rel = lambda ls: np.asarray([perm[int(v)] for v in ls], np.int64)  # noqa: E731
        got = _compute(
            [dict(p, labels=rel(p['labels'])) for p in preds],
            [dict(t, labels=rel(t['labels'])) for t in targets],
        )
        _assert_same(base, got)


def test_update_granularity_invariance():
    """One update() with all images == per-image update() calls (the COCO
    accumulation pools per-(image,class) entries globally)."""
    preds, targets = _scenario(10, n_images=4)
    base = _compute(preds, targets)
    m = MeanAveragePrecision(iou_type='segm')
    for p, t in zip(preds, targets):
        m.update([p], [t])
    _assert_same(base, m.compute())


def test_upscale_invariance():
    """2× nearest upsampling of every mask scales intersection and union by
    exactly 4 → identical IoUs. Areas scale 4×, so restrict to scenarios
    whose masks stay within one area bucket... simpler: compare only the
    area-independent keys."""
    preds, targets = _scenario(11)
    base = _compute(preds, targets)
    up = lambda m: np.repeat(np.repeat(m, 2, axis=1), 2, axis=2)  # noqa: E731
    got = _compute(
        [dict(p, masks=up(p['masks'])) for p in preds],
        [dict(t, masks=up(t['masks'])) for t in targets],
    )
    for k in ('map', 'map_50', 'map_75', 'mar_1', 'mar_10', 'mar_100'):
        np.testing.assert_allclose(np.asarray(base[k]), np.asarray(got[k]),
                                   atol=1e-7, err_msg=k)


# ---------------------------------------------------------------------------
# analytic micro-cases (exact values from the 101-point AP definition)
# ---------------------------------------------------------------------------

def _one(mask, score=0.9, label=0):
    return {
        'masks': mask[None].astype(bool),
        'scores': np.asarray([score], np.float32),
        'labels': np.asarray([label], np.int64),
    }


def test_duplicate_prediction_after_full_recall_is_free():
    """1 GT, an exact match plus an identical lower-scored duplicate: the
    duplicate is an FP, but it lands AFTER recall 1.0 is reached, and the
    precision envelope ignores it → mAP stays exactly 1.0."""
    gt = np.zeros((H, W), bool)
    gt[10:20, 10:30] = True
    preds = [{
        'masks': np.stack([gt, gt]),
        'scores': np.asarray([0.9, 0.8], np.float32),
        'labels': np.asarray([0, 0], np.int64),
    }]
    targets = [{'masks': gt[None], 'labels': np.asarray([0], np.int64)}]
    res = _compute(preds, targets)
    assert float(res['map']) == 1.0
    assert float(res['map_50']) == 1.0


def test_fp_scored_above_tp_gives_half():
    """1 GT; a disjoint FP scored ABOVE the exact TP. At every IoU
    threshold: after det1 (FP) P=0,R=0; after det2 (TP) P=1/2,R=1. The
    precision envelope is 1/2 at every recall point → mAP = 0.5 exactly."""
    gt = np.zeros((H, W), bool)
    gt[10:20, 10:30] = True
    fp = np.zeros((H, W), bool)
    fp[30:40, 40:60] = True
    preds = [{
        'masks': np.stack([fp, gt]),
        'scores': np.asarray([0.9, 0.8], np.float32),
        'labels': np.asarray([0, 0], np.int64),
    }]
    targets = [{'masks': gt[None], 'labels': np.asarray([0], np.int64)}]
    res = _compute(preds, targets)
    assert float(res['map']) == 0.5
    assert float(res['map_50']) == 0.5


def test_missing_gt_gives_51_of_101():
    """2 GTs, only one predicted (exactly): recall tops out at 0.5, so the
    101-point grid has nonzero precision at the 51 points r ∈ {0, .01, …,
    .50} → AP = 51/101 exactly, at every IoU threshold."""
    g1 = np.zeros((H, W), bool)
    g1[5:15, 5:25] = True
    g2 = np.zeros((H, W), bool)
    g2[30:40, 40:60] = True
    preds = [_one(g1)]
    targets = [{'masks': np.stack([g1, g2]),
                'labels': np.asarray([0, 0], np.int64)}]
    res = _compute(preds, targets)
    np.testing.assert_allclose(float(res['map']), 51.0 / 101.0, atol=1e-9)
    np.testing.assert_allclose(float(res['map_50']), 51.0 / 101.0, atol=1e-9)
    # and recall is exactly 0.5
    np.testing.assert_allclose(float(res['mar_100']), 0.5, atol=1e-9)


def test_iou_exact_boundary_counts_at_50():
    """A prediction with IoU exactly 0.50 must count as a match at the 0.50
    threshold (COCOeval compares iou >= t with t=0.5) and not at 0.55.
    Construct IoU 0.5 exactly: pred covers half the GT plus an equal area
    outside... intersection 200, union 400."""
    gt = np.zeros((H, W), bool)
    gt[10:20, 10:40] = True          # 10×30 = 300
    pr = np.zeros((H, W), bool)
    pr[10:20, 20:50] = True          # overlap cols 20..39 = 200; union 400
    res = _compute([_one(pr)], [{'masks': gt[None],
                                 'labels': np.asarray([0], np.int64)}])
    assert float(res['map_50']) == 1.0
    # map over 10 thresholds: only t=0.5 matches → 1/10
    np.testing.assert_allclose(float(res['map']), 0.1, atol=1e-9)


def test_equal_score_tie_grid_is_deterministic_and_sane():
    """All predictions share one score (adversarial tie grid): compute()
    must be deterministic across repeated evaluations and bounded by the
    perfect-prediction ceiling."""
    rng = np.random.default_rng(12)
    gt_masks = np.stack([_blob(rng) for _ in range(3)])
    preds = [{
        'masks': gt_masks.copy(),
        'scores': np.asarray([0.5, 0.5, 0.5], np.float32),
        'labels': np.asarray([0, 0, 0], np.int64),
    }]
    targets = [{'masks': gt_masks, 'labels': np.asarray([0, 0, 0], np.int64)}]
    a = _compute(preds, targets)
    b = _compute(preds, targets)
    _assert_same(a, b)
    assert float(a['map']) == 1.0  # exact copies must still all match
