"""COCO-mAP correctness on analytic cases (torchmetrics/pycocotools are not
installed in this environment — SURVEY.md §0.2 — so the oracle is the COCO
protocol computed by hand on tiny cases)."""

import numpy as np

from weed_instance_segmentation_tpu.evaluation.mean_ap import (
    MeanAveragePrecision, mask_iou_matrix,
)


def _box_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), bool)
    m[y0:y1, x0:x1] = True
    return m


def test_iou_matrix():
    a = _box_mask(10, 10, 0, 5, 0, 10)  # 50 px
    b = _box_mask(10, 10, 0, 10, 0, 10)  # 100 px
    c = _box_mask(10, 10, 5, 10, 0, 10)  # 50 px, disjoint from a
    iou, pa, ga = mask_iou_matrix(np.stack([a, c]), np.stack([b]))
    np.testing.assert_allclose(iou, [[0.5], [0.5]])
    np.testing.assert_allclose(pa, [50, 50])
    np.testing.assert_allclose(ga, [100])


def test_perfect_prediction_gives_map_1():
    gt = _box_mask(50, 50, 10, 40, 10, 40)
    metric = MeanAveragePrecision(iou_type='segm')
    metric.update(
        [{'masks': gt[None], 'scores': np.array([0.9]), 'labels': np.array([1])}],
        [{'masks': gt[None], 'labels': np.array([1])}],
    )
    out = metric.compute()
    assert float(out['map']) == 1.0
    assert float(out['map_50']) == 1.0
    assert float(out['map_75']) == 1.0
    assert float(out['mar_100']) == 1.0
    assert out['classes'].tolist() == [1]


def test_no_predictions():
    gt = _box_mask(20, 20, 0, 10, 0, 10)
    metric = MeanAveragePrecision()
    metric.update(
        [{'masks': np.zeros((0, 20, 20), bool), 'scores': np.zeros(0), 'labels': np.zeros(0, int)}],
        [{'masks': gt[None], 'labels': np.array([0])}],
    )
    out = metric.compute()
    assert float(out['map']) == 0.0
    assert float(out['mar_100']) == 0.0


def test_half_iou_prediction():
    """Prediction overlapping GT with IoU=0.5: TP at t=0.50 only
    (COCO uses IoU ≥ t with t=0.5 exactly → matched), FP at 0.55..0.95.
    AP_50 = 1, AP_75 = 0, map = 1/10."""
    h = w = 40
    gt = _box_mask(h, w, 0, 20, 0, 40)
    pred = _box_mask(h, w, 10, 30, 0, 40)  # inter 10*40=400, union 1200 → 1/3
    # use a shifted pred with exactly IoU 0.5: inter 20x20? build analytic:
    gt = _box_mask(h, w, 0, 20, 0, 20)  # 400 px
    pred = _box_mask(h, w, 0, 20, 0, 40)  # 800 px, inter 400, union 800 → 0.5
    metric = MeanAveragePrecision()
    metric.update(
        [{'masks': pred[None], 'scores': np.array([0.8]), 'labels': np.array([2])}],
        [{'masks': gt[None], 'labels': np.array([2])}],
    )
    out = metric.compute()
    assert float(out['map_50']) == 1.0
    assert float(out['map_75']) == 0.0
    np.testing.assert_allclose(float(out['map']), 0.1)


def test_ranking_and_interpolation():
    """Two GTs, three preds (one FP in the middle of the ranking).
    At any t ≤ 0.95: TP(0.9), FP(0.8), TP(0.7) → PR points:
    r=0.5 p=1.0; r=1.0 p=2/3. 101-pt AP = (51·1.0 + 50·(2/3))/101."""
    h = w = 32
    g1 = _box_mask(h, w, 0, 16, 0, 16)
    g2 = _box_mask(h, w, 16, 32, 16, 32)
    fp = _box_mask(h, w, 0, 8, 16, 32)
    metric = MeanAveragePrecision()
    metric.update(
        [{
            'masks': np.stack([g1, fp, g2]),
            'scores': np.array([0.9, 0.8, 0.7]),
            'labels': np.array([1, 1, 1]),
        }],
        [{'masks': np.stack([g1, g2]), 'labels': np.array([1, 1])}],
    )
    out = metric.compute()
    expected = (51 * 1.0 + 50 * (2.0 / 3.0)) / 101
    np.testing.assert_allclose(float(out['map']), expected, rtol=1e-6)
    np.testing.assert_allclose(float(out['map_50']), expected, rtol=1e-6)
    # mar_1: only the top-1 detection counts → recall 0.5
    np.testing.assert_allclose(float(out['mar_1']), 0.5)
    np.testing.assert_allclose(float(out['mar_100']), 1.0)


def test_greedy_matching_prefers_higher_iou():
    """One pred overlapping two GTs: must match the higher-IoU one."""
    h = w = 24
    g1 = _box_mask(h, w, 0, 12, 0, 24)
    g2 = _box_mask(h, w, 8, 24, 0, 24)
    pred = _box_mask(h, w, 6, 24, 0, 24)  # IoU(g1)≈0.25, IoU(g2) higher
    metric = MeanAveragePrecision()
    metric.update(
        [{'masks': pred[None], 'scores': np.array([0.9]), 'labels': np.array([0])}],
        [{'masks': np.stack([g1, g2]), 'labels': np.array([0, 0])}],
    )
    out = metric.compute()
    # matched g2 at t=0.5..0.85 (IoU(g2)=16/18≈0.889): recall=0.5 there
    assert float(out['mar_100']) > 0.0
    assert float(out['map_50']) > 0.0


def test_area_buckets():
    """Small GT (<32²) populates map_small; large GT (>96²) map_large."""
    h = w = 128
    small = _box_mask(h, w, 0, 10, 0, 10)  # 100 px
    large = _box_mask(h, w, 0, 100, 0, 100)  # 10000 px
    metric = MeanAveragePrecision()
    metric.update(
        [{
            'masks': np.stack([small, large]),
            'scores': np.array([0.9, 0.9]),
            'labels': np.array([0, 1]),
        }],
        [{'masks': np.stack([small, large]), 'labels': np.array([0, 1])}],
    )
    out = metric.compute()
    assert float(out['map_small']) == 1.0
    assert float(out['map_large']) == 1.0
    assert float(out['map_medium']) == -1.0  # no medium GT anywhere
    assert float(out['map']) == 1.0


def test_multi_class_and_per_class():
    h = w = 32
    g = _box_mask(h, w, 0, 16, 0, 16)
    metric = MeanAveragePrecision(class_metrics=True)
    metric.update(
        [{
            'masks': np.stack([g, g]),
            'scores': np.array([0.9, 0.9]),
            'labels': np.array([0, 1]),
        }],
        [{'masks': np.stack([g, g]), 'labels': np.array([0, 1])}],
    )
    out = metric.compute()
    # class 0: perfect; class 1: perfect (same mask) → map = 1
    np.testing.assert_allclose(float(out['map']), 1.0)
    np.testing.assert_allclose(out['map_per_class'], [1.0, 1.0])
    assert out['classes'].tolist() == [0, 1]


def test_reset_and_accumulation():
    h = w = 16
    g = _box_mask(h, w, 0, 8, 0, 8)
    metric = MeanAveragePrecision()
    for _ in range(3):  # accumulate over 3 images
        metric.update(
            [{'masks': g[None], 'scores': np.array([0.9]), 'labels': np.array([0])}],
            [{'masks': g[None], 'labels': np.array([0])}],
        )
    out = metric.compute()
    assert float(out['map']) == 1.0
    metric.reset()
    assert metric._entries == []


def test_prepare_for_json_compat():
    """Values must be .item()-able / .tolist()-able like torchmetrics
    tensors (reference metrics.py:110-122 serializes them this way)."""
    h = w = 16
    g = _box_mask(h, w, 0, 8, 0, 8)
    metric = MeanAveragePrecision()
    metric.update(
        [{'masks': g[None], 'scores': np.array([0.9]), 'labels': np.array([0])}],
        [{'masks': g[None], 'labels': np.array([0])}],
    )
    out = metric.compute()
    for key, value in out.items():
        if value.ndim == 0:
            assert isinstance(value.item(), float)
        else:
            assert isinstance(value.tolist(), list)


# ---------------------------------------------------------------------------
# Oracle cross-validation (VERDICT r1 missing #3): pycocotools/torchmetrics
# are not installed here, so tests/cocoeval_oracle.py is a literal
# per-detection transcription of COCOeval's evaluateImg/accumulate. The
# vectorized production implementation must reproduce its FULL key set on
# randomized multi-image / multi-class / area-bucket cases.
# ---------------------------------------------------------------------------

def _random_case(rng, n_images, n_classes, hw=160, max_gt=8, max_dt=12,
                 score_quant=None):
    """Random rectangles spanning the small/medium/large area buckets, with
    optional score quantization to force cross-image score ties."""
    preds, targets = [], []
    for _ in range(n_images):
        def rand_rects(n):
            masks = np.zeros((n, hw, hw), bool)
            labels = rng.integers(0, n_classes, n)
            for i in range(n):
                # side from ~4px (small) to ~120px (large)
                side_h = int(rng.integers(3, 121))
                side_w = int(rng.integers(3, 121))
                y = int(rng.integers(0, hw - side_h))
                x = int(rng.integers(0, hw - side_w))
                masks[i, y:y + side_h, x:x + side_w] = True
            return masks, labels

        n_gt = int(rng.integers(0, max_gt + 1))
        n_dt = int(rng.integers(0, max_dt + 1))
        g_masks, g_labels = rand_rects(n_gt)
        d_masks, d_labels = rand_rects(n_dt)
        # half the detections are jittered copies of GTs → realistic TP mix
        for i in range(min(n_dt, n_gt) // 2):
            d_masks[i] = np.roll(g_masks[i], int(rng.integers(0, 6)), axis=0)
            d_labels[i] = g_labels[i]
        scores = rng.random(n_dt)
        if score_quant:
            scores = np.round(scores * score_quant) / score_quant
        preds.append({'masks': d_masks, 'scores': scores.astype(np.float32),
                      'labels': d_labels.astype(np.int64)})
        targets.append({'masks': g_masks, 'labels': g_labels.astype(np.int64)})
    return preds, targets


def _assert_matches_oracle(preds, targets, class_metrics=False):
    from cocoeval_oracle import coco_map_oracle

    metric = MeanAveragePrecision(iou_type='segm', class_metrics=class_metrics)
    metric.update(preds, targets)
    got = metric.compute()
    want = coco_map_oracle(preds, targets, class_metrics=class_metrics)
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_allclose(
            np.asarray(got[key], np.float64), np.asarray(want[key], np.float64),
            atol=1e-9, err_msg=key,
        )


def test_oracle_randomized_sweep():
    """≥20 randomized cases across image counts, class counts, score ties,
    empty preds/GTs, and all three area buckets."""
    rng = np.random.default_rng(1234)
    for case in range(20):
        n_images = int(rng.integers(1, 6))
        n_classes = int(rng.integers(1, 4))
        quant = 8 if case % 3 == 0 else None  # score ties every third case
        preds, targets = _random_case(rng, n_images, n_classes,
                                      score_quant=quant)
        _assert_matches_oracle(preds, targets, class_metrics=(case % 4 == 0))


def test_oracle_max_det_truncation():
    """>100 detections in one image exercises maxDet truncation order."""
    rng = np.random.default_rng(7)
    preds, targets = _random_case(rng, 1, 2, max_gt=6, max_dt=0)
    n_dt = 130
    masks = np.zeros((n_dt, 160, 160), bool)
    for i in range(n_dt):
        y, x = int(rng.integers(0, 120)), int(rng.integers(0, 120))
        masks[i, y:y + 30, x:x + 30] = True
    preds[0] = {
        'masks': masks,
        'scores': rng.random(n_dt).astype(np.float32),
        'labels': rng.integers(0, 2, n_dt).astype(np.int64),
    }
    _assert_matches_oracle(preds, targets)


def test_oracle_area_dependent_matching():
    """A detection overlapping both a small in-range GT (lower IoU) and a
    large out-of-range GT (higher IoU) must match the in-range GT in the
    'small' bucket — the ignore-aware ordering COCOeval mandates."""
    hw = 160
    small_gt = np.zeros((hw, hw), bool)
    small_gt[10:30, 10:30] = True  # 400 px < 32² → 'small'
    large_gt = np.zeros((hw, hw), bool)
    large_gt[0:100, 0:100] = True  # 10000 px > 96² → ignored in 'small'
    det = np.zeros((hw, hw), bool)
    det[5:95, 5:95] = True  # IoU vs large ≈ 0.76, vs small ≈ 0.05

    targets = [{'masks': np.stack([small_gt, large_gt]),
                'labels': np.asarray([0, 0], np.int64)}]
    preds = [{'masks': det[None], 'scores': np.asarray([0.9], np.float32),
              'labels': np.asarray([0], np.int64)}]
    _assert_matches_oracle(preds, targets)

    # and with a det that DOES clear the small GT's IoU threshold
    det2 = np.zeros((hw, hw), bool)
    det2[10:32, 10:32] = True  # IoU vs small ≈ 0.83
    preds2 = [{'masks': np.stack([det, det2]),
               'scores': np.asarray([0.9, 0.8], np.float32),
               'labels': np.asarray([0, 0], np.int64)}]
    _assert_matches_oracle(preds2, targets)


def test_oracle_iou_tie_resolution():
    """Two identical GTs (exact IoU tie) → the later GT wins, per COCOeval
    scan order; both implementations must agree."""
    hw = 64
    gt = np.zeros((hw, hw), bool)
    gt[8:40, 8:40] = True
    det = np.zeros((hw, hw), bool)
    det[8:40, 8:36] = True
    targets = [{'masks': np.stack([gt, gt.copy()]),
                'labels': np.asarray([0, 0], np.int64)}]
    preds = [{'masks': np.stack([det, det.copy()]),
              'scores': np.asarray([0.9, 0.7], np.float32),
              'labels': np.asarray([0, 0], np.int64)}]
    _assert_matches_oracle(preds, targets)
