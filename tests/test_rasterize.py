"""Raster ops vs OpenCV (the reference's implementation of the same ops)."""

import numpy as np
import pytest

from weed_instance_segmentation_tpu.ops import rasterize

cv2 = pytest.importorskip('cv2')


def test_native_builds():
    assert rasterize.native_available()


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_connected_components_matches_cv2(seed):
    rng = np.random.default_rng(seed)
    mask = (rng.random((97, 133)) > 0.7).astype(np.uint8)
    n_cv, lab_cv = cv2.connectedComponents(mask)
    n_us, lab_us = rasterize.connected_components(mask)
    assert n_us == n_cv
    # Components must be identical as sets; labels may permute.
    for k in range(1, n_us):
        sel = lab_us == k
        vals = np.unique(lab_cv[sel])
        assert len(vals) == 1 and vals[0] != 0
        assert np.array_equal(sel, lab_cv == vals[0])


def test_connected_components_empty():
    n, lab = rasterize.connected_components(np.zeros((10, 10), dtype=np.uint8))
    assert n == 1 and not lab.any()


@pytest.mark.parametrize('seed', [0, 1, 2, 3, 4])
def test_fill_poly_close_to_cv2(seed):
    rng = np.random.default_rng(seed)
    h, w = 200, 300
    n = rng.integers(3, 9)
    # Star-convex polygon around a random center (realistic leaf-ish shapes).
    cx, cy = rng.integers(60, w - 60), rng.integers(60, h - 60)
    angles = np.sort(rng.uniform(0, 2 * np.pi, n))
    radii = rng.uniform(20, 55, n)
    pts = np.stack(
        [cx + radii * np.cos(angles), cy + radii * np.sin(angles)], axis=1
    ).astype(np.int32)

    ours = np.zeros((h, w), dtype=np.int32)
    rasterize.fill_poly(ours, pts, 7)

    theirs = np.zeros((h, w), dtype=np.int32)
    cv2.fillPoly(theirs, [pts], color=7)

    a, b = ours == 7, theirs == 7
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    assert union > 0
    assert inter / union > 0.97, f'IoU {inter / union:.4f}'


def test_fill_poly_rectangle_exact():
    pts = np.array([[10, 5], [40, 5], [40, 25], [10, 25]], dtype=np.int32)
    ours = np.zeros((50, 60), dtype=np.int32)
    rasterize.fill_poly(ours, pts, 1)
    theirs = np.zeros((50, 60), dtype=np.int32)
    cv2.fillPoly(theirs, [pts], color=1)
    np.testing.assert_array_equal(ours, theirs)


def test_color_match():
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 4, size=(20, 30, 3), dtype=np.uint8) * 85
    got = rasterize.color_match(rgb, (255, 0, 0))
    want = np.all(rgb == np.array([255, 0, 0]), axis=-1).astype(np.uint8)
    np.testing.assert_array_equal(got, want)
