"""Host raster ops: connected components + polygon fill.

Primary implementation is the C++ extension in ``native/rasterops.cpp``
(ctypes-bound, lazily compiled with g++). Pure-Python fallbacks (scipy /
PIL) keep the framework importable without a toolchain.

These replace OpenCV's role in the reference loaders
(cv2.connectedComponents — datasets/pheno_bench/dataset.py:104;
cv2.fillPoly — datasets/sorghum_weed/dataset.py:83).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import warnings

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'native')
_SRC = os.path.join(_NATIVE_DIR, 'rasterops.cpp')
_SO = os.path.join(_NATIVE_DIR, 'librasterops.so')

_lib = None
_lib_tried = False


def _load_native():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ['g++', '-O3', '-shared', '-fPIC', '-std=c++17', '-o', _SO, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        lib.wistpu_connected_components.restype = ctypes.c_int32
        lib.wistpu_connected_components.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.wistpu_fill_poly.restype = None
        lib.wistpu_fill_poly.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
        ]
        lib.wistpu_color_match.restype = None
        lib.wistpu_color_match.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_uint8, ctypes.c_uint8, ctypes.c_uint8,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain-dependent
        warnings.warn(f'rasterops C++ extension unavailable ({e}); using Python fallback')
        _lib = None
    return _lib


def native_available() -> bool:
    return _load_native() is not None


def connected_components(mask: np.ndarray) -> tuple[int, np.ndarray]:
    """8-connectivity CCL of a binary mask.

    Returns ``(num_labels, labels)`` with the cv2.connectedComponents
    convention: background = 0, components 1..N, ``num_labels = N + 1``.
    """
    mask = np.ascontiguousarray(mask.astype(np.uint8))
    h, w = mask.shape
    lib = _load_native()
    if lib is not None:
        labels = np.zeros((h, w), dtype=np.int32)
        num = lib.wistpu_connected_components(
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return int(num), labels
    # Fallback: scipy.ndimage with full (8-conn) structuring element, then
    # relabel in row-major first-occurrence order to match the C++/cv2
    # convention.
    from scipy import ndimage

    raw, n = ndimage.label(mask, structure=np.ones((3, 3), dtype=np.int32))
    if n == 0:
        return 1, raw.astype(np.int32)
    flat = raw.ravel()
    nz = flat[flat != 0]
    first = {}
    order = []
    for v in nz:
        if v not in first:
            first[v] = len(order) + 1
            order.append(v)
        if len(order) == n:
            break
    remap = np.zeros(n + 1, dtype=np.int32)
    for old, new in first.items():
        remap[old] = new
    return n + 1, remap[raw]


def fill_poly(canvas: np.ndarray, points: np.ndarray, value: int) -> np.ndarray:
    """Fill a polygon (``points``: (N,2) int32 (x,y)) into ``canvas`` in place."""
    assert canvas.dtype == np.int32 and canvas.flags['C_CONTIGUOUS']
    points = np.ascontiguousarray(points.astype(np.int32))
    h, w = canvas.shape
    lib = _load_native()
    if lib is not None:
        lib.wistpu_fill_poly(
            canvas.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), h, w,
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(points), int(value),
        )
        return canvas
    from PIL import Image, ImageDraw  # pragma: no cover - fallback

    img = Image.new('I', (w, h), 0)
    ImageDraw.Draw(img).polygon([tuple(p) for p in points.tolist()], fill=1, outline=1)
    sel = np.asarray(img) != 0
    canvas[sel] = value
    return canvas


def color_match(rgb: np.ndarray, color) -> np.ndarray:
    """Exact per-pixel RGB equality mask (uint8 result)."""
    rgb = np.ascontiguousarray(rgb.astype(np.uint8))
    h, w = rgb.shape[:2]
    lib = _load_native()
    if lib is not None:
        out = np.zeros((h, w), dtype=np.uint8)
        lib.wistpu_color_match(
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
            int(color[0]), int(color[1]), int(color[2]),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        )
        return out
    return np.all(rgb == np.asarray(color, dtype=np.uint8), axis=-1).astype(np.uint8)
