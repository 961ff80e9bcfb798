"""Resize primitives with exact framework-parity semantics.

Three families are needed to reproduce the reference pipeline
(SURVEY.md X8/X9):

- PIL-style resizes (host, numpy): what the HF slow image processor uses for
  pre-processing (``transformers/image_transforms.py`` resize → PIL).
- torch ``F.interpolate`` style resizes (device, jnp): bilinear with
  ``align_corners=False`` (used for the 384×384 logit upsample,
  HF:image_processing_mask2former.py:1122-1124) and *legacy* nearest
  (``mode='nearest'``: src = floor(dst * in/out), HF:1156-1160).

The jnp versions are pure gathers — XLA fuses them; they run on TPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from PIL import Image


# ---------------------------------------------------------------------------
# Host (numpy + PIL) — parity with HF slow processor
# ---------------------------------------------------------------------------

def pil_resize_image(image: np.ndarray, size_hw: tuple[int, int]) -> np.ndarray:
    """Bilinear-resize an HWC uint8 image exactly like PIL (antialiased)."""
    h, w = size_hw
    pil = Image.fromarray(image)
    return np.asarray(pil.resize((w, h), resample=Image.BILINEAR))


def pil_resize_mask(mask: np.ndarray, size_hw: tuple[int, int]) -> np.ndarray:
    """Nearest-resize a 2D integer map exactly like PIL (mode I/L)."""
    h, w = size_hw
    dtype = mask.dtype
    pil = Image.fromarray(mask.astype(np.int32), mode='I')
    return np.asarray(pil.resize((w, h), resample=Image.NEAREST)).astype(dtype)


# ---------------------------------------------------------------------------
# Device (jnp) — parity with torch F.interpolate
# ---------------------------------------------------------------------------

def _bilinear_weights(in_size: int, out_size: int):
    """Source indices/weights for align_corners=False half-pixel sampling."""
    scale = in_size / out_size
    coords = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    coords = np.clip(coords, 0.0, None)  # torch clamps negative coords to 0
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = (coords - lo).astype(np.float32)
    lo = np.minimum(lo, in_size - 1)
    return lo, hi, frac


def bilinear_resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out, in) f32 matrix reproducing the 2-tap gather-form bilinear
    (same indices/weights as :func:`interpolate_bilinear`), for resizing on
    the MXU as ``Wy @ x @ Wx^T``. Weights are accumulated in float64 so the
    degenerate lo==hi edge taps sum to exactly 1.0. The matmul form is not
    bit-identical to the gather form (MXU accumulation order; measured
    ≤2e-6 abs on logit-scale inputs) — see the deviation ledger."""
    lo, hi, frac = _bilinear_weights(in_size, out_size)
    w = np.zeros((out_size, in_size), np.float64)
    rows = np.arange(out_size)
    w[rows, lo] += 1.0 - frac.astype(np.float64)
    w[rows, hi] += frac.astype(np.float64)
    return w.astype(np.float32)


def interpolate_bilinear_mm(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch-parity bilinear resize (last two axes) as two separable
    matmuls. On TPU the dense 2-taps-per-row matrices land on the MXU and
    beat the 4-gather form ~2× at post-process shapes (200²→384²:
    11.6 → 5.7 ms/b4-batch, tools/profile_postprocess.py) despite doing
    ~100× the FLOPs. ``precision=HIGHEST`` keeps f32-grade accumulation."""
    import jax

    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    wy = jnp.asarray(bilinear_resize_matrix(h_in, h_out))
    wx = jnp.asarray(bilinear_resize_matrix(w_in, w_out))
    return jnp.einsum('oh,...hw,pw->...op', wy, x, wx,
                      precision=jax.lax.Precision.HIGHEST)


def interpolate_bilinear(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch ``F.interpolate(mode='bilinear', align_corners=False)`` on the
    last two axes of ``x`` (any leading batch/channel dims)."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    ylo, yhi, yf = _bilinear_weights(h_in, h_out)
    xlo, xhi, xf = _bilinear_weights(w_in, w_out)
    yf = jnp.asarray(yf)[:, None]
    xf = jnp.asarray(xf)[None, :]
    top = x[..., ylo, :]
    bot = x[..., yhi, :]
    rows = top * (1.0 - yf) + bot * yf
    left = rows[..., xlo]
    right = rows[..., xhi]
    return left * (1.0 - xf) + right * xf


def interpolate_nearest(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """torch legacy ``F.interpolate(mode='nearest')``: src = floor(dst*in/out)."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    ys = np.floor(np.arange(h_out) * (h_in / h_out)).astype(np.int64)
    xs = np.floor(np.arange(w_out) * (w_in / w_out)).astype(np.int64)
    ys = np.minimum(ys, h_in - 1)
    xs = np.minimum(xs, w_in - 1)
    return x[..., ys, :][..., xs]


def interpolate_bilinear_np(x: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Numpy twin of :func:`interpolate_bilinear` (host-side parity path)."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    ylo, yhi, yf = _bilinear_weights(h_in, h_out)
    xlo, xhi, xf = _bilinear_weights(w_in, w_out)
    yf = yf[:, None]
    xf = xf[None, :]
    x = x.astype(np.float32)
    rows = x[..., ylo, :] * (1.0 - yf) + x[..., yhi, :] * yf
    return rows[..., xlo] * (1.0 - xf) + rows[..., xhi] * xf


def interpolate_nearest_np(x: np.ndarray, out_hw: tuple[int, int]) -> np.ndarray:
    """Numpy twin of :func:`interpolate_nearest`."""
    h_in, w_in = x.shape[-2], x.shape[-1]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    ys = np.minimum(np.floor(np.arange(h_out) * (h_in / h_out)).astype(np.int64), h_in - 1)
    xs = np.minimum(np.floor(np.arange(w_out) * (w_in / w_out)).astype(np.int64), w_in - 1)
    return x[..., ys, :][..., xs]
