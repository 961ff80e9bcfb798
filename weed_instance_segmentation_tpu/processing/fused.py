"""Fused on-device image preprocessing (SURVEY.md X8, TPU streaming path).

One jitted XLA program per (input size → output size) pair covering the
whole HF Mask2Former preprocess chain (image_processing_mask2former.py:
347-391 resize, 602-624 rescale+normalize, 809-899 pad+pixel_mask):

    uint8 HWC → PIL-style antialiased bilinear resize → ×1/255 →
    ImageNet normalize → bottom/right zero-pad to the static batch shape
    (+ pixel mask), NCHW out.

TPU-first: PIL's resize is a separable triangle filter — expressed here as
two dense matmuls (R_h · img · R_wᵀ) that run on the MXU, instead of the
reference's per-image host PIL call (datasets/*/dataset.py → processor).
The filter weights replicate PIL's float algorithm (support scaled by the
downscale ratio, weights normalized per output pixel); PIL's uint8
fixed-point rounding (22-bit coefficients) is approximated in f32, so
outputs match the host path within ±1/255 per channel — the bit-exact
PIL path (ops.resize.pil_resize_image) remains the offline-cache oracle.

Mask resize is PIL-NEAREST-exact (pure index arithmetic, validated
against PIL in tests).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.processing.image_processor import (
    IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD,
)


def pil_bilinear_weights(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) resampling matrix replicating PIL's BILINEAR
    (triangle filter, support widened by the downscale ratio, per-row
    normalization) — Pillow src/libImaging/Resample.c precompute_coeffs."""
    scale = in_size / out_size
    filterscale = max(scale, 1.0)
    support = 1.0 * filterscale  # triangle filter support = 1

    mat = np.zeros((out_size, in_size), np.float32)
    for x_out in range(out_size):
        center = (x_out + 0.5) * scale
        xmin = max(int(center - support + 0.5), 0)
        xmax = min(int(center + support + 0.5), in_size)
        span = np.arange(xmin, xmax)
        w = 1.0 - np.abs((span + 0.5 - center) / filterscale)
        w = np.clip(w, 0.0, None)
        s = w.sum()
        if s > 0:
            mat[x_out, xmin:xmax] = w / s
    return mat


def pil_nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """PIL NEAREST source index per output pixel — bit-exact emulation of
    Pillow's ImagingScaleAffine, which ACCUMULATES the coordinate in a C
    double (``xo = scale*0.5; xo += scale`` per pixel) rather than using the
    closed form; the closed form differs on ties (e.g. 128→96 at x=4)."""
    scale = in_size / out_size
    xo = scale * 0.5
    out = []
    for _ in range(out_size):
        out.append(int(xo))
        xo += scale
    return np.minimum(np.asarray(out, np.int64), in_size - 1)


@partial(jax.jit, static_argnames=('out_hw', 'pad_hw'))
def fused_preprocess(
    images: jnp.ndarray,
    out_hw: tuple[int, int],
    pad_hw: tuple[int, int],
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """uint8 (B, H, W, 3) → (pixel_values (B, 3, PH, PW) f32,
    pixel_mask (B, PH, PW) f32). Resize→rescale→normalize→pad in one
    compiled program; weights are trace-time constants."""
    b, h, w, _ = images.shape
    oh, ow = out_hw
    ph, pw = pad_hw
    rh = jnp.asarray(pil_bilinear_weights(h, oh))  # (OH, H)
    rw = jnp.asarray(pil_bilinear_weights(w, ow))  # (OW, W)

    x = images.astype(jnp.float32)
    # separable resize on the MXU: horizontal then vertical like PIL, one
    # float round at the end (PIL's 22-bit fixed-point with inter-pass uint8
    # rounding lands within ±1 LSB of this — see test_fused_preprocess)
    x = jnp.einsum('pw,bhwc->bhpc', rw, x)
    x = jnp.einsum('oh,bhpc->bopc', rh, x)
    x = jnp.clip(jnp.round(x), 0.0, 255.0)

    mean = jnp.asarray(IMAGENET_DEFAULT_MEAN, jnp.float32) * 255.0
    std = jnp.asarray(IMAGENET_DEFAULT_STD, jnp.float32) * 255.0
    x = (x - mean) / std

    x = jnp.pad(x, ((0, 0), (0, ph - oh), (0, pw - ow), (0, 0)))
    pixel_values = x.transpose(0, 3, 1, 2)
    pixel_mask = jnp.zeros((b, ph, pw), jnp.float32).at[:, :oh, :ow].set(1.0)
    return pixel_values, pixel_mask


@partial(jax.jit, static_argnames=('out_hw',))
def fused_resize_mask(mask: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """PIL-NEAREST-exact resize of integer maps (B, H, W) → (B, OH, OW)."""
    b, h, w = mask.shape
    oh, ow = out_hw
    ys = jnp.asarray(pil_nearest_indices(h, oh))
    xs = jnp.asarray(pil_nearest_indices(w, ow))
    return mask[:, ys][:, :, xs]


def preprocess_batch_on_device(
    images: list[np.ndarray],
    processor,
    pad_hw: tuple[int, int] | None = None,
):
    """Convenience: list of same-sized uint8 HWC images → device tensors
    using the processor's geometry (size/shortest-edge/divisor rules)."""
    first = images[0]
    out_hw = processor.output_size_for(first.shape[:2])
    if pad_hw is None:
        pad_hw = out_hw
    batch = jnp.asarray(np.stack(images))
    return fused_preprocess(batch, out_hw, pad_hw)
