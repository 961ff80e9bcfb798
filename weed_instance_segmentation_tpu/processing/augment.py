"""Device-side training augmentation (BASELINE.md config 4).

The reference trains without augmentation (its loop feeds cached processor
outputs straight to the model — models/mask2former/train.py:191-206), so
this pipeline is an extension, off by default (``WISTPU_AUGMENT``), and the
design is TPU-first rather than a port of any torchvision chain:

- every transform is pure jnp on the already-collated static-shape batch
  (datasets/dataset_utils.pad_batch_static layout), applied INSIDE the
  jitted train step — zero extra host work, zero extra host→HBM traffic,
  and XLA fuses the elementwise chain into the first conv's input;
- geometric transforms are one affine grid + the torch-parity
  ``grid_sample`` (ops/grid_sample.py) at fixed output shape, so random
  scale/translation never changes array shapes (no recompiles);
- the instance masks and the pixel-validity mask ride the SAME grid
  (nearest taps) so labels stay aligned with pixels by construction.

Transforms (each gated by its probability, drawn per sample):
  horizontal flip · scale jitter + random shift (zoom in/out, zeros pad)
  · brightness · contrast  (color ops run in raw-pixel space by
  de-normalizing with the ImageNet affine, so factors mean the same thing
  they would before normalization).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from weed_instance_segmentation_tpu.ops.grid_sample import grid_sample_bilinear
from weed_instance_segmentation_tpu.processing.image_processor import (
    IMAGENET_DEFAULT_MEAN, IMAGENET_DEFAULT_STD,
)


@dataclass(frozen=True)
class AugmentConfig:
    hflip_prob: float = 0.5
    scale_prob: float = 0.5
    scale_range: tuple[float, float] = (0.8, 1.25)  # <1 zoom out, >1 zoom in
    brightness: float = 0.2  # factor ~ U[1-b, 1+b]
    contrast: float = 0.2    # factor ~ U[1-c, 1+c]

    def any_enabled(self) -> bool:
        return (
            self.hflip_prob > 0 or self.scale_prob > 0
            or self.brightness > 0 or self.contrast > 0
        )


def _nearest_grid_sample(value: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """grid_sample with nearest taps + zeros padding (torch align_corners=
    False unnormalization). value (N, C, H, W), grid (N, Hg, Wg, 2)."""
    n, c, h, w = value.shape
    x = ((grid[..., 0] + 1.0) * w - 1.0) / 2.0
    y = ((grid[..., 1] + 1.0) * h - 1.0) / 2.0
    ix = jnp.round(x)
    iy = jnp.round(y)
    valid = (ix >= 0) & (ix <= w - 1) & (iy >= 0) & (iy <= h - 1)
    ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
    iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
    flat = value.reshape(n, c, h * w)
    idx = (iyc * w + ixc).reshape(n, 1, -1)
    out = jnp.take_along_axis(flat, idx, axis=2).reshape(n, c, *grid.shape[1:3])
    return out * valid[:, None].astype(value.dtype)


def _affine_grid(shape_hw: tuple[int, int], scale: jnp.ndarray,
                 shift: jnp.ndarray, flip: jnp.ndarray) -> jnp.ndarray:
    """Per-sample sampling grid (B, H, W, 2) in [-1, 1] source coords.

    ``scale`` (B,): output pixel at normalized coord u reads source u/scale
    (scale>1 → zoom in). ``shift`` (B, 2): translation of the crop window,
    in source-normalized units. ``flip`` (B,): 1.0 mirrors x.
    """
    h, w = shape_hw
    # pixel centers in [-1, 1], align_corners=False convention
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5) * (2.0 / h) - 1.0
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5) * (2.0 / w) - 1.0
    gy, gx = jnp.meshgrid(ys, xs, indexing='ij')  # (H, W)
    sign = 1.0 - 2.0 * flip  # (B,)
    sx = gx[None] * sign[:, None, None] / scale[:, None, None] + shift[:, 0, None, None]
    sy = gy[None] / scale[:, None, None] + shift[:, 1, None, None]
    return jnp.stack([sx, sy], axis=-1)


def augment_batch(batch: dict, rng: jax.Array, cfg: AugmentConfig | None = None) -> dict:
    """Return a new batch dict with augmented ``pixel_values``,
    ``mask_labels`` and ``pixel_mask`` (all other keys pass through).
    Jit-compatible; all randomness derives from ``rng``."""
    cfg = cfg or AugmentConfig()
    if not cfg.any_enabled():
        return batch
    pixel_values = batch['pixel_values']  # (B, 3, H, W)
    mask_labels = batch['mask_labels']    # (B, N, H, W)
    pixel_mask = batch['pixel_mask']      # (B, H, W)
    b, _, h, w = pixel_values.shape
    k_flip, k_scale_on, k_scale, k_shift, k_bright, k_contrast = jax.random.split(rng, 6)

    # ---- geometry: one grid shared by image / masks / pixel-validity ----
    flip = (jax.random.uniform(k_flip, (b,)) < cfg.hflip_prob).astype(jnp.float32)
    scale_on = jax.random.uniform(k_scale_on, (b,)) < cfg.scale_prob
    lo, hi = cfg.scale_range
    scale = jnp.where(
        scale_on, jax.random.uniform(k_scale, (b,), minval=lo, maxval=hi), 1.0
    )
    # keep the crop window inside the source where possible: with zoom
    # factor s the window half-extent is 1/s, so a shift up to (1 - 1/s)
    # stays in-bounds (zoom-in); zoom-out windows always overhang → no shift
    max_shift = jnp.maximum(1.0 - 1.0 / scale, 0.0)
    shift = jax.random.uniform(k_shift, (b, 2), minval=-1.0, maxval=1.0) * max_shift[:, None]
    grid = _affine_grid((h, w), scale, shift, flip)

    identity = (scale == 1.0) & (flip == 0.0)
    sampled = grid_sample_bilinear(pixel_values, grid)
    masks_and_valid = jnp.concatenate(
        [mask_labels, pixel_mask[:, None]], axis=1
    )
    sampled_mv = _nearest_grid_sample(masks_and_valid, grid)
    # skip the resample entirely for untouched samples (exact no-op)
    keep = identity[:, None, None, None]
    pixel_values = jnp.where(keep, pixel_values, sampled)
    masks_and_valid = jnp.where(keep, masks_and_valid, sampled_mv)
    mask_labels = masks_and_valid[:, :-1]
    pixel_mask = masks_and_valid[:, -1]

    # ---- color, in raw-pixel space (de-normalize → jitter → re-normalize) —
    # the whole chain is one fused elementwise affine per channel ----
    mean = jnp.asarray(IMAGENET_DEFAULT_MEAN, pixel_values.dtype).reshape(1, 3, 1, 1)
    std = jnp.asarray(IMAGENET_DEFAULT_STD, pixel_values.dtype).reshape(1, 3, 1, 1)
    raw = pixel_values * std + mean
    if cfg.brightness > 0:
        fb = jax.random.uniform(
            k_bright, (b, 1, 1, 1), minval=1.0 - cfg.brightness, maxval=1.0 + cfg.brightness
        )
        raw = raw * fb
    if cfg.contrast > 0:
        fc = jax.random.uniform(
            k_contrast, (b, 1, 1, 1), minval=1.0 - cfg.contrast, maxval=1.0 + cfg.contrast
        )
        # blend toward the per-image mean luminance of REAL pixels only
        # (padding is zeros; including it would darken the pivot)
        npix = jnp.maximum(pixel_mask.sum(axis=(1, 2)), 1.0).reshape(b, 1, 1, 1)
        gray = (raw * pixel_mask[:, None]).sum(axis=(2, 3), keepdims=True).mean(
            axis=1, keepdims=True
        ) / npix
        raw = gray + fc * (raw - gray)
    raw = jnp.clip(raw, 0.0, 1.0)
    pixel_values = (raw - mean) / std
    # re-zero padding so augmented batches keep the collator's invariant
    pixel_values = pixel_values * pixel_mask[:, None]

    out = dict(batch)
    out['pixel_values'] = pixel_values.astype(batch['pixel_values'].dtype)
    out['mask_labels'] = mask_labels
    out['pixel_mask'] = pixel_mask
    if 'instance_valid' in batch:
        # an instance cropped fully out of frame must not reach the matcher
        # as an empty-mask target
        survives = (mask_labels.sum(axis=(2, 3)) > 0).astype(batch['instance_valid'].dtype)
        out['instance_valid'] = batch['instance_valid'] * survives
    return out


def from_env() -> AugmentConfig | None:
    """WISTPU_AUGMENT=1 → default recipe; 0/unset → None (reference parity).
    Individual knobs: WISTPU_AUG_HFLIP, WISTPU_AUG_SCALE_PROB,
    WISTPU_AUG_SCALE_LO/HI, WISTPU_AUG_BRIGHTNESS, WISTPU_AUG_CONTRAST."""
    import os

    if os.environ.get('WISTPU_AUGMENT', '0') != '1':
        return None
    d = AugmentConfig()
    return AugmentConfig(
        hflip_prob=float(os.environ.get('WISTPU_AUG_HFLIP', d.hflip_prob)),
        scale_prob=float(os.environ.get('WISTPU_AUG_SCALE_PROB', d.scale_prob)),
        scale_range=(
            float(os.environ.get('WISTPU_AUG_SCALE_LO', d.scale_range[0])),
            float(os.environ.get('WISTPU_AUG_SCALE_HI', d.scale_range[1])),
        ),
        brightness=float(os.environ.get('WISTPU_AUG_BRIGHTNESS', d.brightness)),
        contrast=float(os.environ.get('WISTPU_AUG_CONTRAST', d.contrast)),
    )
