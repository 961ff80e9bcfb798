"""Host→device wire codec for training batches.

The tunneled v5e backend moves ~33 MB per b2 train batch (f32 pixels +
uint8 instance masks + f32 pixel_mask, `dataset_utils.pad_batch_static`),
and transfers serialize with step execution on the link — measured
~109 ms/step of non-overlapped input time on top of the 757 ms device
step (bench 2026-08-19, host duty 0.39). The payload is almost all
redundancy:

- ``mask_labels`` are binary → 1 bit/px, not 8 (``np.packbits``, 8×);
- ``pixel_mask`` is an axis-aligned all-ones rectangle per sample →
  two int32 extents, rebuilt on device from ``broadcasted_iota``
  comparisons (lossless; a non-rectangular mask falls back to packbits);
- ``pixel_values`` only need the compute dtype: under
  ``WISTPU_COMPUTE_DTYPE=bfloat16`` the model's first op casts to bf16
  anyway, so shipping bf16 halves the bytes without changing a single
  compute-path bit (f32 compute keeps f32 pixels).

Net: ~33 MB → ~9.3 MB per batch. Decoding is a handful of elementwise
uint8/int32 ops fused into the jitted step (`decode_batch`), microseconds
against the 757 ms step.

Encoded batches are self-describing: ``encode_batch`` renames packed keys
(``mask_labels_packed``, ``pixel_mask_hw`` / ``pixel_mask_packed``), and
``decode_batch`` restores the `pad_batch_static` layout, passing
untouched batches through unchanged — consumers can accept either form.

No counterpart in the reference (its DataLoader feeds a local CUDA
device, reference models/mask2former/train.py:147-164); this is
TPU-host-link engineering.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def encode_batch(batch: dict, pixels_dtype=None) -> dict:
    """Pack a `pad_batch_static` host batch (numpy) for the wire.

    ``pixels_dtype``: optional dtype for pixel_values (use the compute
    dtype; None keeps the stored dtype). Packing pads W up to a multiple
    of 8 bits; ``decode_batch`` crops back via the recorded true width.
    """
    out = dict(batch)

    masks = np.asarray(batch['mask_labels'])
    # width is recovered on device from pixel_values.shape[-1] (static at
    # trace time) — pad_batch_static pads masks and pixels to the same H, W
    assert masks.shape[-1] == np.asarray(batch['pixel_values']).shape[-1]
    out['mask_labels_packed'] = np.packbits(masks != 0, axis=-1)
    del out['mask_labels']

    pm = np.asarray(batch['pixel_mask'])
    rows = pm.any(axis=2)  # (B, H)
    cols = pm.any(axis=1)  # (B, W)
    h = rows.sum(axis=1).astype(np.int32)  # (B,)
    w = cols.sum(axis=1).astype(np.int32)
    # decode_batch rebuilds a TOP-LEFT-anchored rectangle, so take the
    # extents path only when the mask provably is one (ADVICE r3): the
    # integer popcount must equal h·w (f32 accumulation could round at
    # ≥2^24 px) AND the occupied rows/cols must be the contiguous prefix
    # (a relocated or row×col-product mask would otherwise be silently
    # moved to the corner).
    anchored = (
        ((pm != 0).sum(axis=(1, 2), dtype=np.int64) == h.astype(np.int64) * w).all()
        and (rows == (np.arange(pm.shape[1]) < h[:, None])).all()
        and (cols == (np.arange(pm.shape[2]) < w[:, None])).all()
    )
    if anchored:
        # top-left all-ones rectangle (pad_batch_static's invariant):
        # two extents replace (B, H, W) f32
        out['pixel_mask_hw'] = np.stack([h, w], axis=1)  # (B, 2) int32
    else:  # arbitrary mask: still ship 1 bit/px
        out['pixel_mask_packed'] = np.packbits(pm != 0, axis=-1)
    del out['pixel_mask']

    if pixels_dtype is not None:
        out['pixel_values'] = np.asarray(batch['pixel_values']).astype(pixels_dtype)
    return out


def _unpackbits(packed: jnp.ndarray, width: int) -> jnp.ndarray:
    """np.packbits inverse on device (big-endian bit order), → uint8 0/1."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & jnp.uint8(1)  # (..., W/8, 8)
    return bits.reshape(*packed.shape[:-1], packed.shape[-1] * 8)[..., :width]


def decode_batch(batch: dict, float_dtype=jnp.float32) -> dict:
    """Restore the `pad_batch_static` layout inside the jitted step.

    Idempotent: a batch without packed keys passes through unchanged, so
    every consumer (train loss, eval loss, metrics forward) can call this
    unconditionally on both wire-encoded and plain batches.
    """
    if 'mask_labels_packed' not in batch and 'pixel_mask_hw' not in batch \
            and 'pixel_mask_packed' not in batch:
        return batch
    out = dict(batch)

    if 'mask_labels_packed' in out:
        packed = out.pop('mask_labels_packed')
        out['mask_labels'] = _unpackbits(packed, out['pixel_values'].shape[-1])

    if 'pixel_mask_hw' in out:
        hw = out.pop('pixel_mask_hw')  # (B, 2) int32
        # spatial extent = the mask_labels / pixel_values padded H, W
        ph, pw = out['pixel_values'].shape[-2:]
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, ph, 1), 1) < hw[:, 0, None, None]
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, pw), 2) < hw[:, 1, None, None]
        out['pixel_mask'] = (rows & cols).astype(float_dtype)
    elif 'pixel_mask_packed' in out:
        packed = out.pop('pixel_mask_packed')
        pw = out['pixel_values'].shape[-1]
        out['pixel_mask'] = _unpackbits(packed, pw).astype(float_dtype)

    return out
