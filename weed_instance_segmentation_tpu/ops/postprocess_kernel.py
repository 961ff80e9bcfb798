"""Fused Pallas TPU kernel for the post-process mask-logit statistics.

The HF instance post-process (HF:image_processing_mask2former.py:1122-1177)
upsamples every query's mask logits to the fixed 384² scoring resolution
and then reduces them three ways: the sigmoid-score mean over positive
pixels, per-query coverage, and the per-pixel last-covering-slot id map.
The XLA formulation (processing/postprocess.py) materializes the
(B, Q, 384, 384) f32 upsampled tensor in HBM — 472 MB at the bench shape —
plus a (B, Q, 384, Wm) matmul intermediate, and pays several read passes
over them (measured ~9.8 ms device per b4 batch after the D13 matmul
upsample, tools/records/profile_postprocess.json).

This kernel computes, in ONE pass per (batch, query-tile) grid step with
everything resident in VMEM:

- ``sig_sum[b, q]`` — Σ sigmoid(up) over pixels where up > 0
- ``pos_cnt[b, q]`` — #pixels where up > 0
- ``bin_i8[b, q, 384, 384]`` — the binarized mask, int8 (4× smaller than
  the f32 tensor XLA materializes; the only large HBM write)

The separable-bilinear upsample runs as two MXU ``dot_general``s at
``precision=HIGHEST`` with the same (out, in) tap matrices as the D13
matmul path (ops/resize.py::bilinear_resize_matrix), so binarization and
scores agree with that path up to f32 summation order. The keep/top-k
bookkeeping and the last-covering-slot max stay in XLA, reading the int8
bins instead of f32 logits.

HBM traffic per b4 batch: read 128 MB logits + write 118 MB bins
(vs ~1.2 GB+ for the unfused form). VMEM per grid step at Q_TILE=8,
Hm=Wm=200: ~13 MB (msk tile ×2 buffers 2.6 + rows 2.5 + up 4.7 + bin out
×2 2.4 + tap matrices 0.6) — inside the ~16 MB budget; Q_TILE drops to 4
via ``q_tile`` if a config ever overflows.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from weed_instance_segmentation_tpu.ops.resize import bilinear_resize_matrix


def _kernel(msk_ref, wy_ref, wx_ref, sig_ref, cnt_ref, bin_ref):
    # sig/cnt get one (1, 1, 8, 128) block PER grid step, addressed by the
    # BlockSpec index_map — in-kernel store indices are fully static.
    # Mosaic rejects dynamic vector stores unless every index is provably
    # tile-aligned: a ds(tile*qt, qt) lane store fails ("cannot statically
    # prove that index in dimension 1 is a multiple of 128") and even with
    # 128-aligned lanes the dynamic sublane index program_id(0) fails
    # ("dynamic store with unaligned indices") — both found on chip,
    # round 5. Per-step output blocks route the offsets through the grid
    # machinery instead. The qt per-query scalars are padded to a full
    # (8, 128) register tile; the wrapper slices [..., 0, :qt] afterwards.
    qt = bin_ref.shape[1]
    wy = wy_ref[:]    # (SH, Hm) f32
    wx = wx_ref[:]    # (SW, Wm) f32
    # Per-query 2D matmuls: Mosaic's MXU lowering wants rank-2 dots (the
    # rank-3 dot_general form SIGABRTs the compiler); QT is static so this
    # python loop unrolls at trace time.
    sig_parts, cnt_parts = [], []
    for qi in range(qt):
        msk_q = msk_ref[0, qi]  # (Hm, Wm)
        rows_q = jax.lax.dot_general(
            wy, msk_q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (SH, Wm)
        up_q = jax.lax.dot_general(
            rows_q, wx, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (SH, SW)
        pos_q = up_q > 0
        sig_parts.append(jnp.sum(jnp.where(pos_q, jax.nn.sigmoid(up_q), 0.0)))
        cnt_parts.append(jnp.sum(pos_q.astype(jnp.float32)))
        bin_ref[0, qi] = pos_q.astype(jnp.int8)
    pad = jnp.zeros((128 - qt,), jnp.float32)
    sig_row = jnp.concatenate([jnp.stack(sig_parts), pad])  # (128,)
    cnt_row = jnp.concatenate([jnp.stack(cnt_parts), pad])
    sig_ref[0, 0] = jnp.broadcast_to(sig_row[None, :], (8, 128))
    cnt_ref[0, 0] = jnp.broadcast_to(cnt_row[None, :], (8, 128))


@functools.partial(jax.jit, static_argnames=('score_hw', 'q_tile', 'interpret'))
def fused_upsample_stats(
    mask_logits: jnp.ndarray,
    score_hw: tuple[int, int] = (384, 384),
    q_tile: int = 8,
    interpret: bool = False,
):
    """(B, Q, Hm, Wm) f32 mask logits → (sig_sum (B, Q) f32,
    pos_cnt (B, Q) f32, bin_i8 (B, Q, sh, sw) int8) via one fused pass.

    ``q_tile`` must divide Q (the caller picks the largest of 8/4/2/1 that
    does). ``interpret=True`` runs the Pallas interpreter — used on CPU,
    where the Mosaic TPU backend is unavailable.
    """
    b, q, hm, wm = mask_logits.shape
    sh, sw = score_hw
    if q % q_tile:
        raise ValueError(f'q_tile {q_tile} must divide Q {q}')
    n_tiles = q // q_tile
    mask_logits = mask_logits.astype(jnp.float32)
    wy = jnp.asarray(bilinear_resize_matrix(hm, sh))
    wx = jnp.asarray(bilinear_resize_matrix(wm, sw))

    sig_pad, cnt_pad, bin_i8 = pl.pallas_call(
        _kernel,
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, q_tile, hm, wm), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((sh, hm), lambda i, j: (0, 0)),
            pl.BlockSpec((sw, wm), lambda i, j: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 8, 128), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, q_tile, sh, sw), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, n_tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, q, sh, sw), jnp.int8),
        ],
        interpret=interpret,
    )(mask_logits, wy, wx)
    # un-pad the (8, 128) register tiles back to (B, Q) — see _kernel's
    # store comment (row 0 carries the data, lanes :q_tile are live)
    sig = sig_pad[:, :, 0, :q_tile].reshape(b, q)
    cnt = cnt_pad[:, :, 0, :q_tile].reshape(b, q)
    return sig, cnt, bin_i8


def pick_q_tile(q: int) -> int:
    """Largest of 8/4/2/1 dividing ``q`` (VMEM-sized query tiles)."""
    for t in (8, 4, 2, 1):
        if q % t == 0:
            return t
    return 1
