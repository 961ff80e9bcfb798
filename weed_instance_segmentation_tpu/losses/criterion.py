"""Mask2Former training criterion, fully on-device (SURVEY.md X7).

Semantics mirror the HF loss the reference trains with
(``transformers==4.57.6`` modeling_mask2former.py:246-797, 2240-2295):

- Hungarian matcher over a cost of ``mask_weight``·pairwise-sigmoid-CE +
  ``class_weight``·(−prob[target]) + ``dice_weight``·pairwise-dice, all
  evaluated on ``train_num_points`` uniform points shared across pairs
  (HF:414-484), cost clamped to ±1e10 with NaN→0 (HF:474-477).
- loss_cross_entropy: CE over queries with no-object weight 0.1 (HF:547-580).
- loss_mask / loss_dice: sigmoid-CE + dice on points chosen by uncertainty
  sampling — oversample 3×, keep top-75% by −|logit|, re-draw the remaining
  25% uniformly (HF:581-719).
- Aux losses: the same dict per intermediate decoder layer with ``_{i}``
  suffix (HF:768-775); weights applied by substring match (HF:2275-2280);
  total = sum of the dict (HF:2282-2283).
- ``num_masks`` normalization with cross-device all-reduce: the HF loss
  all-reduces via accelerate when distributed (HF:782-796); here it is a
  ``jax.lax.psum`` over the data-parallel mesh axis when ``axis_name`` is
  given.

TPU-first deviations from the torch implementation (documented per
SURVEY.md §7.3):

- **Ragged targets → static shapes**: per-image target lists are padded to
  a static ``max_instances`` with a validity mask (SURVEY.md §7.3.2). All
  terms respect the mask; padded target rows get a constant cost column so
  they never perturb the optimal assignment of valid rows.
- **Matching on device**: scipy's host LAP (HF:478, a device→host sync per
  batch per layer) is replaced by ``ops.lap.linear_sum_assignment`` — a
  jit-compatible Jonker–Volgenant solved entirely on-device, vmapped over
  the batch.
- **RNG**: point sampling uses ``jax.random`` — training parity with the
  torch RNG is statistical, not bitwise (SURVEY.md §7.3.4); inference has
  no RNG.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp

from weed_instance_segmentation_tpu.ops.grid_sample import grid_sample_bilinear
from weed_instance_segmentation_tpu.ops.lap import linear_sum_assignment

def _pred_sampler() -> str:
    """Pred-point sampler for the final losses: 'einsum' (default —
    backward is MXU matmuls; measured A/B in tools/ab_point_sampler.py) or
    'gather' (the flat-table form, backward is a scatter-add).

    Read at TRACE time (the env-read-at-use rule, ADVICE r3/r4): each fresh
    jit trace of the loss picks up the current ``WISTPU_PRED_SAMPLER``. An
    already-compiled step keeps the value it was traced with — build a new
    step (or clear the jit cache) after flipping the knob."""
    return os.environ.get('WISTPU_PRED_SAMPLER', 'einsum')


def pad_targets(
    mask_labels: list,
    class_labels: list,
    max_instances: int,
    mask_hw: tuple[int, int] | None = None,
):
    """Host-side: ragged per-image target lists → static padded arrays.

    Args:
        mask_labels: list of (N_i, H, W) float arrays (binary masks).
        class_labels: list of (N_i,) int arrays.
        max_instances: static pad size (N_i > max_instances is truncated
            with a warning-free clamp — choose it ≥ dataset max).
        mask_hw: optional fixed (H, W); defaults to the batch max
            (HF pads to batch max with zeros — HF:530-545).

    Returns:
        target_masks (B, max_instances, H, W) float32,
        target_classes (B, max_instances) int32,
        target_valid (B, max_instances) bool.
    """
    import numpy as np

    b = len(mask_labels)
    if mask_hw is None:
        hs = [m.shape[1] if m.ndim == 3 and m.shape[0] else m.shape[-2] for m in mask_labels]
        ws = [m.shape[2] if m.ndim == 3 and m.shape[0] else m.shape[-1] for m in mask_labels]
        mask_hw = (max(hs, default=1), max(ws, default=1))
    h, w = mask_hw
    tm = np.zeros((b, max_instances, h, w), np.float32)
    tc = np.zeros((b, max_instances), np.int32)
    tv = np.zeros((b, max_instances), bool)
    for i, (m, c) in enumerate(zip(mask_labels, class_labels)):
        m = np.asarray(m, np.float32)
        c = np.asarray(c).reshape(-1)
        n = min(len(c), max_instances)
        if n:
            tm[i, :n, : m.shape[-2], : m.shape[-1]] = m[:n]
            tc[i, :n] = c[:n]
            tv[i, :n] = True
    return tm, tc, tv


def _sample_points(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear point sampling matching HF ``sample_point`` (HF:246-275):
    grid_sample(align_corners=False, zeros) at ``2·coords − 1``.

    masks: (N, H, W); coords: (P, 2) in [0,1] (x, y). Returns (N, P)."""
    grid = (2.0 * coords - 1.0)[None, None]  # (1, 1, P, 2)
    out = grid_sample_bilinear(masks[None], grid)  # (1, N, 1, P)
    return out[0, :, 0, :]


def _patch_table(masks: jnp.ndarray, dtype=None) -> jnp.ndarray:
    """(N, H, W) → (N·H·W, 4) flat table with each 2×2 bilinear
    neighborhood packed into lanes (one gather row per tap). Build it once
    and reuse via :func:`_sample_points_table` when the same masks are
    sampled repeatedly (the 11 aux-layer losses all sample the SAME target
    masks at full resolution — rebuilding a (N, H, W, 4) table per layer
    was ~11× the necessary HBM traffic). ``dtype`` allows a bf16 table for
    binary {0,1} targets: exact values, half the row bytes."""
    n, h, w = masks.shape
    if dtype is not None:
        masks = masks.astype(dtype)
    mp = jnp.pad(masks, ((0, 0), (0, 1), (0, 1)))
    return jnp.stack(
        [mp[:, :h, :w], mp[:, :h, 1:w + 1], mp[:, 1:h + 1, :w], mp[:, 1:h + 1, 1:w + 1]],
        axis=-1,
    ).reshape(n * h * w, 4)


def _sample_points_table(
    patch: jnp.ndarray, hw: tuple[int, int], coords: jnp.ndarray
) -> jnp.ndarray:
    """Gather-only point sampling from a prebuilt :func:`_patch_table`.
    patch (N·H·W, 4); coords (N, P, 2) in [0,1] → (N, P) in f32."""
    h, w = hw
    n, p = coords.shape[0], coords.shape[1]

    x = coords[..., 0] * w - 0.5  # (N, P)
    y = coords[..., 1] * h - 0.5
    x0c = jnp.clip(jnp.floor(x), 0, w - 1)
    y0c = jnp.clip(jnp.floor(y), 0, h - 1)
    base = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None]
    idx = base + (y0c * w + x0c).astype(jnp.int32)
    rows = jnp.take(patch, idx.reshape(-1), axis=0, mode='clip').reshape(n, p, 4)
    rows = rows.astype(jnp.float32)

    out = 0.0
    for g, (ly, lx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        px = x0c + lx
        py = y0c + ly
        tri = jnp.maximum(0.0, 1.0 - jnp.abs(x - px)) * jnp.maximum(0.0, 1.0 - jnp.abs(y - py))
        in_range = (px <= w - 1) & (py <= h - 1)
        out = out + rows[..., g] * (tri * in_range)
    return out


def _sample_points_batch(masks: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Per-mask coords variant: masks (N, H, W), coords (N, P, 2) in [0,1]
    → (N, P). Same numerics as :func:`_sample_points`, restructured for TPU
    as ONE flat-table gather with the 2×2 corners packed into lanes (XLA's
    gather is per-row-bound; this replaces 4·N·P scalar gathers with N·P
    4-lane rows — the loss stack's dominant cost, see engine/steps.py
    profile notes)."""
    return _sample_points_table(_patch_table(masks), masks.shape[1:], coords)


def _sample_points_einsum(masks: jnp.ndarray, coords: jnp.ndarray,
                          n_chunks: int = 4) -> jnp.ndarray:
    """Same numerics as :func:`_sample_points_batch`, restructured so the
    BACKWARD is MXU matmuls instead of a (N·P)-row scatter-add (the train
    step's criterion-backward hot spot — see tools/profile_criterion.py).

    Bilinear sampling is separable: out[i,p] = Σ_y wy[i,p,y] · Σ_x
    wx[i,p,x] · M[i,y,x], where the tri-weight rows wx = relu(1 − |x −
    cell|) carry exactly the 2 bilinear neighbour weights and are zero
    elsewhere — including grid_sample's zeros-padding edge semantics
    (cells beyond the border simply don't exist; HF:246-275 parity). Every
    other term of the contraction is exactly 0.0, so forward values match
    the gather formulation to reassociation (~1 ulp); grad-of-einsum is
    again an einsum, so the backward never scatters. Points are processed
    in ``n_chunks`` sequential chunks to bound the (N, P/k, W) weight /
    intermediate liveness (~150 MB at bench shapes instead of ~600 MB —
    the remote compile helper rejects large-liveness programs).

    Use for masks that need gradients; for gather-only sampling (targets,
    uncertainty ranking) the flat-table gather is cheaper — the weight
    matrices scale with mask resolution (Σ FLOPs ~ N·P·(H+W)).

    Dtype: when the mask logits are bf16 (the bf16 training path — the
    model already emits bf16), the tri-weights are cast to bf16 too and the
    MXU runs single-pass bf16 instead of promoting everything to f32 and
    multi-passing at ``precision='high'``; bf16 tri-weights perturb the
    effective sample point by ≤2⁻⁹ of a pixel. f32 masks keep the exact
    f32/'high' contraction (parity path).
    """
    n, h, w = masks.shape
    p = coords.shape[1]
    if p % n_chunks:
        n_chunks = 1
    c = p // n_chunks
    bf16 = masks.dtype == jnp.bfloat16
    wdt = jnp.bfloat16 if bf16 else coords.dtype
    prec = 'default' if bf16 else 'high'
    # (K, N, C) point chunks
    x = (coords[..., 0] * w - 0.5).reshape(n, n_chunks, c).swapaxes(0, 1)
    y = (coords[..., 1] * h - 0.5).reshape(n, n_chunks, c).swapaxes(0, 1)
    cols = jnp.arange(w, dtype=coords.dtype)
    rows = jnp.arange(h, dtype=coords.dtype)

    def one(args):
        xc, yc = args
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(xc[..., None] - cols))  # (N, C, W)
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(yc[..., None] - rows))  # (N, C, H)
        inter = jnp.einsum('ihw,icw->ich', masks, wx.astype(wdt), precision=prec)
        return jnp.einsum(
            'ich,ich->ic', inter, wy.astype(wdt), precision=prec
        ).astype(jnp.float32)

    out = jax.lax.map(one, (x, y))  # (K, N, C)
    return out.swapaxes(0, 1).reshape(n, p)


def _pairwise_sigmoid_ce(pred_pts: jnp.ndarray, tgt_pts: jnp.ndarray) -> jnp.ndarray:
    """(Q, P), (N, P) → (Q, N) mean-over-points BCE cost (HF:355-380)."""
    p = pred_pts.shape[-1]
    pos = jax.nn.softplus(-pred_pts)  # BCE(logit, 1)
    neg = jax.nn.softplus(pred_pts)  # BCE(logit, 0)
    return (pos / p) @ tgt_pts.T + (neg / p) @ (1.0 - tgt_pts).T


def _pairwise_dice(pred_pts: jnp.ndarray, tgt_pts: jnp.ndarray) -> jnp.ndarray:
    """(Q, P), (N, P) → (Q, N) dice cost (HF:331-352)."""
    probs = jax.nn.sigmoid(pred_pts)
    numerator = 2.0 * (probs @ tgt_pts.T)
    denominator = probs.sum(-1)[:, None] + tgt_pts.sum(-1)[None, :]
    return 1.0 - (numerator + 1.0) / (denominator + 1.0)


def matcher_cost(
    masks_queries_logits: jnp.ndarray,
    class_queries_logits: jnp.ndarray,
    target_masks: jnp.ndarray,
    target_classes: jnp.ndarray,
    target_valid: jnp.ndarray,
    rng: jax.Array,
    num_points: int,
    class_weight: float,
    mask_weight: float,
    dice_weight: float,
    point_coords: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched matcher cost (HF:379-477) → (B, N_max, Q), the transposed
    LAP input. Padded target slots get a constant-cost row, so they soak up
    arbitrary leftover queries without changing the optimum for valid slots.
    ``point_coords`` (B, P, 2) overrides the random draw (for fixed-point
    parity tests — SURVEY.md §7.4.3)."""
    b, _, _, _ = masks_queries_logits.shape
    if point_coords is None:
        point_coords = jax.random.uniform(rng, (b, num_points, 2))  # per image (HF:455)

    def one(mask_logits, class_logits, tmasks, tclasses, tvalid, coords):
        pred_probs = jax.nn.softmax(class_logits, axis=-1)  # (Q, L+1)
        cost_class = -pred_probs[:, tclasses]  # (Q, N)
        # shared coords across masks: the channel-major grid_sample gathers
        # P rows of Q channels — already row-efficient (the packed variant
        # measured 2.3× slower here)
        pred_pts = _sample_points(mask_logits, coords)  # (Q, P)
        tgt_pts = _sample_points(tmasks, coords)  # (N, P)
        cost = (
            mask_weight * _pairwise_sigmoid_ce(pred_pts, tgt_pts)
            + class_weight * cost_class
            + dice_weight * _pairwise_dice(pred_pts, tgt_pts)
        )
        cost = jnp.clip(cost, -1e10, 1e10)
        cost = jnp.nan_to_num(cost, nan=0.0)
        # padded targets: constant column → assignment of valid rows unchanged
        cost = jnp.where(tvalid[None, :], cost, 0.0)
        return cost.T  # rows = targets → (N, Q)

    return jax.vmap(one)(
        masks_queries_logits, class_queries_logits, target_masks, target_classes,
        target_valid, point_coords,
    )


def hungarian_match(
    masks_queries_logits: jnp.ndarray,
    class_queries_logits: jnp.ndarray,
    target_masks: jnp.ndarray,
    target_classes: jnp.ndarray,
    target_valid: jnp.ndarray,
    rng: jax.Array,
    num_points: int,
    class_weight: float,
    mask_weight: float,
    dice_weight: float,
    point_coords: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Batched device-side matcher (HF:379-484): :func:`matcher_cost` + the
    on-device LAP. Returns assigned_query (B, N_max) int32 — the query index
    matched to each (possibly padded) target slot."""
    cost = matcher_cost(
        masks_queries_logits, class_queries_logits, target_masks, target_classes,
        target_valid, rng, num_points, class_weight, mask_weight, dice_weight,
        point_coords,
    )
    return jax.vmap(linear_sum_assignment)(cost)


def _uncertain_select() -> str:
    """Uncertain-point selection: 'varsort' (default) or 'topk'. Read at
    TRACE time like ``_pred_sampler`` — flipping ``WISTPU_UNCERTAIN`` takes
    effect on the next trace, not on a cached compile."""
    return os.environ.get('WISTPU_UNCERTAIN', 'varsort')


def _uncertainty_points(
    pred_masks: jnp.ndarray,
    rng: jax.Array,
    num_points: int,
    oversample_ratio: float,
    importance_sample_ratio: float,
) -> jnp.ndarray:
    """Uncertainty-based point coords per mask (HF:675-719).

    pred_masks: (N, H, W). Returns (N, num_points, 2).

    Selection of the ``num_uncertain`` most-uncertain points defaults to a
    variadic stable sort that carries the coords alongside the |logit| key
    (``WISTPU_UNCERTAIN=varsort``) instead of ``lax.top_k`` + gather: the
    sort→gather composition at small mask counts reproducibly faults the
    TPU runtime at overfit-gate shapes (N=6, 37632 points — see
    tools/records/tpu_backend_incident_2026-08-18.md and the bisect logs),
    while the gather-free variadic sort is healthy everywhere. The two
    forms are exactly equivalent: ascending stable sort of |logit| ==
    descending top_k of −|logit| with the same lower-index tie order
    (asserted in tests/test_losses.py). ``WISTPU_UNCERTAIN=topk`` restores
    the original composition for A/B — which also shows varsort is FASTER
    at bench shapes (v5e, B2/Q200/NI10 800²: 10-aux criterion forward
    104.3 ms vs 131.5 ms, 8.6 vs 11.2 ms per aux layer,
    tools/profile_criterion.py), so the workaround is the better default
    on both axes."""
    n = pred_masks.shape[0]
    num_sampled = int(num_points * oversample_ratio)
    num_uncertain = int(importance_sample_ratio * num_points)
    num_random = num_points - num_uncertain

    r1, r2 = jax.random.split(rng)
    coords = jax.random.uniform(r1, (n, num_sampled, 2))

    point_logits = _sample_points_batch(pred_masks, coords)  # (N, num_sampled)
    if _uncertain_select() == 'topk':
        uncertainty = -jnp.abs(point_logits)  # (N, num_sampled)
        _, idx = jax.lax.top_k(uncertainty, num_uncertain)
        picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
    else:
        _, xs, ys = jax.lax.sort(
            (jnp.abs(point_logits), coords[..., 0], coords[..., 1]),
            dimension=-1, is_stable=True, num_keys=1,
        )
        picked = jnp.stack(
            [xs[:, :num_uncertain], ys[:, :num_uncertain]], axis=-1
        )
    if num_random > 0:
        extra = jax.random.uniform(r2, (n, num_random, 2))
        picked = jnp.concatenate([picked, extra], axis=1)
    return picked


def mask2former_loss(
    masks_queries_logits: jnp.ndarray,
    class_queries_logits: jnp.ndarray,
    target_masks: jnp.ndarray,
    target_classes: jnp.ndarray,
    target_valid: jnp.ndarray,
    rng: jax.Array,
    *,
    num_labels: int,
    no_object_weight: float = 0.1,
    train_num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    class_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    axis_name: str | None = None,
    loss_key_suffix: str = '',
    sample_valid: jnp.ndarray | None = None,
    tgt_patch: jnp.ndarray | None = None,
    assigned: jnp.ndarray | None = None,
) -> dict[str, jnp.ndarray]:
    """One layer's loss dict {loss_mask, loss_dice, loss_cross_entropy}
    (unweighted — see :func:`total_loss` for the weight map).

    ``sample_valid`` (B,) marks real samples; rows padded into a short final
    batch (engine/train.py repeats the last sample to keep the static batch
    shape) are excluded from every term — both the CE normalizer and, via
    ``target_valid``, the mask/dice sums and ``num_masks``. ``tgt_patch``
    is an optional prebuilt :func:`_patch_table` of the flattened target
    masks, shared across aux layers by :func:`total_loss` (the targets are
    identical per layer; only the sampled points differ).
    """
    b, q, _ = class_queries_logits.shape
    n_max = target_masks.shape[1]
    if sample_valid is not None:
        target_valid = target_valid & (sample_valid > 0)[:, None]

    # rng is split identically whether or not the assignment is precomputed,
    # so total_loss's batched-LAP path is bitwise-identical to the inline one
    r_match, r_points = jax.random.split(rng)
    if assigned is None:
        assigned = hungarian_match(
            masks_queries_logits, class_queries_logits, target_masks, target_classes,
            target_valid, r_match, train_num_points, class_weight, mask_weight,
            dice_weight,
        )  # (B, N_max)

    # num_masks: total valid targets, all-reduced over the data axis,
    # clamped ≥ 1 (HF:782-796)
    num_masks = target_valid.sum().astype(jnp.float32)
    if axis_name is not None:
        num_masks = jax.lax.psum(num_masks, axis_name)
        num_masks = num_masks / jax.lax.psum(1, axis_name)  # / world_size (HF:795)
    num_masks = jnp.maximum(num_masks, 1.0)

    # ---- loss_labels (HF:547-580) ---------------------------------------
    # scatter matched classes into a (B, Q) map defaulting to no-object
    target_map = jnp.full((b, q), num_labels, jnp.int32)
    batch_idx = jnp.arange(b)[:, None].repeat(n_max, 1)
    safe_assigned = jnp.clip(assigned, 0, q - 1)
    # LAP assigns each target slot a distinct query; invalid slots write the
    # no-object class, which is already the default.
    scatter_classes = jnp.where(target_valid, target_classes, num_labels)
    target_map = target_map.at[batch_idx, safe_assigned].set(scatter_classes)
    log_probs = jax.nn.log_softmax(class_queries_logits, axis=-1)  # (B, Q, L+1)
    picked = jnp.take_along_axis(log_probs, target_map[..., None], axis=-1)[..., 0]
    class_w = jnp.concatenate(
        [jnp.ones((num_labels,)), jnp.asarray([no_object_weight])]
    )[target_map]
    if sample_valid is not None:
        class_w = class_w * sample_valid[:, None]
    # torch CrossEntropyLoss(weight): mean = Σ w·nll / Σ w
    loss_ce = -(class_w * picked).sum() / jnp.maximum(class_w.sum(), 1e-8)

    # ---- loss_masks (HF:581-640) -----------------------------------------
    flat_pred = masks_queries_logits.reshape(b * q, *masks_queries_logits.shape[2:])
    pair_idx = (batch_idx * q + safe_assigned).reshape(-1)
    pred = flat_pred[pair_idx]  # (B·N_max, Hp, Wp)
    tgt = target_masks.reshape(b * n_max, *target_masks.shape[2:])
    valid = target_valid.reshape(-1)

    coords = _uncertainty_points(
        pred, r_points, train_num_points, oversample_ratio, importance_sample_ratio
    )  # (B·N_max, P, 2) — stop-gradient region per HF no_grad (HF:624-634)
    coords = jax.lax.stop_gradient(coords)

    # pred needs gradients → einsum sampler (matmul backward, no scatter);
    # targets are gather-only (stop-gradient) and at full resolution, where
    # the flat-table gather wins (weight matrices scale with H+W)
    if _pred_sampler() == 'einsum':
        point_logits = _sample_points_einsum(pred, coords)
    else:
        point_logits = _sample_points_batch(pred, coords)
    if tgt_patch is not None:
        point_labels = _sample_points_table(tgt_patch, tgt.shape[1:], coords)
    else:
        point_labels = _sample_points_batch(tgt, coords)
    point_labels = jax.lax.stop_gradient(point_labels)

    bce = jax.nn.softplus(point_logits) - point_logits * point_labels
    loss_mask = jnp.where(valid, bce.mean(-1), 0.0).sum() / num_masks

    probs = jax.nn.sigmoid(point_logits)
    numerator = 2.0 * (probs * point_labels).sum(-1)
    denominator = probs.sum(-1) + point_labels.sum(-1)
    dice = 1.0 - (numerator + 1.0) / (denominator + 1.0)
    loss_dice = jnp.where(valid, dice, 0.0).sum() / num_masks

    s = loss_key_suffix
    return {
        f'loss_mask{s}': loss_mask,
        f'loss_dice{s}': loss_dice,
        f'loss_cross_entropy{s}': loss_ce,
    }


def total_loss(
    outputs: Any,
    target_masks: jnp.ndarray,
    target_classes: jnp.ndarray,
    target_valid: jnp.ndarray,
    rng: jax.Array,
    *,
    num_labels: int,
    no_object_weight: float = 0.1,
    train_num_points: int = 12544,
    oversample_ratio: float = 3.0,
    importance_sample_ratio: float = 0.75,
    class_weight: float = 2.0,
    mask_weight: float = 5.0,
    dice_weight: float = 5.0,
    use_auxiliary_loss: bool = True,
    axis_name: str | None = None,
    sample_valid: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Weighted total loss over the final layer + all aux layers.

    ``outputs`` is a ``models.mask2former.Mask2FormerOutput``. Returns
    (scalar total, weighted per-key dict) — matching HF's substring-matched
    weight map + sum-of-dict total (HF:2275-2283). ``sample_valid`` (B,)
    excludes batch-padding repeats from every term.

    INVARIANT: ``target_masks`` must be binary {0,1} (any dtype). The shared
    target patch table is built in bf16, which is exact for {0,1} but would
    silently quantize soft/antialiased masks — and would then disagree with a
    direct ``mask2former_loss`` call (``tgt_patch=None`` → f32). Every
    in-repo producer satisfies this (rasterized polygons, instance-id
    equality masks, nearest-resampled augmentation).
    """
    # one target patch table for all layers (targets don't vary per layer;
    # only the random points do). Binary {0,1} masks are exact in bf16 —
    # half the gather-row bytes, and bf16 rows gather faster on TPU
    # (tools/profile_gather.py). Augmentation keeps masks binary (nearest
    # resampling, processing/augment.py).
    b = target_masks.shape[0]
    tgt_flat = target_masks.reshape(b * target_masks.shape[1], *target_masks.shape[2:])
    tgt_patch = jax.lax.stop_gradient(_patch_table(tgt_flat, dtype=jnp.bfloat16))
    kw = dict(
        num_labels=num_labels, no_object_weight=no_object_weight,
        train_num_points=train_num_points, oversample_ratio=oversample_ratio,
        importance_sample_ratio=importance_sample_ratio, class_weight=class_weight,
        mask_weight=mask_weight, dice_weight=dice_weight, axis_name=axis_name,
        sample_valid=sample_valid, tgt_patch=tgt_patch,
    )
    layers = [(outputs.masks_queries_logits, outputs.class_queries_logits, '')]
    if use_auxiliary_loss:
        layers += [
            (m, c, f'_{i}')
            for i, (m, c) in enumerate(
                zip(outputs.aux_masks_queries_logits, outputs.aux_class_queries_logits)
            )
        ]
    losses: dict[str, jnp.ndarray] = {}
    rngs = jax.random.split(rng, len(layers))

    # ---- all layers' assignments in ONE vmapped LAP ----------------------
    # The JV solver is sequential scalar loops; L separate (vmap-of-B)
    # instances serialize ~29 ms/step at bench shapes while one (L·B)-wide
    # vmap runs them in parallel (~3 ms — tools/profile_criterion.py).
    # Identical costs + identical per-problem solver → identical assignment.
    tv = target_valid
    if sample_valid is not None:
        tv = tv & (sample_valid > 0)[:, None]  # mirror mask2former_loss
    costs = []
    for r, (m, c, _) in zip(rngs, layers):
        r_match = jax.random.split(r)[0]  # same stream as mask2former_loss
        costs.append(
            matcher_cost(
                m, c, target_masks, target_classes, tv, r_match,
                train_num_points, class_weight, mask_weight, dice_weight,
            )
        )
    lbnq = jnp.stack(costs)  # (L, B, N, Q)
    l, b_, n_, q_ = lbnq.shape
    assigned = jax.vmap(linear_sum_assignment)(lbnq.reshape(l * b_, n_, q_))
    assigned = assigned.reshape(l, b_, n_)

    for i, (r, (m, c, suffix)) in enumerate(zip(rngs, layers)):
        losses.update(
            mask2former_loss(
                m, c, target_masks, target_classes, target_valid, r,
                loss_key_suffix=suffix, assigned=assigned[i], **kw,
            )
        )
    weight_map = {
        'loss_cross_entropy': class_weight,
        'loss_mask': mask_weight,
        'loss_dice': dice_weight,
    }
    weighted = {}
    for key, value in losses.items():
        for sub, w in weight_map.items():
            if sub in key:
                value = value * w
        weighted[key] = value
    return sum(weighted.values()), weighted
