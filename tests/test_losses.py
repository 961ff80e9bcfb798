"""Loss-stack parity vs the HF criterion the reference trains with
(modeling_mask2former.py:246-797). RNG-free components are compared
exactly on fixed points (SURVEY.md §7.4.3); RNG-dependent point draws are
validated structurally.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from weed_instance_segmentation_tpu.losses.criterion import (
    _pairwise_dice, _pairwise_sigmoid_ce, hungarian_match, mask2former_loss,
    pad_targets, total_loss,
)

transformers = pytest.importorskip('transformers')
from transformers.models.mask2former import modeling_mask2former as hf_m2f  # noqa: E402
from scipy.optimize import linear_sum_assignment as scipy_lap  # noqa: E402


def test_pairwise_costs_match_hf(rng):
    q, n, p = 7, 4, 64
    pred = rng.standard_normal((q, p)).astype(np.float32) * 3
    tgt = (rng.random((n, p)) > 0.5).astype(np.float32)

    want_ce = hf_m2f.pair_wise_sigmoid_cross_entropy_loss(
        torch.from_numpy(pred), torch.from_numpy(tgt)
    ).numpy()
    want_dice = hf_m2f.pair_wise_dice_loss(torch.from_numpy(pred), torch.from_numpy(tgt)).numpy()

    got_ce = np.asarray(_pairwise_sigmoid_ce(jnp.asarray(pred), jnp.asarray(tgt)))
    got_dice = np.asarray(_pairwise_dice(jnp.asarray(pred), jnp.asarray(tgt)))
    np.testing.assert_allclose(got_ce, want_ce, atol=1e-5)
    np.testing.assert_allclose(got_dice, want_dice, atol=1e-5)


def _hf_cost_matrix(mask_logits, class_logits, tmasks, tclasses, coords,
                    class_w=2.0, mask_w=5.0, dice_w=5.0):
    """Rebuild the HF matcher cost for one image on FIXED coords (HF:450-477)."""
    pred_probs = torch.from_numpy(class_logits).softmax(-1)
    cost_class = -pred_probs[:, torch.from_numpy(tclasses).long()]
    pc = torch.from_numpy(coords)[None]
    tgt = hf_m2f.sample_point(
        torch.from_numpy(tmasks)[:, None], pc.repeat(tmasks.shape[0], 1, 1),
        align_corners=False,
    ).squeeze(1)
    pred = hf_m2f.sample_point(
        torch.from_numpy(mask_logits)[:, None], pc.repeat(mask_logits.shape[0], 1, 1),
        align_corners=False,
    ).squeeze(1)
    cost = (
        mask_w * hf_m2f.pair_wise_sigmoid_cross_entropy_loss(pred, tgt)
        + class_w * cost_class
        + dice_w * hf_m2f.pair_wise_dice_loss(pred, tgt)
    )
    cost = torch.clamp(cost, -1e10, 1e10)
    return torch.nan_to_num(cost, 0).numpy()


def test_matcher_matches_scipy_on_fixed_points(rng):
    b, q, n, h, w, p = 2, 12, 5, 16, 24, 128
    mask_logits = rng.standard_normal((b, q, h, w)).astype(np.float32)
    class_logits = rng.standard_normal((b, q, 4)).astype(np.float32)
    tmasks = (rng.random((b, n, h * 2, w * 2)) > 0.7).astype(np.float32)
    tclasses = rng.integers(0, 3, (b, n)).astype(np.int32)
    tvalid = np.ones((b, n), bool)
    coords = rng.random((b, p, 2)).astype(np.float32)

    assigned = np.asarray(jax.jit(
        lambda *a: hungarian_match(
            *a, rng=jax.random.PRNGKey(0), num_points=p,
            class_weight=2.0, mask_weight=5.0, dice_weight=5.0,
            point_coords=jnp.asarray(coords),
        )
    )(
        jnp.asarray(mask_logits), jnp.asarray(class_logits), jnp.asarray(tmasks),
        jnp.asarray(tclasses), jnp.asarray(tvalid),
    ))

    for i in range(b):
        cost = _hf_cost_matrix(mask_logits[i], class_logits[i], tmasks[i], tclasses[i], coords[i])
        rows, cols = scipy_lap(cost)
        # same optimal cost (assignments may permute on ties)
        want = cost[rows, cols].sum()
        got = cost.T[np.arange(n), assigned[i]].T.sum() if False else cost[assigned[i], np.arange(n)].sum()
        # distinct queries per target
        assert len(set(assigned[i].tolist())) == n
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_loss_labels_matches_hf(rng):
    """Given the same assignment, our weighted CE == HF loss_labels."""
    b, q, n, num_labels = 2, 10, 3, 4
    class_logits = rng.standard_normal((b, q, num_labels + 1)).astype(np.float32)
    tclasses = rng.integers(0, num_labels, (b, n)).astype(np.int32)
    assigned = np.stack([rng.permutation(q)[:n] for _ in range(b)]).astype(np.int32)

    cfg = hf_m2f.Mask2FormerConfig(num_labels=num_labels)
    crit = hf_m2f.Mask2FormerLoss(cfg, {})
    indices = [
        (torch.as_tensor(assigned[i], dtype=torch.int64),
         torch.arange(n, dtype=torch.int64))
        for i in range(b)
    ]
    want = crit.loss_labels(
        torch.from_numpy(class_logits),
        [torch.from_numpy(tclasses[i]).long() for i in range(b)],
        indices,
    )['loss_cross_entropy'].item()

    # rebuild via our formula with the same target map
    target_map = np.full((b, q), num_labels, np.int64)
    for i in range(b):
        target_map[i, assigned[i]] = tclasses[i]
    log_probs = np.asarray(jax.nn.log_softmax(jnp.asarray(class_logits), axis=-1))
    picked = np.take_along_axis(log_probs, target_map[..., None], axis=-1)[..., 0]
    class_w = np.concatenate([np.ones(num_labels), [0.1]])[target_map]
    got = -(class_w * picked).sum() / class_w.sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_point_loss_formulas_match_hf(rng):
    n, p = 6, 100
    logits = rng.standard_normal((n, p)).astype(np.float32) * 2
    labels = (rng.random((n, p)) > 0.5).astype(np.float32)
    num_masks = 5.0

    want_mask = hf_m2f.sigmoid_cross_entropy_loss(
        torch.from_numpy(logits), torch.from_numpy(labels), num_masks
    ).item()
    want_dice = hf_m2f.dice_loss(
        torch.from_numpy(logits), torch.from_numpy(labels), num_masks
    ).item()

    jl, jt = jnp.asarray(logits), jnp.asarray(labels)
    bce = jax.nn.softplus(jl) - jl * jt
    got_mask = float(bce.mean(-1).sum() / num_masks)
    probs = jax.nn.sigmoid(jl)
    dice = 1.0 - (2.0 * (probs * jt).sum(-1) + 1.0) / (probs.sum(-1) + jt.sum(-1) + 1.0)
    got_dice = float(dice.sum() / num_masks)
    np.testing.assert_allclose(got_mask, want_mask, rtol=1e-5)
    np.testing.assert_allclose(got_dice, want_dice, rtol=1e-5)


def test_total_loss_runs_jitted(rng):
    """End-to-end: total loss over final + aux layers, jitted, finite."""
    from weed_instance_segmentation_tpu.models.mask2former import Mask2FormerOutput

    b, q, h, w, num_labels, n_aux = 2, 10, 8, 12, 3, 2
    outputs = Mask2FormerOutput(
        class_queries_logits=jnp.asarray(rng.standard_normal((b, q, num_labels + 1)), jnp.float32),
        masks_queries_logits=jnp.asarray(rng.standard_normal((b, q, h, w)), jnp.float32),
        aux_class_queries_logits=tuple(
            jnp.asarray(rng.standard_normal((b, q, num_labels + 1)), jnp.float32)
            for _ in range(n_aux)
        ),
        aux_masks_queries_logits=tuple(
            jnp.asarray(rng.standard_normal((b, q, h, w)), jnp.float32) for _ in range(n_aux)
        ),
    )
    mask_labels = [
        (rng.random((3, 32, 48)) > 0.5).astype(np.float32),
        (rng.random((1, 32, 48)) > 0.5).astype(np.float32),
    ]
    class_labels = [np.array([0, 1, 2]), np.array([2])]
    tm, tc, tv = pad_targets(mask_labels, class_labels, max_instances=4)
    assert tv.sum() == 4

    fn = jax.jit(
        lambda *a: total_loss(
            outputs, *a, num_labels=num_labels, train_num_points=64
        )
    )
    loss, loss_dict = fn(jnp.asarray(tm), jnp.asarray(tc), jnp.asarray(tv), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    assert len(loss_dict) == 3 * (n_aux + 1)
    # weighted keys present for every aux layer
    for i in range(n_aux):
        assert f'loss_mask_{i}' in loss_dict


def test_loss_invariant_to_padding(rng):
    """Adding more padded (invalid) slots must not change the loss."""
    b, q, h, w, num_labels = 1, 8, 8, 8, 3
    mask_logits = jnp.asarray(rng.standard_normal((b, q, h, w)), jnp.float32)
    class_logits = jnp.asarray(rng.standard_normal((b, q, num_labels + 1)), jnp.float32)
    mask_labels = [(rng.random((2, 16, 16)) > 0.5).astype(np.float32)]
    class_labels = [np.array([0, 2])]

    out = {}
    for pad in (2, 6):
        tm, tc, tv = pad_targets(mask_labels, class_labels, max_instances=pad)
        d = mask2former_loss(
            mask_logits, class_logits, jnp.asarray(tm), jnp.asarray(tc), jnp.asarray(tv),
            jax.random.PRNGKey(7), num_labels=num_labels, train_num_points=32,
        )
        out[pad] = {k: float(v) for k, v in d.items()}
    # CE is padding-invariant given the same matcher points (the point-loss
    # RNG draw shapes change with N_max, so mask/dice match only in
    # distribution); all terms stay finite.
    np.testing.assert_allclose(
        out[2]['loss_cross_entropy'], out[6]['loss_cross_entropy'], rtol=1e-4
    )
    assert all(np.isfinite(v) for d in out.values() for v in d.values())


def test_sample_valid_excludes_batch_padding(rng):
    """Short final batches are padded with repeats of the last sample
    (engine/train.py); marking those rows invalid via ``sample_valid`` must
    make the loss identical to ANY padding content and different from
    counting the repeats (VERDICT r1 weak #3)."""
    from weed_instance_segmentation_tpu.models.mask2former import Mask2FormerOutput

    q, h, w, num_labels, n_real, b = 6, 8, 8, 3, 2, 4

    def build(batch_pad_content):
        cls = rng_fixed['cls'].copy()
        msk = rng_fixed['msk'].copy()
        tm = rng_fixed['tm'].copy()
        tc = rng_fixed['tc'].copy()
        tv = rng_fixed['tv'].copy()
        if batch_pad_content == 'dup':
            cls[n_real:] = cls[n_real - 1]
            msk[n_real:] = msk[n_real - 1]
            tm[n_real:] = tm[n_real - 1]
            tc[n_real:] = tc[n_real - 1]
            tv[n_real:] = tv[n_real - 1]
        # 'garbage' leaves the random content in rows n_real:
        out = Mask2FormerOutput(
            class_queries_logits=jnp.asarray(cls),
            masks_queries_logits=jnp.asarray(msk),
            aux_class_queries_logits=(),
            aux_masks_queries_logits=(),
        )
        return out, jnp.asarray(tm), jnp.asarray(tc), jnp.asarray(tv)

    rng_fixed = {
        'cls': rng.standard_normal((b, q, num_labels + 1)).astype(np.float32),
        'msk': rng.standard_normal((b, q, h, w)).astype(np.float32),
        'tm': (rng.random((b, 3, 16, 16)) > 0.5).astype(np.float32),
        'tc': rng.integers(0, num_labels, (b, 3)).astype(np.int32),
        'tv': np.ones((b, 3), bool),
    }
    sample_valid = jnp.asarray([1.0] * n_real + [0.0] * (b - n_real))
    key = jax.random.PRNGKey(11)

    losses = {}
    for content in ('dup', 'garbage'):
        out, tm, tc, tv = build(content)
        total, d = total_loss(
            out, tm, tc, tv, key, num_labels=num_labels, train_num_points=32,
            use_auxiliary_loss=False, sample_valid=sample_valid,
        )
        losses[content] = (float(total), {k: float(v) for k, v in d.items()})

    # invalid rows contribute nothing: loss independent of padding content
    assert losses['dup'][0] == pytest.approx(losses['garbage'][0], rel=1e-6)
    for k in losses['dup'][1]:
        assert losses['dup'][1][k] == pytest.approx(losses['garbage'][1][k], rel=1e-6)

    # counting the repeats (sample_valid=None) gives a different loss
    out, tm, tc, tv = build('dup')
    total_unmasked, _ = total_loss(
        out, tm, tc, tv, key, num_labels=num_labels, train_num_points=32,
        use_auxiliary_loss=False,
    )
    assert abs(float(total_unmasked) - losses['dup'][0]) > 1e-6


def test_einsum_sampler_matches_gather(rng):
    """The scatter-free einsum formulation must reproduce the flat-table
    gather sampler: only the 2×2 bilinear neighbours carry nonzero weight,
    so values agree to reassociation. Covers interior points, the zeros-
    padding border region (x ∈ (−0.5, 0)·cell), and out-of-range points."""
    from weed_instance_segmentation_tpu.losses.criterion import (
        _sample_points_batch, _sample_points_einsum,
    )

    n, h, w, p = 3, 17, 23, 40
    masks = jnp.asarray(rng.standard_normal((n, h, w)), jnp.float32)
    coords = jnp.asarray(rng.random((n, p, 2)), jnp.float32)
    # push some points into every edge regime
    coords = coords.at[:, 0].set(jnp.asarray([0.001, 0.001]))     # near 0 → half-pixel border
    coords = coords.at[:, 1].set(jnp.asarray([0.999, 0.999]))     # near 1
    coords = coords.at[:, 2].set(jnp.asarray([-0.2, 0.5]))        # outside the grid
    coords = coords.at[:, 3].set(jnp.asarray([0.5, 1.2]))         # outside the grid

    ref = _sample_points_batch(masks, coords)
    # p=40 divides by 4 (default) and 5 → genuine multi-chunk paths;
    # n_chunks=3 (40 % 3 != 0) exercises the single-chunk fallback branch
    out = _sample_points_einsum(masks, coords)
    out_chunked = _sample_points_einsum(masks, coords, n_chunks=5)
    out_fallback = _sample_points_einsum(masks, coords, n_chunks=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_chunked), np.asarray(ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_fallback), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_einsum_sampler_grad_matches_gather(rng):
    """grad wrt the masks must agree between formulations (the einsum path
    exists precisely to change HOW this gradient is computed, not its value)."""
    from weed_instance_segmentation_tpu.losses.criterion import (
        _sample_points_batch, _sample_points_einsum,
    )

    n, h, w, p = 2, 12, 16, 32
    masks = jnp.asarray(rng.standard_normal((n, h, w)), jnp.float32)
    coords = jnp.asarray(rng.random((n, p, 2)), jnp.float32)
    cot = jnp.asarray(rng.standard_normal((n, p)), jnp.float32)

    g_ref = jax.grad(lambda m: (_sample_points_batch(m, coords) * cot).sum())(masks)
    g_out = jax.grad(lambda m: (_sample_points_einsum(m, coords) * cot).sum())(masks)
    np.testing.assert_allclose(np.asarray(g_out), np.asarray(g_ref), rtol=1e-5, atol=1e-6)


def test_uncertainty_varsort_matches_topk(rng):
    """The gather-free variadic-sort selection (WISTPU_UNCERTAIN=varsort,
    the default — it works around a TPU runtime fault in the sort→gather
    composition at overfit-gate shapes, see
    tools/records/tpu_backend_incident_2026-08-18.md) must be bit-identical
    to the original lax.top_k + take_along_axis form, ties included:
    ascending stable sort of |logit| == descending top_k of −|logit| with
    lower-index tie order (HF:675-719 uses torch.topk, same order)."""
    from weed_instance_segmentation_tpu.losses.criterion import (
        _sample_points_batch,
    )

    key = jax.random.PRNGKey(3)
    num_points, oversample, importance = 256, 3.0, 0.75
    num_sampled = int(num_points * oversample)
    num_uncertain = int(importance * num_points)

    for tie_quantize in (False, True):
        pred = jnp.asarray(rng.standard_normal((6, 32, 32)), jnp.float32)
        if tie_quantize:  # force many |logit| collisions
            pred = jnp.round(pred * 2) / 2
        coords = jax.random.uniform(jax.random.split(key)[0],
                                    (6, num_sampled, 2))
        logits = _sample_points_batch(pred, coords)

        _, idx = jax.lax.top_k(-jnp.abs(logits), num_uncertain)
        via_topk = jnp.take_along_axis(coords, idx[..., None], axis=1)

        _, xs, ys = jax.lax.sort(
            (jnp.abs(logits), coords[..., 0], coords[..., 1]),
            dimension=-1, is_stable=True, num_keys=1,
        )
        via_varsort = jnp.stack(
            [xs[:, :num_uncertain], ys[:, :num_uncertain]], axis=-1
        )
        assert bool((via_topk == via_varsort).all()), (
            f'varsort != topk (tie_quantize={tie_quantize})'
        )

def test_env_knobs_read_at_trace_time(rng, monkeypatch):
    """ADVICE r4 / VERDICT r5 #7: WISTPU_PRED_SAMPLER / WISTPU_UNCERTAIN
    must follow the env-read-at-use rule — flipping the env var AFTER the
    module is imported changes which branch the next trace takes (an
    import-time binding would silently ignore the flip)."""
    from weed_instance_segmentation_tpu.losses import criterion

    monkeypatch.setenv('WISTPU_PRED_SAMPLER', 'gather')
    assert criterion._pred_sampler() == 'gather'
    monkeypatch.setenv('WISTPU_PRED_SAMPLER', 'einsum')
    assert criterion._pred_sampler() == 'einsum'
    monkeypatch.setenv('WISTPU_UNCERTAIN', 'topk')
    assert criterion._uncertain_select() == 'topk'
    monkeypatch.delenv('WISTPU_UNCERTAIN')
    assert criterion._uncertain_select() == 'varsort'

    # and the knob actually steers the traced computation: the two sampler
    # branches emit different jaxprs for the same inputs
    pred = jnp.asarray(rng.standard_normal((2, 8, 8)), jnp.float32)
    coords = jnp.asarray(rng.uniform(size=(2, 16, 2)), jnp.float32)

    # a FRESH function per setting: make_jaxpr shares jit's trace cache
    # (keyed on function identity + avals), so re-tracing the same object
    # would return the first trace — the documented "a cached compile keeps
    # the value it was traced with" semantics, not a knob failure
    def make_sample():
        def sample(p, c):
            if criterion._pred_sampler() == 'einsum':
                return criterion._sample_points_einsum(p, c)
            return criterion._sample_points_batch(p, c)
        return sample

    monkeypatch.setenv('WISTPU_PRED_SAMPLER', 'einsum')
    jaxpr_einsum = str(jax.make_jaxpr(make_sample())(pred, coords))
    monkeypatch.setenv('WISTPU_PRED_SAMPLER', 'gather')
    jaxpr_gather = str(jax.make_jaxpr(make_sample())(pred, coords))
    assert jaxpr_einsum != jaxpr_gather
