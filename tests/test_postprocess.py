"""Post-processing parity vs HF ``post_process_instance_segmentation``
(image_processing_mask2former.py:1069-1188) on random logits.

Ordering note: HF iterates queries in ``torch.topk(sorted=False)`` order —
an ATen quickselect partition order (implementation detail, changes across
torch versions). We use sorted-descending ``lax.top_k`` order instead
(documented deviation, SURVEY.md §7.3.5), so comparisons here are
order-invariant: segments matched by (label, score), flattened id maps
compared on pixels covered by ≤1 instance (overlap pixels are
overwrite-order-dependent on both sides).
"""

from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from weed_instance_segmentation_tpu.processing.postprocess import (
    post_process_instance_arrays, post_process_instance_segmentation,
)

transformers = pytest.importorskip('transformers')
from transformers.models.mask2former.image_processing_mask2former import (  # noqa: E402
    Mask2FormerImageProcessor as HFProcessor,
)


def _random_outputs(rng, b=2, q=10, c=3, h=16, w=24):
    class_logits = rng.standard_normal((b, q, c + 1)).astype(np.float32) * 2
    mask_logits = rng.standard_normal((b, q, h, w)).astype(np.float32) * 2
    return class_logits, mask_logits


def _segments_as_masks(result):
    """{(label_id, score): bool mask} per segment from a flattened result."""
    seg = np.asarray(result['segmentation'])
    return {
        (s['label_id'], s['score']): seg == s['id'] for s in result['segments_info']
    }


@pytest.mark.parametrize('threshold', [0.5, 0.1])
def test_matches_hf(rng, threshold):
    class_logits, mask_logits = _random_outputs(rng)
    target_sizes = [(37, 53), (64, 64)]

    hf = HFProcessor()
    want = hf.post_process_instance_segmentation(
        SimpleNamespace(
            class_queries_logits=torch.from_numpy(class_logits),
            masks_queries_logits=torch.from_numpy(mask_logits),
        ),
        threshold=threshold,
        target_sizes=target_sizes,
    )
    got = post_process_instance_segmentation(
        SimpleNamespace(
            class_queries_logits=class_logits,
            masks_queries_logits=mask_logits,
        ),
        threshold=threshold,
        target_sizes=target_sizes,
    )

    for g, w_ in zip(got, want):
        w_['segmentation'] = w_['segmentation'].numpy()
        # same segment set by (label, score)
        g_keys = sorted((s['label_id'], s['score']) for s in g['segments_info'])
        w_keys = sorted((s['label_id'], s['score']) for s in w_['segments_info'])
        assert len(g_keys) == len(w_keys)
        np.testing.assert_allclose(np.asarray(g_keys), np.asarray(w_keys), atol=2e-6)
        # background (pixels covered by no kept instance) is order-invariant
        np.testing.assert_array_equal(g['segmentation'] == -1, w_['segmentation'] == -1)
        # the flattened id maps themselves differ on multiply-covered pixels
        # (overwrite order); full per-instance mask parity is asserted in
        # test_binary_maps_match_hf, which is overlap-independent.


def test_binary_maps_match_hf(rng):
    class_logits, mask_logits = _random_outputs(rng, b=1)
    hf = HFProcessor()
    want = hf.post_process_instance_segmentation(
        SimpleNamespace(
            class_queries_logits=torch.from_numpy(class_logits),
            masks_queries_logits=torch.from_numpy(mask_logits),
        ),
        threshold=0.3, target_sizes=[(20, 30)], return_binary_maps=True,
    )
    got = post_process_instance_segmentation(
        SimpleNamespace(class_queries_logits=class_logits, masks_queries_logits=mask_logits),
        threshold=0.3, target_sizes=[(20, 30)], return_binary_maps=True,
    )
    w_maps = want[0]['segmentation'].numpy()
    g_maps = got[0]['segmentation']
    assert g_maps.shape == w_maps.shape
    # order-invariant: every HF instance mask appears exactly once in ours
    used = set()
    for wm in w_maps:
        hit = [k for k in range(len(g_maps)) if k not in used and (g_maps[k] == wm).all()]
        assert hit, 'missing instance mask'
        used.add(hit[0])


def test_jit_arrays_batched(rng):
    class_logits, mask_logits = _random_outputs(rng, b=3)
    res = post_process_instance_arrays(
        jnp.asarray(class_logits), jnp.asarray(mask_logits), (32, 48), 0.5
    )
    assert res.segmentation.shape == (3, 32, 48)
    assert res.valid.shape == (3, 10)
    # ids are contiguous 0..k-1 over kept slots
    for i in range(3):
        ids = np.asarray(res.segment_ids[i])
        kept = ids[ids >= 0]
        np.testing.assert_array_equal(np.sort(kept), np.arange(len(kept)))
    # all slot scores are finite probabilities
    scores = np.asarray(res.scores)
    assert ((scores >= 0) & (scores <= 1)).all()


def _naive_oracle(class_logits, mask_logits, target_size, threshold):
    """Sequential numpy transcription of HF:1122-1177 with OUR top-k order
    (sorted descending), pinning the optimized device path exactly —
    including overwrite order on multiply-covered pixels, which the
    order-invariant HF comparisons above cannot."""
    from weed_instance_segmentation_tpu.ops.resize import (
        interpolate_bilinear_np, interpolate_nearest_np,
    )

    q, cp1 = class_logits.shape
    c = cp1 - 1
    up = interpolate_bilinear_np(mask_logits, (384, 384))
    e = np.exp(class_logits - class_logits.max(-1, keepdims=True))
    scores = (e / e.sum(-1, keepdims=True))[:, :-1]
    flat = scores.reshape(-1)
    order = np.argsort(-flat, kind='stable')[:q]
    labels = order % c
    qi = order // c
    seg = np.full(target_size, -1, np.int32)
    infos = []
    next_id = 0
    for slot in range(q):
        m = up[qi[slot]]
        b = (m > 0).astype(np.float32)
        ms = (1 / (1 + np.exp(-m)) * b).sum() / (b.sum() + 1e-6)
        score = flat[order[slot]] * ms
        bt = interpolate_nearest_np(b, target_size) == 1.0
        if score >= threshold and bt.any():
            seg[bt] = next_id
            infos.append((next_id, int(labels[slot]), float(score)))
            next_id += 1
    return seg, infos


@pytest.mark.parametrize('target_size', [(20, 30), (384, 384), (500, 700)])
def test_arrays_match_naive_oracle_exactly(rng, target_size):
    class_logits, mask_logits = _random_outputs(rng, b=2, q=12, c=3)
    res = post_process_instance_arrays(
        jnp.asarray(class_logits), jnp.asarray(mask_logits), target_size, 0.3
    )
    res_nm = post_process_instance_arrays(
        jnp.asarray(class_logits), jnp.asarray(mask_logits), target_size, 0.3,
        with_masks=False,
    )
    assert res_nm.masks is None
    for i in range(2):
        seg, infos = _naive_oracle(class_logits[i], mask_logits[i], target_size, 0.3)
        np.testing.assert_array_equal(np.asarray(res.segmentation[i]), seg)
        np.testing.assert_array_equal(np.asarray(res_nm.segmentation[i]), seg)
        valid = np.asarray(res.valid[i])
        got = [
            (int(res.segment_ids[i][j]), int(res.labels[i][j]),
             float(res.scores[i][j]))
            for j in range(len(valid)) if valid[j]
        ]
        assert len(got) == len(infos)
        for (gid, gl, gs), (wid, wl, ws) in zip(got, infos):
            assert (gid, gl) == (wid, wl)
            assert gs == pytest.approx(ws, abs=2e-6)
        # returned masks at target size match the oracle's kept-mask rasters
        for j in range(len(valid)):
            if valid[j]:
                assert np.asarray(res.masks[i][j]).shape == target_size


def test_resize_modes_agree(rng, monkeypatch):
    """Ledger D13: the default separable-matmul 384² upsample must produce
    the same kept set / id map as the exact-HF gather form, with scores
    within the matmul accumulation tolerance (≤2e-6 on logit scale)."""
    class_logits, mask_logits = _random_outputs(rng, b=2, q=12, c=3, h=20, w=20)
    results = {}
    # 'fused' is the Pallas single-pass kernel (ops/postprocess_kernel.py);
    # on CPU it runs under the Pallas interpreter. Its two HIGHEST-precision
    # rank-2 dots use the same tap matrices as 'matmul', so it is held to
    # the same ≤2e-6 score band and exact kept-set/id-map equality.
    for mode in ('matmul', 'gather', 'fused'):
        monkeypatch.setenv('WISTPU_POSTPROC_RESIZE', mode)
        results[mode] = post_process_instance_arrays(
            jnp.asarray(class_logits), jnp.asarray(mask_logits), (37, 53), 0.3
        )
    # Exact kept-set / id-map / mask equality is a CPU-interpreter bar
    # (ADVICE r4): 'matmul' sums the upsample in one einsum while 'fused'
    # runs two sequential rank-2 dots, so a logit landing exactly on 0 after
    # a different f32 summation order could flip a bin on real hardware.
    # The seeded CPU CI has no such ties; off-CPU this test would need a
    # measured flip budget instead of array_equal.
    m = results['matmul']
    for other in ('gather', 'fused'):
        g = results[other]
        np.testing.assert_array_equal(np.asarray(m.valid), np.asarray(g.valid))
        np.testing.assert_array_equal(np.asarray(m.segmentation),
                                      np.asarray(g.segmentation))
        np.testing.assert_array_equal(np.asarray(m.segment_ids),
                                      np.asarray(g.segment_ids))
        np.testing.assert_allclose(np.asarray(m.scores), np.asarray(g.scores),
                                   atol=2e-6)
        np.testing.assert_array_equal(np.asarray(m.masks), np.asarray(g.masks))
