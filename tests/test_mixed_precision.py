"""bf16 compute path (WISTPU_COMPUTE_DTYPE) — loss consistency vs f32.

The mixed-precision design keeps params in f32 and casts compute
(models/mask2former.py dtype plumbing). The guard here: a few full train
steps in bf16 stay close to the f32 trajectory on the tiny config, and the
forward logits agree to bf16 resolution — catches a silently-wrong cast
(e.g. accumulating in bf16) that a smoke test would miss.
"""

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.engine.model_utils import init_params
from weed_instance_segmentation_tpu.engine.steps import (
    create_train_state, make_forward_fn, make_train_step,
)
from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former


def _batch(b=2, h=64, w=64, n=4, seed=0):
    r = np.random.default_rng(seed)
    masks = np.zeros((b, n, h, w), np.float32)
    for k in range(b):
        for j in range(n):
            y, x = r.integers(0, h - 16, size=2)
            masks[k, j, y : y + 16, x : x + 16] = 1.0
    return {
        'pixel_values': jnp.asarray(r.standard_normal((b, 3, h, w)), jnp.float32),
        'pixel_mask': jnp.ones((b, h, w), jnp.float32),
        'mask_labels': jnp.asarray(masks),
        'class_labels': jnp.asarray(r.integers(0, 3, (b, n)), jnp.int32),
        'instance_valid': jnp.ones((b, n), jnp.float32),
        'sample_valid': jnp.ones((b,), jnp.float32),
    }


def test_bf16_training_tracks_f32():
    cfg = Mask2FormerConfig.tiny_test(num_labels=3)
    model32 = Mask2Former(cfg, dtype=jnp.float32)
    model16 = Mask2Former(cfg, dtype=jnp.bfloat16)
    params = init_params(model32, cfg, image_hw=(64, 64))

    losses = {}
    for name, model in (('f32', model32), ('bf16', model16)):
        state, tx = create_train_state(
            jax.tree.map(jnp.array, params), 1e-4, gradient_accumulation=2
        )
        step = make_train_step(model, cfg, tx)
        key = jax.random.PRNGKey(0)
        seq = []
        for i in range(4):
            state, loss = step(state, _batch(seed=i), key)
            seq.append(float(loss))
        losses[name] = seq
        # params must STAY f32 under mixed precision (master weights)
        assert all(
            leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(state.params)
        ), f'{name}: params left float32'

    # same trajectory within bf16 resolution (~3 decimal digits, losses O(40))
    np.testing.assert_allclose(losses['bf16'], losses['f32'], rtol=2e-2)
    assert np.isfinite(losses['bf16']).all()


def test_bf16_forward_logits_close_to_f32():
    cfg = Mask2FormerConfig.tiny_test(num_labels=3)
    model32 = Mask2Former(cfg, dtype=jnp.float32)
    model16 = Mask2Former(cfg, dtype=jnp.bfloat16)
    params = init_params(model32, cfg, image_hw=(64, 64))
    x = _batch()['pixel_values']
    out32 = make_forward_fn(model32)(params, x)
    out16 = make_forward_fn(model16)(params, x)
    # class logits are O(1); bf16 rounding compounds through 10 decoder
    # layers (measured max |Δ| ≈ 0.31 on the tiny config) — gate at 0.5 abs
    # plus near-perfect correlation, which a wrong cast would destroy
    a = np.asarray(out16.class_queries_logits, np.float32).ravel()
    b = np.asarray(out32.class_queries_logits).ravel()
    np.testing.assert_allclose(a, b, atol=0.5)
    assert np.corrcoef(a, b)[0, 1] > 0.995
    assert out16.masks_queries_logits.dtype in (jnp.bfloat16, jnp.float32)
