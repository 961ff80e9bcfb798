"""Data-parallel mesh + sharded train step on the 8-device virtual CPU mesh
(SURVEY.md §4 "multi-chip without a cluster")."""

import sys
import os

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from weed_instance_segmentation_tpu.parallel.mesh import (
    batch_sharding, create_mesh, replicate_tree, shard_batch,
)


@pytest.fixture(scope='module')
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices (conftest XLA_FLAGS)')
    return create_mesh(8)


def test_mesh_shapes(mesh8):
    assert dict(mesh8.shape) == {'data': 8}
    assert create_mesh(4).shape['data'] == 4
    with pytest.raises(ValueError):
        create_mesh(1024)


def test_shard_batch_layout(mesh8):
    batch = {
        'pixel_values': np.zeros((8, 3, 32, 32), np.float32),
        'meta': 'not-an-array',
    }
    out = shard_batch(batch, mesh8)
    assert out['meta'] == 'not-an-array'
    sharding = out['pixel_values'].sharding
    assert sharding == batch_sharding(mesh8)
    # each device holds 1/8 of the batch axis
    shard_shapes = {s.data.shape for s in out['pixel_values'].addressable_shards}
    assert shard_shapes == {(1, 3, 32, 32)}


def test_shard_batch_rejects_indivisible(mesh8):
    with pytest.raises(ValueError):
        shard_batch({'x': np.zeros((3, 4), np.float32)}, mesh8)


def test_replicated_params(mesh8):
    tree = {'w': np.ones((4, 4), np.float32)}
    out = replicate_tree(tree, mesh8)
    assert len(out['w'].sharding.device_set) == 8


def test_full_train_step_on_mesh():
    """The graft-entry dry run: full model + loss + AdamW over the mesh."""
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


# ---- 2-D ('data', 'model') mesh: weight sharding over the model axis ----

from jax.sharding import PartitionSpec as P  # noqa: E402

from weed_instance_segmentation_tpu.parallel.mesh import (  # noqa: E402
    model_spec, shard_tree,
)


def test_model_axis_mesh_shapes(mesh8):
    mesh = create_mesh(4, 2)
    assert dict(mesh.shape) == {'data': 4, 'model': 2}
    # 'model' is the minor axis: a model group is two adjacent devices
    assert mesh.devices[0, 0].id != mesh.devices[0, 1].id
    with pytest.raises(ValueError):
        create_mesh(8, 2)  # 16 > 8 visible devices
    # mp=1 keeps the 1-D reference-parity mesh
    assert create_mesh(8, 1).axis_names == ('data',)


def test_model_spec_rule():
    # largest divisible axis gets 'model'
    assert model_spec((128, 64), 2, 0) == P('model', None)
    assert model_spec((64, 128), 2, 0) == P(None, 'model')
    # no divisible axis (odd dims) → replicate
    assert model_spec((63, 31), 2, 0) == P()
    # below the size threshold → replicate
    assert model_spec((64,), 2, 2 ** 14) == P()
    # scalars (opt-state counters) → replicate
    assert model_spec((), 2, 0) == P()


def test_shard_tree_placement(mesh8):
    mesh = create_mesh(4, 2)
    tree = {
        'w': np.arange(64 * 32, dtype=np.float32).reshape(64, 32),
        'b': np.ones((32,), np.float32),
        'step': np.int32(3),
    }
    out = shard_tree(tree, mesh, min_weight_size=256)
    assert out['w'].sharding.spec == P('model', None)
    # each device holds half the rows (replicated over 'data')
    assert {s.data.shape for s in out['w'].addressable_shards} == {(32, 32)}
    assert out['b'].sharding.spec == P()
    np.testing.assert_array_equal(np.asarray(out['w']), tree['w'])
    # 1-D mesh degenerates to full replication
    rep = shard_tree(tree, mesh8, min_weight_size=0)
    assert rep['w'].sharding.spec == P()


def test_dp_vs_dp_mp_equivalence():
    """6 train steps (GA=2 → three real AdamW applies) must match between
    the 1-D dp8 mesh and the 2-D dp4×mp2 mesh: same global batch, same
    seeds, weight sharding only changes which collectives GSPMD inserts.
    The loss trajectory is the equivalence claim (post-apply losses see the
    updated params); the params check uses an atol of ~2·lr because AdamW
    normalizes noise-sized gradients to full ±lr steps — zero-init biases
    flip step sign on reduction-order noise — while a genuine sharding bug
    (wrong shard slice) produces O(weight-scale) ≈ 0.1 diffs."""
    if len(jax.devices()) < 8:
        pytest.skip('needs 8 virtual devices')
    import jax.numpy as jnp

    from weed_instance_segmentation_tpu.engine.model_utils import init_params
    from weed_instance_segmentation_tpu.engine.steps import (
        create_train_state, make_train_step,
    )
    from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
    from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

    cfg = Mask2FormerConfig.tiny_test(num_labels=3)
    model = Mask2Former(cfg)
    # host-side copy: the donated train step deletes its input buffers, and
    # both runs must start from the same initial weights
    params = jax.tree_util.tree_map(
        np.asarray, init_params(model, cfg, image_hw=(64, 64))
    )

    b, h, w, n_inst = 8, 64, 64, 4
    rng = np.random.default_rng(0)
    batch_np = {
        'pixel_values': rng.standard_normal((b, 3, h, w)).astype(np.float32),
        'pixel_mask': np.ones((b, h, w), np.float32),
        'mask_labels': (rng.random((b, n_inst, h, w)) > 0.7).astype(np.uint8),
        'class_labels': rng.integers(0, 3, (b, n_inst)).astype(np.int32),
        'instance_valid': np.ones((b, n_inst), np.float32),
        'sample_valid': np.ones((b,), np.float32),
    }

    def run(mesh, min_weight_size):
        state, tx = create_train_state(params, 1e-3, gradient_accumulation=2)
        state = shard_tree(state, mesh, min_weight_size=min_weight_size)
        step = make_train_step(model, cfg, tx)
        losses = []
        for _ in range(6):
            state, loss = step(state, shard_batch(batch_np, mesh), jax.random.PRNGKey(7))
            losses.append(float(loss))
        return losses, jax.device_get(state.params)

    losses_dp, params_dp = run(create_mesh(8), min_weight_size=0)
    losses_mp, params_mp = run(create_mesh(4, 2), min_weight_size=256)
    np.testing.assert_allclose(losses_dp, losses_mp, rtol=1e-3)
    jax.tree_util.tree_map(
        lambda a, b_: np.testing.assert_allclose(a, b_, rtol=5e-3, atol=7e-3),
        params_dp, params_mp,
    )
