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
