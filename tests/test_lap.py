"""Device-side LAP vs scipy (the reference matcher's solver)."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment as scipy_lsa

import jax
import jax.numpy as jnp

from weed_instance_segmentation_tpu.ops.lap import linear_sum_assignment


@pytest.mark.parametrize('seed', range(8))
@pytest.mark.parametrize('shape', [(5, 5), (7, 12), (1, 4), (20, 20), (15, 40)])
def test_matches_scipy_cost(seed, shape):
    rng = np.random.default_rng(seed)
    cost = rng.standard_normal(shape).astype(np.float32) * 10
    rows, cols = scipy_lsa(cost)
    want = cost[rows, cols].sum()

    col4row = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    assert len(set(col4row.tolist())) == shape[0], 'assignment must be a matching'
    got = cost[np.arange(shape[0]), col4row].sum()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_jittable_and_vmappable():
    rng = np.random.default_rng(0)
    costs = rng.standard_normal((4, 6, 10)).astype(np.float32)
    batched = jax.jit(jax.vmap(linear_sum_assignment))(jnp.asarray(costs))
    for b in range(4):
        rows, cols = scipy_lsa(costs[b])
        want = costs[b][rows, cols].sum()
        got = costs[b][np.arange(6), np.asarray(batched[b])].sum()
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_large_constant_rows():
    """Padded targets (constant-cost rows) must not break optimality of the
    real rows — the matcher pads instances this way."""
    rng = np.random.default_rng(1)
    real = rng.standard_normal((3, 8)).astype(np.float32)
    pad = np.full((5, 8), 1e6, dtype=np.float32)
    cost = np.concatenate([real, pad], 0)
    col4row = np.asarray(linear_sum_assignment(jnp.asarray(cost)))
    rows, cols = scipy_lsa(cost)
    np.testing.assert_allclose(
        cost[np.arange(8), col4row].sum(), cost[rows, cols].sum(), rtol=1e-5
    )


@pytest.mark.parametrize('shape', [(3, 100), (5, 5), (7, 12), (1, 4), (15, 40)])
def test_static_loops_match_dynamic(shape):
    """The fori_loop (static trip count) formulation must produce the same
    optimal cost as the while_loop one — including the overfit-gate shape
    (3, 100) where the dynamic form hit a backend runtime fault."""
    from weed_instance_segmentation_tpu.ops.lap import _linear_sum_assignment_jv

    for seed in range(6):
        rng = np.random.default_rng(seed)
        cost = rng.standard_normal(shape).astype(np.float32) * 10
        rows, cols = scipy_lsa(cost)
        want = cost[rows, cols].sum()
        got_static = np.asarray(
            jax.jit(lambda c: _linear_sum_assignment_jv(c, static_loops=True))(
                jnp.asarray(cost)
            )
        )
        assert len(set(got_static.tolist())) == shape[0]
        np.testing.assert_allclose(
            cost[np.arange(shape[0]), got_static].sum(), want, rtol=1e-5
        )
