"""The hybrid MSDA custom_vjp (ops/msda_select.py): packed-formulation
backward must produce the same gradients as autodiff of the fused primal
(both formulations compute the same function, so their VJPs must agree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from weed_instance_segmentation_tpu.ops.msda_fused import msda_fused
from weed_instance_segmentation_tpu.ops.msda_select import _msda_hybrid, msda

SHAPES = ((12, 16), (6, 8), (3, 4))
L = sum(h * w for h, w in SHAPES)
B, Q, H, D, P = 2, 20, 4, 8, 4


@pytest.fixture
def inputs(rng):
    value = jnp.asarray(rng.standard_normal((B, L, H, D)), jnp.float32)
    loc = jnp.asarray(rng.uniform(-0.05, 1.05, (B, Q, H, len(SHAPES), P, 2)), jnp.float32)
    w = jax.nn.softmax(
        jnp.asarray(rng.standard_normal((B, Q, H, len(SHAPES), P)), jnp.float32), axis=-1
    )
    return value, loc, w


def test_hybrid_primal_matches_dispatch(inputs):
    """Per-dtype primal: f32 → packed (fastest f32 forward), bf16 → fused."""
    from weed_instance_segmentation_tpu.ops.msda_packed import msda_packed

    value, loc, w = inputs
    np.testing.assert_allclose(
        np.asarray(_msda_hybrid(value, SHAPES, loc, w)),
        np.asarray(msda_packed(value, SHAPES, loc, w)),
        atol=1e-6,
    )
    vb = value.astype(jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(_msda_hybrid(vb, SHAPES, loc, w), np.float32),
        np.asarray(msda_fused(vb, SHAPES, loc, w), np.float32),
        atol=1e-6,
    )


def test_hybrid_grads_match_fused_autodiff(inputs):
    value, loc, w = inputs
    cot = jnp.asarray(
        np.random.default_rng(7).standard_normal((B, Q, H * D)), jnp.float32
    )

    def scalar(op):
        return lambda v, l, a: (op(v, SHAPES, l, a) * cot).sum()

    g_ref = jax.grad(scalar(msda_fused), argnums=(0, 1, 2))(value, loc, w)
    g_hyb = jax.grad(scalar(_msda_hybrid), argnums=(0, 1, 2))(value, loc, w)
    for a, b, name in zip(g_ref, g_hyb, ('value', 'locations', 'weights')):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-4,
            err_msg=f'grad mismatch: {name}',
        )


def test_hybrid_under_remat_and_jit(inputs):
    value, loc, w = inputs

    @jax.jit
    def f(v, l, a):
        g = jax.checkpoint(lambda v_: (_msda_hybrid(v_, SHAPES, l, a) ** 2).sum())
        return jax.grad(g)(v)

    out = f(value, loc, w)
    assert np.isfinite(np.asarray(out)).all()


def test_select_dispatch(inputs):
    value, loc, w = inputs
    out_f32 = msda(value, SHAPES, loc, w)
    out_bf16 = msda(value.astype(jnp.bfloat16), SHAPES, loc, w)
    np.testing.assert_allclose(
        np.asarray(out_bf16, np.float32), np.asarray(out_f32), atol=0.05
    )


def test_einsum_value_grad_matches_autodiff(inputs):
    """The scatter-free value transpose (ops/msda_transpose.py) must equal
    AD of the packed formulation, incl. out-of-range sampling locations
    and the chunked sample axis."""
    from weed_instance_segmentation_tpu.ops.msda_packed import msda_packed
    from weed_instance_segmentation_tpu.ops.msda_transpose import (
        msda_value_grad_einsum,
    )

    value, loc, w = inputs
    cot = jnp.asarray(
        np.random.default_rng(3).standard_normal((B, Q, H * D)), jnp.float32
    )
    _, vjp = jax.vjp(lambda v: msda_packed(v, SHAPES, loc, w), value)
    gv_ref, = vjp(cot)
    gv = msda_value_grad_einsum(SHAPES, loc, w, cot, jnp.float32, chunk=16)
    np.testing.assert_allclose(
        np.asarray(gv), np.asarray(gv_ref), rtol=2e-4, atol=2e-5
    )
