"""Rematerialization (config.REMAT): same loss/grads, less memory."""

import numpy as np

import jax
import jax.numpy as jnp

from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former


def test_remat_grads_identical(rng):
    cfg = Mask2FormerConfig.tiny_test(num_labels=3)
    x = jnp.asarray(rng.standard_normal((1, 3, 64, 64)), jnp.float32)

    m0 = Mask2Former(cfg, remat=False)
    params = m0.init(jax.random.PRNGKey(0), x, deterministic=True)['params']

    def loss(m, p):
        out = m.apply({'params': p}, x, deterministic=True)
        return (out.masks_queries_logits ** 2).mean() + (out.class_queries_logits ** 2).mean()

    l0, g0 = jax.value_and_grad(lambda p: loss(m0, p))(params)
    for mode in (True, 'encoder'):
        m1 = Mask2Former(cfg, remat=mode)
        l1, g1 = jax.value_and_grad(lambda p: loss(m1, p))(params)
        assert float(jnp.abs(l0 - l1)) < 1e-6, mode
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5, err_msg=f'remat={mode}'
            )
