"""Test config: run JAX on a virtual 8-device CPU mesh (SURVEY.md §4).

Must set env vars before jax is imported anywhere.
"""

import os

# Force CPU: the image's sitecustomize pre-sets JAX_PLATFORMS=axon (remote
# TPU tunnel), so an env override must be unconditional AND mirrored into
# jax.config (the axon plugin registers before this file runs).
os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = flags + ' --xla_force_host_platform_device_count=8'
# Float32 matmuls/convs for parity tests: without this the CPU backend runs
# convolutions at reduced precision (~2e-3 error vs exact). Set both the env
# var and the config (a pytest plugin may import jax before this file runs).
os.environ.setdefault('JAX_DEFAULT_MATMUL_PRECISION', 'highest')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_default_matmul_precision', 'highest')

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
