"""Device mesh + sharding helpers (SURVEY.md §2.3).

The reference is single-device (train.py:74 ``cuda if available``); the one
required scale-out strategy for the TPU build is data parallelism over ICI
(SURVEY.md §2.3 row 1): a 1-D ``('data',)`` mesh, batches sharded on it,
parameters replicated, gradients all-reduced by XLA's GSPMD partitioner
(no hand-written collectives — the jitted train step is written once and
partitioned by sharding annotations).

The mesh is built 'data'-major so tensor/pipeline axes can be added later
without changing call sites (axis names are the public contract).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data_parallel: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the visible devices.

    ``data_parallel=None`` uses every device; an explicit value must divide
    the device count (remaining devices are left idle — replicas must be
    equal-sized for GSPMD).
    """
    devices = jax.devices()
    n = data_parallel or len(devices)
    if n > len(devices):
        raise ValueError(f'data_parallel={n} exceeds {len(devices)} visible devices')
    return Mesh(np.asarray(devices[:n]).reshape(n), axis_names=('data',))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over 'data', everything else replicated."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """device_put every array in the batch with the leading axis sharded on
    'data'. Batch size must be divisible by the mesh size."""
    sharding = batch_sharding(mesh)
    out = {}
    for key, value in batch.items():
        if hasattr(value, 'shape') and value.ndim >= 1:
            if value.shape[0] % mesh.shape['data'] != 0:
                raise ValueError(
                    f'batch axis {value.shape[0]} of {key!r} not divisible by '
                    f"data mesh size {mesh.shape['data']}"
                )
            out[key] = jax.device_put(value, sharding)
        else:
            out[key] = value
    return out


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.device_put(tree, sharding)
