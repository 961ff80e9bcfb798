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

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize_distributed() -> bool:
    """Multi-host bring-up (SURVEY.md §5.8; BASELINE config 5 is v5e-16,
    i.e. >1 host). Gated on env so single-host runs are untouched:

    - ``WISTPU_COORDINATOR=host:port`` plus ``WISTPU_NUM_PROCESSES`` and
      ``WISTPU_PROCESS_ID`` → explicit ``jax.distributed.initialize`` (the
      form the 2-simulated-host CPU test uses);
    - ``WISTPU_MULTIHOST=auto`` → argless initialize (TPU pod metadata
      autodetection).

    Must run before any JAX backend use. Returns True when this process is
    part of a multi-process cluster. Idempotent.
    """
    from jax._src import distributed as _dist

    if _dist.global_state.client is not None:  # already initialized
        return jax.process_count() > 1
    coordinator = os.environ.get('WISTPU_COORDINATOR')
    if coordinator:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=int(os.environ['WISTPU_NUM_PROCESSES']),
            process_id=int(os.environ['WISTPU_PROCESS_ID']),
        )
        return jax.process_count() > 1
    if os.environ.get('WISTPU_MULTIHOST') == 'auto':
        jax.distributed.initialize()
        return jax.process_count() > 1
    return False


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
    """Place every array in the batch with the leading axis sharded on
    'data'.

    Single-process: plain ``device_put`` of the host-global batch (leading
    axis must divide by the mesh size). Multi-process: each host passes its
    LOCAL slice of the global batch (the loader's per-host shard) and the
    global array is assembled from process-local data — rows never leave
    the host that loaded them; only gradients cross hosts (over DCN/ICI via
    the GSPMD all-reduce in the jitted step).
    """
    sharding = batch_sharding(mesh)
    multiprocess = jax.process_count() > 1
    local_devices = sum(d.process_index == jax.process_index() for d in mesh.devices.flat)
    out = {}
    for key, value in batch.items():
        if hasattr(value, 'shape') and value.ndim >= 1:
            n_shards = local_devices if multiprocess else mesh.shape['data']
            if value.shape[0] % max(n_shards, 1) != 0:
                raise ValueError(
                    f'batch axis {value.shape[0]} of {key!r} not divisible by '
                    f'{n_shards} local data shards'
                )
            if multiprocess:
                out[key] = jax.make_array_from_process_local_data(
                    sharding, np.asarray(value)
                )
            else:
                out[key] = jax.device_put(value, sharding)
        else:
            out[key] = value
    return out


def replicate_tree(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh.

    Multi-process: every host holds identical values (deterministic init /
    restored checkpoint), so each addressable device can be fed from the
    local copy via ``make_array_from_callback`` — no cross-host transfer.
    """
    sharding = replicated(mesh)
    if jax.process_count() > 1:
        def _rep(leaf):
            arr = np.asarray(leaf)
            return jax.make_array_from_callback(arr.shape, sharding, lambda idx: arr[idx])
        return jax.tree_util.tree_map(_rep, tree)
    return jax.device_put(tree, sharding)
