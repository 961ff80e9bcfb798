"""Device mesh + sharding helpers (SURVEY.md §2.3).

The reference is single-device (train.py:74 ``cuda if available``); the one
required scale-out strategy for the TPU build is data parallelism over ICI
(SURVEY.md §2.3 row 1): a 1-D ``('data',)`` mesh, batches sharded on it,
parameters replicated, gradients all-reduced by XLA's GSPMD partitioner
(no hand-written collectives — the jitted train step is written once and
partitioned by sharding annotations).

The mesh is built 'data'-major so tensor/pipeline axes can be added later
without changing call sites (axis names are the public contract). A second
``'model'`` axis is available (``create_mesh(dp, mp)`` + ``shard_tree``):
parameters and optimizer state get weight sharding over it (largest
divisible axis per leaf — FSDP/TP hybrid; XLA's SPMD partitioner decides
per-matmul whether to all-gather the weight or shard the computation).
``'model'`` is the minor mesh axis, so its collectives ride adjacent-chip
ICI links within a data replica.
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
    if _distributed_client_active():  # already initialized
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


def _distributed_client_active() -> bool:
    """Whether ``jax.distributed.initialize`` already ran in this process.
    Prefers the public ``is_initialized`` (jax ≥0.4.34); the private
    global-state probe is a guarded fallback for older versions."""
    is_init = getattr(jax.distributed, 'is_initialized', None)
    if callable(is_init):
        return bool(is_init())
    try:
        from jax._src import distributed as _dist

        return _dist.global_state.client is not None
    except Exception:
        return False


def create_mesh(data_parallel: int | None = None,
                model_parallel: int | None = None) -> Mesh:
    """Device mesh over the visible devices.

    ``model_parallel`` ≤ 1 (the default, and the reference-parity config)
    gives the 1-D ``('data',)`` mesh; ``data_parallel=None`` uses every
    device. ``model_parallel`` > 1 gives a 2-D ``('data', 'model')`` mesh
    with 'model' minor (model-group collectives stay on adjacent chips);
    batches shard on 'data' only, weights shard on 'model' via
    ``shard_tree``. An explicit dp×mp product must fit the device count
    (remaining devices are left idle — replicas must be equal-sized for
    GSPMD).
    """
    devices = jax.devices()
    mp = model_parallel or 1
    if mp <= 1:
        n = data_parallel or len(devices)
        if n > len(devices):
            raise ValueError(f'data_parallel={n} exceeds {len(devices)} visible devices')
        return Mesh(np.asarray(devices[:n]).reshape(n), axis_names=('data',))
    dp = data_parallel or len(devices) // mp
    if dp * mp > len(devices) or dp < 1:
        raise ValueError(
            f'mesh {dp}x{mp} exceeds {len(devices)} visible devices'
        )
    return Mesh(
        np.asarray(devices[: dp * mp]).reshape(dp, mp),
        axis_names=('data', 'model'),
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over 'data', everything else replicated."""
    return NamedSharding(mesh, P('data'))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _local_data_shards(mesh: Mesh) -> int:
    """Number of distinct 'data'-axis coordinates this process's devices
    cover — the batch rows a host feeds (batch is replicated over 'model',
    so model-axis neighbors don't add rows)."""
    grid = mesh.devices
    me = jax.process_index()
    if grid.ndim == 1:
        return sum(d.process_index == me for d in grid)
    return sum(any(d.process_index == me for d in row) for row in grid)


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
    out = {}
    for key, value in batch.items():
        if hasattr(value, 'shape') and value.ndim >= 1:
            n_shards = _local_data_shards(mesh) if multiprocess else mesh.shape['data']
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
    return _place_tree(tree, jax.tree_util.tree_map(lambda _: replicated(mesh), tree))


def model_spec(shape, model_size: int, min_weight_size: int) -> P:
    """Weight-sharding rule for one leaf: split the largest axis divisible
    by the model-axis size; leaves too small to be worth a collective (or
    with no divisible axis — e.g. biases, layernorm scales) replicate."""
    if model_size <= 1 or int(np.prod(shape, dtype=np.int64)) < min_weight_size:
        return P()
    best = None
    for i, d in enumerate(shape):
        if d % model_size == 0 and (best is None or d > shape[best]):
            best = i
    if best is None:
        return P()
    spec = [None] * len(shape)
    spec[best] = 'model'
    return P(*spec)


def shard_tree(tree, mesh: Mesh, min_weight_size: int = 2 ** 14):
    """Place a pytree (TrainState: params + AdamW moments + GA accumulators)
    with per-leaf weight sharding over the 'model' axis (``model_spec``).
    On a 1-D mesh this degenerates to ``replicate_tree``. The jitted train
    step needs no changes: the GSPMD partitioner propagates the leaf
    shardings through grads/updates, inserting all-gathers/reduce-scatters
    as it chooses (scaling-book recipe: annotate, let XLA place collectives).
    """
    model_size = dict(mesh.shape).get('model', 1)
    shardings = jax.tree_util.tree_map(
        lambda leaf: NamedSharding(
            mesh, model_spec(np.shape(leaf), model_size, min_weight_size)
        ),
        tree,
    )
    return _place_tree(tree, shardings)


def fetch_tree(tree):
    """Host-local numpy copy of a (possibly model-sharded) global pytree,
    for checkpoint writing. Leaves that are not fully addressable (weight
    shards live on other hosts) are assembled with a ``process_allgather``
    — a collective, so EVERY process must call this at the same point, not
    just the host that writes the file."""
    def _fetch(leaf):
        if getattr(leaf, 'is_fully_addressable', True):
            return jax.device_get(leaf)
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(leaf, tiled=True)

    return jax.tree_util.tree_map(_fetch, tree)


def gather_pyobjects(obj):
    """All-gather one picklable object per process; returns the list in
    process-index order (every process gets the full list — collective, all
    processes must call it). Transport is two ``process_allgather``s: the
    byte lengths, then the max-length-padded pickled payloads. Meant for
    SMALL host-side state (e.g. per-image metric entries in the distributed
    test phase) — not arrays, which should ride the mesh."""
    import pickle

    from jax.experimental import multihost_utils

    data = np.frombuffer(pickle.dumps(obj), np.uint8)
    lens = multihost_utils.process_allgather(
        np.asarray([len(data)], np.int64), tiled=True
    )  # (P,)
    padded = np.zeros((1, int(lens.max())), np.uint8)
    padded[0, : len(data)] = data
    payloads = multihost_utils.process_allgather(padded, tiled=True)  # (P, max)
    return [
        pickle.loads(payloads[i, : int(lens[i])].tobytes())
        for i in range(len(lens))
    ]


def _place_tree(tree, shardings):
    """Place every leaf with its sharding; multi-process via per-shard
    callbacks from the host-local copy (no cross-host transfer)."""
    if jax.process_count() > 1:
        def _put(leaf, sh):
            arr = np.asarray(leaf)
            return jax.make_array_from_callback(
                arr.shape, sh, lambda idx, a=arr: a[idx]
            )
        return jax.tree_util.tree_map(_put, tree, shardings)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
