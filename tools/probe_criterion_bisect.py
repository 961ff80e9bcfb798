"""Bisect the TPU backend fault in the criterion at overfit-gate shapes.

Context: tools/records/tpu_backend_incident_2026-08-18.md — the criterion
forward at EXACTLY (B2, N3, Q100, logits 64x64, targets 256x256, f32)
reproducibly kills the TPU worker (kernel fault), with BOTH the default JV
solver and the WISTPU_LAP=static mitigation, while the identical program is
scipy-verified correct on CPU and the same criterion at bench shapes
(N10, Q200, logits 200x200, targets 800x800) runs fine.

This probe runs ONE criterion sub-component per invocation (a crash wedges
the backend, so each attempt is a separate process driven by
tools/probe_bisect_driver.sh in increasing-suspicion order — every PASS
before the first crash narrows the faulting kernel).

    PART=matcher     matcher_cost only (grid-sample points + pairwise CE/dice)
    PART=lap         matcher_cost + linear_sum_assignment
    PART=uncertainty _uncertainty_points on the gathered pred masks
    PART=masks       one mask2former_loss layer with a precomputed assignment
    PART=single      total_loss with 0 aux layers
    PART=full        total_loss with 9 aux layers (the known repro)

Shape overrides for the second bisect axis: PROBE_N / PROBE_Q / PROBE_LHW /
PROBE_THW (defaults = the crashing gate shapes).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.losses import criterion
from weed_instance_segmentation_tpu.models.mask2former import Mask2FormerOutput

PART = os.environ.get('PART', 'matcher')
B = int(os.environ.get('PROBE_B', '2'))
N = int(os.environ.get('PROBE_N', '3'))
Q = int(os.environ.get('PROBE_Q', '100'))
LHW = int(os.environ.get('PROBE_LHW', '64'))
THW = int(os.environ.get('PROBE_THW', '256'))
N_LABELS = 2
ITERS = int(os.environ.get('PROBE_ITERS', '3'))


def main() -> None:
    print(
        f'PART={PART} B={B} N={N} Q={Q} LHW={LHW} THW={THW} '
        f"LAP={os.environ.get('WISTPU_LAP', 'jv')} backend={jax.default_backend()}",
        flush=True,
    )
    rng = np.random.default_rng(0)
    ml = jnp.asarray(rng.standard_normal((B, Q, LHW, LHW)), jnp.float32)
    cl = jnp.asarray(rng.standard_normal((B, Q, N_LABELS + 1)), jnp.float32)
    tm = jnp.asarray((rng.random((B, N, THW, THW)) > 0.7).astype(np.float32))
    tc = jnp.asarray(rng.integers(0, N_LABELS, (B, N)).astype(np.int32))
    tv = jnp.ones((B, N), bool)
    key = jax.random.PRNGKey(0)

    if PART == 'matcher':
        fn = jax.jit(
            lambda ml, cl, tm, tc, tv, key: criterion.matcher_cost(
                ml, cl, tm, tc, tv, key, 12544, 2.0, 5.0, 5.0
            ).sum()
        )
        args = (ml, cl, tm, tc, tv, key)
    elif PART == 'lap':
        fn = jax.jit(
            lambda ml, cl, tm, tc, tv, key: criterion.hungarian_match(
                ml, cl, tm, tc, tv, key, 12544, 2.0, 5.0, 5.0
            ).sum()
        )
        args = (ml, cl, tm, tc, tv, key)
    elif PART == 'uncertainty':
        pred = ml[:, :N].reshape(B * N, LHW, LHW)

        def unc(pred, key):
            return criterion._uncertainty_points(pred, key, 12544, 3.0, 0.75).sum()

        fn = jax.jit(unc)
        args = (pred, key)
    elif PART == 'sample':
        # _uncertainty_points sub-part 1: the flat-table gather sampler at
        # the oversampled point count (N*B masks × 37632 points from LHW²)
        pred = ml[:, :N].reshape(B * N, LHW, LHW)
        coords = jax.random.uniform(key, (B * N, int(12544 * 3.0), 2))

        def samp(pred, coords):
            return criterion._sample_points_batch(pred, coords).sum()

        fn = jax.jit(samp)
        args = (pred, coords)
    elif PART == 'topk':
        # _uncertainty_points sub-part 2: top_k over the oversampled logits
        # + take_along_axis of the picked coords (no mask gather involved)
        ns = int(12544 * 3.0)
        nu = int(0.75 * 12544)
        logits = jnp.asarray(rng.standard_normal((B * N, ns)), jnp.float32)
        coords = jax.random.uniform(key, (B * N, ns, 2))

        def tk(logits, coords):
            _, idx = jax.lax.top_k(-jnp.abs(logits), nu)
            picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
            return picked.sum()

        fn = jax.jit(tk)
        args = (logits, coords)
    elif PART == 'topk_only':
        # top_k alone, no coord gather
        ns = int(12544 * 3.0)
        nu = int(0.75 * 12544)
        logits = jnp.asarray(rng.standard_normal((B * N, ns)), jnp.float32)

        def tko(logits):
            v, idx = jax.lax.top_k(-jnp.abs(logits), nu)
            return v.sum() + idx.sum()

        fn = jax.jit(tko)
        args = (logits,)
    elif PART == 'tala':
        # take_along_axis alone with random indices (no top_k)
        ns = int(12544 * 3.0)
        nu = int(0.75 * 12544)
        idx = jnp.asarray(rng.integers(0, ns, (B * N, nu)).astype(np.int32))
        coords = jax.random.uniform(key, (B * N, ns, 2))

        def ta(idx, coords):
            return jnp.take_along_axis(coords, idx[..., None], axis=1).sum()

        fn = jax.jit(ta)
        args = (idx, coords)
    elif PART == 'topk_sorted':
        # workaround candidate: exact top-k via full argsort (different
        # XLA kernel class than lax.top_k's PartialSort)
        ns = int(12544 * 3.0)
        nu = int(0.75 * 12544)
        logits = jnp.asarray(rng.standard_normal((B * N, ns)), jnp.float32)
        coords = jax.random.uniform(key, (B * N, ns, 2))

        def tks(logits, coords):
            order = jnp.argsort(-(-jnp.abs(logits)), axis=-1, stable=True)
            idx = order[:, :nu]
            picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
            return picked.sum()

        fn = jax.jit(tks)
        args = (logits, coords)
    elif PART == 'topk_barrier':
        # workaround candidate: block the sort→gather fusion with an
        # optimization_barrier on the indices (numerics unchanged)
        ns = int(12544 * 3.0)
        nu = int(0.75 * 12544)
        logits = jnp.asarray(rng.standard_normal((B * N, ns)), jnp.float32)
        coords = jax.random.uniform(key, (B * N, ns, 2))

        def tkb(logits, coords):
            _, idx = jax.lax.top_k(-jnp.abs(logits), nu)
            idx = jax.lax.optimization_barrier(idx)
            picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
            return picked.sum()

        fn = jax.jit(tkb)
        args = (logits, coords)
    elif PART == 'topk_approx':
        # workaround candidate: TPU-native approx_max_k (PartialReduce op)
        ns = int(12544 * 3.0)
        nu = int(0.75 * 12544)
        logits = jnp.asarray(rng.standard_normal((B * N, ns)), jnp.float32)
        coords = jax.random.uniform(key, (B * N, ns, 2))

        def tka(logits, coords):
            _, idx = jax.lax.approx_max_k(
                -jnp.abs(logits), nu, recall_target=0.95
            )
            picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
            return picked.sum()

        fn = jax.jit(tka)
        args = (logits, coords)
    elif PART == 'tala_computed':
        # diagnostic: indices COMPUTED in-program (no sort) → gather.
        # Distinguishes "gather with in-program index producer" from
        # "sort + gather" as the faulting composition.
        ns = int(12544 * 3.0)
        nu = int(0.75 * 12544)
        seed = jnp.asarray(rng.integers(0, 2**31 - 1, (B * N, nu)).astype(np.int32))
        coords = jax.random.uniform(key, (B * N, ns, 2))

        def tac(seed, coords):
            idx = (seed * 1103515245 + 12345) % ns
            picked = jnp.take_along_axis(coords, idx[..., None], axis=1)
            return picked.sum()

        fn = jax.jit(tac)
        args = (seed, coords)
    elif PART == 'topk_varsort':
        # workaround candidate: variadic stable sort carrying the coords
        # along with the |logit| key — top-nu selection with NO gather.
        # Stable ascending sort of |x| == torch.topk(-|x|) value order with
        # index tie-breaking, so the picked coord order is bit-identical.
        ns = int(12544 * 3.0)
        nu = int(0.75 * 12544)
        logits = jnp.asarray(rng.standard_normal((B * N, ns)), jnp.float32)
        coords = jax.random.uniform(key, (B * N, ns, 2))

        def tkv(logits, coords):
            keyv = jnp.abs(logits)
            _, xs, ys = jax.lax.sort(
                (keyv, coords[..., 0], coords[..., 1]),
                dimension=-1, is_stable=True, num_keys=1,
            )
            picked = jnp.stack([xs[:, :nu], ys[:, :nu]], axis=-1)
            return picked.sum()

        fn = jax.jit(tkv)
        args = (logits, coords)
    elif PART == 'gather':
        # _uncertainty_points sub-part 1a: ONLY the row gather from the
        # patch table (no table build, no bilinear weights)
        ns = int(12544 * 3.0)
        table = jnp.asarray(
            rng.standard_normal((B * N * LHW * LHW, 4)), jnp.float32
        )
        idx = jnp.asarray(
            rng.integers(0, B * N * LHW * LHW, (B * N * ns,)).astype(np.int32)
        )

        def ga(table, idx):
            return jnp.take(table, idx, axis=0, mode='clip').sum()

        fn = jax.jit(ga)
        args = (table, idx)
    elif PART == 'masks':
        assigned = jnp.tile(jnp.arange(N, dtype=jnp.int32)[None], (B, 1))

        def one_layer(ml, cl, tm, tc, tv, key, assigned):
            d = criterion.mask2former_loss(
                ml, cl, tm, tc, tv, key, num_labels=N_LABELS, assigned=assigned
            )
            return sum(d.values())

        fn = jax.jit(one_layer)
        args = (ml, cl, tm, tc, tv, key, assigned)
    elif PART in ('single', 'full'):
        aux = 0 if PART == 'single' else 9
        out = Mask2FormerOutput(
            class_queries_logits=cl,
            masks_queries_logits=ml,
            aux_class_queries_logits=tuple(
                jnp.asarray(rng.standard_normal((B, Q, N_LABELS + 1)), jnp.float32)
                for _ in range(aux)
            ),
            aux_masks_queries_logits=tuple(
                jnp.asarray(rng.standard_normal((B, Q, LHW, LHW)), jnp.float32)
                for _ in range(aux)
            ),
        )

        def tot(out, tm, tc, tv, key):
            loss, _ = criterion.total_loss(
                out, tm, tc, tv, key, num_labels=N_LABELS,
                use_auxiliary_loss=aux > 0,
            )
            return loss

        fn = jax.jit(tot)
        args = (out, tm, tc, tv, key)
    else:
        raise SystemExit(f'unknown PART={PART}')

    t0 = time.time()
    v = float(fn(*args).block_until_ready())
    print(f'compile+first: {time.time() - t0:.1f}s value={v:.4f}', flush=True)
    for i in range(ITERS):
        t0 = time.time()
        v = float(fn(*args).block_until_ready())
        print(f'iter {i}: {1e3 * (time.time() - t0):.1f} ms value={v:.4f}', flush=True)
    print(f'PART={PART} OK', flush=True)


if __name__ == '__main__':
    main()
