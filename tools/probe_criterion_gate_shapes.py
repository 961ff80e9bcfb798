"""Probe: criterion forward at the overfit-gate shapes on the real chip.

During the 2026-08-17 TPU backend incident, the criterion forward at
EXACTLY these shapes (B2, N3, Q100, mask logits 64x64, targets 256x256,
f32, random inputs) reproducibly killed the TPU worker
(tools/records/tpu_backend_incident_2026-08-18.md). The identical program
is scipy-verified correct on CPU. This probe re-runs that repro, both with
the default JV solver (data-dependent while_loops) and with the shipped
mitigation WISTPU_LAP=static (set the env var before launch).

Usage:
    python tools/probe_criterion_gate_shapes.py            # default LAP
    WISTPU_LAP=static python tools/probe_criterion_gate_shapes.py
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

B, N, Q, LOGIT_HW, TGT_HW = 2, 3, 100, 64, 256
N_LABELS = 2
AUX = int(os.environ.get('PROBE_AUX', '9'))
ITERS = int(os.environ.get('PROBE_ITERS', '12'))


def main() -> None:
    print(f'backend={jax.default_backend()} devices={jax.devices()} '
          f"WISTPU_LAP={os.environ.get('WISTPU_LAP', 'jv')}", flush=True)
    rng = np.random.default_rng(0)
    out = Mask2FormerOutput(
        class_queries_logits=jnp.asarray(rng.standard_normal((B, Q, N_LABELS + 1)), jnp.float32),
        masks_queries_logits=jnp.asarray(rng.standard_normal((B, Q, LOGIT_HW, LOGIT_HW)), jnp.float32),
        aux_class_queries_logits=tuple(
            jnp.asarray(rng.standard_normal((B, Q, N_LABELS + 1)), jnp.float32) for _ in range(AUX)
        ),
        aux_masks_queries_logits=tuple(
            jnp.asarray(rng.standard_normal((B, Q, LOGIT_HW, LOGIT_HW)), jnp.float32) for _ in range(AUX)
        ),
    )
    tm = (rng.random((B, N, TGT_HW, TGT_HW)) > 0.7).astype(np.float32)
    tc = rng.integers(0, N_LABELS, (B, N)).astype(np.int32)
    tv = np.ones((B, N), bool)

    @jax.jit
    def fwd(out, tm, tc, tv, key):
        loss, parts = criterion.total_loss(
            out, tm, tc, tv, key, num_labels=N_LABELS)
        return loss

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    loss = fwd(out, jnp.asarray(tm), jnp.asarray(tc), jnp.asarray(tv), key)
    loss.block_until_ready()
    print(f'compile+first: {time.time() - t0:.1f}s loss={float(loss):.4f}', flush=True)
    for i in range(ITERS):
        key = jax.random.fold_in(key, i)
        t0 = time.time()
        loss = fwd(out, jnp.asarray(tm), jnp.asarray(tc), jnp.asarray(tv), key)
        v = float(loss.block_until_ready())
        print(f'iter {i}: {1e3 * (time.time() - t0):.1f} ms loss={v:.4f}', flush=True)
    print('PROBE OK', flush=True)


if __name__ == '__main__':
    main()
