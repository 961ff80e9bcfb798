"""A/B: fewer MSDA gather rows via reduced sampling points (and levels).

The round-3 roofline names in-context gather efficiency as the remaining
lever (tools/README.md "Where the 86% goes": 0.24 G rows/s in the encoder
vs 2.05 G rows/s flat-table microbenchmark) and prescribes *fewer or wider
rows*. Rows per encoder layer = B·Q·heads·levels·points, so the two
config-level levers are ``encoder_n_points`` (4 → 2 halves rows) and the
level count (3 → 2 cuts a third). This study measures both, with accuracy
receipts, per VERDICT r4 #3.

Arms:
  TIMING (chip): the shipped hybrid ``msda`` op (ops/msda_select.py —
  per-dtype forward + einsum value-grad) at Mask2Former encoder bench
  shapes (800² → levels 100²/50²/25², Q = 13125, 8 heads, d32, bf16),
  forward and forward+backward, for P=4 / P=2 / L=2.

  ACCURACY (CPU, run separately with JAX_PLATFORMS=cpu AB_ARM=accuracy):
  the overfit gate (tools/overfit_gate.py) at the tiny-test f32 config that
  produced records/overfit_tiny-test_float32_cpu_pass.json (1200 steps,
  hw 128, 4 images), with encoder_n_points 4 vs 2. Matched accuracy :=
  the P=2 arm clears the same gate bars (final loss < 4.0, mAP@50 ≥ 0.86).

Parity note: the HF reference samples 4 points × 3 levels
(HF:modeling_mask2former.py:799-838 via config); P=2 is a from-scratch /
re-init-only deviation (checkpoint sampling_offsets shapes differ), gated
behind WISTPU_ENCODER_POINTS and recorded in the deviation ledger only if
accepted.

Env: AB_ARM=timing|accuracy|both, B, ITERS, AB_OUT.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ARM = os.environ.get('AB_ARM', 'timing')
B = int(os.environ.get('B', '2'))
ITERS = int(os.environ.get('ITERS', '10'))
OUT = os.environ.get('AB_OUT') or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'records', 'ab_msda_points.json'
)
HEADS, D = 8, 32
SHAPES3 = ((100, 100), (50, 50), (25, 25))  # pixel-decoder levels at 800²


def timing_arm() -> dict:
    import jax
    import jax.numpy as jnp

    from weed_instance_segmentation_tpu.ops.msda_select import msda

    q = sum(h * w for h, w in SHAPES3)
    rng = np.random.default_rng(0)
    value = jnp.asarray(rng.standard_normal((B, q, HEADS, D)), jnp.bfloat16)

    def inputs(n_levels, n_points):
        loc = jnp.asarray(
            rng.random((B, q, HEADS, n_levels, n_points, 2)), jnp.float32
        )
        aw = jax.nn.softmax(
            jnp.asarray(
                rng.standard_normal((B, q, HEADS, n_levels * n_points)), jnp.float32
            )
        ).reshape(B, q, HEADS, n_levels, n_points)
        return loc, aw

    def time_fn(fn, *args):
        jfn = jax.jit(fn)
        float(jfn(*args, jnp.float32(0.0)))  # compile
        best = None
        for _ in range(2):  # two rounds; report the steady one (tunnel rule)
            t0 = time.perf_counter()
            chain = jnp.float32(0.0)
            for _ in range(ITERS):
                chain = jfn(*args, chain)
            float(chain)
            best = (time.perf_counter() - t0) / ITERS
        return 1000 * best

    out = {}
    for name, shapes, n_points in (
        ('p4_l3_baseline', SHAPES3, 4),
        ('p2_l3', SHAPES3, 2),
        ('p4_l2', SHAPES3[:2], 4),
    ):
        loc, aw = inputs(len(shapes), n_points)

        def fwd(value, loc, aw, jitter, shapes=shapes):
            return msda(value, shapes, loc + jitter * 1e-9, aw).astype(
                jnp.float32).sum() * 1e-9

        def fwdbwd(value, loc, aw, jitter, shapes=shapes):
            def loss(v, l, a):
                return msda(v, shapes, l, a).astype(jnp.float32).sum()
            g = jax.grad(loss, argnums=(0, 1, 2))(value, loc + jitter * 1e-9, aw)
            return sum(x.astype(jnp.float32).sum() for x in g) * 1e-9

        out[f'{name}_fwd_ms'] = round(time_fn(fwd, value, loc, aw), 1)
        out[f'{name}_fwdbwd_ms'] = round(time_fn(fwdbwd, value, loc, aw), 1)
        print(name, out[f'{name}_fwd_ms'], out[f'{name}_fwdbwd_ms'], flush=True)
    return out


def accuracy_arm() -> dict:
    import tempfile

    from tools.overfit_gate import run_gate

    out = {}
    for points in (4, 2):
        with tempfile.TemporaryDirectory(prefix=f'ab_points{points}_') as wd:
            rec = run_gate(
                wd, arch='tiny-test', steps=1200, lr=2e-4, hw=128, batch=2,
                n_images=4, dtype='float32', encoder_points=points,
            )
        out[f'p{points}'] = {
            k: rec[k] for k in ('initial_loss', 'final_loss', 'map', 'map_50')
        }
        print(f'points={points}:', out[f'p{points}'], flush=True)
    out['p2_passes_gate'] = bool(
        out['p2']['final_loss'] < 4.0 and out['p2']['map_50'] >= 0.86
        and out['p2']['map'] >= 0.85
    )
    return out


def main():
    rec = {'b': B, 'iters': ITERS, 'shapes': SHAPES3, 'q': sum(h * w for h, w in SHAPES3)}
    if os.path.exists(OUT):
        with open(OUT) as f:
            rec.update(json.load(f))
    if ARM in ('timing', 'both'):
        rec['timing'] = timing_arm()
        import jax

        rec['timing_platform'] = jax.devices()[0].platform
    if ARM in ('accuracy', 'both'):
        rec['accuracy'] = accuracy_arm()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, 'w') as f:
        json.dump(rec, f, indent=2)
    print(json.dumps(rec, indent=2))


if __name__ == '__main__':
    main()
