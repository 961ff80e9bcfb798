"""Trace-grounded forward decomposition (VERDICT r4 #2).

Runs the bench e2e inference chain (fused uint8 preprocess → Swin-L bf16
forward → device post-process, bench.py::measure_infer's exact path) at
the bench config under ``jax.profiler.trace`` and produces per-op-class
(gather / transpose+layout / matmul-convolution / elementwise fusion /
copy / ...) × per-stage (preprocess / swin / encoder-per-layer / decoder /
postprocess) device-time accounting from the xplane capture — replacing
the stale pre-optimization `profile_stages.py` picture with measured rows.

The per-op-class times come from each op event's ``hlo_category`` stat;
the stage buckets match the jax/flax scope path embedded in the op's
display_name (e.g. ``...Mask2Former/backbone/layers_2/...``).

Env: B (default 4), HW (800), HW_IN (1024), ARCH (swin-large),
DTYPE (bfloat16), TRACE_ITERS (3), OUT (record path).
Reference hot path being decomposed: HF:modeling_mask2former.py:799-986 /
/root/reference/models/mask2former/train.py:196.
"""

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from weed_instance_segmentation_tpu.engine.model_utils import (
    config_for_arch, init_params,
)
from weed_instance_segmentation_tpu.engine.steps import make_forward_fn
from weed_instance_segmentation_tpu.engine.trace import (
    device_busy_fraction, op_breakdown,
)
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former
from weed_instance_segmentation_tpu.processing.fused import fused_preprocess
from weed_instance_segmentation_tpu.processing.postprocess import (
    post_process_instance_arrays,
)

B = int(os.environ.get('B', '4'))
HW = int(os.environ.get('HW', '800'))
HW_IN = int(os.environ.get('HW_IN', '1024'))
ARCH = os.environ.get('ARCH', 'swin-large')
DTYPE = os.environ.get('DTYPE', 'bfloat16')
TRACE_ITERS = int(os.environ.get('TRACE_ITERS', '3'))
OUT = os.environ.get('OUT', os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'records',
    'forward_trace_decomposition.json'))

# stage buckets: matched (lowercase substring) against the op's tf_op jax
# scope path (e.g. 'jit(forward)/Mask2Former/pixel_decoder/encoder_layer_4/
# self_attn/jit(_take)/gather:'); order matters (first hit wins)
BUCKETS = {
    'enc_msda_self_attn': ['/self_attn/'],
    'swin_backbone': ['/backbone/'],
    'pixel_decoder_rest': ['/pixel_decoder/'],
    'transformer_decoder': ['/transformer_module/', 'class_predictor'],
    'preprocess': ['jit(fused_preprocess)'],
    'postprocess': ['jit(reduce_out)'],
    'forward_other': ['jit(forward)'],
}


def analyze(trace_dir: str, extra: dict | None = None) -> dict:
    """Parse an (existing) capture into the record; REANALYZE=<dir> re-runs
    just this on a prior capture without touching the chip."""
    breakdown = op_breakdown(trace_dir, BUCKETS, top_n=30)
    busy = device_busy_fraction(trace_dir)
    record = {
        'script': 'tools/profile_forward_trace.py',
        'when': time.strftime('%Y-%m-%dT%H:%MZ', time.gmtime()),
        'config': {'B': B, 'HW': HW, 'HW_IN': HW_IN, 'arch': ARCH,
                   'dtype': DTYPE, 'trace_iters': TRACE_ITERS},
        'device_busy_fraction': busy,
        'note': ('Device-time decomposition of the bench e2e chain '
                 '(uint8 preprocess + forward + post-process) per op class '
                 'x stage; all ms totals are across TRACE_ITERS iterations '
                 '(divide by trace_iters for per-step). by_bucket keys '
                 'match jax scope paths; gflops/gbytes let each bucket be '
                 'placed on the roofline.'),
        'breakdown': breakdown,
    }
    record.update(extra or {})
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, 'w') as f:
        json.dump(record, f, indent=2)
    if breakdown:
        print('total device ms:', breakdown['total_ms'],
              ' async(overlapped) ms:', breakdown['async_ms'])
        print('by_category:', json.dumps(breakdown['by_category'], indent=1))
        print('by_bucket:')
        for bkt, cell in breakdown['by_bucket'].items():
            print(f'  {bkt:22s} {cell["ms"]:9.2f} ms  {cell["gflops"]:9.1f}'
                  f' GF {cell["gbytes"]:8.2f} GB  '
                  + ', '.join(f'{c}={v:.1f}' for c, v in
                              list(cell['by_category'].items())[:4]))
        for name, ms, cat in breakdown['top_ops'][:15]:
            print(f'  top: {ms:9.2f} ms  [{cat}] {name[:110]}')
    print(f'record -> {OUT}')
    return record


def main() -> None:
    redo = os.environ.get('REANALYZE')
    if redo:
        analyze(redo)
        return
    cfg = config_for_arch(ARCH, num_labels=5)
    model = Mask2Former(cfg, dtype=jnp.dtype(DTYPE))
    params = init_params(model, cfg, image_hw=(128, 128))
    forward = make_forward_fn(model)

    rng = np.random.default_rng(0)
    raw = jnp.asarray(
        rng.integers(0, 256, size=(B, HW_IN, HW_IN, 3), dtype=np.uint8))

    @jax.jit
    def reduce_out(out):
        res = post_process_instance_arrays(
            out.class_queries_logits, out.masks_queries_logits,
            (HW, HW), 0.5, with_masks=False,
        )
        return (out.class_queries_logits.mean()
                + out.masks_queries_logits.mean()
                + res.segmentation.sum(dtype=jnp.int32).astype(jnp.float32)
                + res.scores.sum())

    def step(params, raw, jitter):
        pixel_values, _ = fused_preprocess(raw + jitter, (HW, HW), (HW, HW))
        out = forward(params, pixel_values)
        return reduce_out(out)

    print(f'compiling (platform={jax.devices()[0].platform}, B={B}, '
          f'HW={HW}, arch={ARCH}, dtype={DTYPE})...', flush=True)
    t0 = time.perf_counter()
    float(step(params, raw, jnp.uint8(0)))
    compile_s = time.perf_counter() - t0
    print(f'compiled in {compile_s:.1f}s; warm round...', flush=True)
    # discard the first measured round (tunnel lazy-transfer warmup rule),
    # then time an UNTRACED round — the traced/untraced delta bounds any
    # profiler execution overhead on the same compiled executable
    delta = jnp.uint8(0)
    for _ in range(TRACE_ITERS):
        delta = (step(params, raw, delta) > 1e30).astype(jnp.uint8)
    float(delta)
    t0 = time.perf_counter()
    delta = jnp.uint8(0)
    for _ in range(TRACE_ITERS):
        delta = (step(params, raw, delta) > 1e30).astype(jnp.uint8)
    float(delta)
    untraced_wall = time.perf_counter() - t0
    print(f'untraced: {1000 * untraced_wall / TRACE_ITERS:.1f} ms/iter',
          flush=True)

    trace_dir = os.environ.get('TRACE_DIR') or tempfile.mkdtemp(
        prefix='fwd_trace_')
    print(f'tracing {TRACE_ITERS} iters -> {trace_dir}', flush=True)
    t0 = time.perf_counter()
    jax.profiler.start_trace(trace_dir)
    delta = jnp.uint8(0)
    for _ in range(TRACE_ITERS):
        delta = (step(params, raw, delta) > 1e30).astype(jnp.uint8)
    float(delta)
    jax.profiler.stop_trace()
    wall = time.perf_counter() - t0

    analyze(trace_dir, extra={
        'platform': f'{jax.devices()[0].platform}',
        'compile_s': round(compile_s, 1),
        'untraced_ms_per_iter': round(1000 * untraced_wall / TRACE_ITERS, 2),
        'traced_wall_s': round(wall, 3),
        'ms_per_iter_wall': round(1000 * wall / TRACE_ITERS, 2),
    })


if __name__ == '__main__':
    main()
