"""Serving export: one portable compiled artifact for deployment.

The reference has no packaged serving story — deployment means re-running
its Python stack (``/root/reference/models/mask2former/inference.py:17-48``
loads a checkpoint directory and drives the HF pipeline per image). For
TPU-native production serving this module exports the END-TO-END inference
pipeline as a single StableHLO program via ``jax.export``:

    uint8 image batch (B, H_in, W_in, 3)
      → fused device preprocess (processing/fused.py — MXU-matmul resize,
        normalize, pad)
      → Mask2Former forward
      → device-side instance post-processing (processing/postprocess.py)
      → fixed-shape result arrays (segmentation map, labels, scores, masks)

Weights are baked into the artifact as constants, so a serving host needs
only ``jax`` and the artifact file — no framework code, no flax, no
checkpoint loading — and the same bytes run on any exported-for platform
(TPU serving pool, CPU canary) with XLA recompiling from the portable
StableHLO. Shapes are static by design (one artifact per (batch,
resolution) serving config), matching the framework's static-shape rule.

Artifact layout under ``<out_dir>/``:
    serving.stablehlo   — serialized jax.export artifact
    manifest.json       — shapes, dtypes, arch, threshold, jax version

CLI (env-driven like every entry point):
    WISTPU_EXPORT_CHECKPOINT=<dir>  checkpoint dir (engine/checkpoint.py
                                    save_pretrained layout); unset = random
                                    init of WISTPU_MODEL_ARCH (smoke mode)
    WISTPU_EXPORT_DIR=<dir>         output dir (default output/serving)
    WISTPU_EXPORT_BATCH, WISTPU_EXPORT_HW_IN, WISTPU_EXPORT_HW,
    WISTPU_EXPORT_THRESHOLD, WISTPU_COMPUTE_DTYPE as knobs.

    python -m weed_instance_segmentation_tpu.engine.export
"""

from __future__ import annotations

import json
import os
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

ARTIFACT_NAME = 'serving.stablehlo'
MANIFEST_NAME = 'manifest.json'


def make_serving_fn(model, params, *, out_hw: tuple[int, int],
                    target_size: tuple[int, int] | None = None,
                    threshold: float = 0.5,
                    micro_batch: int = 0,
                    emit_masks: bool = True) -> Callable:
    """(raw uint8 (B, H_in, W_in, 3)) → InstanceSegmentationResult arrays.

    ``out_hw`` is the model input resolution after the fused preprocess;
    ``target_size`` the resolution of the returned segmentation maps
    (defaults to ``out_hw``).

    ``micro_batch`` > 0 processes the request in sub-batches of that size
    via ``lax.map`` inside the one compiled program: activation liveness is
    capped at the sub-batch (Swin-L 800² throughput peaks at b4 on v5e-1 —
    larger single-dispatch batches spill; the batch-size knee in
    tools/sweep_infer_batch.py), while the serving surface still accepts
    the full request batch. The request batch must divide evenly.

    ``emit_masks=False`` drops the (B, Q, H, W) per-instance binary masks
    from the response — the int32 id map + segments fully describe
    non-overlapping output (masks are reconstructible as
    ``segmentation == id``), and skipping them removes the dominant HBM
    write of the post-process (processing/postprocess.py with_masks).
    """
    from weed_instance_segmentation_tpu.processing.fused import fused_preprocess
    from weed_instance_segmentation_tpu.processing.postprocess import (
        post_process_instance_arrays,
    )

    tgt = tuple(target_size or out_hw)

    def one(raw):
        pixel_values, _ = fused_preprocess(raw, out_hw, out_hw)
        out = model.apply({'params': params}, pixel_values, deterministic=True)
        res = post_process_instance_arrays(
            out.class_queries_logits.astype(jnp.float32),
            out.masks_queries_logits.astype(jnp.float32),
            tgt, threshold, with_masks=emit_masks,
        )._asdict()
        if not emit_masks:
            res.pop('masks')
        return res

    def serve(raw):
        b = raw.shape[0]
        if micro_batch and b > micro_batch:
            if b % micro_batch:
                raise ValueError(
                    f'serving batch {b} not divisible by micro_batch {micro_batch}'
                )
            chunks = raw.reshape(b // micro_batch, micro_batch, *raw.shape[1:])
            res = jax.lax.map(one, chunks)
            return jax.tree_util.tree_map(
                lambda x: x.reshape(b, *x.shape[2:]), res
            )
        return one(raw)

    return serve


def export_serving(
    model,
    params,
    out_dir: str,
    *,
    batch: int,
    in_hw: tuple[int, int],
    out_hw: tuple[int, int],
    target_size: tuple[int, int] | None = None,
    threshold: float = 0.5,
    platforms: tuple[str, ...] | None = None,
    manifest_extra: dict | None = None,
    emit_masks: bool = True,
) -> str:
    """Serialize the serving pipeline; returns the artifact path.

    ``platforms`` defaults to ('tpu', 'cpu') so one artifact serves the TPU
    pool and CPU canaries; pass a single platform to halve lowering time.
    """
    from jax import export as jax_export

    serve = make_serving_fn(
        model, params, out_hw=out_hw, target_size=target_size,
        threshold=threshold, emit_masks=emit_masks,
    )
    spec = jax.ShapeDtypeStruct((batch, *in_hw, 3), jnp.uint8)
    plats = tuple(platforms) if platforms else ('tpu', 'cpu')
    exported = jax_export.export(jax.jit(serve), platforms=plats)(spec)

    os.makedirs(out_dir, exist_ok=True)
    artifact = os.path.join(out_dir, ARTIFACT_NAME)
    with open(artifact, 'wb') as f:
        f.write(exported.serialize())
    manifest = {
        'input': {'shape': [batch, *in_hw, 3], 'dtype': 'uint8',
                  'layout': 'BHWC raw images'},
        'model_input_hw': list(out_hw),
        'target_size': list(target_size or out_hw),
        'threshold': threshold,
        'platforms': list(plats),
        'jax_version': jax.__version__,
        'emit_masks': emit_masks,
        'outputs': 'InstanceSegmentationResult fields (batch-leading)'
                   + ('' if emit_masks else ', masks omitted (id map only)'),
        **(manifest_extra or {}),
    }
    with open(os.path.join(out_dir, MANIFEST_NAME), 'w') as f:
        json.dump(manifest, f, indent=2)
    return artifact


def load_serving(out_dir: str) -> tuple[Callable, dict]:
    """Load an exported artifact → (callable(raw uint8) → result dict,
    manifest). Needs only jax — no model code, weights, or flax."""
    from jax import export as jax_export

    with open(os.path.join(out_dir, ARTIFACT_NAME), 'rb') as f:
        exported = jax_export.deserialize(f.read())
    with open(os.path.join(out_dir, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    return jax.jit(exported.call), manifest


def main() -> None:
    from weed_instance_segmentation_tpu.engine.model_utils import (
        config_for_arch, init_params,
    )
    from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

    ckpt = os.environ.get('WISTPU_EXPORT_CHECKPOINT')
    out_dir = os.environ.get('WISTPU_EXPORT_DIR', os.path.join('output', 'serving'))
    batch = int(os.environ.get('WISTPU_EXPORT_BATCH', '4'))
    hw_in = int(os.environ.get('WISTPU_EXPORT_HW_IN', '1024'))
    hw = int(os.environ.get('WISTPU_EXPORT_HW', '800'))
    threshold = float(os.environ.get('WISTPU_EXPORT_THRESHOLD', '0.5'))
    emit_masks = os.environ.get('WISTPU_EXPORT_MASKS', '1') == '1'
    dtype = jnp.dtype(os.environ.get('WISTPU_COMPUTE_DTYPE', 'bfloat16'))

    if ckpt:
        from weed_instance_segmentation_tpu.engine.checkpoint import load_pretrained

        cfg, params = load_pretrained(ckpt)
        arch = f'checkpoint:{ckpt}'
    else:
        arch = os.environ.get('WISTPU_MODEL_ARCH', 'swin-large')
        cfg = config_for_arch(arch, num_labels=int(os.environ.get('WISTPU_NUM_LABELS', '5')))
        model_tmp = Mask2Former(cfg, dtype=dtype)
        params = init_params(model_tmp, cfg, image_hw=(128, 128))
    model = Mask2Former(cfg, dtype=dtype)

    artifact = export_serving(
        model, params, out_dir,
        batch=batch, in_hw=(hw_in, hw_in), out_hw=(hw, hw), threshold=threshold,
        emit_masks=emit_masks,
        manifest_extra={'arch': arch, 'compute_dtype': str(dtype)},
    )
    size_mb = os.path.getsize(artifact) / 1e6
    print(f'exported {artifact} ({size_mb:.1f} MB) for platforms TPU+CPU')


if __name__ == '__main__':
    main()
