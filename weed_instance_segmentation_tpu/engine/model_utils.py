"""Model construction / loading + prediction visualization (SURVEY.md C12;
reference models/model_utils.py:10-120).

``build_model`` covers the reference's
``from_pretrained(checkpoint, id2label, label2id, ignore_mismatched_sizes=
True)`` (train.py:167-172): load a local checkpoint directory when present
(class head re-initialized if the label count changed — the
``ignore_mismatched_sizes`` semantics), otherwise initialize the configured
architecture from scratch (this environment has no network).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu import config
from weed_instance_segmentation_tpu.engine import checkpoint as ckpt
from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former
from weed_instance_segmentation_tpu.processing.image_processor import (
    Mask2FormerImageProcessor,
)


def config_for_arch(arch: str, **kwargs) -> Mask2FormerConfig:
    if arch == 'tiny-test':
        cfg = Mask2FormerConfig.tiny_test(**kwargs)
    elif arch == 'resnet50':
        cfg = Mask2FormerConfig.resnet50(**kwargs)
    elif arch.startswith('swin-'):
        cfg = Mask2FormerConfig.swin(arch.split('-', 1)[1], **kwargs)
    else:
        raise ValueError(f'Unknown MODEL_ARCH {arch!r}')
    # WISTPU_ENCODER_POINTS: opt-in MSDA sampling-point reduction for
    # from-scratch configs. The HF reference samples 4 points/level
    # (HF:modeling_mask2former.py:799-838); P=2 halves the encoder's
    # gather rows (−33% MSDA fwd+bwd on v5e at bench shapes) and clears
    # the overfit-gate accuracy bars (tools/records/ab_msda_points.json).
    # Incompatible with 4-point checkpoints (sampling_offsets shapes) —
    # never set when fine-tuning converted HF weights.
    points = os.environ.get('WISTPU_ENCODER_POINTS')
    if points:
        cfg.encoder_n_points = int(points)
    return cfg


def init_params(model: Mask2Former, cfg: Mask2FormerConfig, seed: int = 0,
                image_hw: tuple[int, int] = (64, 64)):
    """Random init (tiny dummy input — shapes are data-independent)."""
    dummy = jnp.zeros((1, 3, *image_hw), jnp.float32)
    init = jax.jit(lambda key: model.init(key, dummy, deterministic=True))
    return init(jax.random.PRNGKey(seed))['params']


def _compute_dtype():
    """config.COMPUTE_DTYPE → jnp dtype (params always stay float32;
    this is the activation/compute dtype — MXU runs bf16 natively)."""
    return jnp.dtype(config.COMPUTE_DTYPE)


def build_model(
    id2label: dict | None = None,
    label2id: dict | None = None,
    checkpoint: str | None = None,
    seed: int = 0,
):
    """(model, params, cfg) honoring the reference's label-override +
    ignore_mismatched_sizes behavior. The model computes in
    config.COMPUTE_DTYPE (params float32)."""
    checkpoint = checkpoint if checkpoint is not None else config.MODEL_CHECKPOINT
    dtype = _compute_dtype()

    if os.path.isdir(checkpoint):
        cfg, params = ckpt.load_pretrained(checkpoint)
        if id2label is not None and len(id2label) != cfg.num_labels:
            print(
                f'Reinitializing class head: checkpoint has {cfg.num_labels} labels, '
                f'requested {len(id2label)} (ignore_mismatched_sizes).'
            )
            cfg.id2label = id2label
            cfg.label2id = label2id or {v: k for k, v in id2label.items()}
            cfg.num_labels = len(id2label)
            model = Mask2Former(cfg, dtype=dtype, remat=config.REMAT)
            fresh = init_params(model, cfg, seed)
            params['class_predictor'] = fresh['class_predictor']
        else:
            if id2label is not None:
                cfg.id2label = id2label
                cfg.label2id = label2id or {v: k for k, v in id2label.items()}
            model = Mask2Former(cfg, dtype=dtype, remat=config.REMAT)
        return model, params, cfg

    cfg = config_for_arch(config.MODEL_ARCH)
    if id2label is not None:
        cfg.id2label = id2label
        cfg.label2id = label2id or {v: k for k, v in id2label.items()}
        cfg.num_labels = len(id2label)
    print(
        f'Checkpoint {checkpoint!r} is not a local directory — initializing '
        f'{config.MODEL_ARCH} from scratch.'
    )
    model = Mask2Former(cfg, dtype=dtype, remat=config.REMAT)
    return model, init_params(model, cfg, seed), cfg


def resolve_model_path(model_id: str) -> str:
    """MODELS_OUTPUT_DIR/<model_id>, with any ``latest`` path component
    replaced by the lexicographically newest existing subdirectory (run
    dirs are ``YYYY-MM-DD_HH-MM-SS``, so name order == time order).

    The reference hard-codes a specific run timestamp in each driver's
    MODEL_ID (reference test.py:11, inference.py:13); this repo's drivers
    default to ``mask2former_fine_tuned/latest/best_model/`` so the env
    knob is optional — ``latest`` must therefore actually resolve."""
    path = os.path.join(config.MODELS_OUTPUT_DIR, model_id)
    parts = path.split(os.sep)
    for i, part in enumerate(parts):
        if part != 'latest' or os.path.isdir(os.sep.join(parts[: i + 1])):
            continue
        parent = os.sep.join(parts[:i]) or os.sep
        runs = sorted(d for d in (os.listdir(parent) if os.path.isdir(parent) else [])
                      if os.path.isdir(os.path.join(parent, d)))
        if runs:
            parts[i] = runs[-1]
    return os.sep.join(parts)


def load_model(model_id: str):
    """(model, params, cfg, processor) from MODELS_OUTPUT_DIR/<model_id>
    (reference model_utils.py:10-17); a ``latest`` component resolves to
    the newest run (resolve_model_path)."""
    path = resolve_model_path(model_id)
    cfg, params = ckpt.load_pretrained(path)
    processor = Mask2FormerImageProcessor.from_pretrained(path)
    return Mask2Former(cfg, dtype=_compute_dtype()), params, cfg, processor


def default_processor(checkpoint: str | None = None) -> Mask2FormerImageProcessor:
    """Processor from the checkpoint dir when available, else HF Mask2Former
    defaults with the config.py geometry overrides."""
    checkpoint = checkpoint if checkpoint is not None else config.MODEL_CHECKPOINT
    cfg_path = os.path.join(checkpoint, 'preprocessor_config.json')
    if os.path.isdir(checkpoint) and os.path.exists(cfg_path):
        return Mask2FormerImageProcessor.from_pretrained(checkpoint)
    return Mask2FormerImageProcessor(
        size={'shortest_edge': config.SHORTEST_EDGE, 'longest_edge': config.LONGEST_EDGE},
        ignore_index=None,  # per-call ignore_index=255 like the reference loaders
    )


# ---------------------------------------------------------------------------
# Visualization (reference model_utils.py:20-120)
# ---------------------------------------------------------------------------

def plot_segmentation(
    image,
    result: dict,
    id2label: dict | None = None,
    score_threshold: float = 0.5,
    color_by_class: bool = False,
    ax=None,
    title: str = 'Instance Segmentation',
    show: bool = True,
):
    """Overlay predicted instances: translucent fills + contours + legend
    (tab20 for ≤20 instances else nipy_spectral — reference
    model_utils.py:57-63)."""
    import matplotlib

    if not os.environ.get('DISPLAY'):
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    from matplotlib import patches as mpatches

    segmentation = np.asarray(result['segmentation'])
    segments_info = [
        s for s in result['segments_info'] if s.get('score', 1.0) >= score_threshold
    ]

    own_fig = ax is None
    if own_fig:
        _, ax = plt.subplots(figsize=(10, 8))
    ax.imshow(np.asarray(image))
    ax.set_title(title)
    ax.axis('off')

    n = len(segments_info)
    if n <= 20:
        cmap = matplotlib.colormaps['tab20']
        colors = [cmap(i % 20) for i in range(max(n, 1))]
    else:
        cmap = matplotlib.colormaps['nipy_spectral']
        colors = [cmap(i / max(n - 1, 1)) for i in range(n)]

    legend_handles = []
    class_color: dict[int, tuple] = {}
    for i, info in enumerate(segments_info):
        mask = segmentation == info['id']
        if color_by_class:
            color = class_color.setdefault(info['label_id'], colors[len(class_color) % len(colors)])
        else:
            color = colors[i]
        overlay = np.zeros((*mask.shape, 4))
        overlay[mask] = (*color[:3], 0.45)
        ax.imshow(overlay)
        ax.contour(mask, levels=[0.5], colors=[color], linewidths=1.5)
        label = (
            id2label.get(info['label_id'], str(info['label_id']))
            if id2label else str(info['label_id'])
        )
        legend_handles.append(
            mpatches.Patch(color=color, label=f"{label} ({info.get('score', 0):.2f})")
        )
    if legend_handles:
        ax.legend(handles=legend_handles, loc='upper right', fontsize=8)
    if own_fig and show:
        plt.show()
    return ax
