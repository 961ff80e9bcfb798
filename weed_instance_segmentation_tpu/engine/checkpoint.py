"""Checkpoint I/O (SURVEY.md X11 / §5.4).

The reference persists only ``save_pretrained`` model+processor directories
(train.py:224-226, 233-235) and always restarts from the HF checkpoint —
no optimizer state, no resume. This module provides:

- the same directory format on the outside (``config.json`` +
  ``preprocessor_config.json``) with params stored as a flat ``.npz``
  (target-free load — no model init needed to restore);
- full training checkpoints (params + opt_state + step) for resume — the
  capability gap SURVEY.md §5.4 flags;
- ``load_model`` equivalents used by the eval/inference entry points
  (reference model_utils.py:10-17).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
from flax import traverse_util

from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
from weed_instance_segmentation_tpu.processing.image_processor import Mask2FormerImageProcessor

PARAMS_FILE = 'params.npz'
OPT_STATE_FILE = 'opt_state.npz'
TRAIN_META_FILE = 'train_state.json'


def _tree_to_flat(tree: Any) -> dict[str, np.ndarray]:
    flat = traverse_util.flatten_dict(tree, sep='/')
    return {k: np.asarray(v) for k, v in flat.items()}


def _flat_to_tree(flat: dict[str, np.ndarray]) -> dict:
    return traverse_util.unflatten_dict({k: v for k, v in flat.items()}, sep='/')


def save_pretrained(
    directory: str,
    params: Any,
    cfg: Mask2FormerConfig,
    processor: Mask2FormerImageProcessor | None = None,
) -> None:
    """Model directory in the reference's checkpoint layout
    (config.json + weights [+ preprocessor_config.json])."""
    os.makedirs(directory, exist_ok=True)
    cfg.save_json(directory)
    params = jax.device_get(params)
    with open(os.path.join(directory, PARAMS_FILE), 'wb') as f:
        np.savez(f, **_tree_to_flat(params))
    if processor is not None:
        processor.save_pretrained(directory)


def load_pretrained(directory: str) -> tuple[Mask2FormerConfig, dict]:
    """(config, params) from a directory written by :func:`save_pretrained`,
    or from a converted HF checkpoint directory (safetensors/bin) via
    ``models.convert.load_hf_checkpoint``."""
    params_path = os.path.join(directory, PARAMS_FILE)
    if os.path.exists(params_path):
        cfg = Mask2FormerConfig.from_json(directory)
        with np.load(params_path, allow_pickle=False) as z:
            params = _flat_to_tree({k: z[k] for k in z.files})
        return cfg, params
    # HF-format directory (torch weights) → convert on the fly
    from weed_instance_segmentation_tpu.models.convert import load_hf_checkpoint

    return load_hf_checkpoint(directory)


def load_processor(directory: str) -> Mask2FormerImageProcessor:
    return Mask2FormerImageProcessor.from_pretrained(directory)


def _opt_state_keyed_flat(opt_state) -> dict[str, np.ndarray]:
    """Flatten an optax state into {tree-path string: leaf}. Keys name the
    full path through the nested namedtuples (e.g.
    ``[0].inner_opt_state[0].mu['decoder']...``) so a restore into a
    differently-shaped optimizer fails loudly instead of silently
    mis-assigning leaves by position."""
    flat = jax.tree_util.tree_flatten_with_path(opt_state)[0]
    return {jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat}


def save_train_checkpoint(directory: str, state, extra: dict | None = None) -> None:
    """Full resume point: params + opt_state + step (+ user metadata)."""
    os.makedirs(directory, exist_ok=True)
    params, opt_state = jax.device_get((state.params, state.opt_state))
    with open(os.path.join(directory, PARAMS_FILE), 'wb') as f:
        np.savez(f, **_tree_to_flat(params))
    with open(os.path.join(directory, OPT_STATE_FILE), 'wb') as f:
        np.savez(f, **_opt_state_keyed_flat(opt_state))
    meta = {'step': int(state.step), **(extra or {})}
    with open(os.path.join(directory, TRAIN_META_FILE), 'w') as f:
        json.dump(meta, f, indent=2)


def load_train_checkpoint(directory: str, state_like):
    """Restore a TrainState saved by :func:`save_train_checkpoint`.
    ``state_like`` supplies the opt_state treedef (build via
    ``create_train_state`` on freshly-initialized params). Leaves are matched
    by tree-path key; a key-set mismatch (e.g. an optax layout change)
    raises instead of restoring garbage."""
    from weed_instance_segmentation_tpu.engine.steps import TrainState
    import jax.numpy as jnp

    with np.load(os.path.join(directory, PARAMS_FILE), allow_pickle=False) as z:
        params = _flat_to_tree({k: z[k] for k in z.files})
    with np.load(os.path.join(directory, OPT_STATE_FILE), allow_pickle=False) as z:
        saved = {k: z[k] for k in z.files}
    flat_like = jax.tree_util.tree_flatten_with_path(state_like.opt_state)[0]
    want_keys = [jax.tree_util.keystr(path) for path, _ in flat_like]
    missing = sorted(set(want_keys) - set(saved))
    surplus = sorted(set(saved) - set(want_keys))
    if missing or surplus:
        raise ValueError(
            f'optimizer-state layout mismatch restoring {directory!r}: '
            f'{len(missing)} expected keys missing (e.g. {missing[:3]}), '
            f'{len(surplus)} saved keys unused (e.g. {surplus[:3]})'
        )
    treedef = jax.tree.structure(state_like.opt_state)
    opt_state = jax.tree.unflatten(treedef, [saved[k] for k in want_keys])
    with open(os.path.join(directory, TRAIN_META_FILE)) as f:
        meta = json.load(f)
    return TrainState(params=params, opt_state=opt_state, step=jnp.int32(meta['step'])), meta
