"""Jitted train / eval steps (SURVEY.md §7.1.6).

The reference's epoch loop (models/mask2former/train.py:187-206) does, per
batch: forward with labels → loss/GA → backward → optimizer step every GA
batches. Here that whole update is ONE compiled XLA program:

- gradient accumulation via ``optax.MultiSteps`` (mirrors the reference's
  GA=2, config.py:8) — micro-batches feed the same jitted step, the inner
  AdamW applies every ``every_k`` calls;
- data parallelism comes from GSPMD: the batch arrives sharded on the
  'data' mesh axis (parallel.mesh), parameters replicated; XLA inserts the
  gradient all-reduce over ICI — no hand-written collectives;
- the loss's ``num_masks`` normalizer is a *global* sum under GSPMD jit
  (the sum over the sharded batch axis is all-reduced automatically),
  matching the HF distributed semantics (HF:modeling_mask2former.py:782-796).
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from weed_instance_segmentation_tpu.losses.criterion import total_loss
from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
from weed_instance_segmentation_tpu.processing.wire import decode_batch


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32 — micro-steps taken


def make_optimizer(learning_rate: float, gradient_accumulation: int = 1) -> optax.GradientTransformation:
    """AdamW with torch defaults (reference train.py:174 uses
    ``torch.optim.AdamW(lr=LEARNING_RATE)`` → betas (0.9, 0.999), eps 1e-8,
    weight_decay 0.01), wrapped in MultiSteps for gradient accumulation."""
    tx = optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01)
    if gradient_accumulation > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=gradient_accumulation)
    return tx


def create_train_state(params, learning_rate: float, gradient_accumulation: int = 1):
    tx = make_optimizer(learning_rate, gradient_accumulation)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.int32(0)), tx


def make_loss_fn(model, cfg: Mask2FormerConfig, augment=None) -> Callable:
    """(params, batch, rng) → (total, dict). Batch uses the static-shape
    layout from ``dataset_utils.pad_batch_static``. ``augment`` is an
    optional AugmentConfig (processing/augment.py) applied on device inside
    the compiled step — the reference trains without augmentation, so None
    (the default) is the parity behavior."""

    def loss_fn(params, batch, rng):
        # masks arrive uint8 or wire-packed at 1 bit/px (processing/wire.py
        # shrinks the host→HBM transfer ~3.5×); unpack + cast on device,
        # where XLA fuses both into the first consumers
        batch = decode_batch(batch)
        batch = dict(batch, mask_labels=batch['mask_labels'].astype(jnp.float32))
        if augment is not None:
            from weed_instance_segmentation_tpu.processing.augment import augment_batch

            batch = augment_batch(batch, jax.random.fold_in(rng, 3), augment)
        outputs = model.apply(
            {'params': params}, batch['pixel_values'], deterministic=False,
            rngs={'dropout': jax.random.fold_in(rng, 1)},
        )
        loss, loss_dict = total_loss(
            outputs,
            batch['mask_labels'],
            batch['class_labels'],
            batch['instance_valid'].astype(bool),
            jax.random.fold_in(rng, 2),
            num_labels=cfg.num_labels,
            no_object_weight=cfg.no_object_weight,
            train_num_points=cfg.train_num_points,
            oversample_ratio=cfg.oversample_ratio,
            importance_sample_ratio=cfg.importance_sample_ratio,
            class_weight=cfg.class_weight,
            mask_weight=cfg.mask_weight,
            dice_weight=cfg.dice_weight,
            use_auxiliary_loss=cfg.use_auxiliary_loss,
            sample_valid=batch.get('sample_valid'),
        )
        return loss, loss_dict

    return loss_fn


def make_train_step(model, cfg: Mask2FormerConfig, tx: optax.GradientTransformation,
                    augment=None) -> Callable:
    """Returns jitted (state, batch, rng) → (state, loss). One micro-batch
    per call; MultiSteps applies the real update every GA calls."""
    loss_fn = make_loss_fn(model, cfg, augment=augment)

    # Donating the state lets XLA update params/opt_state in place instead
    # of holding old+new copies live across the update — with AdamW +
    # MultiSteps that is 4 param-sized trees (params, mu, nu, acc_grads),
    # ~3.5 GB for Swin-L, the difference between b2 and b4 fitting in v5e
    # HBM. Every call site consumes the step as `state, loss = step(state,…)`.
    def train_step(state: TrainState, batch: dict, rng: jax.Array):
        rng = jax.random.fold_in(rng, state.step)
        (loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch, rng
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return TrainState(params, opt_state, state.step + 1), loss

    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(model, cfg: Mask2FormerConfig) -> Callable:
    """Forward-only loss (reference ``evaluate``, train.py:18-37).
    Deterministic: dropout off; the point-sampling RNG is fixed per batch
    for a stable val metric."""
    def loss_eval(params, batch, rng):
        batch = decode_batch(batch)
        outputs = model.apply({'params': params}, batch['pixel_values'], deterministic=True)
        loss, _ = total_loss(
            outputs,
            batch['mask_labels'].astype(jnp.float32),
            batch['class_labels'],
            batch['instance_valid'].astype(bool),
            rng,
            num_labels=cfg.num_labels,
            no_object_weight=cfg.no_object_weight,
            train_num_points=cfg.train_num_points,
            oversample_ratio=cfg.oversample_ratio,
            importance_sample_ratio=cfg.importance_sample_ratio,
            class_weight=cfg.class_weight,
            mask_weight=cfg.mask_weight,
            dice_weight=cfg.dice_weight,
            use_auxiliary_loss=cfg.use_auxiliary_loss,
            sample_valid=batch.get('sample_valid'),
        )
        return loss

    return jax.jit(loss_eval)


def make_forward_fn(model) -> Callable:
    """Jitted inference forward: (params, pixel_values) → Mask2FormerOutput."""

    @jax.jit
    def forward(params, pixel_values):
        return model.apply({'params': params}, pixel_values, deterministic=True)

    return forward
