"""Full Mask2Former model (flax): backbone → pixel decoder → masked-attention
transformer decoder → class/mask heads.

Mirrors HF ``Mask2FormerModel`` / ``Mask2FormerForUniversalSegmentation``
(HF:modeling_mask2former.py:2164-2470): the class predictor is one Linear
(hidden → num_labels + 1) applied to every intermediate layernormed decoder
state (HF:2253, 2434-2436); per-layer mask logits come from the transformer
module. The loss (Hungarian matcher + point-sampled CE/mask/dice) lives in
``losses.criterion`` and is applied by the training engine — keeping the
model a pure function of (params, pixel_values).

API: NCHW ``pixel_values`` like the reference (transposed once to NHWC
internally — TPU conv layout).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax.numpy as jnp

from weed_instance_segmentation_tpu.models.configuration import (
    Mask2FormerConfig, ResNetConfig, SwinConfig,
)
from weed_instance_segmentation_tpu.models.pixel_decoder import PixelDecoder
from weed_instance_segmentation_tpu.models.resnet import ResNetBackbone
from weed_instance_segmentation_tpu.models.swin import SwinBackbone
from weed_instance_segmentation_tpu.models.transformer_decoder import TransformerModule


class Mask2FormerOutput(NamedTuple):
    """class/mask logits for the final layer + all aux layers.

    class_queries_logits: (B, Q, num_labels+1) — final layer
    masks_queries_logits: (B, Q, H/4, W/4)     — final layer
    aux_class_queries_logits: tuple over intermediate layers (excl. final)
    aux_masks_queries_logits: tuple over intermediate layers (excl. final)
    """

    class_queries_logits: Any
    masks_queries_logits: Any
    aux_class_queries_logits: tuple
    aux_masks_queries_logits: tuple


class Mask2Former(nn.Module):
    config: Mask2FormerConfig
    dtype: jnp.dtype = jnp.float32
    # rematerialize activations in the backward pass (config.REMAT):
    # True/'all' = backbone + deformable encoder; 'encoder' = deformable
    # encoder only (the backbone recompute is matmul-bound and cheap to
    # store once HBM has headroom); False = store everything
    remat: bool | str = False

    def setup(self):
        cfg = self.config
        remat_backbone = self.remat in (True, 'all', '1')
        remat_encoder = bool(self.remat)
        if isinstance(cfg.backbone_config, SwinConfig):
            self.backbone = SwinBackbone(cfg.backbone_config, dtype=self.dtype,
                                         remat=remat_backbone)
        elif isinstance(cfg.backbone_config, ResNetConfig):
            self.backbone = ResNetBackbone(cfg.backbone_config, dtype=self.dtype)
        else:
            raise ValueError(f'Unsupported backbone config {type(cfg.backbone_config)}')
        self.pixel_decoder = PixelDecoder(cfg, dtype=self.dtype, remat=remat_encoder)
        self.transformer_module = TransformerModule(cfg, dtype=self.dtype)
        self.class_predictor = nn.Dense(
            cfg.num_labels + 1, dtype=self.dtype, name='class_predictor'
        )

    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True) -> Mask2FormerOutput:
        """pixel_values: (B, 3, H, W) float — reference/HF layout."""
        x = pixel_values.transpose(0, 2, 3, 1).astype(self.dtype)  # NHWC
        features = self.backbone(x, deterministic=deterministic)
        mask_features, multi_scale = self.pixel_decoder(features, deterministic=deterministic)
        intermediate, mask_logits = self.transformer_module(
            multi_scale, mask_features, deterministic=deterministic
        )
        class_logits = tuple(self.class_predictor(h) for h in intermediate)
        return Mask2FormerOutput(
            class_queries_logits=class_logits[-1],
            masks_queries_logits=mask_logits[-1],
            aux_class_queries_logits=class_logits[:-1],
            aux_masks_queries_logits=mask_logits[:-1],
        )
