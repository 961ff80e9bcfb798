"""Mask2Former pixel decoder (flax): multi-scale deformable-attention encoder
+ FPN top-up (SURVEY.md X4/X5; HF:modeling_mask2former.py:888-1417).

Structure: 1×1 conv + GroupNorm(32) input projections on the 3 highest-stride
backbone features (HF:1228-1244), learned level embeddings (HF:1222), 6
deformable encoder layers, then one FPN step fusing the stride-4 stage-1
features (HF:1251-1274, num_fpn_levels = log2(8)-log2(4) = 1) and a 1×1 mask
projection (HF:1246).

TPU-first notes:
- NHWC feature maps; encoder operates on (B, L, C) sequences.
- Reference points and sine position embeddings are trace-time numpy
  constants (the HF code builds masks of zeros — HF:1308 — so valid ratios
  are always 1; SURVEY.md X4).
- The deformable sampling core is ``ops.msda_select`` (dtype-aware:
  flat-table fused gathers for bf16, patch-packed gathers for f32 — see
  those modules for the v5e measurements and why a Mosaic kernel loses
  here); ``ops.deformable_attention`` keeps the HF-shaped reference as
  the parity oracle.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
from weed_instance_segmentation_tpu.models.position_embedding import sine_position_embedding
from weed_instance_segmentation_tpu.ops.msda_select import msda
from weed_instance_segmentation_tpu.ops.resize import interpolate_bilinear

xavier_uniform = nn.initializers.xavier_uniform()


def deform_offsets_bias_init(num_heads: int, num_levels: int, num_points: int) -> np.ndarray:
    """Radial-grid bias init of sampling_offsets (HF:2116-2133)."""
    thetas = np.arange(num_heads, dtype=np.float64) * (2.0 * math.pi / num_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid.reshape(num_heads, 1, 1, 2), (1, num_levels, num_points, 1))
    for i in range(num_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1).astype(np.float32)


def reference_points_constant(spatial_shapes: tuple) -> np.ndarray:
    """(L_total, 2) normalized center-of-cell reference points, concatenated
    over levels (HF:1099-1126 with valid_ratios == 1)."""
    pts = []
    for h, w in spatial_shapes:
        ref_y, ref_x = np.meshgrid(
            np.linspace(0.5, h - 0.5, h, dtype=np.float32),
            np.linspace(0.5, w - 0.5, w, dtype=np.float32),
            indexing='ij',
        )
        pts.append(np.stack([ref_x.reshape(-1) / w, ref_y.reshape(-1) / h], -1))
    return np.concatenate(pts, 0)


class MSDeformAttn(nn.Module):
    """Deformable attention module (HF:888-986)."""

    embed_dim: int
    num_heads: int
    n_levels: int
    n_points: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, position_embeddings, reference_points, spatial_shapes):
        """hidden_states: (B, L, C); reference_points: (L, 2) constant."""
        b, seq, _ = hidden_states.shape
        nh, nl, npts = self.num_heads, self.n_levels, self.n_points
        head_dim = self.embed_dim // nh

        with_pos = hidden_states + position_embeddings

        value = nn.Dense(self.embed_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                         name='value_proj')(hidden_states)
        value = value.reshape(b, seq, nh, head_dim)

        offsets = nn.Dense(
            nh * nl * npts * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda *_: jnp.asarray(deform_offsets_bias_init(nh, nl, npts)),
            dtype=self.dtype, name='sampling_offsets',
        )(with_pos).reshape(b, seq, nh, nl, npts, 2)

        attn = nn.Dense(
            nh * nl * npts, kernel_init=nn.initializers.zeros, dtype=self.dtype,
            name='attention_weights',
        )(with_pos).reshape(b, seq, nh, nl * npts)
        attn = jax.nn.softmax(attn, axis=-1).reshape(b, seq, nh, nl, npts)

        # sampling locations = ref + offsets / [W_l, H_l]  (HF:963-969)
        offset_normalizer = jnp.asarray(
            [[w, h] for h, w in spatial_shapes], dtype=self.dtype
        )  # (L, 2) as (x, y) normalizers
        ref = jnp.asarray(reference_points, dtype=self.dtype)[None, :, None, None, None, :]
        locations = ref + offsets / offset_normalizer[None, None, None, :, None, :]

        out = msda(value, spatial_shapes, locations, attn)
        # named checkpoint: under remat, save this (B, L, C) activation
        # (~13 MB/layer bf16) instead of re-running the gather chain — the
        # recompute is the one expensive part of the layer (see the remat
        # policy in PixelDecoder)
        out = checkpoint_name(out, 'msda_out')
        out = nn.Dense(self.embed_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                       name='output_proj')(out)
        return out


class EncoderLayer(nn.Module):
    """Deformable encoder layer: MSDA → LN → FFN(relu) → LN, post-norm
    (HF:988-1075)."""

    config: Mask2FormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, position_embeddings, reference_points,
                 spatial_shapes, deterministic=True):
        cfg = self.config
        residual = hidden_states
        hidden_states = MSDeformAttn(
            embed_dim=cfg.feature_size, num_heads=cfg.num_attention_heads,
            n_levels=cfg.num_feature_levels, n_points=cfg.encoder_n_points,
            dtype=self.dtype, name='self_attn',
        )(hidden_states, position_embeddings, reference_points, spatial_shapes)
        hidden_states = nn.Dropout(cfg.dropout, deterministic=deterministic)(hidden_states)
        hidden_states = residual + hidden_states
        hidden_states = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                     name='self_attn_layer_norm')(hidden_states)

        residual = hidden_states
        hidden_states = nn.Dense(cfg.encoder_feedforward_dim, dtype=self.dtype, name='fc1')(hidden_states)
        hidden_states = nn.relu(hidden_states)
        hidden_states = nn.Dropout(cfg.dropout, deterministic=deterministic)(hidden_states)
        hidden_states = nn.Dense(cfg.feature_size, dtype=self.dtype, name='fc2')(hidden_states)
        hidden_states = nn.Dropout(cfg.dropout, deterministic=deterministic)(hidden_states)
        hidden_states = residual + hidden_states
        hidden_states = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                                     name='final_layer_norm')(hidden_states)
        return hidden_states


class PixelDecoder(nn.Module):
    """Full pixel decoder. Input: list of 4 NHWC backbone features
    [stage1(4×) .. stage4(32×)]. Output: (mask_features NHWC,
    [multi_scale NHWC × 3] ordered stride 32, 16, 8)."""

    config: Mask2FormerConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # recompute encoder-layer activations in backward

    @nn.compact
    def __call__(self, features: list, deterministic: bool = True):
        cfg = self.config
        dim = cfg.feature_size
        nl = cfg.num_feature_levels
        # remat with a carve-out: everything in the layer is recomputed in
        # the backward EXCEPT the deformable-sampling output ('msda_out') —
        # LN/FFN recompute is nearly free, the 12-gather sampling chain is
        # not (~35 ms/layer at Swin-L 800²)
        Layer = (
            nn.remat(
                EncoderLayer, static_argnums=(4, 5),
                policy=jax.checkpoint_policies.save_only_these_names('msda_out'),
            )
            if self.remat else EncoderLayer
        )

        # input projections on the nl highest-stride features, highest first
        projected = []
        pos_embeds = []
        spatial_shapes = []
        for level, feat in enumerate(features[::-1][:nl]):
            x = nn.Conv(dim, (1, 1), dtype=self.dtype, name=f'input_proj_{level}_conv')(feat)
            x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                             name=f'input_proj_{level}_norm')(x)
            projected.append(x)
            h, w = x.shape[1:3]
            spatial_shapes.append((h, w))
            pos_embeds.append(sine_position_embedding(h, w, num_pos_feats=dim // 2))

        spatial_shapes = tuple(spatial_shapes)
        flat = jnp.concatenate(
            [x.reshape(x.shape[0], -1, dim) for x in projected], axis=1
        )  # (B, L_total, C)

        level_embed = self.param('level_embed', nn.initializers.zeros, (nl, dim))
        pos_flat = jnp.concatenate(
            [jnp.asarray(pe, self.dtype) + level_embed[i][None] for i, pe in enumerate(pos_embeds)],
            axis=0,
        )[None]  # (1, L_total, C)

        ref_points = reference_points_constant(spatial_shapes)

        hidden = flat
        for i in range(cfg.encoder_layers):
            hidden = Layer(cfg, dtype=self.dtype, name=f'encoder_layer_{i}')(
                hidden, pos_flat, ref_points, spatial_shapes, deterministic
            )

        # split back to NHWC maps (ordered stride 32, 16, 8)
        outputs = []
        start = 0
        for h, w in spatial_shapes:
            outputs.append(hidden[:, start : start + h * w].reshape(-1, h, w, dim))
            start += h * w

        # FPN levels from the remaining low-stride features, low→high res
        stride = min(cfg.feature_strides[-nl:])
        num_fpn = int(np.log2(stride) - np.log2(cfg.common_stride))
        fpn_feats = features[:num_fpn][::-1]
        for idx, feat in enumerate(fpn_feats):
            lateral = nn.Conv(dim, (1, 1), use_bias=False, dtype=self.dtype,
                              name=f'fpn_lateral_{idx}_conv')(feat)
            lateral = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                                   name=f'fpn_lateral_{idx}_norm')(lateral)
            prev = outputs[-1]
            up = interpolate_bilinear(
                prev.transpose(0, 3, 1, 2), lateral.shape[1:3]
            ).transpose(0, 2, 3, 1)
            out = lateral + up
            out = nn.Conv(dim, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                          dtype=self.dtype, name=f'fpn_output_{idx}_conv')(out)
            out = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype,
                               name=f'fpn_output_{idx}_norm')(out)
            out = nn.relu(out)
            outputs.append(out)

        mask_features = nn.Conv(cfg.mask_feature_size, (1, 1), dtype=self.dtype,
                                name='mask_projection')(outputs[-1])
        multi_scale = outputs[:nl]
        return mask_features, multi_scale
