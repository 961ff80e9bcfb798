"""Masked-attention transformer decoder (flax) — SURVEY.md X6.

Parity with HF (modeling_mask2former.py:1418-2097):
- 9 layers (decoder_layers − 1, HF:1790) cycling cross-attention over the 3
  pixel-decoder scales (level_index = idx % 3, HF:1878);
- layer order masked cross-attn → self-attn → FFN, post-norm (HF:1595-1651);
- the attention mask comes from the previous layer's mask prediction
  (sigmoid < 0.5 → masked), with the all-masked-row escape implemented as a
  multiply (HF:1880-1882);
- the mask predictor is a 3-layer MLP mask embedder + einsum with the pixel
  embeddings, bilinearly resized to the next level's size (HF:2008-2023);
- intermediate layernormed hidden states + per-layer mask logits are
  retained for the auxiliary losses (HF:1849-1900).

TPU notes: the masked cross-attention is an additive −1e9 bias (instead of a
bool mask) so everything is one fused softmax; the attention-mask resize is
the shared ``interpolate_bilinear`` gather. Batch-first (B, Q, C) layout
throughout (HF shuttles (Q, B, C); the math is identical).

Kernel decision record (SURVEY.md §7.1.4 north-star kernel #2): a Pallas
flash-style masked-attention kernel (scores/probs never leave VMEM) was
built and measured against this XLA path at the exact decoder shapes
(B=4, 8 heads, Q=200, D=32, S ∈ {10000, 2500, 625}, v5e) — the XLA
formulation wins at every shape/dtype: 0.92×/0.95×/0.94× (bf16) and
0.72×/0.88×/0.97× (f32) "speedup" for the kernel. With Q=200 the score
tensor is small (≤64 MB/layer), XLA already fuses bias+softmax into the
matmul chain, and the kernel's D=32 lane padding wastes 3/4 of the MXU.
Measurement harness: tools/ab_masked_attn.py.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp

from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig
from weed_instance_segmentation_tpu.models.position_embedding import sine_position_embedding
from weed_instance_segmentation_tpu.ops.resize import interpolate_bilinear

xavier_uniform = nn.initializers.xavier_uniform()

NEG_INF = -1e9


class MultiheadAttention(nn.Module):
    """Standard MHA matching both HF ``Mask2FormerAttention`` (self-attn,
    HF:1418-1553) and torch ``nn.MultiheadAttention`` (cross-attn) numerics:
    q scaled by head_dim**-0.5 before the score matmul, optional additive
    bias on the scores."""

    embed_dim: int
    num_heads: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, key, value, attn_bias=None, deterministic=True):
        """query: (B, T, C); key/value: (B, S, C);
        attn_bias: (B, num_heads, T, S) additive or None."""
        b, t, _ = query.shape
        s = key.shape[1]
        hd = self.embed_dim // self.num_heads

        q = nn.Dense(self.embed_dim, kernel_init=xavier_uniform, dtype=self.dtype, name='q_proj')(query)
        k = nn.Dense(self.embed_dim, kernel_init=xavier_uniform, dtype=self.dtype, name='k_proj')(key)
        v = nn.Dense(self.embed_dim, kernel_init=xavier_uniform, dtype=self.dtype, name='v_proj')(value)

        q = (q * (hd ** -0.5)).reshape(b, t, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, s, self.num_heads, hd).transpose(0, 2, 1, 3)

        scores = jnp.einsum('bhtd,bhsd->bhts', q, k)
        if attn_bias is not None:
            scores = scores + attn_bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(self.dropout, deterministic=deterministic)(probs)
        out = jnp.einsum('bhts,bhsd->bhtd', probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, self.embed_dim)
        return nn.Dense(self.embed_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                        name='out_proj')(out)


class MaskPredictor(nn.Module):
    """3-layer MLP mask embedder + einsum with pixel embeddings; also emits
    the binarized attention mask for the next layer (HF:2008-2023)."""

    config: Mask2FormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, pixel_embeddings, attn_target_hw):
        """hidden_states: (B, Q, C); pixel_embeddings: (B, H, W, Cmask) NHWC.
        Returns (mask_logits (B, Q, H, W), attn_bias (B, 1, Q, T))."""
        cfg = self.config
        x = hidden_states
        dims = [cfg.hidden_dim, cfg.hidden_dim, cfg.mask_feature_size]
        for i, d in enumerate(dims):
            x = nn.Dense(d, kernel_init=xavier_uniform, dtype=self.dtype,
                         name=f'mask_embedder_{i}')(x)
            if i < len(dims) - 1:
                x = nn.relu(x)
        # einsum bqc, bchw -> bqhw (HF:2014); NHWC here
        mask_logits = jnp.einsum('bqc,bhwc->bqhw', x, pixel_embeddings)

        attn = interpolate_bilinear(mask_logits, attn_target_hw)
        attn = jax.nn.sigmoid(attn).reshape(*attn.shape[:2], -1)  # (B, Q, T)
        masked = attn < 0.5  # True = blocked (HF:2021)
        # all-masked-row escape: rows with every position masked attend
        # everywhere (HF:1880-1882 multiply trick)
        row_has_visible = ~jnp.all(masked, axis=-1, keepdims=True)
        masked = masked & row_has_visible
        attn_bias = jnp.where(masked, NEG_INF, 0.0).astype(self.dtype)
        return mask_logits, attn_bias[:, None]  # broadcast over heads


class DecoderLayer(nn.Module):
    """Masked cross-attn → self-attn → FFN, post-norm (HF:1555-1651)."""

    config: Mask2FormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, key_feats, key_pos, query_pos, attn_bias,
                 deterministic=True):
        cfg = self.config

        residual = hidden_states
        x = MultiheadAttention(cfg.hidden_dim, cfg.num_attention_heads, cfg.dropout,
                               dtype=self.dtype, name='cross_attn')(
            query=hidden_states + query_pos,
            key=key_feats + key_pos,
            value=key_feats,
            attn_bias=attn_bias,
            deterministic=deterministic,
        )
        x = nn.Dropout(cfg.dropout, deterministic=deterministic)(x)
        x = residual + x
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='cross_attn_layer_norm')(x)

        residual = x
        y = MultiheadAttention(cfg.hidden_dim, cfg.num_attention_heads, cfg.dropout,
                               dtype=self.dtype, name='self_attn')(
            query=x + query_pos, key=x + query_pos, value=x,
            deterministic=deterministic,
        )
        y = nn.Dropout(cfg.dropout, deterministic=deterministic)(y)
        x = residual + y
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='self_attn_layer_norm')(x)

        residual = x
        if cfg.activation_function == 'relu':
            act = nn.relu
        elif cfg.activation_function == 'gelu':
            act = lambda t: jax.nn.gelu(t, approximate=False)
        else:
            raise ValueError(cfg.activation_function)
        y = nn.Dense(cfg.dim_feedforward, kernel_init=xavier_uniform, dtype=self.dtype,
                     name='fc1')(x)
        y = act(y)
        y = nn.Dropout(cfg.dropout, deterministic=deterministic)(y)
        y = nn.Dense(cfg.hidden_dim, kernel_init=xavier_uniform, dtype=self.dtype,
                     name='fc2')(y)
        y = nn.Dropout(cfg.dropout, deterministic=deterministic)(y)
        x = residual + y
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='final_layer_norm')(x)
        return x


class TransformerModule(nn.Module):
    """Query embeddings + masked-attention decoder over the 3 pixel-decoder
    scales (HF:2030-2097 + 1769-1930).

    Returns (intermediate_hidden_states tuple, masks_queries_logits tuple).
    """

    config: Mask2FormerConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, multi_scale_features, mask_features, deterministic=True):
        cfg = self.config
        nl = cfg.num_feature_levels
        b = multi_scale_features[0].shape[0]

        level_embed = self.param(
            'level_embed', nn.initializers.normal(cfg.init_std), (nl, cfg.hidden_dim)
        )

        key_feats, key_pos, size_list = [], [], []
        for i in range(nl):
            feat = multi_scale_features[i]  # NHWC
            h, w = feat.shape[1:3]
            size_list.append((h, w))
            pos = sine_position_embedding(h, w, num_pos_feats=cfg.hidden_dim // 2)
            key_pos.append(jnp.asarray(pos, self.dtype)[None].repeat(b, axis=0))
            flat = feat.reshape(b, h * w, -1)
            if cfg.enforce_input_projection or flat.shape[-1] != cfg.hidden_dim:
                flat = nn.Dense(cfg.hidden_dim, dtype=self.dtype, name=f'input_proj_{i}')(flat)
            key_feats.append(flat + level_embed[i][None, None])

        queries_embedder = self.param(
            'queries_embedder', nn.initializers.normal(cfg.init_std),
            (cfg.num_queries, cfg.hidden_dim),
        )
        queries_features = self.param(
            'queries_features', nn.initializers.normal(cfg.init_std),
            (cfg.num_queries, cfg.hidden_dim),
        )
        query_pos = jnp.broadcast_to(
            queries_embedder[None], (b, cfg.num_queries, cfg.hidden_dim)
        ).astype(self.dtype)
        hidden_states = jnp.broadcast_to(
            queries_features[None], (b, cfg.num_queries, cfg.hidden_dim)
        ).astype(self.dtype)

        layernorm = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name='layernorm')
        mask_predictor = MaskPredictor(cfg, dtype=self.dtype, name='mask_predictor')

        intermediate = []
        mask_logits_all = []

        inter = layernorm(hidden_states)
        intermediate.append(inter)
        pred_mask, attn_bias = mask_predictor(inter, mask_features, size_list[0])
        mask_logits_all.append(pred_mask)

        num_layers = cfg.decoder_layers - 1
        for idx in range(num_layers):
            level_index = idx % nl
            hidden_states = DecoderLayer(cfg, dtype=self.dtype, name=f'layer_{idx}')(
                hidden_states,
                key_feats[level_index],
                key_pos[level_index],
                query_pos,
                attn_bias,
                deterministic=deterministic,
            )
            inter = layernorm(hidden_states)
            pred_mask, attn_bias = mask_predictor(
                inter, mask_features, size_list[(idx + 1) % nl]
            )
            intermediate.append(inter)
            mask_logits_all.append(pred_mask)

        return tuple(intermediate), tuple(mask_logits_all)
