"""Swin Transformer backbone in flax (TPU-native, NHWC layout).

Architecture parity with the pinned HF Swin backbone
(``transformers==4.57.6`` ``models/swin/modeling_swin.py``, surveyed as X2):
patch embed (4×4 conv + LN), stages of window / shifted-window attention with
learned relative-position bias, patch merging, and per-out-feature LayerNorms
(SWIN:1174-1258). ``always_partition=True`` backbone behavior (SWIN:1242):
the window size never shrinks; inputs are padded to window multiples.

TPU-first design notes:
- NHWC throughout (XLA TPU-native conv layout); window partition/reverse are
  reshapes+transposes that XLA folds into the attention einsums.
- The shifted-window attention mask and relative-position index are
  *trace-time numpy constants* (shapes are static under jit), so no device
  compute is spent building them.
- Cyclic shift is ``jnp.roll`` (lowered to cheap HBM-free slice/concat).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from weed_instance_segmentation_tpu.models.configuration import SwinConfig


def relative_position_index(window_size: int) -> np.ndarray:
    """Pairwise relative-position index inside a window (SWIN:415-426)."""
    coords = np.stack(np.meshgrid(np.arange(window_size), np.arange(window_size), indexing='ij'))
    coords_flat = coords.reshape(2, -1)
    relative = coords_flat[:, :, None] - coords_flat[:, None, :]
    relative = relative.transpose(1, 2, 0)
    relative[:, :, 0] += window_size - 1
    relative[:, :, 1] += window_size - 1
    relative[:, :, 0] *= 2 * window_size - 1
    return relative.sum(-1)  # (ws^2, ws^2)


def shifted_window_attn_mask(height: int, width: int, window_size: int, shift: int) -> np.ndarray:
    """Additive attention mask for SW-MSA built from 9 region slices, fill
    value −100.0 exactly as HF (SWIN:594-620). Returns (num_windows, ws², ws²)."""
    img_mask = np.zeros((height, width))
    slices = (
        slice(0, -window_size),
        slice(-window_size, -shift),
        slice(-shift, None),
    )
    count = 0
    for hs in slices:
        for ws_ in slices:
            img_mask[hs, ws_] = count
            count += 1
    nh, nw = height // window_size, width // window_size
    windows = img_mask.reshape(nh, window_size, nw, window_size)
    windows = windows.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    diff = windows[:, None, :] - windows[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) → (B·nW, ws², C); H, W divisible by ws."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, c)


def window_reverse(windows: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    """(B·nW, ws², C) → (B, H, W, C)."""
    c = windows.shape[-1]
    x = windows.reshape(-1, h // ws, w // ws, ws, ws, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, w, c)


class WindowAttention(nn.Module):
    """W-MSA with learned relative position bias (SWIN:399-491).

    Kernel decision record (SURVEY.md §7.1.4): a Pallas kernel fusing
    QKᵀ + bias + softmax + PV per group of windows was built and measured
    against this XLA path at Swin-L 800×800 stage-1/2 shapes (v5e,
    tools/ab_window_attn.py): 0.99×/0.97× (bf16), 0.97×/1.04× (f32) — a
    wash. With T=144-token windows the batched einsums already saturate
    the MXU and XLA fuses bias+softmax between them; the kernel adds VMEM
    pressure (>16 MB at 34 windows/block) for no bandwidth win. The XLA
    formulation stays."""

    config: SwinConfig
    dim: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, attn_mask: Optional[np.ndarray], deterministic: bool):
        cfg = self.config
        ws = cfg.window_size
        nw, tokens, _ = x.shape
        head_dim = self.dim // self.num_heads

        q = nn.Dense(self.dim, use_bias=cfg.qkv_bias, dtype=self.dtype, name='query')(x)
        k = nn.Dense(self.dim, use_bias=cfg.qkv_bias, dtype=self.dtype, name='key')(x)
        v = nn.Dense(self.dim, use_bias=cfg.qkv_bias, dtype=self.dtype, name='value')(x)

        def split_heads(t):
            return t.reshape(nw, tokens, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scores = jnp.einsum('whqd,whkd->whqk', q, k) / math.sqrt(head_dim)

        bias_table = self.param(
            'relative_position_bias_table',
            nn.initializers.zeros,
            ((2 * ws - 1) * (2 * ws - 1), self.num_heads),
        )
        rel_idx = relative_position_index(ws).reshape(-1)
        rel_bias = bias_table[rel_idx].reshape(ws * ws, ws * ws, self.num_heads)
        rel_bias = rel_bias.transpose(2, 0, 1).astype(self.dtype)
        # Materialize the gathered bias: without this barrier XLA fuses the
        # (ws⁴,)-row gather into the (windows × heads × ws⁴) mask-add loop and
        # re-executes it per window — measured 3930ms → 17.6ms per stage-1
        # Swin-L block at 800×800 on v5e.
        rel_bias = jax.lax.optimization_barrier(rel_bias)
        scores = scores + rel_bias[None]

        if attn_mask is not None:
            # attn_mask: (num_windows, tokens, tokens) trace-time constant
            n_img_windows = attn_mask.shape[0]
            scores = scores.reshape(-1, n_img_windows, self.num_heads, tokens, tokens)
            scores = scores + jnp.asarray(attn_mask, dtype=self.dtype)[None, :, None]
            scores = scores.reshape(-1, self.num_heads, tokens, tokens)

        probs = jax.nn.softmax(scores, axis=-1)
        probs = nn.Dropout(cfg.attention_probs_dropout_prob, deterministic=deterministic)(probs)
        out = jnp.einsum('whqk,whkd->whqd', probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(nw, tokens, self.dim)
        out = nn.Dense(self.dim, dtype=self.dtype, name='output_dense')(out)
        out = nn.Dropout(cfg.attention_probs_dropout_prob, deterministic=deterministic)(out)
        return out


class SwinBlock(nn.Module):
    """One Swin layer: LN → (S)W-MSA → residual(+droppath) → LN → MLP →
    residual (SWIN:572-694)."""

    config: SwinConfig
    dim: int
    num_heads: int
    shift_size: int
    drop_path_rate: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool):
        cfg = self.config
        ws = cfg.window_size
        b, h, w, c = x.shape
        shortcut = x

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name='layernorm_before')(x)

        # pad bottom/right to window multiples (SWIN:622-627)
        pad_b = (ws - h % ws) % ws
        pad_r = (ws - w % ws) % ws
        if pad_b or pad_r:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r

        shift = self.shift_size
        if shift > 0:
            x = jnp.roll(x, shift=(-shift, -shift), axis=(1, 2))
            attn_mask = shifted_window_attn_mask(hp, wp, ws, shift)
        else:
            attn_mask = None

        windows = window_partition(x, ws)
        attn = WindowAttention(cfg, self.dim, self.num_heads, dtype=self.dtype, name='attention')(
            windows, attn_mask, deterministic
        )
        x = window_reverse(attn, ws, hp, wp)

        if shift > 0:
            x = jnp.roll(x, shift=(shift, shift), axis=(1, 2))
        if pad_b or pad_r:
            x = x[:, :h, :w]

        x = self._drop_path(x, deterministic)
        x = shortcut + x

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name='layernorm_after')(x)
        y = nn.Dense(int(cfg.mlp_ratio * self.dim), dtype=self.dtype, name='intermediate_dense')(y)
        y = jax.nn.gelu(y, approximate=False)  # torch F.gelu is erf-exact
        y = nn.Dense(self.dim, dtype=self.dtype, name='output_dense')(y)
        y = nn.Dropout(cfg.hidden_dropout_prob, deterministic=deterministic)(y)
        return x + self._drop_path(y, deterministic)

    def _drop_path(self, x, deterministic):
        rate = self.drop_path_rate
        if rate == 0.0 or deterministic:
            return x
        rng = self.make_rng('dropout')
        keep = 1.0 - rate
        mask = jax.random.bernoulli(rng, keep, shape=(x.shape[0],) + (1,) * (x.ndim - 1))
        return x / keep * mask.astype(x.dtype)


class PatchMerging(nn.Module):
    """2×2 patch merging: 4-way slice concat → LN(4C) → Dense(2C, no bias)
    (SWIN:309-361)."""

    config: SwinConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        f0 = x[:, 0::2, 0::2]
        f1 = x[:, 1::2, 0::2]
        f2 = x[:, 0::2, 1::2]
        f3 = x[:, 1::2, 1::2]
        x = jnp.concatenate([f0, f1, f2, f3], axis=-1)
        x = nn.LayerNorm(epsilon=self.config.layer_norm_eps, dtype=self.dtype, name='norm')(x)
        x = nn.Dense(2 * c, use_bias=False, dtype=self.dtype, name='reduction')(x)
        return x


class SwinBackbone(nn.Module):
    """Backbone returning the 4 per-stage NHWC feature maps, each LayerNormed
    (SWIN:1174-1258, hidden_states_norms at SWIN:1185-1188)."""

    config: SwinConfig
    dtype: jnp.dtype = jnp.float32
    remat: bool = False  # recompute block activations in backward (config.REMAT)

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True) -> list:
        """pixel_values: (B, H, W, 3) NHWC. Returns [stage1..stage4] NHWC."""
        cfg = self.config
        ps = cfg.patch_size
        Block = nn.remat(SwinBlock, static_argnums=(2,)) if self.remat else SwinBlock

        # patch embedding: pad to patch multiples then 4×4/4 conv + LN
        b, h, w, _ = pixel_values.shape
        pad_b = (ps - h % ps) % ps
        pad_r = (ps - w % ps) % ps
        if pad_b or pad_r:
            pixel_values = jnp.pad(pixel_values, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        x = nn.Conv(
            cfg.embed_dim, kernel_size=(ps, ps), strides=(ps, ps), padding='VALID',
            dtype=self.dtype, name='patch_embed',
        )(pixel_values)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype, name='embed_norm')(x)
        x = nn.Dropout(cfg.hidden_dropout_prob, deterministic=deterministic)(x)

        # stochastic depth schedule (SWIN:732)
        total = sum(cfg.depths)
        dpr = np.linspace(0, cfg.drop_path_rate, total)

        features = []
        block_idx = 0
        num_stages = len(cfg.depths)
        for stage in range(num_stages):
            dim = int(cfg.embed_dim * 2 ** stage)
            for blk in range(cfg.depths[stage]):
                x = Block(
                    cfg, dim=dim, num_heads=cfg.num_heads[stage],
                    shift_size=0 if blk % 2 == 0 else cfg.window_size // 2,
                    drop_path_rate=float(dpr[block_idx]),
                    dtype=self.dtype,
                    name=f'stage{stage}_block{blk}',
                )(x, deterministic)
                block_idx += 1
            # out-feature norm on the before-downsampling states
            feat = nn.LayerNorm(
                epsilon=1e-5, dtype=self.dtype, name=f'stage{stage + 1}_norm'
            )(x)
            features.append(feat)
            if stage < num_stages - 1:
                x = PatchMerging(cfg, dtype=self.dtype, name=f'downsample{stage}')(x)

        return features
