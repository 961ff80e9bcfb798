"""ResNet backbone (flax, NHWC) with frozen batch norm.

The BASELINE.json configs 1-2 call for a Mask2Former-R50 variant; HF
Mask2Former only ships Swin backbones (HF:configuration_mask2former.py:131),
so this is a framework extension. Layout follows torchvision/detectron2
bottleneck ResNet with FrozenBatchNorm (the standard detection-backbone
choice): BN statistics are parameters, never updated, so the whole backbone
is a pure function — ideal under jit/pjit (no mutable batch stats to thread
through pmap/shard_map).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from weed_instance_segmentation_tpu.models.configuration import ResNetConfig


class FrozenBatchNorm(nn.Module):
    """y = (x - mean) / sqrt(var + eps) * scale + bias with all four as
    (trainable-if-you-want, but never batch-updated) parameters."""

    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param('scale', nn.initializers.ones, (self.features,))
        bias = self.param('bias', nn.initializers.zeros, (self.features,))
        mean = self.param('mean', nn.initializers.zeros, (self.features,))
        var = self.param('var', nn.initializers.ones, (self.features,))
        # fold into a single multiply-add (XLA fuses into the preceding conv)
        inv = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * inv + (bias - mean * inv).astype(self.dtype)


class Bottleneck(nn.Module):
    mid: int
    out: int
    stride: int
    downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        y = nn.Conv(self.mid, (1, 1), use_bias=False, dtype=self.dtype, name='conv1')(x)
        y = FrozenBatchNorm(self.mid, dtype=self.dtype, name='bn1')(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.mid, (3, 3), strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)), use_bias=False, dtype=self.dtype, name='conv2',
        )(y)
        y = FrozenBatchNorm(self.mid, dtype=self.dtype, name='bn2')(y)
        y = nn.relu(y)
        y = nn.Conv(self.out, (1, 1), use_bias=False, dtype=self.dtype, name='conv3')(y)
        y = FrozenBatchNorm(self.out, dtype=self.dtype, name='bn3')(y)
        if self.downsample:
            identity = nn.Conv(
                self.out, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, dtype=self.dtype, name='downsample_conv',
            )(x)
            identity = FrozenBatchNorm(self.out, dtype=self.dtype, name='downsample_bn')(identity)
        return nn.relu(y + identity)


class ResNetBackbone(nn.Module):
    """Returns the 4 stage feature maps (strides 4/8/16/32), NHWC."""

    config: ResNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray, deterministic: bool = True) -> list:
        cfg = self.config
        x = nn.Conv(
            cfg.embed_dim, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
            use_bias=False, dtype=self.dtype, name='stem_conv',
        )(pixel_values)
        x = FrozenBatchNorm(cfg.embed_dim, dtype=self.dtype, name='stem_bn')(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        features = []
        in_planes = cfg.embed_dim
        for stage, depth in enumerate(cfg.depths):
            mid = cfg.embed_dim * 2 ** stage
            out = mid * 4
            for blk in range(depth):
                stride = 2 if (blk == 0 and stage > 0) else 1
                x = Bottleneck(
                    mid=mid, out=out, stride=stride,
                    downsample=(blk == 0),
                    dtype=self.dtype, name=f'stage{stage}_block{blk}',
                )(x)
            in_planes = out
            features.append(x)
        return features
