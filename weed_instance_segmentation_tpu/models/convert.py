"""HF PyTorch checkpoint → flax params converter.

Maps the ``Mask2FormerForUniversalSegmentation`` state dict (pinned
``transformers==4.57.6`` layout) onto this framework's parameter tree, so
that (a) the reference checkpoint can be loaded for mask-parity testing
(SURVEY.md X11) and (b) golden-tensor unit tests can compare randomly
initialized HF modules against ours.

Conventions: torch Linear weight (out,in) → flax kernel (in,out);
torch Conv (out,in,kh,kw) → flax NHWC kernel (kh,kw,in,out);
LayerNorm/GroupNorm weight → scale. torch ``nn.MultiheadAttention`` packs
q/k/v into ``in_proj_weight`` — split into thirds (rows) for our q/k/v.
"""

from __future__ import annotations

import numpy as np

from weed_instance_segmentation_tpu.models.configuration import Mask2FormerConfig, SwinConfig


def _lin(sd, name):
    return {'kernel': sd[f'{name}.weight'].T, 'bias': sd[f'{name}.bias']}


def _lin_nobias(sd, name):
    return {'kernel': sd[f'{name}.weight'].T}


def _conv(sd, name, bias=True):
    out = {'kernel': sd[f'{name}.weight'].transpose(2, 3, 1, 0)}
    if bias:
        out['bias'] = sd[f'{name}.bias']
    return out


def _norm(sd, name):
    return {'scale': sd[f'{name}.weight'], 'bias': sd[f'{name}.bias']}


def convert_swin_backbone(sd: dict, cfg: SwinConfig, prefix: str = '') -> dict:
    """Convert a HF SwinBackbone state dict subtree (numpy values)."""
    p = prefix
    params = {
        'patch_embed': _conv(sd, f'{p}embeddings.patch_embeddings.projection'),
        'embed_norm': _norm(sd, f'{p}embeddings.norm'),
    }
    for s in range(len(cfg.depths)):
        for b in range(cfg.depths[s]):
            bp = f'{p}encoder.layers.{s}.blocks.{b}'
            params[f'stage{s}_block{b}'] = {
                'layernorm_before': _norm(sd, f'{bp}.layernorm_before'),
                'layernorm_after': _norm(sd, f'{bp}.layernorm_after'),
                'attention': {
                    'query': _lin(sd, f'{bp}.attention.self.query'),
                    'key': _lin(sd, f'{bp}.attention.self.key'),
                    'value': _lin(sd, f'{bp}.attention.self.value'),
                    'output_dense': _lin(sd, f'{bp}.attention.output.dense'),
                    'relative_position_bias_table': sd[
                        f'{bp}.attention.self.relative_position_bias_table'
                    ],
                },
                'intermediate_dense': _lin(sd, f'{bp}.intermediate.dense'),
                'output_dense': _lin(sd, f'{bp}.output.dense'),
            }
        if s < len(cfg.depths) - 1:
            dp = f'{p}encoder.layers.{s}.downsample'
            params[f'downsample{s}'] = {
                'norm': _norm(sd, f'{dp}.norm'),
                'reduction': _lin_nobias(sd, f'{dp}.reduction'),
            }
    for k in range(1, len(cfg.depths) + 1):
        params[f'stage{k}_norm'] = _norm(sd, f'{p}hidden_states_norms.stage{k}')
    return params


def convert_pixel_decoder(sd: dict, cfg: Mask2FormerConfig, prefix: str) -> dict:
    p = prefix
    params = {'level_embed': sd[f'{p}level_embed']}
    for level in range(cfg.num_feature_levels):
        params[f'input_proj_{level}_conv'] = _conv(sd, f'{p}input_projections.{level}.0')
        params[f'input_proj_{level}_norm'] = _norm(sd, f'{p}input_projections.{level}.1')
    for i in range(cfg.encoder_layers):
        lp = f'{p}encoder.layers.{i}'
        params[f'encoder_layer_{i}'] = {
            'self_attn': {
                'sampling_offsets': _lin(sd, f'{lp}.self_attn.sampling_offsets'),
                'attention_weights': _lin(sd, f'{lp}.self_attn.attention_weights'),
                'value_proj': _lin(sd, f'{lp}.self_attn.value_proj'),
                'output_proj': _lin(sd, f'{lp}.self_attn.output_proj'),
            },
            'self_attn_layer_norm': _norm(sd, f'{lp}.self_attn_layer_norm'),
            'final_layer_norm': _norm(sd, f'{lp}.final_layer_norm'),
            'fc1': _lin(sd, f'{lp}.fc1'),
            'fc2': _lin(sd, f'{lp}.fc2'),
        }
    # FPN: HF names adapter_{k}/layer_{k}, k starting at 1, in original
    # (low→high stride) order; our fpn_*_{idx} follows the same indices.
    stride = min(cfg.feature_strides[-cfg.num_feature_levels:])
    num_fpn = int(np.log2(stride) - np.log2(cfg.common_stride))
    for idx in range(num_fpn):
        params[f'fpn_lateral_{idx}_conv'] = _conv(sd, f'{p}adapter_{idx + 1}.0', bias=False)
        params[f'fpn_lateral_{idx}_norm'] = _norm(sd, f'{p}adapter_{idx + 1}.1')
        params[f'fpn_output_{idx}_conv'] = _conv(sd, f'{p}layer_{idx + 1}.0', bias=False)
        params[f'fpn_output_{idx}_norm'] = _norm(sd, f'{p}layer_{idx + 1}.1')
    params['mask_projection'] = _conv(sd, f'{p}mask_projection')
    return params


def convert_transformer_module(sd: dict, cfg: Mask2FormerConfig, prefix: str) -> dict:
    p = prefix
    params = {
        'level_embed': sd[f'{p}level_embed.weight'],
        'queries_embedder': sd[f'{p}queries_embedder.weight'],
        'queries_features': sd[f'{p}queries_features.weight'],
        'layernorm': _norm(sd, f'{p}decoder.layernorm'),
        'mask_predictor': {
            f'mask_embedder_{i}': _lin(sd, f'{p}decoder.mask_predictor.mask_embedder.{i}.0')
            for i in range(3)
        },
    }
    dim = cfg.hidden_dim
    for i in range(cfg.decoder_layers - 1):
        lp = f'{p}decoder.layers.{i}'
        in_proj_w = sd[f'{lp}.cross_attn.in_proj_weight']
        in_proj_b = sd[f'{lp}.cross_attn.in_proj_bias']
        params[f'layer_{i}'] = {
            'cross_attn': {
                'q_proj': {'kernel': in_proj_w[:dim].T, 'bias': in_proj_b[:dim]},
                'k_proj': {'kernel': in_proj_w[dim : 2 * dim].T, 'bias': in_proj_b[dim : 2 * dim]},
                'v_proj': {'kernel': in_proj_w[2 * dim :].T, 'bias': in_proj_b[2 * dim :]},
                'out_proj': _lin(sd, f'{lp}.cross_attn.out_proj'),
            },
            'self_attn': {
                'q_proj': _lin(sd, f'{lp}.self_attn.q_proj'),
                'k_proj': _lin(sd, f'{lp}.self_attn.k_proj'),
                'v_proj': _lin(sd, f'{lp}.self_attn.v_proj'),
                'out_proj': _lin(sd, f'{lp}.self_attn.out_proj'),
            },
            'cross_attn_layer_norm': _norm(sd, f'{lp}.cross_attn_layer_norm'),
            'self_attn_layer_norm': _norm(sd, f'{lp}.self_attn_layer_norm'),
            'final_layer_norm': _norm(sd, f'{lp}.final_layer_norm'),
            'fc1': _lin(sd, f'{lp}.fc1'),
            'fc2': _lin(sd, f'{lp}.fc2'),
        }
    return params


def convert_hf_state_dict(sd: dict, cfg: Mask2FormerConfig) -> dict:
    """Full ``Mask2FormerForUniversalSegmentation`` state dict (numpy values)
    → flax params for ``models.mask2former.Mask2Former``."""
    if not isinstance(cfg.backbone_config, SwinConfig):
        raise ValueError('HF checkpoints only exist for Swin backbones')
    return {
        'backbone': convert_swin_backbone(
            sd, cfg.backbone_config, prefix='model.pixel_level_module.encoder.'
        ),
        'pixel_decoder': convert_pixel_decoder(
            sd, cfg, prefix='model.pixel_level_module.decoder.'
        ),
        'transformer_module': convert_transformer_module(
            sd, cfg, prefix='model.transformer_module.'
        ),
        'class_predictor': _lin(sd, 'class_predictor'),
    }


def torch_state_dict_to_numpy(model_or_sd) -> dict:
    """Detach a torch module/state-dict to {name: np.ndarray} (float32)."""
    sd = model_or_sd.state_dict() if hasattr(model_or_sd, 'state_dict') else model_or_sd
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def load_hf_checkpoint(path: str):
    """Load (config, flax params) from an HF checkpoint directory
    (safetensors or pytorch bin)."""
    import os

    cfg = Mask2FormerConfig.from_json(path)
    st_path = os.path.join(path, 'model.safetensors')
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        sd = load_file(st_path)
    else:
        import torch

        sd = torch_state_dict_to_numpy(
            torch.load(os.path.join(path, 'pytorch_model.bin'), map_location='cpu')
        )
    return cfg, convert_hf_state_dict(sd, cfg)
