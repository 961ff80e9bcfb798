"""HF checkpoint directory → our framework, end to end (SURVEY.md X11).

Creates a real HF ``save_pretrained`` directory from a random tiny torch
Mask2Former (the exact artifact layout of the reference's
``facebook/mask2former-swin-large-coco-instance``), loads it through
``engine.checkpoint.load_pretrained`` (→ models.convert.load_hf_checkpoint),
and checks forward + post-processed mask parity against the torch model.
This is the offline stand-in for BASELINE.json parity gate 1.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

transformers = pytest.importorskip('transformers')
from transformers.models.mask2former import modeling_mask2former as hf_m2f  # noqa: E402
from transformers.models.mask2former.image_processing_mask2former import (  # noqa: E402
    Mask2FormerImageProcessor as HFProcessor,
)
from transformers.models.swin.configuration_swin import SwinConfig as HFSwinConfig  # noqa: E402

from weed_instance_segmentation_tpu.engine import checkpoint as ckpt
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former
from weed_instance_segmentation_tpu.processing.postprocess import (
    post_process_instance_segmentation,
)


@pytest.fixture(scope='module')
def hf_checkpoint_dir(tmp_path_factory):
    torch.manual_seed(3)
    swin = HFSwinConfig(
        image_size=224, patch_size=4, num_channels=3, embed_dim=16,
        depths=[1, 1, 1, 1], num_heads=[1, 2, 2, 2], window_size=4,
        drop_path_rate=0.0, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        out_features=['stage1', 'stage2', 'stage3', 'stage4'],
        use_absolute_embeddings=False,
    )
    cfg = hf_m2f.Mask2FormerConfig(
        backbone_config=swin, feature_size=32, mask_feature_size=32, hidden_dim=32,
        encoder_feedforward_dim=32, dim_feedforward=64, encoder_layers=2,
        decoder_layers=4, num_attention_heads=2, num_queries=10,
        num_labels=3, dropout=0.0,
        id2label={0: 'crop', 1: 'weed', 2: 'grass'},
        label2id={'crop': 0, 'weed': 1, 'grass': 2},
    )
    model = hf_m2f.Mask2FormerForUniversalSegmentation(cfg).eval()
    d = tmp_path_factory.mktemp('hf_ckpt')
    model.save_pretrained(str(d))
    HFProcessor(size={'shortest_edge': 64, 'longest_edge': 96}).save_pretrained(str(d))
    return str(d), model


def test_load_and_forward_parity(hf_checkpoint_dir, rng):
    path, hf_model = hf_checkpoint_dir
    cfg, params = ckpt.load_pretrained(path)
    assert cfg.num_labels == 3
    assert cfg.id2label == {0: 'crop', 1: 'weed', 2: 'grass'}

    x = rng.standard_normal((1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        want = hf_model(pixel_values=torch.from_numpy(x))

    model = Mask2Former(cfg)
    got = model.apply({'params': params}, jnp.asarray(x), deterministic=True)
    np.testing.assert_allclose(
        np.asarray(got.class_queries_logits), want.class_queries_logits.numpy(), atol=5e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.masks_queries_logits), want.masks_queries_logits.numpy(), atol=5e-4
    )


def test_instance_masks_match_reference(hf_checkpoint_dir, rng):
    """Full inference parity: forward + post-process → same instance masks
    (BASELINE gate 1, with a random checkpoint standing in for the real one)."""
    path, hf_model = hf_checkpoint_dir
    cfg, params = ckpt.load_pretrained(path)
    processor = ckpt.load_processor(path)
    assert processor.size == {'shortest_edge': 64, 'longest_edge': 96}

    x = rng.standard_normal((1, 3, 64, 96)).astype(np.float32)
    with torch.no_grad():
        want_out = hf_model(pixel_values=torch.from_numpy(x))
    hf_proc = HFProcessor(size={'shortest_edge': 64, 'longest_edge': 96})
    want = hf_proc.post_process_instance_segmentation(
        want_out, threshold=0.1, target_sizes=[(60, 90)], return_binary_maps=True
    )[0]

    model = Mask2Former(cfg)
    got_out = model.apply({'params': params}, jnp.asarray(x), deterministic=True)
    got = post_process_instance_segmentation(
        got_out, threshold=0.1, target_sizes=[(60, 90)], return_binary_maps=True
    )[0]

    want_maps = want['segmentation'].numpy() if hasattr(want['segmentation'], 'numpy') \
        else np.asarray(want['segmentation'])
    got_maps = np.asarray(got['segmentation'])
    assert got_maps.shape == want_maps.shape
    # order-invariant per-instance mask identity
    used = set()
    for wm in want_maps:
        hit = [k for k in range(len(got_maps)) if k not in used and (got_maps[k] == wm).all()]
        assert hit, 'instance mask from the torch reference missing in ours'
        used.add(hit[0])


def test_roundtrip_through_our_format(hf_checkpoint_dir, tmp_path, rng):
    """HF dir → our params → save_pretrained (npz) → load → identical."""
    path, _ = hf_checkpoint_dir
    cfg, params = ckpt.load_pretrained(path)
    out = str(tmp_path / 'ours')
    ckpt.save_pretrained(out, params, cfg)
    cfg2, params2 = ckpt.load_pretrained(out)
    assert cfg2.num_labels == cfg.num_labels
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resolve_model_path_latest(tmp_path, monkeypatch):
    """'latest' in a model id resolves to the newest run dir (name order ==
    time order for YYYY-MM-DD_HH-MM-SS); explicit ids pass through, and a
    literal 'latest' directory wins over resolution."""
    from weed_instance_segmentation_tpu import config
    from weed_instance_segmentation_tpu.engine.model_utils import resolve_model_path

    monkeypatch.setattr(config, 'MODELS_OUTPUT_DIR', str(tmp_path))
    base = tmp_path / 'mask2former_fine_tuned'
    for run in ('2026-01-02_00-00-00', '2026-01-10_12-30-00'):
        (base / run / 'best_model').mkdir(parents=True)

    got = resolve_model_path('mask2former_fine_tuned/latest/best_model/')
    assert got.rstrip('/') == str(base / '2026-01-10_12-30-00' / 'best_model')

    explicit = 'mask2former_fine_tuned/2026-01-02_00-00-00/best_model'
    assert resolve_model_path(explicit) == str(tmp_path / explicit)

    (base / 'latest' / 'best_model').mkdir(parents=True)
    got = resolve_model_path('mask2former_fine_tuned/latest/best_model/')
    assert got.rstrip('/') == str(base / 'latest' / 'best_model')
