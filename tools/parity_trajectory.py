"""Statistical training-trajectory parity vs the torch reference stack.

VERDICT r2 #2 / SURVEY §7.4.3 / BASELINE config 3: identical-init,
identical-data short fine-tunes of the torch reference stack (HF
Mask2FormerForUniversalSegmentation + torch AdamW — the exact stack
/root/reference/models/mask2former/train.py:196-206 drives) and this
framework, compared as LOSS TRAJECTORIES, plus a step-0 matcher-assignment
equality check on fixed sample points.

What must agree and what can't: both stacks share init (models/convert),
data (the same .npz cache samples), optimizer hyperparameters (AdamW
lr/betas/eps/wd=0.01 — torch defaults), and loss formulas (tests/
test_losses.py). The mask/dice losses are POINT-SAMPLED with each stack's
own RNG, so per-step losses carry sampling noise of O(1/sqrt(P)); with
P=1024 points the trajectories must track within a tight band, but not
bit-match. The pass criteria are therefore:
  1. step-0 matcher assignments identical per layer on fixed points
     (tie-safe: equal optimal LAP cost);
  2. smoothed (k-step moving average) trajectories agree within
     PT_REL_BAND relative at every step;
  3. both trajectories actually descend (final < initial).

Env knobs: PT_STEPS (50), PT_POINTS (1024), PT_LR (1e-4), PT_HW (128),
PT_IMAGES (4), PT_BATCH (2), PT_REL_BAND (0.15), PT_OUT,
PT_DTYPE (float32) — our stack's compute dtype; PT_DTYPE=bfloat16 vs torch
f32 bounds the mixed-precision drift of the SHIPPING config (VERDICT r4
#6; use a wider PT_REL_BAND — bf16 adds real rounding on top of sampling
noise). Both trajectory loops persist a partial record every 10 steps so
long runs survive crashes.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

STEPS = int(os.environ.get('PT_STEPS', '50'))
POINTS = int(os.environ.get('PT_POINTS', '1024'))
LR = float(os.environ.get('PT_LR', '1e-4'))
HW = int(os.environ.get('PT_HW', '128'))
N_IMAGES = int(os.environ.get('PT_IMAGES', '4'))
BATCH = int(os.environ.get('PT_BATCH', '2'))
REL_BAND = float(os.environ.get('PT_REL_BAND', '0.15'))
SMOOTH = int(os.environ.get('PT_SMOOTH', '5'))
DTYPE = os.environ.get('PT_DTYPE', 'float32')
# 'tiny-test' (default) or 'swin-tiny' (VERDICT r4 #5: a REAL backbone arm —
# swin-tiny geometry exercises shifted windows, even-depth stages and
# patch merging at real channel counts, which the tiny config bypasses;
# heads stay compact to keep the torch-CPU arm affordable)
ARCH = os.environ.get('PT_ARCH', 'tiny-test')


def _flush_partial(tag: str, losses: list) -> None:
    """Crash-safe incremental curve record (like the overfit gate's)."""
    out = os.environ.get('PT_OUT')
    if out and len(losses) % 10 == 0:
        try:
            with open(out + '.partial', 'a') as f:
                f.write(json.dumps({tag: losses[-10:]}) + '\n')
        except OSError:
            pass


def build_pair(num_labels: int = 2, points: int = POINTS):
    """(hf torch model, our flax model, our cfg, converted params) with
    IDENTICAL weights (tests/test_model_parity.py::_tiny_pair geometry)."""
    import torch
    from transformers.models.mask2former import modeling_mask2former as hf_m2f
    from transformers.models.swin.configuration_swin import SwinConfig as HFSwinConfig

    from weed_instance_segmentation_tpu.models.configuration import (
        Mask2FormerConfig, SwinConfig,
    )
    from weed_instance_segmentation_tpu.models.convert import (
        convert_hf_state_dict, torch_state_dict_to_numpy,
    )
    from weed_instance_segmentation_tpu.models.mask2former import Mask2Former

    torch.manual_seed(1)
    if ARCH == 'swin-tiny':
        # real swin-tiny backbone (HF SwinConfig defaults: shifted windows
        # kick in from block 2 of every stage, patch merging between stages)
        # with compact heads — the backbone is what this arm scales up
        swin_kw = dict(embed_dim=96, depths=[2, 2, 6, 2],
                       num_heads=[3, 6, 12, 24], window_size=7,
                       drop_path_rate=0.0, hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
        head_kw = dict(feature_size=64, mask_feature_size=64, hidden_dim=64,
                       encoder_feedforward_dim=64, dim_feedforward=128,
                       encoder_layers=2, decoder_layers=4,
                       num_attention_heads=4, num_queries=20)
        our_swin = dict(embed_dim=96, depths=(2, 2, 6, 2),
                        num_heads=(3, 6, 12, 24), window_size=7,
                        drop_path_rate=0.0)
    else:
        swin_kw = dict(embed_dim=16, depths=[1, 1, 1, 1],
                       num_heads=[1, 2, 2, 2], window_size=4,
                       drop_path_rate=0.0, hidden_dropout_prob=0.0,
                       attention_probs_dropout_prob=0.0)
        head_kw = dict(feature_size=32, mask_feature_size=32, hidden_dim=32,
                       encoder_feedforward_dim=32, dim_feedforward=64,
                       encoder_layers=2, decoder_layers=4,
                       num_attention_heads=2, num_queries=10)
        our_swin = dict(embed_dim=16, depths=(1, 1, 1, 1),
                        num_heads=(1, 2, 2, 2), window_size=4,
                        drop_path_rate=0.0)
    hf_cfg = hf_m2f.Mask2FormerConfig(
        backbone_config=HFSwinConfig(
            image_size=224, patch_size=4, num_channels=3,
            out_features=['stage1', 'stage2', 'stage3', 'stage4'],
            use_absolute_embeddings=False, **swin_kw,
        ),
        num_labels=num_labels, dropout=0.0,
        train_num_points=points, **head_kw,
    )
    hf = hf_m2f.Mask2FormerForUniversalSegmentation(hf_cfg)

    cfg = Mask2FormerConfig(
        backbone_config=SwinConfig(**our_swin),
        num_labels=num_labels, train_num_points=points, **head_kw,
    )
    params = convert_hf_state_dict(torch_state_dict_to_numpy(hf), cfg)
    import jax.numpy as jnp

    return hf, Mask2Former(cfg, dtype=jnp.dtype(DTYPE)), cfg, params


def load_samples(workdir: str, hw: int, n_images: int) -> list[dict]:
    """Fixture → real preprocess path → list of cached sample dicts."""
    from overfit_gate import LABEL2ID, make_fixture

    from weed_instance_segmentation_tpu.datasets.dataset_utils import (
        PreprocessedDataset, process_and_save,
    )
    from weed_instance_segmentation_tpu.datasets.sorghum_weed.dataset import (
        SorghumWeedDataset,
    )
    from weed_instance_segmentation_tpu.processing.image_processor import (
        Mask2FormerImageProcessor,
    )

    fixture_dir = os.path.join(workdir, 'raw')
    cache_dir = os.path.join(workdir, 'processed', 'Train')
    make_fixture(fixture_dir, n=n_images, hw=hw)
    processor = Mask2FormerImageProcessor(
        size={'shortest_edge': hw, 'longest_edge': hw}, ignore_index=None,
    )
    raw = SorghumWeedDataset(
        image_folder_path=os.path.join(fixture_dir, 'Train'),
        annotation_path=os.path.join(fixture_dir, 'Annotations',
                                     'TrainSorghumWeed_json.json'),
        processor=processor,
        label2id=LABEL2ID,
    )
    process_and_save(raw, output_dir=cache_dir)
    ds = PreprocessedDataset(cache_dir)
    return [ds[i] for i in range(len(ds))]


def torch_trajectory(hf, samples: list[dict], steps: int, lr: float,
                     batch: int) -> list[float]:
    """The reference training loop (train.py:196-206): per batch forward with
    labels → backward → AdamW (defaults). Fixed round-robin batch order."""
    import torch

    hf.train()
    opt = torch.optim.AdamW(hf.parameters(), lr=lr)
    losses = []
    n = len(samples)
    for step in range(steps):
        idxs = [(step * batch + k) % n for k in range(batch)]
        x = torch.from_numpy(np.stack([samples[i]['pixel_values'] for i in idxs]))
        masks = [torch.from_numpy(samples[i]['mask_labels'].astype(np.float32))
                 for i in idxs]
        classes = [torch.from_numpy(samples[i]['class_labels']) for i in idxs]
        out = hf(pixel_values=x, mask_labels=masks, class_labels=classes)
        out.loss.backward()
        opt.step()
        opt.zero_grad()
        losses.append(float(out.loss.detach()))
        print(f'  torch step {step + 1}/{steps}: {losses[-1]:.4f}', flush=True)
        _flush_partial('torch', losses)
    return losses


def ours_trajectory(model, cfg, params, samples: list[dict], steps: int,
                    lr: float, batch: int) -> tuple[list[float], object]:
    """Same data/order through this framework's jitted train step."""
    import jax

    from weed_instance_segmentation_tpu.datasets.dataset_utils import pad_batch_static
    from weed_instance_segmentation_tpu.engine.steps import (
        create_train_state, make_train_step,
    )

    state, tx = create_train_state(params, lr, gradient_accumulation=1)
    train_step = make_train_step(model, cfg, tx)
    rng = jax.random.PRNGKey(42)
    max_instances = max(s['mask_labels'].shape[0] for s in samples)
    hw = samples[0]['pixel_values'].shape[1:]
    losses = []
    n = len(samples)
    for step in range(steps):
        idxs = [(step * batch + k) % n for k in range(batch)]
        dev_batch = pad_batch_static([
            {'pixel_values': samples[i]['pixel_values'],
             'mask_labels': samples[i]['mask_labels'],
             'class_labels': samples[i]['class_labels']}
            for i in idxs
        ], hw, max_instances)
        state, loss = train_step(state, dev_batch, rng)
        losses.append(float(loss))
        print(f'  ours step {step + 1}/{steps}: {losses[-1]:.4f}', flush=True)
        _flush_partial('ours', losses)
    return losses, state


def step0_matcher_agreement(hf, model, cfg, params, samples: list[dict],
                            batch: int) -> dict:
    """Per-layer matcher check at step 0 on FIXED points: our on-device LAP
    assignment must achieve the HF cost matrix's optimal cost (tie-safe
    equality of the optimum, built from REAL model outputs on real data)."""
    import torch
    from scipy.optimize import linear_sum_assignment as scipy_lap
    from transformers.models.mask2former import modeling_mask2former as hf_m2f

    import jax
    import jax.numpy as jnp

    from weed_instance_segmentation_tpu.losses.criterion import hungarian_match

    idxs = list(range(min(batch, len(samples))))
    x = np.stack([samples[i]['pixel_values'] for i in idxs])
    with torch.no_grad():
        hf.eval()
        want = hf(pixel_values=torch.from_numpy(x), output_auxiliary_logits=True)
        hf.train()
    outputs = jax.jit(
        lambda p, v: model.apply({'params': p}, v, deterministic=True)
    )(params, jnp.asarray(x))

    layers = [(np.asarray(outputs.masks_queries_logits),
               np.asarray(outputs.class_queries_logits),
               want.masks_queries_logits.numpy(),
               want.class_queries_logits.numpy())]
    for g_cls, g_mask, aux in zip(outputs.aux_class_queries_logits,
                                  outputs.aux_masks_queries_logits,
                                  want.auxiliary_logits):
        layers.append((np.asarray(g_mask), np.asarray(g_cls),
                       aux['masks_queries_logits'].numpy(),
                       aux['class_queries_logits'].numpy()))

    p = cfg.train_num_points
    coords = np.random.default_rng(3).random((len(idxs), p, 2)).astype(np.float32)
    n_max = max(samples[i]['mask_labels'].shape[0] for i in idxs)
    tm = np.zeros((len(idxs), n_max, *samples[0]['mask_labels'].shape[1:]), np.float32)
    tc = np.zeros((len(idxs), n_max), np.int32)
    tv = np.zeros((len(idxs), n_max), bool)
    for k, i in enumerate(idxs):
        n_i = samples[i]['mask_labels'].shape[0]
        tm[k, :n_i] = samples[i]['mask_labels']
        tc[k, :n_i] = samples[i]['class_labels']
        tv[k, :n_i] = True

    results = []
    for li, (ours_m, ours_c, hf_m, hf_c) in enumerate(layers):
        assigned = np.asarray(hungarian_match(
            jnp.asarray(ours_m), jnp.asarray(ours_c), jnp.asarray(tm),
            jnp.asarray(tc), jnp.asarray(tv), rng=jax.random.PRNGKey(0),
            num_points=p, class_weight=cfg.class_weight,
            mask_weight=cfg.mask_weight, dice_weight=cfg.dice_weight,
            point_coords=jnp.asarray(coords),
        ))
        layer_ok = True
        for k in range(len(idxs)):
            n_k = int(tv[k].sum())
            cost = _hf_cost(hf_m[k], hf_c[k], tm[k, :n_k], tc[k, :n_k], coords[k],
                            cfg, hf_m2f, scipy_lap)
            rows, cols = scipy_lap(cost)
            want_opt = float(cost[rows, cols].sum())
            got_opt = float(cost[assigned[k, :n_k], np.arange(n_k)].sum())
            if not np.isclose(got_opt, want_opt, rtol=1e-4, atol=1e-5):
                layer_ok = False
        results.append(layer_ok)
    return {'layers_checked': len(results), 'layers_agree': int(sum(results)),
            'all_agree': bool(all(results))}


def _hf_cost(mask_logits, class_logits, tmasks, tclasses, coords, cfg,
             hf_m2f, scipy_lap):
    """HF matcher cost (HF:450-477) for one image on fixed coords — note the
    HF cost is (Q, N); ours is its transpose."""
    import torch

    pred_probs = torch.from_numpy(class_logits).softmax(-1)
    cost_class = -pred_probs[:, torch.from_numpy(tclasses).long()]
    pc = torch.from_numpy(coords)[None]
    tgt = hf_m2f.sample_point(
        torch.from_numpy(tmasks)[:, None], pc.repeat(tmasks.shape[0], 1, 1),
        align_corners=False,
    ).squeeze(1)
    pred = hf_m2f.sample_point(
        torch.from_numpy(mask_logits)[:, None],
        pc.repeat(mask_logits.shape[0], 1, 1), align_corners=False,
    ).squeeze(1)
    cost = (
        cfg.mask_weight * hf_m2f.pair_wise_sigmoid_cross_entropy_loss(pred, tgt)
        + cfg.class_weight * cost_class
        + cfg.dice_weight * hf_m2f.pair_wise_dice_loss(pred, tgt)
    )
    cost = torch.clamp(cost, -1e10, 1e10)
    return torch.nan_to_num(cost, 0).numpy()


def smooth(xs: list[float], k: int = SMOOTH) -> np.ndarray:
    xs = np.asarray(xs, np.float64)
    return np.convolve(xs, np.ones(k) / k, mode='valid')


def run_study(steps: int = STEPS, lr: float = LR, hw: int = HW,
              n_images: int = N_IMAGES, batch: int = BATCH) -> dict:
    import tempfile

    t0 = time.perf_counter()
    hf, model, cfg, params = build_pair(points=POINTS)
    with tempfile.TemporaryDirectory(prefix='parity_traj_') as workdir:
        samples = load_samples(workdir, hw, n_images)

    matcher = step0_matcher_agreement(hf, model, cfg, params, samples, batch)
    print(f'step-0 matcher agreement: {matcher}', flush=True)

    ours, _ = ours_trajectory(model, cfg, params, samples, steps, lr, batch)
    torch_losses = torch_trajectory(hf, samples, steps, lr, batch)

    s_ours, s_torch = smooth(ours), smooth(torch_losses)
    rel = np.abs(s_ours - s_torch) / np.maximum(np.abs(s_torch), 1e-9)
    record = {
        'arch': ARCH,
        'steps': steps, 'lr': lr, 'hw': hw, 'n_images': n_images,
        'batch': batch, 'points': POINTS, 'smooth_k': SMOOTH,
        'ours_dtype': DTYPE, 'torch_dtype': 'float32',
        'rel_band': REL_BAND,
        'matcher_step0': matcher,
        'ours_losses': [round(v, 4) for v in ours],
        'torch_losses': [round(v, 4) for v in torch_losses],
        'max_smoothed_rel_diff': round(float(rel.max()), 4),
        'ours_descends': bool(s_ours[-1] < s_ours[0]),
        'torch_descends': bool(s_torch[-1] < s_torch[0]),
        'elapsed_s': round(time.perf_counter() - t0, 1),
    }
    # Step-0 matcher agreement is an f32-vs-f32 expectation: identical cost
    # matrices must produce identical Hungarian assignments. Under bf16
    # compute the forward rounds differently, so near-tie assignments
    # legitimately flip (observed 2/4 layers at bf16 while the smoothed loss
    # band held at 0.0088 vs a 0.30 allowance) — for mixed-dtype arms the
    # banded trajectory IS the parity claim, so agreement is recorded but
    # not gating.
    record['passed'] = bool(
        (matcher['all_agree'] or DTYPE != 'float32')
        and record['max_smoothed_rel_diff'] <= REL_BAND
        and record['ours_descends'] and record['torch_descends']
    )
    return record


def main() -> int:
    out = os.environ.get('PT_OUT') or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), 'records',
        'parity_trajectory.json',
    )
    record = run_study()
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, 'w') as f:
        json.dump(record, f, indent=2)
    print(json.dumps({k: v for k, v in record.items()
                      if k not in ('ours_losses', 'torch_losses')}))
    print(f'TRAJECTORY PARITY {"PASSED" if record["passed"] else "FAILED"} -> {out}')
    return 0 if record['passed'] else 1


if __name__ == '__main__':
    sys.exit(main())
