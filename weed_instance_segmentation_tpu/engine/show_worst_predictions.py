"""Worst-prediction explorer (SURVEY.md C15; reference
models/mask2former/show_worst_predictions.py).

Scores every test image individually — per-image COCO mAP via a
reset/update/compute cycle per sample (quirk §2.5.8) — sorts ascending,
and renders pred-vs-GT panels for the N worst. The GT/prediction
reformatters are shared with the metrics driver (the reference duplicates
them locally, show_worst_predictions.py:18-91).
"""

from __future__ import annotations

import os

from weed_instance_segmentation_tpu import config
from weed_instance_segmentation_tpu.datasets.dataset_utils import (
    PreprocessedDataset, collate_fn,
)
from weed_instance_segmentation_tpu.datasets.factory import get_dataset_and_config
from weed_instance_segmentation_tpu.datasets.loader import DataLoader
from weed_instance_segmentation_tpu.engine.inference import run_inference
from weed_instance_segmentation_tpu.engine.metrics import (
    predictions_from_postprocess, targets_from_original_maps,
)
from weed_instance_segmentation_tpu.engine.model_utils import load_model, plot_segmentation
from weed_instance_segmentation_tpu.engine.steps import make_forward_fn
from weed_instance_segmentation_tpu.evaluation.mean_ap import MeanAveragePrecision
from weed_instance_segmentation_tpu.processing.postprocess import (
    post_process_instance_segmentation,
)

N_WORST = int(os.environ.get('WISTPU_N_WORST', 3))
MODEL_ID = os.environ.get('WISTPU_MODEL_ID', 'mask2former_fine_tuned/latest/best_model/')


def convert_gt_map_to_result(gt_map, id_mapping) -> dict:
    """Instance map + id mapping → plot_segmentation result dict
    (reference show_worst_predictions.py:94-117)."""
    import numpy as np

    segments_info = [
        {'id': int(uid), 'label_id': id_mapping[int(uid)], 'score': 1.0}
        for uid in np.unique(gt_map)
        if uid != 255 and int(uid) in id_mapping
    ]
    return {'segmentation': gt_map, 'segments_info': segments_info}


def main(model_id: str = MODEL_ID, n_worst: int = N_WORST, show: bool = True):
    model, params, cfg, processor = load_model(model_id)
    forward_fn = make_forward_fn(model)

    WeedDataset, ds_config = get_dataset_and_config(config.DATASET_LIST[0])

    test_processed_path = os.path.join(ds_config.PROCESSED_DIR, 'Test')
    if os.path.exists(test_processed_path) and len(os.listdir(test_processed_path)) > 0:
        print(f'Loading pre-processed test data from "{test_processed_path}"')
        test_dataset = PreprocessedDataset(test_processed_path)
    else:
        print('Loading raw test data...')
        test_dataset = WeedDataset(
            image_folder_path=ds_config.TEST_IMG_DIR,
            annotation_path=ds_config.TEST_ANNOTATIONS,
            processor=processor,
            label2id=ds_config.LABEL2ID,
        )
    if len(test_dataset) == 0:
        print('No test data found.')
        return []

    data_loader = DataLoader(test_dataset, batch_size=1, shuffle=False, collate=collate_fn)

    scored_images = []
    metric = MeanAveragePrecision(iou_type='segm')
    print(f'\nEvaluating {len(test_dataset)} images...')
    for i, batch in enumerate(data_loader):
        if (i + 1) % 5 == 0:
            print(f'  Processing {i + 1}/{len(test_dataset)}...', end='\r')
        outputs = forward_fn(params, batch['pixel_values'])
        predictions = post_process_instance_segmentation(
            outputs, threshold=0.5, mask_threshold=0.5,
            target_sizes=batch['target_sizes'],
        )
        formatted_preds = predictions_from_postprocess(predictions)
        targets = targets_from_original_maps(batch['original_maps'], batch['id_mappings'])

        metric.reset()
        metric.update(formatted_preds, targets)
        score = float(metric.compute()['map'])

        scored_images.append({
            'score': score,
            'file_name': batch['file_names'][0],
            'original_map': batch['original_maps'][0],
            'id_mapping': batch['id_mappings'][0],
        })

    scored_images.sort(key=lambda x: x['score'])
    worst_cases = scored_images[:n_worst]

    print(f'\n\n--- Top {n_worst} Worst Predictions (by mAP) ---')
    for case in worst_cases:
        print(f'File: {case["file_name"]} | mAP: {case["score"]:.4f}')

    import matplotlib

    if not os.environ.get('DISPLAY'):
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    print('\nVisualizing...')
    for idx, case in enumerate(worst_cases):
        file_name = case['file_name']
        img_path = os.path.join(ds_config.TEST_IMG_DIR, file_name)
        if not os.path.exists(img_path):
            print(f'Image not found: {img_path}')
            continue
        image, result = run_inference(img_path, forward_fn, params, processor)
        gt_result = convert_gt_map_to_result(case['original_map'], case['id_mapping'])

        fig, axes = plt.subplots(1, 2, figsize=(20, 10))
        plot_segmentation(image, result, cfg.id2label, ax=axes[0],
                          title=f'Prediction (mAP: {case["score"]:.2f})', show=False)
        plot_segmentation(image, gt_result, cfg.id2label, ax=axes[1],
                          title='Ground Truth', show=False)
        plt.tight_layout()
        if show and os.environ.get('DISPLAY'):
            plt.show()
        else:
            out = os.path.join(config.OUTPUT_DIR, f'worst_{idx}_{os.path.splitext(file_name)[0]}.png')
            os.makedirs(config.OUTPUT_DIR, exist_ok=True)
            fig.savefig(out)
            print(f'Saved visualization to {out}')
        plt.close(fig)
    return worst_cases


if __name__ == '__main__':
    main(MODEL_ID, N_WORST)
