"""Single-image inference + GT comparison (SURVEY.md C13; reference
models/mask2former/inference.py).

``run_inference``: PIL load → long-side resize to MAX_INPUT_DIM → processor
→ jitted forward → post-process at the resized image size
(inference.py:18-31). ``load_ground_truth``: VGG-style JSON polygons → GT
result dict scaled to the target size (inference.py:34-122) — polygon fill
via the native raster op instead of cv2.
"""

from __future__ import annotations

import json
import os

import numpy as np
from PIL import Image

from weed_instance_segmentation_tpu import config
from weed_instance_segmentation_tpu.datasets.factory import get_dataset_and_config
from weed_instance_segmentation_tpu.engine.model_utils import load_model, plot_segmentation
from weed_instance_segmentation_tpu.engine.steps import make_forward_fn
from weed_instance_segmentation_tpu.ops.rasterize import fill_poly
from weed_instance_segmentation_tpu.processing.postprocess import (
    post_process_instance_segmentation,
)

MODEL_ID = os.environ.get('WISTPU_MODEL_ID', 'mask2former_fine_tuned/latest/best_model/')
IMAGE_PATH = os.environ.get('WISTPU_IMAGE_PATH', 'data/reference_images/pic1.jpeg')
GROUND_TRUTH_ANNOTATION_PATH = os.environ.get('WISTPU_GT_ANNOTATION_PATH') or None


def run_inference(image_path: str, forward_fn, params, processor) -> tuple[Image.Image, dict]:
    """(resized image, result dict) — reference inference.py:18-31."""
    image = Image.open(image_path).convert('RGB')
    w, h = image.size
    if max(w, h) > config.MAX_INPUT_DIM:
        scale = config.MAX_INPUT_DIM / max(w, h)
        image = image.resize((int(w * scale), int(h * scale)), resample=Image.BILINEAR)

    inputs = processor(images=image, return_tensors='np')
    outputs = forward_fn(params, inputs['pixel_values'])
    result = post_process_instance_segmentation(
        outputs, target_sizes=[image.size[::-1]]
    )[0]
    return image, result


def load_ground_truth(
    image_name: str,
    target_size: tuple,
    annotation_file: str,
    img_dir: str,
    label2id: dict,
) -> dict | None:
    """VGG-JSON polygons for ``image_name`` → result dict at ``target_size``
    (W, H) with instance ids starting at 1 and score 1.0 (reference
    inference.py:34-122)."""
    if not os.path.exists(annotation_file):
        print(f'GT annotation file missing, skipping comparison: {annotation_file}')
        return None
    try:
        with open(annotation_file) as f:
            data = json.load(f)
    except Exception as e:
        print(f'Could not parse GT annotation JSON ({annotation_file}): {e}')
        return None

    base = os.path.basename(image_name)
    entry = next((item for item in data.values() if item['filename'] == base), None)
    if not entry:
        print(f'{base!r} has no entry in the GT annotation file')
        return None

    image_path = os.path.join(img_dir, base)
    if os.path.exists(image_path):
        with Image.open(image_path) as orig:
            orig_w, orig_h = orig.size
    else:
        # without the original image we cannot recover the polygon scale;
        # fall back to treating the annotation as already at target_size
        print(f'Original image missing ({image_path}); using 1:1 polygon scale')
        orig_w, orig_h = target_size

    target_w, target_h = target_size
    scale_x = target_w / orig_w
    scale_y = target_h / orig_h

    segmentation = np.zeros((target_h, target_w), np.int32)
    segments_info = []
    current_instance_id = 1
    for region in entry.get('regions', []):
        shape_attr = region['shape_attributes']
        region_attr = region['region_attributes']
        if shape_attr['name'] != 'polygon':
            continue
        class_name = region_attr.get('classname')
        if class_name not in label2id:
            continue
        points = np.asarray(
            [
                [int(x * scale_x), int(y * scale_y)]
                for x, y in zip(shape_attr['all_points_x'], shape_attr['all_points_y'])
            ],
            np.int32,
        )
        segmentation = fill_poly(segmentation, points, current_instance_id)
        segments_info.append({
            'id': current_instance_id,
            'label_id': label2id[class_name],
            'score': 1.0,
        })
        current_instance_id += 1

    return {'segmentation': segmentation, 'segments_info': segments_info}


def main(model_id: str = MODEL_ID, image_path: str = IMAGE_PATH,
         gt_annotation_path: str | None = GROUND_TRUTH_ANNOTATION_PATH,
         show: bool = True):
    model, params, cfg, processor = load_model(model_id)
    forward_fn = make_forward_fn(model)

    if not os.path.exists(image_path):
        print(f'Image not found at {image_path}')
        return None

    img, res = run_inference(image_path, forward_fn, params, processor)

    import matplotlib

    if not os.environ.get('DISPLAY'):
        matplotlib.use('Agg')
    import matplotlib.pyplot as plt

    if gt_annotation_path:
        _, ds_config = get_dataset_and_config(config.DATASET_LIST[0])
        gt_res = load_ground_truth(
            image_name=image_path,
            target_size=img.size,
            annotation_file=ds_config.TEST_ANNOTATIONS,
            img_dir=ds_config.TEST_IMG_DIR,
            label2id=ds_config.LABEL2ID,
        )
        fig, axes = plt.subplots(1, 2, figsize=(20, 10))
        plot_segmentation(img, res, cfg.id2label, ax=axes[0], title='Prediction', show=False)
        if gt_res is not None:
            plot_segmentation(img, gt_res, cfg.id2label, ax=axes[1], title='Ground Truth', show=False)
        plt.tight_layout()
    else:
        fig, ax = plt.subplots(figsize=(12, 12))
        plot_segmentation(img, res, cfg.id2label, ax=ax, title='Prediction', show=False)
    if show and os.environ.get('DISPLAY'):
        plt.show()
    else:
        out = os.path.join(config.OUTPUT_DIR, 'inference.png')
        os.makedirs(config.OUTPUT_DIR, exist_ok=True)
        fig.savefig(out)
        print(f'Saved visualization to {out}')
    return res


if __name__ == '__main__':
    main()
