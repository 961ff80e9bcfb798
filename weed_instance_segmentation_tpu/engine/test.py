"""Standalone test driver (SURVEY.md C14; reference models/mask2former/test.py).

Loads a fine-tuned checkpoint by ``MODEL_ID``, builds the RAW test dataset
for ``DATASET_LIST[0]`` (not the cache — reference test.py:29-35), and runs
the batched mAP evaluation.
"""

from __future__ import annotations

import os

from weed_instance_segmentation_tpu import config
from weed_instance_segmentation_tpu.datasets.dataset_utils import collate_fn
from weed_instance_segmentation_tpu.datasets.factory import get_dataset_and_config
from weed_instance_segmentation_tpu.datasets.loader import DataLoader
from weed_instance_segmentation_tpu.engine import checkpoint as ckpt
from weed_instance_segmentation_tpu.engine.metrics import (
    print_metrics_evaluation, test_with_metrics,
)
from weed_instance_segmentation_tpu.engine.steps import make_forward_fn
from weed_instance_segmentation_tpu.models.mask2former import Mask2Former
from weed_instance_segmentation_tpu.processing.image_processor import (
    Mask2FormerImageProcessor,
)

MODEL_ID = os.environ.get('WISTPU_MODEL_ID', 'mask2former_fine_tuned/latest/best_model/')


def test_model(model_id: str) -> dict | None:
    from weed_instance_segmentation_tpu.engine.model_utils import resolve_model_path

    model_path = resolve_model_path(model_id)
    if not os.path.exists(model_path):
        print(f'Model not found at {model_path}')
        return None

    print(f'Loading model from {model_path}')
    processor = Mask2FormerImageProcessor.from_pretrained(model_path)
    cfg, params = ckpt.load_pretrained(model_path)
    forward_fn = make_forward_fn(Mask2Former(cfg))

    WeedDataset, ds_config = get_dataset_and_config(config.DATASET_LIST[0])
    print('Loading Test Dataset...')
    if hasattr(ds_config, 'TEST_IMG_DIR'):
        test_ds = WeedDataset(
            image_folder_path=ds_config.TEST_IMG_DIR,
            annotation_path=ds_config.TEST_ANNOTATIONS,
            processor=processor,
            label2id=ds_config.LABEL2ID,
        )
    else:
        # Dynamic-split datasets (TRAIN_VAL_TEST_SPLIT, e.g. crop_weed) have
        # no predefined test dirs; their test samples exist only in the
        # preprocessed cache written by datasets/preprocess.py. The reference
        # crashes here (test.py:29-35 reads TEST_IMG_DIR unconditionally, and
        # crop_weed/definitions.py has no such attribute) — documented
        # deviation per SURVEY.md §2.5: fall back to the cache.
        from weed_instance_segmentation_tpu.datasets.dataset_utils import (
            PreprocessedDataset,
        )

        test_dir = os.path.join(ds_config.PROCESSED_DIR, 'Test')
        if not os.path.isdir(test_dir):
            print(f'No predefined test split and no preprocessed cache at '
                  f'{test_dir} — run datasets.preprocess first')
            return None
        test_ds = PreprocessedDataset(test_dir)
    loader = DataLoader(test_ds, batch_size=config.BATCH_SIZE, shuffle=False,
                        collate=collate_fn)

    from weed_instance_segmentation_tpu.parallel.mesh import create_mesh

    result = test_with_metrics(
        forward_fn, params, loader, mesh=create_mesh(config.DATA_PARALLEL)
    )
    print_metrics_evaluation(result, model_name='Best Model')
    return result


if __name__ == '__main__':
    test_model(MODEL_ID)
