"""crop_weed (CWFID) dataset definitions (parity: datasets/crop_weed/definitions.py)."""

import os

DATASET_ROOT = os.environ.get(
    'WISTPU_CROP_WEED_ROOT',
    os.path.expanduser('~/data/CropWeedFieldImageDataset/'),
)

IMG_DIR = os.path.join(DATASET_ROOT, 'images/')
ANNOTATIONS = os.path.join(DATASET_ROOT, 'annotations/')

PROCESSED_DIR = os.path.join(DATASET_ROOT, 'Processed/')

# How to split the data when no predefined split directories exist. A split
# of 0 means that set is not created (reference: crop_weed/definitions.py:17-20).
# Env-overridable like ROOT/FORMAT ("0.6,0.2,0.2") so runs that need a test
# split (engine/test.py's cache fallback) can request one without editing
# this module.
TRAIN_VAL_TEST_SPLIT = [
    float(v)
    for v in os.environ.get('WISTPU_CROP_WEED_SPLIT', '0.8,0.2,0').split(',')
]
if abs(sum(TRAIN_VAL_TEST_SPLIT) - 1.0) > 1e-6:
    raise ValueError(
        f'TRAIN_VAL_TEST_SPLIT must sum to 1.0, but got {sum(TRAIN_VAL_TEST_SPLIT)}'
    )

# CWFID ships two annotation formats: 'png' (RGB semantic masks, Red=weed,
# Green=crop, instances via connected components) and 'yaml' (per-instance
# polygon contours). Reference: crop_weed/definitions.py:22-27.
ANNOTATION_FORMAT = os.environ.get('WISTPU_CROP_WEED_FORMAT', 'png')

ID2LABEL = {
    0: 'crop',
    1: 'weed',
}
LABEL2ID = {v: k for k, v in ID2LABEL.items()}
