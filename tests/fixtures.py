"""Synthetic mini-dataset generators matching each loader's expected layout
(formats specified by the reference loaders, SURVEY.md §2.1 C3-C7)."""

import json
import os

import numpy as np
from PIL import Image


def _save_rgb(path, rng, h, w):
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    Image.fromarray(arr).save(path)
    return arr


def make_pheno_bench(root, rng, n=3, h=96, w=128):
    """images/*.png + same-basename 16-bit semantic masks in semantics/."""
    for split in ('train', 'val', 'test'):
        img_dir = os.path.join(root, split, 'images')
        sem_dir = os.path.join(root, split, 'semantics')
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(sem_dir, exist_ok=True)
        for i in range(n):
            name = f'{split}_{i:03d}.png'
            _save_rgb(os.path.join(img_dir, name), rng, h, w)
            sem = np.zeros((h, w), dtype=np.uint16)
            # two crop blobs + one weed blob
            sem[10:30, 10:30] = 1
            sem[50:70, 40:70] = 1
            sem[20:40, 80:110] = 2
            Image.fromarray(sem).save(os.path.join(sem_dir, name))
    return root


def make_crop_weed_png(root, rng, n=4, h=96, w=128):
    """NNN_image.png + NNN_annotation.png RGB masks (G=crop, R=weed)."""
    img_dir = os.path.join(root, 'images')
    ann_dir = os.path.join(root, 'annotations')
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    for i in range(n):
        _save_rgb(os.path.join(img_dir, f'{i:03d}_image.png'), rng, h, w)
        ann = np.zeros((h, w, 3), dtype=np.uint8)
        ann[10:30, 10:40] = (0, 255, 0)   # crop
        ann[50:80, 20:50] = (255, 0, 0)   # weed
        ann[40:60, 90:120] = (0, 255, 0)  # second crop
        Image.fromarray(ann).save(os.path.join(ann_dir, f'{i:03d}_annotation.png'))
    return root


def make_crop_weed_yaml(root, rng, n=4, h=96, w=128):
    """*.yaml with filename + annotation[].points.{x,y} polygon lists."""
    import yaml

    img_dir = os.path.join(root, 'images')
    ann_dir = os.path.join(root, 'annotations')
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    for i in range(n):
        fname = f'{i:03d}_image.png'
        _save_rgb(os.path.join(img_dir, fname), rng, h, w)
        ann = {
            'filename': fname,
            'annotation': [
                {'type': 'crop', 'points': {'x': [10.0, 40.0, 40.0, 10.0], 'y': [10.0, 10.0, 30.0, 30.0]}},
                {'type': 'weed', 'points': {'x': [60.0, 100.0, 80.0], 'y': [50.0, 55.0, 85.0]}},
                # malformed: single float point → promoted to singleton, then skipped (<3 pts)
                {'type': 'weed', 'points': {'x': 5.0, 'y': 6.0}},
                # unknown type → skipped
                {'type': 'rock', 'points': {'x': [1.0, 2.0, 3.0], 'y': [1.0, 2.0, 1.0]}},
            ],
        }
        with open(os.path.join(ann_dir, f'{i:03d}_annotation.yaml'), 'w') as f:
            yaml.safe_dump(ann, f)
    return root


def make_sorghum_weed(root, rng, n=3, h=96, w=128):
    """Train/Validate/Test dirs + VGG-style JSON annotation files."""
    os.makedirs(os.path.join(root, 'Annotations'), exist_ok=True)
    for split, jname in (
        ('Train', 'TrainSorghumWeed_json.json'),
        ('Validate', 'ValidateSorghumWeed_json.json'),
        ('Test', 'TestSorghumWeed_json.json'),
    ):
        img_dir = os.path.join(root, split)
        os.makedirs(img_dir, exist_ok=True)
        entries = {}
        for i in range(n):
            fname = f'{split.lower()}_{i:03d}.jpg'
            _save_rgb(os.path.join(img_dir, fname), rng, h, w)
            entries[f'{fname}12345'] = {
                'filename': fname,
                'regions': [
                    {
                        'shape_attributes': {
                            'name': 'polygon',
                            'all_points_x': [10, 50, 50, 10],
                            'all_points_y': [10, 10, 40, 40],
                        },
                        'region_attributes': {'classname': 'Sorghum'},
                    },
                    {
                        'shape_attributes': {
                            'name': 'polygon',
                            'all_points_x': [70, 110, 90],
                            'all_points_y': [20, 25, 60],
                        },
                        'region_attributes': {'classname': 'BLweed'},
                    },
                    # non-polygon shape → skipped
                    {
                        'shape_attributes': {'name': 'rect', 'x': 1, 'y': 1},
                        'region_attributes': {'classname': 'Grass'},
                    },
                ],
            }
        with open(os.path.join(root, 'Annotations', jname), 'w') as f:
            json.dump(entries, f)
    return root
