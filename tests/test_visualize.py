"""Dataset GT visualizers (SURVEY.md C16) on synthetic fixtures —
headless: figures must be written to OUTPUT_DIR/visualizations."""

import glob
import importlib
import os

import numpy as np
import pytest

from fixtures import make_crop_weed_png, make_crop_weed_yaml, make_pheno_bench, make_sorghum_weed


@pytest.fixture()
def no_display(monkeypatch):
    monkeypatch.delenv('DISPLAY', raising=False)


def _reload_config(monkeypatch, tmp_path):
    monkeypatch.setenv('WISTPU_OUTPUT_DIR', str(tmp_path / 'out') + '/')
    monkeypatch.setenv('WISTPU_MAX_IMAGES', '2')
    from weed_instance_segmentation_tpu import config

    importlib.reload(config)
    return config


def test_pheno_bench_visualizer(tmp_path, monkeypatch, no_display):
    rng = np.random.default_rng(0)
    root = str(tmp_path / 'pheno')
    make_pheno_bench(root, rng, n=2)
    config = _reload_config(monkeypatch, tmp_path)

    from weed_instance_segmentation_tpu.datasets.pheno_bench import visualize

    count = visualize.visualize_dataset(
        os.path.join(root, 'train/images'), os.path.join(root, 'train/semantics'),
        show=False,
    )
    assert count == 2
    assert len(glob.glob(os.path.join(config.OUTPUT_DIR, 'visualizations', '*.png'))) == 2


def test_sorghum_visualizer(tmp_path, monkeypatch, no_display):
    rng = np.random.default_rng(0)
    root = str(tmp_path / 'sorghum')
    make_sorghum_weed(root, rng, n=2)
    config = _reload_config(monkeypatch, tmp_path)

    from weed_instance_segmentation_tpu.datasets.sorghum_weed import visualize

    count = visualize.visualize_dataset(
        os.path.join(root, 'Train'),
        os.path.join(root, 'Annotations', 'TrainSorghumWeed_json.json'),
        show=False,
    )
    assert count == 2


def test_crop_weed_png_visualizer(tmp_path, monkeypatch, no_display):
    rng = np.random.default_rng(0)
    root = str(tmp_path / 'cw')
    make_crop_weed_png(root, rng, n=2)
    _reload_config(monkeypatch, tmp_path)

    from weed_instance_segmentation_tpu.datasets.crop_weed.annotation_dependent_implementations import (
        visualize_png_annotations as viz,
    )

    count = viz.visualize_dataset(
        os.path.join(root, 'images'), os.path.join(root, 'annotations'), show=False
    )
    assert count == 2


def test_crop_weed_yaml_visualizer(tmp_path, monkeypatch, no_display):
    rng = np.random.default_rng(0)
    root = str(tmp_path / 'cwy')
    make_crop_weed_yaml(root, rng, n=2)
    _reload_config(monkeypatch, tmp_path)

    from weed_instance_segmentation_tpu.datasets.crop_weed.annotation_dependent_implementations import (
        visualize_yaml_annotations as viz,
    )

    count = viz.visualize_dataset(
        os.path.join(root, 'images'), os.path.join(root, 'annotations'), show=False
    )
    assert count == 2
