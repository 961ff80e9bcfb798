"""Dataset factory — convention-based dynamic import.

API parity with the reference (datasets/factory.py:4-29): given a dataset
name, import ``<pkg>.datasets.<name>.definitions`` and
``<pkg>.datasets.<name>.dataset`` and return the dataset class named
``<Name>Dataset`` (``name.title().replace('_','')``) together with the
definitions module.
"""

import importlib

_PKG = 'weed_instance_segmentation_tpu.datasets'


def get_dataset_and_config(dataset_name: str):
    """Return ``(DatasetClass, definitions_module)`` for ``dataset_name``."""
    config_module_path = f'{_PKG}.{dataset_name}.definitions'
    try:
        config_module = importlib.import_module(config_module_path)
    except Exception:
        raise ValueError(
            f'no definitions module for dataset {dataset_name!r} — '
            f'expected an importable "{config_module_path}"'
        )

    dataset_module_path = f'{_PKG}.{dataset_name}.dataset'
    try:
        dataset_module = importlib.import_module(dataset_module_path)
    except Exception:
        raise ValueError(
            f'no dataset module for dataset {dataset_name!r} — '
            f'expected an importable "{dataset_module_path}"'
        )

    dataset_class_name = dataset_name.title().replace('_', '') + 'Dataset'
    try:
        dataset_class = getattr(dataset_module, dataset_class_name)
    except Exception:
        raise ValueError(
            f'no dataset class for dataset {dataset_name!r} — '
            f'expected "{dataset_module_path}" to define {dataset_class_name}'
        )

    return dataset_class, config_module
