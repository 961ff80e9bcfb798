"""crop_weed dispatcher: selects the PNG or YAML implementation at import
time based on definitions.ANNOTATION_FORMAT (reference:
datasets/crop_weed/dataset.py:1-10)."""

from weed_instance_segmentation_tpu.datasets.crop_weed.definitions import ANNOTATION_FORMAT

if ANNOTATION_FORMAT == 'png':
    from weed_instance_segmentation_tpu.datasets.crop_weed.annotation_dependent_implementations.dataset_from_png_annotations import (  # noqa: F401
        CropWeedDataset,
    )
elif ANNOTATION_FORMAT == 'yaml':
    from weed_instance_segmentation_tpu.datasets.crop_weed.annotation_dependent_implementations.dataset_from_yaml_annotations import (  # noqa: F401
        CropWeedDataset,
    )
else:
    raise ValueError(
        f'Unknown ANNOTATION_FORMAT "{ANNOTATION_FORMAT}" in crop_weed definitions. '
        f'Supported formats are "png" and "yaml".'
    )
