"""TPU-native instance-segmentation framework for crop/weed datasets.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
``marco-conciatori-public/weed_instance_segmentation`` (see SURVEY.md):

- ``datasets``  — loaders for sorghum_weed (VGG JSON polygons), pheno_bench
  (16-bit semantic PNGs), crop_weed (CWFID PNG/YAML) + preprocessed cache.
- ``processing`` — fused JAX image pre-/post-processing (Mask2Former
  processor semantics).
- ``models``    — flax Mask2Former: Swin / ResNet backbones, multi-scale
  deformable-attention pixel decoder, masked-attention transformer decoder.
- ``ops``       — TPU kernels (Pallas) + jnp reference ops: grid sample,
  deformable attention, device-side Hungarian assignment.
- ``losses``    — matcher + point-sampled CE/mask/dice criterion.
- ``evaluation``— device-side COCO-style mask mAP.
- ``parallel``  — device mesh / sharding helpers (data-parallel over ICI).
- ``engine``    — train / test / inference / show-worst entry points.
"""

__version__ = '0.1.0'
