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

# Persistent XLA compilation cache: entry points run as separate processes
# (preprocess / train / test / inference — reference L5 layout), and every
# process would otherwise re-compile the same programs. Must be set before
# the first jax compilation; importing this package does it for all entry
# points. Override with your own JAX_COMPILATION_CACHE_DIR.
import os as _os

_os.environ.setdefault(
    'JAX_COMPILATION_CACHE_DIR',
    _os.path.join(_os.path.expanduser('~'), '.cache', 'wistpu_xla'),
)
_os.environ.setdefault('JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS', '1')

# Honor JAX_PLATFORMS even when a site plugin (this image's axon TPU
# bootstrap) force-registers its backend and overrides the config: re-assert
# the user's explicit choice. No-op when the variable is unset. NOTE: keep
# the value verbatim — rewriting 'axon' to a priority list ('axon,tpu')
# makes jax.config hard-initialize the raw libtpu backend ("No jellyfish
# device found") instead of skipping it. If the axon plugin failed to
# register at all, the cause is a dropped /root/.axon_site on PYTHONPATH,
# not the platform name.
if _os.environ.get('JAX_PLATFORMS'):
    import jax as _jax

    _jax.config.update('jax_platforms', _os.environ['JAX_PLATFORMS'])
