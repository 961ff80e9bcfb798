# Global Configuration
#
# API parity with the reference's ``config.py`` (reference: config.py:1-22):
# the attribute names below are part of the public surface — everything in
# this framework reads them via ``import weed_instance_segmentation_tpu.config``
# exactly like the reference does with ``import config``.
#
# Values may be overridden by environment variables (WISTPU_<NAME>) so the
# entry points stay edit-the-source compatible *and* scriptable.

import os


def _env(name, default, cast=str):
    raw = os.environ.get(f'WISTPU_{name}')
    if raw is None:
        return default
    if cast is bool:
        return raw.lower() in ('1', 'true', 'yes')
    if default is None and raw.lower() in ('none', ''):
        return None
    return cast(raw)


# Training (reference: config.py:3-8)
MODEL_CHECKPOINT = _env('MODEL_CHECKPOINT', 'facebook/mask2former-swin-large-coco-instance')
BATCH_SIZE = _env('BATCH_SIZE', 2, int)
LEARNING_RATE = _env('LEARNING_RATE', 5e-5, float)
EPOCHS = _env('EPOCHS', 100, int)
GRADIENT_ACCUMULATION = _env('GRADIENT_ACCUMULATION', 2, int)

# Data (reference: config.py:10-17)
MAX_INPUT_DIM = _env('MAX_INPUT_DIM', 1024, int)
MAX_IMAGES = _env('MAX_IMAGES', None, int)  # None for full dataset, int for debugging
DATASET_LIST = [
    # 'sorghum_weed',
    'pheno_bench',
    # 'crop_weed',
]
if os.environ.get('WISTPU_DATASET_LIST'):
    DATASET_LIST = os.environ['WISTPU_DATASET_LIST'].split(',')
FORCE_PREPROCESSING = _env('FORCE_PREPROCESSING', False, bool)

# Output Directories (reference: config.py:20-22)
OUTPUT_DIR = _env('OUTPUT_DIR', os.path.expanduser('~/weed_instance_segmentation_tpu_output/'))
MODELS_OUTPUT_DIR = OUTPUT_DIR + 'models/'

# ---------------------------------------------------------------------------
# TPU-native knobs (new; no reference equivalent). These control the static
# shapes XLA compiles for and the device mesh layout.
# ---------------------------------------------------------------------------

# Maximum number of ground-truth instances per image after padding. Variable-
# length per-image target lists (reference keeps Python lists of tensors) are
# padded to this static bound with a validity mask so the loss is jittable.
MAX_INSTANCES = _env('MAX_INSTANCES', 100, int)

# Canonical padded input size fed to the model. The HF processor pads each
# *batch* to its own max H×W (dynamic shapes — one XLA recompile per batch);
# we instead pad every image to one static size derived from MAX_INPUT_DIM
# rounded up to the processor's size_divisor.
PAD_TO_MULTIPLE = _env('PAD_TO_MULTIPLE', 32, int)

# Mixed precision for the compute path (params stay float32).
COMPUTE_DTYPE = _env('COMPUTE_DTYPE', 'float32')

# Rematerialization (gradient checkpointing): recompute activations in the
# backward pass instead of storing them — trades step FLOPs for the memory
# that high-res Swin-L training needs. Values: 0/false (store everything),
# 1/true (backbone + deformable encoder), 'encoder' (deformable encoder
# only — cheapest once HBM has headroom).
_remat_raw = os.environ.get('WISTPU_REMAT', '')
if _remat_raw.lower() == 'encoder':
    REMAT: bool | str = 'encoder'
else:
    REMAT = _env('REMAT', False, bool)

# Device mesh: data-parallel axis size (None = all visible devices), and
# optional model axis (>1 → 2-D ('data','model') mesh with weight sharding
# over 'model'; see parallel/mesh.py shard_tree). Batch size fills the data
# axis only.
DATA_PARALLEL = _env('DATA_PARALLEL', None, int)
MODEL_PARALLEL = _env('MODEL_PARALLEL', None, int)

# Resume training from a prior run: path to a run output dir (containing
# train_state/) or directly to a train_state dir written by
# engine.checkpoint.save_train_checkpoint. Restores params, optimizer state,
# epoch counter, best-val loss, and training history. (The reference always
# restarts from the HF checkpoint — SURVEY.md §5.4.)
RESUME = _env('RESUME', None)

# Preprocessed-cache file format ('.npz' per sample, mirrors reference .pt).
CACHE_SUFFIX = '.npz'

# Architecture when MODEL_CHECKPOINT is not a local checkpoint directory
# (this environment has no network — the reference's from_pretrained download,
# train.py:167, becomes: local dir if present, else fresh init of this arch).
# One of: 'swin-tiny', 'swin-small', 'swin-base', 'swin-large', 'resnet50',
# 'tiny-test'.
MODEL_ARCH = _env('MODEL_ARCH', 'swin-large')

# Processor geometry overrides (default: HF checkpoint values 800/1333).
SHORTEST_EDGE = _env('SHORTEST_EDGE', 800, int)
LONGEST_EDGE = _env('LONGEST_EDGE', 1333, int)
