"""Generalization gate: held-out-val/test accuracy through the REAL driver.

VERDICT r4 #3: every accuracy signal so far was train-split (the overfit
gate) or loss-only (parity trajectories); the reference's primary loop
selects the best model by *validation* loss and reports *test* mAP
(/root/reference/models/mask2former/train.py:211-258), and that selection
logic had never been driven by a real generalization signal. This gate:

1. builds a sorghum-format fixture with DISJOINT train/val/test splits
   (same generator distribution, fresh rng draws per image);
2. runs ``python -m weed_instance_segmentation_tpu.engine.train`` — the
   REAL driver, not a harness — so per-epoch val loss moves best-val
   checkpoint selection and the test phase scores the best model on the
   held-out Test split;
3. asserts from the run's ``metadata.json``: val loss decreased, the
   best-val checkpoint was re-saved at least twice (selection actually
   moved), and held-out test mAP@50 / mAP clear the bars.

Calibration (round 5, CPU tiny-test @128²): generalization here is
DATA-limited, not step-limited — held-out test mAP@50 scaled 0.227 (16
train imgs / 320 steps) → 0.562 (16/1200; plateaued, a 3200-step run
overfit past epoch ~145 with best-val selection correctly shielding the
test score) → 0.733 (48/2400) → **0.9974 with mAP 0.9052** (96 imgs /
80 epochs / 3840 steps, the default config). Thresholds derive from that
passing record with ~0.10 margin: map50 ≥ 0.90, map ≥ 0.80, plus final
val < half initial and ≥ 2 best-val improvements.

Env knobs: GG_ARCH (tiny-test), GG_EPOCHS (80), GG_HW (128),
GG_BATCH (2), GG_TRAIN/GG_VAL/GG_TEST split sizes (96/12/12), GG_LR
(1e-4), GG_DTYPE (float32), GG_OUT (record path), GG_MAP50_MIN /
GG_MAP_MIN. Exit 0 iff the gate passes.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from overfit_gate import make_fixture

ARCH = os.environ.get('GG_ARCH', 'tiny-test')
EPOCHS = int(os.environ.get('GG_EPOCHS', '80'))
HW = int(os.environ.get('GG_HW', '128'))
BATCH = int(os.environ.get('GG_BATCH', '2'))
N_TRAIN = int(os.environ.get('GG_TRAIN', '96'))
N_VAL = int(os.environ.get('GG_VAL', '12'))
N_TEST = int(os.environ.get('GG_TEST', '12'))
LR = float(os.environ.get('GG_LR', '1e-4'))
DTYPE = os.environ.get('GG_DTYPE', 'float32')
MAP50_MIN = float(os.environ.get('GG_MAP50_MIN', '0.90'))
MAP_MIN = float(os.environ.get('GG_MAP_MIN', '0.80'))
OUT = os.environ.get('GG_OUT', os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'records',
    'generalization_gate.json'))


def run_gate(workdir: str) -> dict:
    fixture = os.path.join(workdir, 'raw')
    outdir = os.path.join(workdir, 'out') + '/'
    make_fixture(fixture, n=N_TRAIN, hw=HW, n_val=N_VAL, n_test=N_TEST)

    env = dict(os.environ)
    env.update({
        'WISTPU_SORGHUM_WEED_ROOT': fixture,
        'WISTPU_DATASET_LIST': 'sorghum_weed',
        'WISTPU_OUTPUT_DIR': outdir,
        'WISTPU_EPOCHS': str(EPOCHS),
        'WISTPU_BATCH_SIZE': str(BATCH),
        'WISTPU_LEARNING_RATE': str(LR),
        'WISTPU_GRADIENT_ACCUMULATION': '1',
        'WISTPU_MODEL_ARCH': ARCH,
        'WISTPU_COMPUTE_DTYPE': DTYPE,
        'WISTPU_SHORTEST_EDGE': str(HW),
        'WISTPU_LONGEST_EDGE': str(HW),
        'WISTPU_MAX_INSTANCES': '8',
        'WISTPU_MAX_INPUT_DIM': str(HW),
        'WISTPU_DATA_PARALLEL': '1',
    })
    env['PYTHONPATH'] = (os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
                         + os.pathsep + env.get('PYTHONPATH', ''))
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, '-m', 'weed_instance_segmentation_tpu.engine.train'],
        env=env, capture_output=True, text=True,
        timeout=int(os.environ.get('GG_TIMEOUT', '3600')),
    )
    elapsed = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(
            f'driver failed rc={proc.returncode}:\n{proc.stdout[-2000:]}'
            f'\n{proc.stderr[-2000:]}')

    runs_root = os.path.join(outdir, 'models', 'mask2former_fine_tuned')
    run_dir = os.path.join(runs_root, sorted(os.listdir(runs_root))[-1])
    with open(os.path.join(run_dir, 'metadata.json')) as f:
        metadata = json.load(f)

    history = metadata['training_history']
    val_losses = [h['val_loss'] for h in history]
    # best-val re-saves: epochs where val loss improved on the running best
    improvements = sum(
        1 for i, v in enumerate(val_losses)
        if v < min(val_losses[:i], default=float('inf'))
    )
    test = metadata.get('test_metrics') or {}
    record = {
        'script': 'tools/generalization_gate.py',
        'when': time.strftime('%Y-%m-%dT%H:%MZ', time.gmtime()),
        'arch': ARCH, 'epochs': EPOCHS, 'hw': HW, 'batch': BATCH,
        'lr': LR, 'dtype': DTYPE,
        'splits': {'train': N_TRAIN, 'val': N_VAL, 'test': N_TEST},
        'driver': 'python -m weed_instance_segmentation_tpu.engine.train '
                  '(the real entry point, subprocess)',
        'initial_val_loss': round(val_losses[0], 4),
        'final_val_loss': round(val_losses[-1], 4),
        'best_val_loss': round(min(val_losses), 4),
        'best_val_epoch': int(val_losses.index(min(val_losses)) + 1),
        'best_val_improvements': improvements,
        'test_map': round(float(test.get('map', -1.0)), 4),
        'test_map_50': round(float(test.get('map_50', -1.0)), 4),
        'test_map_75': round(float(test.get('map_75', -1.0)), 4),
        'elapsed_s': round(elapsed, 1),
    }
    return record


def main() -> int:
    with tempfile.TemporaryDirectory(prefix='generalization_gate_') as wd:
        record = run_gate(wd)
    record['thresholds'] = {'map50_min': MAP50_MIN, 'map_min': MAP_MIN}
    ok = (
        record['test_map_50'] >= MAP50_MIN
        and record['test_map'] >= MAP_MIN
        and record['final_val_loss'] < 0.5 * record['initial_val_loss']
        and record['best_val_improvements'] >= 2
    )
    record['passed'] = bool(ok)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, 'w') as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record))
    print(f'GENERALIZATION GATE {"PASSED" if ok else "FAILED"} '
          f'(val {record["initial_val_loss"]} -> {record["final_val_loss"]}, '
          f'best@{record["best_val_epoch"]}, held-out test mAP '
          f'{record["test_map"]}, mAP@50 {record["test_map_50"]}) -> {OUT}')
    return 0 if ok else 1


if __name__ == '__main__':
    sys.exit(main())
