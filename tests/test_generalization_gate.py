"""Machinery test for the generalization gate (VERDICT r4 #3).

Runs tools/generalization_gate.py at fixture scale (2 epochs, 4/2/2
disjoint splits, 64², tiny-test) and asserts the MACHINERY: the real
driver ran multi-epoch with per-epoch val losses on the held-out Validate
split, best-val selection recorded at least one improvement, and the test
phase scored the disjoint Test split. The accuracy bars (test mAP ≥ 0.80
@50) are the full-scale tool run's job (tools/records/
generalization_gate.json), not this test's — 2 epochs can't clear them.
Reference behavior under test: best-val selection + held-out test mAP,
/root/reference/models/mask2former/train.py:211-258.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_generalization_gate_machinery(tmp_path):
    out = tmp_path / 'gg.json'
    env = dict(os.environ)
    env.update({
        'JAX_PLATFORMS': 'cpu',
        'GG_EPOCHS': '2', 'GG_TRAIN': '4', 'GG_VAL': '2', 'GG_TEST': '2',
        'GG_HW': '64', 'GG_BATCH': '2', 'GG_ARCH': 'tiny-test',
        'GG_OUT': str(out),
        # reuse the e2e suite's persistent compile cache dir
        'JAX_COMPILATION_CACHE_DIR': env_cache(),
    })
    env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, 'tools', 'generalization_gate.py')],
        env=env, capture_output=True, text=True, timeout=1200,
    )
    assert out.exists(), f'no record written:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}'
    record = json.loads(out.read_text())
    # the real driver ran both epochs and evaluated val loss each epoch
    assert record['splits'] == {'train': 4, 'val': 2, 'test': 2}
    assert record['initial_val_loss'] > 0
    assert record['final_val_loss'] > 0
    assert record['best_val_epoch'] in (1, 2)
    # epoch 1 always improves on inf -> at least one best-val save happened
    assert record['best_val_improvements'] >= 1
    # the test phase scored the held-out split (values may be 0 at 2 epochs)
    assert record['test_map'] >= 0.0
    assert record['test_map_50'] >= 0.0


def env_cache() -> str:
    d = os.environ.get('JAX_COMPILATION_CACHE_DIR', '/tmp/wistpu_xla_cache')
    os.makedirs(d, exist_ok=True)
    return d
