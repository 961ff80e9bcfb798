"""Warm-cache serving start-up (VERDICT r4 #8).

The serving sweep records 191-268 s of compile per config but never said
whether a RESTARTED serving process amortizes that through the persistent
XLA compile cache (the package wires one at ~/.cache/wistpu_xla). This
tool runs the b4 serving config in two fresh subprocesses back-to-back —
same binary, same cache dir — and records cold vs warm compile seconds
into ``tools/records/serving_sweep.json`` (``compile_s_cold`` /
``compile_s_warm`` + a verdict).

Env: WARM_CONFIG (default '4:0'), BENCH_* passthrough.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

TOOLS = os.path.dirname(os.path.abspath(__file__))
CONFIG = os.environ.get('WARM_CONFIG', '4:0')
RECORD = os.path.join(TOOLS, 'records', 'serving_sweep.json')


def one_run(tag: str) -> dict:
    out = os.path.join(tempfile.mkdtemp(prefix=f'warm_{tag}_'), 'sweep.json')
    env = dict(os.environ)
    env.update({'SWEEP_CONFIGS': CONFIG, 'SWEEP_OUT': out,
                'BENCH_ITERS': os.environ.get('BENCH_ITERS', '5')})
    t0 = time.perf_counter()
    proc = subprocess.run(
        [sys.executable, os.path.join(TOOLS, 'sweep_serving_batch.py')],
        env=env, capture_output=True, text=True,
        timeout=int(os.environ.get('WARM_TIMEOUT', '2400')),
    )
    wall = time.perf_counter() - t0
    if proc.returncode != 0:
        raise RuntimeError(f'{tag} run failed:\n{proc.stdout[-1500:]}'
                           f'\n{proc.stderr[-1500:]}')
    with open(out) as f:
        cfgs = json.load(f)['configs']
    key = 'b' + CONFIG.replace(':', '_micro')
    entry = dict(cfgs[key])
    entry['process_wall_s'] = round(wall, 1)
    print(f'{tag}: {json.dumps(entry)}', flush=True)
    return entry


def main() -> None:
    cold = one_run('cold')
    warm = one_run('warm')
    with open(RECORD) as f:
        record = json.load(f)
    ratio = warm['compile_s'] / max(cold['compile_s'], 1e-9)
    record['warm_start'] = {
        'config': CONFIG,
        'compile_s_cold': cold['compile_s'],
        'compile_s_warm': warm['compile_s'],
        'process_wall_s_cold': cold['process_wall_s'],
        'process_wall_s_warm': warm['process_wall_s'],
        'when': time.strftime('%Y-%m-%dT%H:%MZ', time.gmtime()),
        'verdict': (
            'persistent cache amortizes: warm restart compiles in seconds'
            if ratio < 0.3 else
            'no amortization: the axon remote-compile path bypasses the '
            'persistent XLA cache; every serving process pays full compile'
        ),
    }
    with open(RECORD, 'w') as f:
        json.dump(record, f, indent=2)
    print(json.dumps(record['warm_start']))
    print(f'record -> {RECORD}')


if __name__ == '__main__':
    main()
