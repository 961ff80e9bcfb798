"""Multi-host data parallelism (SURVEY.md §5.8; BASELINE config 5).

Two simulated hosts × 4 CPU devices (``jax.distributed`` over localhost,
gloo CPU collectives) must produce step-for-step the same training losses
as one process with all 8 devices: the loader's per-host input sharding +
``make_array_from_process_local_data`` assemble exactly the global batch
the single-process path builds with ``device_put``.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), 'multihost_worker.py')
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def _worker_env() -> dict:
    env = dict(os.environ)
    # drop the axon sitecustomize (it force-selects the TPU tunnel backend);
    # keep the repo importable
    env['PYTHONPATH'] = REPO
    env['JAX_PLATFORMS'] = 'cpu'
    env.pop('XLA_FLAGS', None)
    return env


def _run_cluster(nproc: int, devices: int, out: str, port: int, mp: int = 1):
    procs = []
    for pid in range(nproc):
        cfg = {'pid': pid, 'nproc': nproc, 'port': port,
               'devices': devices, 'out': out, 'mp': mp}
        procs.append(subprocess.Popen(
            [sys.executable, WORKER, json.dumps(cfg)],
            env=_worker_env(), cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outputs = []
    for p in procs:
        # generous: workers share one slow CPU core with whatever else the
        # host runs; under load the pair can take several× the solo time
        stdout, _ = p.communicate(timeout=2400)
        outputs.append(stdout)
    for p, stdout in zip(procs, outputs):
        assert p.returncode == 0, f'worker failed:\n{stdout[-4000:]}'
    return outputs


@pytest.mark.slow
def test_two_host_losses_match_single_process(tmp_path):
    single_out = str(tmp_path / 'single.json')
    pair_out = str(tmp_path / 'pair.json')

    _run_cluster(1, 8, single_out, _free_port())
    _run_cluster(2, 4, pair_out, _free_port())

    with open(single_out) as f:
        single = json.load(f)['losses']
    with open(pair_out) as f:
        pair = json.load(f)['losses']

    assert len(single) == len(pair) == 4  # 2 epochs × (8+2 samples → 2 batches)
    # same global batches, same model, same RNG — only the collective
    # topology differs (XLA intra-process vs gloo cross-process reduction
    # order), so agreement is to float tolerance, not bit-exact
    np.testing.assert_allclose(single, pair, rtol=2e-4, atol=1e-5)


@pytest.mark.slow
def test_two_host_model_parallel_matches_single_process(tmp_path):
    """2 hosts × 4 devices on the 2-D dp4×mp2 mesh == one process with all
    8 devices on the same mesh: weight shards cross host boundaries, and
    the final ``fetch_tree`` (collective checkpoint assembly) must return
    identical full params on both topologies."""
    single_out = str(tmp_path / 'single_mp.json')
    pair_out = str(tmp_path / 'pair_mp.json')

    _run_cluster(1, 8, single_out, _free_port(), mp=2)
    _run_cluster(2, 4, pair_out, _free_port(), mp=2)

    with open(single_out) as f:
        single = json.load(f)
    with open(pair_out) as f:
        pair = json.load(f)

    assert len(single['losses']) == len(pair['losses']) == 4
    np.testing.assert_allclose(single['losses'], pair['losses'], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(single['param_sum'], pair['param_sum'], rtol=1e-3)
