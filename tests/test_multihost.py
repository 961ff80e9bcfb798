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


def _run_cluster(nproc: int, devices: int, out: str, port: int, mp: int = 1,
                 _retries: int = 2, **extra):
    procs = []
    for pid in range(nproc):
        cfg = {'pid': pid, 'nproc': nproc, 'port': port,
               'devices': devices, 'out': out, 'mp': mp, **extra}
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
    if any(p.returncode != 0 for p in procs):
        # Gloo's cross-process handshake has a hard 30 s timeout baked into
        # the C++ KV store (no Python knob): on a 1-core host ANY concurrent
        # load can starve a worker past it. That's infrastructure, not the
        # code under test — retry on a fresh port. Real failures (asserts,
        # crashes) don't match the pattern and fail immediately.
        joined = '\n'.join(outputs)
        if _retries > 0 and 'Gloo context initialization failed' in joined:
            return _run_cluster(nproc, devices, out, _free_port(), mp=mp,
                                _retries=_retries - 1, **extra)
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


@pytest.mark.slow
def test_two_host_test_phase_matches_single_process(tmp_path):
    """The distributed test phase (engine/metrics.py multi-host path: every
    host reads only its 1/P slice of the split, post-processes its own rows
    of the sharded forward, per-image metric entries merge on host 0) must
    produce the same metrics as the single-process run — through the same
    trained model (same losses). The worker additionally asserts the
    no-read-amplification contract on its dataset."""
    single_out = str(tmp_path / 'single_tm.json')
    pair_out = str(tmp_path / 'pair_tm.json')

    _run_cluster(1, 8, single_out, _free_port(), test_metrics=True, epochs=1)
    _run_cluster(2, 4, pair_out, _free_port(), test_metrics=True, epochs=1)

    with open(single_out) as f:
        single = json.load(f)
    with open(pair_out) as f:
        pair = json.load(f)

    np.testing.assert_allclose(single['losses'], pair['losses'], rtol=2e-4, atol=1e-5)
    for key in ('test_map', 'test_map_50', 'test_mar_100'):
        assert key in single and key in pair
        # forward logits agree to float tolerance; mAP is piecewise-constant
        # in them, so topology must not move it beyond threshold jitter
        np.testing.assert_allclose(single[key], pair[key], atol=2e-3, err_msg=key)


@pytest.mark.slow
def test_resume_as_two_hosts_matches_uninterrupted(tmp_path):
    """Kill-after-epoch-1 resume, with a TOPOLOGY change: epoch 1 runs as a
    single 8-device process and checkpoints; the run resumes as 2 simulated
    hosts × 4 devices for epoch 2. Its epoch-2 losses must match the
    uninterrupted single-process 2-epoch run step for step (same restored
    optimizer state, same shuffle sequence via set_epoch)."""
    full_out = str(tmp_path / 'full.json')
    phase1_out = str(tmp_path / 'phase1.json')
    phase2_out = str(tmp_path / 'phase2.json')
    ckpt_dir = str(tmp_path / 'ckpt')

    _run_cluster(1, 8, full_out, _free_port(), epochs=2)
    _run_cluster(1, 8, phase1_out, _free_port(), epochs=1, save_to=ckpt_dir)
    _run_cluster(2, 4, phase2_out, _free_port(), epochs=2, resume_from=ckpt_dir)

    with open(full_out) as f:
        full = json.load(f)['losses']
    with open(phase1_out) as f:
        phase1 = json.load(f)['losses']
    with open(phase2_out) as f:
        phase2 = json.load(f)['losses']

    assert len(full) == 4 and len(phase1) == 2 and len(phase2) == 2
    np.testing.assert_allclose(full[:2], phase1, rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(full[2:], phase2, rtol=2e-4, atol=1e-5)
