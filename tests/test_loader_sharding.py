"""Per-host input sharding in datasets.loader.DataLoader (host-only logic —
the cross-process execution path is covered by tests/test_multihost.py),
plus the generic device-batch prefetch wrapper."""

import numpy as np
import pytest

from weed_instance_segmentation_tpu.datasets.loader import DataLoader, prefetch_iterator


def _dataset(n):
    return [{'x': np.full((2,), i, np.float32), 'i': i} for i in range(n)]


def _collate(items):
    return {'x': [it['x'] for it in items], 'i': [it['i'] for it in items]}


def _batches(loader):
    return list(loader)


def test_hosts_reassemble_global_batches():
    n, bs, pc = 10, 8, 2
    global_loader = DataLoader(_dataset(n), bs, shuffle=True, seed=3,
                               collate=_collate, prefetch=0)
    host_loaders = [
        DataLoader(_dataset(n), bs, shuffle=True, seed=3, collate=_collate,
                   prefetch=0, process_index=k, process_count=pc)
        for k in range(pc)
    ]
    global_batches = _batches(global_loader)
    host_batches = [_batches(hl) for hl in host_loaders]

    assert len(global_batches) == 2
    for b_idx, gbatch in enumerate(global_batches):
        n_valid = len(gbatch['i'])
        padded = gbatch['i'] + [gbatch['i'][-1]] * (bs - n_valid)
        local_bs = bs // pc
        total_valid = 0
        for k in range(pc):
            hbatch = host_batches[k][b_idx]
            # exactly this host's contiguous slice of the padded global batch
            assert hbatch['i'] == padded[k * local_bs : (k + 1) * local_bs]
            assert len(hbatch['i']) == local_bs
            nv = hbatch['num_valid']
            # valid rows are a prefix of the local slice
            expect_nv = int(np.clip(n_valid - k * local_bs, 0, local_bs))
            assert nv == expect_nv
            total_valid += nv
        assert total_valid == n_valid


def test_all_padding_host_slice():
    # 9 samples, bs 8, 4 hosts: second batch has 1 valid sample → hosts 1-3
    # get pure padding (num_valid 0)
    loaders = [
        DataLoader(_dataset(9), 8, shuffle=False, collate=_collate,
                   prefetch=0, process_index=k, process_count=4)
        for k in range(4)
    ]
    per_host = [_batches(l) for l in loaders]
    last = [h[1] for h in per_host]
    assert [b['num_valid'] for b in last] == [1, 0, 0, 0]
    # padding rows repeat the final sample
    assert all(all(i == 8 for i in b['i']) for b in last[1:])


def test_single_process_unchanged():
    loader = DataLoader(_dataset(10), 8, shuffle=False, collate=_collate, prefetch=0)
    batches = _batches(loader)
    assert [len(b['i']) for b in batches] == [8, 2]  # partial batch kept ragged
    assert all('num_valid' not in b for b in batches)


def test_prefetch_path_matches_sync_path():
    kw = dict(shuffle=True, seed=11, collate=_collate,
              process_index=1, process_count=2)
    sync = _batches(DataLoader(_dataset(13), 4, prefetch=0, **kw))
    pre = _batches(DataLoader(_dataset(13), 4, prefetch=2, **kw))
    assert [b['i'] for b in sync] == [b['i'] for b in pre]
    assert [b['num_valid'] for b in sync] == [b['num_valid'] for b in pre]


def test_prefetch_iterator_order_and_completion():
    assert list(prefetch_iterator(iter(range(20)), depth=3)) == list(range(20))
    assert list(prefetch_iterator(iter([]), depth=2)) == []
    assert list(prefetch_iterator(iter([1]), depth=0)) == [1]


def test_prefetch_iterator_propagates_exceptions():
    def gen():
        yield 1
        raise RuntimeError('producer boom')

    it = prefetch_iterator(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match='producer boom'):
        list(it)


def test_prefetch_iterator_abandonment_stops_producer():
    import threading
    import time

    produced = []

    def gen():
        for i in range(1000):
            produced.append(i)
            yield i

    it = prefetch_iterator(gen(), depth=1)
    assert next(it) == 0
    it.close()  # consumer walks away
    n_before = len(produced)
    time.sleep(0.6)  # > the producer's 0.2s put timeout
    assert len(produced) <= n_before + 2  # at most one extra item in flight
    assert threading.active_count() < 20
