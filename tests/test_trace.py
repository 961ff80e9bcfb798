"""engine/trace.py: the pure-Python xplane wire reader.

Two angles: (1) a hand-encoded XSpace with known busy intervals must parse
to the exact busy fraction (the encoder below writes the same wire format
protoc would); (2) a real jax.profiler capture must parse without error
(CPU traces carry no '/device:' plane, so the fraction is None — the
driver records the metric only when a device plane exists).
"""

import glob
import os

import numpy as np

from weed_instance_segmentation_tpu.engine.trace import (
    device_busy_fraction, op_breakdown, parse_xspace,
)


def _varint(v: int) -> bytes:
    out = b''
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(num: int, wt: int, payload: bytes | int) -> bytes:
    key = _varint(num << 3 | wt)
    if wt == 0:
        return key + _varint(payload)
    return key + _varint(len(payload)) + payload


def _event(offset_ps: int, duration_ps: int) -> bytes:
    return _field(2, 0, offset_ps) + _field(3, 0, duration_ps)


def _line(name: str, timestamp_ns: int, events: list[tuple[int, int]]) -> bytes:
    body = _field(2, 2, name.encode()) + _field(3, 0, timestamp_ns)
    for off, dur in events:
        body += _field(4, 2, _event(off, dur))
    return body


def _plane(name: str, lines: list[bytes]) -> bytes:
    body = _field(2, 2, name.encode())
    for line in lines:
        body += _field(3, 2, line)
    return body


def _xspace(planes: list[bytes]) -> bytes:
    return b''.join(_field(1, 2, p) for p in planes)


def _write_trace(tmp_path, data: bytes) -> str:
    d = os.path.join(tmp_path, 'plugins', 'profile', 'run1')
    os.makedirs(d)
    with open(os.path.join(d, 'host.xplane.pb'), 'wb') as f:
        f.write(data)
    return str(tmp_path)


def test_parse_and_busy_fraction_exact(tmp_path):
    # device plane: two op intervals [0,100) and [300,400) ps within a
    # 400 ps span → busy 0.5; overlapping module line must not double-count
    dev = _plane('/device:TPU:0', [
        _line('XLA Ops', 1000, [(0, 100), (300, 100)]),
        _line('XLA Modules', 1000, [(0, 100), (300, 100)]),
    ])
    host = _plane('/host:CPU', [_line('python', 0, [(0, 10 ** 9)])])
    root = _write_trace(tmp_path, _xspace([dev, host]))

    planes = parse_xspace(glob.glob(
        os.path.join(root, 'plugins', 'profile', '*', '*.xplane.pb'))[0])
    names = {p['name'] for p in planes}
    assert names == {'/device:TPU:0', '/host:CPU'}

    busy = device_busy_fraction(root)
    np.testing.assert_allclose(busy, 0.5)


def test_busy_fraction_none_without_device_plane(tmp_path):
    root = _write_trace(tmp_path, _xspace([
        _plane('/host:CPU', [_line('python', 0, [(0, 100)])]),
    ]))
    assert device_busy_fraction(root) is None


def _stat(metadata_id: int, bytes_value: str | None = None,
          int_value: int | None = None) -> bytes:
    body = _field(1, 0, metadata_id)
    if bytes_value is not None:
        body += _field(5, 2, bytes_value.encode())
    if int_value is not None:
        body += _field(3, 0, int_value)
    return body


def _event_metadata_entry(mid: int, name: str, stats: list[bytes]) -> bytes:
    em = _field(1, 0, mid) + _field(2, 2, name.encode())
    for s in stats:
        em += _field(5, 2, s)
    return _field(1, 0, mid) + _field(2, 2, em)


def _stat_metadata_entry(smid: int, name: str) -> bytes:
    sm = _field(1, 0, smid) + _field(2, 2, name.encode())
    return _field(1, 0, smid) + _field(2, 2, sm)


def test_op_breakdown_categories_buckets_and_async(tmp_path):
    """op_breakdown resolves hlo_category/tf_op/flops/bytes from the
    XEventMetadata stats, buckets by scope substring, and keeps the
    'Async XLA Ops' line out of the exclusive total."""
    SM = {1: 'hlo_category', 2: 'tf_op', 3: 'flops', 4: 'bytes_accessed'}
    # op 10: a backbone convolution 200 ps; op 11: an encoder gather 300 ps
    # (two events → 600); op 12: an async copy 500 ps (excluded from total)
    emeta = [
        _event_metadata_entry(10, '%fusion.1', [
            _stat(1, bytes_value='convolution fusion'),
            _stat(2, bytes_value='jit(f)/Model/backbone/conv:'),
            _stat(3, int_value=1000), _stat(4, int_value=64),
        ]),
        _event_metadata_entry(11, '%fusion.2', [
            _stat(1, bytes_value='loop fusion'),
            _stat(2, bytes_value='jit(f)/Model/pixel_decoder/self_attn/gather:'),
            _stat(3, int_value=3_500_000_000), _stat(4, int_value=1_500_000_000),
        ]),
        _event_metadata_entry(12, '%copy-start.9', [
            _stat(1, bytes_value='async copy'),
        ]),
    ]
    smeta = [_stat_metadata_entry(k, v) for k, v in SM.items()]

    def ev(mid, off, dur):
        return _field(1, 0, mid) + _field(2, 0, off) + _field(3, 0, dur)

    ops_line = (_field(2, 2, b'XLA Ops') + _field(3, 0, 0)
                + _field(4, 2, ev(10, 0, 200 * 10 ** 6))
                + _field(4, 2, ev(11, 200 * 10 ** 6, 300 * 10 ** 6))
                + _field(4, 2, ev(11, 500 * 10 ** 6, 300 * 10 ** 6)))
    async_line = (_field(2, 2, b'Async XLA Ops') + _field(3, 0, 0)
                  + _field(4, 2, ev(12, 0, 500 * 10 ** 6)))
    dev = _field(2, 2, b'/device:TPU:0')
    for line in (ops_line, async_line):
        dev += _field(3, 2, line)
    for e in emeta:
        dev += _field(4, 2, e)
    for s in smeta:
        dev += _field(5, 2, s)
    root = _write_trace(tmp_path, _xspace([dev]))

    out = op_breakdown(root, buckets={
        'swin': ['/backbone/'],
        'msda': ['/self_attn/'],
    })
    np.testing.assert_allclose(out['total_ms'], 0.8)
    np.testing.assert_allclose(out['async_ms'], 0.5)
    assert set(out['by_category']) == {'convolution fusion', 'loop fusion'}
    np.testing.assert_allclose(out['by_category']['loop fusion'], 0.6)
    assert set(out['by_bucket']) == {'swin', 'msda'}
    np.testing.assert_allclose(out['by_bucket']['msda']['ms'], 0.6)
    # flops/bytes accumulate per event occurrence (2 gather events)
    np.testing.assert_allclose(out['by_bucket']['msda']['gflops'], 7.0)
    np.testing.assert_allclose(out['by_bucket']['msda']['gbytes'], 3.0)
    # top op is the gather scope
    assert out['top_ops'][0][0] == 'jit(f)/Model/pixel_decoder/self_attn/gather:'
    assert out['top_ops'][0][2] == 'loop fusion'


def test_real_capture_parses(tmp_path):
    import jax
    import jax.numpy as jnp

    jax.profiler.start_trace(str(tmp_path))
    x = jnp.ones((64, 64))
    jax.block_until_ready(jnp.dot(x, x))
    jax.profiler.stop_trace()

    paths = glob.glob(os.path.join(
        str(tmp_path), 'plugins', 'profile', '*', '*.xplane.pb'))
    assert paths, 'profiler wrote no xplane files'
    for p in paths:
        planes = parse_xspace(p)
        assert isinstance(planes, list) and planes
        for plane in planes:
            assert isinstance(plane['name'], str)
    # CPU backend: no '/device:' plane → None; on TPU this is a fraction
    busy = device_busy_fraction(str(tmp_path))
    assert busy is None or 0.0 < busy <= 1.0
