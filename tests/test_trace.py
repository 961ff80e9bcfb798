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
    device_busy_fraction, parse_xspace,
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
