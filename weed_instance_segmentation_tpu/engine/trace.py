"""Profiler-trace analysis: device-busy duty cycle from a jax.profiler
capture (SURVEY.md §5.1; VERDICT r2 #7).

The host-derived duty cycle in the train loop counts async dispatch time as
"device time"; this module computes the true device-busy fraction from the
``.xplane.pb`` files ``jax.profiler.start_trace`` writes, so the two can be
recorded side by side (``metadata.json`` keys ``input_duty_cycle`` vs
``device_duty_profiled``).

The environment ships no xplane proto bindings, so a ~60-line protobuf
WIRE-FORMAT reader extracts just the fields needed (the schema is the
stable public tsl ``xplane.proto``):

    XSpace.planes[1] -> XPlane{ name[2], lines[3] }
    XLine{ name[2], timestamp_ns[3], events[4] }
    XEvent{ offset_ps[2], duration_ps[3] }

Busy fraction = union of event intervals on the device plane's op lines /
the span between the first and last device event. Device planes are those
whose name starts with '/device:' (TPU:0 etc.) and are not host threads.
"""

from __future__ import annotations

import glob
import os


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over one message's wire data.
    Length-delimited values come back as bytes; varints as ints. 64/32-bit
    fixed fields are skipped (the xplane subset used here has none)."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = _read_varint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == 0:
            val, pos = _read_varint(buf, pos)
        elif wt == 2:
            ln, pos = _read_varint(buf, pos)
            val = buf[pos : pos + ln]
            pos += ln
        elif wt == 1:
            val = buf[pos : pos + 8]
            pos += 8
        elif wt == 5:
            val = buf[pos : pos + 4]
            pos += 4
        else:
            raise ValueError(f'unsupported wire type {wt}')
        yield field, wt, val


def parse_xspace(path: str) -> list[dict]:
    """[{'name': plane_name, 'lines': [{'name', 'timestamp_ns',
    'events': [(offset_ps, duration_ps), ...]}]}] from an .xplane.pb."""
    with open(path, 'rb') as f:
        space = f.read()
    planes = []
    for field, _, val in _fields(space):
        if field != 1:  # XSpace.planes
            continue
        plane = {'name': '', 'lines': []}
        for pf, _, pv in _fields(val):
            if pf == 2:
                plane['name'] = pv.decode('utf-8', 'replace')
            elif pf == 3:  # XPlane.lines
                line = {'name': '', 'timestamp_ns': 0, 'events': []}
                for lf, _, lv in _fields(pv):
                    if lf == 2:
                        line['name'] = lv.decode('utf-8', 'replace')
                    elif lf == 3:
                        line['timestamp_ns'] = lv
                    elif lf == 4:  # XLine.events
                        off = dur = 0
                        for ef, _, ev in _fields(lv):
                            if ef == 2:
                                off = ev
                            elif ef == 3:
                                dur = ev
                        line['events'].append((off, dur))
                plane['lines'].append(line)
        planes.append(plane)
    return planes


def _union_length(intervals: list[tuple[int, int]]) -> int:
    """Total covered length of [start, end) intervals."""
    if not intervals:
        return 0
    intervals.sort()
    total = 0
    cur_s, cur_e = intervals[0]
    for s, e in intervals[1:]:
        if s > cur_e:
            total += cur_e - cur_s
            cur_s, cur_e = s, e
        else:
            cur_e = max(cur_e, e)
    return total + (cur_e - cur_s)


def device_busy_fraction(trace_dir: str) -> float | None:
    """Device-busy fraction over the captured window: union of op-event
    intervals on '/device:*' planes divided by the first-to-last event
    span. None when no device plane is present (e.g. CPU-only trace)."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, 'plugins', 'profile', '*', '*.xplane.pb')
    ))
    if not paths:
        return None
    intervals: list[tuple[int, int]] = []
    for path in paths:
        for plane in parse_xspace(path):
            name = plane['name']
            if not name.startswith('/device:'):
                continue
            for line in plane['lines']:
                base_ps = line['timestamp_ns'] * 1000
                for off, dur in line['events']:
                    if dur > 0:
                        start = base_ps + off
                        intervals.append((start, start + dur))
    if not intervals:
        return None
    span = max(e for _, e in intervals) - min(s for s, _ in intervals)
    if span <= 0:
        return None
    # op lines can nest (module > op); the union de-duplicates overlap
    return min(_union_length(intervals) / span, 1.0)
