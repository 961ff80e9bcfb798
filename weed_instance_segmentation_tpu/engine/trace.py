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


def _parse_stat(buf: bytes) -> tuple[int, tuple | None]:
    """One XStat message → (stat_metadata_id, (kind, value))."""
    smid = 0
    sval = None
    for sf, _wt, sv in _fields(buf):
        if sf == 1:
            smid = sv
        elif sf in (3, 4):
            sval = ('int', sv)
        elif sf == 6:
            sval = ('ref', sv)
        elif sf == 5:
            sval = ('bytes', sv.decode('utf-8', 'replace'))
        elif sf == 2:
            import struct

            sval = ('double',
                    struct.unpack('<d', sv)[0] if isinstance(sv, bytes) else sv)
    return (smid, sval)


def parse_xspace_ops(path: str) -> list[dict]:
    """Rich variant of :func:`parse_xspace` for per-op accounting: each
    plane also carries ``event_metadata`` (id → {'name', 'display_name'})
    and ``stat_metadata`` (id → name), and each event is
    ``(metadata_id, offset_ps, duration_ps, stats)`` where ``stats`` is a
    list of ``(stat_metadata_id, value)`` (value decoded for varint /
    length-delimited wire types; ref-typed string stats resolve through
    ``stat_metadata``). Wire-format fields (public tsl xplane.proto):

        XPlane.event_metadata[4] / stat_metadata[5] (map: key=1, value=2)
        XEventMetadata{ id[1], name[2], display_name[3] }
        XEvent{ metadata_id[1], offset_ps[2], duration_ps[3], stats[4] }
        XStat{ metadata_id[1], double[2], uint64[3], int64[4], bytes[5], ref[6] }
    """
    with open(path, 'rb') as f:
        space = f.read()
    planes = []
    for field, _, val in _fields(space):
        if field != 1:
            continue
        plane = {'name': '', 'lines': [], 'event_metadata': {},
                 'stat_metadata': {}}
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
                        mid = off = dur = 0
                        stats = []
                        for ef, _, ev in _fields(lv):
                            if ef == 1:
                                mid = ev
                            elif ef == 2:
                                off = ev
                            elif ef == 3:
                                dur = ev
                            elif ef == 4:  # XEvent.stats
                                stats.append(_parse_stat(ev))
                        line['events'].append((mid, off, dur, stats))
                plane['lines'].append(line)
            elif pf in (4, 5):  # event_metadata / stat_metadata map entry
                key = None
                entry = {'name': '', 'display_name': '', 'stats': []}
                for mf, _, mv in _fields(pv):
                    if mf == 1:
                        key = mv
                    elif mf == 2:
                        for emf, _, emv in _fields(mv):
                            if emf == 2:
                                entry['name'] = emv.decode('utf-8', 'replace')
                            elif emf == 3 and pf == 4:
                                entry['display_name'] = emv.decode(
                                    'utf-8', 'replace')
                            elif emf == 5 and pf == 4:
                                # XEventMetadata.stats — per-op invariants
                                # (hlo_category, hlo_op, flops, ...)
                                entry['stats'].append(_parse_stat(emv))
                if key is not None:
                    if pf == 4:
                        plane['event_metadata'][key] = entry
                    else:
                        plane['stat_metadata'][key] = entry['name']
        planes.append(plane)
    return planes


def op_breakdown(trace_dir: str, buckets: dict[str, list[str]] | None = None,
                 top_n: int = 25) -> dict | None:
    """Per-op-class device-time accounting from a profiler capture.

    Walks the '/device:*' planes' 'XLA Ops' line (the exclusive op
    timeline; the 'Async XLA Ops' line overlaps it and is totalled
    separately as ``async_ms``). Each op resolves its ``hlo_category``,
    jax scope (``tf_op``), ``flops`` and ``bytes_accessed`` from its
    XEventMetadata stats. ``buckets`` maps bucket name → lowercase
    substrings matched against the tf_op scope path (first hit wins;
    unmatched → '_other'). Returns {'total_ms', 'async_ms',
    'by_category': {cat: ms}, 'by_bucket': {bucket: {'ms', 'gflops',
    'gbytes', 'by_category'}}, 'top_ops': [(scope, ms, category)]}
    or None without a device plane."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, 'plugins', 'profile', '*', '*.xplane.pb')
    ))
    by_cat: dict[str, float] = {}
    by_bucket: dict[str, dict] = {}
    by_op: dict[str, list] = {}
    total_ps = 0
    async_ps = 0
    for path in paths:
        for plane in parse_xspace_ops(path):
            if not plane['name'].startswith('/device:'):
                continue
            emeta = plane['event_metadata']
            smeta = plane['stat_metadata']
            # resolve per-op invariants once per metadata id
            op_info: dict[int, tuple] = {}

            def info(mid):
                if mid not in op_info:
                    em = emeta.get(mid, {'name': '', 'stats': []})
                    cat = scope = None
                    flops = nbytes = 0
                    for smid, sval in em.get('stats', []):
                        nm = smeta.get(smid)
                        if sval is None:
                            continue
                        kind, v = sval
                        if nm == 'hlo_category':
                            cat = smeta.get(v) if kind == 'ref' else v
                        elif nm == 'tf_op':
                            scope = smeta.get(v) if kind == 'ref' else v
                        elif nm == 'flops' and kind == 'int':
                            flops = v
                        elif nm == 'bytes_accessed' and kind == 'int':
                            nbytes = v
                    if cat is None:
                        cat = em['name'].split(' ')[0].split('.')[0].lstrip('%') \
                            or 'unknown'
                    op_info[mid] = (cat, scope or em['name'], flops, nbytes)
                return op_info[mid]

            for line in plane['lines']:
                is_async = 'Async' in line['name']
                if 'XLA Ops' not in line['name']:
                    continue
                for mid, _off, dur, _stats in line['events']:
                    if dur <= 0:
                        continue
                    cat, scope, flops, nbytes = info(mid)
                    if is_async:
                        async_ps += dur
                        continue
                    total_ps += dur
                    by_cat[cat] = by_cat.get(cat, 0.0) + dur
                    rec = by_op.setdefault(scope, [0.0, cat])
                    rec[0] += dur
                    if buckets:
                        hay = scope.lower()
                        for bname, pats in buckets.items():
                            if any(p in hay for p in pats):
                                break
                        else:
                            bname = '_other'
                        cell = by_bucket.setdefault(
                            bname, {'ps': 0.0, 'flops': 0, 'bytes': 0,
                                    'cats': {}})
                        cell['ps'] += dur
                        cell['flops'] += flops
                        cell['bytes'] += nbytes
                        cell['cats'][cat] = cell['cats'].get(cat, 0.0) + dur
    if total_ps == 0:
        return None
    to_ms = 1e-9
    top = sorted(by_op.items(), key=lambda kv: -kv[1][0])[:top_n]
    return {
        'total_ms': round(total_ps * to_ms, 3),
        'async_ms': round(async_ps * to_ms, 3),
        'by_category': {k: round(v * to_ms, 3)
                        for k, v in sorted(by_cat.items(), key=lambda kv: -kv[1])},
        'by_bucket': {
            k: {
                'ms': round(cell['ps'] * to_ms, 3),
                'gflops': round(cell['flops'] / 1e9, 2),
                'gbytes': round(cell['bytes'] / 1e9, 3),
                'by_category': {
                    c: round(v * to_ms, 3)
                    for c, v in sorted(cell['cats'].items(),
                                       key=lambda kv: -kv[1])},
            }
            for k, cell in sorted(by_bucket.items(),
                                  key=lambda kv: -kv[1]['ps'])
        },
        'top_ops': [(n, round(v[0] * to_ms, 3), v[1]) for n, v in top],
    }


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
