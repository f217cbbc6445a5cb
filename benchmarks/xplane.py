"""Minimal pure-Python parser for profiler .xplane.pb files.

The installed tensorboard_plugin_profile's generated protos are incompatible
with the environment's protobuf (descriptor version mismatch), so this
decodes the protobuf wire format directly for the handful of fields needed
to attribute device time per op.

Schema subset (tsl/profiler/protobuf/xplane.proto, stable):
  XSpace.planes = 1 (repeated XPlane)
  XPlane.name = 2, XPlane.lines = 3 (repeated XLine),
  XPlane.event_metadata = 4 (map<int64, XEventMetadata>)
  XLine.name = 2, XLine.events = 4 (repeated XEvent)
  XEvent.metadata_id = 1, XEvent.offset_ps = 2, XEvent.duration_ps = 3
  XEventMetadata.id = 1, XEventMetadata.name = 2
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple


def _decode_varint(buf: bytes, pos: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, object]]:
    """Yield (field_number, wire_type, value) over a message buffer."""
    pos = 0
    n = len(buf)
    while pos < n:
        tag, pos = _decode_varint(buf, pos)
        field, wt = tag >> 3, tag & 7
        if wt == 0:  # varint
            val, pos = _decode_varint(buf, pos)
        elif wt == 1:  # 64-bit
            val = buf[pos:pos + 8]
            pos += 8
        elif wt == 2:  # length-delimited
            ln, pos = _decode_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == 5:  # 32-bit
            val = buf[pos:pos + 4]
            pos += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        yield field, wt, val


class XEvent:
    __slots__ = ("metadata_id", "offset_ps", "duration_ps")

    def __init__(self, buf: bytes):
        self.metadata_id = 0
        self.offset_ps = 0
        self.duration_ps = 0
        for f, _, v in _fields(buf):
            if f == 1:
                self.metadata_id = v
            elif f == 2:
                self.offset_ps = v
            elif f == 3:
                self.duration_ps = v


class XLine:
    __slots__ = ("name", "events", "timestamp_ns")

    def __init__(self, buf: bytes):
        self.name = ""
        self.timestamp_ns = 0
        self.events: List[XEvent] = []
        for f, _, v in _fields(buf):
            if f == 2:
                self.name = v.decode("utf-8", "replace")
            elif f == 3:
                self.timestamp_ns = v
            elif f == 4:
                self.events.append(XEvent(v))


def _event_metadata_entry(buf: bytes) -> Tuple[int, str]:
    """map entry: key = 1 (int64), value = 2 (XEventMetadata)."""
    key, name = 0, ""
    for f, _, v in _fields(buf):
        if f == 1:
            key = v
        elif f == 2:
            for f2, _, v2 in _fields(v):
                if f2 == 2:
                    name = v2.decode("utf-8", "replace")
    return key, name


class XPlane:
    __slots__ = ("name", "lines", "event_names")

    def __init__(self, buf: bytes):
        self.name = ""
        self.lines: List[XLine] = []
        self.event_names: Dict[int, str] = {}
        for f, _, v in _fields(buf):
            if f == 2:
                self.name = v.decode("utf-8", "replace")
            elif f == 3:
                self.lines.append(XLine(v))
            elif f == 4:
                k, n = _event_metadata_entry(v)
                self.event_names[k] = n


def parse_xspace(path: str) -> List[XPlane]:
    with open(path, "rb") as f:
        buf = f.read()
    planes = []
    for f_, _, v in _fields(buf):
        if f_ == 1:
            planes.append(XPlane(v))
    return planes
