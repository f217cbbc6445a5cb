"""Standard MIDI File (SMF format 0/1) parser - the subset needed for track
rendering: note_on/note_off with delta times, set_tempo, ticks_per_beat.

Semantics notes vs the reference (track_maker.py:95-112):
  * The reference ends a note only on note_on with velocity 0 (the running
    convention of its preset MIDIs); real note_off (0x8n) events are treated
    the same here, a strict superset that renders note_off-style files
    correctly too.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import List, Optional, Tuple


DEFAULT_TEMPO = 500_000  # microseconds per beat == 120 BPM


def tick2second(ticks: int, ticks_per_beat: int, tempo: int) -> float:
    """Convert MIDI ticks to seconds at `tempo` us/beat (mido-compatible)."""
    return ticks * tempo / (ticks_per_beat * 1_000_000.0)


@dataclass
class NoteEvent:
    """A parsed note (reference: track_maker.py:50-62)."""

    note: int
    velocity: int
    start_time: int   # absolute ticks
    duration: int     # ticks

    def __str__(self):
        return (f"Note {self.note}, velocity {self.velocity}, "
                f"start_time {self.start_time}, duration {self.duration}")


@dataclass
class TempoEvent:
    time: int    # delta ticks before this event (reference keeps deltas)
    tempo: int   # microseconds per beat


@dataclass
class RawMessage:
    delta: int
    kind: str          # "note_on" | "note_off" | "set_tempo" | "meta" | "other"
    note: int = 0
    velocity: int = 0
    tempo: int = 0
    is_meta: bool = False


@dataclass
class MidiTrack:
    messages: List[RawMessage] = field(default_factory=list)

    @property
    def note_events(self) -> List[NoteEvent]:
        """Close note_on(v>0) with note_on(v==0) OR note_off on the same
        pitch (reference closes only on v==0 note_on,
        track_maker.py:104-112).

        Deliberate deviation: NoteEvent.velocity is the ONSET velocity.
        The reference stores the closing event's velocity — always 0 —
        which is harmless there because nothing reads it; here
        InstrumentConfig.velocity_sensitivity does."""
        events: List[NoteEvent] = []
        start_time = 0
        open_notes = {}
        for msg in self.messages:
            if not msg.is_meta:
                start_time += msg.delta
                if msg.kind == "note_on" and msg.velocity > 0:
                    open_notes[msg.note] = (start_time, msg.velocity)
                elif (msg.kind == "note_on" and msg.velocity == 0) or \
                        msg.kind == "note_off":
                    if msg.note in open_notes:
                        on_time, vel = open_notes.pop(msg.note)
                        events.append(NoteEvent(
                            msg.note, vel, on_time,
                            start_time - on_time,
                        ))
        return events

    @property
    def tempo_events(self) -> List[TempoEvent]:
        """(delta, tempo) pairs mirroring the reference's accumulation
        (track_maker.py:78-93): non-meta events carry the current tempo."""
        out: List[TempoEvent] = []
        current = DEFAULT_TEMPO
        for msg in self.messages:
            if msg.kind == "set_tempo":
                out.append(TempoEvent(msg.delta, msg.tempo))
                current = msg.tempo
            elif not msg.is_meta:
                out.append(TempoEvent(msg.delta, current))
        return out

    @property
    def has_notes(self) -> bool:
        return any(m.kind == "note_on" and m.velocity > 0 for m in self.messages)


@dataclass
class MidiFile:
    format: int
    ticks_per_beat: int
    tracks: List[MidiTrack]

    @classmethod
    def from_file(cls, path: str) -> "MidiFile":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())

    @classmethod
    def from_bytes(cls, data: bytes) -> "MidiFile":
        if data[:4] != b"MThd":
            raise ValueError("not a Standard MIDI File (missing MThd)")
        header_len = struct.unpack(">I", data[4:8])[0]
        fmt, ntracks, division = struct.unpack(">HHH", data[8:14])
        if division & 0x8000:
            raise NotImplementedError("SMPTE time division not supported")
        pos = 8 + header_len
        tracks = []
        for _ in range(ntracks):
            if data[pos:pos + 4] != b"MTrk":
                raise ValueError(f"expected MTrk at offset {pos}")
            length = struct.unpack(">I", data[pos + 4:pos + 8])[0]
            chunk = data[pos + 8:pos + 8 + length]
            tracks.append(_parse_track(chunk))
            pos += 8 + length
        return cls(format=fmt, ticks_per_beat=division, tracks=tracks)


def _read_varlen(data: bytes, pos: int) -> Tuple[int, int]:
    value = 0
    while True:
        b = data[pos]
        pos += 1
        value = (value << 7) | (b & 0x7F)
        if not (b & 0x80):
            return value, pos


def _parse_track(chunk: bytes) -> MidiTrack:
    track = MidiTrack()
    pos = 0
    running_status = 0
    while pos < len(chunk):
        delta, pos = _read_varlen(chunk, pos)
        status = chunk[pos]
        if status & 0x80:
            pos += 1
            if status < 0xF0:
                running_status = status
        else:
            status = running_status  # running status: reuse previous

        if status == 0xFF:  # meta event
            meta_type = chunk[pos]
            pos += 1
            length, pos = _read_varlen(chunk, pos)
            payload = chunk[pos:pos + length]
            pos += length
            if meta_type == 0x51 and length == 3:
                tempo = (payload[0] << 16) | (payload[1] << 8) | payload[2]
                track.messages.append(
                    RawMessage(delta, "set_tempo", tempo=tempo, is_meta=True)
                )
            else:
                track.messages.append(RawMessage(delta, "meta", is_meta=True))
        elif status in (0xF0, 0xF7):  # sysex
            length, pos = _read_varlen(chunk, pos)
            pos += length
            track.messages.append(RawMessage(delta, "other"))
        else:
            kind = status & 0xF0
            if kind == 0x90:
                note, vel = chunk[pos], chunk[pos + 1]
                pos += 2
                track.messages.append(
                    RawMessage(delta, "note_on", note=note, velocity=vel)
                )
            elif kind == 0x80:
                note, vel = chunk[pos], chunk[pos + 1]
                pos += 2
                track.messages.append(
                    RawMessage(delta, "note_off", note=note, velocity=vel)
                )
            elif kind in (0xA0, 0xB0, 0xE0):  # 2-byte data messages
                pos += 2
                track.messages.append(RawMessage(delta, "other"))
            elif kind in (0xC0, 0xD0):        # 1-byte data messages
                pos += 1
                track.messages.append(RawMessage(delta, "other"))
            else:
                raise ValueError(f"unhandled status byte 0x{status:02x}")
    return track


def write_midi(path: str, notes: List[Tuple[int, int, int, int]],
               ticks_per_beat: int = 480, tempo: int = DEFAULT_TEMPO) -> None:
    """Write a single-track SMF from (note, velocity, start_tick, dur_tick)
    tuples - used by tests and demos to fabricate MIDI inputs."""
    events = []  # (abs_tick, order, bytes)
    events.append((0, 0, bytes([0xFF, 0x51, 0x03]) + tempo.to_bytes(3, "big")))
    for note, vel, start, dur in notes:
        events.append((start, 1, bytes([0x90, note, vel])))
        events.append((start + dur, 2, bytes([0x90, note, 0])))
    events.sort(key=lambda e: (e[0], e[1]))

    def varlen(v: int) -> bytes:
        out = [v & 0x7F]
        v >>= 7
        while v:
            out.append(0x80 | (v & 0x7F))
            v >>= 7
        return bytes(reversed(out))

    body = b""
    last = 0
    for tick, _, payload in events:
        body += varlen(tick - last) + payload
        last = tick
    body += varlen(0) + bytes([0xFF, 0x2F, 0x00])  # end of track

    with open(path, "wb") as f:
        f.write(b"MThd" + struct.pack(">IHHH", 6, 0, 1, ticks_per_beat))
        f.write(b"MTrk" + struct.pack(">I", len(body)) + body)
