"""Minimal Standard MIDI File support (host-side, pure Python).

The reference depends on mido for parsing (reference: track_maker.py:50-112,
note2music.py:40-74); this package provides the subset the framework needs -
header parsing, per-track delta-time event streams, note_on/note_off and
set_tempo events - with no third-party dependency.
"""

from diffusynth_tpu.midi.parser import (
    MidiFile,
    MidiTrack,
    NoteEvent,
    TempoEvent,
    tick2second,
)
