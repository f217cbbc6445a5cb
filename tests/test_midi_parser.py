"""MIDI parser unit tests (diffusynth_tpu/midi/parser.py — the mido
replacement). Fast, pure-host."""

from diffusynth_tpu.midi import MidiFile
from diffusynth_tpu.midi.parser import write_midi


def test_roundtrip_notes_and_velocity(tmp_path):
    """NoteEvent carries the ONSET velocity (deliberate deviation: the
    reference records the closing v==0 event's velocity — always 0 — and
    never reads it, track_maker.py:104-112)."""
    path = str(tmp_path / "t.mid")
    notes = [(52, 127, 0, 480), (59, 32, 480, 960), (64, 100, 1440, 240)]
    write_midi(path, notes, ticks_per_beat=480)

    mid = MidiFile.from_file(path)
    assert mid.ticks_per_beat == 480
    evs = mid.tracks[0].note_events
    assert [(e.note, e.velocity, e.start_time, e.duration) for e in evs] \
        == notes


def test_overlapping_distinct_pitches(tmp_path):
    path = str(tmp_path / "o.mid")
    write_midi(path, [(52, 90, 0, 960), (55, 80, 240, 480)])
    evs = MidiFile.from_file(path).tracks[0].note_events
    got = sorted((e.note, e.velocity, e.start_time, e.duration) for e in evs)
    assert got == [(52, 90, 0, 960), (55, 80, 240, 480)]


def test_tempo_events_and_seconds(tmp_path):
    path = str(tmp_path / "tempo.mid")
    write_midi(path, [(60, 100, 0, 480)], ticks_per_beat=480, tempo=250000)
    mid = MidiFile.from_file(path)
    tempos = mid.tracks[0].tempo_events
    assert tempos and tempos[0].tempo == 250000
