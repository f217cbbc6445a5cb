"""ctypes bindings for the C++ audio runtime (native/src/diffusynth_native.cpp)
with numpy fallbacks.

The native path replaces the reference's host-side Python loops (per-sample
WAV IO, serial track mixdown, reference: track_maker.py:131-147) with
multithreaded C++; the numpy fallback keeps every feature working when the
library has not been built.
"""

from __future__ import annotations

import ctypes
import os
from typing import List, Optional, Sequence, Tuple

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native",
                 "libdiffusynth_native.so"),
    os.path.join(os.path.dirname(__file__), "libdiffusynth_native.so"),
]

_lib = None
for _p in _LIB_PATHS:
    _p = os.path.abspath(_p)
    if os.path.exists(_p):
        try:
            _lib = ctypes.CDLL(_p)
            break
        except OSError:
            _lib = None

AVAILABLE = _lib is not None

if AVAILABLE:
    _lib.dsyn_wav_read.restype = ctypes.c_int64
    _lib.dsyn_wav_read.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    _lib.dsyn_wav_write.restype = ctypes.c_int
    _lib.dsyn_wav_write.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ctypes.c_int32,
    ]

    class _WavInfo(ctypes.Structure):
        _fields_ = [("sample_rate", ctypes.c_int32),
                    ("channels", ctypes.c_int32),
                    ("frames", ctypes.c_int64),
                    ("format", ctypes.c_int32)]

    _lib.dsyn_wav_info.restype = ctypes.c_int
    _lib.dsyn_wav_info.argtypes = [ctypes.c_char_p, ctypes.POINTER(_WavInfo)]

    _lib.dsyn_peak_normalize.restype = None
    _lib.dsyn_peak_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
    ]
    _lib.dsyn_rms_normalize.restype = None
    _lib.dsyn_rms_normalize.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float,
    ]
    _i64p = ctypes.POINTER(ctypes.c_int64)
    _f32p = ctypes.POINTER(ctypes.c_float)
    _lib.dsyn_mixdown.restype = None
    _lib.dsyn_mixdown.argtypes = [
        _f32p, _i64p, _i64p, _i64p, ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, _f32p, _i64p, _i64p, ctypes.c_int32, ctypes.c_int32,
    ]
    _lib.dsyn_sum_tracks.restype = None
    _lib.dsyn_sum_tracks.argtypes = [
        _f32p, _i64p, _i64p, ctypes.c_int32, _f32p, ctypes.c_int64,
    ]


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def read_wav(path: str) -> Tuple[int, np.ndarray]:
    """Read a WAV file as (sample_rate, float32 mono in [-1, 1])."""
    if AVAILABLE:
        info = _WavInfo()
        rc = _lib.dsyn_wav_info(path.encode(), ctypes.byref(info))
        if rc == 0:
            out = np.empty(info.frames, dtype=np.float32)
            n = _lib.dsyn_wav_read(path.encode(), _fptr(out), info.frames)
            if n >= 0:
                return int(info.sample_rate), out[:n]
    from scipy.io import wavfile

    sr, data = wavfile.read(path)
    data = np.asarray(data, dtype=np.float32)
    if data.ndim == 2:
        data = data.mean(axis=1)
    if np.abs(data).max() > 2.0:
        data = data / 32768.0
    return int(sr), data


def write_wav(path: str, data: np.ndarray, sample_rate: int) -> None:
    """Write mono audio as PCM16 WAV (float32 in [-1, 1], or int16 PCM
    passed through untouched — e.g. device-converted pipeline output)."""
    data = np.asarray(data)
    if data.dtype == np.int16:
        from scipy.io import wavfile

        wavfile.write(path, sample_rate, np.ascontiguousarray(data))
        return
    data = np.ascontiguousarray(data.astype(np.float32))
    if AVAILABLE:
        rc = _lib.dsyn_wav_write(path.encode(), _fptr(data),
                                 len(data), sample_rate)
        if rc == 0:
            return
    from scipy.io import wavfile

    wavfile.write(path, sample_rate, data)


def peak_normalize(batch: np.ndarray) -> np.ndarray:
    """Per-row peak normalization, in place on a copy."""
    out = np.ascontiguousarray(batch, dtype=np.float32).copy()
    if AVAILABLE and out.ndim == 2:
        _lib.dsyn_peak_normalize(_fptr(out), out.shape[0], out.shape[1])
        return out
    peaks = np.max(np.abs(out), axis=-1, keepdims=True)
    peaks[peaks == 0] = 1.0
    return out / peaks


def rms_normalize_batch(batch: np.ndarray, target_rms: float = 0.1) -> np.ndarray:
    out = np.ascontiguousarray(batch, dtype=np.float32).copy()
    if AVAILABLE and out.ndim == 2:
        _lib.dsyn_rms_normalize(_fptr(out), out.shape[0], out.shape[1],
                                target_rms)
        return out
    rms = np.sqrt(np.mean(out**2, axis=-1, keepdims=True))
    rms[rms == 0] = 1.0
    return out * (target_rms / rms)


def mixdown(
    note_audios: Sequence[np.ndarray],
    starts: Sequence[int],
    track_of: Sequence[int],
    track_lengths: Sequence[int],
    n_threads: int = 4,
) -> List[np.ndarray]:
    """Scatter-add notes into per-track buffers; returns the track buffers."""
    n_tracks = len(track_lengths)
    if AVAILABLE and note_audios:
        notes = np.concatenate(
            [np.ascontiguousarray(a, np.float32) for a in note_audios])
        lengths = np.asarray([len(a) for a in note_audios], np.int64)
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int64)
        starts_a = np.asarray(starts, np.int64)
        track_of_a = np.asarray(track_of, np.int32)
        tl = np.asarray(track_lengths, np.int64)
        toff = np.concatenate([[0], np.cumsum(tl)[:-1]]).astype(np.int64)
        tracks = np.zeros(int(tl.sum()), np.float32)
        _lib.dsyn_mixdown(
            _fptr(notes), _iptr(offsets), _iptr(lengths), _iptr(starts_a),
            track_of_a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(note_audios), _fptr(tracks), _iptr(toff), _iptr(tl),
            n_tracks, n_threads,
        )
        return [tracks[toff[t]:toff[t] + tl[t]].copy()
                for t in range(n_tracks)]
    buffers = [np.zeros(int(t), np.float32) for t in track_lengths]
    for audio, start, t in zip(note_audios, starts, track_of):
        buf = buffers[t]
        start = int(start)
        if start >= len(buf):
            continue
        end = min(start + len(audio), len(buf))
        buf[start:end] += audio[: end - start]
    return buffers


def sum_tracks(tracks: Sequence[np.ndarray]) -> np.ndarray:
    """Sum variable-length track buffers into one padded output."""
    if not tracks:
        return np.zeros(0, np.float32)
    if AVAILABLE:
        tl = np.asarray([len(t) for t in tracks], np.int64)
        toff = np.concatenate([[0], np.cumsum(tl)[:-1]]).astype(np.int64)
        flat = np.concatenate(
            [np.ascontiguousarray(t, np.float32) for t in tracks])
        out = np.zeros(int(tl.max()), np.float32)
        _lib.dsyn_sum_tracks(_fptr(flat), _iptr(toff), _iptr(tl),
                             len(tracks), _fptr(out), len(out))
        return out
    max_len = max(len(t) for t in tracks)
    out = np.zeros(max_len, np.float32)
    for t in tracks:
        out[: len(t)] += t
    return out
