"""From-scratch WAV (RIFF PCM) codec — the audio analog of png.py.

Parses the public RIFF/WAVE container: RIFF header, chunk walk, fmt
(PCM 16-bit only — the uncompressed interchange subset), data chunk →
``(sample_rate, channels, int16 samples [frames × channels])``.
Anything non-PCM (µ-law, ADPCM, float, extensible) raises
``WavFormatError`` loudly — never a silently wrong waveform. The
encoder writes canonical 44-byte-header PCM16 for fixtures and sinks.

The decoder is pinned in tests to byte layouts assembled directly from
spec fields (not via ``encode``), the same codec-oracle pattern as the
PNG/PBF/WARC readers.
"""

from __future__ import annotations

import struct

import numpy as np


class WavFormatError(ValueError):
    """Malformed or out-of-subset WAV input."""


def decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes → (sample_rate, channels, int16 array [n, channels])."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise WavFormatError("not a RIFF/WAVE file")
    pos = 12
    fmt = None
    pcm = None
    n = len(data)
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise WavFormatError(f"truncated chunk {cid!r}")
        if cid == b"fmt ":
            if size < 16:
                raise WavFormatError("fmt chunk too short")
            audio_fmt, channels, rate, _brate, _align, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1:
                raise WavFormatError(
                    f"unsupported audio format {audio_fmt} (PCM=1 only)"
                )
            if bits != 16:
                raise WavFormatError(f"unsupported bit depth {bits} (16 only)")
            if channels < 1:
                raise WavFormatError("zero channels")
            fmt = (rate, channels)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavFormatError("missing fmt chunk")
    if pcm is None:
        raise WavFormatError("missing data chunk")
    rate, channels = fmt
    samples = np.frombuffer(pcm[: len(pcm) - (len(pcm) % (2 * channels))],
                            dtype="<i2")
    return rate, channels, samples.reshape(-1, channels)


def encode(samples: np.ndarray, rate: int) -> bytes:
    """int16 array ([n] or [n, channels]) → canonical PCM16 WAV bytes."""
    s = np.asarray(samples, dtype="<i2")
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    data = s.tobytes()
    byte_rate = rate * channels * 2
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, channels * 2, 16)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
