"""From-scratch WAV (RIFF) codec — the audio analog of png.py.

Parses the public RIFF/WAVE container: RIFF header, chunk walk, fmt,
data chunk → ``(sample_rate, channels, samples [frames × channels])``.

Supported sample formats (the uncompressed interchange superset real
crawls actually carry):

* PCM (format 1): 8-bit (unsigned, returned as uint8), 16-bit
  (int16), 24-bit (sign-extended into int32), 32-bit (int32)
* IEEE float (format 3): 32-bit (float32) and 64-bit (float64)
* WAVE_FORMAT_EXTENSIBLE (0xFFFE): unwrapped via the SubFormat GUID's
  leading format code to either of the above

Samples come back in their NATIVE dtype — no silent renormalization.
Anything else (µ-law, ADPCM, unknown GUIDs) raises ``WavFormatError``
loudly — never a silently wrong waveform. The encoder writes canonical
layouts for fixtures and sinks at any supported depth.

The decoder is pinned in tests to byte layouts assembled directly from
spec fields (not via ``encode``), the same codec-oracle pattern as the
PNG/PBF/WARC readers.
"""

from __future__ import annotations

import struct

import numpy as np


class WavFormatError(ValueError):
    """Malformed or out-of-subset WAV input."""


_FMT_PCM = 1
_FMT_FLOAT = 3
_FMT_EXTENSIBLE = 0xFFFE


def _resolve_format(body: bytes, size: int):
    """fmt chunk body → (kind, channels, rate, bits) with kind in
    {'pcm', 'float'}; unwraps WAVE_FORMAT_EXTENSIBLE SubFormat."""
    audio_fmt, channels, rate, _brate, _align, bits = struct.unpack_from(
        "<HHIIHH", body, 0
    )
    if audio_fmt == _FMT_EXTENSIBLE:
        if size < 40:
            raise WavFormatError("extensible fmt chunk too short")
        # cbSize(H@16) wValidBits(H@18) channelMask(I@20) SubFormat@24,
        # whose first 16 bits are the wrapped format code
        audio_fmt = struct.unpack_from("<H", body, 24)[0]
    if audio_fmt == _FMT_PCM:
        if bits not in (8, 16, 24, 32):
            raise WavFormatError(
                f"unsupported PCM bit depth {bits} (8/16/24/32 only)"
            )
        kind = "pcm"
    elif audio_fmt == _FMT_FLOAT:
        if bits not in (32, 64):
            raise WavFormatError(
                f"unsupported float bit depth {bits} (32/64 only)"
            )
        kind = "float"
    else:
        raise WavFormatError(
            f"unsupported audio format {audio_fmt} (PCM and IEEE float only)"
        )
    if channels < 1:
        raise WavFormatError("zero channels")
    return kind, channels, rate, bits


def _decode_samples(pcm: bytes, kind: str, channels: int, bits: int
                    ) -> np.ndarray:
    step = (bits // 8) * channels
    pcm = pcm[: len(pcm) - (len(pcm) % step)] if step else pcm
    if kind == "float":
        dt = "<f4" if bits == 32 else "<f8"
        return np.frombuffer(pcm, dtype=dt).reshape(-1, channels)
    if bits == 8:
        return np.frombuffer(pcm, dtype=np.uint8).reshape(-1, channels)
    if bits == 16:
        return np.frombuffer(pcm, dtype="<i2").reshape(-1, channels)
    if bits == 32:
        return np.frombuffer(pcm, dtype="<i4").reshape(-1, channels)
    # 24-bit: assemble little-endian triplets, then sign-extend
    b = np.frombuffer(pcm, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
    v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
    v = (v ^ 0x800000) - 0x800000
    return v.reshape(-1, channels)


def decode(data: bytes) -> tuple[int, int, np.ndarray]:
    """WAV bytes → (sample_rate, channels, samples [n, channels]) in
    the stream's native dtype (see module docstring)."""
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
            fmt = _resolve_format(body, size)
        elif cid == b"data":
            pcm = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        raise WavFormatError("missing fmt chunk")
    if pcm is None:
        raise WavFormatError("missing data chunk")
    kind, channels, rate, bits = fmt
    return rate, channels, _decode_samples(pcm, kind, channels, bits)


def encode(samples: np.ndarray, rate: int, bits: int | None = None,
           fmt: str = "pcm") -> bytes:
    """Samples ([n] or [n, channels]) → canonical WAV bytes.

    ``fmt='pcm'`` with bits 8 (uint8 in), 16 (int16), 24 (int32 in,
    low 3 bytes written) or 32 (int32); ``fmt='float'`` with bits 32
    (float32) or 64 (float64). Defaults: 16-bit PCM / 32-bit float."""
    s = np.asarray(samples)
    if s.ndim == 1:
        s = s[:, None]
    channels = s.shape[1]
    if fmt == "float":
        bits = bits or 32
        if bits not in (32, 64):
            raise WavFormatError("float bits must be 32 or 64")
        data = s.astype("<f4" if bits == 32 else "<f8").tobytes()
        tag = _FMT_FLOAT
    elif fmt == "pcm":
        bits = bits or 16
        if bits == 8:
            data = s.astype(np.uint8).tobytes()
        elif bits == 16:
            data = s.astype("<i2").tobytes()
        elif bits == 24:
            v = s.astype("<i4").reshape(-1)
            b = np.empty((v.size, 3), np.uint8)
            b[:, 0] = v & 0xFF
            b[:, 1] = (v >> 8) & 0xFF
            b[:, 2] = (v >> 16) & 0xFF
            data = b.tobytes()
        elif bits == 32:
            data = s.astype("<i4").tobytes()
        else:
            raise WavFormatError("pcm bits must be 8, 16, 24 or 32")
        tag = _FMT_PCM
    else:
        raise WavFormatError(f"unknown fmt {fmt!r}")
    block = channels * bits // 8
    fmt_body = struct.pack("<HHIIHH", tag, channels, rate, rate * block,
                           block, bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt_body)) + fmt_body
    chunks += b"data" + struct.pack("<I", len(data)) + data
    if len(data) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
