"""From-scratch PNG codec (no PIL in this container; zlib is).

Makes the multimodal image column a REAL decoded surface instead of
plumbing-only: ``decode(payload)`` parses the public PNG wire format —
signature, chunk stream with CRC verification, IHDR, concatenated IDAT
zlib inflate, and all five scanline filters (None/Sub/Up/Average/Paeth)
— into an ``(h, w, c) uint8`` numpy array. ``encode(array)`` writes a
valid non-interlaced PNG (filter 0 rows) for fixtures and sinks.

Supported subset (fail-loud outside it): bit depth 8, color types
0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced. Palette,
16-bit, and Adam7 interlace raise ``PngFormatError`` — never a silent
wrong image. The decoder is pinned in tests to chunk streams assembled
directly from spec fields (not via ``encode``), so a symmetric
encoder+decoder bug cannot cancel.

Reference analog: the reference ships image handling only behind
external libs; this is the container-native equivalent for the
training-data pipeline's multimodal columns.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Malformed or out-of-subset PNG input."""


def _iter_chunks(data: bytes):
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngFormatError(f"truncated chunk {ctype!r}")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"bad CRC in chunk {ctype!r}")
        yield ctype, body
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise PngFormatError("missing IEND chunk")


def decode(data: bytes) -> np.ndarray:
    """PNG bytes → (height, width, channels) uint8 array."""
    if data[:8] != _SIGNATURE:
        raise PngFormatError("not a PNG (bad signature)")
    width = height = None
    channels = 0
    idat = bytearray()
    for ctype, body in _iter_chunks(data):
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise PngFormatError(f"unsupported bit depth {depth} (only 8)")
            if color not in _CHANNELS:
                raise PngFormatError(
                    f"unsupported color type {color} (palette not supported)"
                )
            if comp != 0 or filt != 0:
                raise PngFormatError("unsupported compression/filter method")
            if interlace != 0:
                raise PngFormatError("Adam7 interlace not supported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
    if width is None:
        raise PngFormatError("missing IHDR")
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    stride = width * channels
    if raw.size != height * (stride + 1):
        raise PngFormatError(
            f"IDAT size {raw.size} != {height}x({stride}+1) expected"
        )
    rows = raw.reshape(height, stride + 1)
    out = np.empty((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at depth 8
    for y in range(height):
        f = int(rows[y, 0])
        line = rows[y, 1:]
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if f == 0:  # None
            out[y] = line
        elif f == 1:  # Sub — prefix sum per byte lane mod 256
            cur = line.reshape(-1, bpp)
            out[y] = np.cumsum(cur, axis=0, dtype=np.uint64).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up
            out[y] = line + prev
        elif f == 3:  # Average
            o = out[y]
            for x in range(stride):
                left = int(o[x - bpp]) if x >= bpp else 0
                o[x] = (int(line[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            o = out[y]
            for x in range(stride):
                a = int(o[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                o[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise PngFormatError(f"unknown scanline filter {f}")
    return out.reshape(height, width, channels)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode(img: np.ndarray, level: int = 6) -> bytes:
    """(h, w) or (h, w, c) uint8 array → PNG bytes (filter 0 rows)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}.get(c)
    if color is None:
        raise PngFormatError(f"cannot encode {c}-channel image")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    flat = img.reshape(h, w * c)
    scan = np.concatenate([np.zeros((h, 1), dtype=np.uint8), flat], axis=1)
    idat = zlib.compress(scan.tobytes(), level)
    return _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")
