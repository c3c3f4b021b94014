"""From-scratch AVI (RIFF) container codec — uncompressed DIB video.

Completes the multimodal trio next to png.py and wav.py: parses the
public RIFF-AVI layout — ``RIFF('AVI ' LIST(hdrl avih … LIST(strl strh
strf)) LIST(movi 00db…))`` — with BI_RGB (uncompressed) 24-bit DIB
frames: bottom-up rows, BGR byte order, 4-byte row stride. Compressed
streams (any biCompression ≠ 0 / non-'vids' first stream) raise
``AviFormatError`` loudly — container parsing is REAL, codec payloads
outside the uncompressed subset are refused, never silently wrong.

``decode`` returns (fps, frames) with frames as top-down RGB uint8
arrays [h, w, 3]; ``encode`` writes the canonical layout for fixtures
and sinks. The decoder is pinned in tests to chunk streams assembled
directly from spec fields (codec-oracle pattern).
"""

from __future__ import annotations

import struct

import numpy as np


class AviFormatError(ValueError):
    """Malformed or out-of-subset AVI input."""


def _chunks(data: bytes, pos: int, end: int):
    while pos + 8 <= end:
        cid = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        if body_start + size > end:
            raise AviFormatError(f"truncated chunk {cid!r}")
        yield cid, body_start, size
        pos = body_start + size + (size & 1)  # word-aligned


def decode(data: bytes) -> tuple[float, list[np.ndarray]]:
    """AVI bytes → (fps, [frame arrays (h, w, 3) RGB top-down])."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise AviFormatError("not a RIFF/AVI file")
    width = height = None
    rate = scale = None
    frames: list[np.ndarray] = []

    def walk(pos, end):
        nonlocal width, height, rate, scale
        for cid, body, size in _chunks(data, pos, end):
            if cid == b"LIST":
                walk(body + 4, body + size)  # skip the list type fourcc
            elif cid == b"avih":
                if size < 40:
                    raise AviFormatError("avih too short")
                width, height = struct.unpack_from("<II", data, body + 32)
            elif cid == b"strh":
                fcc = data[body : body + 4]
                if fcc == b"vids":
                    handler = data[body + 4 : body + 8]
                    if handler not in (b"DIB ", b"\x00\x00\x00\x00"):
                        raise AviFormatError(
                            f"unsupported video handler {handler!r}"
                        )
                    scale, rate = struct.unpack_from("<II", data, body + 20)
            elif cid == b"strf":
                if size >= 16:
                    comp = struct.unpack_from("<I", data, body + 16)[0]
                    bits = struct.unpack_from("<H", data, body + 14)[0]
                    if comp != 0:
                        raise AviFormatError(
                            f"unsupported compression {comp} (BI_RGB only)"
                        )
                    if bits != 24:
                        raise AviFormatError(
                            f"unsupported bit depth {bits} (24 only)"
                        )
            elif cid[2:4] in (b"db", b"dc"):
                if width is None:
                    raise AviFormatError("frame before avih header")
                stride = (width * 3 + 3) & ~3
                if size < stride * height:
                    raise AviFormatError("frame chunk smaller than frame")
                raw = np.frombuffer(
                    data, np.uint8, count=stride * height, offset=body
                ).reshape(height, stride)[:, : width * 3]
                bgr = raw.reshape(height, width, 3)[::-1]  # bottom-up → top
                frames.append(bgr[:, :, ::-1].copy())  # BGR → RGB

    walk(12, len(data))
    if width is None:
        raise AviFormatError("missing avih header")
    fps = (rate / scale) if rate and scale else 0.0
    return fps, frames


def encode(frames: list[np.ndarray], fps: int = 10) -> bytes:
    """[h, w, 3] RGB top-down uint8 frames → canonical AVI bytes."""
    if not frames:
        raise AviFormatError("cannot encode zero frames")
    h, w, c = frames[0].shape
    if c != 3:
        raise AviFormatError("RGB frames required")
    stride = (w * 3 + 3) & ~3

    def chunk(cid, body):
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(fourcc, body):
        return chunk(b"LIST", fourcc + body)

    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    # flags, priority, language, initial_frames, SCALE, RATE, start,
    # length, buf_size, quality, sample_size + rcFrame(8 zero bytes)
    strh = (
        b"vids" + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), 0, 0, 0)
        + b"\x00" * 8
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    for f in frames:
        if f.shape != (h, w, 3):
            raise AviFormatError("inconsistent frame shapes")
        bgr = np.asarray(f, np.uint8)[:, :, ::-1][::-1]  # RGB→BGR, top→bottom
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        movi_body += chunk(b"00db", rows.tobytes())
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
