"""From-scratch AVI (RIFF) container codec — DIB and MJPEG video.

Completes the multimodal trio next to png.py and wav.py: parses the
public RIFF-AVI layout — ``RIFF('AVI ' LIST(hdrl avih … LIST(strl strh
strf)) LIST(movi 00db…))`` — with two frame codecs:

* BI_RGB (uncompressed) 24-bit DIB frames: bottom-up rows, BGR byte
  order, 4-byte row stride.
* MJPEG (biCompression 'MJPG'): each ``00dc`` chunk is a standalone
  JPEG stream decoded by functions/jpeg.py — the dominant compressed
  codec in real crawl AVI. Frames that omit DHT (the common MJPEG
  convention) fall back to the Annex K default tables.

Other compressions raise ``AviFormatError`` loudly — container parsing
is REAL, codec payloads outside the subset are refused, never silently
wrong.

``decode`` returns (fps, frames) with frames as top-down RGB uint8
arrays [h, w, 3]; ``encode`` writes the canonical layout for fixtures
and sinks (``codec='DIB'`` or ``'MJPG'``). The decoder is pinned in
tests to chunk streams assembled directly from spec fields
(codec-oracle pattern).
"""

from __future__ import annotations

import struct

import numpy as np

_MJPG_FOURCC = struct.unpack("<I", b"MJPG")[0]


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
    mjpeg = False
    cur_stream = None  # fcc of the strh owning the next strf
    frames: list[np.ndarray] = []

    def walk(pos, end):
        nonlocal width, height, rate, scale, mjpeg, cur_stream
        for cid, body, size in _chunks(data, pos, end):
            if cid == b"LIST":
                walk(body + 4, body + size)  # skip the list type fourcc
            elif cid == b"avih":
                if size < 40:
                    raise AviFormatError("avih too short")
                width, height = struct.unpack_from("<II", data, body + 32)
            elif cid == b"strh":
                fcc = data[body : body + 4]
                cur_stream = fcc
                if fcc == b"vids":
                    handler = data[body + 4 : body + 8]
                    if handler not in (b"DIB ", b"\x00\x00\x00\x00",
                                       b"MJPG", b"mjpg"):
                        raise AviFormatError(
                            f"unsupported video handler {handler!r}"
                        )
                    scale, rate = struct.unpack_from("<II", data, body + 20)
            elif cid == b"strf":
                # strf layout depends on the owning strh: BITMAPINFOHEADER
                # for 'vids', WAVEFORMATEX for 'auds' — only validate the
                # video one (audio tracks pass through untouched).
                if cur_stream == b"vids" and size >= 16:
                    comp = struct.unpack_from("<I", data, body + 16)[0]
                    bits = struct.unpack_from("<H", data, body + 14)[0]
                    if comp == _MJPG_FOURCC:
                        mjpeg = True
                    elif comp != 0:
                        raise AviFormatError(
                            f"unsupported compression {comp} "
                            "(BI_RGB and MJPG only)"
                        )
                    elif bits != 24:
                        raise AviFormatError(
                            f"unsupported bit depth {bits} (24 only)"
                        )
            elif cid[2:4] in (b"db", b"dc"):
                if width is None:
                    raise AviFormatError("frame before avih header")
                if mjpeg:
                    frames.append(
                        _decode_mjpeg_frame(
                            data[body : body + size], height, width
                        )
                    )
                    continue
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


def _decode_mjpeg_frame(payload: bytes, height: int, width: int
                        ) -> np.ndarray:
    """One 00dc chunk → (h, w, 3) RGB frame via the JPEG codec.
    MJPEG frames commonly omit DHT (OpenDML convention), so the Annex K
    defaults are pre-seeded; an in-stream DHT overrides them."""
    from . import jpeg

    try:
        img = jpeg.decode(payload, default_huff=True)
    except jpeg.JpegFormatError as e:
        raise AviFormatError(f"bad MJPEG frame: {e}") from e
    if img.shape[:2] != (height, width):
        raise AviFormatError(
            f"MJPEG frame {img.shape[1]}x{img.shape[0]} does not match "
            f"container {width}x{height}"
        )
    if img.shape[2] == 1:  # grayscale frame → replicate to RGB
        img = np.repeat(img, 3, axis=2)
    return img


def encode(frames: list[np.ndarray], fps: int = 10,
           codec: str = "DIB") -> bytes:
    """[h, w, 3] RGB top-down uint8 frames → canonical AVI bytes.
    ``codec``: 'DIB' (uncompressed BI_RGB) or 'MJPG' (each frame a
    baseline 4:4:4 JPEG — lossy like any real MJPEG)."""
    if not frames:
        raise AviFormatError("cannot encode zero frames")
    if codec not in ("DIB", "MJPG"):
        raise AviFormatError(f"unsupported codec {codec!r}")
    mjpeg = codec == "MJPG"
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
        b"vids" + (b"MJPG" if mjpeg else b"DIB ")
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(frames), 0, 0, 0)
        + b"\x00" * 8
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24,
                       _MJPG_FOURCC if mjpeg else 0, stride * h,
                       0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b""
    for f in frames:
        if f.shape != (h, w, 3):
            raise AviFormatError("inconsistent frame shapes")
        if mjpeg:
            from . import jpeg

            movi_body += chunk(b"00dc", jpeg.encode(np.asarray(f, np.uint8),
                                                    "444"))
            continue
        bgr = np.asarray(f, np.uint8)[:, :, ::-1][::-1]  # RGB→BGR, top→bottom
        rows = np.zeros((h, stride), np.uint8)
        rows[:, : w * 3] = bgr.reshape(h, w * 3)
        movi_body += chunk(b"00db", rows.tobytes())
    movi = lst(b"movi", movi_body)
    riff_body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body
