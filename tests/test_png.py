"""From-scratch PNG codec (functions/png.py).

The decoder is pinned to chunk streams assembled DIRECTLY from spec
fields in this file (never via png.encode), so a symmetric
encoder+decoder bug cannot cancel — the same codec-oracle pattern as
the PBF/WARC readers. An independent scalar-loop unfilter (written
straight from the PNG spec, sharing no code with the codec) checks
every filter type against the vectorized implementation.
"""

import struct
import zlib

import numpy as np
import pytest

from sophox_spark.functions import png


def chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def build_png(w, h, color_type, scanlines: bytes, depth=8, interlace=0) -> bytes:
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scanlines))
        + chunk(b"IEND", b"")
    )


def spec_unfilter(scanlines: bytes, w, h, bpp):
    """Independent reference: the PNG spec's unfilter, scalar loops."""
    stride = w * bpp
    rows = np.frombuffer(scanlines, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int64)
    for y in range(h):
        f = rows[y, 0]
        for x in range(stride):
            raw = int(rows[y, 1 + x])
            a = out[y, x - bpp] if x >= bpp else 0
            b = out[y - 1, x] if y else 0
            c = out[y - 1, x - bpp] if (y and x >= bpp) else 0
            if f == 0:
                v = raw
            elif f == 1:
                v = raw + a
            elif f == 2:
                v = raw + b
            elif f == 3:
                v = raw + (a + b) // 2
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = raw + pred
            out[y, x] = v & 0xFF
    return out.astype(np.uint8).reshape(h, w, bpp)


class TestDecodeHandAssembled:
    def test_sub_filter_literal(self):
        # 3x1 RGB, Sub filter: running per-lane sums, hand-computed
        scan = bytes([1, 1, 2, 3, 4, 5, 6, 7, 8, 9])
        img = png.decode(build_png(3, 1, 2, scan))
        assert img.tolist() == [[[1, 2, 3], [5, 7, 9], [12, 15, 18]]]

    def test_up_filter_literal(self):
        # 2x2 gray: row0 none [10, 20]; row1 up [+5, +250 (wraps)]
        scan = bytes([0, 10, 20, 2, 5, 250])
        img = png.decode(build_png(2, 2, 0, scan))
        assert img.reshape(2, 2).tolist() == [[10, 20], [15, (20 + 250) % 256]]

    def test_average_filter_literal(self):
        # 2x2 gray: row0 [100, 200]; row1 avg: raw 10 → 10+(0+100)//2=60,
        # raw 20 → 20+(60+200)//2=150
        scan = bytes([0, 100, 200, 3, 10, 20])
        img = png.decode(build_png(2, 2, 0, scan))
        assert img.reshape(2, 2).tolist() == [[100, 200], [60, 150]]

    def test_paeth_filter_literal(self):
        # 2x2 gray: row0 [1, 5]; row1 paeth: x=0 pred=b=1 → 11;
        # x=1: a=11,b=5,c=1, p=15, pa=4,pb=10,pc=14 → pred=a → 25
        scan = bytes([0, 1, 5, 4, 10, 14])
        img = png.decode(build_png(2, 2, 0, scan))
        assert img.reshape(2, 2).tolist() == [[1, 5], [11, 25]]

    @pytest.mark.parametrize("color,ch", [(0, 1), (2, 3), (4, 2), (6, 4)])
    def test_all_filters_vs_spec_reference(self, color, ch):
        rng = np.random.default_rng(100 + color)
        w, h = 7, 6
        stride = w * ch
        lines = bytearray()
        for y in range(h):
            lines.append(y % 5)  # cycle through every filter type
            lines += bytes(rng.integers(0, 256, stride, dtype=np.uint8))
        data = build_png(w, h, color, bytes(lines))
        got = png.decode(data)
        want = spec_unfilter(bytes(lines), w, h, ch)
        assert got.shape == (h, w, ch)
        np.testing.assert_array_equal(got, want)

    def test_multiple_idat_chunks_concatenate(self):
        scan = bytes([0, 1, 2, 0, 3, 4])
        z = zlib.compress(scan)
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
        data = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", z[:5])
            + chunk(b"IDAT", z[5:])
            + chunk(b"IEND", b"")
        )
        assert png.decode(data).reshape(2, 2).tolist() == [[1, 2], [3, 4]]


class TestFailLoud:
    def test_bad_signature(self):
        with pytest.raises(png.PngFormatError):
            png.decode(b"NOTAPNG!" + b"\x00" * 20)

    def test_bad_crc(self):
        data = bytearray(build_png(2, 1, 0, bytes([0, 1, 2])))
        data[-5] ^= 0xFF  # corrupt IEND CRC
        with pytest.raises(png.PngFormatError, match="CRC"):
            png.decode(bytes(data))

    def test_palette_rejected(self):
        with pytest.raises(png.PngFormatError, match="color type"):
            png.decode(build_png(2, 1, 3, bytes([0, 0, 1])))

    def test_16bit_rejected(self):
        with pytest.raises(png.PngFormatError, match="bit depth"):
            png.decode(build_png(2, 1, 0, bytes([0, 0, 0, 0, 0]), depth=16))

    def test_interlace_rejected(self):
        with pytest.raises(png.PngFormatError, match="interlace"):
            png.decode(build_png(2, 1, 0, bytes([0, 1, 2]), interlace=1))

    def test_size_mismatch(self):
        with pytest.raises(png.PngFormatError, match="IDAT size"):
            png.decode(build_png(3, 2, 0, bytes([0, 1, 2])))

    def test_missing_iend(self):
        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
        data = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        with pytest.raises(png.PngFormatError, match="IEND"):
            png.decode(data)


class TestRoundtrip:
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_encode_decode_identity(self, ch):
        rng = np.random.default_rng(ch)
        img = rng.integers(0, 256, (11, 13, ch), dtype=np.uint8)
        assert np.array_equal(png.decode(png.encode(img)), img)

    def test_gray_2d_input(self):
        img = np.arange(12, dtype=np.uint8).reshape(3, 4)
        out = png.decode(png.encode(img))
        assert np.array_equal(out.reshape(3, 4), img)


def test_wavefront_unfilter_equals_rowwise_oracle():
    """The skewed-wavefront unfilter (vectorized Average/Paeth path)
    must be cell-identical to the scalar row-at-a-time reference across
    mixed filters, color types, and degenerate shapes."""
    import numpy as np

    from sophox_spark.functions.png import (
        _unfilter_rowwise,
        _unfilter_wavefront,
    )

    rng = np.random.default_rng(11)
    for h, w, c in ((16, 16, 3), (1, 9, 1), (9, 1, 4), (5, 37, 2), (64, 8, 3)):
        stride = w * c
        raw = rng.integers(0, 256, (h, stride + 1), dtype=np.uint8)
        raw[:, 0] = rng.integers(0, 5, h)  # mixed filters incl. 3/4
        a = _unfilter_rowwise(raw, h, w, c)
        b = _unfilter_wavefront(raw, h, w, c)
        assert np.array_equal(a, b), (h, w, c, raw[:, 0])
