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


def build_png_chunks(
    w, h, color_type, scanlines: bytes, depth=8, interlace=0, extra=()
) -> bytes:
    """Like build_png but with extra chunks (PLTE/tRNS) before IDAT."""
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color_type, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    for ctype, body in extra:
        out += chunk(ctype, body)
    return out + chunk(b"IDAT", zlib.compress(scanlines)) + chunk(b"IEND", b"")


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

    def test_illegal_depth_color_combo_rejected(self):
        # palette at depth 16 and RGB at depth 2 are spec-illegal
        with pytest.raises(png.PngFormatError, match="illegal bit depth"):
            png.decode(build_png(2, 1, 3, bytes([0, 0, 0, 0, 0]), depth=16))
        with pytest.raises(png.PngFormatError, match="illegal bit depth"):
            png.decode(build_png(2, 1, 2, bytes([0, 1, 2]), depth=2))

    def test_unknown_interlace_method_rejected(self):
        with pytest.raises(png.PngFormatError, match="interlace"):
            png.decode(build_png(2, 1, 0, bytes([0, 1, 2]), interlace=2))

    def test_palette_missing_plte_rejected(self):
        with pytest.raises(png.PngFormatError, match="PLTE"):
            png.decode(build_png(2, 1, 3, bytes([0, 0, 1])))

    def test_palette_index_out_of_range_rejected(self):
        plte = bytes([10, 20, 30, 40, 50, 60])  # 2 entries
        scan = bytes([0, 0, 5])  # index 5 > 1
        data = build_png_chunks(2, 1, 3, scan, extra=[(b"PLTE", plte)])
        with pytest.raises(png.PngFormatError, match="palette index"):
            png.decode(data)

    def test_trns_on_alpha_color_type_rejected(self):
        data = build_png_chunks(
            1, 1, 6, bytes([0, 1, 2, 3, 4]), extra=[(b"tRNS", b"\x00\x01")]
        )
        with pytest.raises(png.PngFormatError, match="tRNS"):
            png.decode(data)

    def test_size_mismatch(self):
        with pytest.raises(png.PngFormatError, match="IDAT size"):
            png.decode(build_png(3, 2, 0, bytes([0, 1, 2])))

    def test_missing_iend(self):
        ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
        data = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        with pytest.raises(png.PngFormatError, match="IEND"):
            png.decode(data)


class TestPalette:
    PLTE = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 8, 7])  # 4 entries

    def test_palette8_literal(self):
        scan = bytes([0, 0, 2, 1])
        data = build_png_chunks(3, 1, 3, scan, extra=[(b"PLTE", self.PLTE)])
        img = png.decode(data)
        assert img.tolist() == [[[255, 0, 0], [0, 0, 255], [0, 255, 0]]]

    def test_palette4_bit_unpack_literal(self):
        # 3 px @ 4 bits = 12 bits → 2 bytes/row: indices 1,2,3 → 0x12 0x30
        scan = bytes([0, 0x12, 0x30])
        data = build_png_chunks(
            3, 1, 3, scan, depth=4, extra=[(b"PLTE", self.PLTE)]
        )
        img = png.decode(data)
        assert img.tolist() == [[[0, 255, 0], [0, 0, 255], [9, 8, 7]]]

    def test_palette1_bit_unpack_literal(self):
        # 10 px @ 1 bit: 1,0,1,0,1,0,1,0,1,1 → 0xAA 0xC0
        scan = bytes([0, 0xAA, 0xC0])
        data = build_png_chunks(
            10, 1, 3, scan, depth=1, extra=[(b"PLTE", self.PLTE[:6])]
        )
        img = png.decode(data)
        want = [
            [0, 255, 0], [255, 0, 0], [0, 255, 0], [255, 0, 0],
            [0, 255, 0], [255, 0, 0], [0, 255, 0], [255, 0, 0],
            [0, 255, 0], [0, 255, 0],
        ]
        assert img.tolist() == [want]

    def test_palette2_bit_with_sub_filter(self):
        # 4 px @ 2 bits = 1 byte/row, bpp=1: row1 Sub adds prev byte
        # row0: indices 0,1,2,3 → 0b00011011 = 0x1B
        # row1: filter 1 raw 0x00 + left(none → 0)… single byte row:
        # Sub with no left neighbor = raw → same 0x1B via raw 0x1B
        scan = bytes([0, 0x1B, 1, 0x1B])
        data = build_png_chunks(
            4, 2, 3, scan, depth=2, extra=[(b"PLTE", self.PLTE)]
        )
        img = png.decode(data)
        row = [[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 8, 7]]
        assert img.tolist() == [row, row]

    def test_palette_trns_alpha(self):
        trns = bytes([255, 128])  # entries 0,1; 2,3 default opaque
        scan = bytes([0, 0, 1, 2, 3])
        data = build_png_chunks(
            4, 1, 3, scan, extra=[(b"PLTE", self.PLTE), (b"tRNS", trns)]
        )
        img = png.decode(data)
        assert img.shape == (1, 4, 4)
        assert img[0, :, 3].tolist() == [255, 128, 255, 255]
        assert img[0, 1, :3].tolist() == [0, 255, 0]


class TestLowDepthGray:
    def test_gray1_bit_replicated(self):
        # row0: 1,0 → 0x80; row1: 0,1 → 0x40 — scaled to 0/255
        scan = bytes([0, 0x80, 0, 0x40])
        img = png.decode(build_png(2, 2, 0, scan, depth=1))
        assert img.reshape(2, 2).tolist() == [[255, 0], [0, 255]]

    def test_gray2_bit_replicated(self):
        # 3,1,2,0 → 0b11011000 = 0xD8 → 255, 85, 170, 0
        scan = bytes([0, 0xD8])
        img = png.decode(build_png(4, 1, 0, scan, depth=2))
        assert img.reshape(4).tolist() == [255, 85, 170, 0]

    def test_gray4_bit_replicated(self):
        # 15, 3 → 0xF3 → 255, 51
        scan = bytes([0, 0xF3])
        img = png.decode(build_png(2, 1, 0, scan, depth=4))
        assert img.reshape(2).tolist() == [255, 51]


class TestSixteenBit:
    def test_gray16_literal_big_endian(self):
        scan = bytes([0, 0x12, 0x34, 0xFF, 0x00])
        img = png.decode(build_png(2, 1, 0, scan, depth=16))
        assert img.dtype == np.uint16
        assert img.reshape(2).tolist() == [0x1234, 0xFF00]

    def test_gray16_sub_filter_bpp2(self):
        # Sub at depth 16 offsets by bpp=2 BYTES: second pixel adds the
        # first per byte lane: (0x01+0x03, 0x02+0x04) → 0x0406
        scan = bytes([1, 0x01, 0x02, 0x03, 0x04])
        img = png.decode(build_png(2, 1, 0, scan, depth=16))
        assert img.reshape(2).tolist() == [0x0102, 0x0406]

    def test_rgb16_literal(self):
        scan = bytes([0, 0, 1, 0, 2, 255, 255])
        img = png.decode(build_png(1, 1, 2, scan, depth=16))
        assert img.tolist() == [[[1, 2, 65535]]]

    def test_rgba16_paeth_vs_spec_reference(self):
        rng = np.random.default_rng(16)
        w, h, ch = 5, 4, 4
        stride = w * ch * 2
        lines = bytearray()
        for y in range(h):
            lines.append(y % 5)
            lines += bytes(rng.integers(0, 256, stride, dtype=np.uint8))
        img = png.decode(build_png(w, h, 6, bytes(lines), depth=16))
        # byte-level spec oracle with bpp = ch*2 = 8 bytes/px, then
        # assemble big-endian uint16 samples
        want_b = spec_unfilter(bytes(lines), w, h, ch * 2).reshape(h, stride)
        want = (want_b[:, 0::2].astype(np.uint16) << 8) | want_b[:, 1::2]
        np.testing.assert_array_equal(img, want.reshape(h, w, ch))


class TestColorKeyTrns:
    def test_gray8_color_key(self):
        data = build_png_chunks(
            2, 1, 0, bytes([0, 5, 7]), extra=[(b"tRNS", bytes([0, 5]))]
        )
        img = png.decode(data)
        assert img.shape == (1, 2, 2)
        assert img[0].tolist() == [[5, 0], [7, 255]]

    def test_rgb8_color_key(self):
        trns = struct.pack(">3H", 1, 2, 3)
        data = build_png_chunks(
            2, 1, 2, bytes([0, 1, 2, 3, 9, 9, 9]), extra=[(b"tRNS", trns)]
        )
        img = png.decode(data)
        assert img[0, :, 3].tolist() == [0, 255]

    def test_gray16_color_key_keeps_uint16(self):
        trns = struct.pack(">H", 0x1234)
        data = build_png_chunks(
            2, 1, 0, bytes([0, 0x12, 0x34, 0, 1]), depth=16,
            extra=[(b"tRNS", trns)],
        )
        img = png.decode(data)
        assert img.dtype == np.uint16
        assert img[0].tolist() == [[0x1234, 0], [1, 65535]]

    def test_gray1_color_key_scales_with_samples(self):
        # key=1 must match the bit-replicated 255, not raw 1
        data = build_png_chunks(
            2, 1, 0, bytes([0, 0x80]), depth=1,
            extra=[(b"tRNS", struct.pack(">H", 1))],
        )
        img = png.decode(data)
        assert img[0].tolist() == [[255, 0], [0, 255]]


def adam7_passes(img):
    """Independent Adam7 splitter: slice the image per the spec's pass
    grid, emit filter-0 scanlines per pass (8- and 16-bit samples)."""
    h, w = img.shape[:2]
    ch = img.shape[2] if img.ndim == 3 else 1
    out = bytearray()
    for x0, y0, dx, dy in (
        (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
        (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
    ):
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        ph, pw = sub.shape[:2]
        for y in range(ph):
            out.append(0)
            row = sub[y].reshape(pw * ch)
            if img.dtype == np.uint16:
                out += row.astype(">u2").tobytes()
            else:
                out += row.astype(np.uint8).tobytes()
    return bytes(out)


class TestAdam7:
    def test_2x2_literal(self):
        # pass1 → (0,0); pass6 → (0,1); pass7 → row 1 — others empty
        scan = bytes([0, 11, 0, 22, 0, 33, 44])
        img = png.decode(build_png(2, 2, 0, scan, interlace=1))
        assert img.reshape(2, 2).tolist() == [[11, 22], [33, 44]]

    def test_per_pass_independent_filtering(self):
        # 9x1 gray; pass 6 (x=1,3,5,7) uses Sub INSIDE the pass: its
        # left neighbor is the previous pass-6 pixel, not the output
        # image's neighbor
        stream = (
            bytes([0, 50, 60])          # pass 1: x=0, x=8
            + bytes([0, 70])            # pass 2: x=4
            + bytes([0, 80, 90])        # pass 4: x=2, x=6
            + bytes([1, 10, 1, 1, 1])   # pass 6: Sub → 10,11,12,13
        )
        img = png.decode(build_png(9, 1, 0, stream, interlace=1))
        assert img.reshape(9).tolist() == [50, 10, 80, 11, 70, 12, 90, 13, 60]

    def test_rgb8_random_roundtrip_via_independent_splitter(self):
        rng = np.random.default_rng(7)
        img = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
        data = build_png(13, 11, 2, adam7_passes(img), interlace=1)
        np.testing.assert_array_equal(png.decode(data), img)

    def test_gray16_random_roundtrip(self):
        rng = np.random.default_rng(8)
        img = rng.integers(0, 65536, (10, 9, 1), dtype=np.uint16)
        data = build_png(9, 10, 0, adam7_passes(img), depth=16, interlace=1)
        np.testing.assert_array_equal(png.decode(data), img)

    def test_size_mismatch_across_passes(self):
        # truncated mid-pass → the pass's own size check fires
        with pytest.raises(png.PngFormatError, match="IDAT size"):
            png.decode(build_png(2, 2, 0, bytes([0, 11, 0, 22]), interlace=1))
        # trailing bytes after the last pass → the cross-pass check fires
        good = bytes([0, 11, 0, 22, 0, 33, 44])
        with pytest.raises(png.PngFormatError, match="Adam7"):
            png.decode(build_png(2, 2, 0, good + b"\x00", interlace=1))


class TestRoundtrip:
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_encode_decode_identity(self, ch):
        rng = np.random.default_rng(ch)
        img = rng.integers(0, 256, (11, 13, ch), dtype=np.uint8)
        assert np.array_equal(png.decode(png.encode(img)), img)

    def test_encode_decode_identity_uint16(self):
        rng = np.random.default_rng(99)
        img = rng.integers(0, 65536, (7, 5, 3), dtype=np.uint16)
        out = png.decode(png.encode(img))
        assert out.dtype == np.uint16
        assert np.array_equal(out, img)

    def test_palette_roundtrip(self):
        rng = np.random.default_rng(3)
        pal = rng.integers(0, 256, (11, 3), dtype=np.uint8)
        idx = rng.integers(0, 11, (9, 14), dtype=np.uint8)
        out = png.decode(png.encode(idx, palette=pal))
        np.testing.assert_array_equal(out, pal[idx])

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_palette_subbyte_roundtrip(self, depth):
        rng = np.random.default_rng(depth)
        n = 1 << depth
        pal = rng.integers(0, 256, (n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, (7, 13), dtype=np.uint8)
        out = png.decode(png.encode(idx, palette=pal, depth=depth))
        np.testing.assert_array_equal(out, pal[idx])

    def test_palette_trns_roundtrip(self):
        pal = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], dtype=np.uint8)
        idx = np.array([[0, 1, 2]], dtype=np.uint8)
        out = png.decode(png.encode(idx, palette=pal, trns=bytes([9, 200])))
        assert out[0, :, 3].tolist() == [9, 200, 255]

    @pytest.mark.parametrize("depth", [1, 2, 4])
    def test_gray_subbyte_roundtrip_replicated(self, depth):
        rng = np.random.default_rng(20 + depth)
        raw = rng.integers(0, 1 << depth, (6, 11), dtype=np.uint8)
        out = png.decode(png.encode(raw, depth=depth))
        np.testing.assert_array_equal(
            out.reshape(6, 11), raw * (255 // ((1 << depth) - 1))
        )

    def test_adam7_encode_roundtrip(self):
        rng = np.random.default_rng(4)
        img = rng.integers(0, 256, (12, 17, 4), dtype=np.uint8)
        np.testing.assert_array_equal(
            png.decode(png.encode(img, interlace=1)), img
        )

    def test_adam7_palette_subbyte_encode_roundtrip(self):
        # the gnarliest combination: interlaced 2-bit palette
        rng = np.random.default_rng(5)
        pal = rng.integers(0, 256, (4, 3), dtype=np.uint8)
        idx = rng.integers(0, 4, (10, 11), dtype=np.uint8)
        out = png.decode(png.encode(idx, palette=pal, depth=2, interlace=1))
        np.testing.assert_array_equal(out, pal[idx])

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
        a = _unfilter_rowwise(raw, h, stride, c)
        b = _unfilter_wavefront(raw, h, stride, c)
        assert np.array_equal(a, b), (h, w, c, raw[:, 0])
    # 16-bit byte strides (bpp = 2c) must agree too
    for h, w, c in ((8, 11, 3), (6, 5, 1)):
        stride = w * c * 2
        raw = rng.integers(0, 256, (h, stride + 1), dtype=np.uint8)
        raw[:, 0] = rng.integers(0, 5, h)
        a = _unfilter_rowwise(raw, h, stride, c * 2)
        b = _unfilter_wavefront(raw, h, stride, c * 2)
        assert np.array_equal(a, b), (h, w, c, raw[:, 0])
