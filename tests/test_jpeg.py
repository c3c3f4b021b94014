"""From-scratch baseline JPEG codec (functions/jpeg.py).

The decoder is pinned to HAND-ASSEMBLED spec byte streams (markers +
hand-derived Huffman bit strings) with analytically known pixel
output, plus an independent O(N^4) direct-sum IDCT oracle — a
symmetric encoder+decoder bug cannot cancel."""

import struct

import numpy as np
import pytest

from sophox_spark.functions import jpeg


def direct_idct(F):
    """T.81 A.3.3 direct-sum IDCT — independent of the codec's
    batched matrix formulation."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * F[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4.0
    return out


def _segment(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _minimal_gray_stream(entropy: bytes) -> bytes:
    """8x8 grayscale baseline stream: flat all-16 quant table, standard
    luma Huffman tables, caller-supplied entropy bytes."""
    out = bytearray(b"\xff\xd8")
    out += _segment(0xDB, bytes([0x00]) + bytes([16] * 64))
    out += _segment(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    bits, vals = jpeg.STD_DC_LUMA
    out += _segment(0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
    bits, vals = jpeg.STD_AC_LUMA
    out += _segment(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))
    out += _segment(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy + b"\xff\xd9"
    return bytes(out)


class TestPinnedStreams:
    def test_dc_only_block(self):
        # hand-derived bits with the standard DC luma table:
        # DC diff +32 -> category 6 (code 1110) + '100000'; EOB = 1010
        # bit string 1110 100000 1010 padded -> 0xE8 0x28
        img = jpeg.decode(_minimal_gray_stream(bytes([0xE8, 0x28])))
        # DC 32 x q 16 = 512 -> +512/8 = +64 on the level-shifted plane
        assert img.shape == (8, 8, 1)
        assert np.all(img == 192)

    def test_dc_plus_ac_block_vs_direct_idct(self):
        # DC +32 then AC at zigzag index 1 (=F[0,1]): run 0/size 4
        # (symbol 0x04 -> code 1011) + '1000' (value 8), EOB 1010:
        # 1110 100000 1011 1000 1010 -> 0xE8 0x2E 0x28
        img = jpeg.decode(_minimal_gray_stream(bytes([0xE8, 0x2E, 0x28])))
        F = np.zeros((8, 8))
        F[0, 0] = 32 * 16
        F[0, 1] = 8 * 16
        want = np.clip(np.round(direct_idct(F) + 128), 0, 255).astype(np.uint8)
        assert np.array_equal(img[:, :, 0], want)

    def test_negative_dc_ones_complement_code(self):
        # DC diff -32: category 6, magnitude code = -32 + 63 = 31
        # ('011111') -> bits 1110 011111 1010 pad -> 0xE7 0xE8
        img = jpeg.decode(_minimal_gray_stream(bytes([0xE7, 0xE8])))
        assert np.all(img == 128 - 64)


class TestIdctOracle:
    def test_batched_idct_matches_direct_sum(self):
        rng = np.random.default_rng(5)
        F = rng.integers(-200, 200, (4, 8, 8)).astype(np.float64)
        got = jpeg.idct_blocks(F)
        for i in range(4):
            assert np.allclose(got[i], direct_idct(F[i]), atol=1e-9)

    def test_fdct_idct_inverse(self):
        rng = np.random.default_rng(6)
        f = rng.uniform(-128, 127, (3, 8, 8))
        assert np.allclose(jpeg.idct_blocks(jpeg.fdct_blocks(f)), f, atol=1e-9)


class TestRoundtrip:
    def test_constant_even_gray_exact(self):
        for v in (0, 8, 56, 128, 200, 254):
            img = np.full((24, 40), v, np.uint8)
            dec = jpeg.decode(jpeg.encode(img))
            assert dec.shape == (24, 40, 1) and np.all(dec == v)

    def test_constant_grayvalued_rgb_exact(self):
        # r=g=b=v (even): Y=v, Cb=Cr=128 -> chroma DC 0 -> exact
        for sub in ("444", "420"):
            img = np.full((20, 28, 3), 88, np.uint8)
            dec = jpeg.decode(jpeg.encode(img, sub))
            assert dec.shape == (20, 28, 3) and np.all(dec == 88)

    def test_smooth_image_error_bound(self):
        xx, yy = np.meshgrid(np.arange(64), np.arange(48))
        rgb = np.stack(
            [((xx + yy) % 200 + 20), (xx % 180 + 30), (yy % 150 + 50)],
            axis=-1,
        ).astype(np.uint8)
        for sub in ("444", "420"):
            dec = jpeg.decode(jpeg.encode(rgb, sub))
            err = np.abs(dec.astype(int) - rgb.astype(int))
            assert err.max() <= 16 and err.mean() < 3.0

    def test_restart_intervals_roundtrip(self):
        rng = np.random.default_rng(9)
        img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        plain = jpeg.decode(jpeg.encode(img, "420"))
        with_rst = jpeg.encode(img, "420", restart_interval=2)
        assert b"\xff\xd0" in with_rst or b"\xff\xd1" in with_rst
        assert np.array_equal(jpeg.decode(with_rst), plain)

    def test_byte_stuffing_present_and_handled(self):
        # search a seed whose entropy stream contains a stuffed 0xFF00
        for seed in range(40):
            img = np.random.default_rng(seed).integers(
                0, 256, (24, 24), dtype=np.uint8
            )
            data = jpeg.encode(img)
            i = data.find(b"\xff\xda")
            seglen = int.from_bytes(data[i + 2 : i + 4], "big")
            if b"\xff\x00" in data[i + 2 + seglen : -2]:
                jpeg.decode(data)  # must not misparse
                return
        pytest.skip("no stuffed byte produced in 40 seeds")

    def test_odd_dimensions_and_single_channel_3d(self):
        img = np.full((13, 17, 1), 100, np.uint8)
        dec = jpeg.decode(jpeg.encode(img))
        assert dec.shape == (13, 17, 1) and np.all(dec == 100)


class TestFailLoud:
    def _stream(self):
        return bytearray(jpeg.encode(np.zeros((8, 8), np.uint8)))

    def test_progressive_marker_with_sequential_scan_refused(self):
        # SOF2 is SUPPORTED now, but a progressive frame whose scan
        # header carries sequential spectral params (Ss=0, Se=63) is
        # malformed and must fail loud, not decode as garbage
        s = self._stream()
        s[s.find(b"\xff\xc0") + 1] = 0xC2
        with pytest.raises(jpeg.JpegFormatError, match="Se=0"):
            jpeg.decode(bytes(s))

    def test_lossless_refused(self):
        s = self._stream()
        s[s.find(b"\xff\xc0") + 1] = 0xC3
        with pytest.raises(jpeg.JpegFormatError, match="SOF"):
            jpeg.decode(bytes(s))

    def test_arithmetic_refused(self):
        s = self._stream()
        s[s.find(b"\xff\xc4") + 1] = 0xCC
        with pytest.raises(jpeg.JpegFormatError, match="arithmetic"):
            jpeg.decode(bytes(s))

    def test_not_a_jpeg(self):
        with pytest.raises(jpeg.JpegFormatError, match="SOI"):
            jpeg.decode(b"\x89PNG1234")

    def test_truncated_entropy(self):
        s = bytes(self._stream())
        with pytest.raises(jpeg.JpegFormatError):
            jpeg.decode(s[: s.find(b"\xff\xda") + 8])

    def test_fill_bytes_before_marker(self):
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker.
        img = np.full((8, 8), 77, np.uint8)
        s = bytes(jpeg.encode(img))
        i = s.find(b"\xff\xdb")  # first DQT
        padded = s[:i] + b"\xff" * 5 + s[i:]
        assert np.array_equal(jpeg.decode(padded), jpeg.decode(s))

    def test_truncated_after_fill_bytes_fails_loud(self):
        s = bytes(self._stream())
        i = s.find(b"\xff\xdb")
        with pytest.raises(jpeg.JpegFormatError, match="truncated"):
            jpeg.decode(s[:i] + b"\xff")  # payload ends right after 0xFF

    def test_truncated_segment_length_fails_loud(self):
        s = bytes(self._stream())
        i = s.find(b"\xff\xdb")
        with pytest.raises(jpeg.JpegFormatError, match="truncated"):
            jpeg.decode(s[: i + 3])  # marker present, length cut short


def test_multimodal_dispatch_jpeg():
    from sophox_spark.operators.multimodal import real_decode_image

    img = np.full((16, 16, 3), 64, np.uint8)
    out = real_decode_image(jpeg.encode(img, "420"))
    assert out.shape == (16, 16, 3) and np.all(out == 64)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])


def test_422_subsampling_roundtrip():
    xx, yy = np.meshgrid(np.arange(60), np.arange(44))
    rgb = np.stack(
        [((xx + yy) % 200 + 20), (xx % 180 + 30), (yy % 150 + 50)],
        axis=-1,
    ).astype(np.uint8)
    dec = jpeg.decode(jpeg.encode(rgb, "422"))
    err = np.abs(dec.astype(int) - rgb.astype(int))
    assert dec.shape == rgb.shape and err.max() <= 16 and err.mean() < 3.0
    flat = np.full((20, 28, 3), 88, np.uint8)
    assert np.all(jpeg.decode(jpeg.encode(flat, "422")) == 88)


def _segment_list(parts):
    out = bytearray(b"\xff\xd8")
    for marker, body in parts:
        out += _segment(marker, body)
    return out


class TestProgressivePinnedStreams:
    """Hand-assembled SOF2 streams with hand-derived Huffman bits —
    pins the progressive scan semantics independently of the encoder
    (T.81 Annex G)."""

    def _stream(self, scans):
        out = bytearray(b"\xff\xd8")
        out += _segment(0xDB, bytes([0x00]) + bytes([16] * 64))
        out += _segment(
            0xC2, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        bits, vals = jpeg.STD_DC_LUMA
        out += _segment(0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
        bits, vals = jpeg.STD_AC_LUMA
        out += _segment(0xC4, bytes([0x10]) + bytes(bits) + bytes(vals))
        for hdr, entropy in scans:
            out += _segment(0xDA, hdr)
            out += entropy
        out += b"\xff\xd9"
        return bytes(out)

    def test_dc_ac_successive_approximation(self):
        # target coefficients: DC=42, AC(zigzag k=1)=6, flat q=16.
        # scan 1 DC first Al=1: diff 21 -> cat5 '110'+'10101' = 0xD5
        # scan 2 AC first band 1-63 Al=1: 6>>1=3 -> sym 0x02 '01' +
        #   mag '11', then EOB '1010' = 0x7A
        # scan 3 DC refine Al=0: bit 42&1=0 -> 0x00
        # scan 4 AC refine Al=0: no new coeffs -> EOB0 '1010' + one
        #   correction bit (6>>0)&1=0 for the history coeff = 0xA0
        img = jpeg.decode(self._stream([
            (bytes([1, 1, 0x00, 0, 0, 0x01]), bytes([0xD5])),
            (bytes([1, 1, 0x00, 1, 63, 0x01]), bytes([0x7A])),
            (bytes([1, 1, 0x00, 0, 0, 0x10]), bytes([0x00])),
            (bytes([1, 1, 0x00, 1, 63, 0x10]), bytes([0xA0])),
        ]))
        F = np.zeros((8, 8))
        F[0, 0] = 42 * 16
        F[0, 1] = 6 * 16
        ref = np.clip(np.round(direct_idct(F) + 128), 0, 255)
        assert np.array_equal(img[:, :, 0] if img.ndim == 3 else img,
                              ref.astype(np.uint8))

    def test_eobn_run_skips_blocks(self):
        # 8x16 gray, 2 blocks. DC scan Al=0: block1 diff +16 (cat5
        # '110'+'10000'), block2 DC 0 -> diff -16 (cat5 '110' +
        # ones-complement '01111') -> 1101 0000 1100 1111 = 0xD0 0xCF.
        # AC scan: custom 1-symbol DHT {0x10:'0'}; EOB2 = sym 0x10 +
        # 1 ext bit 0 -> '00' -> 0x00: both blocks empty.
        out = bytearray(b"\xff\xd8")
        out += _segment(0xDB, bytes([0x00]) + bytes([16] * 64))
        out += _segment(
            0xC2, struct.pack(">BHHB", 8, 8, 16, 1) + bytes([1, 0x11, 0]))
        bits, vals = jpeg.STD_DC_LUMA
        out += _segment(0xC4, bytes([0x00]) + bytes(bits) + bytes(vals))
        eob_bits = [1] + [0] * 15
        out += _segment(0xC4, bytes([0x10]) + bytes(eob_bits) + bytes([0x10]))
        out += _segment(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        out += bytes([0xD0, 0xCF])
        out += _segment(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
        out += bytes([0x00])
        out += b"\xff\xd9"
        img = jpeg.decode(bytes(out))
        assert img.shape[:2] == (8, 16)
        # block 1: DC 16*16/8 = 32 above mid -> 128+32; block 2: DC 0
        assert np.all(img[:, :8] == 160)
        assert np.all(img[:, 8:] == 128)


class TestProgressiveRoundtrip:
    """decode(encode(progressive)) must be BIT-IDENTICAL to
    decode(encode(baseline)): the scan script reorders the same
    quantized coefficients, so any deviation is a codec bug."""

    def test_identical_to_baseline_all_subsamplings(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
        for sub in ("444", "422", "420"):
            base = jpeg.decode(jpeg.encode(img, sub))
            prog = jpeg.decode(jpeg.encode(img, sub, progressive=True))
            assert np.array_equal(base, prog), sub

    def test_identical_gray_odd_dims(self):
        rng = np.random.default_rng(5)
        for h, w in ((33, 41), (8, 8), (17, 9)):
            g = rng.integers(0, 256, (h, w), dtype=np.uint8)
            assert np.array_equal(
                jpeg.decode(jpeg.encode(g)),
                jpeg.decode(jpeg.encode(g, progressive=True))), (h, w)

    def test_identical_constant_and_smooth(self):
        # constant -> maximal EOBn runs; smooth -> long zero runs with
        # sparse newly-significant refinement coefficients
        img = np.full((128, 144, 3), 77, np.uint8)
        assert np.array_equal(
            jpeg.decode(jpeg.encode(img, "420")),
            jpeg.decode(jpeg.encode(img, "420", progressive=True)))
        x = np.linspace(0, 4, 160)
        sm = np.clip(
            np.add.outer(x * 30, x * 20)[..., None] + np.array([0, 40, 80]),
            0, 255).astype(np.uint8)
        for sub in ("444", "420"):
            assert np.array_equal(
                jpeg.decode(jpeg.encode(sm, sub)),
                jpeg.decode(jpeg.encode(sm, sub, progressive=True))), sub

    def test_progressive_is_sof2_on_the_wire(self):
        enc = jpeg.encode(np.zeros((8, 8), np.uint8), progressive=True)
        assert b"\xff\xc2" in enc and b"\xff\xc0" not in enc
        # multiple scans present
        assert enc.count(b"\xff\xda") >= 4

    def test_restart_plus_progressive_refused(self):
        with pytest.raises(jpeg.JpegFormatError, match="restart"):
            jpeg.encode(np.zeros((8, 8), np.uint8), restart_interval=2,
                        progressive=True)


def test_single_scan_sampling_factors_nonninterleaved():
    # ADVICE round-4: a single-component scan is NON-interleaved per
    # T.81 — sampling factors do not impose MCU layout. A grayscale
    # frame declaring 2x2 factors must decode identically to the same
    # entropy data with 1x1 factors (previously garbled).
    entropy = bytes([0xE8, 0x28])  # DC +32, EOB
    plain = jpeg.decode(_minimal_gray_stream(entropy))
    s = bytearray(_minimal_gray_stream(entropy))
    sof_at = bytes(s).find(b"\xff\xc0")
    assert s[sof_at + 11] == 0x11
    s[sof_at + 11] = 0x22  # h=v=2
    img = jpeg.decode(bytes(s))
    assert np.array_equal(img, plain)
