"""From-scratch WAV codec (functions/wav.py) — decoder pinned to byte
layouts assembled directly from RIFF spec fields, never via encode."""

import struct

import numpy as np
import pytest

from sophox_spark.functions import wav


def build_wav(rate, channels, pcm_bytes, audio_fmt=1, bits=16, extra_chunk=None):
    fmt = struct.pack("<HHIIHH", audio_fmt, channels, rate,
                      rate * channels * (bits // 8), channels * (bits // 8), bits)
    chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk:
        chunks += extra_chunk
    chunks += b"data" + struct.pack("<I", len(pcm_bytes)) + pcm_bytes
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


class TestDecodeHandAssembled:
    def test_mono_literal(self):
        pcm = struct.pack("<4h", 100, -200, 32767, -32768)
        rate, ch, s = wav.decode(build_wav(8000, 1, pcm))
        assert (rate, ch) == (8000, 1)
        assert s.reshape(-1).tolist() == [100, -200, 32767, -32768]

    def test_stereo_interleave(self):
        pcm = struct.pack("<6h", 1, 2, 3, 4, 5, 6)  # L R L R L R
        rate, ch, s = wav.decode(build_wav(44100, 2, pcm))
        assert ch == 2 and s.shape == (3, 2)
        assert s.tolist() == [[1, 2], [3, 4], [5, 6]]

    def test_unknown_chunks_skipped_word_aligned(self):
        # odd-sized LIST chunk before data: walker must pad to word
        extra = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
        pcm = struct.pack("<2h", 7, 8)
        rate, ch, s = wav.decode(build_wav(16000, 1, pcm, extra_chunk=extra))
        assert s.reshape(-1).tolist() == [7, 8]


class TestFailLoud:
    def test_not_riff(self):
        with pytest.raises(wav.WavFormatError, match="RIFF"):
            wav.decode(b"OggS" + b"\x00" * 40)

    def test_non_pcm_rejected(self):
        pcm = struct.pack("<2h", 1, 2)
        with pytest.raises(wav.WavFormatError, match="audio format"):
            wav.decode(build_wav(8000, 1, pcm, audio_fmt=7))  # µ-law

    def test_12bit_rejected(self):
        with pytest.raises(wav.WavFormatError, match="bit depth"):
            wav.decode(build_wav(8000, 1, b"\x00" * 6, bits=12))

    def test_float16_rejected(self):
        with pytest.raises(wav.WavFormatError, match="float bit depth"):
            wav.decode(build_wav(8000, 1, b"\x00" * 4, audio_fmt=3, bits=16))

    def test_extensible_unknown_subformat_rejected(self):
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
        fmt += struct.pack("<HHI", 22, 16, 4)
        fmt += struct.pack("<H", 7) + b"\x00" * 14  # µ-law GUID
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", 4) + b"\x00" * 4
        raw = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        with pytest.raises(wav.WavFormatError, match="audio format"):
            wav.decode(raw)

    def test_missing_data(self):
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
        raw = b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt)) + b"WAVE"
        raw += b"fmt " + struct.pack("<I", len(fmt)) + fmt
        with pytest.raises(wav.WavFormatError, match="data"):
            wav.decode(raw)

    def test_truncated_chunk(self):
        pcm = struct.pack("<2h", 1, 2)
        data = build_wav(8000, 1, pcm)[:-1]
        with pytest.raises(wav.WavFormatError, match="truncated"):
            wav.decode(data)


class TestExtendedFormatsHandAssembled:
    """8/24/32-bit PCM, IEEE float, WAVE_FORMAT_EXTENSIBLE — pinned to
    spec byte layouts, never via encode."""

    def test_8bit_unsigned_literal(self):
        pcm = bytes([0, 128, 255, 1])
        rate, ch, s = wav.decode(build_wav(8000, 1, pcm, bits=8))
        assert s.dtype == np.uint8
        assert s.reshape(-1).tolist() == [0, 128, 255, 1]

    def test_24bit_sign_extension_literal(self):
        # -1 = FF FF FF; 1 = 01 00 00; -8388608 = 00 00 80; 8388607 =
        # FF FF 7F (little-endian triplets)
        pcm = (b"\xff\xff\xff" + b"\x01\x00\x00"
               + b"\x00\x00\x80" + b"\xff\xff\x7f")
        rate, ch, s = wav.decode(build_wav(8000, 1, pcm, bits=24))
        assert s.dtype == np.int32
        assert s.reshape(-1).tolist() == [-1, 1, -8388608, 8388607]

    def test_32bit_int_literal(self):
        pcm = struct.pack("<3i", 2**31 - 1, -(2**31), 42)
        _, _, s = wav.decode(build_wav(8000, 1, pcm, bits=32))
        assert s.dtype == np.int32
        assert s.reshape(-1).tolist() == [2**31 - 1, -(2**31), 42]

    def test_float32_literal(self):
        pcm = struct.pack("<4f", 0.5, -1.0, 0.25, 1.0)
        rate, ch, s = wav.decode(build_wav(8000, 1, pcm, audio_fmt=3,
                                           bits=32))
        assert s.dtype == np.float32
        assert s.reshape(-1).tolist() == [0.5, -1.0, 0.25, 1.0]

    def test_float64_stereo_literal(self):
        pcm = struct.pack("<4d", 0.125, -0.125, 1.0, -1.0)
        _, ch, s = wav.decode(build_wav(8000, 2, pcm, audio_fmt=3, bits=64))
        assert ch == 2 and s.dtype == np.float64
        assert s.tolist() == [[0.125, -0.125], [1.0, -1.0]]

    def test_extensible_pcm24(self):
        # WAVE_FORMAT_EXTENSIBLE wrapping PCM: format code in the
        # leading 16 bits of the SubFormat GUID
        fmt = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 24000, 3, 24)
        fmt += struct.pack("<HHI", 22, 24, 4)
        fmt += struct.pack("<H", 1) + b"\x00" * 14
        pcm = b"\x02\x00\x00" + b"\xfe\xff\xff"  # 2, -2
        chunks = b"fmt " + struct.pack("<I", len(fmt)) + fmt
        chunks += b"data" + struct.pack("<I", len(pcm)) + pcm
        raw = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        _, _, s = wav.decode(raw)
        assert s.reshape(-1).tolist() == [2, -2]


class TestExtendedRoundtrip:
    def test_pcm_depths(self):
        rng = np.random.default_rng(2)
        for bits, lo, hi, dt in ((8, 0, 256, np.uint8),
                                 (24, -(2**23), 2**23, np.int32),
                                 (32, -(2**31), 2**31, np.int32)):
            s = rng.integers(lo, hi, (37, 2)).astype(dt)
            rate, ch, got = wav.decode(wav.encode(s, 8000, bits=bits))
            assert np.array_equal(got, s), bits

    def test_float_depths(self):
        rng = np.random.default_rng(3)
        s32 = rng.uniform(-1, 1, (23, 1)).astype(np.float32)
        _, _, got = wav.decode(wav.encode(s32, 8000, fmt="float"))
        assert got.dtype == np.float32 and np.array_equal(got, s32)
        s64 = rng.uniform(-1, 1, (23, 1))
        _, _, got = wav.decode(wav.encode(s64, 8000, bits=64, fmt="float"))
        assert got.dtype == np.float64 and np.array_equal(got, s64)


def test_decode_audio_float_stats_exact(spark):
    # float samples v/32768 (exact in float32) must produce the same
    # integer stats as int16 samples v
    import pandas as pd

    from sophox_spark.operators import multimodal

    v = np.array([100, -200, 300, -32768, 32767], dtype=np.int64)
    f32 = (v / 32768.0).astype(np.float32)
    media = spark.createDataFrame(
        pd.DataFrame(
            [(0, wav.encode(v.astype(np.int16), 8000)),
             (1, wav.encode(f32, 8000, fmt="float"))],
            columns=["media_id", "payload"],
        ),
        "media_id long, payload binary",
    )
    out = multimodal.decode_audio(media).toPandas().set_index("media_id")
    # 32767/32768*32768 rounds back to 32767; -32768 exact
    assert out.loc[1, "sum_sq"] == out.loc[0, "sum_sq"]
    assert out.loc[1, "mean_abs"] == out.loc[0, "mean_abs"]


class TestRoundtrip:
    @pytest.mark.parametrize("ch", [1, 2, 4])
    def test_encode_decode_identity(self, ch):
        rng = np.random.default_rng(ch)
        s = rng.integers(-32768, 32767, (101, ch), dtype=np.int16)
        rate, got_ch, got = wav.decode(wav.encode(s, 22050))
        assert (rate, got_ch) == (22050, ch)
        assert np.array_equal(got, s)

    def test_mono_1d_input(self):
        s = np.arange(-5, 5, dtype=np.int16)
        _, ch, got = wav.decode(wav.encode(s, 8000))
        assert ch == 1 and np.array_equal(got.reshape(-1), s)


def test_decode_audio_spark(spark):
    import pandas as pd

    from sophox_spark.operators import multimodal

    s = np.array([100, -200, 300], dtype=np.int16)
    rows = [
        (0, wav.encode(s, 8000)),
        (1, multimodal.make_audio_payload(16000, 50, seed=1)),
        (2, b"RIFFgarbage!"),
    ]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"]),
        "media_id long, payload binary",
    )
    out = multimodal.decode_audio(media).toPandas().set_index("media_id")
    assert out.loc[0, "sample_rate"] == 8000
    assert out.loc[0, "mean_abs"] == pytest.approx(200.0)
    assert out.loc[0, "sum_sq"] == 100**2 + 200**2 + 300**2
    assert out.loc[1, "n_frames"] == 50
    assert out.loc[2, ["sample_rate", "sum_sq"]].isna().all()
