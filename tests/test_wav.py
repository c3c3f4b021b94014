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

    def test_24bit_rejected(self):
        with pytest.raises(wav.WavFormatError, match="bit depth"):
            wav.decode(build_wav(8000, 1, b"\x00" * 6, bits=24))

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
