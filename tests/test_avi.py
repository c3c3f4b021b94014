"""From-scratch AVI container codec (functions/avi.py) — decoder pinned
to chunk streams assembled directly from spec fields (never encode)."""

import struct

import numpy as np
import pytest

from sophox_spark.functions import avi


def chunk(cid, body):
    pad = b"\x00" if len(body) & 1 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def lst(fourcc, body):
    return chunk(b"LIST", fourcc + body)


def build_avi(w, h, frames_bgr_bottomup, rate=10, scale=1, comp=0, bits=24,
              handler=b"DIB "):
    avih = struct.pack("<IIIIIIIIII4I", 100000, 0, 0, 0, len(frames_bgr_bottomup),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    strh = b"vids" + handler + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, scale, rate, 0,
        len(frames_bgr_bottomup), 0, 0, 0, 0)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bits, comp, 0, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", f) for f in frames_bgr_bottomup))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


class TestDecodeHandAssembled:
    def test_single_frame_literal(self):
        # 2x2 frame, bottom-up BGR rows, stride 8 (2*3=6 padded to 8)
        # top-down RGB want: [[(1,2,3),(4,5,6)],[(7,8,9),(10,11,12)]]
        bottom_row = bytes([9, 8, 7, 12, 11, 10, 0, 0])   # BGR of row 1
        top_row = bytes([3, 2, 1, 6, 5, 4, 0, 0])         # BGR of row 0
        frame = bottom_row + top_row  # bottom-up: last row first
        fps, frames = avi.decode(build_avi(2, 2, [frame]))
        assert fps == 10.0 and len(frames) == 1
        assert frames[0].tolist() == [
            [[1, 2, 3], [4, 5, 6]], [[7, 8, 9], [10, 11, 12]]]

    def test_multi_frame_order(self):
        f = lambda v: bytes([v, v, v, 0, 0, 0, 0, 0])  # 1x1, stride 4? w=1 → stride 4
        frames = [bytes([v, v, v, 0]) for v in (10, 20, 30)]
        fps, got = avi.decode(build_avi(1, 1, frames))
        assert [g[0, 0, 0] for g in got] == [10, 20, 30]

    def test_unknown_compression_rejected(self):
        with pytest.raises(avi.AviFormatError, match="compression"):
            avi.decode(build_avi(1, 1, [bytes(4)],
                                 comp=0x44495658))  # 'XVID'

    def test_non_dib_handler_rejected(self):
        with pytest.raises(avi.AviFormatError, match="handler"):
            avi.decode(build_avi(1, 1, [bytes(4)], handler=b"xvid"))

    def test_not_avi(self):
        with pytest.raises(avi.AviFormatError, match="RIFF/AVI"):
            avi.decode(b"RIFF" + struct.pack("<I", 4) + b"WAVE")

    def test_truncated_frame(self):
        with pytest.raises(avi.AviFormatError, match="smaller than frame"):
            avi.decode(build_avi(2, 2, [bytes(4)]))

    def test_audio_stream_strf_not_validated_as_video(self):
        # an 'auds' strf is WAVEFORMATEX, whose offset-16 bytes are NOT
        # biCompression — a second audio strl must not be rejected
        frame = bytes([9, 8, 7, 0])  # 1x1 BGR + stride pad
        avih = struct.pack("<IIIIIIIIII4I", 100000, 0, 0, 0, 1,
                           0, 2, 0, 1, 1, 0, 0, 0, 0)
        strh_v = b"vids" + b"DIB " + struct.pack(
            "<IHHIIIIIIIII", 0, 0, 0, 0, 1, 10, 0, 1, 0, 0, 0, 0)
        strf_v = struct.pack("<IiiHHIIiiII",
                             40, 1, 1, 1, 24, 0, 0, 0, 0, 0, 0)
        # WAVEFORMATEX (PCM 16-bit stereo 44.1k) + cbSize + 2 extra
        # bytes so offset 16 holds nonzero garbage if misread as video
        strh_a = b"auds" + bytes(4) + struct.pack(
            "<IHHIIIIIIIII", 0, 0, 0, 0, 1, 44100, 0, 44100, 0, 0, 0, 0)
        strf_a = struct.pack("<HHIIHHH", 1, 2, 44100, 176400, 4, 16, 2) \
            + b"\xff\xee"
        hdrl = lst(b"hdrl", chunk(b"avih", avih)
                   + lst(b"strl", chunk(b"strh", strh_v)
                         + chunk(b"strf", strf_v))
                   + lst(b"strl", chunk(b"strh", strh_a)
                         + chunk(b"strf", strf_a)))
        movi = lst(b"movi", chunk(b"00db", frame))
        body = b"AVI " + hdrl + movi
        fps, frames = avi.decode(
            b"RIFF" + struct.pack("<I", len(body)) + body)
        assert len(frames) == 1
        assert frames[0].tolist() == [[[7, 8, 9]]]


class TestRoundtrip:
    def test_encode_decode_identity(self):
        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
                  for _ in range(4)]
        fps, got = avi.decode(avi.encode(frames, fps=25))
        assert fps == 25.0 and len(got) == 4
        for a, b in zip(got, frames):
            assert np.array_equal(a, b)


class TestMjpeg:
    """MJPEG-in-AVI: 00dc chunks are standalone JPEG streams decoded
    through functions/jpeg.py (the dominant compressed crawl codec)."""

    def test_mjpeg_roundtrip_matches_jpeg_codec(self):
        from sophox_spark.functions import jpeg

        rng = np.random.default_rng(7)
        frames = [rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
                  for _ in range(3)]
        enc = avi.encode(frames, fps=12, codec="MJPG")
        assert b"MJPG" in enc and b"00dc" in enc and b"00db" not in enc
        fps, got = avi.decode(enc)
        assert fps == 12.0 and len(got) == 3
        # container adds nothing: each frame must equal the plain
        # JPEG codec roundtrip of the same pixels
        for a, f in zip(got, frames):
            assert np.array_equal(a, jpeg.decode(jpeg.encode(f, "444")))

    def test_mjpeg_constant_frames_exact(self):
        frames = [np.full((9, 11, 3), v, np.uint8) for v in (8, 100, 200)]
        _fps, got = avi.decode(avi.encode(frames, fps=5, codec="MJPG"))
        for a, f in zip(got, frames):
            assert np.array_equal(a, f)

    def test_mjpeg_frame_without_dht_uses_annex_k_defaults(self):
        # strip every DHT segment from an encoded frame — the common
        # MJPEG convention — and splice it back into the container
        from sophox_spark.functions import jpeg

        img = np.full((8, 8, 3), 96, np.uint8)
        enc = avi.encode([img], fps=5, codec="MJPG")
        i = enc.find(b"\xff\xd8", 12)
        j = enc.find(b"\xff\xd9", i) + 2
        frame = bytearray(enc[i:j])
        while True:
            d = frame.find(b"\xff\xc4")
            if d < 0:
                break
            seglen = int.from_bytes(frame[d + 2 : d + 4], "big")
            del frame[d : d + 2 + seglen]
        assert b"\xff\xc4" not in bytes(frame)
        # bare JPEG without tables fails loud...
        with pytest.raises(jpeg.JpegFormatError, match="Huffman table"):
            jpeg.decode(bytes(frame))
        # ...but decodes with the Annex K defaults (what AVI decode uses)
        got = jpeg.decode(bytes(frame), default_huff=True)
        assert np.all(got == 96)
        # and through the container via the same convention
        stripped = build_mjpeg_avi(8, 8, [bytes(frame)])
        _fps, frames2 = avi.decode(stripped)
        assert np.all(frames2[0] == 96)

    def test_mjpeg_size_mismatch_fails_loud(self):
        from sophox_spark.functions import jpeg

        payload = jpeg.encode(np.zeros((8, 8, 3), np.uint8), "444")
        with pytest.raises(avi.AviFormatError, match="does not match"):
            avi.decode(build_mjpeg_avi(16, 16, [payload]))

    def test_mjpeg_garbage_frame_fails_loud(self):
        with pytest.raises(avi.AviFormatError, match="bad MJPEG frame"):
            avi.decode(build_mjpeg_avi(8, 8, [b"\xff\xd8garbage"]))


def build_mjpeg_avi(w, h, jpeg_payloads, rate=10, scale=1):
    avih = struct.pack("<IIIIIIIIII4I", 100000, 0, 0, 0, len(jpeg_payloads),
                       0, 1, 0, w, h, 0, 0, 0, 0)
    strh = b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, scale, rate, 0,
        len(jpeg_payloads), 0, 0, 0, 0)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0x47504A4D,
                       0, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_payloads))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_sample_video_frames_spark(spark):
    import pandas as pd

    from sophox_spark.operators import multimodal

    grad = np.zeros((4, 4, 3), dtype=np.uint8)
    grad[:, :, 0] = 100  # R
    grad[:, :, 1] = np.arange(4)[:, None] * 10
    frames = [grad, grad * 0 + 7, grad]
    rows = [(0, avi.encode(frames, fps=5)), (1, b"not an avi at all")]
    media = spark.createDataFrame(
        pd.DataFrame(rows, columns=["media_id", "payload"]),
        "media_id long, payload binary",
    )
    out = multimodal.sample_video_frames(media, every_n=2).toPandas()
    ok = out[out["media_id"] == 0].sort_values("frame_idx")
    assert ok["frame_idx"].tolist() == [0, 2]
    assert ok.iloc[0]["mean_r"] == pytest.approx(100.0)
    assert ok.iloc[0]["mean_g"] == pytest.approx(15.0)  # avg of 0,10,20,30
    assert ok.iloc[0]["fps"] == 5.0
    bad = out[out["media_id"] == 1]
    assert len(bad) == 1 and pd.isna(bad.iloc[0]["width"])
