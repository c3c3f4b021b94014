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

    def test_compressed_rejected(self):
        with pytest.raises(avi.AviFormatError, match="compression"):
            avi.decode(build_avi(1, 1, [bytes(4)], comp=0x47504A4D))  # MJPG

    def test_non_dib_handler_rejected(self):
        with pytest.raises(avi.AviFormatError, match="handler"):
            avi.decode(build_avi(1, 1, [bytes(4)], handler=b"xvid"))

    def test_not_avi(self):
        with pytest.raises(avi.AviFormatError, match="RIFF/AVI"):
            avi.decode(b"RIFF" + struct.pack("<I", 4) + b"WAVE")

    def test_truncated_frame(self):
        with pytest.raises(avi.AviFormatError, match="smaller than frame"):
            avi.decode(build_avi(2, 2, [bytes(4)]))


class TestRoundtrip:
    def test_encode_decode_identity(self):
        rng = np.random.default_rng(5)
        frames = [rng.integers(0, 256, (6, 5, 3), dtype=np.uint8)
                  for _ in range(4)]
        fps, got = avi.decode(avi.encode(frames, fps=25))
        assert fps == 25.0 and len(got) == 4
        for a, b in zip(got, frames):
            assert np.array_equal(a, b)


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
