"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched UDFs over ``mapInPandas``. The actual codec libraries
(PIL/ffmpeg/librosa) are NOT in this container, so the codec call is
STUBBED: payloads use a deterministic synthetic container format that
the fake decoder parses, and ``real_decode_image`` raises
NotImplementedError behind an import-try. Everything Spark-side —
schema, batch shape, partition behavior, UDF signatures — is real and
tested.

Synthetic container format (fixture-generation contract):
    b"IMG1" + width:uint32le + height:uint32le + channels:uint8 + pixels
    b"AUD1" + sample_rate:uint32le + n_samples:uint32le + pcm16 bytes
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def make_image_payload(width: int, height: int, channels: int = 3, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    pixels = rng.integers(0, 256, width * height * channels, dtype=np.uint8)
    return b"IMG1" + struct.pack("<IIB", width, height, channels) + pixels.tobytes()


def make_audio_payload(rate: int, n_samples: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    pcm = rng.integers(-32768, 32767, n_samples, dtype=np.int16)
    return b"AUD1" + struct.pack("<II", rate, n_samples) + pcm.tobytes()


def real_decode_image(payload: bytes):  # pragma: no cover - stub
    """Real codec path — requires PIL, not present in this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codec libraries not available in this environment; "
            "the synthetic IMG1 container is decoded by decode_media_meta"
        ) from e
    raise NotImplementedError("wire PIL decode here when available")


MEDIA_META_SCHEMA = (
    "media_id long, kind string, byte_len long, width long, height long, "
    "channels long, sample_rate long, n_samples long, mean_value double"
)


def decode_media_meta(media_df: DataFrame, id_col="media_id", payload_col="payload") -> DataFrame:
    """binary payloads → typed metadata + a cheap content feature
    (mean pixel / mean |sample|), one Arrow batch at a time."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(blob)
                if b[:4] == b"IMG1":
                    w, h, c = struct.unpack_from("<IIB", b, 4)
                    px = np.frombuffer(b, dtype=np.uint8, offset=13)
                    rows.append((mid, "image", len(b), w, h, c, None, None, float(px.mean())))
                elif b[:4] == b"AUD1":
                    rate, n = struct.unpack_from("<II", b, 4)
                    pcm = np.frombuffer(b, dtype=np.int16, offset=12)
                    rows.append((mid, "audio", len(b), None, None, None, rate, n, float(np.abs(pcm).mean())))
                else:
                    rows.append((mid, "unknown", len(b), None, None, None, None, None, None))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "kind", "byte_len", "width", "height",
                    "channels", "sample_rate", "n_samples", "mean_value",
                ],
            )

    return media_df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col)
    ).mapInPandas(gen, MEDIA_META_SCHEMA)


def resize_images(media_df: DataFrame, out_w: int, out_h: int,
                  id_col="media_id", payload_col="payload") -> DataFrame:
    """Nearest-neighbor resize of IMG1 payloads (numpy index math — a
    stand-in for the codec resize; the Spark plumbing is the point)."""

    def gen(batches):
        for pdf in batches:
            ids, blobs = [], []
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(blob)
                if b[:4] != b"IMG1":
                    continue
                w, h, c = struct.unpack_from("<IIB", b, 4)
                px = np.frombuffer(b, dtype=np.uint8, offset=13).reshape(h, w, c)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                out = px[yi][:, xi]
                ids.append(mid)
                blobs.append(
                    b"IMG1" + struct.pack("<IIB", out_w, out_h, c) + out.tobytes()
                )
            yield pd.DataFrame({"media_id": ids, "payload": blobs})

    return media_df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col)
    ).mapInPandas(gen, "media_id long, payload binary")


def synth_media_df(spark, n: int = 64) -> DataFrame:
    rng = np.random.default_rng(42)
    rows = []
    for i in range(n):
        if i % 3 == 2:
            rows.append((i, make_audio_payload(16000, int(rng.integers(100, 2000)), seed=i)))
        else:
            rows.append(
                (i, make_image_payload(int(rng.integers(8, 64)), int(rng.integers(8, 64)), 3, seed=i))
            )
    pdf = pd.DataFrame(rows, columns=["media_id", "payload"])
    return spark.createDataFrame(pdf, "media_id long, payload binary")
