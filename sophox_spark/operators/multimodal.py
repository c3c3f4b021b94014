"""Multimodal (image/audio/video) column plumbing + real image decode.

Media payloads are opaque ``binary`` columns with typed metadata
structs; decode / feature-extract / resize / frame-sample run as
Arrow-batched UDFs over ``mapInPandas``. Image decode is REAL:
``real_decode_image`` parses PNG via the from-scratch zlib+numpy codec
in functions/png.py (no PIL needed), falling back to the synthetic
IMG1 container for fixtures. Audio/video codecs (ffmpeg/librosa) are
still absent from the container, so those payloads stay in the
deterministic synthetic container formats below.

Synthetic container format (fixture-generation contract):
    b"IMG1" + width:uint32le + height:uint32le + channels:uint8 + pixels
    b"AUD1" + sample_rate:uint32le + n_samples:uint32le + pcm16 bytes
"""

from __future__ import annotations

import struct
import zlib

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


def real_decode_image(payload: bytes) -> np.ndarray:
    """Real codec path: PNG via the from-scratch zlib+numpy decoder
    (functions/png.py) and baseline JPEG via the from-scratch
    marker/Huffman/IDCT decoder (functions/jpeg.py — the format real
    crawls actually carry), falling back to the synthetic IMG1
    container. PNG covers the full spec-legal surface: palette
    (PLTE/tRNS), every gray depth, 16-bit (returned as uint16), Adam7
    interlace, color-key transparency. Returns an (h, w, c) uint8 —
    or uint16 — array; raises loudly on malformed input or arithmetic
    JPEG — never a silent wrong image."""
    from ..functions import jpeg, png

    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        return png.decode(b)
    if b[:2] == b"\xff\xd8":
        img = jpeg.decode(b)
        return img if img.ndim == 3 else img[:, :, None]
    if b[:4] == b"IMG1":
        w, h, c = struct.unpack_from("<IIB", b, 4)
        return np.frombuffer(b, dtype=np.uint8, offset=13).reshape(h, w, c)
    raise png.PngFormatError(f"unknown image container {b[:4]!r}")


DECODE_SCHEMA = (
    "media_id long, width long, height long, channels long, "
    "mean_value double, hist16 array<long>"
)


def decode_images(media_df: DataFrame, id_col="media_id", payload_col="payload") -> DataFrame:
    """Decode image payloads (PNG or IMG1) into per-image pixel
    statistics: dimensions, exact mean pixel value, and a 16-bucket
    intensity histogram — one Arrow batch at a time, all decoding
    executor-side. Undecodable payloads yield a NULL-stats row (the
    garbage-member-in-a-crawl policy: skip, don't kill the task)."""
    from ..functions import png

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                try:
                    px = real_decode_image(blob)
                except (ValueError, zlib.error, struct.error):
                    # PngFormatError is a ValueError; zlib.error = bad
                    # IDAT; struct.error = truncated header
                    rows.append((mid, None, None, None, None, None))
                    continue
                h, w, c = px.shape
                flat = px.reshape(-1).astype(np.int64)
                # bucket width scales with sample depth: 16 buckets
                # across the full range for uint8 AND uint16 decodes
                shift = 12 if px.dtype == np.uint16 else 4
                hist = np.bincount(flat >> shift, minlength=16)[:16]
                # exact rational mean: integer sum / count (one division)
                mean = float(flat.sum()) / flat.size
                rows.append((mid, w, h, c, mean, hist.tolist()))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "channels",
                         "mean_value", "hist16"],
            )

    return media_df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col)
    ).mapInPandas(gen, DECODE_SCHEMA)


def real_decode_audio(payload: bytes):
    """Real audio codec path: WAV (RIFF PCM 8/16/24/32-bit or IEEE
    float 32/64, incl. WAVE_FORMAT_EXTENSIBLE) via the from-scratch
    parser in functions/wav.py, falling back to the synthetic AUD1
    container. Returns (sample_rate, channels, samples [n, ch]) in the
    stream's native dtype; raises WavFormatError loudly outside the
    subset."""
    from ..functions import wav

    b = bytes(payload)
    if b[:4] == b"RIFF":
        return wav.decode(b)
    if b[:4] == b"AUD1":
        rate, n = struct.unpack_from("<II", b, 4)
        pcm = np.frombuffer(b, dtype="<i2", offset=12)
        return rate, 1, pcm.reshape(-1, 1)
    raise wav.WavFormatError(f"unknown audio container {b[:4]!r}")


AUDIO_SCHEMA = (
    "media_id long, sample_rate long, channels long, n_frames long, "
    "mean_abs double, sum_sq long"
)


def decode_audio(media_df: DataFrame, id_col="media_id", payload_col="payload") -> DataFrame:
    """Decode audio payloads (WAV or AUD1) into exact per-clip sample
    statistics (mean |amplitude| as one exact int division; energy as
    the exact int64 sum of squares — no float accumulation, so a SQL
    oracle reproduces both bit-for-bit). Undecodable payloads yield a
    NULL-stats row, never a task kill."""

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                try:
                    rate, ch, samples = real_decode_audio(blob)
                except (ValueError, struct.error):
                    rows.append((mid, None, None, None, None, None))
                    continue
                if np.issubdtype(samples.dtype, np.floating):
                    # deterministic float→PCM16 mapping (x*32768,
                    # round-half-even, clip) so the stats stay exact
                    # integers a SQL oracle can restate
                    samples = np.clip(
                        np.rint(samples.astype(np.float64) * 32768.0),
                        -32768, 32767,
                    ).astype(np.int64)
                flat = samples.reshape(-1).astype(np.int64)
                mean_abs = (
                    float(np.abs(flat).sum()) / flat.size if flat.size else None
                )
                rows.append(
                    (mid, rate, ch, samples.shape[0], mean_abs,
                     int((flat * flat).sum()))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "channels", "n_frames",
                         "mean_abs", "sum_sq"],
            )

    return media_df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col)
    ).mapInPandas(gen, AUDIO_SCHEMA)


VIDEO_SCHEMA = (
    "media_id long, frame_idx long, width long, height long, fps double, "
    "mean_r double, mean_g double, mean_b double"
)


def sample_video_frames(
    media_df: DataFrame, every_n: int = 1,
    id_col="media_id", payload_col="payload",
) -> DataFrame:
    """Frame-sample AVI payloads (real RIFF container parse,
    functions/avi.py): keep every ``every_n``-th frame and reduce it to
    exact per-channel means (int sum / count — one division each).
    Undecodable payloads yield one NULL-stats row; all decoding
    executor-side in Arrow batches."""
    from ..functions import avi

    def gen(batches):
        for pdf in batches:
            rows = []
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                try:
                    fps, frames = avi.decode(bytes(blob))
                except (ValueError, struct.error):
                    rows.append((mid, None, None, None, None, None, None, None))
                    continue
                for idx in range(0, len(frames), every_n):
                    f = frames[idx].astype(np.int64)
                    npx = f.shape[0] * f.shape[1]
                    rows.append(
                        (mid, idx, f.shape[1], f.shape[0], fps,
                         float(f[:, :, 0].sum()) / npx,
                         float(f[:, :, 1].sum()) / npx,
                         float(f[:, :, 2].sum()) / npx)
                    )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "width", "height", "fps",
                         "mean_r", "mean_g", "mean_b"],
            )

    return media_df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col)
    ).mapInPandas(gen, VIDEO_SCHEMA)


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


def resize_nearest(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Floor-index nearest-neighbor resize: out[y, x] = in[y*h//out_h,
    x*w//out_w] — exact integer index math, replayable in SQL."""
    h, w = px.shape[:2]
    yi = np.arange(out_h) * h // out_h
    xi = np.arange(out_w) * w // out_w
    return px[yi][:, xi]


def resize_images(media_df: DataFrame, out_w: int, out_h: int,
                  id_col="media_id", payload_col="payload") -> DataFrame:
    """Nearest-neighbor resize over ANY decodable image payload (PNG /
    baseline JPEG / IMG1 via ``real_decode_image``), re-emitted as the
    IMG1 raw container (downstream training pipelines want raw pixels,
    not a re-encode). Undecodable payloads drop, like decode_images'
    skip policy."""

    def gen(batches):
        for pdf in batches:
            ids, blobs = [], []
            for mid, blob in zip(pdf[id_col], pdf[payload_col]):
                try:
                    px = real_decode_image(blob)
                except (ValueError, zlib.error, struct.error):
                    continue
                out = resize_nearest(px, out_w, out_h)
                c = out.shape[2]
                ids.append(mid)
                blobs.append(
                    b"IMG1" + struct.pack("<IIB", out_w, out_h, c) + out.tobytes()
                )
            yield pd.DataFrame({"media_id": ids, "payload": blobs})

    return media_df.select(
        F.col(id_col).alias("media_id"), F.col(payload_col)
    ).mapInPandas(gen, "media_id long, payload binary")


def make_image_payload_det(width: int, height: int, channels: int = 3,
                           salt: int = 0) -> bytes:
    """Deterministic IMG1 payload: pixel[j] = (j*31 + salt) % 256 —
    closed-form content an SQL oracle can replay (gcd(31,256)=1 walks
    every level)."""
    n = width * height * channels
    px = ((np.arange(n, dtype=np.int64) * 31 + salt) % 256).astype(np.uint8)
    return b"IMG1" + struct.pack("<IIB", width, height, channels) + px.tobytes()


def make_audio_payload_det(rate: int, n_samples: int, salt: int = 0) -> bytes:
    """Deterministic AUD1 payload: pcm[j] = (j*97 + salt) % 65535 -
    32767, spanning [-32767, 32767] — INT16_MIN is deliberately
    excluded so |pcm| stays exact in int16 (np.abs(-32768) overflows)."""
    pcm = (
        (np.arange(n_samples, dtype=np.int64) * 97 + salt) % 65535 - 32767
    ).astype(np.int16)
    return b"AUD1" + struct.pack("<II", rate, n_samples) + pcm.tobytes()


def synth_media_det_df(spark, n: int = 64) -> DataFrame:
    """Deterministic media table (binary column + arithmetic content):
    every byte is a closed-form function of (media_id, offset), so the
    decoded metadata — including the mean-pixel / mean-|sample| content
    features — has an exact SQL restatement."""
    rows = []
    for i in range(n):
        if i % 3 == 2:
            rows.append((i, make_audio_payload_det(16000, 100 + (i * 53) % 1900, salt=i)))
        else:
            rows.append((i, make_image_payload_det(8 + i % 56, 8 + (i * 7) % 56, 3, salt=i)))
    pdf = pd.DataFrame(rows, columns=["media_id", "payload"])
    return spark.createDataFrame(pdf, "media_id long, payload binary")


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
