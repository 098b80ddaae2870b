"""Multimodal column plumbing: opaque binary media + typed metadata.

Training-pipeline addition (driver brief). The *Spark-side* machinery is
real and tested — schema, partition-friendly layout, Arrow-batched UDF
signatures, deterministic batch shapes — while the codec kernels are
STUBBED (no image/audio libraries in this container): ``decode_media``
raises ``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder derives plausible metadata/features from the
bytes alone. Swapping in a real kernel (PIL/ffmpeg/torchaudio) changes
ONLY the marked inner functions; every DataFrame contract stays as-is.

Design for 100 TB: media bytes never leave the executor JVM except into
the Arrow batch that decodes them; batches are capped by rows (the
session caps Arrow batch bytes globally); features come back as compact
fixed-width arrays so downstream joins/ANN never touch the blobs again.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, bytes binary, source_url string, "
    "meta_format string, meta_bytes long"
)
DECODED_SCHEMA = (
    "media_id long, kind string, width int, height int, n_frames int, "
    "duration_s double, codec string"
)
FEATURES_SCHEMA = "media_id long, kind string, feature array<float>"

FEATURE_DIM = 32


def _fake_decode(kind: str, blob: bytes) -> tuple[int, int, int, float, str]:
    """STUB KERNEL — deterministic fake of a real decoder.

    Replace with PIL.Image.open / av / soundfile in production. Derives
    (width, height, n_frames, duration_s, codec) from a 60-bit value
    v = int(md5(hex(bytes))[:15], 16) — md5 over the lowercase hex string
    of the blob, NOT the raw bytes, so an ANSI-SQL oracle (DuckDB md5()
    is VARCHAR-only) can recompute v and every derived field exactly
    (driver query q40). All arithmetic below is nonneg-int mod/shift plus
    IEEE double division of the same ints — bit-identical cross-engine.
    """
    v = int(hashlib.md5(blob.hex().encode()).hexdigest()[:15], 16)
    if kind == "image":
        return (64 + v % 1920, 64 + (v >> 16) % 1080, 1, 0.0, "fake/png")
    if kind == "audio":
        return (0, 0, 0, 0.5 + (v % 600) / 10.0, "fake/wav")
    if kind == "video":
        frames = 25 + v % 1000
        return (320 + v % 1600, 240 + (v >> 8) % 840, frames, frames / 25.0, "fake/h264")
    raise ValueError(f"unknown media kind: {kind}")


def _fake_features(blob: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """STUB KERNEL — deterministic unit-norm pseudo-embedding from bytes."""
    seed = int(hashlib.md5(blob.hex().encode()).hexdigest()[:15], 16)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim).astype(np.float32)
    return v / np.linalg.norm(v)


def _real_decode(kind: str, blob: bytes) -> tuple:
    """REAL header kernel — pure-Python container parsing, no codec libs
    (functions/media_headers.py): PNG/GIF/JPEG/BMP dimensions, WAV
    duration from the RIFF data chunk, MP4 mvhd/tkhd/stts. Malformed
    blobs yield None fields, never an executor-killing raise. Pixel /
    sample decode (resize, model features) still needs PIL/ffmpeg and
    stays stubbed in :func:`extract_features`."""
    from newscrawler_spark.functions import media_headers as mh

    if kind == "image":
        w, h, codec = mh.parse_image(blob)
        return (w, h, 1 if w is not None else None, 0.0, codec)
    if kind == "audio":
        dur, _ch, _rate, codec = mh.parse_wav(blob)
        return (0, 0, 0, dur, codec)
    if kind == "video":
        w, h, n_frames, dur, codec = mh.parse_mp4(blob)
        return (w, h, n_frames, dur, codec)
    return (None, None, None, None, None)


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode media headers → typed metadata rows (Arrow-batched).

    ``fake=False`` (default) runs the REAL pure-Python header parsers;
    ``fake=True`` keeps the md5-arithmetic stub kernel whose outputs the
    q40 DuckDB oracle recomputes (the Arrow-plumbing contract check).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kernel = _fake_decode if fake else _real_decode
        for pdf in it:
            rows = [
                (mid, kind, *kernel(kind, bytes(blob)))
                for mid, kind, blob in zip(pdf["media_id"], pdf["kind"], pdf["bytes"])
            ]
            yield pd.DataFrame(
                rows,
                columns=["media_id", "kind", "width", "height", "n_frames",
                         "duration_s", "codec"],
            )

    return media.select("media_id", "kind", "bytes").mapInPandas(
        batches, schema=DECODED_SCHEMA
    )


def extract_features(media: DataFrame, fake: bool = False,
                     dim: int = FEATURE_DIM) -> DataFrame:
    """Media → fixed-width feature vectors (Arrow-batched; blobs pruned
    from every downstream stage)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real feature extraction requires a vision/audio model; "
                    "pass fake=True for the deterministic stub kernel"
                )
            feats = [
                _fake_features(bytes(b), dim).tolist() for b in pdf["bytes"]
            ]
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return media.select("media_id", "kind", "bytes").mapInPandas(
        batches, schema=FEATURES_SCHEMA
    )


def frame_sample_plan(decoded: DataFrame, every_n: int = 25) -> DataFrame:
    """Video frame-sampling plan: one row per sampled frame index —
    pure-native explode over a sequence (the decode of sampled frames
    would feed ``extract_features``)."""
    return (
        decoded.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )


def gen_real_media(spark, n: int = 60) -> DataFrame:
    """Deterministic REAL media files (valid PNG/GIF/BMP/JPEG/WAV/MP4
    built pure-Python in functions/media_headers.py) whose metadata
    follows closed-form rules in the media id — so the q46 oracle states
    the expected parse output from the same formulas WITHOUT sharing any
    parsing code with the engine:

    - i % 3 == 0 → image, format cycling [png, gif, bmp, jpeg] by i//3,
      width = 16 + i % 97, height = 16 + (i * 7) % 59
    - i % 3 == 1 → WAV, duration = (1 + i % 40) / 8  (exact: byte_rate
      16000 ⇒ n bytes divisible, even)
    - i % 3 == 2 → MP4, width = 160 + 16*(i % 20), height = 120 +
      8*(i % 30), n_frames = 25 + i % 200, fps 25
    """
    from newscrawler_spark.functions import media_headers as mh

    rows = []
    img_makers = [mh.make_png, mh.make_gif, mh.make_bmp, mh.make_jpeg_header]
    for i in range(n):
        m = i % 3
        if m == 0:
            w, h = 16 + i % 97, 16 + (i * 7) % 59
            blob = img_makers[(i // 3) % 4](w, h)
            kind = "image"
        elif m == 1:
            blob = mh.make_wav((1 + i % 40) / 8)
            kind = "audio"
        else:
            blob = mh.make_mp4(160 + 16 * (i % 20), 120 + 8 * (i % 30),
                               25 + i % 200)
            kind = "video"
        rows.append((i, kind, blob, f"http://m.example/{kind}/{i}",
                     kind + "/real", len(blob)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def gen_fake_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table for tests (seeded bytes).

    blob_i = unhex(repeat(md5('media|i'), 2 + i%5)) — constructible in
    DuckDB SQL too, so the q40 oracle regenerates the identical table
    with generate_series instead of reading a side file.
    """
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        blob = bytes.fromhex(hashlib.md5(f"media|{i}".encode()).hexdigest()) * (
            2 + i % 5
        )
        rows.append((i, kind, blob, f"http://m.example/{kind}/{i}", kind + "/fake",
                     len(blob)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
