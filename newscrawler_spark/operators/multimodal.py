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


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode media headers → typed metadata rows (Arrow-batched).

    ``fake=False`` raises NotImplementedError inside the UDF on first
    batch — the real kernels are not shippable in this container.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not fake:
                raise NotImplementedError(
                    "real media decoding requires PIL/av/soundfile — "
                    "not available in this environment; pass fake=True "
                    "for the deterministic stub kernel"
                )
            rows = [
                (mid, kind, *_fake_decode(kind, bytes(blob)))
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
