"""Partitioned Bloom URL-seen set (SURVEY.md §3 J / B3 scale path).

Why not the built-ins: ``df.stat.bloomFilter`` materializes the filter on
the driver (dead at 10^10 keys); Catalyst's runtime bloom join helps the
frontier×pages join but is not a persistent membership structure. So:

- the seen set is sharded by ``bucket = pmod(url_hash, n_buckets)``;
- each shard is a numpy bitset built in ``applyInPandas`` (grouped-map —
  one task per bucket, executor-side, never on the driver) and stored as
  ONE binary row → the shard table is small (10 bits/key ⇒ 10^10 keys ≈
  12.5 GB across all buckets; each bucket row ≈ size/n_buckets, streamed
  through a cogrouped probe, never collected);
- probe = ``cogroup(links, shards).applyInPandas`` per bucket: k probes
  per key into the packed bitset (vectorized numpy, no per-row Python);
- **no false negatives** by construction; false positives are removed by
  the exact anti-join, which now only sees the (tiny) "maybe" subset.

Double hashing: idx_i = (h1 + i*h2) mod m with h1 = url_hash, h2 derived
by a 64-bit mix — standard Kirsch-Mitzenmacher composition.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newscrawler_spark.config import CrawlConfig
from newscrawler_spark.operators.frontier import dedup_against_seen

SHARD_SCHEMA = "bucket int, bits binary, m long, k int, n_keys long"

_MIX = 0xFF51AFD7ED558CCD  # murmur3 fmix64 multiplier (public constant)


def _h2(h1: np.ndarray) -> np.ndarray:
    x = h1.astype(np.uint64)
    x ^= x >> np.uint64(33)
    x *= np.uint64(_MIX)
    x ^= x >> np.uint64(33)
    return x | np.uint64(1)  # odd → full-period stepping


def _positions(hashes: np.ndarray, m: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing — pure numpy."""
    h1 = hashes.astype(np.uint64)
    h2 = _h2(h1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(m)).astype(np.int64)


def _n_hashes(bits_per_key: int) -> int:
    return max(1, int(round(bits_per_key * math.log(2))))


def build_bloom_shards(seen: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Build one Bloom bitset row per ``pmod(url_hash, seen_buckets)``."""
    bpk = cfg.bloom_bits_per_key
    k = _n_hashes(bpk)

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        hashes = pdf["url_hash"].to_numpy(dtype=np.int64)
        n = len(hashes)
        m = max(64, int(n * bpk))
        bits = np.zeros(m, dtype=bool)
        bits[_positions(hashes, m, k).ravel()] = True
        packed = np.packbits(bits).tobytes()
        return pd.DataFrame(
            [(int(pdf["bucket"].iloc[0]), packed, m, k, n)],
            columns=["bucket", "bits", "m", "k", "n_keys"],
        )

    return (
        seen.select("url_hash")
        .withColumn("bucket", _bucket_expr(cfg))
        .groupBy("bucket")
        .applyInPandas(build, schema=SHARD_SCHEMA)
    )


def _bucket_expr(cfg: CrawlConfig):
    """Shard key. MUST be the same data type on both cogroup sides:
    Spark hashes Int(5) and Long(5) to different partitions, so a silent
    long-vs-int mismatch breaks cogroup co-partitioning (groups meet an
    absent shard and every probe returns 'fresh'). Cast pinned to int."""
    return F.pmod("url_hash", F.lit(cfg.seen_buckets)).cast("int")


def bloom_split(links: DataFrame, shards: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """Tag each link row ``maybe_seen`` by probing its bucket's shard.

    Cogrouped per bucket so only matching (links, shard) partitions meet;
    buckets with no shard (empty seen set) are definitely-new.
    """
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in links.schema.fields
    ) + ", maybe_seen boolean"
    cols = links.columns

    def probe(lks: pd.DataFrame, shd: pd.DataFrame) -> pd.DataFrame:
        if lks.empty:
            return pd.DataFrame(columns=[*cols, "maybe_seen"])
        out = lks[cols].reset_index(drop=True)
        if shd.empty:
            out["maybe_seen"] = False
            return out
        bits = np.unpackbits(
            np.frombuffer(shd["bits"].iloc[0], dtype=np.uint8)
        ).astype(bool)
        m = int(shd["m"].iloc[0])
        k = int(shd["k"].iloc[0])
        pos = _positions(out["url_hash"].to_numpy(dtype=np.int64), m, k)
        out["maybe_seen"] = bits[:m][pos].all(axis=1)
        return out

    lb = links.withColumn("bucket", _bucket_expr(cfg))
    return (
        lb.groupBy("bucket")
        .cogroup(shards.groupBy("bucket"))
        .applyInPandas(probe, schema=out_schema)
    )


def bloom_dedup(links: DataFrame, seen: DataFrame, cfg: CrawlConfig) -> DataFrame:
    """B3 at scale — Bloom prefilter, exact confirm; ≡ plain anti-join.

    Builds shards from the full seen set — the one-shot / stateless form.
    The crawl loop instead persists shards in each round commit and folds
    deltas (:func:`update_bloom_shards`), probing with
    :func:`bloom_dedup_with_shards` so per-round Bloom work is O(|delta|),
    not O(|seen|).
    """
    shards = build_bloom_shards(seen, cfg)
    return bloom_dedup_with_shards(links, seen, shards, cfg)


def bloom_dedup_with_shards(
    links: DataFrame, seen: DataFrame, shards: DataFrame, cfg: CrawlConfig
) -> DataFrame:
    """Probe pre-built (persisted) shards, exact-confirm the maybes.

    ``shards`` must cover exactly the keys of ``seen`` (no false
    negatives required of the filter itself): definitely-new rows skip
    the exact join; "maybe" rows are confirmed by the exact anti-join, so
    stale-saturated shards only cost FPs, never correctness.
    tests/test_seen_bloom.py asserts result == dedup_against_seen(...).
    """
    tagged = bloom_split(links, shards, cfg)
    fresh = tagged.where(~F.col("maybe_seen")).drop("maybe_seen")
    maybe = tagged.where(F.col("maybe_seen")).drop("maybe_seen")
    return fresh.unionByName(dedup_against_seen(maybe, seen))


def shards_saturated(stats: list[dict], bits_per_key: int) -> bool:
    """Standard doubling rule over per-bucket (m, n_keys) stats: a shard
    whose folded key count exceeds twice its sizing target has FP rate
    well past design (still correct — exact confirm — just slower), so
    the caller schedules a full rebuild."""
    return any(s["n_keys"] * bits_per_key > 2 * s["m"] for s in stats)


def update_bloom_shards(
    old_shards: DataFrame, delta: DataFrame, cfg: CrawlConfig
) -> DataFrame:
    """Fold a new url_hash delta into existing shards — the 10^10-scale
    maintenance path: per round this touches O(|delta|) keys and OR-writes
    the affected buckets, instead of rebuilding from the full seen set
    (O(|seen|) reads per round ⇒ quadratic over a crawl's lifetime).

    Bucket bitset sizes are frozen at first build; ``n_keys`` tracks
    saturation so callers can schedule a full rebuild (standard doubling
    rule: rebuild when n_keys * bits_per_key > 2m — the engine stays
    correct regardless, because Bloom positives are exact-confirmed).
    """
    bpk = cfg.bloom_bits_per_key
    k_default = _n_hashes(bpk)

    def merge(old: pd.DataFrame, new: pd.DataFrame) -> pd.DataFrame:
        if new.empty:
            return old[["bucket", "bits", "m", "k", "n_keys"]]
        hashes = new["url_hash"].to_numpy(dtype=np.int64)
        if old.empty:
            bucket = int(new["bucket"].iloc[0])
            m = max(64, int(len(hashes) * bpk))
            k = k_default
            bits = np.zeros(m, dtype=bool)
            n0 = 0
        else:
            bucket = int(old["bucket"].iloc[0])
            m = int(old["m"].iloc[0])
            k = int(old["k"].iloc[0])
            bits = np.unpackbits(
                np.frombuffer(old["bits"].iloc[0], dtype=np.uint8)
            ).astype(bool)[:m]
            n0 = int(old["n_keys"].iloc[0])
        bits[_positions(hashes, m, k).ravel()] = True
        return pd.DataFrame(
            [(bucket, np.packbits(bits).tobytes(), m, k, n0 + len(hashes))],
            columns=["bucket", "bits", "m", "k", "n_keys"],
        )

    d = delta.select("url_hash").withColumn("bucket", _bucket_expr(cfg))
    return (
        old_shards.groupBy("bucket")
        .cogroup(d.groupBy("bucket"))
        .applyInPandas(merge, schema=SHARD_SCHEMA)
    )
