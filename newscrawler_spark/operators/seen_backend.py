"""Pluggable URL-seen filter backend (north rule: "Bloom/cuckoo").

The crawl loop needs exactly four operations from the probabilistic
seen-set: build shards from a key set, fold a delta in, prefilter+
exact-confirm dedup against persisted shards, and a saturation rule
over driver-readable shard stats. Both backends satisfy them with the
same sharding contract (one row per ``pmod(url_hash, seen_buckets)``
bucket, grouped/cogrouped pandas UDFs, exact anti-join confirm ⇒ the
dedup result is ALWAYS ≡ ``dedup_against_seen``):

- ``bloom`` (default, operators/seen.py): cheapest bits/key, no delete;
- ``cuckoo`` (operators/cuckoo.py): 16-bit fingerprints, ~50x lower FP
  rate, and DELETION (evict-to-recrawl) via ``delete_from_shards``.

Select with ``CrawlConfig(seen_filter="cuckoo")``. The runner records
the backend in each round manifest; resuming a state dir whose shards
were written by the OTHER backend triggers one rebuild (shard schemas
differ), after which maintenance is incremental again.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame

from newscrawler_spark.config import CrawlConfig


@dataclass(frozen=True)
class SeenFilterBackend:
    name: str
    build_shards: Callable[[DataFrame, CrawlConfig], DataFrame]
    update_shards: Callable[[DataFrame, DataFrame, CrawlConfig], DataFrame]
    dedup_with_shards: Callable[
        [DataFrame, DataFrame, DataFrame, CrawlConfig], DataFrame]
    saturated: Callable[[list, CrawlConfig], bool]


def _bloom_backend() -> SeenFilterBackend:
    from newscrawler_spark.operators import seen as SN

    return SeenFilterBackend(
        name="bloom",
        build_shards=SN.build_bloom_shards,
        update_shards=SN.update_bloom_shards,
        dedup_with_shards=SN.bloom_dedup_with_shards,
        saturated=lambda stats, cfg: SN.shards_saturated(
            stats, cfg.bloom_bits_per_key),
    )


def _cuckoo_backend() -> SeenFilterBackend:
    from newscrawler_spark.operators import cuckoo as CK

    return SeenFilterBackend(
        name="cuckoo",
        build_shards=CK.build_cuckoo_shards,
        update_shards=CK.update_cuckoo_shards,
        dedup_with_shards=CK.cuckoo_dedup_with_shards,
        saturated=lambda stats, cfg: CK.cuckoo_saturated(stats),
    )


def backend_for(cfg: CrawlConfig) -> SeenFilterBackend:
    if cfg.seen_filter == "bloom":
        return _bloom_backend()
    if cfg.seen_filter == "cuckoo":
        return _cuckoo_backend()
    raise ValueError(
        f"unknown seen_filter {cfg.seen_filter!r} (want 'bloom' or 'cuckoo')")
