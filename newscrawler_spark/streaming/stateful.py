"""Custom stateful streaming operator: cross-micro-batch URL-seen dedup.

The batch engine deduplicates each round against the persisted seen
ledger (operators/seen.py); this is the Structured-Streaming form for a
continuously-arriving link stream: ``applyInPandasWithState`` keyed by
``pmod(url_hash, buckets)`` holds each bucket's seen-hash set as
GroupState, so a URL is emitted exactly once across ALL micro-batches —
state survives restarts through the checkpoint like the batch ledger
survives through snapshots.

Scale shape: state is partitioned by the same bucket key as the batch
Bloom shards, so per-group state stays bounded by widening ``buckets``
(state store backends shard by group key). Streaming dedup has no
watermark here by design — URL identity never expires in a crawl
(matching the batch semantics); a TTL'd variant would pass a timeout
conf instead of NoTimeout.

This is deliberately the EXACT form (hash set, no false positives): a
Bloom GroupState would drop fresh URLs on false positives, which the
batch path avoids via its exact-confirm join — a streaming confirm join
against a static ledger would reintroduce the batch machinery.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "url string, url_canon string, url_hash long, host string"
STATE_SCHEMA = "hashes array<long>"

# At 10^10-URL scale the bucket states exceed executor heaps; Spark's
# RocksDB state store (rocksdbjni ships with the distro) spills them to
# executor-local disk with changelog checkpointing to the checkpoint
# dir. Session-wide SQL conf — set before starting queries.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark) -> str | None:
    """Switch the session's streaming state store to RocksDB; returns the
    previous provider setting (None = Spark default HDFSBackedStateStore)
    so callers/tests can restore it."""
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, ROCKSDB_PROVIDER)
    return prev


def _dedup_group(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    for pdf in pdfs:
        h = pdf["url_hash"]
        # vectorized first-occurrence: not in cross-batch state AND not a
        # repeat within this batch (keep='first' also dedupes in-batch)
        fresh = ~h.isin(seen) & ~h.duplicated(keep="first")
        out = pdf.loc[fresh, ["url", "url_canon", "url_hash", "host"]]
        seen.update(int(v) for v in out["url_hash"])
        if len(out):
            yield out
    state.update((list(seen),))


def stateful_seen_dedup(links: DataFrame, buckets: int = 32) -> DataFrame:
    """Streaming DataFrame in (frontier-shaped: url, url_canon, url_hash,
    host, ...), first-occurrence rows out. Must be used on a streaming
    DataFrame with a checkpointed query (append mode)."""
    keyed = links.select("url", "url_canon", "url_hash", "host").withColumn(
        "bucket", F.pmod("url_hash", F.lit(buckets)).cast("int")
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
