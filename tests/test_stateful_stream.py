"""applyInPandasWithState URL-seen dedup: exactly-once emission across
micro-batches, state survives a query restart via the checkpoint."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.streaming.stateful import stateful_seen_dedup

SCHEMA = "url string, url_canon string, url_hash long, host string"

B1 = [
    ("http://a/1", "http://a/1", 1, "a"),
    ("http://a/2", "http://a/2", 2, "a"),
    ("http://a/1?x", "http://a/1", 1, "a"),   # in-batch dup of hash 1
    ("http://b/9", "http://b/9", 9, "b"),
]
B2 = [
    ("http://a/2", "http://a/2", 2, "a"),     # cross-batch dup
    ("http://a/3", "http://a/3", 3, "a"),     # fresh
    ("http://b/9", "http://b/9", 9, "b"),     # cross-batch dup
]


def _run_batch(spark, rows, in_dir, ckpt, out_dir):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(in_dir)
    stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
    q = (
        stateful_seen_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_exactly_once_across_batches_and_restart(spark, tmp_path_factory):
    in_dir = str(tmp_path_factory.mktemp("links_in"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    out_dir = str(tmp_path_factory.mktemp("dedup_out"))

    _run_batch(spark, B1, in_dir, ckpt, out_dir)
    got1 = {r.url_hash for r in spark.read.parquet(out_dir).collect()}
    assert got1 == {1, 2, 9}
    # hash 1 emitted exactly once despite the in-batch duplicate
    assert spark.read.parquet(out_dir).where("url_hash = 1").count() == 1

    # restart the query on the SAME checkpoint with new input: state
    # restored, only the genuinely fresh hash comes out
    _run_batch(spark, B2, in_dir, ckpt, out_dir)
    rows = spark.read.parquet(out_dir).collect()
    assert {r.url_hash for r in rows} == {1, 2, 3, 9}
    counts = spark.read.parquet(out_dir).groupBy("url_hash").count().collect()
    assert all(r["count"] == 1 for r in counts), "a url was emitted twice"


def test_exactly_once_under_rocksdb_state_store(spark, tmp_path_factory):
    """Same exactly-once + restart contract with the RocksDB state store
    (the 10^10-scale backend: bucket states live on executor-local disk,
    not the heap). rocksdbjni ships with the Spark distro, so this runs
    for real — state written by batch 1 must be re-opened from RocksDB
    by the restarted query."""
    from newscrawler_spark.streaming.stateful import use_rocksdb_state_store

    in_dir = str(tmp_path_factory.mktemp("links_in_rdb"))
    ckpt = str(tmp_path_factory.mktemp("ckpt_rdb"))
    out_dir = str(tmp_path_factory.mktemp("dedup_out_rdb"))
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = use_rocksdb_state_store(spark)
    try:
        _run_batch(spark, B1, in_dir, ckpt, out_dir)
        assert {r.url_hash for r in spark.read.parquet(out_dir).collect()} \
            == {1, 2, 9}
        _run_batch(spark, B2, in_dir, ckpt, out_dir)
        counts = spark.read.parquet(out_dir).groupBy("url_hash").count().collect()
        assert {r.url_hash for r in counts} == {1, 2, 3, 9}
        assert all(r["count"] == 1 for r in counts), "a url was emitted twice"
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
