"""RSS re-crawl daemon (G1/G2 + F1): batch tick + Structured Streaming
surface with availableNow trigger over a feed drop-directory."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.config import CrawlConfig
from newscrawler_spark.operators.store import CrawlState
from newscrawler_spark.runner import run_crawl
from newscrawler_spark.streaming.daemon import (
    changed_items,
    feed_snapshot,
    recrawl_rss_once,
    recrawl_rss_stream,
)

CFG = CrawlConfig(per_host_budget=5, max_depth=3)


@pytest.fixture(scope="module")
def crawled(spark, smoke_pages, smoke_seeds, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("daemon_state"))
    run_crawl(spark, smoke_pages, smoke_seeds, d, CFG, max_rounds=6, use_bloom=False)
    return d


def test_feed_snapshot_and_compare(spark, smoke_pages_e, crawled):
    state = CrawlState(spark, crawled)
    snap = feed_snapshot(smoke_pages_e)
    assert snap.count() == 20  # 4 rss hosts × 5 items
    assert snap.where(F.col("modified_date").isNull()).count() == 0
    ch = changed_items(snap, state)
    # stored versions came from the same corpus: nothing is strictly newer,
    # so only items never crawled (if any) remain
    stored = {r.url_hash for r in state.articles_current().collect()}
    for r in ch.collect():
        assert r.url_hash not in stored or r.modified_date is not None


def test_recrawl_once_idempotent(spark, smoke_pages_e, crawled):
    state = CrawlState(spark, crawled)
    last = state.latest_round()
    n1 = recrawl_rss_once(spark, smoke_pages_e, state, last + 1)
    # second tick: everything stored now, nothing newer → 0 re-extracted
    n2 = recrawl_rss_once(spark, smoke_pages_e, state, last + 2)
    assert n2 == 0
    assert state.latest_round() == last + 2


def test_streaming_surface(spark, smoke_pages_e, tmp_path_factory):
    from newscrawler_spark.operators.discover import rss_items

    state_dir = str(tmp_path_factory.mktemp("stream_state"))
    feed_dir = str(tmp_path_factory.mktemp("feeds"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    state = CrawlState(spark, state_dir)
    # drop one feed snapshot into the watched dir
    rss_items(smoke_pages_e).write.mode("append").parquet(feed_dir)
    q = recrawl_rss_stream(spark, feed_dir, state, smoke_pages_e, ckpt,
                           available_now=True)
    q.awaitTermination(120)
    assert state.latest_round() == 1
    arts = state.read_articles()
    assert arts.count() > 0
    assert arts.where(F.col("article_text") == "").count() == 0


def test_pubdate_zone_forms(spark):
    """RFC-822 zone coverage: UTC names, numeric offsets, named NA
    zones, optional seconds — and garbage stays NULL instead of raising
    (previously any non-UTC zone parsed to NULL and changed feed items
    were silently dropped)."""
    import datetime as dt

    from newscrawler_spark.streaming.daemon import _pubdate_expr

    rows = [
        ("Mon, 01 Jan 2024 10:00:00 GMT",),
        ("Tue, 02 Jan 2024 10:00:00 +0130",),
        ("Wed, 3 Jan 2024 10:00:00 EST",),
        ("04 Jan 2024 10:00 -0500",),
        ("not a date",),
    ]
    df = spark.createDataFrame(rows, "pub_date_raw string")
    got = [r.ts for r in df.select(_pubdate_expr().alias("ts")).collect()]
    assert got[0] == dt.datetime(2024, 1, 1, 10, 0, 0)
    assert got[1] == dt.datetime(2024, 1, 2, 8, 30, 0)
    assert got[2] == dt.datetime(2024, 1, 3, 15, 0, 0)
    assert got[3] == dt.datetime(2024, 1, 4, 15, 0, 0)
    assert got[4] is None
