"""Composed streaming e2e (VERDICT r3 #8): feed → stateful dedup → merge
in ONE checkpointed query, restarted mid-stream.

What the restart proves: the dedup GroupState and the source commit log
live under the same checkpoint, so a second ``streaming_feed_crawl``
start on the same dirs resumes exactly-once — URLs extracted before the
stop are never re-extracted after it, across waves that heavily overlap.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.operators.store import CrawlState
from newscrawler_spark.streaming.compose import streaming_feed_crawl

# scale knob: synthetic feed items per wave on top of the real corpus
# links — big enough that the dedup state spans every bucket with
# thousands of hashes, small enough for CI (<1 min)
SYNTH_PER_WAVE = 5_000


def _feed_wave(spark, pages_e, wave: int, hosts: list[str]):
    """One feed snapshot: the REAL rss items of the given smoke feed
    hosts plus SYNTH_PER_WAVE synthetic links, half overlapping the
    prior wave's synthetic range (cross-wave dedup pressure)."""
    from newscrawler_spark.operators.discover import rss_items

    real = rss_items(pages_e).where(
        F.col("feed_host").isin(hosts) | F.lit(len(hosts) == 0)
    )
    lo = wave * SYNTH_PER_WAVE // 2
    synth = spark.range(lo, lo + SYNTH_PER_WAVE).select(
        F.lit("synth.example.com").alias("feed_host"),
        F.concat(F.lit("http://synth.example.com/a/"), F.col("id"))
        .alias("link"),
        F.concat(F.lit("t"), F.col("id")).alias("rss_title"),
        F.lit("Mon, 01 Jan 2024 10:00:00 GMT").alias("pub_date_raw"),
    )
    return real.select("feed_host", "link", "rss_title",
                       "pub_date_raw").unionByName(synth)


@pytest.fixture(scope="module")
def rss_hosts(spark, smoke_pages_e):
    from newscrawler_spark.operators.discover import rss_items

    return sorted({
        r.feed_host for r in
        rss_items(smoke_pages_e).select("feed_host").distinct().collect()
    })


def test_compose_dedup_merge_restart(spark, smoke_pages_e, rss_hosts,
                                     tmp_path_factory):
    feed_dir = str(tmp_path_factory.mktemp("feeds"))
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    state_dir = str(tmp_path_factory.mktemp("state"))
    state = CrawlState(spark, state_dir)
    assert len(rss_hosts) >= 3  # need a host held back until the restart

    # ---- wave 1: two overlapping snapshots, one micro-batch per file
    _feed_wave(spark, smoke_pages_e, 0, rss_hosts[:2]).write.mode(
        "append").parquet(feed_dir)
    _feed_wave(spark, smoke_pages_e, 1, rss_hosts[1:3]).write.mode(
        "append").parquet(feed_dir)
    q = streaming_feed_crawl(spark, feed_dir, state, smoke_pages_e, ckpt,
                             buckets=8, max_files_per_trigger=1)
    q.awaitTermination(240)

    arts1 = state.read_articles().select("url_hash").collect()
    hashes1 = [r.url_hash for r in arts1]
    # exactly-once across the two overlapping micro-batches
    assert len(hashes1) == len(set(hashes1)) > 0
    rounds1 = state.latest_round()
    assert rounds1 >= 2  # one commit per non-empty micro-batch

    # ---- restart mid-stream: same checkpoint, new files arrive.
    # wave 2 repeats the first three feed hosts entirely (already-seen)
    # and adds the remaining rss hosts + an overlapping synthetic range.
    state2 = CrawlState(spark, state_dir)
    _feed_wave(spark, smoke_pages_e, 2, rss_hosts).write.mode(
        "append").parquet(feed_dir)
    q2 = streaming_feed_crawl(spark, feed_dir, state2, smoke_pages_e, ckpt,
                              buckets=8, max_files_per_trigger=1)
    q2.awaitTermination(240)

    arts2 = state2.read_articles().select("url_hash", "url").collect()
    hashes2 = [r.url_hash for r in arts2]
    # STILL exactly-once: nothing from before the restart re-extracted
    assert len(hashes2) == len(set(hashes2))
    assert set(hashes1).issubset(set(hashes2))
    # the restart's only additions are urls of hosts never fed before
    new = set(hashes2) - set(hashes1)
    assert len(new) > 0
    fed_before = set(rss_hosts[:3])
    new_urls = {r.url for r in arts2 if r.url_hash in new}
    assert all(
        not any(h in u for h in fed_before) for u in new_urls
    ), new_urls


def test_compose_state_spans_buckets(spark, smoke_pages_e, tmp_path_factory):
    """The dedup state shards by pmod(url_hash, buckets): with thousands
    of synthetic urls every bucket must see traffic (the scale shape —
    no single hot GroupState)."""
    from newscrawler_spark.operators import frontier as FR

    links = FR.enrich_urls(
        _feed_wave(spark, smoke_pages_e, 0, []), "link"
    ).select(F.pmod("url_hash", F.lit(8)).alias("bucket"))
    per_bucket = {r.bucket: r.n for r in
                  links.groupBy("bucket").agg(F.count("*").alias("n"))
                  .collect()}
    assert len(per_bucket) == 8
    assert min(per_bucket.values()) > SYNTH_PER_WAVE / 8 / 4
