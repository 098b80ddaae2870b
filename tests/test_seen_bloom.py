"""Bloom seen-set shards (SURVEY.md §3 J / §6.3 #3): exact equivalence to
the anti-join plus the no-false-negative property, at several scales."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from newscrawler_spark.config import CrawlConfig
from newscrawler_spark.operators.frontier import dedup_against_seen
from newscrawler_spark.operators.seen import (
    _n_hashes,
    _positions,
    bloom_dedup,
    bloom_split,
    build_bloom_shards,
)

CFG = CrawlConfig(seen_buckets=8, bloom_bits_per_key=10)


def _links_df(spark, hashes):
    return spark.createDataFrame(
        [(f"http://h/{h}", h) for h in hashes], "url string, url_hash long"
    )


def _seen_df(spark, hashes):
    return spark.createDataFrame([(h,) for h in hashes], "url_hash long")


@pytest.fixture(scope="module")
def big_sets(spark):
    rng = np.random.default_rng(42)
    seen = rng.integers(-(2**62), 2**62, size=5000).tolist()
    overlap = seen[:1000]
    fresh = rng.integers(-(2**62), 2**62, size=4000).tolist()
    links = overlap + [h for h in fresh if h not in set(seen)]
    return seen, links


def test_bloom_dedup_equals_exact(spark, big_sets):
    seen_h, link_h = big_sets
    links = _links_df(spark, link_h)
    seen = _seen_df(spark, seen_h)
    got = {r.url_hash for r in bloom_dedup(links, seen, CFG).collect()}
    want = {r.url_hash for r in dedup_against_seen(links, seen).collect()}
    assert got == want
    assert got == set(link_h) - set(seen_h)


def test_bloom_no_false_negatives(spark, big_sets):
    """Every seen key must be tagged maybe_seen by its shard."""
    seen_h, _ = big_sets
    seen = _seen_df(spark, seen_h)
    shards = build_bloom_shards(seen, CFG)
    probed = bloom_split(_links_df(spark, seen_h), shards, CFG).collect()
    assert len(probed) == len(set(seen_h))
    assert all(r.maybe_seen for r in probed)


def test_bloom_fpp_reasonable(spark, big_sets):
    """~10 bits/key ⇒ ≲2% false-positive rate on definitely-fresh keys."""
    seen_h, _ = big_sets
    rng = np.random.default_rng(7)
    fresh = [int(h) for h in rng.integers(-(2**62), 2**62, size=3000)
             if int(h) not in set(seen_h)]
    shards = build_bloom_shards(_seen_df(spark, seen_h), CFG)
    probed = bloom_split(_links_df(spark, fresh), shards, CFG).collect()
    fp = sum(1 for r in probed if r.maybe_seen)
    assert fp / len(probed) < 0.05


def test_empty_seen_all_fresh(spark):
    links = _links_df(spark, [1, 2, 3])
    seen = spark.createDataFrame([], "url_hash long")
    got = {r.url_hash for r in bloom_dedup(links, seen, CFG).collect()}
    assert got == {1, 2, 3}


@given(
    seen=st.sets(st.integers(-(2**63), 2**63 - 1), max_size=60),
    links=st.sets(st.integers(-(2**63), 2**63 - 1), max_size=60),
)
@settings(max_examples=10, deadline=None)
def test_bloom_dedup_property(spark, seen, links):
    got = {
        r.url_hash
        for r in bloom_dedup(
            _links_df(spark, sorted(links)), _seen_df(spark, sorted(seen)), CFG
        ).collect()
    }
    assert got == links - seen


def test_positions_pure_numpy_shapes():
    h = np.array([0, 1, -5, 2**62], dtype=np.int64)
    k = _n_hashes(10)
    pos = _positions(h, 1024, k)
    assert pos.shape == (4, k)
    assert pos.min() >= 0 and pos.max() < 1024


def test_incremental_update_equals_rebuild(spark, big_sets):
    """OR-folding deltas into existing shards must behave exactly like a
    probe structure over the union: zero false negatives on all keys and
    final dedup equal to the exact anti-join."""
    from newscrawler_spark.operators.seen import update_bloom_shards

    seen_h, link_h = big_sets
    first, second = seen_h[:2500], seen_h[2500:]
    s1 = build_bloom_shards(_seen_df(spark, first), CFG)
    s2 = update_bloom_shards(s1, _seen_df(spark, second), CFG)

    # no false negatives over the UNION of both deltas
    probed = bloom_split(_links_df(spark, seen_h), s2, CFG).collect()
    assert all(r.maybe_seen for r in probed)
    # n_keys accounting
    total = sum(r.n_keys for r in s2.collect())
    assert total == len(first) + len(second)
    # empty delta is a no-op
    s3 = update_bloom_shards(s2, spark.createDataFrame([], "url_hash long"), CFG)
    a = {(r.bucket, bytes(r.bits), r.m, r.k, r.n_keys) for r in s2.collect()}
    b = {(r.bucket, bytes(r.bits), r.m, r.k, r.n_keys) for r in s3.collect()}
    assert a == b
    # new bucket appearing only in the delta gets a fresh shard
    extra = [h for h in range(100, 200)]
    s4 = update_bloom_shards(s1, _seen_df(spark, extra), CFG)
    probed4 = bloom_split(_links_df(spark, extra), s4, CFG).collect()
    assert all(r.maybe_seen for r in probed4)
