"""Cuckoo-filter seen-set shards (SURVEY.md §3 J / north rule
"Bloom/cuckoo"): exact equivalence to the anti-join, no false negatives
for inserted keys (stash makes this unconditional), delta folds, and the
capability Bloom lacks — deletion / evict-to-recrawl."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from newscrawler_spark.config import CrawlConfig
from newscrawler_spark.operators.cuckoo import (
    _SLOTS,
    _build_table,
    _probe_arrays,
    _sizing,
    build_cuckoo_shards,
    cuckoo_dedup,
    cuckoo_saturated,
    cuckoo_split,
    delete_from_shards,
    update_cuckoo_shards,
)
from newscrawler_spark.operators.frontier import dedup_against_seen

CFG = CrawlConfig(seen_buckets=8)


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


def test_cuckoo_dedup_equals_exact(spark, big_sets):
    seen_h, link_h = big_sets
    links = _links_df(spark, link_h)
    seen = _seen_df(spark, seen_h)
    got = {r.url_hash for r in cuckoo_dedup(links, seen, CFG).collect()}
    want = {r.url_hash for r in dedup_against_seen(links, seen).collect()}
    assert got == want
    assert got == set(link_h) - set(seen_h)


def test_cuckoo_no_false_negatives(spark, big_sets):
    seen_h, _ = big_sets
    seen = _seen_df(spark, seen_h)
    shards = build_cuckoo_shards(seen, CFG)
    probed = cuckoo_split(_links_df(spark, seen_h), shards, CFG).collect()
    assert len(probed) == len(set(seen_h))
    assert all(r.maybe_seen for r in probed)


def test_cuckoo_fpp_small(spark, big_sets):
    """16-bit fingerprints ⇒ FP rate orders below Bloom's ~1%."""
    seen_h, _ = big_sets
    rng = np.random.default_rng(7)
    fresh = [int(h) for h in rng.integers(-(2**62), 2**62, size=3000)
             if int(h) not in set(seen_h)]
    shards = build_cuckoo_shards(_seen_df(spark, seen_h), CFG)
    probed = cuckoo_split(_links_df(spark, fresh), shards, CFG).collect()
    fp = sum(1 for r in probed if r.maybe_seen)
    assert fp / len(probed) < 0.01


def test_empty_seen_all_fresh(spark):
    links = _links_df(spark, [1, 2, 3])
    seen = spark.createDataFrame([], "url_hash long")
    got = {r.url_hash for r in cuckoo_dedup(links, seen, CFG).collect()}
    assert got == {1, 2, 3}


@given(
    seen=st.sets(st.integers(-(2**63), 2**63 - 1), max_size=60),
    links=st.sets(st.integers(-(2**63), 2**63 - 1), max_size=60),
)
@settings(max_examples=10, deadline=None)
def test_cuckoo_dedup_property(spark, seen, links):
    got = {
        r.url_hash
        for r in cuckoo_dedup(
            _links_df(spark, sorted(links)), _seen_df(spark, sorted(seen)), CFG
        ).collect()
    }
    assert got == links - seen


def test_incremental_update_equals_rebuild(spark, big_sets):
    seen_h, _ = big_sets
    first, second = seen_h[:2500], seen_h[2500:]
    s1 = build_cuckoo_shards(_seen_df(spark, first), CFG)
    s2 = update_cuckoo_shards(s1, _seen_df(spark, second), CFG)

    probed = cuckoo_split(_links_df(spark, seen_h), s2, CFG).collect()
    assert all(r.maybe_seen for r in probed)
    total = sum(r.n_keys for r in s2.collect())
    assert total == len(first) + len(second)
    # empty delta is a no-op
    s3 = update_cuckoo_shards(s2, spark.createDataFrame([], "url_hash long"), CFG)
    a = {(r.bucket, bytes(r.tab), r.nb, r.n_keys) for r in s2.collect()}
    b = {(r.bucket, bytes(r.tab), r.nb, r.n_keys) for r in s3.collect()}
    assert a == b
    # new bucket appearing only in the delta gets a fresh shard
    extra = list(range(100, 200))
    s4 = update_cuckoo_shards(s1, _seen_df(spark, extra), CFG)
    probed4 = cuckoo_split(_links_df(spark, extra), s4, CFG).collect()
    assert all(r.maybe_seen for r in probed4)


def test_delete_makes_url_fetchable_again(spark, big_sets):
    """The cuckoo-only capability: evicting a URL from the filter makes it
    pass the prefilter as definitely-new (recrawl semantics). Survivors
    keep their no-FN guarantee."""
    seen_h, _ = big_sets
    evicted, kept = seen_h[:500], seen_h[500:]
    shards = build_cuckoo_shards(_seen_df(spark, seen_h), CFG)
    shards2 = delete_from_shards(shards, _seen_df(spark, evicted), CFG)

    probed_kept = cuckoo_split(_links_df(spark, kept), shards2, CFG).collect()
    assert all(r.maybe_seen for r in probed_kept)

    probed_ev = cuckoo_split(_links_df(spark, evicted), shards2, CFG).collect()
    # a shared-fingerprint collision can leave the odd evicted key still
    # positive (documented ~2^-16-scale event); the overwhelming majority
    # must now read fresh
    still = sum(1 for r in probed_ev if r.maybe_seen)
    assert still <= 2
    # deleting a never-inserted key is a no-op for everyone else
    shards3 = delete_from_shards(
        shards2, _seen_df(spark, [10**9 + 7]), CFG)
    probed3 = cuckoo_split(_links_df(spark, kept), shards3, CFG).collect()
    assert all(r.maybe_seen for r in probed3)


def test_insert_after_delete_reuses_slots(spark, big_sets):
    """delete → fold cycle (the steady-state recrawl loop): re-inserting
    the evicted keys restores membership and n_keys accounting."""
    seen_h, _ = big_sets
    evicted = seen_h[:500]
    shards = build_cuckoo_shards(_seen_df(spark, seen_h), CFG)
    shards = delete_from_shards(shards, _seen_df(spark, evicted), CFG)
    shards = update_cuckoo_shards(shards, _seen_df(spark, evicted), CFG)
    probed = cuckoo_split(_links_df(spark, seen_h), shards, CFG).collect()
    assert all(r.maybe_seen for r in probed)
    assert sum(r.n_keys for r in shards.collect()) == len(seen_h)


def test_saturation_rule():
    assert not cuckoo_saturated(
        [{"n_keys": 100, "nb": 64, "slots": 4, "stash_len": 0}])
    assert cuckoo_saturated(
        [{"n_keys": 240, "nb": 64, "slots": 4, "stash_len": 0}])
    assert cuckoo_saturated(
        [{"n_keys": 10, "nb": 64, "slots": 4, "stash_len": 1}])


def _log(state):
    rows = state.read_fetch_log().orderBy(
        "fetch_round", "host", "rank_in_host").collect()
    return [(r.fetch_round, r.host, r.rank_in_host, r.url_canon,
             r.url_hash, r.status) for r in rows]


def test_e2e_crawl_cuckoo_equals_bloom(spark, smoke_pages, smoke_seeds):
    """Full crawl with seen_filter='cuckoo' (filter active from round 1)
    produces the identical fetch log and seen set as the Bloom run —
    the backend choice is invisible to crawl semantics."""
    import tempfile

    from newscrawler_spark.runner import run_crawl

    base = CrawlConfig(per_host_budget=5, max_depth=3, bloom_min_seen_rows=0)
    logs, seens = [], []
    for flt in ("bloom", "cuckoo"):
        cfg = CrawlConfig(**{**base.__dict__, "seen_filter": flt})
        with tempfile.TemporaryDirectory(prefix=f"crawl_{flt}_") as d:
            res = run_crawl(spark, smoke_pages, smoke_seeds, d, cfg,
                            max_rounds=6)
            logs.append(_log(res.state))
            seens.append({r.url_hash for r in res.state.read_seen().collect()})
            assert res.state.shard_backend() == flt
    assert logs[0] == logs[1]
    assert seens[0] == seens[1]


def test_e2e_backend_switch_on_resume(spark, smoke_pages, smoke_seeds):
    """A state dir written with Bloom shards, resumed with
    seen_filter='cuckoo': one rebuild, then identical crawl results to an
    uninterrupted Bloom run (the mismatch guard in the runner)."""
    import tempfile

    from newscrawler_spark.runner import run_crawl

    base = CrawlConfig(per_host_budget=5, max_depth=3, bloom_min_seen_rows=0)
    with tempfile.TemporaryDirectory(prefix="crawl_ref_") as d:
        ref = run_crawl(spark, smoke_pages, smoke_seeds, d, base, max_rounds=6)
        want = _log(ref.state)
    cuckoo_cfg = CrawlConfig(**{**base.__dict__, "seen_filter": "cuckoo"})
    with tempfile.TemporaryDirectory(prefix="crawl_switch_") as d:
        run_crawl(spark, smoke_pages, smoke_seeds, d, base, max_rounds=3)
        res = run_crawl(spark, smoke_pages, smoke_seeds, d, cuckoo_cfg,
                        max_rounds=3)
        assert _log(res.state) == want
        assert res.state.shard_backend() == "cuckoo"


def test_kernel_high_load_stash_keeps_fn_free():
    """Force a shard past its design load: the eviction walks overflow
    into the stash, and membership stays FN-free regardless."""
    rng = np.random.default_rng(3)
    keys = np.unique(rng.integers(-(2**62), 2**62, size=2000, dtype=np.int64))
    nb = max(8, _sizing(len(keys)) // 2)  # deliberately undersized
    tab, stash = _build_table(keys, nb)
    load = (tab != 0).sum() / (nb * _SLOTS)
    assert load > 0.85  # genuinely saturated
    sidx = np.array([s[0] for s in stash], dtype=np.int64)
    sfp = np.array([s[1] for s in stash], dtype=np.uint16)
    assert bool(_probe_arrays(tab, sidx, sfp, keys).all())
