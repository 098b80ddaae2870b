"""Checkpoint/resume (A11/G2, SURVEY.md §6.3 #4): a killed run resumes
with no re-fetch and no ordering drift; torn (manifest-less) rounds are
invisible — the parquet+manifest backend's Iceberg-snapshot semantics."""

from __future__ import annotations

import json
import os
import shutil
import tempfile

import pytest

from newscrawler_spark.config import CrawlConfig
from newscrawler_spark.operators.store import CrawlState
from newscrawler_spark.runner import run_crawl

CFG = CrawlConfig(per_host_budget=5, max_depth=3)


def _log(state):
    rows = state.read_fetch_log().orderBy("fetch_round", "host", "rank_in_host").collect()
    return [
        (r.fetch_round, r.host, r.rank_in_host, r.url_canon, r.url_hash, r.status)
        for r in rows
    ]


@pytest.fixture(scope="module")
def uninterrupted(spark, smoke_pages, smoke_seeds):
    with tempfile.TemporaryDirectory(prefix="crawl_full_") as d:
        res = run_crawl(spark, smoke_pages, smoke_seeds, d, CFG,
                        max_rounds=8, use_bloom=False)
        yield {
            "log": _log(res.state),
            "seen": {r.url_hash for r in res.state.read_seen().collect()},
            "final": res.final_round,
        }


def test_resume_identical(spark, smoke_pages, smoke_seeds, uninterrupted):
    """Stop after 3 rounds ('kill'), resume for the rest → identical log."""
    with tempfile.TemporaryDirectory(prefix="crawl_kill_") as d:
        run_crawl(spark, smoke_pages, smoke_seeds, d, CFG, max_rounds=3, use_bloom=False)
        res2 = run_crawl(spark, smoke_pages, smoke_seeds, d, CFG,
                         max_rounds=5, use_bloom=False)
        assert _log(res2.state) == uninterrupted["log"]
        assert {r.url_hash for r in res2.state.read_seen().collect()} == uninterrupted["seen"]


def test_torn_round_is_invisible_and_recovered(spark, smoke_pages, smoke_seeds, uninterrupted):
    """A round dir without _MANIFEST.json (kill mid-commit) is ignored by
    resume, and the re-run round is byte-equal to the uninterrupted one."""
    with tempfile.TemporaryDirectory(prefix="crawl_torn_") as d:
        run_crawl(spark, smoke_pages, smoke_seeds, d, CFG, max_rounds=3, use_bloom=False)
        state = CrawlState(spark, d)
        assert state.latest_round() == 3
        # simulate a torn round-4 commit: data written, manifest missing
        torn = os.path.join(d, "round=4")
        shutil.copytree(os.path.join(d, "round=3"), torn)
        os.remove(os.path.join(torn, "_MANIFEST.json"))
        assert state.latest_round() == 3  # torn round invisible
        res2 = run_crawl(spark, smoke_pages, smoke_seeds, d, CFG,
                         max_rounds=5, use_bloom=False)
        assert _log(res2.state) == uninterrupted["log"]


def test_manifest_records_counts(spark, smoke_pages, smoke_seeds):
    with tempfile.TemporaryDirectory(prefix="crawl_man_") as d:
        res = run_crawl(spark, smoke_pages, smoke_seeds, d, CFG,
                        max_rounds=2, use_bloom=False)
        man = res.state.manifest(1)
        assert man["round"] == 1
        counts = man["row_counts"]
        assert set(counts) == {"frontier", "seen_delta", "fetch_log",
                               "articles_delta", "counters"}
        assert counts["fetch_log"] > 0
        # manifest counts match actual parquet
        assert counts["fetch_log"] == res.state.read_fetch_log(1).where(
            "fetch_round = 1"
        ).count()
        # json round-trips
        assert json.loads(json.dumps(man)) == man


def test_incremental_bloom_fold_evidence(spark, smoke_pages, smoke_seeds,
                                         uninterrupted):
    """The crawl loop must maintain the Bloom shards by folding each
    round's delta (O(|delta|)), not rebuilding from the full seen set —
    with identical crawl output. Evidence asserted per round from the
    committed manifests + shard stats:
    - crawl log/seen identical to the bloom-off reference;
    - every round records its bloom mode + delta size;
    - shard key-counts advance by exactly the delta each round;
    - on 'incremental' rounds every bucket's bitset size m is FROZEN
      (a rebuild would re-size) — proving the fold path ran."""
    with tempfile.TemporaryDirectory(prefix="crawl_bloom_inc_") as d:
        res = run_crawl(spark, smoke_pages, smoke_seeds, d,
                        CFG.with_overrides(bloom_min_seen_rows=0),
                        max_rounds=8, use_bloom=True)
        assert _log(res.state) == uninterrupted["log"]
        seen_rows = res.state.read_seen().collect()
        assert {r.url_hash for r in seen_rows} == uninterrupted["seen"]
        # seen deltas pairwise disjoint ⇒ no duplicates without distinct()
        assert len(seen_rows) == len({r.url_hash for r in seen_rows})

        rounds = res.state.committed_rounds()
        prev_stats = None
        prev_total = 0
        n_incremental = 0
        for r in rounds:
            man = res.state.manifest(r)
            assert man["bloom"]["mode"] in ("incremental", "rebuild")
            assert man["bloom"]["delta_rows"] == man["row_counts"]["seen_delta"]
            stats = {s["bucket"]: s for s in res.state.bloom_shard_stats(r)}
            total = sum(s["n_keys"] for s in stats.values())
            assert total == prev_total + man["bloom"]["delta_rows"]
            if man["bloom"]["mode"] == "incremental" and prev_stats:
                n_incremental += 1
                for b, s in prev_stats.items():
                    assert stats[b]["m"] == s["m"], f"bucket {b} resized"
            prev_stats, prev_total = stats, total
        assert n_incremental >= 1
        assert prev_total == len(seen_rows)


def test_resume_with_bloom_and_compaction(spark, smoke_pages, smoke_seeds,
                                          uninterrupted):
    """Kill/resume with the persisted-shard Bloom path AND seen-ledger
    compaction on: resumed crawl is identical, and read_seen scans only
    the compacted base + tail deltas (read cost no longer grows with
    round count)."""
    cfg = CFG.with_overrides(compact_seen_every=2, bloom_min_seen_rows=0)
    with tempfile.TemporaryDirectory(prefix="crawl_bloom_resume_") as d:
        run_crawl(spark, smoke_pages, smoke_seeds, d, cfg, max_rounds=3,
                  use_bloom=True)
        res2 = run_crawl(spark, smoke_pages, smoke_seeds, d, cfg,
                         max_rounds=5, use_bloom=True)
        assert _log(res2.state) == uninterrupted["log"]
        assert {r.url_hash for r in res2.state.read_seen().collect()} == \
            uninterrupted["seen"]

        base_r = res2.state._seen_base_round(res2.final_round)
        assert base_r is not None
        assert res2.final_round - base_r < 2 + 1
        files = res2.state.read_seen().inputFiles()
        for r in range(0, base_r + 1):
            assert not any(f"round={r}/seen_delta" in f for f in files), (
                f"read_seen still scans pre-base round {r}"
            )
        assert any(f"base={base_r}" in f for f in files)


def test_compact_seen_idempotent_and_equal(spark, smoke_pages, smoke_seeds):
    """compact_seen preserves the membership set exactly, is idempotent,
    and replaces older bases."""
    with tempfile.TemporaryDirectory(prefix="crawl_compact_") as d:
        res = run_crawl(spark, smoke_pages, smoke_seeds, d,
                        CFG.with_overrides(compact_seen_every=0),
                        max_rounds=4, use_bloom=False)
        st = res.state
        before = {r.url_hash for r in st.read_seen().collect()}
        mid = st.committed_rounds()[2]
        assert st.compact_seen(mid) == mid
        assert {r.url_hash for r in st.read_seen().collect()} == before
        assert st.compact_seen(mid) == mid          # idempotent
        final = st.latest_round()
        assert st.compact_seen(final) == final      # re-compact to head
        assert st._seen_base_round(final) == final  # old base replaced
        assert {r.url_hash for r in st.read_seen().collect()} == before


def test_counters_populated(spark, smoke_pages, smoke_seeds):
    with tempfile.TemporaryDirectory(prefix="crawl_cnt_") as d:
        res = run_crawl(spark, smoke_pages, smoke_seeds, d, CFG,
                        max_rounds=2, use_bloom=False)
        rows = res.state.read_counters().orderBy("fetch_round").collect()
        assert len(rows) == 2
        for r in rows:
            assert r.urls_scheduled > 0
            assert r.urls_fetched <= r.urls_scheduled
            assert r.bytes_fetched > 0
            assert r.wall_ms > 0
