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
