"""TableIO two-backend contract (SURVEY.md §7.5): the SAME store surface
runs against the parquet+manifest backend and the Iceberg backend.

Offline this sandbox has no Iceberg runtime jar, so the Iceberg leg
skips with a reason — the contract suite itself is backend-agnostic and
runs unmodified on a cluster where the catalog resolves.
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.operators.extract import ARTICLES_SCHEMA
from newscrawler_spark.operators.store import (
    COUNTERS_SCHEMA,
    FETCH_LOG_SCHEMA,
    FRONTIER_SCHEMA,
    make_state,
)

BACKENDS = ["parquet", "iceberg"]


def _mk_state(spark, backend):
    d = tempfile.mkdtemp(prefix=f"state_{backend}_")
    if backend == "iceberg":
        from newscrawler_spark.operators.store_iceberg import iceberg_available

        if not iceberg_available(spark):
            pytest.skip(
                "iceberg runtime jar / catalog not resolvable in this "
                "offline sandbox — backend activates via spark-submit "
                "--packages org.apache.iceberg:iceberg-spark-runtime (see "
                "operators/store_iceberg.py)"
            )
    return make_state(spark, d, run_id="t", backend=backend)


def _frontier(spark, hashes):
    return spark.createDataFrame(
        [(f"http://h/{h}", f"http://h/{h}", h, "h", 5, 0, 0, "h", 0)
         for h in hashes],
        FRONTIER_SCHEMA,
    )


def _empty(spark, schema):
    return spark.createDataFrame([], schema)


def _commit(spark, state, r, frontier_hashes, seen_hashes):
    counters = spark.createDataFrame(
        [("t", r, 0, 0, 0, 0, 0, 0, 0)], COUNTERS_SCHEMA
    )
    return state.commit_round(
        r,
        _frontier(spark, frontier_hashes),
        _frontier(spark, seen_hashes).select("url_hash"),
        _empty(spark, FETCH_LOG_SCHEMA),
        _empty(spark, ARTICLES_SCHEMA),
        counters,
    )


@pytest.mark.parametrize("backend", BACKENDS)
def test_commit_read_roundtrip(spark, backend):
    st = _mk_state(spark, backend)
    _commit(spark, st, 0, [1, 2, 3], [1, 2, 3])
    _commit(spark, st, 1, [4, 5], [10, 11])
    assert st.committed_rounds() == [0, 1]
    assert st.latest_round() == 1
    assert {r.url_hash for r in st.read_frontier(1).collect()} == {4, 5}
    assert {r.url_hash for r in st.read_seen().collect()} == {1, 2, 3, 10, 11}
    assert {r.url_hash for r in st.read_seen(0).collect()} == {1, 2, 3}
    man = st.manifest(1)
    assert man["row_counts"]["frontier"] == 2
    assert man["row_counts"]["seen_delta"] == 2


@pytest.mark.parametrize("backend", BACKENDS)
def test_compact_seen_preserves_membership(spark, backend):
    st = _mk_state(spark, backend)
    _commit(spark, st, 0, [1], [1, 2])
    _commit(spark, st, 1, [2], [3])
    _commit(spark, st, 2, [3], [4, 5])
    before = {r.url_hash for r in st.read_seen().collect()}
    assert st.compact_seen(1) == 1
    assert {r.url_hash for r in st.read_seen().collect()} == before
    # tail delta (round 2) still visible on top of the base
    assert {4, 5} <= {r.url_hash for r in st.read_seen().collect()}
    # as-of semantics survive compaction: a historical read below the
    # compaction point must exclude keys first seen later, even though
    # their deltas were folded into the base
    assert {r.url_hash for r in st.read_seen(0).collect()} == {1, 2}


@pytest.mark.parametrize("backend", BACKENDS)
def test_torn_commit_then_recommit_no_duplicates(spark, backend):
    """A crash between data writes and the commit marker, followed by a
    successful re-commit of the same round, must leave exactly one copy
    of the round's rows (parquet: overwrite; iceberg: clear-then-append)."""
    st = _mk_state(spark, backend)
    _commit(spark, st, 0, [1], [1])
    if backend == "parquet":
        import os
        import shutil

        src, torn = st._round_dir(0), st._round_dir(1)
        shutil.copytree(src, torn)
        os.remove(os.path.join(torn, "_MANIFEST.json"))
    else:
        _frontier(spark, [7, 8]).withColumn(
            "fetch_round", F.lit(1).cast("int")
        ).writeTo(f"{st.ns}.frontier").append()
        _frontier(spark, [7, 8]).select("url_hash").withColumn(
            "fetch_round", F.lit(1).cast("int")
        ).writeTo(f"{st.ns}.seen_delta").append()
    man = _commit(spark, st, 1, [4, 5], [4, 5])
    assert man["row_counts"]["frontier"] == 2
    assert man["row_counts"]["seen_delta"] == 2
    assert sorted(r.url_hash for r in st.read_frontier(1).collect()) == [4, 5]
    assert {r.url_hash for r in st.read_seen().collect()} == {1, 4, 5}


@pytest.mark.parametrize("backend", BACKENDS)
def test_torn_commit_invisible(spark, backend):
    """Data written without the commit marker must be invisible to reads
    — manifest-less dir (parquet) / marker-less appends (iceberg)."""
    st = _mk_state(spark, backend)
    _commit(spark, st, 0, [1], [1])
    if backend == "parquet":
        import os
        import shutil

        src, torn = st._round_dir(0), st._round_dir(1)
        shutil.copytree(src, torn)
        os.remove(os.path.join(torn, "_MANIFEST.json"))
    else:
        # append round-1 rows to the state tables, no rounds-marker row
        _frontier(spark, [9]).withColumn(
            "fetch_round", F.lit(1).cast("int")
        ).writeTo(f"{st.ns}.frontier").append()
        _frontier(spark, [9]).select("url_hash").withColumn(
            "fetch_round", F.lit(1).cast("int")
        ).writeTo(f"{st.ns}.seen_delta").append()
    assert st.latest_round() == 0
    assert {r.url_hash for r in st.read_seen().collect()} == {1}


# --- statement goldens (VERDICT r2 #6): the exact SQL the Iceberg
# backend issues, pinned offline so the semantics are testable without a
# runtime jar. The skip above is thereby narrowed to execution only.


def test_iceberg_create_table_statements_golden():
    from newscrawler_spark.operators import store_iceberg as SI

    got = SI.create_table_sql(
        "crawl.state", "frontier", "url string, fetch_round int",
        "fetch_round",
    )
    assert got == (
        "CREATE TABLE IF NOT EXISTS crawl.state.frontier "
        "(url string, fetch_round int) USING iceberg "
        "PARTITIONED BY (fetch_round)"
    )
    assert SI.create_table_sql("crawl.state", "rounds", "round int", None) == (
        "CREATE TABLE IF NOT EXISTS crawl.state.rounds (round int) "
        "USING iceberg"
    )


def test_iceberg_heal_delete_statement_golden():
    """commit_round must clear round r's partition before re-appending —
    the idempotency fix for a crash between data appends and the rounds
    marker (parquet parity: mode('overwrite'))."""
    from newscrawler_spark.operators import store_iceberg as SI

    assert SI.delete_round_sql("crawl.state", "fetch_log", 7) == (
        "DELETE FROM crawl.state.fetch_log WHERE fetch_round = 7"
    )


def test_iceberg_articles_merge_statement_golden():
    """F2 MERGE: newest (download_date, warc_ts) per url_hash wins with
    the url tie-break — the exact ordering of extract.with_is_current;
    the source dedups the delta to one row per key first (Iceberg MERGE
    rejects multi-row matches)."""
    from newscrawler_spark.operators import store_iceberg as SI

    sql = SI.merge_articles_sql("crawl.state")
    assert "MERGE INTO crawl.state.articles_current t" in sql
    assert ("PARTITION BY url_hash" in sql
            and "ORDER BY download_date DESC, warc_ts DESC, url ASC" in sql
            and "WHERE __rn = 1" in sql)
    assert "WHEN MATCHED AND (s.download_date > t.download_date" in sql
    assert ("(s.download_date = t.download_date" in sql
            and "AND s.warc_ts > t.warc_ts)) THEN UPDATE SET *" in sql)
    assert "WHEN NOT MATCHED THEN INSERT *" in sql


def test_iceberg_compact_statements_golden():
    """compact_seen folds COMMITTED deltas only (subselect on rounds),
    carries MIN(fetch_round) as first_round for as-of reads, and drops
    folded partitions in a separate (crash-ordering-safe) snapshot."""
    from newscrawler_spark.operators import store_iceberg as SI

    sql = SI.compact_merge_sql("crawl.state", 9)
    assert "MERGE INTO crawl.state.seen_base t" in sql
    assert "MIN(fetch_round) AS first_round" in sql
    assert "WHERE fetch_round <= 9" in sql
    assert "fetch_round IN" in sql and "SELECT round FROM crawl.state.rounds" in sql
    assert "WHEN NOT MATCHED THEN INSERT *" in sql
    assert "WHEN MATCHED" not in sql.replace("WHEN NOT MATCHED", "")
    assert SI.compact_drop_deltas_sql("crawl.state", 9) == (
        "DELETE FROM crawl.state.seen_delta WHERE fetch_round <= 9"
    )


def test_iceberg_evict_statements_golden():
    """F1 evict-to-recrawl fold: at compaction, base keys whose latest
    COMMITTED tombstone ties-or-beats their latest COMMITTED add are
    deleted (ties go to the tombstone — the read rule keeps a key only
    when add_round is STRICTLY greater); folded tombstone partitions are
    dropped in a separate snapshot afterwards."""
    from newscrawler_spark.operators import store_iceberg as SI

    sql = SI.compact_apply_evictions_sql("crawl.state", 9)
    assert "DELETE FROM crawl.state.seen_base WHERE url_hash IN" in sql
    assert "MAX(fetch_round) AS le" in sql and "FROM crawl.state.seen_evict" in sql
    assert "MAX(fetch_round) AS la" in sql and "FROM crawl.state.seen_delta" in sql
    # committed-rounds guard on BOTH sides (torn tombstones must not
    # delete, torn adds must not protect)
    assert sql.count("fetch_round IN (SELECT round FROM crawl.state.rounds)") == 2
    assert sql.count("WHERE fetch_round <= 9") == 2
    assert "WHERE a.url_hash IS NULL OR e.le >= a.la" in sql
    assert SI.compact_drop_evictions_sql("crawl.state", 9) == (
        "DELETE FROM crawl.state.seen_evict WHERE fetch_round <= 9"
    )
