"""Sinks + savepath templating (A7-A9, H1)."""

from __future__ import annotations

import hashlib
from datetime import datetime

from pyspark.sql import functions as F

from newscrawler_spark.operators.sinks import (
    download_list_frontier,
    savepath_expr,
    write_articles_json,
)


def test_savepath_expr(spark):
    df = spark.createDataFrame(
        [("http://www.Example.com/a/story-1", datetime(2016, 5, 1, 12, 30, 45))],
        "url string, download_date timestamp",
    )
    r = df.select(
        savepath_expr("%domain/%timestamp_download/%md5_url.html").alias("p"),
        savepath_expr("x/%max_url_file_name").alias("q"),
    ).first()
    md5 = hashlib.md5(b"http://www.Example.com/a/story-1").hexdigest()
    assert r.p == f"example.com/20160501123045/{md5}.html"
    assert r.q == "x/story-1"


def test_savepath_plan_is_jvm_only(spark):
    df = spark.createDataFrame(
        [("http://e.com/a", datetime(2016, 5, 1))], "url string, download_date timestamp"
    )
    plan = df.select(savepath_expr("%domain/%md5_url"))._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_download_list_frontier(spark):
    urls = spark.createDataFrame(
        [("http://a.example/x",), ("HTTP://WWW.A.example:80/x#f",), ("http://b.example/y",)],
        "url string",
    )
    rows = download_list_frontier(urls).collect()
    assert len(rows) == 2  # variants collapse
    assert all(r.priority == 100 and r.depth == 0 for r in rows)
    assert {r.host for r in rows} == {"a.example", "b.example"}


def test_write_articles_json(spark, tmp_path):
    arts = spark.createDataFrame(
        [("http://a.example/x", "a.example", "t", "body", datetime(2016, 5, 1))],
        "url string, source_domain string, article_title string, "
        "article_text string, download_date timestamp",
    )
    out = str(tmp_path / "json_out")
    write_articles_json(arts, out)
    back = spark.read.json(out)
    r = back.first()
    assert r.article_text == "body"
    assert r.local_path.endswith(".json") and r.local_path.count("/") >= 0


def test_savepath_edge_cases(spark):
    """Empty template renders '' (no IndexError); a trailing-slash URL
    gets a deterministic index-<md5> basename instead of ''."""
    from newscrawler_spark.operators.sinks import savepath_expr

    df = spark.createDataFrame(
        [("http://h.example/a/",)], "url string"
    ).withColumn("download_date", F.current_timestamp())
    p = df.select(savepath_expr("%url_file_name").alias("p")).first().p
    assert p.startswith("index-") and len(p) > len("index-")
    pm = df.select(savepath_expr("%max_url_file_name").alias("p")).first().p
    assert pm == p
    p2 = df.select(savepath_expr("").alias("p")).first().p
    assert p2 == ""
