"""url_quality_gate: blocklist precedence, keyword scoring, length rule."""

from __future__ import annotations

from newscrawler_spark.operators.urlfilter import url_quality_gate


def test_url_gate_rules(spark):
    urls = spark.createDataFrame(
        [
            ("http://good.example/news/article-1", "good.example"),
            ("http://bad.example/story", "bad.example"),          # blocklist
            ("http://x.example/free-casino-poker-now", "x.example"),  # 3+2
            ("http://y.example/sex", "y.example"),                # 2 < 3 kept
            ("http://z.example/" + "a" * 2100, "z.example"),      # length
            ("http://bad.example/casino", "bad.example"),   # blocklist wins
        ],
        "url_canon string, host string",
    )
    bl = spark.createDataFrame([("bad.example",)], "host string")
    got = {r["url_canon"].split("/")[2]: r
           for r in url_quality_gate(urls, blocklist=bl).collect()
           if r["host"] != "bad.example"}
    bad = [r for r in url_quality_gate(urls, blocklist=bl).collect()
           if r["host"] == "bad.example"]

    assert got["good.example"]["kept"] and got["good.example"]["url_score"] == 0
    assert got["x.example"]["block_reason"] == "keywords"
    assert got["x.example"]["url_score"] == 5
    assert got["y.example"]["kept"] and got["y.example"]["url_score"] == 2
    assert got["z.example"]["block_reason"] == "length"
    assert all(r["block_reason"] == "blocklist" for r in bad)


def test_url_gate_plan_jvm_only_and_broadcast(spark):
    urls = spark.createDataFrame([("http://a.example/x", "a.example")],
                                 "url_canon string, host string")
    bl = spark.createDataFrame([("b.example",)], "host string")
    plan = url_quality_gate(urls, blocklist=bl)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Broadcast" in plan
