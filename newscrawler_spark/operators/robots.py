"""robots.txt operators: rule-table build + broadcast gate (A4/B9).

Reference parity: scrapy ``RobotsTxtMiddleware`` keeps one robots parser
per netloc and silently drops disallowed requests; the reference's sitemap
spider additionally reads ``Sitemap:`` lines out of robots.txt
(``newscrawler/helper_classes/url_extractor.py :: UrlExtractor
.sitemap_check`` — symbol cite, mount empty, SURVEY.md §0).

Spark shape (the north rule's "robots.txt rules broadcast as a parsed rule
table"): robots bodies live in the corpus as ordinary rows → one
``mapInPandas`` pass parses them into a flat ``robots_rules`` DataFrame
(a few rules per host → tiny even for 10^7 hosts ≈ O(GB), broadcastable in
shards; at test scale one broadcast). The gate is then a pure-Catalyst
broadcast join + longest-prefix window — SQL-expressible, so the DuckDB
oracle can verify it (SURVEY.md §6.3 item 5).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from newscrawler_spark.functions.extract_core import decode_html
from newscrawler_spark.functions.robots_core import parse_robots_body

ROBOTS_RULES_SCHEMA = (
    "host string, user_agent string, path_prefix string, "
    "allow boolean, rule_order int, crawl_delay double"
)
SITEMAPS_SCHEMA = "host string, sitemap_url string"


def _parse_batches(it: Iterator[pd.DataFrame], emit: str) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rules_rows, sm_rows = [], []
        for host, blob in zip(pdf["host"], pdf["html"]):
            body = decode_html(blob)
            rules, sitemaps = parse_robots_body(host, body)
            rules_rows.extend(
                (r.host, r.user_agent, r.path_prefix, r.allow, r.rule_order, r.crawl_delay)
                for r in rules
            )
            sm_rows.extend((host, u) for u in sitemaps)
        if emit == "rules":
            yield pd.DataFrame(
                rules_rows,
                columns=["host", "user_agent", "path_prefix", "allow", "rule_order", "crawl_delay"],
            )
        else:
            yield pd.DataFrame(sm_rows, columns=["host", "sitemap_url"])


def _robots_pages(pages_enriched: DataFrame) -> DataFrame:
    """Filter pushed to the scan: only /robots.txt rows reach Python."""
    return pages_enriched.where(
        F.col("url_canon").endswith("/robots.txt")
    ).select("host", "html")


def build_robots_rules(pages_enriched: DataFrame) -> DataFrame:
    """A4 — parse robots bodies → flat rule table (broadcast by the gate)."""
    return _robots_pages(pages_enriched).mapInPandas(
        lambda it: _parse_batches(it, "rules"), schema=ROBOTS_RULES_SCHEMA
    )


def robots_sitemaps(pages_enriched: DataFrame) -> DataFrame:
    """C3 — ``Sitemap:`` declarations per host (bootstrap for sitemap crawls)."""
    return _robots_pages(pages_enriched).mapInPandas(
        lambda it: _parse_batches(it, "sitemaps"), schema=SITEMAPS_SCHEMA
    )


def url_path_expr(url_canon):
    """path+query of a canonical url — native regexp (matches
    functions.robots_core.url_path)."""
    c = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    p = F.regexp_extract(c, r"^[a-z][a-z0-9+.\-]*://[^/]*(/.*)?$", 1)
    return F.when(p == "", F.lit("/")).otherwise(p)


def robots_gate(
    frontier: DataFrame, robots_rules: DataFrame, user_agent: str = "*"
) -> DataFrame:
    """B9 — drop robots-disallowed urls; pure Catalyst, broadcast join.

    Longest-matching-prefix wins; on a length tie Allow wins; hosts with
    no matching rule (or no robots.txt at all) default to allowed —
    exactly :func:`newscrawler_spark.functions.robots_core.allowed_py`
    (group selection: exact UA match preferred, else ``*``; both engine
    and oracle lower-case the UA).
    """
    ua = user_agent.lower()
    grp = robots_rules.where(F.col("user_agent").isin(ua, "*"))
    # exact-UA group preferred per host when present
    has_exact = (
        grp.where(F.col("user_agent") == ua).select("host").distinct()
        .withColumn("__exact", F.lit(True))
    )
    grp = (
        grp.join(F.broadcast(has_exact), "host", "left")
        .where((F.col("user_agent") == ua) | F.col("__exact").isNull())
        .drop("__exact")
        .where(F.col("path_prefix") != "")  # delay-only marker rows don't match
    )

    # SHUFFLE-FREE form: fold each host's rules into one array row, bring
    # it to the frontier row via a broadcast equi-join (no exchange), and
    # decide longest-prefix/Allow-wins with scalar array expressions —
    # the join+window formulation costs a full shuffle per gate call.
    rules_by_host = grp.groupBy(F.col("host").alias("__rhost")).agg(
        F.collect_list(
            F.struct(
                F.col("path_prefix").alias("p"),
                F.col("allow").alias("a"),
                F.col("rule_order").alias("o"),
            )
        ).alias("__rules")
    )
    fr = frontier.withColumn("__path", url_path_expr("url_canon"))
    identity_cols = list(frontier.columns)
    joined = fr.join(
        F.broadcast(rules_by_host), fr["host"] == F.col("__rhost"), "left"
    )
    matched = F.filter(
        F.coalesce(F.col("__rules"), F.array()),
        lambda r: F.col("__path").startswith(r["p"]),
    )
    # max by (prefix length, allow): longest prefix wins; on a length tie
    # allow=true > allow=false (struct comparison is lexicographic)
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                F.length(r["p"]).alias("l"), r["a"].alias("a")
            ),
        )
    )
    return (
        joined.withColumn("__best", best)
        .where(F.col("__best").isNull() | F.col("__best")["a"])  # no match → allowed
        .select(identity_cols)
    )


def host_crawl_delays(robots_rules: DataFrame, user_agent: str = "*") -> DataFrame:
    """Per-host crawl delay (seconds) for the politeness budget (B8)."""
    ua = user_agent.lower()
    return (
        robots_rules.where(F.col("user_agent").isin(ua, "*"))
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )
