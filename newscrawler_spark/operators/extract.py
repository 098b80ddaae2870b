"""Article extraction map stage (SURVEY.md §3 E1–E8).

The north star's core invariant lives here: extraction is "a pandas/Arrow
UDF map stage over (url, warc_ts, html) rows producing byte-identical
extracted text per url" (BASELINE.json). The semantics are defined once in
:mod:`newscrawler_spark.functions.extract_core` (shared with the
mini-oracle), so partitioning/batching cannot perturb the bytes — and
tests/test_extract.py asserts it.

Reference parity: ``newscrawler/pipeline/extractor/article_extractor.py ::
Extractor`` orchestrating newspaper/readability/date/lang extractors with
per-field comparers (symbol cites; mount empty, SURVEY.md §0).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newscrawler_spark.functions.extract_core import decode_html, extract_article

ARTICLES_SCHEMA = (
    "url string, url_canon string, url_hash long, warc_ts timestamp, "
    "source_domain string, html_title string, article_title string, "
    "article_description string, article_text string, article_author string, "
    "article_publish_date timestamp, article_language string, "
    "article_image string, download_date timestamp"
)


def _extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        rows = []
        for url, canon, h, ts, blob, lang in zip(
            pdf["url"], pdf["url_canon"], pdf["url_hash"], pdf["warc_ts"],
            pdf["html"], pdf["lang"],
        ):
            rec = extract_article(url, decode_html(blob), corpus_lang=lang)
            rows.append(
                (
                    url, canon, h, ts,
                    rec["source_domain"], rec["html_title"], rec["article_title"],
                    rec["article_description"], rec["article_text"],
                    rec["article_author"], rec["article_publish_date"],
                    rec["article_language"], rec["article_image"],
                    ts,  # download_date ≙ corpus capture time (deterministic)
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "url", "url_canon", "url_hash", "warc_ts", "source_domain",
                "html_title", "article_title", "article_description",
                "article_text", "article_author", "article_publish_date",
                "article_language", "article_image", "download_date",
            ],
        )


def extract_articles(gated: DataFrame) -> DataFrame:
    """E1–E8 — one Arrow pass building the full articles record.

    Input needs ``url, url_canon, url_hash, warc_ts, html, lang``; other
    columns are pruned before the Arrow exchange (html stays JVM-side for
    every page that failed the D7 gate — extraction only pays for
    accepted candidates).
    """
    pruned = gated.select("url", "url_canon", "url_hash", "warc_ts", "html", "lang")
    return pruned.mapInPandas(_extract_batches, schema=ARTICLES_SCHEMA)


def articles_as_of(articles: DataFrame, as_of) -> DataFrame:
    """F2 time-travel read: the version of each url that was CURRENT at
    ``as_of`` (latest version with ``download_date <= as_of``) — the
    parquet-backend analog of an Iceberg snapshot-as-of read.

    ``as_of`` is a Column/literal timestamp, or a single-row single-column
    DataFrame (broadcast-joined, so a derived cutoff like
    ``min(download_date)`` joins without ever entering the articles
    plan's driver path). A multi-row cutoff frame would silently
    cartesian-multiply the table, so it is validated loudly (the cutoff
    frame is tiny by contract — evaluating it once for the check is
    negligible). Plan: one filter + the same per-url window as
    with_is_current; versions newer than the cutoff are invisible, urls
    with no version yet are absent.
    """
    if isinstance(as_of, DataFrame):
        if len(as_of.columns) != 1:
            raise ValueError("as_of DataFrame must have exactly one column")
        if len(as_of.limit(2).collect()) != 1:
            raise ValueError("as_of DataFrame must have exactly one row")
        # rename to a reserved internal alias before the join: a caller
        # whose cutoff column happens to collide with an articles column
        # (e.g. aliased 'download_date') would otherwise hit an
        # ambiguous-reference AnalysisException (ADVICE r4)
        cutcol = "__as_of_cutoff"
        filt = (
            articles.join(F.broadcast(as_of.toDF(cutcol)))
            .where(F.col("download_date") <= F.col(cutcol))
            .drop(cutcol)
        )
    else:
        filt = articles.where(F.col("download_date") <= as_of)
    return with_is_current(filt).where("is_current").drop("is_current")


def with_is_current(articles: DataFrame) -> DataFrame:
    """F2 batch form — latest version per url flagged current
    (``row_number() over (partition by url_hash order by download_date
    desc, warc_ts desc)``); the Iceberg backend would MERGE instead."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("url_hash")
        .orderBy(F.desc("download_date"), F.desc("warc_ts"), F.asc("url"))
    )
    return articles.withColumn(
        "is_current", F.row_number().over(w) == 1
    )
