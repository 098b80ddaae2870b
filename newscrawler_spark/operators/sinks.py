"""Storage sinks + savepath templating (SURVEY.md §3 A7–A9, H1).

Reference parity (symbol cites; mount empty, SURVEY.md §0):

- H1 savepath templating ≙ ``newscrawler/helper_classes/savepath_parser.py
  :: SavepathParser`` — ``%md5_url(...)``, ``%domain(...)``,
  ``%timestamp_download``, ``%max_url_file_name`` patterns rendered into
  local file paths. Here the path is a COLUMN (pure Catalyst exprs), not a
  filesystem layout — the store stays columnar; the template string is
  compiled once.
- A8/A9 html/json file sinks ≙ ``newscrawler/pipeline/pipelines.py ::
  HtmlFileStorage / JsonFileStorage`` — re-expressed as partitioned
  parquet/json dataset writes carrying the rendered ``local_path`` column.
- A7 download-list source ≙ ``…/spiders/download_crawler.py ::
  DownloadCrawler`` — an explicit URL list unioned into the frontier at
  seed priority with dedup.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from newscrawler_spark.functions.discover_core import PRIO_SEED
from newscrawler_spark.operators import frontier as FR

_TOKEN_RE = re.compile(
    r"%(md5_url|domain|timestamp_download|time_execution|url_file_name|"
    r"max_url_file_name)"
)

MAX_FILENAME = 255  # classic FS component limit the reference truncates to


def savepath_expr(template: str, url_col: str = "url",
                  download_col: str = "download_date",
                  execution_ts: "str | None" = None) -> Column:
    """H1 — compile a savepath template into ONE concat expression.

    Supported tokens: ``%md5_url`` ``%domain`` ``%timestamp_download``
    ``%url_file_name`` ``%max_url_file_name`` (basename truncated to the
    filesystem limit). Everything stays inside whole-stage codegen.

    Edge rules: an empty template renders as '' (not IndexError), and a
    URL ending in '/' falls back to ``index`` + the url md5 for its
    basename (the reference's name-from-url behavior never emits an
    empty file name).
    """

    def basename() -> Column:
        raw = F.element_at(F.split(F.col(url_col), "/"), -1)
        return F.when(
            raw == "", F.concat(F.lit("index-"), F.md5(F.col(url_col)))
        ).otherwise(raw)

    parts: list[Column] = []
    pos = 0
    for m in _TOKEN_RE.finditer(template):
        if m.start() > pos:
            parts.append(F.lit(template[pos : m.start()]))
        tok = m.group(1)
        if tok == "md5_url":
            parts.append(F.md5(F.col(url_col)))
        elif tok == "domain":
            from newscrawler_spark.functions.canon import host_expr

            parts.append(host_expr(url_col))
        elif tok == "timestamp_download":
            parts.append(F.date_format(F.col(download_col), "yyyyMMddHHmmss"))
        elif tok == "time_execution":
            # job-start wall time, fixed per run (reference: SavepathParser
            # %time_execution) — a literal so every row shares one value
            import datetime as _dt

            ts = execution_ts or _dt.datetime.now().strftime("%Y%m%d%H%M%S")
            parts.append(F.lit(ts))
        elif tok == "url_file_name":
            parts.append(basename())
        elif tok == "max_url_file_name":
            parts.append(F.substring(basename(), 1, MAX_FILENAME))
        pos = m.end()
    if pos < len(template):
        parts.append(F.lit(template[pos:]))
    if not parts:
        return F.lit("")
    return F.concat(*parts) if len(parts) > 1 else parts[0]


def write_articles_json(articles: DataFrame, out_dir: str,
                        template: str = "%domain/%md5_url.json") -> None:
    """A9 — extracted records as a JSON dataset with rendered paths.

    One JSON dataset (splittable, partitioned by source_domain) instead of
    the reference's file-per-article — same information, object-store
    friendly at 10^10 files where one-file-per-article is operationally
    impossible.
    """
    (
        articles.withColumn("local_path", savepath_expr(template))
        .write.mode("overwrite")
        .partitionBy("source_domain")
        .json(out_dir)
    )


def write_html_store(fetched: DataFrame, out_dir: str,
                     template: str = "%domain/%md5_url.html") -> None:
    """A8 — raw html keyed by rendered path (binary-safe parquet)."""
    (
        fetched.select(
            "url", "url_hash", "html",
            savepath_expr(template).alias("local_path"),
            F.col("warc_ts").alias("download_date"),
        )
        .write.mode("overwrite")
        .parquet(out_dir)
    )


def download_list_frontier(urls_df: DataFrame, url_col: str = "url") -> DataFrame:
    """A7 — explicit URL list → frontier rows at seed priority.

    ``DownloadCrawler`` semantics: no recursion (seed_host = own host,
    crawler 'download' suppresses link-following in discovery), dedup by
    canonical hash.
    """
    e = FR.enrich_urls(urls_df.select(F.col(url_col).alias("url")), "url")
    rows = e.select(
        "url", "url_canon", "url_hash", "host",
        F.lit(PRIO_SEED).alias("priority"),
        F.lit(0).alias("depth"),
        F.lit(0).alias("discovered_round"),
        F.col("host").alias("seed_host"),
        F.lit(0).alias("retry"),
    )
    return FR.dedup_in_batch(rows)
