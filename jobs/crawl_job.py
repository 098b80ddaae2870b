"""spark-submit entry point for the crawl engine (north rule: ships via
``spark-submit --py-files``).

Package and run:

    cd /root/repo && zip -r /tmp/newscrawler_spark.zip newscrawler_spark
    spark-submit --py-files /tmp/newscrawler_spark.zip \\
        jobs/crawl_job.py \\
        --pages  s3://bucket/pages_parquet_or_iceberg_table \\
        --seeds  s3://bucket/seeds.parquet \\
        --state-dir s3://bucket/crawl_state \\
        --max-rounds 100 --per-host-budget 16 --batch-size 5000000

On a real cluster also pass executor sizing and bump
``spark.sql.shuffle.partitions`` to ~2-3× total cores (see
newscrawler_spark/session.py). Resume is automatic: the job continues
from the last committed round in --state-dir.
"""

from __future__ import annotations

import argparse
import json


def load_pages(spark, path: str, fmt: str = "auto"):
    """--pages loader: parquet or Common-Crawl-style WARC shards.

    ``auto`` picks WARC when the path names ``.warc``/``.warc.gz`` files
    (extension or glob) — works for object-store URIs without listing.
    A directory of shards reads as ``<dir>/*.warc*`` (matches both
    .warc and .warc.gz).
    """
    if fmt == "auto":
        fmt = "warc" if ".warc" in path.rsplit("/", 1)[-1] else "parquet"
    if fmt == "warc":
        from newscrawler_spark.sources.warc import pages_from_warc

        pat = path if ".warc" in path.rsplit("/", 1)[-1] \
            else path.rstrip("/") + "/*.warc*"
        return pages_from_warc(spark, pat)
    return spark.read.parquet(path)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="newscrawler_spark crawl job")
    p.add_argument("--pages", required=True,
                   help="pages corpus: parquet path/table or WARC shards")
    p.add_argument("--pages-format", default="auto",
                   choices=["auto", "parquet", "warc"],
                   help="corpus format (auto: WARC iff the path names "
                        ".warc/.warc.gz files)")
    p.add_argument("--seeds", required=True, help="seeds parquet path")
    p.add_argument("--state-dir", required=True)
    p.add_argument("--max-rounds", type=int, default=100)
    p.add_argument("--per-host-budget", type=int, default=16)
    p.add_argument("--batch-size", type=int, default=None,
                   help="global fetches/round cap (None = per-host only)")
    p.add_argument("--max-depth", type=int, default=3)
    p.add_argument("--run-id", default="run")
    p.add_argument("--no-bloom", action="store_true")
    p.add_argument("--compact-seen-every", type=int, default=8,
                   help="fold the seen-delta ledger into a base table "
                        "every K rounds (0 = never)")
    p.add_argument("--bloom-min-seen-rows", type=int, default=200_000,
                   help="run the Bloom prefilter only once the seen set "
                        "clears this row count (0 = from round one)")
    p.add_argument("--user-agent", default="newscrawler")
    p.add_argument("--master", default=None,
                   help="override master (tests); spark-submit sets it normally")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)

    from newscrawler_spark.config import CrawlConfig
    from newscrawler_spark.runner import run_crawl
    from newscrawler_spark.session import get_spark

    spark = get_spark(master=args.master, app_name=f"crawl-{args.run_id}")
    cfg = CrawlConfig(
        per_host_budget=args.per_host_budget,
        batch_size=args.batch_size,
        max_depth=args.max_depth,
        user_agent=args.user_agent,
        compact_seen_every=args.compact_seen_every,
        bloom_min_seen_rows=args.bloom_min_seen_rows,
    )
    pages = load_pages(spark, args.pages, args.pages_format)
    seeds = spark.read.parquet(args.seeds)
    res = run_crawl(
        spark, pages, seeds, args.state_dir, cfg,
        max_rounds=args.max_rounds, run_id=args.run_id,
        use_bloom=not args.no_bloom,
    )
    counters = res.state.read_counters().collect()
    print(json.dumps({
        "rounds_run": res.rounds_run,
        "final_round": res.final_round,
        "urls_fetched": sum(r.urls_fetched for r in counters),
        "articles_extracted": sum(r.articles_extracted for r in counters),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
