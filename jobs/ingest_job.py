"""spark-submit entry point for the streaming WARC ingest stage.

Turns an object-store landing prefix of Common-Crawl-style ``.warc.gz``
shards into the parquet pages corpus the crawl fetch-joins against —
exactly once per shard across restarts (file-source/sink commit logs
under --checkpoint-dir).

Package and run:

    cd /root/repo && zip -r /tmp/newscrawler_spark.zip newscrawler_spark
    spark-submit --py-files /tmp/newscrawler_spark.zip \\
        jobs/ingest_job.py \\
        --shards s3://bucket/cc_landing \\
        --out s3://bucket/pages_corpus \\
        --checkpoint-dir s3://bucket/ingest_ckpt \\
        --continuous --max-files-per-trigger 64

Default is one availableNow drain (batch-style catch-up, exits when the
landing prefix is consumed); --continuous keeps the query running on a
30 s trigger for always-on ingest.
"""

from __future__ import annotations

import argparse
import json


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="newscrawler_spark WARC ingest")
    p.add_argument("--shards", required=True,
                   help="landing dir/prefix of .warc.gz shards")
    p.add_argument("--out", required=True, help="pages corpus output path")
    p.add_argument("--checkpoint-dir", required=True)
    p.add_argument("--continuous", action="store_true",
                   help="run forever on a 30s trigger (default: one "
                        "availableNow drain, then exit)")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    p.add_argument("--no-provenance", action="store_true",
                   help="drop the (warc_file, warc_offset, warc_length) "
                        "CDX provenance columns")
    p.add_argument("--master", default=None,
                   help="override master (tests); spark-submit sets it")
    return p.parse_args(argv)


def main(argv=None) -> None:
    args = parse_args(argv)

    from pyspark.sql import SparkSession

    from newscrawler_spark.session import get_spark
    from newscrawler_spark.streaming.ingest import stream_warc_ingest

    # getOrCreate may hand back a session the caller owns (tests); only
    # stop what this job itself created
    preexisting = SparkSession.getActiveSession()
    spark = get_spark(master=args.master, app_name="warc-ingest")
    q = stream_warc_ingest(
        spark,
        args.shards,
        args.out,
        args.checkpoint_dir,
        available_now=not args.continuous,
        max_files_per_trigger=args.max_files_per_trigger,
        provenance=not args.no_provenance,
    )
    q.awaitTermination()
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"ingested_rows": n, "out": args.out}))
    if preexisting is None:
        spark.stop()


if __name__ == "__main__":
    main()
