"""Streaming Common-Crawl ingest: WARC shards → pages corpus, exactly-once.

A landing directory of ``.warc.gz`` shards is consumed by the
file-stream source (checkpointed source log: each shard is parsed
exactly once, only NEW files per trigger, restart-safe) through the
SAME member/record parser the batch reader uses
(`sources/warc.py::_parse_shard_batches`), and appended to a parquet
pages corpus through the file-sink commit log (``_spark_metadata`` —
readers see only committed files, so a crash mid-batch never exposes a
torn corpus).

Scale shape: at Common Crawl scale the crawl's input arrives as
thousands of shards per hour in an object-store landing prefix; this is
the stage that turns that prefix into the corpus table the frontier
fetch-joins against. Work per trigger is O(new shards), embarrassingly
parallel over shards, and the only driver state is the source/sink
logs under the checkpoint dir.
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def stream_warc_ingest(
    spark: SparkSession,
    shard_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
    provenance: bool = True,
):
    """Start the ingest query; returns the StreamingQuery.

    Output rows are the canonical pages projection
    ``(url, warc_ts, html, lang)`` — the same frame `pages_from_warc`
    produces in batch, so `spark.read.parquet(out_dir)` is a valid
    corpus for `runner.run_crawl` with no further staging.

    ``provenance=True`` (default) keeps the record's WARC coordinates
    ``(warc_file, warc_offset, warc_length)`` as three cheap extra
    columns — a built-in CDX: any later recrawl/re-extract can
    `sources.warc.read_ranged` the ORIGINAL bytes straight from the
    landing shards without rescanning them.
    """
    from newscrawler_spark.sources.warc import (
        READ_SCHEMA,
        _parse_shard_batches,
    )

    reader = spark.readStream.format("binaryFile").schema(
        "path string, modificationTime timestamp, length long, "
        "content binary"
    ).option("pathGlobFilter", "*.warc.gz")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.load(shard_dir)

    recs = files.select("path", "content").mapInPandas(
        lambda it: _parse_shard_batches(it), READ_SCHEMA
    )
    cols = ["url", "warc_ts", "html", "lang"] + (
        ["warc_file", "warc_offset", "warc_length"] if provenance else []
    )
    pages = recs.select(*cols)

    writer = (
        pages.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime="30 seconds")
    return writer.start()
