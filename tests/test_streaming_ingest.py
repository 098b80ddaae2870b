"""Streaming WARC ingest (A12 × G1): shards landing in a directory are
parsed exactly once into a pages corpus — across a query restart — and
the ingested corpus is byte-identical to the batch reader's view."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.sources.warc import write_warc
from newscrawler_spark.streaming.ingest import stream_warc_ingest


def _md5_set(df):
    return {
        (r["url"], r["h"], r["ts"], r["lang"])
        for r in df.select(
            "url", F.md5("html").alias("h"),
            F.col("warc_ts").cast("string").alias("ts"), "lang",
        ).collect()
    }


@pytest.mark.slow
def test_ingest_exactly_once_across_restart(spark, smoke_pages_pd, tmp_path):
    pages = spark.createDataFrame(smoke_pages_pd.head(90))
    wave_a = pages.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 0)
    wave_b = pages.where(F.pmod(F.xxhash64("url"), F.lit(2)) == 1)

    land = str(tmp_path / "landing")
    out = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    # wave A shards land; one availableNow pass drains them
    write_warc(wave_a, land, records_per_file=10).collect()
    q = stream_warc_ingest(spark, land, out, ckpt)
    q.awaitTermination(120)
    got_a = spark.read.parquet(out)
    assert _md5_set(got_a) == _md5_set(
        wave_a.select("url", "warc_ts", "html", "lang"))

    # wave B lands; a RESTARTED query (same checkpoint) must process
    # only the new shards — wave A rows appear exactly once in the end
    write_warc(wave_b, land + "/wave_b", records_per_file=10).collect()
    import glob
    import shutil

    for f in glob.glob(land + "/wave_b/*.warc.gz"):
        shutil.move(f, land + "/b_" + f.rsplit("/", 1)[1])
    q2 = stream_warc_ingest(spark, land, out, ckpt)
    q2.awaitTermination(120)

    got = spark.read.parquet(out)
    assert got.count() == 90  # no duplicates: A parsed once, B once
    assert _md5_set(got) == _md5_set(
        pages.select("url", "warc_ts", "html", "lang"))

    # built-in CDX provenance: ranged-fetch originals from the landing
    # shards using ONLY the ingested coordinates — byte-identical
    from newscrawler_spark.sources.warc import read_ranged

    sample = got.where(F.pmod(F.xxhash64("url"), F.lit(9)) == 0)
    n_sample = sample.count()
    assert n_sample > 0
    back = read_ranged(
        spark, sample.select("warc_file", "warc_offset", "warc_length")
    )
    j = back.select("url", F.md5("html").alias("h2")).join(
        sample.select("url", F.md5("html").alias("h1")), "url", "full_outer"
    )
    assert j.where(
        F.col("h1").isNull() | F.col("h2").isNull()
        | (F.col("h1") != F.col("h2"))
    ).count() == 0


def test_ingest_tolerates_corrupt_shard(spark, smoke_pages_pd, tmp_path):
    """A garbage file in the landing dir yields zero rows — the query
    completes and the good shards still ingest."""
    pages = spark.createDataFrame(smoke_pages_pd.head(10))
    land = str(tmp_path / "land")
    write_warc(pages, land, records_per_file=5).collect()
    with open(land + "/zz_corrupt.warc.gz", "wb") as f:
        f.write(b"\x1f\x8b\x08 this is not a valid gzip member at all")
    out = str(tmp_path / "corpus")
    q = stream_warc_ingest(spark, land, out, str(tmp_path / "ck"))
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 10
