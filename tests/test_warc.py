"""WARC source/sink (A12): byte-identical round trip, member framing,
truncation tolerance, CDX ranged re-read."""

from __future__ import annotations

import gzip
import hashlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from newscrawler_spark.sources.warc import (
    cdx_index,
    encode_response_record,
    gzip_member,
    iter_members,
    list_shards,
    parse_records,
    parse_warc_bytes,
    read_record_at,
    read_warc,
    write_warc,
)


def _mk(url="https://a.example/x", date="2016-05-01T00:00:10Z",
        payload=b"<html>hi</html>"):
    return encode_response_record(url, date, payload)


def test_record_roundtrip_unit():
    rec = list(parse_records(_mk(payload=b"abc\r\n\r\ndef")))
    assert len(rec) == 1
    r = rec[0]
    assert r["url"] == "https://a.example/x"
    assert r["warc_type"] == "response"
    assert r["http_status"] == 200
    assert r["mime"] == "text/html; charset=utf-8"
    # payload byte-identical even when it contains the header delimiter
    assert r["html"] == b"abc\r\n\r\ndef"
    assert r["record_id"].startswith("<urn:uuid:")


def test_multi_member_and_plain():
    a, b = _mk(url="https://a/1", payload=b"one"), _mk(url="https://a/2", payload=b"two")
    # gzip: one member per record
    gz = gzip_member(a) + gzip_member(b)
    recs = list(parse_warc_bytes(gz))
    assert [r["html"] for r in recs] == [b"one", b"two"]
    assert recs[0]["warc_offset"] == 0
    assert recs[1]["warc_offset"] == len(gzip_member(a))
    # plain: concatenated uncompressed records in one "member"
    recs2 = list(parse_warc_bytes(a + b))
    assert [r["html"] for r in recs2] == [b"one", b"two"]


def test_truncated_tail_degrades_not_raises():
    a, b = _mk(url="https://a/1", payload=b"one"), _mk(url="https://a/2", payload=b"two")
    gz = gzip_member(a) + gzip_member(b)
    for cut in (len(gz) - 7, len(gz) - len(gzip_member(b)) + 5):
        recs = list(parse_warc_bytes(gz[:cut]))
        assert [r["html"] for r in recs] == [b"one"]
    # truncated plain record: complete records before it stand
    recs = list(parse_records(a + b[: len(b) - 10]))
    assert [r["html"] for r in recs] == [b"one"]
    # deterministic writer bytes (mtime pinned)
    assert gzip_member(a) == gzip.compress(a, compresslevel=6, mtime=0)


def test_spark_roundtrip_byte_identical(spark, smoke_pages_pd, tmp_path):
    pages = spark.createDataFrame(smoke_pages_pd.head(120))
    out = str(tmp_path / "warc")
    manifest = write_warc(pages, out, records_per_file=25)
    m = manifest.collect()
    assert sum(r.n_records for r in m) == 120
    assert len(list_shards(out)) == len(m)

    back = read_warc(spark, out + "/*.warc.gz")
    j = (
        back.select("url", F.md5(F.col("html")).alias("h2"),
                    F.col("warc_ts").alias("ts2"))
        .join(
            pages.select("url", F.md5(F.col("html")).alias("h1"),
                         F.col("warc_ts").alias("ts1")),
            "url", "full_outer",
        )
    )
    assert j.where(
        F.col("h1").isNull() | F.col("h2").isNull()
        | (F.col("h1") != F.col("h2")) | (F.col("ts1") != F.col("ts2"))
    ).count() == 0


def test_cdx_ranged_reread(spark, smoke_pages_pd, tmp_path):
    pages = spark.createDataFrame(smoke_pages_pd.head(40))
    out = str(tmp_path / "warc")
    write_warc(pages, out, records_per_file=10).collect()
    parsed = read_warc(spark, out + "/*.warc.gz")
    cdx = cdx_index(parsed)
    assert cdx.columns == ["url", "warc_file", "warc_offset", "warc_length"]
    rows = cdx.orderBy("url").limit(5).collect()
    want = {
        r["url"]: hashlib.md5(bytes(r["html"])).hexdigest()
        for r in parsed.where(
            F.col("url").isin([x.url for x in rows])
        ).collect()
    }
    for x in rows:
        rec = read_record_at(x.warc_file, x.warc_offset, x.warc_length)
        assert rec["url"] == x.url
        assert hashlib.md5(rec["html"]).hexdigest() == want[x.url]


@settings(max_examples=200, deadline=None)
@given(
    payloads=st.lists(
        st.binary(min_size=0, max_size=400), min_size=1, max_size=6
    ),
    urls=st.lists(
        st.text(
            alphabet=st.characters(
                codec="ascii", min_codepoint=33, max_codepoint=126
            ),
            min_size=1, max_size=40,
        ),
        min_size=6, max_size=6,
    ),
    lang=st.sampled_from([None, "eng", "deu,eng"]),
)
def test_framing_property_roundtrip(payloads, urls, lang):
    """Any payload bytes — including ones embedding the CRLFCRLF header
    delimiter, gzip magic, or WARC/1.0 banners — survive encode → gzip
    member concat → parse byte-identically, in order, with headers
    recovered."""
    recs = [
        encode_response_record(
            "https://p.example/" + u, "2016-05-01T00:00:10Z", body,
            lang=lang,
        )
        for u, body in zip(urls, payloads)
    ]
    blob = b"".join(gzip_member(r) for r in recs)
    out = list(parse_warc_bytes(blob))
    assert [r["html"] for r in out] == payloads
    assert [r["url"] for r in out] == [
        "https://p.example/" + u for u in urls[: len(payloads)]
    ]
    for r in out:
        assert r["http_status"] == 200 and r["lang"] == lang
    # plain (uncompressed) concatenation parses identically
    out2 = list(parse_records(b"".join(recs)))
    assert [r["html"] for r in out2] == payloads


def test_read_ranged_distributed(spark, smoke_pages_pd, tmp_path):
    """Distributed CDX ranged fetch ≡ full-scan-then-filter, for a
    subset spanning several shards."""
    from newscrawler_spark.sources.warc import read_ranged

    pages = spark.createDataFrame(smoke_pages_pd.head(60))
    out = str(tmp_path / "warc")
    write_warc(pages, out, records_per_file=13).collect()
    parsed = read_warc(spark, out + "/*.warc.gz")
    sub = cdx_index(parsed).where(
        F.pmod(F.xxhash64("url"), F.lit(3)) == 0
    )
    n_sub = sub.count()
    assert 0 < n_sub < 60
    assert sub.select("warc_file").distinct().count() > 1

    fetched = read_ranged(
        spark, sub.select("warc_file", "warc_offset", "warc_length")
    )
    key = ["url", "record_id", "lang", "h", "ts"]

    def proj(df):
        return df.select(
            "url", "record_id", "lang",
            F.md5("html").alias("h"), F.col("warc_ts").alias("ts"),
        )

    want = proj(parsed.join(sub.select("url"), "url", "left_semi"))
    assert fetched.count() == n_sub
    assert proj(fetched).join(want, key, "left_anti").count() == 0
    assert want.join(proj(fetched), key, "left_anti").count() == 0


def test_read_record_at_rejects_multi(tmp_path):
    gz = gzip_member(_mk(url="https://a/1")) + gzip_member(_mk(url="https://a/2"))
    p = tmp_path / "two.warc.gz"
    p.write_bytes(gz)
    with pytest.raises(ValueError):
        read_record_at(str(p), 0, len(gz))


def test_lang_header_roundtrip(spark, smoke_pages_pd, tmp_path):
    pages = spark.createDataFrame(smoke_pages_pd.head(30))
    assert pages.where(F.col("lang").isNotNull()).count() == 30
    out = str(tmp_path / "warc")
    write_warc(pages, out, records_per_file=10).collect()
    back = read_warc(spark, out + "/*.warc.gz")
    j = back.select("url", F.col("lang").alias("l2")).join(
        pages.select("url", F.col("lang").alias("l1")), "url", "full_outer"
    )
    assert j.where(
        F.col("l1").isNull() | F.col("l2").isNull()
        | (F.col("l1") != F.col("l2"))
    ).count() == 0
    # a record written without the header parses lang as null
    rec = list(parse_records(_mk()))[0]
    assert rec["lang"] is None
    # and a frame without a lang column still writes (header omitted)
    out2 = str(tmp_path / "warc2")
    write_warc(pages.drop("lang").limit(5), out2).collect()
    assert read_warc(spark, out2 + "/*.warc.gz").where(
        F.col("lang").isNotNull()
    ).count() == 0


def test_pages_from_warc_is_a_crawlable_corpus(spark, smoke_pages_pd, tmp_path):
    """A Common-Crawl-style WARC directory is a valid corpus for the
    engine's own prep stage — no parquet staging step in between."""
    from newscrawler_spark.runner import enrich_pages
    from newscrawler_spark.sources.warc import pages_from_warc

    pages = spark.createDataFrame(smoke_pages_pd.head(50))
    out = str(tmp_path / "warc")
    write_warc(pages, out, records_per_file=20).collect()
    corpus = pages_from_warc(spark, out + "/*.warc.gz")
    assert corpus.columns == ["url", "warc_ts", "html", "lang"]
    e = enrich_pages(corpus)
    got = {
        r["url"]: (r["url_hash"], r["host"], r["html_bytes"], r["lang"])
        for r in e.collect()
    }
    want = enrich_pages(pages.select("url", "warc_ts", "html", "lang"))
    for r in want.collect():
        assert got[r["url"]] == (
            r["url_hash"], r["host"], r["html_bytes"], r["lang"]
        )


@pytest.mark.slow
def test_crawl_over_warc_corpus_identical(spark, smoke_pages, smoke_seeds,
                                          tmp_path):
    """North-star shape: the crawl runs DIRECTLY over Common-Crawl-style
    WARC shards and produces the identical fetch log, seen set, and
    extracted article text as the same corpus served from parquet."""
    import tempfile

    from newscrawler_spark.config import CrawlConfig
    from newscrawler_spark.runner import run_crawl
    from newscrawler_spark.sources.warc import pages_from_warc

    out = str(tmp_path / "warc")
    write_warc(smoke_pages, out, records_per_file=100).collect()
    corpus = pages_from_warc(spark, out + "/*.warc.gz")

    cfg = CrawlConfig(per_host_budget=8)

    def crawl(pages):
        with tempfile.TemporaryDirectory() as d:
            res = run_crawl(spark, pages, smoke_seeds, d, cfg, max_rounds=3)
            log = [
                (r.fetch_round, r.host, r.rank_in_host, r.url_canon)
                for r in res.state.read_fetch_log()
                .orderBy("fetch_round", "host", "rank_in_host").collect()
            ]
            seen = {r.url_hash for r in res.state.read_seen().collect()}
            arts = {
                r.url_canon: (r.article_title, r.article_text,
                              r.article_language)
                for r in res.state.read_articles().collect()
            }
            return log, seen, arts

    log_w, seen_w, arts_w = crawl(corpus)
    log_p, seen_p, arts_p = crawl(smoke_pages)
    assert log_w == log_p and len(log_w) > 0
    assert seen_w == seen_p
    assert arts_w == arts_p and len(arts_w) > 0


def test_non_response_records_filtered(spark, tmp_path):
    info = (
        b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
        b"WARC-Record-ID: <urn:uuid:0>\r\n"
        b"WARC-Date: 2016-05-01T00:00:00Z\r\n"
        b"Content-Type: application/warc-fields\r\n"
        b"Content-Length: 9\r\n\r\nsoftware\n\r\n\r\n"
    )
    blob = gzip_member(info) + gzip_member(_mk(url="https://a/only"))
    p = tmp_path / "mix.warc.gz"
    p.write_bytes(blob)
    df = read_warc(spark, str(p))
    assert [r.url for r in df.collect()] == ["https://a/only"]
    both = read_warc(spark, str(p), responses_only=False)
    assert both.count() == 2
