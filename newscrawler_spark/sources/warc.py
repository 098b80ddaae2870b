"""WARC source/sink — Common-Crawl-style corpus ingestion (A12).

The north star's corpus is "Common-Crawl-style web pages"
(BASELINE.json input_hint); Common Crawl publishes that corpus as WARC
(ISO 28500). This module lets the engine READ such a corpus into the
canonical ``pages(url, warc_ts, html, ...)`` shape and WRITE one back,
with zero third-party deps (no warcio): the record grammar is small
enough to express exactly.

Format, as implemented (public spec + Common Crawl conventions):

- A record is ``WARC/1.0 CRLF`` + named header lines (must include
  ``Content-Length``) + ``CRLF`` + content block + ``CRLF CRLF``.
- A *response* record's content block is an HTTP/1.1 message
  (status line + headers + CRLF + payload); the page bytes are the
  HTTP payload, NOT the WARC content block.
- ``.warc.gz``: each record is its OWN gzip member. The concatenation
  is still one valid gzip stream, but any record can be read back with
  a ranged request given (offset, length) — this is exactly how the
  Common Crawl CDX index works, and :func:`cdx_index` /
  :func:`read_record_at` reproduce that contract here.

Scale design (100 TB):

- **Parallelism unit = file.** Common Crawl splits a crawl into ~72k
  files of ~1 GB; ``spark.read.format("binaryFile")`` lists them
  cheaply (a metadata-only scan until the content column is touched)
  and each file parses inside one Arrow-batched ``mapInPandas`` task.
  No page bytes ever visit the driver.
- ``binaryFile`` caps single files at ~2 GB — matching the upstream
  convention of ~1 GB shards; the writer enforces shard size via
  ``records_per_file``.
- The writer emits deterministic bytes (gzip ``mtime=0``, fixed header
  order, md5-derived record ids), so shards are reproducible and
  diffable across runs — the same property FIXTURES.md demands of the
  synthetic corpus.
- Random access: every parsed record carries (warc_file, warc_offset,
  warc_length); :func:`cdx_index` projects the CDX table and
  :func:`read_record_at` performs the single-member ranged read — the
  re-fetch path a 10^10-URL store needs when one article is requested
  (F1/F2) without re-scanning a 1 GB shard.

Driver check: q52 round-trips ``documents`` through the real encoder
and parser; the DuckDB oracle restates every header field closed-form
(contract.py::q52_warc_roundtrip).
"""

from __future__ import annotations

import glob as _glob
import gzip
import hashlib
import os
import zlib
from collections.abc import Iterator
from datetime import datetime, timezone

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CRLF = b"\r\n"
WARC_VERSION = b"WARC/1.0"
_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"

# One schema string per public surface, like PAGES_SCHEMA in fixtures.py.
READ_SCHEMA = (
    "url string, warc_ts timestamp, html binary, lang string, "
    "http_status int, mime string, record_id string, warc_file string, "
    "warc_offset long, warc_length long"
)
MANIFEST_SCHEMA = "warc_file string, n_records long, n_bytes long"
CDX_SCHEMA = "url string, warc_file string, warc_offset long, warc_length long"


def _record_uuid(key: str) -> str:
    """Deterministic RFC-4122-shaped id from md5(key) — reproducible
    shards need reproducible record ids (real uuid4 would break the
    byte-identity the writer promises)."""
    h = hashlib.md5(key.encode()).hexdigest()
    return f"<urn:uuid:{h[0:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"


def encode_response_record(
    url: str,
    date_iso: str,
    payload: bytes,
    status: int = 200,
    mime: str = "text/html; charset=utf-8",
    lang: str | None = None,
) -> bytes:
    """One WARC/1.0 response record, uncompressed. Header order fixed.

    ``lang`` emits ``WARC-Identified-Content-Language`` — the extension
    header Common Crawl stamps on response records since 2018 — so a
    language column survives the round trip without touching payloads.
    """
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {mime}\r\n"
        f"Content-Length: {len(payload)}\r\n\r\n"
    ).encode() + payload
    headers = (
        WARC_VERSION + CRLF
        + b"WARC-Type: response" + CRLF
        + b"WARC-Record-ID: " + _record_uuid(url).encode() + CRLF
        + b"WARC-Date: " + date_iso.encode() + CRLF
        + b"WARC-Target-URI: " + url.encode() + CRLF
        + (
            b"WARC-Identified-Content-Language: " + lang.encode() + CRLF
            if lang else b""
        )
        + b"Content-Type: application/http; msgtype=response" + CRLF
        + b"Content-Length: " + str(len(http)).encode() + CRLF
        + CRLF
    )
    return headers + http + CRLF + CRLF


def gzip_member(record: bytes) -> bytes:
    """One record → one gzip member (mtime=0 for byte-reproducibility)."""
    return gzip.compress(record, compresslevel=6, mtime=0)


def iter_members(data: bytes) -> Iterator[tuple[int, int, bytes]]:
    """Yield (offset, compressed_length, raw_record) per gzip member.

    Accepts plain (uncompressed) WARC too: then the whole buffer is one
    "member" at offset 0 and raw record splitting happens downstream.
    A truncated trailing member is silently dropped — at 100 TB a
    half-written shard tail must degrade to "those records are missing",
    never fail the whole scan (same stance as store.py's torn-commit
    rule and bucketio's torn-spec fallback).
    """
    if not data.startswith(b"\x1f\x8b"):
        yield 0, len(data), data
        return
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            raw = d.decompress(data[pos:])
            raw += d.flush()
        except zlib.error:
            return  # truncated/corrupt tail member
        if not d.eof:
            return  # member ended mid-stream (truncated shard tail)
        consumed = len(data) - pos - len(d.unused_data)
        yield pos, consumed, raw
        pos += consumed


def _split_headers(block: bytes) -> tuple[dict[str, str], bytes]:
    head, _, rest = block.partition(CRLF + CRLF)
    headers: dict[str, str] = {}
    for line in head.split(CRLF)[1:]:  # [0] is the version / status line
        k, _, v = line.partition(b":")
        if v:
            headers[k.decode("latin-1").strip().lower()] = (
                v.decode("latin-1").strip()
            )
    return headers, rest


def parse_records(raw: bytes) -> Iterator[dict]:
    """Parse an uncompressed byte run of ≥1 WARC records.

    Yields dicts with the READ_SCHEMA fields (minus file/offset/length,
    which only the member iterator knows). Non-response records (e.g.
    warcinfo, request) yield with ``http_status=None`` and the raw
    content block as ``html`` so callers can filter on warc_type.
    """
    pos = 0
    n = len(raw)
    while pos < n:
        # skip inter-record CRLFs
        while raw.startswith(CRLF, pos):
            pos += 2
        if pos >= n:
            return
        if not raw.startswith(WARC_VERSION, pos):
            return  # garbage tail — stop, records before it stand
        head_end = raw.find(CRLF + CRLF, pos)
        if head_end < 0:
            return
        headers, _ = _split_headers(raw[pos : head_end + 4])
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            return
        content = raw[head_end + 4 : head_end + 4 + clen]
        if len(content) < clen:
            return  # truncated record
        rec: dict = {
            "warc_type": headers.get("warc-type", ""),
            "record_id": headers.get("warc-record-id", ""),
            "url": headers.get("warc-target-uri", ""),
            "date": headers.get("warc-date", ""),
            "lang": headers.get("warc-identified-content-language"),
            "content_length": clen,
            "http_status": None,
            "mime": None,
            "html": content,
        }
        if rec["warc_type"] == "response" and content.startswith(b"HTTP/"):
            status_line, _, _ = content.partition(CRLF)
            parts = status_line.split(b" ")
            rec["http_status"] = int(parts[1]) if len(parts) > 1 else None
            hh, payload = _split_headers(content)
            rec["mime"] = hh.get("content-type")
            plen = int(hh.get("content-length", len(payload)))
            rec["html"] = payload[:plen]
        yield rec
        pos = head_end + 4 + clen


def parse_warc_bytes(data: bytes, warc_file: str = "") -> Iterator[dict]:
    """Members → records, annotated with (warc_file, offset, length)."""
    for off, length, raw in iter_members(data):
        for rec in parse_records(raw):
            rec["warc_file"] = warc_file
            rec["warc_offset"] = off
            rec["warc_length"] = length
            yield rec


# ---------------------------------------------------------------------------
# DataFrame surfaces
# ---------------------------------------------------------------------------


def read_warc(
    spark: SparkSession, path: str, responses_only: bool = True
) -> DataFrame:
    """``*.warc.gz`` / ``*.warc`` files → DataFrame(READ_SCHEMA).

    binaryFile scan → one Arrow batch per file → pure-Python parse in
    mapInPandas. Filters on path glob and (with AQE) file-count
    coalescing come free; at 100 TB the job is embarrassingly parallel
    over shards and the only driver state is the file listing.

    A trailing ``/<glob>`` component is split off and passed as
    ``pathGlobFilter`` so the load path is a plain directory —
    otherwise Spark's FileStreamSink metadata probe stats the literal
    glob string and dumps a harmless-but-noisy FileNotFoundException
    stack into every bench/driver stderr.
    """
    reader = spark.read.format("binaryFile")
    head, tail = os.path.split(path)
    if head and any(ch in tail for ch in "*?["):
        reader = reader.option("pathGlobFilter", tail)
        path = head
    files = reader.load(path)
    return files.select("path", "content").mapInPandas(
        lambda it: _parse_shard_batches(it, responses_only), READ_SCHEMA
    )


def _parse_shard_batches(
    batches: Iterator[pd.DataFrame], responses_only: bool = True
) -> Iterator[pd.DataFrame]:
    """(path, content) Arrow batches → READ_SCHEMA record batches —
    shared by the batch reader and the streaming ingest (one parser,
    the two paths cannot drift)."""
    for pdf in batches:
        rows = []
        for fpath, data in zip(pdf["path"], pdf["content"]):
            for r in parse_warc_bytes(bytes(data), warc_file=fpath):
                if responses_only and r["warc_type"] != "response":
                    continue
                rows.append(_record_row(r))
        yield pd.DataFrame(rows, columns=_RECORD_COLS)


_RECORD_COLS = [
    "url", "warc_ts", "html", "lang", "http_status", "mime",
    "record_id", "warc_file", "warc_offset", "warc_length",
]


def _record_row(r: dict) -> tuple:
    """One parsed record → one READ_SCHEMA row (shared by read_warc and
    read_ranged so the two read paths cannot drift)."""
    return (
        r["url"],
        datetime.strptime(r["date"], _DATE_FMT).replace(
            tzinfo=timezone.utc
        ) if r["date"] else None,
        r["html"],
        r["lang"],
        r["http_status"],
        r["mime"],
        r["record_id"],
        r["warc_file"],
        r["warc_offset"],
        r["warc_length"],
    )


def write_warc(
    df: DataFrame,
    out_dir: str,
    records_per_file: int = 2000,
    status: int = 200,
    mime: str = "text/html; charset=utf-8",
) -> DataFrame:
    """pages(url, warc_ts, html) → ``part-<partition>-<chunk>.warc.gz``
    shards under ``out_dir``; returns the shard manifest (action runs on
    collect/write of the manifest).

    Executors write with plain ``open`` — correct for local mode and any
    POSIX-shared FS (NFS/Lustre); an object-store deployment would swap
    the two ``open`` calls for the storage client, nothing else changes.
    Shard names are deterministic in (partition, chunk), bytes are
    deterministic in the rows (gzip mtime=0), so re-running a failed
    writer overwrites identical files — idempotent like the store.py
    round commits.
    """
    os.makedirs(out_dir, exist_ok=True)

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        buf: list[bytes] = []
        out: list[tuple[str, int, int]] = []
        chunk = 0

        def flush() -> None:
            nonlocal chunk
            if not buf:
                return
            name = os.path.join(out_dir, f"part-{pid:05d}-{chunk:04d}.warc.gz")
            blob = b"".join(buf)
            tmp = name + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, name)  # commit marker discipline: atomic publish
            out.append((name, len(buf), len(blob)))
            buf.clear()
            chunk += 1

        for pdf in batches:
            langs = pdf["lang"] if "lang" in pdf else [None] * len(pdf)
            for url, ts, html, lang in zip(
                pdf["url"], pdf["warc_ts"], pdf["html"], langs
            ):
                date_iso = pd.Timestamp(ts).strftime(_DATE_FMT)
                buf.append(
                    gzip_member(
                        encode_response_record(
                            url, date_iso, bytes(html), status=status,
                            mime=mime, lang=lang if pd.notna(lang) else None,
                        )
                    )
                )
                if len(buf) >= records_per_file:
                    flush()
        flush()
        yield pd.DataFrame(out, columns=["warc_file", "n_records", "n_bytes"])

    cols = ["url", "warc_ts", "html"] + (["lang"] if "lang" in df.columns else [])
    return df.select(*cols).mapInPandas(_write, MANIFEST_SCHEMA)


def pages_from_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC shards → the canonical ``pages`` projection the crawl
    consumes (runner.run_crawl / enrich_pages): a Common-Crawl-style
    corpus IS a valid corpus for the whole engine, no parquet staging.
    (``text`` — the fixtures' designed ground-truth column — has no WARC
    analog; extraction derives article text from html, so the crawl
    never reads it.)"""
    return read_warc(spark, path).select("url", "warc_ts", "html", "lang")


def cdx_index(parsed: DataFrame) -> DataFrame:
    """The CDX projection of a read_warc() frame: everything a ranged
    re-fetch needs, and nothing blob-sized. Persist this next to the
    shards; at 10^10 records it is the lookup table F1/F2 hit instead
    of re-scanning shards."""
    return parsed.select("url", "warc_file", "warc_offset", "warc_length")


def read_ranged(spark: SparkSession, cdx: DataFrame) -> DataFrame:
    """Distributed CDX ranged fetch: (warc_file, warc_offset,
    warc_length) rows → parsed records, reading ONLY the requested byte
    ranges — never a shard scan. This is how a 100 TB archive serves a
    0.1% re-fetch (F1 recrawl, q53): shuffle is O(requested rows), the
    read is one seek+read per member (object stores: one ranged GET),
    and same-file requests are co-partitioned and offset-sorted so each
    task opens a file once and seeks forward-only.
    """
    req = cdx.select("warc_file", "warc_offset", "warc_length").repartition(
        "warc_file"
    ).sortWithinPartitions("warc_file", "warc_offset")

    def _fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for fpath, grp in pdf.groupby("warc_file", sort=True):
                p = fpath[5:] if fpath.startswith("file:") else fpath
                with open(p, "rb") as f:
                    for off, length in zip(
                        grp["warc_offset"], grp["warc_length"]
                    ):
                        f.seek(int(off))
                        member = f.read(int(length))
                        for r in parse_warc_bytes(member, warc_file=fpath):
                            r["warc_offset"] = int(off)
                            r["warc_length"] = int(length)
                            rows.append(_record_row(r))
            yield pd.DataFrame(rows, columns=_RECORD_COLS)

    return req.mapInPandas(_fetch, READ_SCHEMA)


def read_record_at(warc_file: str, offset: int, length: int) -> dict:
    """Ranged single-record read (the CDX contract): seek, read exactly
    the member, parse. Local/POSIX path version; an object-store
    deployment issues the equivalent byte-range GET."""
    if warc_file.startswith("file:"):  # binaryFile reports URIs, not paths
        warc_file = warc_file[5:]
    with open(warc_file, "rb") as f:
        f.seek(offset)
        member = f.read(length)
    recs = list(parse_warc_bytes(member, warc_file=warc_file))
    if len(recs) != 1:
        raise ValueError(
            f"expected exactly 1 record at {warc_file}:{offset}+{length}, "
            f"got {len(recs)}"
        )
    return recs[0]


def list_shards(out_dir: str) -> list[str]:
    return sorted(_glob.glob(os.path.join(out_dir, "*.warc.gz")))
