"""Deterministic training-shard writer over a curated documents corpus.

The step a training pipeline runs AFTER curation (operators/curate.py):
globally shuffle the surviving documents into ``n_shards`` roughly-equal
shards with a pinned, reproducible order, so that (a) every trainer
rank reads a disjoint, stable slice, (b) a re-run of the writer produces
byte-for-byte the same shard membership and row order, and (c) a new
epoch permutation is one ``salt`` change away (no new semantics, no new
code path).

Determinism contract (SQL-expressible end to end — driver query q55):

- shard(doc)   = base56(md5(salt || '|' || doc_id)) % n_shards
- order within = ascending by that same 56-bit hash, doc_id tiebreak
  (the hash IS the permutation — a uniform pseudorandom global shuffle)

where base56(m) = first 14 hex chars of the digest as a BIGINT — the
same overflow-free 56-bit construction the MinHash family uses
(operators/dedup.py), reproducible in any SQL engine as
``('0x' || substr(md5(..), 1, 14))::BIGINT``.

Scale shape (100 TB): assignment is a pure projection; the writer is ONE
hash shuffle on ``shard`` + a per-partition sort (spillable), then a
``partitionBy(shard)`` parquet write — no window, no driver-side state.
The rank column exposed by :func:`assign_shards` (used by the small-SF
contract query to pin the order) is a per-shard window; the WRITER never
computes it — the order is pinned by ``sortWithinPartitions``, which is
the scalable form of the same contract.

Commit discipline matches operators/store.py: ``_SHARDS_MANIFEST.json``
(per-shard row counts + order checksums + the salt) is written LAST via
tmp + fsync + atomic rename; a missing/torn manifest means the shard set
is not committed and :func:`read_training_shards` refuses it.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.errors import AnalysisException
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MANIFEST = "_SHARDS_MANIFEST.json"


def _base56(col: Column) -> Column:
    """First 56 bits of md5 as a non-negative BIGINT (see module doc)."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


def shard_hash(id_col: Column | str, salt: str = "") -> Column:
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return _base56(F.concat_ws("|", F.lit(salt), c.cast("string")))


def assign_shards(
    documents: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
    with_pos: bool = False,
) -> DataFrame:
    """Add ``shard`` (int) and ``shuffle_hash`` (long) columns.

    ``with_pos=True`` also adds ``pos`` — the 0-based rank within the
    shard under the pinned order (hash asc, id asc). pos is a per-shard
    window sort: fine at contract/test scale, and the per-shard sort the
    writer does anyway at scale — but prefer the writer's
    sortWithinPartitions form for bulk jobs.
    """
    h = shard_hash(id_col, salt)
    out = documents.withColumn("shuffle_hash", h).withColumn(
        "shard", F.pmod(F.col("shuffle_hash"), F.lit(n_shards)).cast("int")
    )
    if with_pos:
        w = Window.partitionBy("shard").orderBy("shuffle_hash", id_col)
        out = out.withColumn("pos", F.row_number().over(w) - F.lit(1))
    return out


def shard_summary(
    documents: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-shard (n_docs, order_checksum) — the driver-checkable contract.

    order_checksum = bit_xor over rows of base56(md5(hash || ':' || pos)):
    any membership change, any order change, and any off-by-one in pos
    flips it; XOR-aggregation can never overflow. Deterministic and
    reproducible in ANSI SQL (q55).
    """
    a = assign_shards(documents, n_shards, id_col, salt)
    return _pinned_summary(a, id_col)


def _pinned_summary(assigned: DataFrame, id_col: str) -> DataFrame:
    """Summary over rows that already carry (shard, shuffle_hash): rank
    under the pinned order, fold (hash, pos) per row with XOR."""
    w = Window.partitionBy("shard").orderBy("shuffle_hash", id_col)
    a = assigned.withColumn("pos", F.row_number().over(w) - F.lit(1))
    mix = _base56(
        F.concat_ws(
            ":",
            F.col("shuffle_hash").cast("string"),
            F.col("pos").cast("string"),
        )
    )
    return (
        a.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.bit_xor(mix).alias("order_checksum"),
        )
        .orderBy("shard")
    )


def write_training_shards(
    documents: DataFrame,
    path: str,
    n_shards: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> dict:
    """Shuffle + write the corpus as ``path/shard=K/*.parquet``.

    One hash shuffle on ``shard`` (AQE coalesces small shards), rows
    sorted per partition by (shard, shuffle_hash, id) so each shard file
    carries the pinned order even when hash-partitioning co-locates two
    shards in one task. Manifest (counts + order checksums + salt) is the
    commit marker, written last + atomically — and it is computed FROM
    THE WRITTEN FILES, not by re-evaluating the (possibly expensive)
    input lineage a second time, so the committed checksums describe
    exactly the bytes on disk. Returns the manifest dict.

    Filesystem note (same contract as store.py/sources/warc.py): the
    manifest commit uses local ``open``+rename — correct on local and
    any POSIX-shared FS; an object-store deployment swaps those two
    calls for the storage client, nothing else changes.
    """
    a = assign_shards(documents, n_shards, id_col, salt)
    (
        a.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shuffle_hash", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    try:
        back = documents.sparkSession.read.parquet(path).select(
            F.col("shard").cast("int").alias("shard"), "shuffle_hash",
            F.col(id_col),
        )
        stats = _pinned_summary(back, id_col).collect()
    except AnalysisException:
        # ZERO surviving docs: partitionBy writes only _SUCCESS (no part
        # files), so the read-back cannot infer a schema. An aggressively
        # filtered corpus is a legal outcome — commit an empty manifest
        # (total_docs 0) instead of crashing the job after the write.
        stats = []
    man = {
        "n_shards": n_shards,
        "salt": salt,
        "id_col": id_col,
        "total_docs": int(sum(r.n_docs for r in stats)),
        "shards": {
            str(r.shard): {
                "n_docs": int(r.n_docs),
                "order_checksum": int(r.order_checksum),
            }
            for r in stats
        },
    }
    fd, tmp = tempfile.mkstemp(dir=path, prefix="_SHARDS", suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(man, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, MANIFEST))
    return man


def read_training_shards(spark: SparkSession, path: str) -> DataFrame:
    """Read a committed shard set; refuse an uncommitted/torn one."""
    mp = os.path.join(path, MANIFEST)
    try:
        with open(mp) as f:
            man = json.load(f)
        if "n_shards" not in man or "shards" not in man:
            raise ValueError
    except (OSError, ValueError, json.JSONDecodeError):
        raise FileNotFoundError(
            f"{path}: no committed shard manifest ({MANIFEST}) — "
            "the writer did not finish"
        )
    return spark.read.parquet(path)


def pack_sequences(
    documents: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """GPT-style sequence packing plan: concatenate each shard's
    documents (in the pinned global-shuffle order) into one token
    stream and chop it into ``budget``-token training sequences —
    documents may straddle a boundary, exactly like block-packed LM
    pretraining.

    Returns (doc_id, shard, n_tokens, start_offset, seq_id): the doc's
    first token lands at ``start_offset`` in its shard's stream, inside
    sequence ``seq_id = floor(start_offset / budget)``. Deterministic and
    closed-form — a per-shard window cumulative sum over the same
    (hash, id) order the shard writer pins on disk, so a trainer can
    compute byte ranges without materializing the packed stream.

    Scale: one hash shuffle (the shard assignment) + a per-shard window
    sort the writer performs anyway; no second pass over the text.
    """
    from newscrawler_spark.operators.dedup import tokens_expr

    a = assign_shards(documents, n_shards, id_col, salt).withColumn(
        "n_tokens", F.size(tokens_expr(text_col)).cast("long")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("shuffle_hash", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return a.select(
        id_col,
        "shard",
        "n_tokens",
        (cum - F.col("n_tokens")).alias("start_offset"),
        F.floor((cum - F.col("n_tokens")) / F.lit(budget)).alias("seq_id"),
    )


def materialize_packed_streams(
    documents: DataFrame,
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> DataFrame:
    """Materialize the packed token streams :func:`pack_sequences` only
    PLANS — the actual ``budget``-token training sequences a trainer
    reads, with documents straddling sequence boundaries exactly as the
    offsets say.

    Returns (shard, seq_id, n_seq_tokens, seq_text): sequence ``seq_id``
    of shard ``shard`` holds the shard stream's tokens
    [seq_id*budget, (seq_id+1)*budget), space-joined in stream order
    (tokens are whitespace-split, so the join is lossless). The final
    sequence of each shard is the only one allowed < ``budget`` tokens.
    Byte-consistency with the offsets is pinned two ways: the q66 DuckDB
    oracle recomputes every sequence closed-form, and the round-trip
    test re-slices each document out of the materialized stream at its
    pack_sequences offsets.

    Scale shape: pack_sequences' one hash shuffle + per-shard window,
    a co-shuffled join back to the text, then ONE explode + groupBy
    (shard, seq) — O(corpus tokens) shuffle, the unavoidable cost of
    actually materializing the stream; per-group state is one
    ``budget``-token sequence. No collect, no driver state.
    """
    from newscrawler_spark.operators.dedup import tokens_expr

    offs = pack_sequences(documents, budget, n_shards, id_col, text_col,
                          salt)
    toks = documents.select(
        F.col(id_col), tokens_expr(text_col).alias("tk")
    )
    j = offs.join(toks, id_col).select(
        "shard", "start_offset", F.posexplode("tk").alias("pos", "tok")
    )
    gpos = F.col("start_offset") + F.col("pos")
    return (
        j.select(
            "shard",
            F.floor(gpos / F.lit(budget)).alias("seq_id"),
            gpos.alias("gpos"),
            "tok",
        )
        .groupBy("shard", "seq_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_seq_tokens"),
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("gpos", "tok"))),
                    lambda x: x["tok"],
                ),
            ).alias("seq_text"),
        )
    )


PACKED_MANIFEST = "_PACKED_MANIFEST.json"


def write_packed_streams(
    documents: DataFrame,
    path: str,
    budget: int = 2048,
    n_shards: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: str = "",
) -> dict:
    """Opt-in packed-stream writer: materialize the sequences and write
    ``path/shard=K/*.parquet`` (rows = (seq_id, n_seq_tokens,
    seq_text)), manifest-committed like :func:`write_training_shards`
    (counts computed FROM THE WRITTEN FILES; manifest written last via
    tmp + fsync + atomic rename — a missing manifest means uncommitted).
    """
    seqs = materialize_packed_streams(
        documents, budget, n_shards, id_col, text_col, salt
    )
    (
        seqs.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "seq_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
    back = documents.sparkSession.read.parquet(path)
    stats = (
        back.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("n_seq_tokens").alias("n_tokens"),
        )
        .orderBy("shard")
        .collect()
    )
    man = {
        "budget": budget,
        "n_shards": n_shards,
        "salt": salt,
        "total_seqs": int(sum(r.n_seqs for r in stats)),
        "total_tokens": int(sum(r.n_tokens for r in stats)),
        "shards": {
            str(r.shard): {"n_seqs": int(r.n_seqs),
                           "n_tokens": int(r.n_tokens)}
            for r in stats
        },
    }
    fd, tmp = tempfile.mkstemp(dir=path, prefix="_PACKED", suffix=".tmp")
    with os.fdopen(fd, "w") as f:
        json.dump(man, f, indent=1)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, PACKED_MANIFEST))
    return man
