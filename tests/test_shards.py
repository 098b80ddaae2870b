"""Deterministic training-shard writer (operators/shards.py).

Pins: (1) every doc lands in exactly one shard; (2) two writes of the
same corpus are row-for-row identical per shard file (the determinism
contract trainers rely on); (3) the on-disk row order inside each shard
file is the pinned (hash, id) order — i.e. sortWithinPartitions really
carries the same contract the windowed `pos` column states; (4) the
manifest is the commit marker: counts + order checksums match a
recompute, and a missing/torn manifest is refused; (5) a salt change
re-permutes assignment but still covers the corpus exactly once.
"""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.operators.shards import (
    MANIFEST,
    assign_shards,
    read_training_shards,
    shard_summary,
    write_training_shards,
)

N = 8


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"document number {i} body text " * (1 + i % 3)) for i in range(300)],
        "doc_id long, text string",
    )


def _per_file_orders(spark, path):
    """shard → list of (shuffle_hash, doc_id) in FILE order."""
    df = (
        spark.read.parquet(path)
        .select(
            "shard", "shuffle_hash", "doc_id",
            F.input_file_name().alias("f"),
        )
    )
    out = {}
    for r in df.collect():
        out.setdefault((r.shard, r.f), []).append((r.shuffle_hash, r.doc_id))
    # parquet scan preserves within-file row order per file split at this
    # size (single row group); merge files per shard sorted by name for a
    # stable view
    merged = {}
    for (shard, f), rows in sorted(out.items(), key=lambda kv: kv[0]):
        merged.setdefault(shard, []).extend(rows)
    return merged


def test_partition_of_corpus(spark, docs):
    a = assign_shards(docs, N, with_pos=True)
    rows = a.select("doc_id", "shard", "pos").collect()
    assert len(rows) == 300
    assert {r.doc_id for r in rows} == set(range(300))
    assert all(0 <= r.shard < N for r in rows)
    # pos is a dense 0..k-1 rank per shard
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps))), shard


def test_write_is_deterministic_and_ordered(spark, docs, tmp_path):
    p1, p2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    m1 = write_training_shards(docs, p1, N)
    m2 = write_training_shards(docs, p2, N)
    assert m1 == m2
    assert m1["total_docs"] == 300
    o1, o2 = _per_file_orders(spark, p1), _per_file_orders(spark, p2)
    assert o1 == o2
    # on-disk order inside each shard == pinned (hash, doc_id) ascending
    for shard, rows in o1.items():
        assert rows == sorted(rows), shard
    # and matches the windowed pos contract exactly
    want = {
        r.shard: r.n
        for r in assign_shards(docs, N).groupBy("shard").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    assert {s: len(rows) for s, rows in o1.items()} == want


def test_manifest_matches_recompute_and_commit_discipline(spark, docs, tmp_path):
    p = str(tmp_path / "w")
    man = write_training_shards(docs, p, N)
    stats = {r.shard: r for r in shard_summary(docs, N).collect()}
    for s, info in man["shards"].items():
        assert info["n_docs"] == stats[int(s)].n_docs
        assert info["order_checksum"] == stats[int(s)].order_checksum
    got = read_training_shards(spark, p)
    assert got.count() == 300
    # torn manifest → refused
    with open(os.path.join(p, MANIFEST), "w") as f:
        f.write('{"n_shards": 8')  # truncated write
    with pytest.raises(FileNotFoundError):
        read_training_shards(spark, p)
    os.remove(os.path.join(p, MANIFEST))
    with pytest.raises(FileNotFoundError):
        read_training_shards(spark, p)


def test_salt_repermutes_but_still_partitions(spark, docs):
    a = {r.doc_id: r.shard for r in assign_shards(docs, N).collect()}
    b = {r.doc_id: r.shard for r in
         assign_shards(docs, N, salt="epoch-1").collect()}
    assert set(a) == set(b) == set(range(300))
    assert any(a[i] != b[i] for i in a)  # genuinely re-shuffled
    # checksums differ too (order re-pinned)
    c1 = {r.shard: r.order_checksum for r in shard_summary(docs, N).collect()}
    c2 = {r.shard: r.order_checksum
          for r in shard_summary(docs, N, salt="epoch-1").collect()}
    assert c1 != c2


def test_pack_sequences_layout(spark):
    from newscrawler_spark.operators.shards import assign_shards, pack_sequences

    df = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(10 + i % 7))) for i in range(60)],
        "doc_id long, text string",
    )
    got = pack_sequences(df, budget=32, n_shards=4).collect()
    assert len(got) == 60
    by_shard = {}
    for r in got:
        by_shard.setdefault(r.shard, []).append(r)
    order_ref = {
        r.doc_id: (r.shard, r.shuffle_hash)
        for r in assign_shards(df, 4).collect()
    }
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.start_offset)
        # stream is gapless: each doc starts where the previous ended
        off = 0
        for r in rows:
            assert r.start_offset == off
            assert r.seq_id == off // 32
            assert order_ref[r.doc_id][0] == shard
            off += r.n_tokens
        # and the order is the pinned (hash, id) order
        hashes = [order_ref[r.doc_id][1] for r in rows]
        assert hashes == sorted(hashes)
    # docs can straddle sequence boundaries (that's the point)
    assert any(r.start_offset // 32 != (r.start_offset + r.n_tokens - 1) // 32
               for r in got)


# ---------------------------------------------------------------- r5:
# materialized packed streams — the bytes behind the q62 offset plan.


def test_packed_streams_round_trip(spark, docs):
    """Every document's tokens re-slice EXACTLY out of the materialized
    shard stream at its pack_sequences offsets, and every sequence but
    each shard's last holds exactly `budget` tokens."""
    from newscrawler_spark.operators.shards import (
        materialize_packed_streams,
        pack_sequences,
    )

    budget = 32
    offs = {r.doc_id: r for r in
            pack_sequences(docs, budget=budget, n_shards=N).collect()}
    seqs = materialize_packed_streams(docs, budget=budget, n_shards=N)
    streams: dict[int, list[str]] = {}
    lengths: dict[int, dict[int, int]] = {}
    for r in seqs.collect():
        lengths.setdefault(r.shard, {})[r.seq_id] = r.n_seq_tokens
        streams.setdefault(r.shard, {})[r.seq_id] = r.seq_text.split(" ")
    # stitch each shard's stream in seq order; check budget discipline
    stitched: dict[int, list[str]] = {}
    for shard, by_seq in streams.items():
        ids = sorted(by_seq)
        assert ids == list(range(len(ids)))        # contiguous sequences
        for sid in ids[:-1]:
            assert lengths[shard][sid] == budget   # only the tail is short
        assert 1 <= lengths[shard][ids[-1]] <= budget
        stitched[shard] = [t for sid in ids for t in by_seq[sid]]
    # re-slice every doc at its offsets
    texts = {r.doc_id: r.text for r in docs.collect()}
    for doc_id, o in offs.items():
        want = texts[doc_id].split()
        got = stitched[o.shard][o.start_offset:o.start_offset + o.n_tokens]
        assert got == want, doc_id


def test_write_packed_streams_manifest(spark, docs, tmp_path):
    from newscrawler_spark.operators.shards import (
        PACKED_MANIFEST,
        materialize_packed_streams,
        write_packed_streams,
    )

    path = str(tmp_path / "packed")
    man = write_packed_streams(docs, path, budget=32, n_shards=N)
    assert os.path.exists(os.path.join(path, PACKED_MANIFEST))
    back = spark.read.parquet(path)
    assert back.count() == man["total_seqs"]
    ref = materialize_packed_streams(docs, budget=32, n_shards=N)
    got = {(r.shard, r.seq_id): r.seq_text for r in back.collect()}
    want = {(r.shard, r.seq_id): r.seq_text for r in ref.collect()}
    assert got == want
    # manifest totals add up
    assert man["total_tokens"] == sum(
        v["n_tokens"] for v in man["shards"].values())


def test_write_training_shards_empty_corpus(spark, tmp_path):
    """Zero surviving docs is a legal outcome of aggressive filtering:
    the writer must commit an EMPTY manifest (total_docs 0), not crash
    on the schema-less read-back of a part-file-free directory."""
    from newscrawler_spark.operators.shards import write_training_shards

    empty = spark.createDataFrame([], "doc_id long, text string")
    man = write_training_shards(empty, str(tmp_path / "s"), 8)
    assert man["total_docs"] == 0 and man["shards"] == {}
