"""Scale receipts for the round-5 operators (VERDICT r4: "a
correct-but-slow operator is not done" — measure, don't guess).

Synthesizes a deterministic 10^6-document corpus (seeded hashing only,
spark.range → Catalyst projections, no driver data) with realistic skew:

- ~1% of docs are members of ONE degenerate duplicate cluster (the
  boilerplate-cluster shape that kills quadratic dedup);
- token counts 20–220, vocabulary ~50k, Zipf-ish via pmod bands;
- 20 sources for the DSIR target split.

Then times, at local[32]:

- dedup.substring_span_dedup (hash_grams=True ship tier) — O(tokens)
  windows + one df groupBy; the degenerate cluster must NOT blow up
  (its windows are hot but coverage explode is bounded by dup_tokens·k);
- curate.dsir_importance (xxhash64 ship tier) — two ≤B-group aggregates
  + broadcast weight join;
- linkgraph.pagerank_fixed_point over a 10^6-edge host graph (10^5
  nodes, preferential-attachment-ish skew: dst = pmod(hash, src_band));
- dedup.decontaminate_fuzzy vs a 3k-doc synthetic benchmark.

Receipts → BENCH/stress_ops_r5.json: wall per op + output row counts +
the input shape, so "scale-safe in structure" is backed by a measured
10^6-row run, not only plan reading.

    python tools/stress_ops_r5.py [n_docs]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from newscrawler_spark.session import get_spark  # noqa: E402


def synth_docs(spark, n_docs: int):
    """Deterministic skewed corpus: doc i -> 20+pmod(h,200) tokens drawn
    from a 50k vocabulary by seeded hashing; docs with pmod(h,100)==7
    (~1%) all share ONE identical 40-token boilerplate text."""
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.xxhash64(F.col("id"), F.lit(1)).alias("h"),
        F.concat(F.lit("src"), F.pmod(F.xxhash64(F.col("id"), F.lit(2)),
                                      F.lit(20))).alias("source"),
    )
    n_tok = (F.pmod("h", F.lit(200)) + 20).cast("int")
    tok = lambda i: F.concat(  # noqa: E731
        F.lit("w"),
        F.pmod(F.xxhash64(F.col("doc_id"), i), F.lit(50_000)).cast("string"),
    )
    body = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(1), n_tok), tok)
    )
    boiler = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(1), F.lit(40)),
                         lambda i: F.concat(F.lit("boiler"), i.cast("string")))
    )
    return base.select(
        "doc_id", "source",
        F.when(F.pmod("h", F.lit(100)) == 7, boiler).otherwise(body)
        .alias("text"),
    )


def synth_edges(spark, n_edges: int, n_nodes: int):
    """Skewed host graph: src uniform over n_nodes; dst concentrated —
    pmod(h, n_nodes/100) for 20% of edges (hub targets), uniform else."""
    e = spark.range(n_edges).select(
        F.pmod(F.xxhash64("id", F.lit(3)), F.lit(n_nodes)).alias("src"),
        F.when(
            F.pmod(F.xxhash64("id", F.lit(4)), F.lit(5)) == 0,
            F.pmod(F.xxhash64("id", F.lit(5)), F.lit(max(1, n_nodes // 100))),
        ).otherwise(
            F.pmod(F.xxhash64("id", F.lit(6)), F.lit(n_nodes))
        ).alias("dst"),
    )
    return e.where(F.col("src") != F.col("dst"))


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(master="local[32]", app_name="stress-ops-r5",
                      shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    scratch = os.path.join(REPO, ".fixtures", "stress_ops")
    docs_path = os.path.join(scratch, f"docs_{n_docs}.parquet")
    if not os.path.exists(os.path.join(docs_path, "_SUCCESS")):
        synth_docs(spark, n_docs).write.mode("overwrite").parquet(docs_path)
    docs = spark.read.parquet(docs_path)

    out: dict = {"n_docs": n_docs, "cpus": 32, "ops": {}}

    def timed(name, fn):
        t0 = time.monotonic()
        rows = fn()
        wall = round(time.monotonic() - t0, 2)
        out["ops"][name] = {"wall_s": wall, "rows": rows}
        print(json.dumps({name: out["ops"][name]}), flush=True)

    from newscrawler_spark.operators.curate import dsir_importance
    from newscrawler_spark.operators.dedup import (
        decontaminate_fuzzy,
        substring_span_dedup,
    )
    from newscrawler_spark.operators.linkgraph import pagerank_fixed_point

    timed("substring_span_dedup_hashed", lambda: substring_span_dedup(
        docs, k=5, min_df=2, hash_grams=True
    ).where("n_removed > 0").count())

    timed("dsir_importance_xxhash64", lambda: dsir_importance(
        docs, "src7", buckets=4096
    ).count())

    bench = docs.where("pmod(xxhash64(doc_id, 9), 300) = 0").limit(3000)
    timed("decontaminate_fuzzy", lambda: decontaminate_fuzzy(
        docs, bench, threshold=0.5,
        bench_id_col="doc_id", bench_text_col="text",
    ).count())

    edges = synth_edges(spark, 1_000_000, 100_000)
    timed("pagerank_1m_edges_4iter", lambda: pagerank_fixed_point(
        edges, iterations=4
    ).count())

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "stress_ops_r5.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
