"""Similarity search over an embedding column (array<float>).

Training-pipeline addition (driver brief): brute-force cosine top-k as the
exactness baseline, plus a random-hyperplane LSH bucketed variant as the
scale path. All vector math is native Catalyst (zip_with + aggregate) —
JVM-side, no Python UDFs; the LSH plane matrix is a tiny deterministic
numpy literal broadcast into the plan.

Scale notes: brute_force_topk is O(Q·N) — right for Q small (re-ranking,
eval); ann_lsh_topk blocks the join on sign-bucket equality so the
shuffle is O(N) bucket keys, with multi-probe via several independent
tables to recover recall.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_expr(a: Column, b: Column) -> Column:
    # cast to double BEFORE multiplying: float32 products lose bits that
    # can cross a rounding boundary vs a double-math oracle
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    return F.aggregate(
        F.zip_with(ad, bd, lambda x, y: x * y),
        F.lit(0.0).cast("double"),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column) -> Column:
    ad = a.cast("array<double>")
    return F.sqrt(
        F.aggregate(ad, F.lit(0.0).cast("double"), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries × corpus, window cut.

    Output (query_id, vec_id, cos, rank) — rank ties broken by vec_id so
    results are deterministic and oracle-comparable.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    scored = e.crossJoin(F.broadcast(q)).withColumn(
        "cos", cosine_expr(F.col("v"), F.col("qv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def _planes(dim: int, n_planes: int, table: int, seed: int = 42) -> list[list[float]]:
    """Deterministic hyperplanes (public numpy PCG64, seeded)."""
    rng = np.random.default_rng(seed * 1000 + table)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-projection bucket id: bit i = (vec · plane_i) > 0, packed long."""
    b = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        b = F.when(
            dot_expr(vec, plane) > 0,
            b.bitwiseOR(F.shiftleft(F.lit(1).cast("long"), i)),
        ).otherwise(b)
    return b


def ann_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of
    ``n_tables`` sign-projection tables; exact cosine re-ranks candidates.

    Same output schema as :func:`brute_force_topk` (a query may return
    < k rows if its buckets are sparse — that's the recall tradeoff,
    measured in tests/test_similarity.py).
    """
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    cand = None
    for t in range(n_tables):
        planes = _planes(dim, n_planes, t)
        eb = e.withColumn("bucket", lsh_bucket_expr(F.col("v"), planes)).withColumn(
            "table", F.lit(t)
        )
        qb = q.withColumn("bucket", lsh_bucket_expr(F.col("qv"), planes)).withColumn(
            "table", F.lit(t)
        )
        c = eb.join(qb, ["table", "bucket"]).select("query_id", "vec_id")
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.distinct()
    scored = (
        cand.join(e, "vec_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("cos", cosine_expr(F.col("v"), F.col("qv")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )
