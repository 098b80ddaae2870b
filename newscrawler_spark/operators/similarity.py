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


def brute_force_topk_catalyst(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query: broadcast queries × corpus, window cut.

    The no-Python tier (pure Catalyst higher-order functions, plan-
    asserted JVM-only) — kept as the oracle form; the default
    :func:`brute_force_topk` computes the identical result with one
    numpy GEMM per Arrow batch (equality-tested, ~an order of magnitude
    faster: the q41 precedent).

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


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query — GEMM tier (default).

    One float64 ``Vn @ Qn.T`` per Arrow batch against the broadcast
    normalized query matrix (queries are small by this operator's
    contract — it IS the exhaustive baseline), then a tie-safe batch cut
    (every row with cos >= the batch's k-th largest survives, so a
    global tie can never be dropped locally) and a global per-query
    window over the ~batches×k survivors. Exact ≡
    :func:`brute_force_topk_catalyst` (equality-tested); at 10^9×Q the
    flops are the same but SIMD-batched, and only ~k rows per (batch,
    query) leave Python instead of N·Q rows entering the window.

    Divergence note: a zero-norm vector yields no row here (non-finite
    cosine dropped batch-side), while the Catalyst tier emits a
    null-cos row that can only surface when a query has fewer than k
    finite candidates.
    """
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
    ).collect()
    if not qrows:
        e0 = embeddings.select(F.col(id_col).alias("vec_id")).schema["vec_id"]
        q0 = queries.select(F.col(query_id_col).alias("query_id")).schema["query_id"]
        return embeddings.sparkSession.createDataFrame(
            [], f"query_id {q0.dataType.simpleString()}, "
                f"vec_id {e0.dataType.simpleString()}, cos double, rank int")
    qids = [r["query_id"] for r in qrows]
    qmat = np.array([r["qv"] for r in qrows], dtype=np.float64)
    qn = np.linalg.norm(qmat, axis=1, keepdims=True)
    qn[qn == 0] = np.nan
    qmat = qmat / qn

    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    qid_t = queries.select(F.col(query_id_col).alias("q")).schema["q"].dataType
    vid_t = e.schema["vec_id"].dataType
    out_schema = (f"query_id {qid_t.simpleString()}, "
                  f"vec_id {vid_t.simpleString()}, cos double")

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            v = np.array(pdf["v"].tolist(), dtype=np.float64)
            n = np.linalg.norm(v, axis=1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                s = (v / n) @ qmat.T  # b × Q
            ids = pdf["vec_id"].to_numpy()
            for j, qid in enumerate(qids):
                col = s[:, j]
                finite = np.isfinite(col)
                col_f, ids_f = col[finite], ids[finite]
                if len(col_f) > k:
                    kth = np.partition(col_f, -k)[-k]
                    keep = col_f >= kth
                    col_f, ids_f = col_f[keep], ids_f[keep]
                yield pd.DataFrame(
                    {"query_id": qid, "vec_id": ids_f, "cos": col_f})

    scored = e.mapInPandas(score, out_schema)
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


def _md5_planes(dim: int, n_planes: int, table: int) -> list[list[float]]:
    """Deterministic hyperplanes from md5 arithmetic — component (t,p,d) =
    int(md5(f"plane|{t}|{p}|{d}")[:8], 16) / 2^31 - 1, uniform in [-1, 1).
    Uniform (not Gaussian) components still give valid sign-projection
    hyperplanes; the point of this family is that a SQL oracle can
    regenerate the IDENTICAL doubles — ('0x' || substr(md5(...),1,8))::BIGINT
    / 2147483648.0 - 1.0 — int/2^31 and the -1 shift are exact in IEEE
    double, so both engines hold bit-identical plane matrices (q41)."""
    import hashlib

    return [
        [
            int(hashlib.md5(f"plane|{table}|{p}|{d}".encode()).hexdigest()[:8], 16)
            / 2147483648.0
            - 1.0
            for d in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket_expr(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-projection bucket id: bit i = (vec · plane_i) > 0, packed long.

    Terms are independent and SUMMED (bits disjoint ⇒ sum == OR): a
    nested when(b|bit).otherwise(b) accumulator references itself twice
    per plane, duplicating every earlier dot product 2^i times in the
    expression tree.
    """
    terms = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        terms.append(
            F.when(dot_expr(vec, plane) > 0, F.lit(1 << i).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        )
    acc = terms[0]
    for t in terms[1:]:
        acc = acc + t
    return acc


def _bucket_frame_gemm(
    df: DataFrame, id_alias: str, vec_alias: str,
    planes_by_table: list[list[list[float]]],
) -> DataFrame:
    """All LSH tables' sign buckets in ONE numpy GEMM per Arrow batch.

    The Catalyst form (:func:`lsh_bucket_expr`) evaluates
    n_tables x n_planes zip_with+aggregate dot products per row — an O(1)
    plan but a heavy per-row constant (6.3 s for ~9k vectors at sf0.1).
    Here every batch computes X @ P.T for the CONCATENATED plane matrix
    (one BLAS call), packs sign bits per table, and emits
    (id, table, bucket) rows — same output, ~10x cheaper, and the Arrow
    transfer is the id + vector columns only. Sign decisions agree with
    the expression/SQL forms whenever |dot| >> round-off, the same
    order-robustness the DuckDB oracle already relies on (its sum() is
    unordered too); equality is asserted in tests/test_similarity.py.
    """
    import pandas as pd

    P = np.asarray(
        [p for planes in planes_by_table for p in planes], dtype=np.float64
    )
    T = len(planes_by_table)
    PL = len(planes_by_table[0])
    shifts = (1 << np.arange(PL, dtype=np.int64))

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf[vec_alias].tolist(), dtype=np.float64)
            bits = (X @ P.T) > 0                      # (B, T*PL)
            buckets = (
                bits.reshape(len(pdf), T, PL) * shifts
            ).sum(axis=2, dtype=np.int64).reshape(-1)
            yield pd.DataFrame({
                id_alias: np.repeat(pdf[id_alias].to_numpy(), T),
                "table": np.tile(np.arange(T, dtype=np.int32), len(pdf)),
                "bucket": buckets,
            })

    return df.select(id_alias, vec_alias).mapInPandas(
        gen, schema=f"{id_alias} long, table int, bucket long"
    )


def embedding_near_dups_lsh(
    embeddings: DataFrame,
    threshold: float = 0.9,
    dim: int = 64,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_source: str = "pcg64",
    method: str = "gemm",
) -> DataFrame:
    """Embedding near-dup PAIRS at 10^9-vector scale: candidates share a
    sign-projection bucket in >=1 of ``n_tables`` tables (O(N·tables)
    bucket keys shuffled, never all-pairs), then exact cosine verifies
    every candidate — FPs impossible in the output, FNs are the LSH
    recall tradeoff (recall-tested in tests/test_similarity.py; raise
    n_tables / lower n_planes to trade shuffle for recall).

    Same output schema as the exact tiers in operators/dedup.py
    (embedding_cosine_pairs): (id1, id2, cos) with id1 < id2.

    ``method="gemm"`` (default) computes every table's buckets in one
    numpy GEMM per Arrow batch (:func:`_bucket_frame_gemm`) and blocks
    with a single (table, bucket) self-join; ``method="catalyst"`` keeps
    the pure-JVM expression form (one join per table) as the
    no-Python-workers reference tier.
    """
    e = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    gen = _md5_planes if plane_source == "md5" else _planes
    if method == "gemm":
        planes_all = [gen(dim, n_planes, t) for t in range(n_tables)]
        b = _bucket_frame_gemm(e, "id", "v", planes_all)
        cand = (
            b.alias("x").join(b.alias("y"), ["table", "bucket"])
            .where(F.col("x.id") < F.col("y.id"))
            .select(F.col("x.id").alias("id1"), F.col("y.id").alias("id2"))
        )
    else:
        cand = None
        for t in range(n_tables):
            planes = gen(dim, n_planes, t)
            eb = e.select(
                "id", lsh_bucket_expr(F.col("v"), planes).alias("bucket")
            )
            c = (
                eb.alias("x").join(eb.alias("y"), "bucket")
                .where(F.col("x.id") < F.col("y.id"))
                .select(F.col("x.id").alias("id1"), F.col("y.id").alias("id2"))
            )
            cand = c if cand is None else cand.unionByName(c)
    cand = cand.distinct()
    verified = (
        cand.join(e.select(F.col("id").alias("id1"), F.col("v").alias("v1")),
                  "id1")
        .join(e.select(F.col("id").alias("id2"), F.col("v").alias("v2")),
              "id2")
        .withColumn("cos", cosine_expr(F.col("v1"), F.col("v2")))
        .where(F.col("cos") >= threshold)
        .select("id1", "id2", F.round("cos", 6).alias("cos"))
    )
    return verified


def ivf_build_centroids(
    embeddings: DataFrame,
    n_lists: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float = 1.0,
    iters: int = 5,
    seed: int = 42,
    assign: str = "auto",
) -> list[list[float]]:
    """IVF coarse quantizer: k-means centroids trained distributed.

    Lloyd iterations as pure DataFrame ops — assign = cosine-argmax over
    centroid literals (codegen'd), update = groupBy(list).avg per
    dimension — so training scales with executors; only the k x dim
    centroid matrix (tiny) ever reaches the driver. Seeding is
    deterministic AND SQL-reproducible (rows ranked by md5 of the id
    string), so ``iters=0`` yields centroids a DuckDB oracle regenerates
    exactly — the basis of the two-sided q43 check; ``iters>0`` is the
    production path (recall-tested in tests/test_similarity.py).
    """
    e = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    if sample_fraction < 1.0:
        e = e.sample(fraction=sample_fraction, seed=seed)
    seeded = (
        e.withColumn("__r", F.md5(F.col("id").cast("string")))
        .orderBy("__r").limit(n_lists)
    )
    centroids = [row.v for row in seeded.collect()]
    e = e.select("v")
    for _ in range(iters):
        assigned = _with_list_id(e, centroids, "v", assign)
        sums = assigned.select(
            "list_id",
            *[F.element_at("v", d + 1).alias(f"d{d}") for d in range(dim)],
        ).groupBy("list_id").agg(
            F.count(F.lit(1)).alias("n"),
            *[F.avg(f"d{d}").alias(f"d{d}") for d in range(dim)],
        )
        got = {row.list_id: [row[f"d{d}"] for d in range(dim)]
               for row in sums.collect()}
        centroids = [got.get(i, centroids[i]) for i in range(n_lists)]
    return centroids


def _nearest_centroid_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """Cosine-argmax list assignment: the k similarities are computed
    ONCE into an array (bind_once), then argmax = first position of the
    max — linear expression tree, deterministic lowest-index tie-break.

    SCALE CAP: the expression inlines k x dim double literals, so the
    plan grows O(k·dim) — fine for the oracle tier (k=16, dim=64 ≈ 1k
    literals) but wrong at IVF-realistic k (4k-65k lists). Assignment
    beyond ~4k literals must use :func:`_assign_lists_gemm` (one numpy
    GEMM per Arrow batch, constant plan size); ``assign="auto"`` in the
    IVF entry points makes that switch."""
    from newscrawler_spark.operators.dedup import bind_once

    sims = F.array(*[
        cosine_expr(vec, F.array(*[F.lit(float(x)) for x in c]))
        for c in centroids
    ])
    return bind_once(
        sims, lambda a: (F.array_position(a, F.array_max(a)) - 1).cast("int")
    )


def _assign_lists_gemm(
    df: DataFrame, centroids: list[list[float]], vec_alias: str = "v",
) -> DataFrame:
    """Append ``list_id`` = cosine-argmax centroid via one numpy GEMM per
    Arrow batch — the plan stays O(1) regardless of k (the centroid
    matrix rides inside the serialized function, not the plan), so this
    is the assignment form for IVF-realistic list counts. np.argmax
    breaks ties at the lowest index, matching the expression form's
    array_position tie-break; equality on real data is asserted in
    tests/test_similarity.py."""
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", list_id int"

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf[vec_alias].tolist(), dtype=np.float64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            pdf = pdf.copy()
            pdf["list_id"] = np.argmax(Xn @ Cn.T, axis=1).astype(np.int32)
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def _with_list_id(df: DataFrame, centroids: list[list[float]],
                  vec_alias: str, assign: str) -> DataFrame:
    if assign == "auto":
        assign = "expr" if len(centroids) * len(centroids[0]) <= 4096 \
            else "gemm"
    if assign == "gemm":
        return _assign_lists_gemm(df, centroids, vec_alias)
    return df.withColumn(
        "list_id", _nearest_centroid_expr(F.col(vec_alias), centroids)
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    assign: str = "auto",
) -> DataFrame:
    """IVF search: corpus bucketed by nearest centroid (inverted lists);
    each query probes its ``n_probe`` nearest lists and exact-cosine
    re-ranks only those lists' members — the classic coarse-quantizer
    ANN shape. Shuffle is O(N) list keys + O(Q·n_probe) probe keys; at
    10^9 vectors the inverted lists would be a bucketed/partitioned
    table reused across queries (build once, probe many).

    Output schema matches :func:`brute_force_topk`.
    """
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    eff = assign
    if eff == "auto":
        eff = "expr" if len(centroids) * len(centroids[0]) <= 4096 else "gemm"
    lists = _with_list_id(e, centroids, "v", eff)
    if eff == "gemm":
        probe_keys = _probe_lists_gemm(q, centroids, n_probe)
    else:
        # per query: n_probe nearest centroids (tiny cross product, cut)
        cent_rows = [(i,) for i in range(len(centroids))]
        spark = embeddings.sparkSession
        cent_df = spark.createDataFrame(cent_rows, "list_id int")
        probes = (
            q.crossJoin(F.broadcast(cent_df))
            .withColumn(
                "sim",
                _centroid_sim_expr(F.col("qv"), centroids),
            )
        )
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("list_id"))
        probe_keys = (
            probes.withColumn("pr", F.row_number().over(w))
            .where(F.col("pr") <= n_probe)
            .select("query_id", "qv", "list_id")
        )
    scored = (
        lists.join(F.broadcast(probe_keys), "list_id")
        .withColumn("cos", cosine_expr(F.col("v"), F.col("qv")))
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def _probe_lists_gemm(q: DataFrame, centroids: list[list[float]],
                      n_probe: int) -> DataFrame:
    """(query_id, qv, list_id) rows for each query's ``n_probe`` nearest
    centroids via one GEMM per Arrow batch — the O(1)-plan twin of the
    cross-join+window probe (stable argsort reproduces the
    sim DESC, list_id ASC tie-break)."""
    import pandas as pd

    C = np.asarray(centroids, dtype=np.float64)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    npb = min(n_probe, len(centroids))

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            X = np.array(pdf["qv"].tolist(), dtype=np.float64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            idx = np.argsort(-(Xn @ Cn.T), axis=1, kind="stable")[:, :npb]
            yield pd.DataFrame({
                "query_id": np.repeat(pdf["query_id"].to_numpy(), npb),
                "qv": [v for v in pdf["qv"] for _ in range(npb)],
                "list_id": idx.reshape(-1).astype(np.int32),
            })

    return q.mapInPandas(
        gen, schema="query_id long, qv array<double>, list_id int"
    )


def _centroid_sim_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """cosine(vec, centroids[list_id]) — selected by the list_id column."""
    sims = F.array(*[
        cosine_expr(vec, F.array(*[F.lit(float(x)) for x in c]))
        for c in centroids
    ])
    return F.element_at(sims, F.col("list_id") + 1)


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
    plane_source: str = "pcg64",
    method: str = "gemm",
) -> DataFrame:
    """Approximate top-k: candidates share an LSH bucket in ≥1 of
    ``n_tables`` sign-projection tables; exact cosine re-ranks candidates.

    Same output schema as :func:`brute_force_topk` (a query may return
    < k rows if its buckets are sparse — that's the recall tradeoff,
    measured in tests/test_similarity.py). ``plane_source="md5"`` swaps
    the numpy-PCG64 plane matrix for the md5-derived one so a DuckDB
    oracle reproduces the exact candidate set (q41).

    ``method="gemm"`` (default) batches all tables' bucket ids through
    one numpy GEMM per Arrow batch (:func:`_bucket_frame_gemm`);
    ``method="catalyst"`` keeps the per-table JVM expression form as the
    no-Python-workers reference tier. Identical candidates whenever
    |dot| >> round-off (the oracle's own robustness assumption); equality
    asserted in tests/test_similarity.py.
    """
    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    q = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    )
    gen = _md5_planes if plane_source == "md5" else _planes
    if method == "gemm":
        planes_all = [gen(dim, n_planes, t) for t in range(n_tables)]
        eb = _bucket_frame_gemm(e, "vec_id", "v", planes_all)
        qb = _bucket_frame_gemm(q, "query_id", "qv", planes_all)
        cand = (
            eb.join(F.broadcast(qb), ["table", "bucket"])
            .select("query_id", "vec_id")
        )
    else:
        cand = None
        for t in range(n_tables):
            planes = gen(dim, n_planes, t)
            eb = e.withColumn(
                "bucket", lsh_bucket_expr(F.col("v"), planes)
            ).withColumn("table", F.lit(t))
            qb = q.withColumn(
                "bucket", lsh_bucket_expr(F.col("qv"), planes)
            ).withColumn("table", F.lit(t))
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


# ---------------------------------------------------------------------------
# int8 quantized tier — the 10^9-vector memory/bandwidth lever
# ---------------------------------------------------------------------------

def _q127_expr(vd: Column, m: Column) -> Column:
    """floor(x*127/m + 0.5) as int — symmetric-range int8 quantization.

    floor(t + 0.5) is the ONE rounding primitive that is bit-identical
    across Spark (F.floor), DuckDB (floor) and numpy (np.floor), so the
    oracle can rebuild the quantized vectors exactly; Spark's round()
    (decimal HALF_UP) and numpy's round() (half-to-even) do not agree on
    every double. |t| <= 127 by construction, so values fit a tinyint.
    """
    return F.transform(
        vd, lambda x: F.floor(x * F.lit(127.0) / m + F.lit(0.5)).cast("int")
    )


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, scale double, qvec array<tinyint>) — the persistable form.

    scale = max|x|/127 so x ~= scale * qvec; a stored corpus shrinks 4x
    (plus the float->tinyint shuffle/cache win, which is the point at
    10^9 vectors). Zero vectors get scale 0 and an all-zero qvec.
    """
    vd = F.col(vec_col).cast("array<double>")
    m = F.array_max(F.transform(vd, F.abs))
    return embeddings.select(
        F.col(id_col),
        (m / F.lit(127.0)).alias("scale"),
        F.when(m > 0, _q127_expr(vd, m))
        .otherwise(F.transform(vd, lambda x: F.lit(0)))
        .cast("array<tinyint>")
        .alias("qvec"),
    )


def _qnorm_expr(qi: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            qi, F.lit(0).cast("long"),
            lambda acc, v: acc + (v * v).cast("long"),
        ).cast("double")
    )


def quantized_topk_catalyst(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate cosine top-k via int8 quantization + exact re-rank —
    pure-Catalyst reference tier (no Python workers, plan JVM-only).

    Stage 1 scores EVERY (vector, query) pair on the quantized ints:
    approx = int_dot / (|qx| * |qq|) — the per-vector scales cancel in
    cosine, so the score is integer-derived end to end (exactly
    reproducible in SQL: q57). Stage 2 keeps the top k*rerank per query
    (approx desc, id asc) and re-ranks just those with exact float
    cosine. Output schema = brute_force_topk's. Zero-norm vectors and
    queries yield no rows.
    """
    pool_n = k * rerank
    eq = quantize_embeddings(embeddings, id_col, vec_col).where(
        F.col("scale") > 0
    ).select(F.col(id_col).alias("vec_id"), F.col("qvec").alias("xi"))
    qq = quantize_embeddings(queries, query_id_col, query_vec_col).where(
        F.col("scale") > 0
    ).select(F.col(query_id_col).alias("query_id"), F.col("qvec").alias("qi"))
    scored = (
        eq.crossJoin(F.broadcast(qq))
        .select(
            "query_id", "vec_id",
            (
                F.aggregate(
                    F.zip_with(F.col("xi"), F.col("qi"),
                               lambda a, b: (a.cast("int") * b.cast("int")).cast("long")),
                    F.lit(0).cast("long"), lambda acc, v: acc + v,
                ).cast("double")
                / (_qnorm_expr(F.col("xi").cast("array<int>"))
                   * _qnorm_expr(F.col("qi").cast("array<int>")))
            ).alias("approx"),
        )
    )
    wpool = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("vec_id"))
    pool = (
        scored.withColumn("prank", F.row_number().over(wpool))
        .where(F.col("prank") <= pool_n)
        .select("query_id", "vec_id")
    )
    e = embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("v"))
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(query_vec_col).alias("qv"))
    exact = (
        pool.join(e, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "vec_id",
                cosine_expr(F.col("v"), F.col("qv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )


def quantized_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    rerank: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """int8-quantized top-k, GEMM tier (default) — identical semantics to
    :func:`quantized_topk_catalyst` (equality-tested).

    Per Arrow batch: quantize with the same floor(t+0.5) primitive, one
    integer GEMM against the broadcast quantized query matrix, tie-safe
    batch cut at the k*rerank-th score. At 10^9 vectors the win is
    bandwidth — int8 rows are 4x smaller through scan/shuffle/cache —
    while the exact re-rank touches only ~k*rerank floats per query.
    """
    pool_n = k * rerank
    qrows = queries.select(
        F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv")
    ).collect()
    if not qrows:
        return quantized_topk_catalyst(
            embeddings, queries, k, rerank, id_col, vec_col,
            query_id_col, query_vec_col)
    qmat = np.array([r["qv"] for r in qrows], dtype=np.float64)
    qm = np.abs(qmat).max(axis=1)
    live = qm > 0
    qids = [r["query_id"] for i, r in enumerate(qrows) if live[i]]
    qmat = qmat[live]
    qi = np.floor(qmat * 127.0 / qm[live][:, None] + 0.5).astype(np.int64)
    qn = np.sqrt((qi * qi).sum(axis=1).astype(np.float64))

    e = embeddings.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"))
    qid_t = queries.select(F.col(query_id_col).alias("q")).schema["q"].dataType
    vid_t = e.schema["vec_id"].dataType
    out_schema = (f"query_id {qid_t.simpleString()}, "
                  f"vec_id {vid_t.simpleString()}, approx double")

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty or not qids:
                continue
            v = np.array(pdf["v"].tolist(), dtype=np.float64)
            m = np.abs(v).max(axis=1)
            ok = m > 0
            if not ok.any():
                continue
            # int8 is the storage/shuffle dtype; widen for the GEMM
            xi = np.floor(v[ok] * 127.0 / m[ok][:, None] + 0.5).astype(np.int8)
            xw = xi.astype(np.int64)
            xn = np.sqrt((xw * xw).sum(axis=1).astype(np.float64))
            s = (xw @ qi.T) / (xn[:, None] * qn[None, :])
            ids = pdf["vec_id"].to_numpy()[ok]
            for j, qid in enumerate(qids):
                col = s[:, j]
                if len(col) > pool_n:
                    kth = np.partition(col, -pool_n)[-pool_n]
                    keep = col >= kth
                else:
                    keep = np.ones(len(col), dtype=bool)
                yield pd.DataFrame({"query_id": qid, "vec_id": ids[keep],
                                    "approx": col[keep]})

    scored = e.mapInPandas(score, out_schema)
    wpool = Window.partitionBy("query_id").orderBy(
        F.desc("approx"), F.asc("vec_id"))
    pool = (
        scored.withColumn("prank", F.row_number().over(wpool))
        .where(F.col("prank") <= pool_n)
        .select("query_id", "vec_id")
    )
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(query_vec_col).alias("qv"))
    exact = (
        pool.join(e, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "vec_id",
                cosine_expr(F.col("v"), F.col("qv")).alias("cos"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cos", 6).alias("cos"), "rank")
    )
