"""Similarity search: brute-force exactness vs numpy, LSH recall, plans."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from newscrawler_spark.operators.similarity import (
    ann_lsh_topk,
    brute_force_topk,
    cosine_expr,
)

DIM = 16
N = 200


@pytest.fixture(scope="module")
def emb_np():
    """Clustered vectors — the near-dup ANN use case: 40 centers × 5 noisy
    members, so true top-5 neighbors have cosine ≈ 0.95+ (LSH's working
    regime; i.i.d. gaussian points have no meaningful neighbors)."""
    rng = np.random.default_rng(42)
    centers = rng.standard_normal((N // 5, DIM))
    v = np.repeat(centers, 5, axis=0) + 0.15 * rng.standard_normal((N, DIM))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


@pytest.fixture(scope="module")
def emb_df(spark, emb_np):
    return spark.createDataFrame(
        [(i, emb_np[i].tolist()) for i in range(N)],
        "vec_id long, embedding array<double>",
    )


@pytest.fixture(scope="module")
def queries_df(spark, emb_np):
    return spark.createDataFrame(
        [(i, emb_np[i].tolist()) for i in (0, 7, 42)],
        "query_id long, query_vec array<double>",
    )


def test_cosine_expr_matches_numpy(spark, emb_np):
    df = spark.createDataFrame(
        [(emb_np[0].tolist(), emb_np[1].tolist())],
        "a array<double>, b array<double>",
    )
    got = df.select(cosine_expr(F.col("a"), F.col("b")).alias("c")).first().c
    want = float(emb_np[0] @ emb_np[1])
    assert abs(got - want) < 1e-9


def test_brute_force_topk_exact(spark, emb_df, queries_df, emb_np):
    got = brute_force_topk(emb_df, queries_df, k=5).collect()
    for qid in (0, 7, 42):
        sims = emb_np @ emb_np[qid]
        want = sorted(range(N), key=lambda i: (-round(sims[i], 9), i))[:5]
        rows = sorted((r for r in got if r.query_id == qid), key=lambda r: r.rank)
        assert [r.vec_id for r in rows] == want
        assert rows[0].vec_id == qid and abs(rows[0].cos - 1.0) < 1e-6


def test_ann_lsh_recall(spark, emb_df, queries_df, emb_np):
    """LSH top-5 must recover most of the true top-5 (multi-probe, 4
    tables × 8 planes on 200 vecs ⇒ high recall)."""
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb_df, queries_df, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ann_lsh_topk(emb_df, queries_df, k=5, dim=DIM).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.6
    # the query vector itself always lands in its own bucket
    assert all((q, q) in approx for q in (0, 7, 42))


def test_ann_md5_planes_recall_and_range(spark, emb_df, queries_df):
    """The md5-derived plane family (driver-oracle path, q41) behaves
    like the PCG64 default: components in [-1, 1), self-hit guaranteed,
    recall in the same regime."""
    from newscrawler_spark.operators.similarity import _md5_planes

    planes = _md5_planes(DIM, 8, 0)
    flat = [x for p in planes for x in p]
    assert all(-1.0 <= x < 1.0 for x in flat)
    assert len(set(flat)) > len(flat) * 0.99     # no degenerate repeats
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb_df, queries_df, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ann_lsh_topk(
            emb_df, queries_df, k=5, dim=DIM, plane_source="md5"
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.6
    assert all((q, q) in approx for q in (0, 7, 42))


def test_lsh_near_dup_pairs_recall_and_precision(spark, emb_df):
    """The scale near-dup-pairs path: output ⊆ exact pairs (verify stage
    kills every FP) with high recall on clustered data."""
    from newscrawler_spark.operators.dedup import embedding_cosine_pairs
    from newscrawler_spark.operators.similarity import embedding_near_dups_lsh

    exact = {
        (r.id1, r.id2): r.cos
        for r in embedding_cosine_pairs(emb_df, 0.9).collect()
    }
    approx = {
        (r.id1, r.id2): r.cos
        for r in embedding_near_dups_lsh(
            emb_df, threshold=0.9, dim=DIM, n_planes=6, n_tables=6
        ).collect()
    }
    assert set(approx) <= set(exact)              # no false positives
    assert len(approx) / max(len(exact), 1) >= 0.7  # recall
    for k, v in approx.items():
        assert abs(v - exact[k]) < 2e-6


def test_ivf_topk_recall_and_determinism(spark, emb_df, queries_df):
    """IVF coarse quantizer (trained, iters=2): probing 4 of 8 lists must
    recover most of the true top-5 on clustered data, the query vector
    always finds itself, and centroid training is deterministic."""
    from newscrawler_spark.operators.similarity import (
        ivf_build_centroids,
        ivf_topk,
    )

    c1 = ivf_build_centroids(emb_df, n_lists=8, dim=DIM, iters=2)
    c2 = ivf_build_centroids(emb_df, n_lists=8, dim=DIM, iters=2)
    assert c1 == c2
    exact = {
        (r.query_id, r.vec_id)
        for r in brute_force_topk(emb_df, queries_df, k=5).collect()
    }
    approx = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(emb_df, queries_df, c1, k=5, n_probe=4).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.6
    assert all((q, q) in approx for q in (0, 7, 42))


def test_ivf_gemm_assignment_equals_expr(spark, emb_df, queries_df):
    """The O(1)-plan GEMM assignment/probe path (IVF-realistic k) returns
    the same results as the literal-expression oracle tier — same argmax
    and probe tie-breaks."""
    from newscrawler_spark.operators.similarity import (
        ivf_build_centroids,
        ivf_topk,
    )

    ce = ivf_build_centroids(emb_df, n_lists=8, dim=DIM, iters=2,
                             assign="expr")
    cg = ivf_build_centroids(emb_df, n_lists=8, dim=DIM, iters=2,
                             assign="gemm")
    assert all(
        abs(a - b) < 1e-9 for ca, cb in zip(ce, cg) for a, b in zip(ca, cb)
    )
    r_expr = {
        (r.query_id, r.vec_id, r.cos, r.rank)
        for r in ivf_topk(emb_df, queries_df, ce, k=5, n_probe=4,
                          assign="expr").collect()
    }
    r_gemm = {
        (r.query_id, r.vec_id, r.cos, r.rank)
        for r in ivf_topk(emb_df, queries_df, ce, k=5, n_probe=4,
                          assign="gemm").collect()
    }
    assert r_expr == r_gemm


def test_similarity_plans_are_jvm_only(spark, emb_df, queries_df):
    from newscrawler_spark.operators.similarity import (
        ivf_build_centroids,
        ivf_topk,
    )

    from newscrawler_spark.operators.similarity import brute_force_topk_catalyst

    cents = ivf_build_centroids(emb_df, n_lists=4, dim=DIM, iters=0)
    for df in (
        brute_force_topk_catalyst(emb_df, queries_df, k=3),
        ann_lsh_topk(emb_df, queries_df, k=3, dim=DIM, n_tables=2,
                     method="catalyst"),
        ivf_topk(emb_df, queries_df, cents, k=3, n_probe=2),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan and "Pandas" not in plan


def test_brute_force_gemm_equals_catalyst(spark, emb_df, queries_df):
    """The GEMM default and the Catalyst oracle tier agree row-for-row
    (same rounded cos, same vec_id tie-breaks) — the batch threshold cut
    keeps ties so no global-top-k member can be dropped locally."""
    from newscrawler_spark.operators.similarity import brute_force_topk_catalyst

    for k in (1, 5, 17):
        g = {(r.query_id, r.vec_id, r.cos, r.rank)
             for r in brute_force_topk(emb_df, queries_df, k=k).collect()}
        c = {(r.query_id, r.vec_id, r.cos, r.rank)
             for r in brute_force_topk_catalyst(
                 emb_df, queries_df, k=k).collect()}
        assert g == c and len(g) > 0


def test_gemm_bucketing_equals_catalyst(spark, emb_df, queries_df):
    """The GEMM bucket path (default) and the Catalyst expression path
    produce identical results for both the top-k and the pairs operator,
    for both plane families — the sign decisions agree because |dot| is
    far from round-off on real data (the oracle's own assumption)."""
    from newscrawler_spark.operators.dedup import embedding_cosine_pairs  # noqa: F401
    from newscrawler_spark.operators.similarity import embedding_near_dups_lsh

    for src in ("pcg64", "md5"):
        g = {
            (r.query_id, r.vec_id, r.cos, r.rank)
            for r in ann_lsh_topk(emb_df, queries_df, k=5, dim=DIM,
                                  plane_source=src, method="gemm").collect()
        }
        c = {
            (r.query_id, r.vec_id, r.cos, r.rank)
            for r in ann_lsh_topk(emb_df, queries_df, k=5, dim=DIM,
                                  plane_source=src, method="catalyst").collect()
        }
        assert g == c, src
        gp = {
            (r.id1, r.id2, r.cos)
            for r in embedding_near_dups_lsh(
                emb_df, threshold=0.9, dim=DIM, n_planes=6, n_tables=6,
                plane_source=src, method="gemm").collect()
        }
        cp = {
            (r.id1, r.id2, r.cos)
            for r in embedding_near_dups_lsh(
                emb_df, threshold=0.9, dim=DIM, n_planes=6, n_tables=6,
                plane_source=src, method="catalyst").collect()
        }
        assert gp == cp, src


def test_quantize_embeddings_roundtrip_and_range(spark, emb_df, emb_np):
    from newscrawler_spark.operators.similarity import quantize_embeddings

    rows = quantize_embeddings(emb_df).collect()
    assert len(rows) == N
    by_id = {r.vec_id: r for r in rows}
    for i in (0, 7, 42):
        r = by_id[i]
        q = np.array(r.qvec, dtype=np.float64)
        assert np.abs(q).max() == 127  # symmetric range fully used
        back = r.scale * q
        # per-component error bounded by half a quantization step
        assert np.abs(back - emb_np[i]).max() <= r.scale / 2 + 1e-12


def test_quantized_topk_gemm_equals_catalyst(spark, emb_df, queries_df):
    """The int8 GEMM default and the Catalyst reference tier agree
    row-for-row: the floor(t+0.5) primitive and the integer-derived
    approx score make the candidate pool deterministic, and the exact
    re-rank is shared."""
    from newscrawler_spark.operators.similarity import (
        quantized_topk, quantized_topk_catalyst)

    for k, rr in ((1, 4), (5, 4), (5, 2)):
        g = {(r.query_id, r.vec_id, r.cos, r.rank)
             for r in quantized_topk(emb_df, queries_df, k=k, rerank=rr).collect()}
        c = {(r.query_id, r.vec_id, r.cos, r.rank)
             for r in quantized_topk_catalyst(
                 emb_df, queries_df, k=k, rerank=rr).collect()}
        assert g == c and len(g) > 0


def test_quantized_topk_recall_vs_exact(spark, emb_df, queries_df):
    """int8 approximation + 4x re-rank pool recovers the exact top-5 on
    the clustered corpus (quantization error ~0.4% per component is far
    below the cluster/noise cosine gap)."""
    from newscrawler_spark.operators.similarity import quantized_topk

    exact = {(r.query_id, r.vec_id) for r in
             brute_force_topk(emb_df, queries_df, k=5).collect()}
    quant = {(r.query_id, r.vec_id) for r in
             quantized_topk(emb_df, queries_df, k=5, rerank=4).collect()}
    assert len(quant & exact) >= len(exact) * 0.9


def test_quantized_topk_zero_vector_edge(spark, queries_df):
    from newscrawler_spark.operators.similarity import quantized_topk

    df = spark.createDataFrame(
        [(0, [0.0] * DIM), (1, [1.0] + [0.0] * (DIM - 1))],
        "vec_id long, embedding array<double>",
    )
    got = quantized_topk(df, queries_df, k=2).collect()
    # the zero vector never appears; the unit vector can
    assert all(r.vec_id != 0 for r in got)
