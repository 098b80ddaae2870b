"""Dedup operators: exact, n-gram Jaccard, MinHash+LSH recall, SimHash,
embedding cosine — native plans, verified against brute-force in-Python."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.operators.dedup import (
    embedding_cosine_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_dup_groups,
    simhash_expr,
    simhash_hamming_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1, "the quick brown fox jumps over the lazy dog near the river bank today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy dog near the river bank yesterday"),  # near dup
    (3, "completely different text about spark partitions and shuffle behavior"),
    (4, "another unrelated document discussing bloom filters and hash tables"),
    (5, "the quick brown fox jumps over the lazy dog near the river bend today"),  # near dup
    (6, "tiny"),
]


def _py_jaccard(a: str, b: str, n: int = 3) -> float:
    def sh(t):
        toks = t.lower().split()
        if len(toks) < n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    A, B = sh(a), sh(b)
    return len(A & B) / len(A | B)


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs_df):
    rows = exact_dedup(docs_df).collect()
    groups = {r.keep_id: r.n_dups for r in rows}
    assert groups[0] == 2          # docs 0+1 collapse, keeper = min id
    assert sum(groups.values()) == len(DOCS)
    assert len(rows) == len(DOCS) - 1


def test_ngram_jaccard_matches_python(spark, docs_df):
    got = {
        (r.id1, r.id2): r.jaccard
        for r in ngram_jaccard_pairs(docs_df, threshold=0.5).collect()
    }
    want = {}
    for (i, a), (j, b) in itertools.combinations(DOCS, 2):
        jac = _py_jaccard(a, b)
        if jac >= 0.5:
            want[(i, j)] = jac
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-6, k


def test_minhash_lsh_recall_and_precision(spark, docs_df):
    """LSH verified output ⊆ exact pairs; recall 100% on this tiny corpus
    with 64 perms / 16 bands (threshold curve ≈ (1/16)^(1/4) ≈ 0.5)."""
    exact = {
        (r.id1, r.id2)
        for r in ngram_jaccard_pairs(docs_df, threshold=0.6).collect()
    }
    lsh = {
        (r.id1, r.id2)
        for r in minhash_lsh_pairs(docs_df, threshold=0.6).collect()
    }
    assert lsh <= exact or lsh == exact
    assert len(lsh) >= len(exact) * 0.99  # full recall expected here


def test_simhash_exact_dups_collide(spark, docs_df):
    groups = simhash_dup_groups(docs_df).collect()
    assert any(set(g.ids) >= {0, 1} for g in groups)


def test_simhash_near_dups_close(spark, docs_df):
    rows = docs_df.select("doc_id", simhash_expr("text").alias("sh")).collect()
    sig = {r.doc_id: r.sh for r in rows}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    assert ham(sig[0], sig[2]) <= 12      # near dups: few bits differ
    assert ham(sig[0], sig[3]) > ham(sig[0], sig[2])  # unrelated: more bits


def test_prefix_filter_equals_plain_postings(spark, docs_df):
    """Prefix filtering is an EXACT optimization: identical pairs and
    jaccard values to the unfiltered postings join, at several
    thresholds (including ones exercising the ceil boundary)."""
    for t in (0.3, 0.5, 0.6, 0.7, 0.8):
        fast = {
            (r.id1, r.id2): r.jaccard
            for r in ngram_jaccard_pairs(
                docs_df, threshold=t, prefix_filter=True
            ).collect()
        }
        ref = {
            (r.id1, r.id2): r.jaccard
            for r in ngram_jaccard_pairs(
                docs_df, threshold=t, prefix_filter=False
            ).collect()
        }
        assert fast == ref, t


BOILER = "subscribe to our newsletter for daily updates follow us on social media"


def _boiler_text(i: int) -> str:
    k = i // 2  # docs 2k and 2k+1 are twins differing in ONE final token
    tail = "today" if i % 2 == 0 else "tonight"
    return (f"{BOILER} story {k} about topic{k} said source{k} in region{k} "
            f"on day{k} with quote{k} and detail{k} number{k} {tail}")


@pytest.fixture(scope="module")
def boiler_df(spark):
    """Boilerplate-heavy corpus: every doc shares a 12-token banner, so the
    banner shingles have df == n_docs and the plain postings self-join is
    quadratic on them — the shape the auto probe must catch. Twin docs
    (2k, 2k+1) differ in one trailing token ⇒ 15 genuine near-dup pairs
    (jaccard 25/27 ≈ 0.926), findable by the rare-shingle prefixes alone."""
    rows = [(i, _boiler_text(i)) for i in range(30)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_posting_skew_probe_decisions(spark, boiler_df):
    from newscrawler_spark.operators.dedup import posting_skew_probe

    # boilerplate corpus: hottest shingle appears in EVERY doc -> skewed
    assert posting_skew_probe(boiler_df, skew_sample=1.0) is True
    # near-unique shingles: hottest df == 1 over 40 docs -> not skewed
    uniq = spark.createDataFrame(
        [(i, f"w{i}a w{i}b w{i}c w{i}d w{i}e") for i in range(40)],
        "doc_id long, text string",
    )
    assert posting_skew_probe(uniq, skew_sample=1.0) is False


def test_auto_prefix_on_boilerplate(spark, boiler_df):
    """auto picks the prefix filter on the skewed corpus and stays EXACT:
    same pairs as the plain join, while the prefix candidate space is a
    small fraction of the plain join's quadratic hot-posting blowup."""
    from newscrawler_spark.operators.dedup import shingles_expr

    t = 0.5
    auto = {
        (r.id1, r.id2): r.jaccard
        for r in ngram_jaccard_pairs(
            boiler_df, threshold=t, prefix_filter="auto", skew_sample=1.0
        ).collect()
    }
    plain = {
        (r.id1, r.id2): r.jaccard
        for r in ngram_jaccard_pairs(
            boiler_df, threshold=t, prefix_filter=False
        ).collect()
    }
    assert auto == plain
    # exactly the 15 twin pairs qualify (jaccard 25/27), no banner-only pair
    assert set(auto) == {(2 * k, 2 * k + 1) for k in range(15)}

    # the measurable win: candidate pairs examined by each path
    sh = boiler_df.select(
        F.col("doc_id").alias("id"), shingles_expr("text", 3).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    posts = sh.select("id", "n_sh", F.explode("sh").alias("s"))
    plain_cand = (
        posts.alias("x").join(posts.alias("y"), "s")
        .where(F.col("x.id") < F.col("y.id"))
        .select("x.id", "y.id").distinct().count()
    )
    from pyspark.sql import Window

    freq = posts.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("id").orderBy(F.asc("df"), F.asc("s"))
    pref = (
        posts.join(freq, "s")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= F.col("n_sh")
               - F.ceil(F.lit(t) * F.col("n_sh") - F.lit(1e-9)) + 1)
    )
    pref_cand = (
        pref.alias("x").join(pref.alias("y"), "s")
        .where(F.col("x.id") < F.col("y.id"))
        .select("x.id", "y.id").distinct().count()
    )
    n = boiler_df.count()
    assert plain_cand == n * (n - 1) // 2          # every pair collides
    assert pref_cand < plain_cand // 4             # prefixes shed the banner


def test_minhash_md5_parameterization_equivalent(spark, docs_df):
    """The md5-parameterized family (driver-oracle path, q32) finds the
    same verified near-dup pairs as the xxhash64 default on a corpus where
    LSH recall is full — the hash family changes, the semantics don't."""
    md5_pairs = {
        (r.id1, r.id2)
        for r in minhash_lsh_pairs(docs_df, threshold=0.6, hasher="md5").collect()
    }
    exact = {
        (r.id1, r.id2)
        for r in ngram_jaccard_pairs(docs_df, threshold=0.6).collect()
    }
    assert md5_pairs == exact


def test_simhash_md5_60bit_range_and_collisions(spark, docs_df):
    rows = docs_df.select(
        "doc_id", simhash_expr("text", bits=60, hasher="md5").alias("sh")
    ).collect()
    sig = {r.doc_id: r.sh for r in rows}
    assert all(0 <= v < (1 << 60) for v in sig.values())
    assert sig[0] == sig[1]                      # exact dups collide
    groups = simhash_dup_groups(docs_df, bits=60, hasher="md5").collect()
    assert any(set(g.ids) >= {0, 1} for g in groups)


@pytest.mark.parametrize("k", [0, 1, 2, 3])
def test_simhash_hamming_pairs_exact(spark, docs_df, k):
    """Block-rotation candidate generation is EXACT for Hamming <= k:
    compare against brute-force over collected signatures."""
    rows = docs_df.select("doc_id", simhash_expr("text").alias("sh")).collect()
    sig = {r.doc_id: r.sh for r in rows}
    ham = lambda a, b: bin((a ^ b) & ((1 << 64) - 1)).count("1")  # noqa: E731
    want = {
        (i, j, ham(sig[i], sig[j]))
        for i, j in itertools.combinations(sorted(sig), 2)
        if ham(sig[i], sig[j]) <= k
    }
    got = {
        (r.id1, r.id2, r.hamming)
        for r in simhash_hamming_pairs(docs_df, k=k).collect()
    }
    assert got == want


def test_embedding_cosine_pairs(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.999, 0.04, 0.0]),   # near dup of 0
        (2, [0.0, 1.0, 0.0]),
        (3, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    pairs = {(r.id1, r.id2) for r in embedding_cosine_pairs(df, 0.95).collect()}
    assert pairs == {(0, 1)}


def test_embedding_blocked_equals_catalyst(spark):
    """The block-GEMM default must return the identical pair set + cosines
    as the pure-Catalyst nested-loop reference (both are exact tiers)."""
    import random

    rng = random.Random(7)
    vecs = [
        (i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(120)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    blocked = {
        (r.id1, r.id2): r.cos
        for r in embedding_cosine_pairs(df, 0.2, method="blocked").collect()
    }
    catalyst = {
        (r.id1, r.id2): r.cos
        for r in embedding_cosine_pairs(df, 0.2, method="catalyst").collect()
    }
    assert set(blocked) == set(catalyst)
    assert all(abs(blocked[k] - catalyst[k]) < 2e-6 for k in blocked)


def test_dedup_plans_are_jvm_only(spark, docs_df):
    for df in (
        exact_dedup(docs_df),
        ngram_jaccard_pairs(docs_df, 0.5),
        minhash_lsh_pairs(docs_df, 0.5),
        simhash_dup_groups(docs_df),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


def test_decontaminate_overlap_counts(spark):
    from newscrawler_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # contains bench 3-grams
            (2, "totally unrelated words in here"),
            (3, "alpha beta gamma completely new tail"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta zeta")], "doc_id long, text string")
    got = {r.doc_id: r.n_overlap for r in
           decontaminate(docs, bench, n=3).collect()}
    # doc 1 shares "alpha beta gamma" and "beta gamma delta"; doc 3 one
    assert got == {1: 2, 3: 1}


def test_decontaminate_clean_corpus_empty(spark, docs_df):
    from newscrawler_spark.operators.dedup import decontaminate

    bench = spark.createDataFrame(
        [(0, "zz yy xx ww vv uu tt")], "doc_id long, text string")
    assert decontaminate(docs_df, bench, n=3).count() == 0


# ---------------------------------------------------------------- r5:
# anchor-rule edges, bucket caps, connected components — the bounded
# near-dup path that closed the round-4 verdict's LSH hot-bucket hole.


def test_anchor_edges_subset_of_pairs(spark, docs_df):
    """Every verified anchor edge is a verified LSH pair (the anchor
    path trades recall for boundedness, never adds false positives),
    and identical docs always anchor to the cluster minimum."""
    from newscrawler_spark.operators.dedup import minhash_lsh_anchor_edges

    pairs = {
        (r.id1, r.id2): r.jaccard
        for r in minhash_lsh_pairs(docs_df, threshold=0.5).collect()
    }
    edges = minhash_lsh_anchor_edges(docs_df, threshold=0.5).collect()
    for e in edges:
        assert (e.anchor_id, e.doc_id) in pairs
        assert abs(pairs[(e.anchor_id, e.doc_id)] - e.jaccard) < 1e-9
    # docs 0 and 1 are byte-identical: 1 must carry an anchor edge to 0
    assert any(e.doc_id == 1 and e.anchor_id == 0 for e in edges)


def test_anchor_edges_bounded_on_degenerate_cluster(spark):
    """A degenerate cluster of m identical docs — the web-scale
    boilerplate shape that makes the pair join quadratic — yields
    exactly m-1 anchor edges (one per non-minimal member, all to the
    global min), and curate_corpus keeps exactly the min id."""
    from newscrawler_spark.operators.curate import curate_corpus
    from newscrawler_spark.operators.dedup import minhash_lsh_anchor_edges

    m = 2000
    df = spark.range(m).select(
        F.col("id").alias("doc_id"),
        F.lit(
            "breaking news update click here subscribe to our newsletter "
            "today for more stories and daily alerts from the local desk"
        ).alias("text"),
    )
    edges = minhash_lsh_anchor_edges(df, threshold=0.5).collect()
    assert len(edges) == m - 1
    assert all(e.anchor_id == 0 and abs(e.jaccard - 1.0) < 1e-9
               for e in edges)
    surv = curate_corpus(df).collect()
    assert [r.doc_id for r in surv] == [0]


def test_pairs_bucket_cap_deterministic(spark, docs_df):
    """max_bucket large enough ⇒ identical to the uncapped join; a tight
    cap keeps pairs only among each bucket's smallest ids."""
    full = {
        (r.id1, r.id2): r.jaccard
        for r in minhash_lsh_pairs(docs_df, threshold=0.5).collect()
    }
    capped_loose = {
        (r.id1, r.id2): r.jaccard
        for r in minhash_lsh_pairs(docs_df, threshold=0.5,
                                   max_bucket=10_000).collect()
    }
    assert capped_loose == full
    tight = {
        (r.id1, r.id2)
        for r in minhash_lsh_pairs(docs_df, threshold=0.5,
                                   max_bucket=2).collect()
    }
    assert tight <= set(full)
    with pytest.raises(ValueError):
        minhash_lsh_pairs(docs_df, max_bucket=1)


def test_lsh_bucket_stats_counts(spark):
    """The overflow audit: m identical docs put m rows in each of the 16
    band buckets; a cap of c reports 16 overflowing buckets and
    16*(m-c) truncated ids."""
    from newscrawler_spark.operators.dedup import lsh_bucket_stats

    m, cap = 50, 8
    df = spark.range(m).select(
        F.col("id").alias("doc_id"),
        F.lit("one common boilerplate line shared by every document "
              "in this synthetic degenerate cluster").alias("text"),
    )
    s = lsh_bucket_stats(df, max_bucket=cap).collect()[0]
    assert s.n_buckets == 16 and s.n_multi_buckets == 16
    assert s.max_bucket_size == m
    assert s.n_buckets_over == 16
    assert s.n_ids_truncated == 16 * (m - cap)
    s2 = lsh_bucket_stats(df).collect()[0]
    assert s2.n_buckets_over == 0 and s2.n_ids_truncated == 0


def test_connected_components_transitive_chain(spark):
    """a~b, b~c with no a~c edge → one cluster labeled min; disjoint
    components keep their own minima; a self-contained pair too."""
    from newscrawler_spark.operators.dedup import connected_components

    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "id1 long, id2 long",
    )
    got = {r.id: r.cluster_id for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_path(spark):
    """A 12-node path graph needs ~diameter iterations — exercises the
    convergence loop well past one hop."""
    from newscrawler_spark.operators.dedup import connected_components

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(5, 17)], "id1 long, id2 long")
    got = {r.id: r.cluster_id for r in connected_components(e).collect()}
    assert got == {i: 5 for i in range(5, 18)}


def test_connected_components_max_iter_raises(spark):
    from newscrawler_spark.operators.dedup import connected_components

    e = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 8)], "id1 long, id2 long")
    with pytest.raises(RuntimeError):
        connected_components(e, max_iter=2)


def test_near_dup_clusters_on_corpus(spark, docs_df):
    """Cluster ids over the real fixture corpus: members of a cluster
    are mutually reachable through verified anchor edges, labels are
    cluster minima, and docs without any edge are absent."""
    from newscrawler_spark.operators.dedup import (
        minhash_lsh_anchor_edges,
        near_dup_clusters,
    )

    edges = minhash_lsh_anchor_edges(docs_df, threshold=0.5).collect()
    nodes = {e.doc_id for e in edges} | {e.anchor_id for e in edges}
    got = {r.doc_id: r.cluster_id for r in
           near_dup_clusters(docs_df, threshold=0.5).collect()}
    assert set(got) == nodes
    for cid in set(got.values()):
        members = {d for d, c in got.items() if c == cid}
        assert cid == min(members)


# ---------------------------------------------------------------- q73 op


def _subspan_docs(spark):
    shared = "alpha bravo charlie delta echo foxtrot golf hotel india"
    return spark.createDataFrame(
        [
            (1, f"one two {shared} nine ten"),
            (2, f"{shared} completely different ending here"),
            (3, "no overlap with anything else in this tiny corpus"),
            (4, "tiny"),
            (5, ""),
        ],
        "doc_id long, text string",
    )


def test_substring_span_dedup_excises_shared_span(spark):
    """The 9-token shared span disappears from BOTH docs wherever it
    sits (prefix/suffix kept); short/empty/unique docs untouched."""
    from newscrawler_spark.operators.dedup import substring_span_dedup

    got = {
        r["doc_id"]: r
        for r in substring_span_dedup(_subspan_docs(spark), k=5, min_df=2)
        .collect()
    }
    assert got[1]["cleaned_text"] == "one two nine ten"
    assert got[1]["n_removed"] == 9
    assert got[2]["cleaned_text"] == "completely different ending here"
    assert got[2]["n_removed"] == 9
    assert got[3]["n_removed"] == 0
    assert got[4]["cleaned_text"] == "tiny" and got[4]["n_tokens"] == 1
    assert got[5]["n_tokens"] == 0 and got[5]["cleaned_text"] == ""


def test_substring_span_dedup_within_doc_repeat_survives(spark):
    """min_df counts DISTINCT documents: a phrase repeated twice inside
    ONE doc is not cross-document duplication and must survive."""
    from newscrawler_spark.operators.dedup import substring_span_dedup

    docs = spark.createDataFrame(
        [(1, "echo alpha bravo charlie delta echo alpha bravo charlie delta"),
         (2, "entirely distinct words that never repeat anything at all")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           substring_span_dedup(docs, k=5, min_df=2).collect()}
    assert got[1]["n_removed"] == 0
    assert got[2]["n_removed"] == 0


def test_substring_span_dedup_hashed_tier_equivalent(spark, docs_df):
    """xxhash64 window keys (the slim-shuffle 100-TB tier) produce the
    identical result to exact string keys on a real corpus slice."""
    from newscrawler_spark.operators.dedup import substring_span_dedup

    exact = sorted(
        (r["doc_id"], r["n_removed"], r["cleaned_text"])
        for r in substring_span_dedup(docs_df, k=5, min_df=2).collect()
    )
    hashed = sorted(
        (r["doc_id"], r["n_removed"], r["cleaned_text"])
        for r in substring_span_dedup(
            docs_df, k=5, min_df=2, hash_grams=True
        ).collect()
    )
    assert exact == hashed


def test_substring_span_dedup_plan_jvm_only(spark):
    """No Python row UDFs anywhere in the plan."""
    from newscrawler_spark.operators.dedup import substring_span_dedup

    plan = substring_span_dedup(_subspan_docs(spark))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_decontaminate_fuzzy_catches_edited_copy(spark):
    """The fuzzy tier's reason to exist: a lightly-edited benchmark
    copy that exact n-gram containment would score low slips through
    at high exact thresholds but is caught by near-dup similarity;
    unrelated docs are not flagged."""
    from newscrawler_spark.operators.dedup import decontaminate_fuzzy

    bench_text = ("what is the capital of france the capital of france "
                  "is paris which has been the capital since 987")
    edited = bench_text.replace("987", "the tenth century").replace(
        "which has", "and it has")
    bench = spark.createDataFrame([(100, bench_text)],
                                  "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, edited),
         (2, "completely unrelated text about cooking pasta at home "
             "with fresh tomatoes and basil leaves")],
        "doc_id long, text string",
    )
    got = decontaminate_fuzzy(corpus, bench, threshold=0.5).collect()
    assert {(r["doc_id"], r["bench_id"]) for r in got} == {(1, 100)}
    assert all(r["jaccard"] >= 0.5 for r in got)


def test_decontaminate_fuzzy_never_cross_corpus_quadratic(spark):
    """Candidates come only from bucket matches: two corpus docs that
    are near-dups of EACH OTHER but unlike any benchmark doc produce
    zero rows (corpus-internal pairs are dedup's job, not this op's)."""
    from newscrawler_spark.operators.dedup import decontaminate_fuzzy

    twin = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = spark.createDataFrame(
        [(1, twin), (2, twin + " extra")], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(100, "unrelated benchmark question about astronomy and stars "
               "in the night sky")], "doc_id long, text string")
    assert decontaminate_fuzzy(corpus, bench, threshold=0.2).count() == 0


def test_substring_span_dedup_monotone_in_min_df(spark, docs_df):
    """Raising min_df can only shrink the removed set: every position
    duplicated across >=3 docs is duplicated across >=2."""
    from newscrawler_spark.operators.dedup import substring_span_dedup

    r2 = {r["doc_id"]: r["n_removed"]
          for r in substring_span_dedup(docs_df, k=5, min_df=2).collect()}
    r3 = {r["doc_id"]: r["n_removed"]
          for r in substring_span_dedup(docs_df, k=5, min_df=3).collect()}
    assert all(r3[d] <= r2[d] for d in r2)
    assert sum(r3.values()) <= sum(r2.values())
