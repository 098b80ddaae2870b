"""Composed training-data curation pipeline over a documents corpus.

What a 100 TB training-data pipeline actually runs is not one dedup
operator but a CHAIN: exact dedup → quality gate → near-dup removal →
annotated survivors. This module composes the already-audited operators
(dedup.exact_dedup, textstats.quality_stats/langid,
dedup.minhash_lsh_pairs) into that chain with deterministic,
SQL-expressible semantics so the whole composition is two-sided
checkable (driver q49):

1. exact tier: keep one doc per md5(text) group (the min doc_id —
   dedup.exact_dedup's keeper rule);
2. quality gate: survivors need quality_score ≥ ``quality_min``
   (textstats.quality_stats' rounded score, same value the oracle
   computes);
3. near-dup tier (default ``near_dup="anchor"``): MinHash-LSH ANCHOR
   edges among the remaining docs — every (band, bh) bucket nominates
   its smallest id as the anchor and only (anchor, member) candidates
   are Jaccard-verified, O(docs·bands) candidates regardless of how
   degenerate the dup clusters are (dedup.minhash_lsh_anchor_edges). A
   doc is dropped iff it has a verified anchor edge, i.e. some bucket's
   minimum id (which itself survived stages 1–2 — buckets are built
   over the survivor set) has true Jaccard ≥ threshold with it. For a
   cluster of identical texts exactly the min id survives.
   ``near_dup="pairs"`` keeps the legacy pairwise smaller-id-wins rule
   (dedup.minhash_lsh_pairs): deterministic but quadratic per bucket —
   a web-scale boilerplate cluster of m docs expands m²/2 candidate
   pairs, so it is no longer the default.

Scale shape: stage 1 is one hash-shuffle groupBy; stage 2 is a pure
Catalyst projection; stage 3 is O(docs·bands) shuffle end to end
(banding, one min-aggregate, one bucket join, the verify), run on the
REDUCED survivor set; the joins stitching stages are semi/anti joins on
doc_id. No stage is quadratic, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newscrawler_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_anchor_edges,
    minhash_lsh_pairs,
)
from newscrawler_spark.operators.textstats import langid, quality_stats


def curate_corpus(
    documents: DataFrame,
    quality_min: float = 0.5,
    near_dup_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    hasher: str = "xxhash64",
    near_dup: str = "anchor",
) -> DataFrame:
    """documents(doc_id, text, ...) → surviving
    (doc_id, n_tokens, quality_score, lang_pred).

    ``hasher`` parameterizes the MinHash family exactly as in
    minhash_lsh_pairs: 'xxhash64' (default, cheapest per-row) or 'md5'
    (ANSI-SQL-reproducible — the driver-oracle tier). ``near_dup``
    picks the stage-3 drop rule: 'anchor' (default, bounded at any
    skew) or 'pairs' (legacy pairwise rule — quadratic per bucket)."""
    if near_dup not in ("anchor", "pairs"):
        raise ValueError("near_dup must be 'anchor' or 'pairs'")
    keep = exact_dedup(documents, id_col=id_col, text_col=text_col).select(
        F.col("keep_id").alias(id_col)
    )
    q = quality_stats(documents, id_col=id_col, text_col=text_col).select(
        id_col, "n_tokens", "quality_score"
    )
    good = q.where(F.col("quality_score") >= quality_min).select(id_col)
    s2 = (
        documents.join(keep, id_col, "left_semi")
        .join(good, id_col, "left_semi")
    )
    if near_dup == "anchor":
        edges = minhash_lsh_anchor_edges(
            s2, threshold=near_dup_threshold, id_col=id_col,
            text_col=text_col, hasher=hasher,
        )
        dropped = edges.select(F.col("doc_id").alias(id_col)).distinct()
    else:
        pairs = minhash_lsh_pairs(
            s2, threshold=near_dup_threshold, id_col=id_col,
            text_col=text_col, hasher=hasher,
        )
        dropped = pairs.select(F.col("id2").alias(id_col)).distinct()
    survivors = s2.join(dropped, id_col, "left_anti")
    lang = langid(documents, id_col=id_col, text_col=text_col).select(
        id_col, "lang_pred"
    )
    return (
        survivors.select(id_col)
        .join(q, id_col)
        .join(lang, id_col)
        .select(id_col, "n_tokens", "quality_score", "lang_pred")
    )


def stratified_sample(
    documents: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum hash sampling — the data-mixing step
    (e.g. keep 50% of English, 10% of zh, all of de).

    keep iff base56(md5(salt|id)) % 1_000_000 < round(rate * 1e6): a
    pure projection + filter (no shuffle, no RNG state), reproducible
    across runs/engines, and monotone in rate — raising a stratum's rate
    keeps every previously kept doc (hash-threshold sampling), so mixes
    can be tuned without churning the corpus. Rates land in the plan as
    integer thresholds (round(rate*1e6) computed in Python), so both
    engines compare the same BIGINTs — no float in the predicate.
    """
    from newscrawler_spark.operators.shards import shard_hash

    thresholds = {k: int(round(v * 1_000_000)) for k, v in rates.items()}
    mapping = F.create_map(
        *[x for k, v in thresholds.items() for x in (F.lit(k), F.lit(v))]
    )
    thr = F.coalesce(
        mapping[F.col(strata_col)],
        F.lit(int(round(default_rate * 1_000_000))),
    )
    key = F.pmod(shard_hash(id_col, salt), F.lit(1_000_000))
    return documents.withColumn("sample_key", key).where(
        F.col("sample_key") < thr
    )


def boilerplate_span_removal(
    documents: DataFrame,
    span: int = 3,
    max_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Global boilerplate removal, C4-style: drop every ``span``-token
    chunk that occurs in more than ``max_df`` documents, rebuild each
    text from its surviving chunks in original order.

    Returns (doc_id, n_spans, n_kept, cleaned_text). Scale shape: one
    explode + groupBy for the global span document-frequencies
    (O(tokens) shuffle); the drop is an anti-join against the hot span
    set (df > max_df) — usually small (boilerplate is rare as a
    distinct string), but unbounded in principle at aggressive max_df on
    a web corpus, so the join STRATEGY is left to Catalyst/AQE
    (broadcast when it fits, shuffled hash join otherwise) rather than
    forced; one groupBy(doc) rebuild shuffle. Nothing is quadratic and
    no mandatory driver-side state.
    """
    from newscrawler_spark.operators.dedup import tokens_expr

    toks = tokens_expr(text_col)
    n_chunks = F.ceil(F.size(toks) / F.lit(float(span))).cast("int")
    spans = F.when(
        F.size(toks) > 0,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.concat_ws(" ", F.slice(toks, i * span + 1, span)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    base = documents.select(F.col(id_col), spans.alias("sps"))
    e = base.select(
        id_col, F.posexplode("sps").alias("pos", "s")
    )
    hot = (
        e.groupBy("s")
        .agg(F.countDistinct(id_col).alias("df"))
        .where(F.col("df") > max_df)
        .select("s")
    )
    kept = e.join(hot, "s", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda x: x["s"],
            ),
        ).alias("cleaned_text"),
    )
    return (
        base.select(id_col, F.size("sps").cast("long").alias("n_spans"))
        .join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_spans",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("cleaned_text", F.lit("")).alias("cleaned_text"),
        )
    )
