"""Composed curation pipeline (operators/curate.py): the chain's
stitching semantics against the engine's own stage outputs, plus
hand-crafted docs that must drop at each specific stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.operators.curate import curate_corpus
from newscrawler_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
from newscrawler_spark.operators.textstats import quality_stats

BASE = (
    "the city council approved the annual water budget after a long public "
    "debate about school funding and road repair plans for the region"
)
DOCS = [
    (0, BASE),
    (1, BASE),                                     # exact dup of 0 → stage-1 drop
    (2, BASE.replace("road", "rail")),             # near dup of 0 → stage-3 drop
    (3, "!!! ??? ... ;;; :::"),                    # junk → stage-2 drop
    (4, "an unrelated report on harbor traffic and airport expansion with "
        "sufficient length and ordinary punctuation to pass the quality gate "
        "while sharing no shingles with the council budget stories at all"),
    (5, "another distinct article discussing museum festival funding and "
        "theatre renovation projects across the coastal districts this year "
        "written plainly enough to clear every quality threshold easily"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_curate_stage_semantics(spark, docs_df):
    out = curate_corpus(docs_df, quality_min=0.5, near_dup_threshold=0.5)
    rows = {r.doc_id: r for r in out.collect()}
    # 1 drops as exact dup, 3 as junk, 2 as near-dup of surviving 0
    assert set(rows) == {0, 4, 5}
    for r in rows.values():
        assert r.quality_score >= 0.5
        assert r.n_tokens > 0 and r.lang_pred is not None


def test_curate_equals_stagewise_composition(spark, docs_df):
    """survivors == (exact keepers ∩ quality pass) minus {doc with a
    verified anchor edge computed over that set} — recomputed from the
    engine's own stage operators, independent of curate.py's joins.
    Also checks the legacy pairwise mode against its own rule."""
    from newscrawler_spark.operators.dedup import minhash_lsh_anchor_edges

    keep = {r.keep_id for r in exact_dedup(docs_df).collect()}
    good = {
        r.doc_id
        for r in quality_stats(docs_df).collect()
        if r.quality_score >= 0.5
    }
    s2 = keep & good
    s2_df = docs_df.where(F.col("doc_id").isin([int(i) for i in s2]))
    edges = minhash_lsh_anchor_edges(s2_df, threshold=0.5).collect()
    expected = s2 - {r.doc_id for r in edges}
    got = {r.doc_id for r in
           curate_corpus(docs_df, quality_min=0.5,
                         near_dup_threshold=0.5).collect()}
    assert got == expected

    pairs = minhash_lsh_pairs(s2_df, threshold=0.5).collect()
    expected_pairs_mode = s2 - {r.id2 for r in pairs}
    got_pairs_mode = {r.doc_id for r in
                      curate_corpus(docs_df, quality_min=0.5,
                                    near_dup_threshold=0.5,
                                    near_dup="pairs").collect()}
    assert got_pairs_mode == expected_pairs_mode


def test_curate_plan_no_python_row_udfs(spark, docs_df):
    """The whole chain stays JVM-side (Catalyst expressions + joins):
    no BatchEvalPython / python row UDF stage in the physical plan."""
    plan = (
        curate_corpus(docs_df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan
    assert "PythonUDF" not in plan


def test_stratified_sample_deterministic_and_monotone(spark):
    from newscrawler_spark.operators.curate import stratified_sample

    df = spark.createDataFrame(
        [(i, "t", ["en", "de", "fr"][i % 3]) for i in range(600)],
        "doc_id long, text string, lang string",
    )
    half = stratified_sample(df, {"en": 0.5, "de": 1.0, "fr": 0.0})
    rows = half.collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert "fr" not in by_lang                      # rate 0 drops all
    assert len(by_lang["de"]) == 200                # rate 1 keeps all
    assert 60 <= len(by_lang["en"]) <= 140          # ~rate 0.5 of 200
    # deterministic: re-run identical
    again = {r.doc_id for r in stratified_sample(
        df, {"en": 0.5, "de": 1.0, "fr": 0.0}).collect()}
    assert again == {r.doc_id for r in rows}
    # monotone: raising en's rate keeps every previously kept doc
    more = {r.doc_id for r in stratified_sample(
        df, {"en": 0.8, "de": 1.0, "fr": 0.0}).collect() if r.lang == "en"}
    assert by_lang["en"] <= more
    # salted epoch differs
    salted = {r.doc_id for r in stratified_sample(
        df, {"en": 0.5, "de": 1.0, "fr": 0.0}, salt="e1").collect()
        if r.lang == "en"}
    assert salted != by_lang["en"]


def test_boilerplate_span_removal(spark):
    from newscrawler_spark.operators.curate import boilerplate_span_removal

    banner = "subscribe to our newsletter"   # 4 tokens: spans differ by pos
    df = spark.createDataFrame(
        [
            (0, f"{banner} alpha story one today"),
            (1, f"{banner} beta tale two tomorrow"),
            (2, f"{banner} gamma piece three yesterday"),
            (3, f"{banner} delta item four never"),
            (4, "clean document with no banner at all present"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in
           boilerplate_span_removal(df, span=3, max_df=2).collect()}
    # the shared leading chunk "subscribe to our" (df=4 > 2) is dropped
    # from every carrier; per-doc tails survive
    for i in range(4):
        assert got[i].n_kept == got[i].n_spans - 1
        assert not got[i].cleaned_text.startswith("subscribe")
        assert "newsletter" in got[i].cleaned_text  # chunk 2 is per-doc
    # order preserved on the clean doc, text unchanged
    assert got[4].cleaned_text == "clean document with no banner at all present"
    assert got[4].n_kept == got[4].n_spans
    assert (got[5].n_spans, got[5].n_kept, got[5].cleaned_text) == (0, 0, "")


def test_normalize_text_every_class(spark):
    """One instance of every character class the normalizer maps, with
    the expected output hand-derived (ground truth, not a second
    implementation) — the same derivation the q68 oracle states."""
    from newscrawler_spark.operators.curate import normalize_text

    dirty = (
        "  start  mid​dle ‘q’ “Q” "
        "a–b—c …\r\n\t tabbed   line \r\n\n\n\nend"
        "‍Z\x07  "
    )
    df = spark.createDataFrame(
        [(0, dirty), (1, ""), (2, " \t \n "), (3, "already clean")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in normalize_text(df).collect()}
    assert got[0].norm_text == (
        "start middle 'q' \"Q\" a-b-c ...\ntabbed line\n\nendZ"
    )
    assert got[0].orig_chars == len(dirty)
    assert got[0].norm_chars == len(got[0].norm_text)
    assert got[1].norm_text == "" and got[2].norm_text == ""
    assert got[3].norm_text == "already clean"


def test_normalize_text_idempotent(spark):
    """normalize ∘ normalize ≡ normalize: already-normal text is a
    fixpoint — the property that makes re-running the stage safe."""
    from newscrawler_spark.operators.curate import normalize_text

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate([
            "plain words", "a\nb\n\nc", "x - y ... z 'q' \"Q\"",
            " lead", "tail…", "mid\r\nrow\tcol   wide",
        ])],
        "doc_id long, text string",
    )
    once = normalize_text(df).select(
        "doc_id", F.col("norm_text").alias("text"))
    twice = normalize_text(once)
    joined = {r.doc_id: r for r in normalize_text(df).join(
        twice.select("doc_id", F.col("norm_text").alias("again")),
        "doc_id").collect()}
    for r in joined.values():
        assert r.norm_text == r.again


def test_line_dedup_scoped(spark):
    """A line hot in one scope is dropped only there; order preserved;
    a doc reduced to nothing rebuilds as empty."""
    from newscrawler_spark.operators.curate import line_dedup

    nav = "home | about | contact"
    df = spark.createDataFrame(
        [
            (0, "a.com", f"{nav}\nstory zero\nthe end"),
            (1, "a.com", f"{nav}\nstory one"),
            (2, "a.com", f"{nav}\nstory two"),
            (3, "b.com", f"{nav}\nquoted once here"),   # nav df=1 on b.com
            (4, "a.com", nav),                           # nothing survives
        ],
        "doc_id long, source string, text string",
    )
    got = {r.doc_id: r for r in
           line_dedup(df, min_df=3, scope_col="source").collect()}
    assert got[0].cleaned_text == "story zero\nthe end"
    assert (got[0].n_lines, got[0].n_kept) == (3, 2)
    assert got[1].cleaned_text == "story one"
    assert got[3].cleaned_text == f"{nav}\nquoted once here"  # scoped!
    assert (got[4].n_kept, got[4].cleaned_text) == (0, "")


def test_line_dedup_plan_jvm_only(spark):
    """No Python row UDFs anywhere in the line_dedup plan."""
    from newscrawler_spark.operators.curate import line_dedup

    df = spark.createDataFrame(
        [(0, "s", "a\nb")], "doc_id long, source string, text string")
    plan = line_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


# ---------------------------------------------------------------- mix ops


def _py_key(doc_id: int, salt: str = "") -> int:
    """Python twin of shards.shard_hash % 1e6 (the mix-op hash key)."""
    import hashlib

    h = hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()
    return int(h[:14], 16) % 1_000_000


@pytest.fixture(scope="module")
def budget_df(spark):
    # 60 docs, token counts 1..13 cycling, scores with TIES (i % 7) so
    # the doc_id tiebreak is load-bearing in the ranking.
    rows = [
        (i, " ".join(f"w{j}" for j in range((i * 5) % 13 + 1)),
         float(i % 7))
        for i in range(60)
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, quality_score double")


def test_select_token_budget_equals_naive(spark, budget_df):
    """Distributed two-level prefix sum ≡ the naive closed form."""
    from newscrawler_spark.operators.curate import select_token_budget

    rows = budget_df.select("doc_id", "quality_score", "text").collect()
    ranked = sorted(rows, key=lambda r: (-r.quality_score, r.doc_id))
    cum, expected = 0, {}
    for r in ranked:
        n = len(r.text.split())
        cum += n
        if cum > 150:
            break
        expected[r.doc_id] = (n, cum)

    got = {
        r.doc_id: (r.n_tokens, r.cum_tokens)
        for r in select_token_budget(
            budget_df, budget=150, order_col="quality_score", num_buckets=4
        ).collect()
    }
    assert got == expected


def test_select_token_budget_bucket_invariance(spark, budget_df):
    """The selected set is defined by the total order alone — bucket
    count (hence range-partitioner boundaries) must not matter."""
    from newscrawler_spark.operators.curate import select_token_budget

    outs = [
        sorted(
            (r.doc_id, r.cum_tokens)
            for r in select_token_budget(
                budget_df, budget=150, order_col="quality_score",
                num_buckets=b,
            ).collect()
        )
        for b in (1, 3, 16)
    ]
    assert outs[0] == outs[1] == outs[2] and len(outs[0]) > 0


def test_select_token_budget_reuses_exchange(spark, budget_df):
    """The offsets branch must hang off a ReusedExchange at runtime —
    the corpus is scanned/scored/range-shuffled ONCE; only the ≤B bucket
    totals take the extra SinglePartition hop. (AQE stage reuse — the
    static plan shows two branches; the executed plan must not.)"""
    from newscrawler_spark.operators.curate import select_token_budget

    df = select_token_budget(
        budget_df, budget=150, order_col="quality_score", num_buckets=4
    )
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    head = plan.split("+- == Initial Plan ==")[0]
    assert "ReusedExchange" in head


def test_select_token_budget_edges(spark, budget_df):
    from newscrawler_spark.operators.curate import select_token_budget

    total = sum(len(r.text.split()) for r in budget_df.collect())
    assert (
        select_token_budget(budget_df, budget=total,
                            order_col="quality_score").count()
        == budget_df.count()
    )
    assert (
        select_token_budget(budget_df, budget=0,
                            order_col="quality_score").count() == 0
    )
    # ascending=True flips the ranking: lowest score fills first
    asc = select_token_budget(
        budget_df, budget=30, order_col="quality_score", ascending=True
    ).collect()
    assert asc and all(r.quality_score == 0.0 for r in asc[:1])


def test_upsample_mix_closed_form(spark):
    """Per-doc epoch counts match the floor(r) + hash-frac rule, epochs
    are exactly 0..n-1, and raising a rate only ADDS rows."""
    from newscrawler_spark.operators.curate import upsample_mix

    df = spark.createDataFrame(
        [(i, ["a", "b", "c"][i % 3]) for i in range(90)],
        "doc_id long, source string",
    )
    rates = {"a": 2.5, "b": 0.25, "c": 0.0}
    out = upsample_mix(df, rates).collect()
    by_doc: dict[int, list[int]] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r.epoch)
    for i in range(90):
        s = ["a", "b", "c"][i % 3]
        r = rates[s]
        n = int(r) + (1 if _py_key(i) < round((r - int(r)) * 1e6) else 0)
        got = sorted(by_doc.get(i, []))
        assert got == list(range(n)), (i, s, got, n)
    # monotone: 2.5 -> 3.25 for 'a' is a strict superset
    up = upsample_mix(df, {**rates, "a": 3.25}).collect()
    assert {(r.doc_id, r.epoch) for r in out} <= {
        (r.doc_id, r.epoch) for r in up
    }


def test_temperature_rates_closed_form(spark):
    from newscrawler_spark.operators.curate import (
        temperature_mix,
        temperature_rates,
    )

    counts = {"en": 800, "zh": 100, "fr": 100}
    # alpha=1: every stratum scaled identically (T / N)
    r1 = temperature_rates(counts, alpha=1.0, target_total=2000)
    assert all(abs(v - 2.0) < 1e-12 for v in r1.values())
    # alpha=0: uniform p_s = 1/S, so expected totals are equal per stratum
    r0 = temperature_rates(counts, alpha=0.0, target_total=3000)
    per_stratum = {s: r0[s] * n for s, n in counts.items()}
    assert all(abs(v - 1000.0) < 1e-9 for v in per_stratum.values())
    # any alpha: expected total == target
    rh = temperature_rates(counts, alpha=0.5, target_total=1234)
    assert abs(sum(rh[s] * n for s, n in counts.items()) - 1234) < 1e-6
    # composed operator runs and lifts the small strata
    df = spark.createDataFrame(
        [(i, "en" if i < 160 else ("zh" if i < 180 else "fr"))
         for i in range(200)],
        "doc_id long, lang string",
    )
    mix = temperature_mix(df, alpha=0.5, target_total=400,
                          strata_col="lang")
    got = {r.strata: r.n for r in
           mix.groupBy("strata").agg(F.count("*").alias("n")).collect()}
    assert got["zh"] / 20 > got["en"] / 160  # flattened toward uniform


def test_hash_split_stability_and_bounds(spark):
    """A doc's split never changes as the corpus grows; boundaries are
    the cumulative-weight thresholds on the salted hash key."""
    from newscrawler_spark.operators.curate import hash_split

    small = spark.range(0, 300).withColumnRenamed("id", "doc_id")
    big = spark.range(0, 900).withColumnRenamed("id", "doc_id")
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    s_map = {r.doc_id: r.split for r in hash_split(small, w).collect()}
    b_map = {r.doc_id: r.split for r in hash_split(big, w).collect()}
    assert all(b_map[d] == s for d, s in s_map.items())
    for r in hash_split(small, w).collect():
        k = _py_key(r.doc_id, "split")
        want = "train" if k < 800_000 else ("val" if k < 900_000 else "test")
        assert (r.split_key, r.split) == (k, want)
    # weights normalize: {8, 1, 1} ≡ {0.8, 0.1, 0.1}
    n_map = {r.doc_id: r.split for r in
             hash_split(small, {"train": 8, "val": 1, "test": 1}).collect()}
    assert n_map == s_map


def test_mix_ops_plans_jvm_only(spark, budget_df):
    """No Python row UDFs in any mix-op plan; upsample/hash_split are
    shuffle-free pure projections."""
    from newscrawler_spark.operators.curate import (
        hash_split,
        select_token_budget,
        upsample_mix,
    )

    df = spark.createDataFrame([(0, "s")], "doc_id long, source string")
    for frame in (
        select_token_budget(budget_df, budget=10,
                            order_col="quality_score"),
        upsample_mix(df, {"s": 1.5}),
        hash_split(df),
    ):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "PythonUDF" not in plan
    for frame in (upsample_mix(df, {"s": 1.5}), hash_split(df)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


def test_upsample_epochs_spread_across_shards(spark):
    """The mix → shard-writer composition contract: salting the shard
    assignment by epoch spreads a doc's repeated copies over different
    shards (same epoch ≡ same shard, different epochs decorrelate), so
    repeats don't stack in one trainer rank's slice."""
    from newscrawler_spark.operators.curate import upsample_mix
    from newscrawler_spark.operators.shards import shard_hash

    df = spark.createDataFrame(
        [(i, "s") for i in range(400)], "doc_id long, source string"
    )
    mixed = upsample_mix(df, {"s": 3.0})  # 3 epochs each
    sharded = mixed.withColumn(
        "shard",
        F.pmod(
            shard_hash(
                F.concat_ws("#", F.col("doc_id").cast("string"),
                            F.col("epoch").cast("string"))
            ),
            F.lit(8),
        ),
    )
    per_doc = (
        sharded.groupBy("doc_id")
        .agg(F.countDistinct("shard").alias("n_shards"))
        .collect()
    )
    # with 3 epochs over 8 shards, E[distinct] ≈ 2.6; all-stacked = 1
    avg = sum(r.n_shards for r in per_doc) / len(per_doc)
    assert avg > 2.2
    # determinism: same epoch → same shard on a re-run
    again = {(r.doc_id, r.epoch): r.shard for r in sharded.collect()}
    assert all(
        again[(r.doc_id, r.epoch)] == r.shard for r in sharded.collect()
    )


# ---------------------------------------------------------------- q74 op


def _dsir_docs(spark):
    rows = []
    for i in range(12):
        rows.append((i, "market stocks earnings shares trading " * 4, "finance"))
    for i in range(12, 24):
        rows.append((i, "football match goal season league score " * 4, "sports"))
    # mixed doc: half finance vocabulary
    rows.append((24, "market stocks football match earnings goal", "sports"))
    rows.append((25, "", "sports"))
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_dsir_scores_separate_domains(spark):
    """Target-domain docs score strictly above off-domain docs; the
    mixed doc lands in between; empty docs emit no row."""
    from newscrawler_spark.operators.curate import dsir_importance

    got = {r["doc_id"]: r["score_fp"]
           for r in dsir_importance(_dsir_docs(spark), "finance",
                                    buckets=512).collect()}
    assert 25 not in got
    fin = [got[i] for i in range(12)]
    spo = [got[i] for i in range(12, 24)]
    assert min(fin) > got[24] > max(spo)


def test_dsir_deterministic_across_partitionings(spark):
    """score_fp is an INTEGER sum of fixed-point bucket weights — the
    same corpus partitioned 1/3/7 ways gives byte-identical scores
    (a float score would drift with partition order)."""
    from newscrawler_spark.operators.curate import dsir_importance

    docs = _dsir_docs(spark)
    outs = []
    for parts in (1, 3, 7):
        r = dsir_importance(docs.repartition(parts), "finance", buckets=128)
        outs.append(sorted((x["doc_id"], x["n_feats"], x["score_fp"])
                           for x in r.collect()))
    assert outs[0] == outs[1] == outs[2]


def test_dsir_plan_jvm_only(spark):
    from newscrawler_spark.operators.curate import dsir_importance

    plan = dsir_importance(_dsir_docs(spark), "finance")._jdf \
        .queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
