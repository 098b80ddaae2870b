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
