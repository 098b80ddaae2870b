"""Text-analysis operators: token counts, quality stats, langid,
fingerprints — native plans with value spot-checks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newscrawler_spark.operators.textstats import (
    bpe_token_estimate_expr,
    fingerprint,
    langid,
    quality_stats,
    token_count_expr,
)

DOCS = [
    (0, "The cat sat on the mat, and the dog barked.", "en"),
    (1, "Der Hund ist nicht in der Schule und das Kind war da.", "de"),
    (2, "Le chat est dans la maison et les enfants sont pas là.", "fr"),
    (3, "El perro es un animal que vive en la casa por años.", "es"),
    (4, "我是人，他有不同的看法，就在这里。", "zh"),
    (5, "", "en"),
    (6, "ALL CAPS SHOUTING!!! ???", "en"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t, _l in DOCS], "doc_id long, text string"
    )


def test_token_count(spark, docs_df):
    got = {
        r.doc_id: r.n
        for r in docs_df.select("doc_id", token_count_expr("text").alias("n")).collect()
    }
    assert got[0] == len(DOCS[0][1].split())
    assert got[5] == 0


def test_bpe_estimate_positive_and_monotonic(spark, docs_df):
    got = {
        r.doc_id: r.n
        for r in docs_df.select(
            "doc_id", bpe_token_estimate_expr("text").alias("n")
        ).collect()
    }
    assert got[5] == 0
    assert got[0] > 0
    # punctuation adds pieces
    assert got[6] >= 7


def test_quality_stats(spark, docs_df):
    rows = {r.doc_id: r for r in quality_stats(docs_df).collect()}
    assert rows[5].n_tokens == 0 and rows[5].quality_score <= 0.5
    assert rows[6].upper_ratio > 0.3
    assert rows[0].stopword_ratio > 0.2       # several 'the'
    assert 0.0 <= rows[0].quality_score <= 1.0
    assert rows[0].quality_score > rows[6].quality_score


def test_langid(spark, docs_df):
    got = {r.doc_id: r.lang_pred for r in langid(docs_df).collect()}
    for i, _t, lang in DOCS[:5]:
        assert got[i] == lang, (i, got[i], lang)


def test_fingerprint_stability_and_shift(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (1, "PREFIX alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "totally different words entirely here now okay then yes no"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r.fingerprint for r in fingerprint(df, n=5).collect()}
    assert rows[0] is not None and len(rows[0]) == 32
    # shingle-min fingerprint survives a small prefix shift...
    assert rows[0] == rows[1]
    # ...but differs for unrelated content
    assert rows[0] != rows[2]


def test_textstats_plans_are_jvm_only(spark, docs_df):
    for df in (quality_stats(docs_df), langid(docs_df), fingerprint(docs_df)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Python" not in plan


def test_repetition_stats_signals(spark):
    from newscrawler_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam"),           # one bigram repeated
            (1, "every word here is completely different today"),
            (2, "ab cd ab cd ab cd ab cd"),                  # period-2 loop
            (3, "one"),                                      # < 2 tokens
            (4, ""),                                         # empty
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert len(got) == 5
    # doc 0: 5 bigrams, all "spam spam"
    assert got[0].n_2grams == 5 and got[0].top2_count == 5
    assert got[0].top2_frac == 1.0 and got[0].dup3_frac > 0.7
    # doc 1: no repeats at all
    assert got[1].top2_count == 1 and got[1].dup3_frac == 0.0
    # doc 2: loop — "ab cd" appears 4 times of 7 bigrams
    assert got[2].n_2grams == 7 and got[2].top2_count == 4
    assert abs(got[2].top2_frac - round(4 / 7, 6)) < 1e-9
    # short/empty docs: all-zero, still present
    for i in (3, 4):
        assert (got[i].n_2grams, got[i].top2_count,
                got[i].top2_frac, got[i].dup3_frac) == (0, 0, 0.0, 0.0)


def test_repetition_stats_plan_is_jvm_only(spark):
    from newscrawler_spark.operators.textstats import repetition_stats

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    plan = repetition_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_pii_scrub_cases(spark):
    from newscrawler_spark.operators.textstats import pii_scrub

    df = spark.createDataFrame(
        [
            (0, "mail a.b+c@sub.ex.org and d@e.io now"),
            (1, "server at 192.168.0.1 and 10.0.0.255 up"),
            (2, "call +1 555-010-4477 or 0800 11 22 33 today"),
            (3, "clean text with no identifiers at all"),
            (4, "mixed: x@y.com from 8.8.8.8 tel 555-123-9876"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert got[0].n_emails == 2 and got[0].scrubbed_text == \
        "mail <EMAIL> and <EMAIL> now"
    assert got[1].n_ips == 2 and got[1].scrubbed_text == \
        "server at <IP> and <IP> up"
    assert got[2].n_phones == 2 and got[2].scrubbed_text == \
        "call <PHONE> or <PHONE> today"
    assert (got[3].n_emails, got[3].n_ips, got[3].n_phones) == (0, 0, 0)
    assert got[3].scrubbed_text == "clean text with no identifiers at all"
    # fixed order: email first, then IP, then phone — each on the
    # previous stage's output, no double counting
    r = got[4]
    assert (r.n_emails, r.n_ips, r.n_phones) == (1, 1, 1)
    assert r.scrubbed_text == "mixed: <EMAIL> from <IP> tel <PHONE>"
    assert got[5].scrubbed_text == "" and got[5].n_emails == 0


def test_pii_scrub_plan_is_jvm_only(spark):
    from newscrawler_spark.operators.textstats import pii_scrub

    df = spark.createDataFrame([(0, "a@b.co")], "doc_id long, text string")
    plan = pii_scrub(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan


def test_pii_phone_hardening_adversarial(spark):
    """r5 guards: ISO dates, page ranges, long identifiers, separator
    soup, and digit-adjacent runs must survive; widened separator
    forms ((555) 123-4567, dotted) must scrub."""
    from newscrawler_spark.operators.textstats import pii_scrub

    df = spark.createDataFrame(
        [
            (0, "published on 2026-08-19 and updated 1999-01-02"),
            (1, "see pages 100-110 and 205-209 of the appendix"),
            (2, "order ref 12345678901234567890 confirmed"),
            (3, "spaced 5 -  - 5 - 5 - 0 - 1 - 2 - 3 - 4 junk"),
            (4, "call (555) 123-4567 or 555.123.4567 now"),
            (5, "meeting 2026-08-19 12:34 room 4b"),
            (6, "card 4111 1111 1111 1111 stays for the luhn pass"),
            (7, "id98765432109876543210x trailing"),
            (8, "plain +4915512345678 works"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    for i in (0, 1, 2, 3, 5, 6, 7):
        assert got[i].n_phones == 0, (i, got[i].scrubbed_text)
        assert "<PHONE>" not in got[i].scrubbed_text
    assert got[4].n_phones == 2
    assert got[4].scrubbed_text == "call <PHONE> or <PHONE> now"
    assert got[8].n_phones == 1
    assert got[8].scrubbed_text == "plain <PHONE> works"


def test_luhn_check_known_cards(spark):
    """Ground-truth Luhn vectors: classic valid test PANs, off-by-one
    invalids, separator stripping, empty/digit-free input."""
    from pyspark.sql import functions as F

    from newscrawler_spark.operators.textstats import luhn_check_expr

    cases = [
        (0, "4111111111111111", True),     # classic Visa test number
        (1, "4242424242424242", True),
        (2, "4111111111111112", False),    # flipped check digit
        (3, "79927398713", True),          # the canonical Luhn example
        (4, "79927398710", False),
        (5, "4111-1111 1111 1111", True),  # separators stripped first
        (6, "", False),
        (7, "no digits here", False),
        (8, "0", True),                    # single zero: sum 0 % 10 == 0
    ]
    df = spark.createDataFrame(
        [(i, s) for i, s, _ in cases], "i long, card string")
    got = {r.i: r.v for r in
           df.select("i", luhn_check_expr("card").alias("v")).collect()}
    for i, s, want in cases:
        assert got[i] == want, (i, s)
    # plan stays JVM-side
    plan = (
        df.select(luhn_check_expr("card").alias("v"))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def test_gopher_rules_designed_cases(spark):
    """Each rule is exercised by a doc engineered to fail exactly it."""
    from newscrawler_spark.operators.textstats import gopher_rules

    good = ("the quick brown fox likes to be part of and that they have "
            "fun with plain words " * 4).strip()          # 64 words, passes
    rows = [
        (1, good),
        (2, "too short to pass"),                          # rule_words
        (3, " ".join(["supercalifragilistic"] * 60)),      # word len + stopwords
        (4, good + " " + "# " * 20),                       # symbol ratio
        (5, "\n".join(["- bullet line of the to be"] * 30)),  # bullets
        (6, "\n".join([f"{w} trailing of the to be..." for w in ["a"]*30])),  # ellipsis
        (7, good.replace("words", "1234 5678")),           # still passes
        (8, ""),                                           # empty: fails
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in gopher_rules(df).collect()}

    assert got[1]["passes"]
    assert not got[2]["rule_words"] and not got[2]["passes"]
    assert not got[3]["rule_word_len"] and not got[3]["rule_stopwords"]
    assert not got[4]["rule_symbols"] and got[4]["rule_words"]
    assert not got[5]["rule_bullets"]
    assert not got[6]["rule_ellipsis"]
    assert got[7]["passes"]
    assert not got[8]["passes"] and got[8]["n_words"] == 0


def test_gopher_rules_plan_jvm_only(spark):
    from newscrawler_spark.operators.textstats import gopher_rules

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = gopher_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
