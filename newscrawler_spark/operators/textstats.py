"""Text-analysis operators for a training-data pipeline (driver brief):
language-ID, quality scoring, token counting, document fingerprinting.

All native Catalyst column expressions (split / filter / array fns /
regexp) — JVM-side, SQL-expressible, so every one has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from newscrawler_spark.operators.dedup import shingles_expr, tokens_expr

# Tiny marker lexicons for n-gram-free heuristic language ID. Deliberately
# minimal: the operator is the point (argmax over per-language evidence),
# not lexicon quality.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"],
    "fr": ["le", "la", "les", "et", "est", "pas", "une", "des", "dans", "pour"],
    "es": ["el", "la", "los", "que", "de", "y", "es", "en", "un", "por"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}

STOPWORDS = LANG_MARKERS["en"]

_PUNCT_RE = r"[\.,;:!\?\(\)\[\]\"'«»—–-]"


def token_count_expr(text: Column | str) -> Column:
    """Whitespace token count (cheap proxy; BPE-ish estimate below)."""
    return F.size(tokens_expr(text))


def bpe_token_estimate_expr(text: Column | str) -> Column:
    """BPE-ish subword-count estimate without a tokenizer model:
    count of regex word pieces + digits + punctuation marks, with long
    words contributing ceil(len/6) pieces — a standard serving-cost proxy.
    """
    c = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(F.lower(c), r"[^\p{L}\p{N}]+"), lambda t: t != "")
    word_pieces = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 6.0).cast("long"),
    )
    punct = F.length(c) - F.length(F.regexp_replace(c, _PUNCT_RE, ""))
    return (word_pieces + punct).alias("bpe_tokens")


def quality_stats(documents: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Per-document quality features + composite score.

    n_chars, n_tokens, mean_token_len, punct_ratio, stopword_ratio,
    upper_ratio, quality_score ∈ [0,1]. All rounded for stable oracles.
    """
    c = F.col(text_col)
    toks = tokens_expr(text_col)
    n_tok = F.size(toks)
    n_chars = F.length(c)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = n_chars - F.length(F.regexp_replace(c, _PUNCT_RE, ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    mean_tok = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tok > 0, n_stop / n_tok).otherwise(F.lit(0.0))
    upper_ratio = F.when(n_chars > 0, n_upper / n_chars).otherwise(F.lit(0.0))
    # composite: long enough, not punctuation soup, not shouting —
    # clamped linear mix (each term in [0,1])
    score = (
        F.least(n_tok / F.lit(50.0), F.lit(1.0)) * 0.5
        + (F.lit(1.0) - F.least(punct_ratio * 5, F.lit(1.0))) * 0.25
        + (F.lit(1.0) - F.least(upper_ratio * 5, F.lit(1.0))) * 0.25
    )
    return documents.select(
        F.col(id_col),
        n_chars.alias("n_chars_calc"),
        n_tok.alias("n_tokens"),
        F.round(mean_tok, 4).alias("mean_token_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(upper_ratio, 4).alias("upper_ratio"),
        F.round(score, 4).alias("quality_score"),
    )


def langid(documents: DataFrame, id_col: str = "doc_id",
           text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax over marker-hit counts.

    For space-free scripts (zh) markers are matched as substrings of the
    raw text; for the rest as whole tokens. Ties → lexicographically
    first language (deterministic, oracle-friendly). Returns
    (id, lang_pred, lang_hits).
    """
    toks = tokens_expr(text_col)
    c = F.lower(F.col(text_col))
    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = LANG_MARKERS[lang]
        if lang == "zh":
            hits = sum(
                (F.length(c) - F.length(F.regexp_replace(c, m, ""))) / F.length(F.lit(m))
                for m in markers
            ).cast("int")
        else:
            arr = F.array(*[F.lit(m) for m in markers])
            hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
        scores.append(F.struct(hits.alias("hits"), F.lit(lang).alias("lang")))
    best = F.array_max(
        F.array(*[
            F.struct(
                s["hits"].alias("hits"),
                # invert lang for max() so ties pick the FIRST language
                F.lit(len(LANG_MARKERS) - i).alias("ord"),
                s["lang"].alias("lang"),
            )
            for i, s in enumerate(scores)
        ])
    )
    return documents.select(
        F.col(id_col),
        best["lang"].alias("lang_pred"),
        best["hits"].alias("lang_hits"),
    )


def fingerprint(documents: DataFrame, n: int = 5, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Document fingerprint: min md5 over word n-gram shingles.

    A rolling-hash-style content signature that is stable under small
    shifts and SQL-expressible (md5 exists in DuckDB) → exact oracle.
    """
    sh = shingles_expr(text_col, n)
    return documents.select(
        F.col(id_col),
        F.array_min(F.transform(sh, lambda s: F.md5(s))).alias("fingerprint"),
    )


def ngrams_all_expr(text: Column | str, n: int) -> Column:
    """ALL word n-grams in order, duplicates kept (unlike shingles_expr,
    which de-dups for set semantics) — repetition analysis needs the
    multiset. Docs with < n tokens yield an empty array."""
    from newscrawler_spark.operators.dedup import bind_once

    def body(toks):
        idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
        grams = F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)))
        return F.when(F.size(toks) >= n, grams).otherwise(
            F.array().cast("array<string>"))

    # bind the token array once — referenced naively in the per-index
    # lambda, the split re-runs per gram position (O(tokens²) per doc;
    # same trap shingles_expr documents)
    return bind_once(tokens_expr(text), body)


def repetition_stats(documents: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """C4/Gopher-style within-document repetition signals.

    Per doc: n_2grams (total bigram count), top2_count (occurrences of
    the most frequent bigram), top2_frac = top2_count / n_2grams (the
    "top n-gram fraction" repetition filter), dup3_frac = fraction of
    trigram occurrences that are repeats (1 - distinct/total). Boiler-
    plate and looping generations score high on both; clean prose stays
    low. dup3_frac is a pure projection (no shuffle); top2 needs the
    per-(doc, gram) counts — ONE explode + groupBy shuffle, O(tokens),
    the same shape at 100 TB.
    """
    g2 = ngrams_all_expr(text_col, 2)
    g3 = ngrams_all_expr(text_col, 3)
    base = documents.select(
        F.col(id_col),
        F.size(g2).cast("long").alias("n_2grams"),
        F.when(
            F.size(g3) > 0,
            F.round(
                F.lit(1.0)
                - F.size(F.array_distinct(g3)) / F.size(g3).cast("double"),
                6,
            ),
        ).otherwise(F.lit(0.0)).alias("dup3_frac"),
    )
    counts = (
        documents.select(F.col(id_col), F.explode(g2).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy(id_col)
        .agg(F.max("c").alias("top2_count"))
    )
    return (
        base.join(counts, id_col, "left")
        .select(
            id_col,
            "n_2grams",
            F.coalesce("top2_count", F.lit(0)).cast("long").alias("top2_count"),
            F.when(
                F.col("n_2grams") > 0,
                F.round(
                    F.coalesce("top2_count", F.lit(0))
                    / F.col("n_2grams").cast("double"),
                    6,
                ),
            ).otherwise(F.lit(0.0)).alias("top2_frac"),
            "dup3_frac",
        )
    )


PII_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_IP_RE = r"\b(\d{1,3}\.){3}\d{1,3}\b"
# Phone-like runs, hardened (r5): 7-15 digits separated by at most TWO
# of [space . ( ) -] each (so separator soup and unbounded runs can't
# match), optional leading +/(, and NEITHER preceded NOR followed by a
# continuation of the run (a digit within two separator chars on either
# side) — the symmetric guards make the 15-digit cap real: a separated
# 16+-digit card number can't satisfy the pattern by shedding a group
# at either end. Also must not start exactly like an ISO date
# (dddd-dd-dd). Both lookbehinds are bounded-length (Java-regex legal).
PII_PHONE_RE = (
    r"(?<!\d[ .()-])(?<!\d[ .()-]{2})(?<!\d)(?!\d{4}-\d{2}-\d{2}(?!\d))"
    r"[+(]?\d(?:[ .()-]{0,2}\d){6,14}(?![ .()-]{0,2}\d)"
)


def pii_scrub(documents: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """PII redaction pass for a training corpus: emails, IPv4 addresses,
    and phone-like digit runs are counted and replaced with typed
    placeholder tokens.

    Returns (doc_id, n_emails, n_ips, n_phones, scrubbed_text). Fixed
    scrub ORDER — emails, then IPs, then phones — each stage matching on
    the previous stage's output, so an IP inside an email is counted
    once (as the email) and digit runs freed by earlier redactions can't
    be double-counted. Pure Catalyst (regexp_extract_all +
    regexp_replace): JVM-side, one projection, no shuffle — the 100 TB
    shape is a map stage.

    Recall/precision boundary (document before training on the output —
    this is a regex scrubber, not an NER model):

    - CAUGHT as phone: 7-15 digit runs with ≤ 2 space/dot/paren/hyphen
      separator chars between digits — "+1 555 0123", "(555) 123-4567",
      "555.123.4567", bare "5551234567".
    - NOT matched (guards, r5): digit runs adjacent to other digits,
      >15-digit identifiers (credit cards are 16 — see
      :func:`luhn_check_expr` for that class), ISO dates
      ("2026-08-19", with or without a following time), short page
      ranges ("100-110": only 6 digits), separator soup
      ("5 -  - 5 - 5...": ≥ 3 chars between digits breaks the run).
    - Known over-match: any 7-15 digit separated run is phone-shaped —
      a long page range like "1234-5678" or an 8-digit order id still
      scrubs. Recall-first by design.
    - IPv4: matches dotted quads without octet-range validation
      ("999.999.999.999" scrubs; version strings like "1.2.3" don't —
      only exactly four groups match).
    - Email: practical RFC subset (no quoted local parts, no IDN).

    The q63 oracle states expected counts AND the full scrubbed text
    closed-form (zero regex on the oracle side), including adversarial
    negatives, so match boundaries are pinned against ground truth.
    The phone pattern's lookarounds are zero-width assertions available
    in every mainstream engine; matches themselves stay plain character
    classes.
    """
    c = F.col(text_col)
    n_em = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_RE), 0)).cast("long")
    t1 = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    n_ip = F.size(F.regexp_extract_all(t1, F.lit(PII_IP_RE), 0)).cast("long")
    t2 = F.regexp_replace(t1, PII_IP_RE, "<IP>")
    n_ph = F.size(F.regexp_extract_all(t2, F.lit(PII_PHONE_RE), 0)).cast("long")
    t3 = F.regexp_replace(t2, PII_PHONE_RE, "<PHONE>")
    return documents.select(
        F.col(id_col),
        n_em.alias("n_emails"),
        n_ip.alias("n_ips"),
        n_ph.alias("n_phones"),
        t3.alias("scrubbed_text"),
    )


def luhn_check_expr(col: Column | str) -> Column:
    """Luhn checksum validity of a card-like string (ISO/IEC 7812) —
    the credit-card-number test the phone scrubber deliberately leaves
    alone (16-digit runs exceed its cap).

    Non-digits are stripped first, so "4111-1111 1111 1111" validates.
    Pure Catalyst: reverse the digit array, double every second digit
    from the right (minus 9 when > 9), fold-sum, check % 10 == 0.
    Empty/digit-free input → false. SQL-expressible (q67's DuckDB twin
    recomputes the same fold), JVM-side, no shuffle.
    """
    c = F.col(col) if isinstance(col, str) else col
    digits = F.regexp_replace(c, r"[^0-9]", "")
    rev = F.reverse(F.filter(F.split(digits, ""), lambda ch: ch != ""))
    terms = F.transform(
        rev,
        lambda d, i: F.when(
            i % 2 == 1,
            F.when(d.cast("int") * 2 > 9, d.cast("int") * 2 - 9)
            .otherwise(d.cast("int") * 2),
        ).otherwise(d.cast("int")),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return (F.length(digits) > 0) & (total % 10 == 0)


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """The published Gopher document-quality rule set (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Table A1) as one Catalyst
    projection — the composite gate next to :func:`quality_stats`'
    continuous score. A document passes iff ALL of:

    - word count within [min_words, max_words];
    - mean word length within [min_mean_word_len, max_mean_word_len];
    - symbol-to-word ratio (``#`` or ``...`` occurrences / words)
      ≤ max_symbol_ratio;
    - < max_bullet_ratio of lines start with a bullet ("- " or "* " or
      "• ") and ≤ max_ellipsis_ratio of lines end with "...";
    - ≥ min_alpha_word_ratio of words contain ≥ 1 ASCII letter;
    - ≥ min_stop_hits distinct Gopher stopwords present (the, be, to,
      of, and, that, have, with).

    Returns every rule's measured value (ratios rounded to 6 — both
    engines compute the identical exact division before rounding) plus
    per-rule booleans folded into ``passes`` — keep the columns, they
    are the audit trail a filtered corpus ships with. Pure projection:
    no shuffle, no UDF; at 100 TB this runs at scan speed fused into
    whatever pass reads the text anyway.
    """
    c = F.col(text_col)
    toks = tokens_expr(text_col)
    n_words = F.size(toks)
    lines = F.filter(F.split(c, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    n_hash = F.length(c) - F.length(F.regexp_replace(c, r"#", ""))
    n_ellip = F.size(F.split(c, r"\.\.\.")) - 1
    n_bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•] )"))
    )
    n_ellip_end = F.size(
        F.filter(lines, lambda l: F.rtrim(l).endswith("..."))
    )
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    stop_arr = F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])
    n_stop = F.size(
        F.array_intersect(F.array_distinct(toks), stop_arr)
    )
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(
            toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)
        ) / n_words,
    ).otherwise(F.lit(0.0))
    symbol_ratio = F.when(
        n_words > 0, (n_hash + n_ellip) / n_words
    ).otherwise(F.lit(0.0))
    bullet_ratio = F.when(n_lines > 0, n_bullet / n_lines).otherwise(F.lit(0.0))
    ellipsis_ratio = F.when(
        n_lines > 0, n_ellip_end / n_lines
    ).otherwise(F.lit(0.0))
    alpha_ratio = F.when(n_words > 0, n_alpha / n_words).otherwise(F.lit(0.0))

    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_wl = (mean_wl >= min_mean_word_len) & (mean_wl <= max_mean_word_len)
    r_sym = symbol_ratio <= max_symbol_ratio
    r_bullet = bullet_ratio < max_bullet_ratio
    r_ellip = ellipsis_ratio <= max_ellipsis_ratio
    r_alpha = alpha_ratio >= min_alpha_word_ratio
    r_stop = n_stop >= min_stop_hits

    return documents.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_ratio, 6).alias("bullet_ratio"),
        F.round(ellipsis_ratio, 6).alias("ellipsis_ratio"),
        F.round(alpha_ratio, 6).alias("alpha_word_ratio"),
        n_stop.cast("long").alias("n_stop_hits"),
        r_words.alias("rule_words"),
        r_wl.alias("rule_word_len"),
        r_sym.alias("rule_symbols"),
        r_bullet.alias("rule_bullets"),
        r_ellip.alias("rule_ellipsis"),
        r_alpha.alias("rule_alpha"),
        r_stop.alias("rule_stopwords"),
        (r_words & r_wl & r_sym & r_bullet & r_ellip & r_alpha & r_stop)
        .alias("passes"),
    )
