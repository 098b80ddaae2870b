"""URL-level filtering — the gate a web-text pipeline runs BEFORE
fetching or keeping a page (RefinedWeb-style URL filtering: an explicit
domain blocklist plus weighted keyword scoring over the URL string).

Everything is one Catalyst projection plus one broadcast join — the
filter runs over 10^10 frontier rows at scan speed, no UDF, no extra
shuffle (the blocklist is O(domains), broadcast; the keyword score is a
folded sum of `contains` predicates inside whole-stage codegen).

The keyword table is a deliberately small, documented default — adult /
gambling / piracy / ad-tech markers with weights, the public idiom used
by every web-scale curation write-up. It is a PARAMETER: pass your own
list; the default exists so the operator is runnable and testable
out of the box, not as a complete safety solution (precision/recall
limits are the same as any substring blocklist — e.g. "sex" matches
"sussex"; weigh accordingly or anchor your own patterns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# (substring, weight) — matched case-insensitively anywhere in the URL.
DEFAULT_URL_KEYWORDS: dict[str, int] = {
    "porn": 3,
    "xxx": 3,
    "casino": 3,
    "viagra": 3,
    "warez": 3,
    "sex": 2,
    "poker": 2,
    "torrent": 2,
    "escort": 2,
    "doubleclick": 2,
    "adserver": 2,
    "tracker": 1,
    "clickbait": 1,
}


def url_quality_gate(
    urls: DataFrame,
    blocklist: DataFrame | None = None,
    keywords: dict[str, int] | None = None,
    threshold: int = 3,
    max_url_len: int = 2000,
    url_col: str = "url_canon",
    host_col: str = "host",
) -> DataFrame:
    """Annotate frontier-shaped rows with a URL-filter verdict.

    Adds three columns:

    - ``url_score`` — Σ weight over keyword substrings present in the
      lowercased URL (each keyword counted once, presence not
      frequency — deterministic and cheap);
    - ``block_reason`` — ``'blocklist'`` (host in the blocklist table;
      checked first), ``'keywords'`` (url_score ≥ threshold),
      ``'length'`` (len(url) > max_url_len), else NULL;
    - ``kept`` — block_reason IS NULL.

    The blocklist (one ``host`` column) joins broadcast — it is
    O(domains), tiny next to the frontier. Keyword iteration order is
    sorted, so the generated plan (and any oracle twin) is stable.
    Filter with ``.where("kept")`` or keep the full frame as the audit
    trail (counts by block_reason are the standard curation report).
    """
    kw = keywords if keywords is not None else DEFAULT_URL_KEYWORDS
    low = F.lower(F.col(url_col))
    score = F.lit(0)
    for k in sorted(kw):
        score = score + F.when(low.contains(k.lower()), F.lit(kw[k])).otherwise(
            F.lit(0)
        )
    out = urls.withColumn("url_score", score.cast("int"))
    if blocklist is not None:
        bl = blocklist.select(F.col(host_col).alias("__bl_host")).distinct()
        out = out.join(
            F.broadcast(bl),
            out[host_col] == F.col("__bl_host"),
            "left",
        ).withColumn("__bl_hit", F.col("__bl_host").isNotNull()).drop("__bl_host")
    else:
        out = out.withColumn("__bl_hit", F.lit(False))
    reason = (
        F.when(F.col("__bl_hit"), F.lit("blocklist"))
        .when(F.col("url_score") >= threshold, F.lit("keywords"))
        .when(F.length(F.col(url_col)) > max_url_len, F.lit("length"))
    )
    return (
        out.withColumn("block_reason", reason)
        .withColumn("kept", F.col("block_reason").isNull())
        .drop("__bl_hit")
    )
