"""URL canonicalization, registered-domain extraction, 64-bit hashing.

Reference behavior (SURVEY.md §3 B1/B2/B5): the reference dedups requests on
``scrapy.utils.request.request_fingerprint`` = SHA1 over the *canonicalized*
URL (``w3lib.url.canonicalize_url``), and derives its politeness/offsite key
from the registered domain (``newscrawler/helper_classes/url_extractor.py ::
UrlExtractor.get_allowed_domain`` — symbol-level cite; reference mount empty,
SURVEY.md §0: regex strip of ``www.``, no public-suffix list).

CANON spec v1 (single source of truth — three equivalent implementations
below, equality asserted in tests/test_canon.py):

1. strip surrounding whitespace
2. parse ``scheme://[userinfo@]host[:port]path[?query][#fragment]``
3. scheme → lowercase; host → lowercase, one leading ``www.`` stripped;
   userinfo dropped; fragment dropped
4. default ports dropped (http:80, https:443); other ports kept
5. empty path → ``/``
6. query: split on ``&``, drop empty segments, sort bytewise, rejoin;
   empty/absent query → no ``?``
7. percent-escapes ``%xx`` in path+query: hex uppercased (only valid
   2-hex-digit escapes)
8. unparseable URL → fragment-stripped trimmed input, unchanged otherwise

Implementations:

- :func:`canon_expr` — **the production path**: pure Spark column
  expression (parse_url + regexp + array_sort + transform). Stays inside
  whole-stage codegen; no Python anywhere. This is what the frontier uses.
- :func:`canonicalize_udf` — pandas/Arrow UDF twin (BASELINE.json mandates
  the vectorized-Arrow-UDF form exist); vectorized pandas str ops, with a
  Python ``sorted`` only for the rare multi-param query tail.
- :func:`canonicalize_py` — pure-Python twin used by the mini-oracle.

Hashing (B2): production = ``F.xxhash64(url_canon)`` (JVM, seed 42); the
oracle twin lives in :mod:`newscrawler_spark.functions.hashing`. Since the
reference fingerprints GET requests with empty bodies, seen-set membership
reduces to canonical-URL equality (SURVEY.md B2), so a 64-bit hash of the
canonical form is a faithful dedup key at 10^10 scale (collision p ≈ 2.7e-3
for 10^10 keys via birthday bound — accepted by the north rule's
Bloom/cuckoo design, which is itself approximate-with-exact-confirm).
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

_URL_RE = re.compile(
    r"^(?P<scheme>[A-Za-z][A-Za-z0-9+.\-]*)://(?P<auth>[^/?#]*)"
    r"(?P<path>[^?#]*)(?:\?(?P<query>[^#]*))?(?:#.*)?$"
)
_PCT_RE = re.compile(r"%([0-9a-fA-F]{2})")

_DEFAULT_PORTS = {"http": "80", "https": "443"}

# Spark 4 runs ANSI mode by default, where parse_url raises on malformed
# input; try_parse_url (4.0+) returns NULL instead — matching spec rule 8.
_parse_url = getattr(F, "try_parse_url", F.parse_url)


# ---------------------------------------------------------------- pure python


def _pct_upper_py(s: str) -> str:
    return _PCT_RE.sub(lambda m: "%" + m.group(1).upper(), s)


def canonicalize_py(url: str) -> str:
    """Pure-Python CANON v1 (mini-oracle twin)."""
    s = url.strip()
    m = _URL_RE.match(s)
    if not m:
        return s.split("#", 1)[0]
    scheme = m.group("scheme").lower()
    auth = m.group("auth")
    if "@" in auth:
        auth = auth.rsplit("@", 1)[1]
    host, _, port = auth.partition(":")
    host = host.lower()
    if host.startswith("www."):
        host = host[4:]
    netloc = host
    if port and port != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = m.group("path") or "/"
    path = _pct_upper_py(path)
    query = m.group("query")
    out = f"{scheme}://{netloc}{path}"
    if query:
        segs = sorted(seg for seg in query.split("&") if seg)
        if segs:
            out += "?" + _pct_upper_py("&".join(segs))
    return out


def registered_domain_py(url: str) -> str:
    """Registered-domain key (B5) — lowercased host, ``www.`` stripped.

    Mirrors the reference's regex-based strip (no PSL). This is the
    politeness partition key.
    """
    s = url.strip()
    m = _URL_RE.match(s)
    if not m:
        return ""
    auth = m.group("auth")
    if "@" in auth:
        auth = auth.rsplit("@", 1)[1]
    host = auth.partition(":")[0].lower()
    return host[4:] if host.startswith("www.") else host


def full_host_py(url: str) -> str:
    """Full netloc host (lowercased, no www-strip) — for D4 subdomain check."""
    s = url.strip()
    m = _URL_RE.match(s)
    if not m:
        return ""
    auth = m.group("auth")
    if "@" in auth:
        auth = auth.rsplit("@", 1)[1]
    return auth.partition(":")[0].lower()


# ------------------------------------------------------------ native columns


def _pct_upper_expr(col: Column) -> Column:
    """Uppercase valid %xx escapes using split('%') + transform — no UDF."""
    parts = F.split(col, "%", -1)
    fixed = F.transform(
        parts,
        lambda s, i: F.when(i == F.lit(0), s).otherwise(
            F.when(
                s.rlike("^[0-9a-fA-F]{2}"),
                F.concat(F.upper(F.substring(s, 1, 2)), F.substring(s, 3, 1 << 30)),
            ).otherwise(s)
        ),
    )
    return F.concat_ws("%", fixed)


# Java-regex twins of _URL_RE's groups (java.net.URI via parse_url is
# stricter than the CANON spec — e.g. rejects '%zz' — so the native path
# mirrors the spec regex directly with regexp_extract; stays codegen'd).
_J_SCHEME_PFX = r"^[A-Za-z][A-Za-z0-9+.\-]*://"
_J_PARSED = _J_SCHEME_PFX
_J_SCHEME = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_J_AUTH = _J_SCHEME_PFX + r"([^/?#]*)"
_J_PATH = _J_SCHEME_PFX + r"[^/?#]*([^?#]*)"
_J_QUERY = _J_SCHEME_PFX + r"[^/?#]*[^?#]*\?([^#]*)"


def _hostport_expr(u: Column) -> Column:
    auth = F.regexp_extract(u, _J_AUTH, 1)
    # drop userinfo: everything up to the LAST '@' (greedy, = rsplit('@',1))
    return F.regexp_replace(auth, r"^.*@", "")


def canon_expr(url: Column | str) -> Column:
    """CANON v1 as a native Spark column expression (production path).

    Fully JVM-side: regexp_extract / array_sort / transform — appears
    inside WholeStageCodegen in ``.explain()``; zero Python workers.
    Exact mirror of :func:`canonicalize_py` (parity-tested).
    """
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    scheme = F.lower(F.regexp_extract(u, _J_SCHEME, 1))
    hostport = _hostport_expr(u)
    host = F.regexp_replace(
        F.lower(F.substring_index(hostport, ":", 1)), r"^www\.", ""
    )
    # port = everything after the FIRST ':' (mirror of str.partition(':'))
    port = F.regexp_extract(hostport, r"^[^:]*:(.*)$", 1)
    default_port = F.when(scheme == "http", F.lit("80")).when(
        scheme == "https", F.lit("443")
    ).otherwise(F.lit(""))
    netloc = F.when(
        (port == "") | (port == default_port), host
    ).otherwise(F.concat(host, F.lit(":"), port))

    raw_path = F.regexp_extract(u, _J_PATH, 1)
    path = _pct_upper_expr(F.when(raw_path == "", F.lit("/")).otherwise(raw_path))

    q = F.regexp_extract(u, _J_QUERY, 1)  # '' when absent OR empty — same result
    segs = F.array_sort(F.filter(F.split(q, "&", -1), lambda s: s != ""))
    qstr = _pct_upper_expr(F.concat_ws("&", segs))
    suffix = F.when(F.size(segs) == 0, path).otherwise(
        F.concat(path, F.lit("?"), qstr)
    )

    canon = F.concat(scheme, F.lit("://"), netloc, suffix)
    # unparseable → fragment-stripped trimmed input (spec rule 8)
    fallback = F.split(u, "#", 2).getItem(0)
    return F.when(u.rlike(_J_PARSED), canon).otherwise(fallback)


def host_expr(url: Column | str) -> Column:
    """Registered-domain key (B5) as a native expression."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    h = F.lower(F.substring_index(_hostport_expr(u), ":", 1))
    return F.when(u.rlike(_J_PARSED), F.regexp_replace(h, r"^www\.", "")).otherwise(
        F.lit("")
    )


def full_host_expr(url: Column | str) -> Column:
    """Full host (no www-strip) — D4 subdomain check."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    h = F.lower(F.substring_index(_hostport_expr(u), ":", 1))
    return F.when(u.rlike(_J_PARSED), h).otherwise(F.lit(""))


def url_hash_expr(url_canon: Column | str) -> Column:
    """64-bit dedup key (B2) — JVM xxhash64, seed 42."""
    c = F.col(url_canon) if isinstance(url_canon, str) else url_canon
    return F.xxhash64(c)


# ----------------------------------------------------------------- Arrow UDF


def _canon_batch(s: pd.Series) -> pd.Series:
    """Vectorized pandas implementation of CANON v1 for one Arrow batch.

    Pandas ``.str`` ops (C-backed) for parse/lower/strip/port/path; the
    query-segment sort falls back to Python ``sorted`` only on the subset
    of rows whose query holds >1 segment (rare in web corpora).
    """
    s = s.astype("string").str.strip()
    ex = s.str.extract(_URL_RE)
    parsed = ex["scheme"].notna()

    auth = ex["auth"].str.rsplit("@", n=1).str[-1]
    hostport = auth.str.partition(":")
    host = hostport[0].str.lower()
    host = host.str.replace(r"^www\.", "", regex=True)
    scheme = ex["scheme"].str.lower()
    port = hostport[2]
    default_port = scheme.map(_DEFAULT_PORTS).fillna("")
    keep_port = (port != "") & (port != default_port)
    netloc = host.where(~keep_port, host + ":" + port)

    path = ex["path"].fillna("")
    path = path.where(path != "", "/")
    path = path.str.replace(_PCT_RE, lambda m: "%" + m.group(1).upper(), regex=True)

    query = ex["query"]

    def _sort_q(q):
        if not isinstance(q, str) or q == "":
            return ""
        segs = sorted(x for x in q.split("&") if x)
        return "&".join(segs)

    multi = query.notna() & query.str.contains("&", regex=False).fillna(False)
    qnorm = query.fillna("").str.replace(r"^&+|&+$", "", regex=True)
    qnorm = qnorm.where(~multi, query[multi].map(_sort_q) if multi.any() else "")
    qnorm = qnorm.fillna("").str.replace(
        _PCT_RE, lambda m: "%" + m.group(1).upper(), regex=True
    )

    out = scheme + "://" + netloc + path + ("?" + qnorm).where(qnorm != "", "")
    fallback = s.str.split("#", n=1).str[0]
    return out.where(parsed, fallback).astype("string")


@F.pandas_udf(T.StringType())
def canonicalize_udf(urls: pd.Series) -> pd.Series:
    """CANON v1 as a vectorized Arrow UDF (BASELINE-mandated form)."""
    return _canon_batch(urls)


@F.pandas_udf(T.StringType())
def registered_domain_udf(urls: pd.Series) -> pd.Series:
    s = urls.astype("string").str.strip()
    ex = s.str.extract(_URL_RE)
    auth = ex["auth"].str.rsplit("@", n=1).str[-1]
    host = auth.str.partition(":")[0].str.lower()
    return host.str.replace(r"^www\.", "", regex=True).fillna("").astype("string")
