"""Three-way parity + property tests for CANON v1 (SURVEY.md §6.3 item 3).

Asserts the native column expression, the pandas/Arrow UDF, and the
pure-Python mini-oracle twin produce byte-identical canonical URLs, that
canonicalization is idempotent, and that the pure-Python xxhash64 twin
matches Spark's JVM ``F.xxhash64``.
"""

from __future__ import annotations

import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from newscrawler_spark.functions.canon import (
    canon_expr,
    canonicalize_py,
    canonicalize_udf,
    full_host_py,
    host_expr,
    registered_domain_py,
    url_hash_expr,
)
from newscrawler_spark.functions.hashing import spark_xxhash64_str

GOLDEN = [
    # (input, expected canonical)
    ("http://www.Example.COM/a/b", "http://example.com/a/b"),
    ("HTTP://EXAMPLE.com:80/a", "http://example.com/a"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/a?b=2&a=1", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?b=2&a=1#frag", "http://example.com/a?a=1&b=2"),
    ("http://example.com/a?", "http://example.com/a"),
    ("http://example.com/a?&&", "http://example.com/a"),
    ("http://example.com/a?z=9&", "http://example.com/a?z=9"),
    ("http://example.com/p%2fq", "http://example.com/p%2Fq"),
    ("http://example.com/p?q=%3a%3A", "http://example.com/p?q=%3A%3A"),
    ("  http://example.com/a  ", "http://example.com/a"),
    ("http://user:pw@example.com/a", "http://example.com/a"),
    ("http://www.news.example.co.uk/2016/05/01/story",
     "http://news.example.co.uk/2016/05/01/story"),
    ("http://example.com/%zz", "http://example.com/%zz"),
]

HOST_GOLDEN = [
    ("http://www.Example.COM/a", "example.com", "example.com"),
    ("http://sub.example.com/a", "sub.example.com", "sub.example.com"),
    ("http://www.sub.example.com:81/a", "sub.example.com", "sub.example.com"),
]


def test_canonicalize_py_golden():
    for url, want in GOLDEN:
        assert canonicalize_py(url) == want, url


def test_canonicalize_py_idempotent_golden():
    for url, _ in GOLDEN:
        c = canonicalize_py(url)
        assert canonicalize_py(c) == c, url


def test_host_py_golden():
    for url, reg, _full in HOST_GOLDEN:
        assert registered_domain_py(url) == reg, url
    assert full_host_py("http://www.sub.example.com:81/a") == "www.sub.example.com"


@pytest.fixture(scope="module")
def canon_df(spark):
    urls = [u for u, _ in GOLDEN] + [
        "http://host%02d.example/p/%d" % (i % 7, i) for i in range(40)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return df.select(
        "url",
        canon_expr("url").alias("canon_native"),
        canonicalize_udf("url").alias("canon_arrow"),
        host_expr("url").alias("host"),
    ).cache()


def test_native_expr_matches_py(canon_df):
    rows = canon_df.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.canon_native == canonicalize_py(r.url), r.url


def test_arrow_udf_matches_py(canon_df):
    for r in canon_df.collect():
        assert r.canon_arrow == canonicalize_py(r.url), r.url


def test_host_expr_matches_py(canon_df):
    for r in canon_df.collect():
        assert r.host == registered_domain_py(r.url), r.url


def test_xxhash64_matches_spark(spark):
    vals = ["", "a", "http://example.com/", "x" * 100, "päge/ünïcode", "0" * 31,
            "y" * 32, "z" * 33]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {r.s: r.h for r in df.select("s", F.xxhash64("s").alias("h")).collect()}
    for v in vals:
        assert got[v] == spark_xxhash64_str(v), repr(v)


def test_url_hash_expr_is_xxhash64(spark):
    df = spark.createDataFrame([("http://example.com/a",)], "c string")
    r = df.select(url_hash_expr("c").alias("h"), F.xxhash64("c").alias("h2")).first()
    assert r.h == r.h2


# --------------------------------------------------------- property tests

_path_chars = st.text(alphabet=string.ascii_letters + string.digits + "/-._~", max_size=20)
_qseg = st.text(alphabet=string.ascii_letters + string.digits + "=_-", min_size=1, max_size=8)


@st.composite
def url_strategy(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https"]))
    www = draw(st.sampled_from(["", "www.", "WWW."]))
    host = draw(st.sampled_from(["example.com", "News.Example.co.uk", "h0.example"]))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    path = draw(_path_chars)
    if path and not path.startswith("/"):
        path = "/" + path
    nq = draw(st.integers(0, 4))
    query = "&".join(draw(st.lists(_qseg, min_size=nq, max_size=nq)))
    frag = draw(st.sampled_from(["", "#f", "#sec2"]))
    u = f"{scheme}://{www}{host}{port}{path}"
    if query or draw(st.booleans()):
        u += "?" + query
    return u + frag


@given(url_strategy())
@settings(max_examples=200, deadline=None)
def test_canon_idempotent_property(u):
    c = canonicalize_py(u)
    assert canonicalize_py(c) == c


@given(st.lists(url_strategy(), min_size=1, max_size=50, unique=True))
@settings(max_examples=10, deadline=None)
def test_native_matches_py_property(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    for r in df.select("url", canon_expr("url").alias("c")).collect():
        assert r.c == canonicalize_py(r.url), r.url
