"""Pure-Python article-extraction core (SURVEY.md §3 E1–E8, D1–D6).

This module is the *single definition* of the extraction semantics. It is
imported by BOTH:

- the Spark Arrow-UDF map stage (:mod:`newscrawler_spark.operators.extract`),
  applied per Arrow batch over ``(url, warc_ts, html)`` rows, and
- the pure-Python mini-oracle (``tests/oracle_crawler.py``),

so the BASELINE invariant "byte-identical extracted text per url" holds by
construction and the tests verify that Spark's partitioning/batching never
perturbs the bytes (SURVEY.md §6.3 item 1 — goldens are mini-oracle-defined
while the reference mount is empty, §0).

Reference parity (symbol-level cites, lines unverifiable — SURVEY.md §0):

- body scoring ≙ ``newscrawler/pipeline/extractor/extractors/
  readability_extractor.py :: ReadabilityExtractor`` — DOM text-density
  candidate scoring: ``score = text_len * (1 - link_density)``, keep blocks
  above a fraction of the best block, document order (E3).
- date cascade ≙ ``…/extractors/date_extractor.py :: DateExtractor`` —
  JSON-LD ``datePublished`` → ``article:published_time`` meta → ``date``
  meta → ``<time datetime>`` → URL path date ``/YYYY/MM/DD/`` (E4).
- title/description/author merge ≙ ``…/extractor/comparer/comparer_*.py``
  — first non-empty by extractor precedence (E8).
- page heuristics ≙ ``newscrawler/helper_classes/sub_classes/heuristics.py
  :: Heuristics.{og_type, linked_headlines, self_linked_headlines,
  is_not_from_subdomain, meta_contains_article_keywords}`` (D1–D5).

No per-row *Spark* Python: callers batch via Arrow; within a batch the
work is compiled-regex scans per document (HTML parsing is inherently
per-document; lxml is unavailable offline — SURVEY.md §7.5).
"""

from __future__ import annotations

import html as _htmllib
import re
from datetime import datetime, timezone

from newscrawler_spark.functions.canon import full_host_py, registered_domain_py

# ---------------------------------------------------------------- regexes

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
_TITLE_RE = re.compile(r"<title[^>]*>(.*?)</title>", re.I | re.S)
_H1_RE = re.compile(r"<h1[^>]*>(.*?)</h1>", re.I | re.S)
_P_RE = re.compile(r"<p[\s>]", re.I)
_P_BLOCK_RE = re.compile(r"<p[^>]*>(.*?)</p>", re.I | re.S)
_A_BLOCK_RE = re.compile(r"<a\b[^>]*>(.*?)</a>", re.I | re.S)
_A_HREF_RE = re.compile(r"""<a\b[^>]*?href\s*=\s*["']([^"'>]+)["']""", re.I)
_HEADLINE_RE = re.compile(r"<h([1-6])[^>]*>(.*?)</h\1>", re.I | re.S)
_IMG_RE = re.compile(r"""<img\b[^>]*?src\s*=\s*["']([^"'>]+)["']""", re.I)
_TIME_RE = re.compile(r"""<time\b[^>]*?datetime\s*=\s*["']([^"'>]+)["']""", re.I)
_JSONLD_DATE_RE = re.compile(r'"datePublished"\s*:\s*"([^"]+)"')
_URL_DATE_RE = re.compile(r"/((?:19|20)\d{2})/(\d{2})/(\d{2})/")
_LANG_ATTR_RE = re.compile(r"""<html\b[^>]*?lang\s*=\s*["']([A-Za-z-]+)["']""", re.I)

_ARTICLE_KEYWORDS = ("article", "news", "story", "press")


def _meta_re(attr: str, name: str) -> re.Pattern:
    # <meta property="og:type" content="..."> in either attribute order
    return re.compile(
        rf"""<meta\b[^>]*?{attr}\s*=\s*["']{re.escape(name)}["'][^>]*?"""
        rf"""content\s*=\s*["']([^"'>]*)["']"""
        rf"""|<meta\b[^>]*?content\s*=\s*["']([^"'>]*)["'][^>]*?"""
        rf"""{attr}\s*=\s*["']{re.escape(name)}["']""",
        re.I,
    )


_META_OG_TYPE = _meta_re("property", "og:type")
_META_OG_TITLE = _meta_re("property", "og:title")
_META_OG_DESC = _meta_re("property", "og:description")
_META_OG_IMAGE = _meta_re("property", "og:image")
_META_DESC = _meta_re("name", "description")
_META_KEYWORDS = _meta_re("name", "keywords")
_META_AUTHOR = _meta_re("name", "author")
_META_PUBTIME = _meta_re("property", "article:published_time")
_META_DATE = _meta_re("name", "date")


def _meta(pattern: re.Pattern, doc: str) -> str:
    m = pattern.search(doc)
    if not m:
        return ""
    return (m.group(1) if m.group(1) is not None else m.group(2)) or ""


def strip_tags(fragment: str) -> str:
    """Tags removed, entities unescaped, whitespace collapsed."""
    txt = _TAG_RE.sub(" ", fragment)
    txt = _htmllib.unescape(txt)
    return _WS_RE.sub(" ", txt).strip()


# ------------------------------------------------------------ body scoring


def extract_body_text(doc: str) -> str:
    """E3 — text-density body extraction. THE byte-identical invariant.

    score(p) = plain_text_len * (1 - link_density); keep paragraphs with
    score >= max(50, 0.25 * best_score), in document order, joined by \\n.
    """
    best = 0.0
    scored: list[tuple[float, str]] = []
    for m in _P_BLOCK_RE.finditer(doc):
        raw = m.group(1)
        text = strip_tags(raw)
        if not text:
            continue
        link_len = sum(len(strip_tags(a)) for a in _A_BLOCK_RE.findall(raw))
        density = min(1.0, link_len / len(text)) if text else 1.0
        score = len(text) * (1.0 - density)
        scored.append((score, text))
        if score > best:
            best = score
    if not scored:
        return ""
    threshold = max(50.0, 0.25 * best)
    kept = [t for s, t in scored if s >= threshold]
    return "\n".join(kept)


# ------------------------------------------------------------- date cascade

_ISO_RE = re.compile(
    r"^(\d{4})-(\d{2})-(\d{2})(?:[T ](\d{2}):(\d{2})(?::(\d{2}))?)?"
)


def _parse_iso(s: str) -> datetime | None:
    m = _ISO_RE.match(s.strip())
    if not m:
        return None
    y, mo, d = int(m.group(1)), int(m.group(2)), int(m.group(3))
    hh = int(m.group(4) or 0)
    mi = int(m.group(5) or 0)
    ss = int(m.group(6) or 0)
    try:
        return datetime(y, mo, d, hh, mi, ss, tzinfo=timezone.utc)
    except ValueError:
        return None


def extract_publish_date(doc: str, url: str) -> datetime | None:
    """E4 — cascade: JSON-LD → article:published_time → date meta →
    <time datetime> → URL path date."""
    m = _JSONLD_DATE_RE.search(doc)
    if m:
        dt = _parse_iso(m.group(1))
        if dt:
            return dt
    for pat in (_META_PUBTIME, _META_DATE):
        v = _meta(pat, doc)
        if v:
            dt = _parse_iso(v)
            if dt:
                return dt
    m = _TIME_RE.search(doc)
    if m:
        dt = _parse_iso(m.group(1))
        if dt:
            return dt
    m = _URL_DATE_RE.search(url)
    if m:
        try:
            return datetime(int(m.group(1)), int(m.group(2)), int(m.group(3)),
                            tzinfo=timezone.utc)
        except ValueError:
            return None
    return None


# --------------------------------------------------------------- heuristics


def page_stats(doc: str, url: str) -> dict:
    """D1–D6 page heuristics, one pass (returned as plain dict).

    ``linked_headline_ratio``: fraction of <h1..h6> containing an <a>.
    ``self_linked_headline_ratio``: counting only same-registered-domain
    links (relative links count as same-domain).
    """
    headlines = _HEADLINE_RE.findall(doc)
    n = len(headlines)
    linked = 0
    self_linked = 0
    host = registered_domain_py(url)
    for _lvl, inner in headlines:
        hrefs = _A_HREF_RE.findall(inner)
        if not hrefs and "<a" in inner.lower():
            hrefs = [""]
        if hrefs:
            linked += 1
            for h in hrefs:
                if h.startswith(("http://", "https://")):
                    if registered_domain_py(h) == host:
                        self_linked += 1
                        break
                else:  # relative → same domain
                    self_linked += 1
                    break
    og_type = _meta(_META_OG_TYPE, doc).strip().lower() == "article"
    keywords = _meta(_META_KEYWORDS, doc).lower()
    return {
        "og_type": og_type,
        "n_headlines": n,
        "linked_headline_ratio": (linked / n) if n else 0.0,
        "self_linked_headline_ratio": (self_linked / n) if n else 0.0,
        "is_not_from_subdomain": full_host_py(url).lstrip("w.") == host
        or full_host_py(url) in (host, "www." + host),
        "meta_contains_article_keywords": any(k in keywords for k in _ARTICLE_KEYWORDS),
        "n_paragraphs": len(_P_RE.findall(doc)),
    }


# -------------------------------------------------------------- full record


def extract_article(url: str, doc: str, corpus_lang: str | None = None) -> dict:
    """E1+E8 — run all extractors, merge candidates by precedence."""
    html_title = strip_tags(_TITLE_RE.search(doc).group(1)) if _TITLE_RE.search(doc) else ""
    og_title = _meta(_META_OG_TITLE, doc).strip()
    h1 = strip_tags(_H1_RE.search(doc).group(1)) if _H1_RE.search(doc) else ""
    # comparer_title: precedence og:title → <h1> → <title> (E8)
    title = og_title or h1 or html_title

    desc = _meta(_META_DESC, doc).strip() or _meta(_META_OG_DESC, doc).strip()
    author = _meta(_META_AUTHOR, doc).strip()
    if not author:
        m = re.search(r"[Bb]y ([A-Z][a-zA-Z]+ [A-Z][a-zA-Z]+)", doc)
        author = m.group(1) if m else ""

    image = _meta(_META_OG_IMAGE, doc).strip()
    if not image:
        m = _IMG_RE.search(doc)
        image = m.group(1) if m else ""

    lang = (corpus_lang or "").strip()
    if not lang:
        m = _LANG_ATTR_RE.search(doc)
        lang = m.group(1).split("-")[0].lower() if m else ""

    return {
        "url": url,
        "source_domain": registered_domain_py(url),
        "html_title": html_title,
        "article_title": title,
        "article_description": desc,
        "article_text": extract_body_text(doc),
        "article_author": author,
        "article_publish_date": extract_publish_date(doc, url),
        "article_language": lang,
        "article_image": image,
    }


def decode_html(blob: bytes | str | None) -> str:
    if blob is None:
        return ""
    if isinstance(blob, (bytes, bytearray, memoryview)):
        return bytes(blob).decode("utf-8", errors="replace")
    return blob
