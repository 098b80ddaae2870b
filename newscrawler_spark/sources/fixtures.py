"""Deterministic synthetic web corpus (FIXTURES.md §1–§4).

Generates the ``pages(url, warc_ts, html, text, lang)`` corpus + ``seeds``
table as a *pure function of (tier)* — seeded hashing only, no wall clock,
no global RNG — so every machine produces identical bytes (FIXTURES.md §6).

Two generation paths share :func:`page_record` (one page = one pure
function call), so they are bit-identical:

- :func:`gen_pages_local` — driver-side pandas, for smoke/correctness tiers.
- :func:`write_corpus` — distributed ``spark.range → mapInPandas`` for the
  bench tier (10^5+ pages): the id→(host, kind, k) mapping is arithmetic
  over a tiny broadcast plan, so generation scales with executors.

Graph shape (FIXTURES.md §1): H hosts; on the bench tier 2 "hot" hosts hold
~40% of pages (drives B8 salting / skew splitting). Per host: articles with
3-way date-mechanism split (E4 cascade), hub pages (linked-headline-heavy,
drives D2/D3), a /private/ section (robots-blocked, B9), robots.txt with
overlapping prefixes + crawl-delay, sitemap.xml on even hosts (one
sitemap-index host), RSS feed on every 3rd host, and duplicate URL
variants that canonicalize to the same entry (B1/B3).

The ``text`` column is the *designed* ground truth: article bodies are
plain high-density paragraphs (>=150 chars) and boilerplate is short and
link-dense, so the E3 scorer provably selects exactly the body paragraphs;
``tests/test_extract.py`` asserts extractor output == this column, byte
for byte.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

from newscrawler_spark.functions.extract_core import _WS_RE  # reuse collapse regex

EPOCH = datetime(2016, 5, 1, tzinfo=timezone.utc)

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
SEEDS_SCHEMA = (
    "seed_url string, host string, crawler string, max_depth int, "
    "per_host_budget int, daemon_interval_s int"
)


@dataclass(frozen=True)
class Tier:
    hosts: int
    articles_per_host: int
    hot_hosts: int = 0
    hot_share: float = 0.4  # fraction of all pages on the hot hosts


TIERS = {
    "smoke": Tier(hosts=10, articles_per_host=40),
    "correctness": Tier(hosts=25, articles_per_host=160),
    "bench": Tier(hosts=50, articles_per_host=2000, hot_hosts=2),
    # scaling-evidence tier: ~1.25M pages so the Arrow extract/discover
    # compute dominates fixed orchestration cost (BENCH/BASELINE.md)
    "benchxl": Tier(hosts=50, articles_per_host=20000, hot_hosts=2),
    # 2x benchxl: longer rounds amortize the constant per-round driver
    # orchestration cost the way production-size rounds (batch_size in
    # the millions at 10^10-URL scale) do — used for the efficiency-vs-
    # round-size curve in BENCH/BASELINE.md
    "benchxxl": Tier(hosts=50, articles_per_host=40000, hot_hosts=2),
    # 10^7-row frontier stress (VERDICT r3 #5): ~10M articles, the two
    # hot hosts carry 40% of the corpus (~2M rows each — true mega-hosts,
    # 40x the salting threshold), so one bulk round exercises distributed
    # rank + salted politeness + bucketed fetch join at 4x the benchxxl
    # row count; per-core throughput vs benchxxl measures row-linearity
    "stress": Tier(hosts=50, articles_per_host=200000, hot_hosts=2),
}

_WORDS_EN = (
    "council vote city budget school report water market growth plan energy "
    "health police court ruling trade union strike airport harbor railway "
    "minister election debate climate forest river coast storm drought summit "
    "museum festival theatre science research funding hospital doctor nurse "
    "bridge tunnel road traffic housing rent mayor district region border"
).split()
_WORDS_DE = (
    "rat stimme stadt haushalt schule bericht wasser markt wachstum plan "
    "energie gesundheit polizei gericht urteil handel streik flughafen hafen "
    "bahn minister wahl debatte klima wald fluss kueste sturm duerre gipfel"
).split()
_WORDS_FR = (
    "conseil vote ville budget ecole rapport eau marche croissance plan "
    "energie sante police cour jugement commerce greve aeroport port train "
    "ministre election debat climat foret fleuve cote tempete secheresse"
).split()
_LANG_WORDS = {"en": _WORDS_EN, "de": _WORDS_DE, "fr": _WORDS_FR}
_AUTHORS = ("Ada Lovelace", "Grace Hopper", "Alan Turing", "Edsger Dijkstra",
            "Barbara Liskov", "Donald Knuth")


def _h(*parts) -> int:
    """Deterministic 64-bit value from parts (blake2b, keyed by seed 42)."""
    raw = "|".join(str(p) for p in parts).encode()
    return int.from_bytes(hashlib.blake2b(raw, digest_size=8, key=b"42").digest(), "big")


def host_name(i: int) -> str:
    return f"host{i:02d}.example"


def _lang_for(host_idx: int) -> str:
    return ("en", "en", "en", "de", "fr")[host_idx % 5]


def _words(lang: str, seed: int, n: int) -> list[str]:
    ws = _LANG_WORDS[lang]
    x = seed
    out = []
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) & ((1 << 64) - 1)
        out.append(ws[x % len(ws)])
    return out


def _paragraph(lang: str, seed: int) -> str:
    n = 25 + (seed % 40)  # 25–64 words → >=150 chars
    ws = _words(lang, seed, n)
    sent, sents = [], []
    for w in ws:
        sent.append(w)
        if len(sent) >= 8:
            sents.append(" ".join(sent).capitalize() + ".")
            sent = []
    if sent:
        sents.append(" ".join(sent).capitalize() + ".")
    return " ".join(sents)


def _title(lang: str, host_idx: int, k: int) -> str:
    ws = _words(lang, _h("title", host_idx, k), 4)
    return " ".join(w.capitalize() for w in ws) + f" {k}"


def n_articles(tier: Tier, host_idx: int) -> int:
    """Articles per host — hot hosts absorb ``hot_share`` of the corpus."""
    if tier.hot_hosts and host_idx < tier.hot_hosts:
        total = tier.hosts * tier.articles_per_host
        return int(total * tier.hot_share / tier.hot_hosts)
    if tier.hot_hosts:
        total = tier.hosts * tier.articles_per_host
        rest = int(total * (1 - tier.hot_share)) // (tier.hosts - tier.hot_hosts)
        return max(1, rest)
    return tier.articles_per_host


def has_sitemap(host_idx: int) -> bool:
    return host_idx % 2 == 0


def has_rss(host_idx: int) -> bool:
    return host_idx % 3 == 0


def article_url(host_idx: int, k: int) -> str:
    host = host_name(host_idx)
    if k % 10 == 7:
        return f"http://{host}/private/article/{k}"  # robots-blocked section
    if k % 3 == 2:  # URL-date mechanism for the E4 cascade
        d = EPOCH + timedelta(days=k % 365)
        return f"http://{host}/{d.year}/{d.month:02d}/{d.day:02d}/story-{k}"
    return f"http://{host}/article/{k}"


def variant_url(host_idx: int, k: int) -> str:
    """Messy spelling that canonicalizes to article_url's canon (B1/B3):
    uppercase scheme + www. prefix + default port + fragment."""
    host = host_name(host_idx)
    base = article_url(host_idx, k)
    path = base.split(host, 1)[1]
    return f"HTTP://WWW.{host}:80{path}#frag"


def sitemap_only_url(host_idx: int, j: int) -> str:
    return f"http://{host_name(host_idx)}/article/sm-{j}"


def hub_url(host_idx: int, j: int) -> str:
    return f"http://{host_name(host_idx)}/section/{j}"


def publish_date(k: int) -> datetime:
    return EPOCH + timedelta(days=k % 365, hours=k % 24, minutes=k % 60)


def _nav_html(host_idx: int, n_hubs: int) -> str:
    links = "".join(
        f'<a href="/section/{j}">S{j}</a> ' for j in range(min(n_hubs, 5))
    )
    return f'<nav class="nav">{links}</nav>'


def _sidebar_html(host_idx: int, k: int, n_art: int) -> str:
    items = "".join(
        f'<p class="more"><a href="{article_url(host_idx, (k + d) % n_art)}">more {d}</a></p>'
        for d in (1, 2, 3)
    )
    return f'<div class="sidebar">{items}</div>'


def article_html(host_idx: int, k: int, n_art: int, n_hubs: int) -> tuple[str, str]:
    """Returns (html, ground_truth_text)."""
    lang = _lang_for(host_idx)
    title = _title(lang, host_idx, k)
    url = article_url(host_idx, k)
    dt = publish_date(k)
    iso = dt.strftime("%Y-%m-%dT%H:%M:%S")
    n_paras = 3 + _h("np", host_idx, k) % 5
    paras = [
        _paragraph(lang, _h("para", host_idx, k, i)) for i in range(n_paras)
    ]
    text = "\n".join(_WS_RE.sub(" ", p).strip() for p in paras)
    desc = paras[0][:120]
    author = _AUTHORS[_h("auth", host_idx, k) % len(_AUTHORS)]

    mech = k % 3
    date_block = ""
    if mech == 0:
        date_block = (
            '<script type="application/ld+json">'
            f'{{"@type":"NewsArticle","datePublished":"{iso}"}}</script>'
        )
    elif mech == 1:
        date_block = f'<meta property="article:published_time" content="{iso}"/>'
    # mech == 2 → URL-date (article_url) or <time> fallback on non-dated paths
    time_tag = f'<time datetime="{iso}">{dt.date()}</time>' if mech == 2 else ""

    outlinks = "".join(
        f'<a href="{article_url(host_idx, (k * 7 + d) % n_art)}">rel {d}</a> '
        for d in range(2 + _h("ol", host_idx, k) % 4)
    )
    cross = f'<a href="http://{host_name((host_idx + 1) % 50)}/article/0">x</a>'
    body_paras = "\n".join(f"<p>{p}</p>" for p in paras)

    html = f"""<!DOCTYPE html>
<html lang="{lang}">
<head>
<title>{title} - {host_name(host_idx)}</title>
<meta property="og:type" content="article"/>
<meta property="og:title" content="{title}"/>
<meta name="description" content="{desc}"/>
<meta name="keywords" content="news, article, daily"/>
<meta name="author" content="{author}"/>
{date_block}
</head>
<body>
{_nav_html(host_idx, n_hubs)}
<h1>{title}</h1>
{time_tag}
<div class="article-body">
{body_paras}
</div>
{_sidebar_html(host_idx, k, n_art)}
<footer>{outlinks}{cross}</footer>
</body></html>"""
    return html, text


def hub_html(host_idx: int, j: int, n_art: int) -> str:
    """Section page: most headlines are linked (D2/D3 ratio high → not article)."""
    lang = _lang_for(host_idx)
    rows = []
    for d in range(12):
        k = (j * 12 + d) % n_art
        rows.append(f'<h2><a href="{article_url(host_idx, k)}">{_title(lang, host_idx, k)}</a></h2>')
    rows.append(f"<h3>{_title(lang, host_idx, j + 9000)}</h3>")  # one unlinked
    body = "\n".join(rows)
    return f"""<!DOCTYPE html>
<html lang="{lang}">
<head><title>Section {j} - {host_name(host_idx)}</title>
<meta property="og:type" content="website"/>
</head>
<body>
{_nav_html(host_idx, 5)}
{body}
</body></html>"""


def home_html(host_idx: int, n_art: int, n_hubs: int) -> str:
    """Homepage at ``http://host/`` — the recursive/RSS crawl entry point.

    Links to every section hub and the newest articles; advertises the RSS
    feed via ``<link type="application/rss+xml">`` on RSS hosts (drives C3
    spider auto-selection + the RssCrawler start-page probe).
    """
    lang = _lang_for(host_idx)
    rss_tag = (
        '<link rel="alternate" type="application/rss+xml" href="/feed.xml"/>'
        if has_rss(host_idx)
        else ""
    )
    hubs = "\n".join(f'<h2><a href="/section/{j}">Section {j}</a></h2>' for j in range(n_hubs))
    latest = "\n".join(
        f'<p class="teaser"><a href="{article_url(host_idx, k)}">'
        f"{_title(lang, host_idx, k)}</a></p>"
        for k in range(max(0, n_art - 6), n_art)
    )
    return f"""<!DOCTYPE html>
<html lang="{lang}">
<head><title>{host_name(host_idx)} - Home</title>
<meta property="og:type" content="website"/>
{rss_tag}
</head>
<body>
{_nav_html(host_idx, n_hubs)}
{hubs}
{latest}
</body></html>"""


def robots_body(host_idx: int) -> str:
    lines = [
        "User-agent: *",
        "Disallow: /private/",
        "Disallow: /article/1",
        "Allow: /article/12",   # longest-prefix beats Disallow /article/1
        "Crawl-delay: 2",
    ]
    if has_sitemap(host_idx):
        lines.append(f"Sitemap: http://{host_name(host_idx)}/sitemap.xml")
    return "\n".join(lines) + "\n"


def sitemap_body(host_idx: int, n_art: int) -> str:
    urls = [article_url(host_idx, k) for k in range(0, n_art, 4)]
    urls += [sitemap_only_url(host_idx, j) for j in range(3)]
    items = "\n".join(f"<url><loc>{u}</loc></url>" for u in urls)
    return f'<?xml version="1.0"?>\n<urlset>\n{items}\n</urlset>\n'


def sitemap_index_body(host_idx: int) -> str:
    return (
        '<?xml version="1.0"?>\n<sitemapindex>\n'
        f"<sitemap><loc>http://{host_name(host_idx)}/sitemap.xml</loc></sitemap>\n"
        "</sitemapindex>\n"
    )


def rss_body(host_idx: int, n_art: int) -> str:
    lang = _lang_for(host_idx)
    items = []
    for k in range(max(0, n_art - 5), n_art):
        u = article_url(host_idx, k)
        if k % 2 == 0:  # canonical-variant duplicate spelling (FIXTURES §1)
            u = variant_url(host_idx, k)
        dt = publish_date(k)
        items.append(
            f"<item><title>{_title(lang, host_idx, k)}</title>"
            f"<link>{u}</link>"
            f"<pubDate>{dt.strftime('%a, %d %b %Y %H:%M:%S GMT')}</pubDate></item>"
        )
    inner = "\n".join(items)
    return (
        '<?xml version="1.0"?>\n<rss version="2.0"><channel>\n'
        f"<title>{host_name(host_idx)} feed</title>\n{inner}\n</channel></rss>\n"
    )


# ------------------------------------------------------------- page records


def page_plan(tier: Tier) -> list[tuple[int, str, int]]:
    """Flat deterministic list of (host_idx, kind, k) — the corpus spine."""
    plan: list[tuple[int, str, int]] = []
    for i in range(tier.hosts):
        n_art = n_articles(tier, i)
        n_hubs = max(1, n_art // 12)
        plan.append((i, "home", 0))
        plan.append((i, "robots", 0))
        if has_sitemap(i):
            plan.append((i, "sitemap", 0))
            if i == 0:
                plan.append((i, "sitemap_index", 0))
        if has_rss(i):
            plan.append((i, "rss", 0))
        for j in range(n_hubs):
            plan.append((i, "hub", j))
        for k in range(n_art):
            plan.append((i, "article", k))
            if k % 5 == 0:
                plan.append((i, "variant", k))
        for j in range(3):
            plan.append((i, "smonly", j))
    return plan


def page_record(host_idx: int, kind: str, k: int, tier: Tier) -> dict:
    host = host_name(host_idx)
    n_art = n_articles(tier, host_idx)
    n_hubs = max(1, n_art // 12)
    lang = _lang_for(host_idx)
    warc_ts = EPOCH + timedelta(seconds=_h("ts", host_idx, kind, k) % (86400 * 30))
    if kind == "article":
        html, text = article_html(host_idx, k, n_art, n_hubs)
        return dict(url=article_url(host_idx, k), warc_ts=warc_ts,
                    html=html.encode(), text=text, lang=lang)
    if kind == "variant":
        html, text = article_html(host_idx, k, n_art, n_hubs)
        return dict(url=variant_url(host_idx, k), warc_ts=warc_ts,
                    html=html.encode(), text=text, lang=lang)
    if kind == "smonly":
        html, text = article_html(host_idx, 100000 + k, n_art, n_hubs)
        return dict(url=sitemap_only_url(host_idx, k), warc_ts=warc_ts,
                    html=html.encode(), text=text, lang=lang)
    if kind == "home":
        return dict(url=f"http://{host}/", warc_ts=warc_ts,
                    html=home_html(host_idx, n_art, n_hubs).encode(), text="", lang=lang)
    if kind == "hub":
        return dict(url=hub_url(host_idx, k), warc_ts=warc_ts,
                    html=hub_html(host_idx, k, n_art).encode(), text="", lang=lang)
    if kind == "robots":
        return dict(url=f"http://{host}/robots.txt", warc_ts=warc_ts,
                    html=robots_body(host_idx).encode(), text="", lang=lang)
    if kind == "sitemap":
        return dict(url=f"http://{host}/sitemap.xml", warc_ts=warc_ts,
                    html=sitemap_body(host_idx, n_art).encode(), text="", lang=lang)
    if kind == "sitemap_index":
        return dict(url=f"http://{host}/sitemap_index.xml", warc_ts=warc_ts,
                    html=sitemap_index_body(host_idx).encode(), text="", lang=lang)
    if kind == "rss":
        return dict(url=f"http://{host}/feed.xml", warc_ts=warc_ts,
                    html=rss_body(host_idx, n_art).encode(), text="", lang=lang)
    raise ValueError(kind)


def gen_pages_local(tier_name: str) -> pd.DataFrame:
    """Driver-side corpus (smoke/correctness tiers)."""
    tier = TIERS[tier_name]
    recs = [page_record(i, kind, k, tier) for i, kind, k in page_plan(tier)]
    return pd.DataFrame.from_records(recs)


def gen_seeds(tier_name: str, per_host_budget: int = 5, max_depth: int = 3) -> pd.DataFrame:
    tier = TIERS[tier_name]
    crawlers = ("rss", "sitemap", "recursive", "recursive_sitemap", "download")
    rows = []
    for i in range(tier.hosts):
        if has_rss(i):
            crawler = "rss" if i % 2 else "recursive_sitemap"
        elif has_sitemap(i):
            crawler = "sitemap" if i % 4 else "recursive_sitemap"
        else:
            crawler = crawlers[i % 5] if crawlers[i % 5] in ("recursive", "download") else "recursive"
        rows.append(dict(seed_url=f"http://{host_name(i)}/", host=host_name(i),
                         crawler=crawler, max_depth=max_depth,
                         per_host_budget=per_host_budget, daemon_interval_s=300))
    return pd.DataFrame.from_records(rows)


# --------------------------------------------------------------- spark path


def pages_df(spark, tier_name: str):
    """pages as a Spark DataFrame — local build for small tiers, distributed
    ``range → mapInPandas`` for bench (keeps generation off the driver)."""
    tier = TIERS[tier_name]
    plan = page_plan(tier)
    if len(plan) <= 20_000:
        return spark.createDataFrame(gen_pages_local(tier_name), schema=PAGES_SCHEMA)

    # Distributed: ship the (host,kind,k) spine as plain arrays; each task
    # renders its id-slice via the same page_record() (bit-identical).
    hosts = np.array([p[0] for p in plan], dtype=np.int32)
    kinds = np.array([p[1] for p in plan])
    ks = np.array([p[2] for p in plan], dtype=np.int64)
    sc = spark.sparkContext
    b = sc.broadcast((hosts, kinds, ks, tier))

    def render(it):
        h, kk, kks, t = b.value
        for pdf in it:
            ids = pdf["id"].to_numpy()
            recs = [page_record(int(h[i]), str(kk[i]), int(kks[i]), t) for i in ids]
            yield pd.DataFrame.from_records(recs)

    n = len(plan)
    return (
        spark.range(0, n, 1, numPartitions=max(32, n // 20_000))
        .mapInPandas(render, schema=PAGES_SCHEMA)
    )


def seeds_df(spark, tier_name: str, per_host_budget: int = 5, max_depth: int = 3):
    return spark.createDataFrame(
        gen_seeds(tier_name, per_host_budget, max_depth), schema=SEEDS_SCHEMA
    )


def write_corpus(spark, tier_name: str, out_dir: str) -> None:
    pages_df(spark, tier_name).write.mode("overwrite").parquet(f"{out_dir}/pages.parquet")
    seeds_df(spark, tier_name).write.mode("overwrite").parquet(f"{out_dir}/seeds.parquet")
