"""robots.txt parsing + longest-prefix matching (SURVEY.md §3 A4/B9).

Reference behavior: scrapy's ``RobotsTxtMiddleware`` keeps one parser per
netloc and drops disallowed requests; sitemap discovery reads the
``Sitemap:`` lines (``newscrawler/helper_classes/url_extractor.py ::
UrlExtractor.sitemap_check`` — symbol-level cite, mount empty, SURVEY §0).

This module is the single parsing/matching definition shared by the Spark
operator (:mod:`newscrawler_spark.operators.robots`) and the mini-oracle.

Matching rule (Google robots spec, public): the most specific (longest
path-prefix) matching rule wins; on a length tie Allow wins; no matching
rule → allowed. Group selection: exact ``User-agent`` match preferred,
else the ``*`` group.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_LINE_RE = re.compile(r"^\s*([A-Za-z-]+)\s*:\s*(.*?)\s*(?:#.*)?$")


@dataclass(frozen=True)
class RobotsRule:
    host: str
    user_agent: str
    path_prefix: str
    allow: bool
    rule_order: int
    crawl_delay: float


def parse_robots_body(host: str, body: str) -> tuple[list[RobotsRule], list[str]]:
    """Parse one robots.txt → (rules, sitemap_urls).

    Crawl-delay is attached to every rule of its group (flat rule-table
    form so the whole thing broadcasts as one DataFrame, B9).
    """
    groups: dict[str, list[tuple[str, bool]]] = {}
    delays: dict[str, float] = {}
    sitemaps: list[str] = []
    current_uas: list[str] = []
    last_was_ua = False
    order = 0
    for line in body.splitlines():
        m = _LINE_RE.match(line)
        if not m:
            continue
        key = m.group(1).lower()
        val = m.group(2)
        if key == "user-agent":
            if not last_was_ua:
                current_uas = []
            current_uas.append(val.lower())
            groups.setdefault(val.lower(), [])
            last_was_ua = True
            continue
        last_was_ua = False
        if key == "sitemap":
            if val:
                sitemaps.append(val)
        elif key in ("allow", "disallow") and current_uas:
            if val == "" and key == "disallow":
                continue  # empty Disallow = allow all (no rule)
            for ua in current_uas:
                groups.setdefault(ua, []).append((val, key == "allow"))
        elif key == "crawl-delay" and current_uas:
            try:
                d = float(val)
            except ValueError:
                continue
            for ua in current_uas:
                delays[ua] = d
    rules: list[RobotsRule] = []
    for ua, lst in groups.items():
        delay = delays.get(ua, 0.0)
        for prefix, allow in lst:
            rules.append(RobotsRule(host, ua, prefix, allow, order, delay))
            order += 1
        if not lst:  # group with only crawl-delay — keep a marker rule
            rules.append(RobotsRule(host, ua, "", True, order, delay))
            order += 1
    return rules, sitemaps


def select_group(rules: list[RobotsRule], user_agent: str) -> list[RobotsRule]:
    ua = user_agent.lower()
    exact = [r for r in rules if r.user_agent == ua]
    return exact if exact else [r for r in rules if r.user_agent == "*"]


def allowed_py(rules_for_host: list[RobotsRule], path: str, user_agent: str = "*") -> bool:
    """Longest-prefix match over the host's rules; default allow."""
    grp = select_group(rules_for_host, user_agent)
    best: RobotsRule | None = None
    for r in grp:
        if r.path_prefix and path.startswith(r.path_prefix):
            if (
                best is None
                or len(r.path_prefix) > len(best.path_prefix)
                or (len(r.path_prefix) == len(best.path_prefix) and r.allow and not best.allow)
            ):
                best = r
    return True if best is None else best.allow


def crawl_delay_py(rules_for_host: list[RobotsRule], user_agent: str = "*") -> float:
    grp = select_group(rules_for_host, user_agent)
    return grp[0].crawl_delay if grp else 0.0


def url_path(url_canon: str) -> str:
    """Path+query of a canonical URL (rules match on the path part)."""
    m = re.match(r"^[a-z][a-z0-9+.\-]*://[^/]*(/.*)?$", url_canon)
    return (m.group(1) or "/") if m else "/"
