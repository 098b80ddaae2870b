"""newscrawler_spark — a brand-new PySpark-native crawl/analytics engine.

Re-expresses the capabilities of the reference crawler (JBH168/Newscrawler,
a scrapy-based news crawler; see SURVEY.md) as idiomatic Spark over tables
of Common-Crawl-style pages ``(url, warc_ts, html, text, lang)``:

- URL frontier as a DataFrame, priority queue as windowed rank-per-host
  ordering (SURVEY.md §3 B7), politeness as per-host budgets with salted
  repartitioning for hot hosts (B8, §5.3).
- URL-seen set as 64-bit hashes with partitioned Bloom shards (B2/B3/J).
- robots.txt rules parsed into a broadcast rule table (A4/B9).
- Heuristic article extraction (headline/date/body text-density scoring)
  as a pandas/Arrow UDF map stage (D, E) — byte-identical per url.
- Checkpoint/resume via atomic per-round state snapshots (A11/G2).

Everything here derives from public knowledge only: the Apache Spark /
PySpark API and the survey of the reference's public behavior. The
reference mount was empty this session (SURVEY.md §0); goldens are defined
by the pure-Python mini-oracle in ``tests/oracle_crawler.py``.
"""

__version__ = "0.1.0"
