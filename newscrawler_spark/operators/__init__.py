"""Spark operators of the crawl engine (SURVEY.md §3 → §4.2 round plan)."""
