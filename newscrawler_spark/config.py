"""Crawl job configuration.

Plays the role of the reference's ini config + site list
(``newscrawler/config.py :: CrawlerConfig`` / ``JsonConfig`` — symbol-level
cite, reference mount empty, SURVEY.md §0; operators A1/A2). All values are
plain driver-side parameters; the seeds live in a small DataFrame.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


@dataclass(frozen=True)
class CrawlConfig:
    # scheduling / politeness (SURVEY.md B7/B8)
    per_host_budget: int = 5          # fetches per host per round
    batch_size: int = 100_000         # global fetch budget per round
    max_depth: int = 3                # scrapy DEPTH_LIMIT analog (B6)
    max_retry: int = 2                # RetryMiddleware analog (B10)

    # heuristics gate (D7) — boolean expression over the page_stats
    # columns, evaluated by Catalyst after compile_condition().
    # Default mirrors the reference's documented default condition.
    heuristics_condition: str = (
        "og_type AND (linked_headlines OR self_linked_headlines)"
    )
    linked_headlines_max_ratio: float = 0.65   # D2 threshold
    self_linked_headlines_max_ratio: float = 0.56  # D3 threshold

    # robots (A4/B9)
    respect_robots: bool = True
    user_agent: str = "newscrawler"
    # politeness time quantum one fetch_round models (B8): with a robots
    # Crawl-delay d, a host's budget is min(per_host_budget,
    # max(1, floor(round_seconds / d))) — deterministic, shared with the
    # mini-oracle.
    round_seconds: float = 10.0

    # A3 fetch join strategy: broadcast the (bounded) candidate set so the
    # huge pages table is STREAMED, never shuffled — a round's candidates
    # are ≤ hosts×budget (or batch_size) rows. On a real cluster with a
    # url_hash-bucketed pages table, set False to use the shuffle-free
    # bucketed sort-merge join instead (candidates >100M won't broadcast).
    broadcast_fetch_join: bool = True
    # Physical strategy for the A3 fetch join. None = auto: "broadcast"
    # for normal (bounded-candidate) rounds; "bucket" once the round's
    # candidate set was materialized (A7 bulk mode, frontier >
    # materialize_candidates_rows) — building a 10^8-row hash relation
    # on the driver is the wrong shape there, while the co-bucketed
    # candidates⋈pages shuffled-hash join moves ZERO page bytes and has
    # no driver-side build at all. Explicit values override:
    # "broadcast" | "bucket" | "shuffle".
    fetch_join_strategy: str | None = None
    # bucket count for the enriched-corpus table and the materialized
    # candidate table (must match for the exchange-free join). Size it so
    # one bucket of candidates fits an executor's hash-build memory:
    # at 10^10 urls ~ 64k buckets; 32 covers every local test tier.
    corpus_buckets: int = 32
    # rank_in_host physical strategy: None = auto (distributed once the
    # frontier exceeds materialize_candidates_rows). The window form sorts
    # each host in ONE task — a 10^8-row host is a serial sort; the
    # distributed form range-partitions on (host, total order) and adds
    # per-slice offsets (frontier.rank_in_host_distributed).
    distributed_rank: bool | None = None
    # ONE Arrow pass for stats+extraction+links (operators/process.py)
    # instead of three html transfers; False = the unfused operator chain
    fused_pipeline: bool = True
    # materialize each round's fetched set to scratch parquet instead of
    # a JVM cache. Default off: the cache is faster when it fits (locally
    # measured); turn on when a round's html payload outsizes executor
    # memory (compression + column pruning beat cache eviction there).
    scratch_fetched: bool = False
    # materialize each round's scheduled candidate set to scratch parquet
    # before the fetch join: every broadcast consumer then builds from a
    # cheap columnar scan instead of re-deriving (or cache-scanning) the
    # schedule window; also decouples the window's lineage from every
    # downstream job. Costs one write job per round, so None = auto:
    # materialize only when the previous round's frontier (known free
    # from its manifest) exceeds materialize_candidates_rows.
    materialize_candidates: bool | None = None
    materialize_candidates_rows: int = 150_000

    # scale path (J / §5.3)
    hot_host_threshold: int = 50_000  # rows/host above which we salt
    salt_buckets: int = 8
    seen_buckets: int = 32            # bucket(url_hash) shard count
    bloom_bits_per_key: int = 10      # ~1% fpp
    use_bloom_prefilter: bool = True
    # which probabilistic seen-filter backs the prefilter: "bloom"
    # (default; cheapest bits/key) or "cuckoo" (16-bit fingerprints,
    # ~50x lower FP rate, supports evict-to-recrawl deletion). Both are
    # exact-confirmed, so the dedup RESULT is identical either way.
    seen_filter: str = "bloom"
    # Bloom pays its per-round shard fold + probe only once the seen set
    # is large; below this row count the exact anti-join alone is faster
    # (the filter exists for 10^8-10^10 keys, not 10^4). Crossing the
    # threshold triggers one full shard build, then incremental folds.
    # 0 = bloom from round one (tests use this to pin the bloom path).
    bloom_min_seen_rows: int = 200_000
    # fold the per-round seen_delta ledger into one bucketed base table
    # every K committed rounds (0 = never): read_seen then scans
    # base + <=K deltas instead of every round since genesis
    compact_seen_every: int = 8

    # link-graph frontier signal (operators/linkgraph.py): 0 = off
    # (default — the reference scheduler is priority+depth only, and the
    # q20-q26 ordering goldens assume it). >0 = at bootstrap, build the
    # host graph from the corpus html (one Catalyst regexp projection),
    # run fixed-point integer PageRank, persist (node, rank_fp) under
    # state_dir/host_ranks, and add round(weight · host-rank-percentile)
    # to every frontier row's priority at schedule time — the classic
    # crawl-ordering signal (Cho/Garcia-Molina/Page 1998). Deterministic:
    # integer ranks + integer bonus, identical at any cluster size.
    rank_priority_weight: int = 0
    rank_iterations: int = 4

    # seeds defaults (A1)
    default_crawler: str = "recursive_sitemap"

    def with_overrides(self, **kw) -> "CrawlConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = CrawlConfig()
