"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship crawl on the smoke-tier synthetic
corpus and returns its fetch log (the north rule's headline artifact:
windowed rank-per-host ordering). ``queries()``/``oracle_sql()`` cover
SURVEY.md §3's operator inventory (relational shapes over the driver's
TPC-H-ish views, crawl operators over the deterministic fixture cache)
plus the training-data additions (dedup / similarity / text analysis /
multimodal). Implementations live in ``newscrawler_spark.contract``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full crawl of the smoke corpus → fetch log.

    Deterministic: same corpus (seed=42), same config ⇒ byte-stable
    ordering (engine ≡ mini-oracle, tests/test_e2e_ordering.py).
    """
    from newscrawler_spark.contract import SMOKE_CFG, ensure_cache, _p

    ensure_cache(spark, "smoke")
    return (
        spark.read.parquet(_p("smoke", "fetch_log"))
        .orderBy("fetch_round", "host", "rank_in_host")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from newscrawler_spark.contract import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from newscrawler_spark.contract import all_oracles

    return all_oracles()
