"""SparkSession factory with scale-aware defaults.

Local mode is a stand-in for a multi-executor cluster (BASELINE.md):
the same code ships via ``spark-submit --py-files`` unchanged. All the
knobs that matter at 100 TB are set here once:

- AQE on (runtime coalesce + skew-join splitting).
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster set it to 2-3x total executor cores via ``extra_conf``.
- Arrow enabled for pandas UDFs; ``maxRecordsPerBatch`` kept small
  because the hot UDF inputs carry multi-KB ``html`` blobs — cap batch
  *bytes*, not rows (SURVEY.md §7.5).
- Session timezone pinned UTC so DuckDB oracle comparisons are stable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "newscrawler-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = default_parallelism()
    if master is None:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        # local[N] → N; matches cores so small-scale shuffles don't
        # over-parallelize. On a real cluster pass ~2-3x total cores.
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else str(cores)
        shuffle_partitions = cores if n == "*" else int(n)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # html blobs are KB-sized; 2048 rows/batch keeps Arrow batches ~10s of MB
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # ParallelGC: measured 1.6x faster than the JDK-17 default G1 on
        # the allocation-heavy Arrow/html workload at high thread counts
        # (G1's concurrent cycles throttled 16-32 task threads; bigger
        # heaps made it WORSE). Throughput collector fits batch jobs.
        .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
