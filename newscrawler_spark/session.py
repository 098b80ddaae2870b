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

    # GC (overridable via SPARK_GRAFT_GC): ParallelGC at every width.
    # History: round 2 used ZGC at >=8 task threads because the fetch
    # join heap-cached each round's html payload (GB-scale old-gen;
    # local[16] bulk round 65s ParallelGC → 46s ZGC at 12g). Round 3's
    # streaming fetch path (runner.py) never stores html — it flows
    # scan→Arrow extract — so the heap is allocation-light again and the
    # throughput collector wins at width too (profiled local[16] bulk
    # round: ZGC 47.1s wall / 88.9s GC / 303.8s CPU vs ParallelGC 40.6s
    # wall / 31.5s GC / 268.3s CPU; ZGC's concurrent cycles burn task
    # CPU proportional to allocation rate). ParallelGC also undoes the
    # +25-40% ZGC tax on sub-second contract queries (VERDICT r2 #6).
    gc_flag = os.environ.get("SPARK_GRAFT_GC", "-XX:+UseParallelGC")
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
        # 12g: the bulk-round working set (columnar caches of the fetched
        # set + fused process output) fits with headroom — 8g thrashed
        # ZGC into allocation stalls, 20g+ slowed the throughput
        # collectors' full collections
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.driver.extraJavaOptions", gc_flag)
        .config("spark.executor.extraJavaOptions", gc_flag)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
