"""Bucketed-parquet table IO for the exchange-free A3 fetch join.

SURVEY.md §5.3 / J4. At bulk (A7 download-list) scale the candidate set
IS the corpus — building a 10^8-row broadcast hash relation on the
driver is a serial stage and each executor clones the whole relation.
The right 100 TB shape is two tables bucketed by ``url_hash`` into the
SAME bucket count: Spark's bucketed scan then feeds a shuffled-hash join
with ZERO exchange and ZERO sort on either side — page html bytes never
move, and the per-task hash build is one bucket of candidates
(|cand| / buckets rows), not the whole set.

Mechanics verified in this sandbox (plan shows ``ShuffledHashJoin`` with
no Exchange/Sort below it when both sides are one-file-per-bucket):
``bucketBy`` requires ``saveAsTable``; the default in-memory catalog
loses table metadata across sessions, so each write drops a JSON sidecar
(``_BUCKET_SPEC``) with the schema + bucket spec, and :func:`read_bucketed`
re-registers the external table via ``CREATE TABLE ... USING parquet
CLUSTERED BY ... LOCATION ...`` (explicit schema — schema inference is
not supported for bucketed DDL). We ``repartition(buckets, key)`` before
the write so every bucket is exactly ONE file — the condition under
which Spark also trusts the ``SORTED BY`` clause and drops the sort.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SPEC_FILE = "_BUCKET_SPEC"


def _table_for(path: str, spark: SparkSession) -> str:
    # Scoped to (path, session): the in-memory catalog is per-session,
    # but scoping by applicationId also keeps two concurrent sessions
    # pointed at the same path from ever racing a shared-metastore
    # DROP/CREATE if a persistent catalog is configured (VERDICT r3
    # "what's wrong" 5c).
    app = spark.sparkContext.applicationId
    return (
        "bkt_"
        + hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:12]
        + "_"
        + hashlib.md5(app.encode()).hexdigest()[:8]
    )


def _ddl(schema: T.StructType) -> str:
    return ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )


def write_bucketed(df: DataFrame, path: str, buckets: int, key: str) -> None:
    """Write ``df`` as a one-file-per-bucket external parquet table.

    Commit discipline mirrors store.py's manifest rule: the spec sidecar
    is the COMMIT MARKER, written last via tmp + atomic rename. A crash
    anywhere before the rename leaves no ``_BUCKET_SPEC``, so readers
    (``is_bucketed`` → False) treat the directory as un-bucketed data
    rather than trusting a half-written table (VERDICT r3 #6).
    """
    spark = df.sparkSession
    table = _table_for(path, spark)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    (
        df.repartition(buckets, F.col(key))
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )
    spec = {
        "buckets": buckets,
        "key": key,
        "schema": json.loads(df.schema.json()),
    }
    tmp = os.path.join(path, SPEC_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(spec, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(path, SPEC_FILE))


def _load_spec(path: str) -> dict | None:
    """Parse the spec sidecar; None for missing, torn, or stale-format
    files (a spec without the required keys is as untrustworthy as an
    unparseable one)."""
    try:
        with open(os.path.join(path, SPEC_FILE)) as f:
            spec = json.load(f)
        if all(k in spec for k in ("buckets", "key", "schema")):
            return spec
    except (OSError, json.JSONDecodeError):
        pass
    return None


def is_bucketed(path: str) -> bool:
    return _load_spec(path) is not None


def read_bucketed(spark: SparkSession, path: str) -> DataFrame:
    """Re-register (idempotently) and scan the bucketed table at ``path``.

    A missing or torn spec degrades to a plain parquet scan — the join
    loses the zero-exchange property but stays correct; callers that
    gate on :func:`is_bucketed` first never hit this path except in the
    narrow window where the spec is torn between check and read.
    """
    spec = _load_spec(path)
    if spec is None:
        return spark.read.parquet(path)
    table = _table_for(path, spark)
    key, buckets = spec["key"], spec["buckets"]
    schema = T.StructType.fromJson(spec["schema"])
    # DROP+CREATE every read: the in-memory catalog may hold a stale
    # registration from a prior run at the same path; EXTERNAL semantics
    # (explicit LOCATION) mean DROP never touches the files.
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({_ddl(schema)}) USING parquet "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {buckets} BUCKETS "
        f"LOCATION '{os.path.abspath(path)}'"
    )
    return spark.table(table)
