"""SparkSession lifecycle.

The reference opens a NEW DuckDB connection per request — up to three per
search (schema probe, main query, count; reference
``stac_fastapi/duckdb/config.py:105-159``,
``database_logic.py:760,870,938``). Spark's lifecycle is the opposite:
one long-lived session, created once at startup, shared by every query.

Scale notes (100 TB target):
- AQE on: runtime partition coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuned shuffle counts.
- Arrow on: every toPandas()/pandas_udf crossing is columnar-batched.
- Session timezone pinned to UTC so timestamp comparisons match the
  reference's ISO-8601 semantics (``database_logic.py:264-312``) and the
  DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for the local[32] test harness; on a real cluster these come
# from spark-submit / cluster conf and the builder's .config calls are
# no-ops against an existing session.
_LOCAL_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    # parquet TIMESTAMP(NANOS) (e.g. the events table) is unreadable as a
    # Spark timestamp; read as long ns and convert explicitly at the source
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # default INT96 timestamps carry NO parquet min/max statistics —
    # written files would be invisible to row-group/file skipping
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    # let Python data sources (sources/http_parquet.py) receive pushed
    # filters for row-group stat skipping
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    # local[32]: one partition per core for the ~600k-row bench tables;
    # at cluster scale AQE coalesces post-shuffle partitions anyway.
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_SHUFFLE", "32"),
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
    # 16m (not the 128m default): the bench/test parquet is small and
    # zstd-compressed — at 128m even the 69 MB / 49-row-group sf1
    # lineitem scans as ONE task on 32 cores. At cluster scale this
    # comes from cluster conf; 16m keeps local cold scans split
    # wherever the files have row groups to split on.
    "spark.sql.files.maxPartitionBytes": "16m",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.ui.enabled": "false",
    # managed-table warehouse (bucketed tables) outside the repo tree
    "spark.sql.warehouse.dir": os.environ.get(
        "SPARK_GRAFT_WAREHOUSE", "/tmp/spark_graft_warehouse"
    ),
}


def get_spark(app_name: str = "stac-spark-engine", master: str | None = None) -> SparkSession:
    """Return the shared SparkSession, creating it on first call.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (or local[*])
    when no session exists; inside a cluster deployment the active
    session is simply returned.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return active

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in _LOCAL_DEFAULTS.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
