"""Write path: partitioned / bucketed / size-targeted parquet sinks.

The reference has NO write path (every transaction method is a ``pass``
stub — reference ``stac_fastapi/duckdb/database_logic.py:1026-1187``).
At 100 TB the write-side layout *is* the query plan: these helpers
encode the three layout decisions that make the read side cheap.

- **Partition columns** (``write_partitioned``): low-cardinality
  predicate columns (collection id, event date) become directory
  partitions so Catalyst prunes entire subtrees before listing files
  (`PartitionFilters` in the scan node — free "source pruning", the
  scalable version of the reference's per-collection URL registry).
- **Bucketing** (``write_bucketed``): high-cardinality JOIN keys
  (order key, user id, doc id) become hash buckets; two tables
  bucketed on the same key join with ZERO shuffle (no Exchange in the
  plan) — at 100 TB the difference between an hours-long shuffle and
  a map-side merge.
- **File sizing** (``repartition_by_size``): parquet files should land
  near the HDFS-block/object-store sweet spot (~128 MB-1 GB). Many
  tiny files destroy listing + footer-read time; one giant file
  destroys scan parallelism (a single row group can't be split).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TARGET_FILE_BYTES = 128 << 20


def estimated_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for the logical plan (driver-side, no
    job). For freshly-scanned parquet this is file size; post-transform
    estimates are coarse — good enough to pick a file count."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def repartition_by_size(
    df: DataFrame,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    partition_cols: list[str] | None = None,
) -> DataFrame:
    """Repartition so each output file lands near ``target_file_bytes``.
    With ``partition_cols``, rows are hash-distributed by those columns
    so each task writes few directory partitions (avoids the classic
    every-task-writes-every-partition small-file explosion)."""
    n = max(1, estimated_bytes(df) // target_file_bytes)
    if partition_cols:
        return df.repartition(int(n), *[F.col(c) for c in partition_cols])
    return df.repartition(int(n))


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "error",
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> None:
    """Directory-partitioned parquet write (Hive layout). Reads with a
    predicate on ``partition_cols`` show `PartitionFilters` in the scan
    and never touch pruned directories."""
    out = repartition_by_size(df, target_file_bytes, partition_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "error",
) -> None:
    """Hash-bucketed (optionally sorted) managed table. Joins between
    tables bucketed identically on the join key compile to shuffle-free
    SortMergeJoin (no Exchange on either side)."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def write_stac_collections(
    items: DataFrame,
    base_path: str,
    collection_col: str = "collection",
    mode: str = "error",
) -> None:
    """Persist a STAC item table partitioned by collection — the scaled
    replacement for the reference's one-file-per-collection registry
    (reference ``config.py:47-58``): same source-pruning semantics, but
    via partition pruning over a single table."""
    write_partitioned(items, base_path, [collection_col], mode=mode)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read back a Hive-partitioned dataset (partition columns are
    reconstructed from directory names)."""
    return spark.read.parquet(path)


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 << 20,
    partition_cols: list[str] | None = None,
) -> dict:
    """Small-files compaction — the standing maintenance job every
    streaming/ingest layout needs (micro-batch sinks and per-batch
    `batch=N` directories accrete KB-scale files whose per-file open +
    footer cost eventually dominates scans; the reference never
    compacts because it never writes). Reads the fragmented dataset,
    rewrites it size-targeted (optionally re-partitioned by columns),
    and reports before/after file counts — data content is unchanged,
    so the caller can assert equality cheaply.

    Scale shape: one distributed read + one size-targeted shuffle
    write; the ONLY driver-side work is the file listing for the
    report. Run it per-partition-subtree in production so compaction
    of one day never rewrites the table.
    """
    import os

    def _count_files(p: str) -> int:
        n = 0
        for _, _, fs in os.walk(p):
            n += sum(f.endswith(".parquet") for f in fs)
        return n

    before = _count_files(path)
    df = spark.read.parquet(path)
    if partition_cols:
        write_partitioned(
            df,
            out_path,
            partition_cols,
            mode="overwrite",
            target_file_bytes=target_file_bytes,
        )
    else:
        repartition_by_size(df, target_file_bytes).write.mode(
            "overwrite"
        ).parquet(out_path)
    return {
        "files_before": before,
        "files_after": _count_files(out_path),
        "rows": spark.read.parquet(out_path).count(),
    }
