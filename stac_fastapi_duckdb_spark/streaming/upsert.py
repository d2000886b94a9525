"""Streaming keyed upsert (SCD-Type-1 last-write-wins) into a standing
parquet table — the continuously-maintained "current state per key"
every serving layer sits on (Delta/Hudi ``MERGE INTO`` semantics,
re-expressed as a foreachBatch merge over an atomically swapped store).

Reference scope note: the reference engine has no write path at all
(stac-fastapi-duckdb is read-only over parquet); this is beyond-
reference pipeline surface, same family as the CMS/HLL stores in
``streaming/sketches.py``.

Semantics: the store holds exactly ONE row per key — the record with
the greatest ``(ts, seq)`` seen so far (``seq`` breaks equal-timestamp
ties, so the winner is total-ordered and engine-independent). The
merge is IDEMPOTENT (max-merge over a total order), so unlike the CMS
sum-merge no batch-id guard is needed: a replayed micro-batch after a
crash re-derives the same winners. Each batch is first reduced to its
per-key winner (ONE shuffle bounded by distinct keys in the batch),
then merged against the standing table with the same rule; the store
swap is atomic (write-to-tmp + rename) so readers never see a torn
table.

At scale the standing table is partitioned/bucketed by the key and the
merge joins batch-winners (small) against it broadcast- or
bucket-wise; rewriting only touched partitions is the natural
extension — the semantics above are what the oracle pins.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stac_fastapi_duckdb_spark.streaming.store_swap import (
    recover_store,
    swap_store,
)


def _winners(
    df: DataFrame, key_cols: list[str], ts_col: str, seq_col: str
) -> DataFrame:
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(ts_col).desc(), F.col(seq_col).desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_upsert_batch(
    spark: SparkSession,
    store_dir: str,
    batch_df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    seq_col: str = "event_id",
) -> None:
    """Merge one micro-batch into the standing per-key table (LWW by
    (ts, seq)); atomic swap, idempotent under foreachBatch replay; a
    crash mid-swap is healed by ``recover_store``."""
    recover_store(store_dir)
    new = _winners(batch_df, key_cols, ts_col, seq_col)
    table = os.path.join(store_dir, "table")
    if os.path.isdir(table):
        prev = spark.read.parquet(table)
        new = _winners(
            prev.unionByName(new.select(*prev.columns)),
            key_cols,
            ts_col,
            seq_col,
        )
    tmp = store_dir.rstrip("/") + ".swap"
    shutil.rmtree(tmp, ignore_errors=True)
    new.write.mode("overwrite").parquet(os.path.join(tmp, "table"))
    swap_store(store_dir, tmp)


def streaming_upsert(
    spark: SparkSession,
    source_path: str,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    seq_col: str = "event_id",
    store_dir: str | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """Run the event stream to completion maintaining the keyed LWW
    store, then return the final current-state table. Because the
    merge rule is associative/idempotent over the (ts, seq) total
    order, the final table is IDENTICAL to the batch last-per-key
    query over all data — which is exactly what the DuckDB oracle
    replays."""
    from stac_fastapi_duckdb_spark.streaming.events import read_events_stream

    key_cols = list(key_cols or ["user_id"])
    if store_dir is None:
        store_dir = os.path.join(tempfile.mkdtemp(prefix="upsert_store_"), "s")
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="upsert_ckpt_")

    empty = spark.createDataFrame(
        [], "user_id long, event_id long, ts timestamp, "
        "event_type string, value double",
    )
    try:
        stream = read_events_stream(
            spark, source_path, max_files_per_trigger=max_files_per_trigger
        )
    except Exception:
        # empty landing directory: the file source can't probe a schema
        # yet — there is no state to serve
        return empty

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        merge_upsert_batch(
            spark, store_dir, batch_df, key_cols, ts_col, seq_col
        )

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    table = os.path.join(store_dir, "table")
    if not os.path.isdir(table):  # zero input files
        return empty
    return spark.read.parquet(table)
