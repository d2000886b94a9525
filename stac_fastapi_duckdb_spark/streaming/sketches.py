"""Streaming sketch maintenance: a standing HyperLogLog register store
updated per micro-batch via ``foreachBatch`` — the continuous-ingest
shape for "distinct users per segment, all time" at 100 TB, where the
state that must survive is 2^p small ints per group, NOT the identity
set (a streaming ``dropDuplicates``/exact-distinct state grows with the
identity cardinality; HLL state is constant).

Why ``foreachBatch`` and not a streaming aggregate: the register merge
(element-wise max) is a custom aggregation over an array column —
outside the built-in streaming agg surface — and the artifact must be
readable BETWEEN micro-batches by other jobs (dashboards, the estimate
query). Each micro-batch computes the batch's own bounded sketch
(groups·2^p cells, one partial-agged shuffle — ``hll_sketch``), merges
it with the standing store by element-wise max, and atomically swaps
the store directory. Because max-merge is associative AND commutative,
the final registers are BIT-IDENTICAL to a batch ``hll_sketch`` over
all data regardless of how the stream was micro-batched — which is what
lets the DuckDB batch replay oracle-check a genuinely streaming
pipeline.

The checkpoint directory carries source offsets across restarts: a
re-run with the same checkpoint consumes only new files and never
double-merges a committed batch (max-merge is also idempotent, so even
an uncommitted replay after a crash cannot corrupt the registers —
re-merging the same sketch is a no-op; cf. reference
stac_fastapi/duckdb/config.py's cache knobs for the serving-side
analog).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from stac_fastapi_duckdb_spark.pipeline.sketch import (
    hll_estimate,
    hll_merge,
    hll_sketch,
)
from stac_fastapi_duckdb_spark.streaming.store_swap import (
    recover_store,
    swap_store,
)


def merge_sketch_batch(
    spark: SparkSession,
    store_dir: str,
    batch_df: DataFrame,
    group_col: str,
    value_col: str,
    p: int = 9,
) -> None:
    """Merge one micro-batch into the register store (atomic swap:
    write the merged store to a sibling dir, then rename over the old
    one — readers never observe a partial store; a crash mid-swap is
    healed by ``recover_store`` before the next merge reads)."""
    recover_store(store_dir)
    new = hll_sketch(batch_df, group_col, value_col, p)
    if os.path.isdir(store_dir):
        prev = spark.read.parquet(store_dir)
        new = hll_merge(prev, new, group_col)
    tmp = store_dir.rstrip("/") + ".swap"
    new.write.mode("overwrite").parquet(tmp)
    swap_store(store_dir, tmp)


def streaming_hll_distinct(
    spark: SparkSession,
    source_path: str,
    group_col: str = "event_type",
    value_col: str = "user_id",
    p: int = 9,
    store_dir: str | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """Run the file-source event stream to completion (AvailableNow),
    maintaining the HLL register store per micro-batch; → the estimate
    over the final store: (group_col, zero_regs, est_distinct).

    Fresh ``store_dir``/``checkpoint_dir`` default to throwaway temp
    dirs (a from-scratch run whose result is deterministic); pass both
    to get the incremental resume behavior — only files that arrived
    since the last run are read and merged.
    """
    from stac_fastapi_duckdb_spark.streaming.events import read_events_stream

    if store_dir is None:
        store_dir = os.path.join(
            tempfile.mkdtemp(prefix="hll_store_"), "registers"
        )
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="hll_ckpt_")

    stream = read_events_stream(
        spark, source_path, max_files_per_trigger=max_files_per_trigger
    )

    def _merge(batch_df: DataFrame, _batch_id: int) -> None:
        merge_sketch_batch(
            spark, store_dir, batch_df, group_col, value_col, p
        )

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(store_dir):  # zero input files → empty store
        return hll_estimate(
            hll_sketch(
                spark.read.parquet(source_path).limit(0),
                group_col,
                value_col,
                p,
            ),
            p,
        )
    return hll_estimate(spark.read.parquet(store_dir), p)


# ---------------------------------------------------------------------------
# streaming count-min sketch — the NON-idempotent merge case
# ---------------------------------------------------------------------------
#
# HLL's max-merge is idempotent, so a crash between "store swapped" and
# "checkpoint committed" is harmless (the replayed batch re-merges to
# the same registers). CMS merges by cell-wise SUM — replaying a batch
# DOUBLE-COUNTS — so the store must record which batch it has absorbed:
# each swap writes a `_merged_batch_id` marker alongside the registers,
# and the merge function skips any batch id ≤ the marker. That makes
# (store + marker) transactional with respect to foreachBatch's
# at-least-once replay contract: the pair is renamed into place
# atomically, so a replayed batch either sees the pre-crash store
# (marker < id → merges) or the post-swap store (marker ≥ id → no-op).


def merge_cms_batch(
    spark: SparkSession,
    store_dir: str,
    batch_df: DataFrame,
    batch_id: int,
    value_col: str,
    depth: int = 4,
    width: int = 512,
    seed: str = "cms-v1",
) -> None:
    """Merge one micro-batch's CMS into the standing cell table,
    exactly once per batch id (sum-merge is not idempotent — see
    module notes)."""
    import json as _json

    from stac_fastapi_duckdb_spark.pipeline.sketch import cms_merge, cms_sketch

    recover_store(store_dir)
    marker = os.path.join(store_dir, "_merged_batch_id")
    if os.path.isdir(store_dir):
        with open(marker) as fh:
            last = _json.load(fh)["batch_id"]
        if batch_id <= last:
            return  # replayed batch already absorbed — exactly-once
    new = cms_sketch(batch_df, value_col, depth, width, seed)
    if os.path.isdir(store_dir):
        prev = spark.read.parquet(os.path.join(store_dir, "cells"))
        new = cms_merge(prev, new)
    tmp = store_dir.rstrip("/") + ".swap"
    shutil.rmtree(tmp, ignore_errors=True)
    new.write.mode("overwrite").parquet(os.path.join(tmp, "cells"))
    with open(os.path.join(tmp, "_merged_batch_id"), "w") as fh:
        _json.dump({"batch_id": batch_id}, fh)
    swap_store(store_dir, tmp)


def streaming_cms_counts(
    spark: SparkSession,
    source_path: str,
    probes: DataFrame,
    value_col: str = "event_type",
    depth: int = 4,
    width: int = 512,
    store_dir: str | None = None,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int = 10,
) -> DataFrame:
    """Run the event stream to completion maintaining the CMS cell
    store, then estimate the probes' frequencies from the final store
    → (value_col, est_n). Because every batch merges exactly once, the
    final cell table is IDENTICAL to the batch ``cms_sketch`` over all
    data — the DuckDB batch replay holds for the streaming path."""
    from stac_fastapi_duckdb_spark.pipeline.sketch import cms_estimate
    from stac_fastapi_duckdb_spark.streaming.events import read_events_stream

    if store_dir is None:
        store_dir = os.path.join(tempfile.mkdtemp(prefix="cms_store_"), "s")
    if checkpoint_dir is None:
        checkpoint_dir = tempfile.mkdtemp(prefix="cms_ckpt_")

    stream = read_events_stream(
        spark, source_path, max_files_per_trigger=max_files_per_trigger
    )

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        merge_cms_batch(
            spark, store_dir, batch_df, batch_id, value_col, depth, width
        )

    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    if not os.path.isdir(store_dir):  # zero input files
        cells = spark.createDataFrame([], "row int, cell long, cnt long")
    else:
        cells = spark.read.parquet(os.path.join(store_dir, "cells"))
    return cms_estimate(cells, probes, value_col, depth, width)
