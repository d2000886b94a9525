"""Continuous dedup ingest: a document stream admitted against a
standing deduplicated corpus.

Each micro-batch runs through ``foreachBatch``:

1. **within-batch** exact dedup (keep min id per fingerprint) — a
   burst can contain its own duplicates;
2. **batch-vs-corpus** near-dup rejection via the banded
   ``incremental_near_dup`` join (new ⋈ base on (band, bhash) only —
   the standing corpus is never re-paired with itself);
3. survivors are APPENDED to the corpus directory, so later batches
   dedup against everything admitted so far.

Exactly-once: ``foreachBatch`` replays a failed batch with the same
batch_id; the append is made idempotent by routing each batch to its
own subdirectory, rewritten wholesale on replay. The subdirectory
uses the partition-style name
``batch=<id>`` (an underscore prefix would be hidden from Spark's file
listing), so corpus readers see a ``batch`` partition column — inert
for dedup, useful lineage for everything else.

At scale the banded base signatures are a precomputed bucketed
artifact (see ``incremental_near_dup``'s docstring); this module
re-derives them per batch only because the test corpus is tiny.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from stac_fastapi_duckdb_spark.pipeline.dedup import incremental_near_dup
from stac_fastapi_duckdb_spark.pipeline.text import fingerprint_col


def admit_batch(
    spark: SparkSession,
    batch: DataFrame,
    corpus_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    bands: int = 32,
) -> DataFrame:
    """Dedup one arriving batch (within itself, then against the
    corpus at ``corpus_dir``) and return the admitted rows."""
    # 1. within-batch exact dedup
    batch = (
        batch.withColumn("_fp", fingerprint_col(F.col(text_col)))
        .withColumn(
            "_rk",
            F.row_number().over(
                Window.partitionBy("_fp").orderBy(F.col(id_col))
            ),
        )
        .filter(F.col("_rk") == 1)
        .drop("_fp", "_rk")
    )
    # 2. near-dup rejection against the standing corpus
    if os.path.isdir(corpus_dir) and any(
        f.endswith(".parquet") for _, _, fs in os.walk(corpus_dir) for f in fs
    ):
        base = spark.read.parquet(corpus_dir)
        dup_pairs = incremental_near_dup(
            batch, base, text_col=text_col, id_col=id_col,
            threshold=threshold, bands=bands,
        )
        dup_ids = dup_pairs.select(F.col("new_id").alias(id_col)).distinct()
        batch = batch.join(dup_ids, id_col, "left_anti")
    return batch


def run_dedup_ingest(
    spark: SparkSession,
    stream: DataFrame,
    corpus_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    bands: int = 32,
) -> None:
    """Run the stream to completion (AvailableNow), admitting each
    micro-batch through ``admit_batch`` and appending survivors to
    ``corpus_dir``."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        admitted = admit_batch(
            spark, batch_df, corpus_dir,
            text_col=text_col, id_col=id_col,
            threshold=threshold, bands=bands,
        )
        # idempotent under foreachBatch replay: rewrite the batch's own
        # subdirectory wholesale
        admitted.write.mode("overwrite").parquet(
            os.path.join(corpus_dir, f"batch={batch_id}")
        )

    q = (
        stream.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
