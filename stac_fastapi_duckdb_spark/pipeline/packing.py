"""Sequence packing for training-batch construction.

Pretraining consumes documents as fixed-length token sequences; turning
a corpus into context windows is the last mile of every training-data
pipeline. Two standard layouts, both deterministic and SQL-replayable:

- :func:`pack_chunks` — GPT-style concatenated-stream packing: within
  each shard, documents concatenate in id order into one token stream
  sliced every ``ctx_len`` tokens; documents may SPAN chunk boundaries
  (the common pretraining layout — no padding waste).
- :func:`pack_greedy` — no-split first-fit packing: documents never
  cross a boundary; each document goes into the current bin if it
  fits, else opens a new one (the instruction-tuning / long-doc layout
  where examples must stay intact). Oversize documents (> ctx) get a
  bin of their own, flagged.

Both shard the corpus by an md5-derived hash of the id (engine-neutral
— no xxhash in the oracle engine) so packing parallelizes: at 100 TB
each shard is an independent packing worker, exactly how production
packers shard. The only wide operation is ONE window (pack_chunks) or
ONE partial-agged groupBy (pack_greedy) per query, keyed on the shard.

Token counts use the corpus tokenizer convention (whitespace tokens,
``dedup.tokens_col``); swap the count column for a real tokenizer's
length at no plan change.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _shard_col(id_col: Column, n_shards: int) -> Column:
    """Engine-neutral shard: first 15 hex chars of md5(id) mod n."""
    return F.pmod(
        F.conv(
            F.substring(F.md5(id_col.cast("string")), 1, 15), 16, 10
        ).cast("long"),
        F.lit(n_shards),
    )


def _n_tokens(text: Column) -> Column:
    from stac_fastapi_duckdb_spark.pipeline.dedup import tokens_col

    return F.size(F.filter(tokens_col(text), lambda x: x != ""))


def pack_chunks(
    df: DataFrame,
    ctx_len: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concatenated-stream sequence packing: within each shard,
    documents concatenate in ``id_col`` order into one token stream
    sliced every ``ctx_len`` tokens → per document, its shard, token
    offset in the shard stream, and the chunk span it lands on.

    → (doc_id, shard, tok_offset, n_toks, chunk_first, chunk_last,
    n_chunks); empty documents carry n_chunks = 0 at their boundary
    position.

    Scale shape: ONE window shuffle keyed on the shard (the exclusive
    running token sum); everything else is map-side arithmetic. Shards
    are independent packing workers — n_shards scales with the
    cluster, and the running sum within a shard is the only sequential
    dependency, exactly as in a production packer."""
    from pyspark.sql.window import Window

    sid = _shard_col(F.col(id_col), n_shards)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        sid.alias("shard"),
        _n_tokens(F.col(text_col)).cast("bigint").alias("n_toks"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum("n_toks").over(w), F.lit(0)).alias("tok_offset")
    out = base.select("doc_id", "shard", off, "n_toks")
    first = F.floor(F.col("tok_offset") / ctx_len).cast("bigint")
    last = F.when(
        F.col("n_toks") > 0,
        F.floor((F.col("tok_offset") + F.col("n_toks") - 1) / ctx_len),
    ).otherwise(first).cast("bigint")
    return out.select(
        "doc_id",
        "shard",
        "tok_offset",
        "n_toks",
        first.alias("chunk_first"),
        last.alias("chunk_last"),
        F.when(F.col("n_toks") > 0, last - first + 1)
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("n_chunks"),
    )


def pack_greedy(
    df: DataFrame,
    ctx_len: int = 512,
    n_shards: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """No-split first-fit packing: within each shard, documents in
    ``id_col`` order go into the current bin while they fit; a
    document that would overflow opens a new bin; a document longer
    than ``ctx_len`` gets a bin of its own (``oversize`` = true — the
    caller truncates or splits it downstream). Documents never cross a
    bin boundary.

    → (doc_id, shard, bin, bin_offset, n_toks, oversize).

    Scale shape: the greedy state (current bin, current fill) is a
    NONLINEAR recurrence — not prefix-decomposable, so no window/scan
    expresses it — and a JVM ``aggregate`` fold accumulating the
    per-doc assignments is O(shard²) in Catalyst (immutable-array
    append copies the accumulator per element; measured 9.7 s/shard at
    50k docs). The right physical operator is an Arrow-batched LINEAR
    kernel per shard (``applyInPandas`` — the same built-ins-can't-
    express-it precedent as semdedup's GEMM): one partial-agg-free
    groupBy shuffle on the shard key, a python-loop fold that is pure
    integer arithmetic over the Arrow batch, one output row per doc.
    Shard count scales the parallelism; shard size bounds kernel
    memory."""
    import pandas as pd

    sid = _shard_col(F.col(id_col), n_shards)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        sid.alias("shard"),
        _n_tokens(F.col(text_col)).cast("bigint").alias("n_toks"),
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, offs, overs = [], [], []
        cur_bin, fill = -1, ctx_len + 1
        for n in pdf["n_toks"]:
            oversize = n > ctx_len
            if oversize or fill + n > ctx_len:
                cur_bin += 1
                off = 0
            else:
                off = fill
            # an oversize doc FILLS its bin (next doc always opens a
            # new one); otherwise the fill advances past this doc
            fill = ctx_len + 1 if oversize else off + n
            bins.append(cur_bin)
            offs.append(off)
            overs.append(oversize)
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "shard": pdf["shard"],
                "bin": pd.Series(bins, dtype="int64"),
                "bin_offset": pd.Series(offs, dtype="int64"),
                "n_toks": pdf["n_toks"],
                "oversize": pd.Series(overs, dtype="bool"),
            }
        )

    return base.groupBy("shard").applyInPandas(
        _pack,
        "doc_id long, shard long, bin long, bin_offset long, "
        "n_toks long, oversize boolean",
    )
