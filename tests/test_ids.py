"""pipeline/ids.py: contiguous global row IDs must exactly reproduce
the single-reducer ROW_NUMBER total order — without planning one."""

from __future__ import annotations

from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.pipeline.ids import assign_row_ids

SF = "/root/testdata/sf0.01"


def test_row_ids_are_contiguous_and_order_correct(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    rows = assign_row_ids(docs, ["n_chars", "doc_id"]).collect()
    n = docs.count()
    ids = sorted(r["row_id"] for r in rows)
    assert ids == list(range(n))
    by_id = sorted(rows, key=lambda r: r["row_id"])
    keys = [(r["n_chars"], r["doc_id"]) for r in by_id]
    assert keys == sorted(keys)


def test_row_ids_invariant_to_partitioning_and_bucket_count(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    base = {
        r["doc_id"]: r["row_id"]
        for r in assign_row_ids(docs, ["n_chars", "doc_id"]).collect()
    }
    for variant in (
        assign_row_ids(docs.repartition(13), ["n_chars", "doc_id"]),
        assign_row_ids(docs, ["n_chars", "doc_id"], num_buckets=7),
        assign_row_ids(docs, ["n_chars", "doc_id"], num_buckets=1),
    ):
        got = {r["doc_id"]: r["row_id"] for r in variant.collect()}
        assert got == base


def test_row_ids_skewed_key_ties_rank_together(spark):
    # a single key value carrying most of the mass cannot be split
    # across buckets — ties must still rank contiguously by tiebreak
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 900, F.lit(5)).otherwise(F.col("id")).alias("k"),
    )
    rows = assign_row_ids(df, ["k", "doc_id"], num_buckets=16).collect()
    by_id = sorted(rows, key=lambda r: r["row_id"])
    assert [r["row_id"] for r in by_id] == list(range(1000))
    keys = [(r["k"], r["doc_id"]) for r in by_id]
    assert keys == sorted(keys)


def test_row_ids_plan_has_no_single_partition_window(spark):
    # the entire point: no empty-frame Window over unpartitioned data
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", "n_chars"
    )
    plan = (
        assign_row_ids(docs, ["n_chars", "doc_id"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SinglePartition" not in plan


def test_row_ids_null_leading_keys_rank_first_and_contiguously(spark):
    # NULL leading keys: bucket 0, NULLS FIRST (Spark ascending
    # default) — pinned as the documented contract
    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 10 == 0, F.lit(None)).otherwise(F.col("id")).alias("k"),
    )
    rows = assign_row_ids(df, ["k", "doc_id"], num_buckets=8).collect()
    assert sorted(r["row_id"] for r in rows) == list(range(100))
    by_id = sorted(rows, key=lambda r: r["row_id"])
    null_ids = [r["row_id"] for r in by_id if r["k"] is None]
    assert null_ids == list(range(10))  # all nulls first, by doc_id
    nonnull = [(r["k"], r["doc_id"]) for r in by_id if r["k"] is not None]
    assert nonnull == sorted(nonnull)


# ----------------------------------------------------- quarantine gate


def test_quarantine_split_rules_and_null_safety(spark):
    from pyspark.sql import functions as F

    from stac_fastapi_duckdb_spark.pipeline.validate import quarantine_split

    rows = [
        (1, "good text", 9),
        (2, "", 0),            # fails nonempty
        (3, None, None),       # NULL text → NULL predicate → failure
        (4, "abc", 99),        # fails length consistency
    ]
    df = spark.createDataFrame(rows, "id long, text string, n long")
    rules = [
        ("nonempty", F.length(F.col("text")) > 0),
        ("len_ok", F.col("n") == F.length(F.col("text"))),
    ]
    valid, bad = quarantine_split(df, rules)
    assert [r.id for r in valid.collect()] == [1]
    got = {r.id: list(r.failed_rules) for r in bad.collect()}
    assert got == {
        2: ["nonempty"],
        3: ["nonempty", "len_ok"],
        4: ["len_ok"],
    }
    # valid frame drops the bookkeeping column
    assert "failed_rules" not in valid.columns
