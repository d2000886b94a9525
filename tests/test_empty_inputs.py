"""Empty-input robustness: every operator family must return an empty
(or sensible) result on zero rows — not throw. At 100 TB a partition
filter routinely produces empty inputs mid-pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").filter(F.lit(False))


@pytest.fixture(scope="module")
def empty_events(spark):
    from stac_fastapi_duckdb_spark.streaming import normalize_event_ts

    return normalize_event_ts(
        spark.read.parquet(f"{SF}/events.parquet")
    ).filter(F.lit(False))


def test_dedup_ops_on_empty(empty_docs):
    from stac_fastapi_duckdb_spark.pipeline import dedup as D

    assert D.exact_dedup(empty_docs).count() == 0
    assert D.minhash_lsh_candidates(empty_docs).count() == 0
    assert D.simhash_near_dup_pairs(empty_docs).count() == 0
    assert D.ngram_jaccard_pairs(empty_docs).count() == 0


def test_similarity_on_empty(spark):
    from stac_fastapi_duckdb_spark.pipeline import similarity as S

    empty_emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.lit(False))
    assert S.embedding_near_dup_pairs(empty_emb).count() == 0


def test_sampling_on_empty(empty_docs):
    from stac_fastapi_duckdb_spark.pipeline.sampling import (
        dataset_split,
        hash_sample,
        label_balance,
        pack_sequences,
    )

    assert hash_sample(empty_docs, "doc_id", 0.5).count() == 0
    assert dataset_split(empty_docs, "doc_id", {"a": 1.0}).count() == 0
    assert label_balance(empty_docs, "lang").count() == 0
    assert (
        pack_sequences(empty_docs, "lang", "doc_id", "n_chars", 100).count() == 0
    )


def test_cdc_on_empty(spark, empty_events):
    from stac_fastapi_duckdb_spark.operators.cdc import (
        apply_cdc,
        scd2_from_changelog,
    )

    assert (
        scd2_from_changelog(
            empty_events, ["user_id"], "ts", ["event_type"], ["event_id"]
        ).count()
        == 0
    )
    snap = spark.createDataFrame([(1, 1.0)], "key int, bal double")
    empty_ch = spark.createDataFrame(
        [], "key int, op string, bal double, ts timestamp"
    )
    # empty change feed: snapshot passes through unchanged
    out = apply_cdc(snap, empty_ch, ["key"], "op", "ts", ["bal"]).collect()
    assert [(r.key, r.bal) for r in out] == [(1, 1.0)]


def test_windows_and_sessions_on_empty(empty_events):
    from stac_fastapi_duckdb_spark.streaming import events as SE

    assert SE.session_windows(empty_events).count() == 0
    assert SE.hourly_rollup(empty_events).count() == 0


def test_zorder_on_empty(empty_events, tmp_path):
    from stac_fastapi_duckdb_spark.sources.layout import with_zorder

    z = with_zorder(
        empty_events.select("event_id", "user_id", "value"), ["user_id", "value"]
    )
    assert z.count() == 0 and "__zvalue" in z.columns


def test_round5_text_ops_on_empty(empty_docs, spark):
    from stac_fastapi_duckdb_spark.functions.urls import normalize_urls
    from stac_fastapi_duckdb_spark.pipeline import text as T

    assert T.repetition_stats(empty_docs).count() == 0
    assert T.pii_scrub(empty_docs).count() == 0
    empty_urls = empty_docs.select("doc_id", F.col("text").alias("url"))
    assert normalize_urls(empty_urls).count() == 0

    empty_emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.lit(False))
    # empty corpus: bm25 short-circuits, hybrid returns no candidates
    assert T.hybrid_search(empty_docs, empty_emb, ["join"]).count() == 0


def test_embedding_outliers_on_empty(spark):
    from stac_fastapi_duckdb_spark.pipeline.similarity import embedding_outliers

    empty_emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.lit(False))
    assert embedding_outliers(empty_emb).count() == 0


def test_stream_join_builders_on_empty_batch(empty_events):
    from stac_fastapi_duckdb_spark.streaming import joins as SJ

    v, p = SJ.split_by_type(empty_events, "view", "purchase")
    assert SJ.view_purchase_pairs(v, p).count() == 0


def test_new_curation_ops_on_empty(empty_docs, spark):
    import numpy as np

    from stac_fastapi_duckdb_spark.pipeline import dedup as D
    from stac_fastapi_duckdb_spark.pipeline.contamination import split_leakage
    from stac_fastapi_duckdb_spark.pipeline.sampling import shuffle_shards
    from stac_fastapi_duckdb_spark.pipeline.similarity import semdedup
    from stac_fastapi_duckdb_spark.pipeline.text import quality_classifier
    from stac_fastapi_duckdb_spark.pipeline.validate import dataset_fingerprint

    assert D.duplicate_spans(empty_docs).count() == 0
    assert D.anchor_window_candidates(empty_docs).count() == 0
    assert D.shingle_containment_pairs(empty_docs).count() == 0
    assert D.cluster_representatives(empty_docs).count() == 0
    assert quality_classifier(empty_docs).count() == 0
    assert split_leakage(empty_docs).count() == 0
    assert shuffle_shards(empty_docs.select("doc_id")).count() == 0

    empty_emb = spark.read.parquet(f"{SF}/embeddings.parquet").filter(F.lit(False))
    cents = np.zeros((2, 64)) + np.eye(2, 64)
    assert semdedup(empty_emb, cents).count() == 0

    # fingerprint of an empty table: one row per column, zero counts,
    # NULL hash aggregates (no rows to hash) — not a crash
    fp = {r.col_name: r for r in dataset_fingerprint(empty_docs).collect()}
    assert all(r.n_rows == 0 for r in fp.values())


def test_ids_sketch_and_sampling_additions_on_empty(empty_docs, empty_events):
    from stac_fastapi_duckdb_spark.pipeline.ids import assign_row_ids
    from stac_fastapi_duckdb_spark.pipeline.sampling import (
        sampled_quantiles,
        weighted_sample,
    )
    from stac_fastapi_duckdb_spark.pipeline.sketch import kmv_distinct

    assert assign_row_ids(
        empty_docs.select("doc_id", "n_chars"), ["n_chars", "doc_id"]
    ).count() == 0
    assert kmv_distinct(empty_docs, "lang", "text").count() == 0
    assert weighted_sample(empty_docs, "n_chars", k=5, group_col="lang").count() == 0
    assert weighted_sample(empty_docs, "n_chars", k=5).count() == 0
    assert sampled_quantiles(
        empty_events, "value", [0.5], key_col="event_id", group_col="event_type"
    ).count() == 0
    # ungrouped quantiles over zero rows: one row of NULLs, n_sample=0
    row = sampled_quantiles(
        empty_events, "value", [0.5], key_col="event_id"
    ).collect()[0]
    assert row["n_sample"] == 0 and row["q50"] is None


def test_round6_ops_on_empty(empty_docs, empty_events, spark):
    from stac_fastapi_duckdb_spark.pipeline.contamination import (
        decontaminate_spans,
    )
    from stac_fastapi_duckdb_spark.pipeline.sketch import (
        hll_distinct,
        kmv_overlap,
    )
    from stac_fastapi_duckdb_spark.pipeline.text import hash_embed, line_dedup

    assert hll_distinct(empty_events, "event_type", "user_id").count() == 0
    # both-empty overlap: one row, everything zero, jaccard 0.0
    r = kmv_overlap(
        empty_events.select("user_id"), empty_events.select("user_id"), "user_id"
    ).collect()[0]
    assert (r.n_a, r.n_b, r.n_inter, r.est_jaccard) == (0, 0, 0, 0.0)
    assert line_dedup(empty_docs).count() == 0
    assert hash_embed(empty_docs).count() == 0
    bench = spark.createDataFrame(
        [(1, "a b c d")], "bench_id long, text string"
    )
    assert decontaminate_spans(empty_docs, bench, window_tokens=3).count() == 0


def test_pq_codebooks_sample_smaller_than_ks(spark):
    """Fewer sampled rows than ks must still yield a full (m, ks, dsub)
    codebook (centroids tiled), not a broadcast ValueError."""
    import numpy as np

    from stac_fastapi_duckdb_spark.pipeline.similarity import (
        train_pq_codebooks,
    )

    emb = (
        spark.read.parquet(f"{SF}/embeddings.parquet").limit(5)
    )  # 5 rows < ks=16
    books = train_pq_codebooks(emb, dim=64, m=8, ks=16, sample_size=5)
    assert books.shape == (8, 16, 8)
    assert np.isfinite(books).all()


def test_span_dedup_on_empty(empty_docs):
    from stac_fastapi_duckdb_spark.pipeline.text import span_dedup

    assert span_dedup(empty_docs, k=4).count() == 0
