"""End-to-end curation campaign: the full validation + dedup + split
workflow chained over real testdata, asserting cross-operator
consistency (counts conserve, representatives exist, shards partition
the survivors). This is the integration shape a user runs; the
per-operator contracts are value-oracled separately."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_curation_campaign_end_to_end(spark):
    from stac_fastapi_duckdb_spark.pipeline.contamination import split_leakage
    from stac_fastapi_duckdb_spark.pipeline.dedup import (
        cluster_representatives,
    )
    from stac_fastapi_duckdb_spark.pipeline.sampling import (
        dataset_split,
        shuffle_shards,
    )
    from stac_fastapi_duckdb_spark.pipeline.text import quality_classifier
    from stac_fastapi_duckdb_spark.pipeline.validate import (
        dataset_fingerprint,
        fingerprints_match,
        profile_table,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_docs = docs.count()

    # 1. profile + fingerprint the incoming corpus
    prof = {r.col_name: r for r in profile_table(docs).collect()}
    assert prof["doc_id"].n_rows == n_docs
    assert prof["doc_id"].n_distinct == n_docs  # ids unique
    fp_in = dataset_fingerprint(docs, ["doc_id", "text"])

    # 2. score + keep-best dedup
    scores = quality_classifier(docs)
    assert scores.count() == n_docs
    reps = cluster_representatives(docs, score_df=scores, bands=32)
    rep_rows = reps.collect()
    # every doc belongs to exactly one cluster; clusters partition ids
    assert sum(r.n_members for r in rep_rows) == n_docs
    rep_ids = {r.rep_id for r in rep_rows}
    assert len(rep_ids) == len(rep_rows)  # one representative each

    # 3. the kept corpus: representatives only
    kept = docs.join(
        reps.select(F.col("rep_id").alias("doc_id")), "doc_id"
    )
    n_kept = kept.count()
    assert n_kept == len(rep_rows) <= n_docs

    # 4. split the kept corpus and audit for cross-split leakage —
    # after keep-one dedup at threshold 0.8, no >=0.8-Jaccard pair
    # should survive ANYWHERE, so the cross-split audit must be clean
    leaks = split_leakage(kept, threshold=0.8)
    assert leaks.count() == 0

    # 5. shard the training split deterministically
    train = dataset_split(
        kept, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, "corpus-v1"
    ).filter(F.col("split") == "train")
    sharded = shuffle_shards(train.select("doc_id"), num_shards=4)
    assert sharded.count() == train.count()

    # 6. the source corpus was never mutated: fingerprint unchanged
    assert fingerprints_match(
        fp_in, dataset_fingerprint(docs, ["doc_id", "text"])
    )
