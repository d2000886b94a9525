"""pipeline/contamination.py: n-gram benchmark-contamination detection
— exact-copy and partial-overlap semantics, hash/string path parity,
and the broadcast (corpus-never-shuffled) plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.pipeline.contamination import (
    contamination_overlap,
)

SF = "/root/testdata/sf0.001"


def _corpus(spark):
    return spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),  # exact bench copy
            (2, "alpha beta gamma delta nothing else here at all"),  # partial
            (3, "totally unrelated words with zero shared grams"),
            (4, "alpha beta gamma delta epsilon zeta plus a suffix tail"),
        ],
        "doc_id long, text string",
    )


def _bench(spark):
    return spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "bench_id long, text string",
    )


def test_exact_copy_scores_one(spark):
    got = {
        (r.doc_id, r.bench_id): r.ratio
        for r in contamination_overlap(
            _corpus(spark), _bench(spark), min_ratio=0.0
        ).collect()
    }
    assert got[(1, 100)] == 1.0  # identical text: every shingle matches
    assert got[(4, 100)] == 1.0  # superset doc still contains all shingles
    # bench has 4 distinct 3-grams; doc 2 shares exactly 2 of them
    assert got[(2, 100)] == 0.5
    assert (3, 100) not in got  # no shared shingles → no pair emitted


def test_threshold_filters_low_overlap(spark):
    got = contamination_overlap(
        _corpus(spark), _bench(spark), min_ratio=0.9
    ).collect()
    assert {r.doc_id for r in got} == {1, 4}


def test_hash_and_string_paths_agree(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 31 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    kw = dict(bench_id_col="bench_id", min_ratio=0.5)
    a = sorted(
        map(tuple, contamination_overlap(docs, bench, hash_shingles=True, **kw).collect())
    )
    b = sorted(
        map(tuple, contamination_overlap(docs, bench, hash_shingles=False, **kw).collect())
    )
    assert a == b and len(a) > 0


def test_bench_side_is_broadcast(spark):
    plan = contamination_overlap(
        _corpus(spark), _bench(spark)
    )._jdf.queryExecution().executedPlan().toString()
    # the corpus must join map-side against a broadcast benchmark —
    # a sort-merge join here would shuffle the full corpus at scale
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_split_leakage_flags_cross_split_near_dups(spark):
    from pyspark.sql import functions as F

    from stac_fastapi_duckdb_spark.pipeline.contamination import split_leakage
    from stac_fastapi_duckdb_spark.pipeline.sampling import dataset_split

    # find two ids that land in different splits under the real rule
    ids = spark.createDataFrame(
        [(i,) for i in range(40)], "doc_id long"
    )
    sp = {
        r.doc_id: r.split
        for r in dataset_split(
            ids, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}, "corpus-v1"
        ).collect()
    }
    train_id = next(i for i in sp if sp[i] == "train")
    other_id = next(i for i in sp if sp[i] != "train")
    same_id = next(i for i in sp if sp[i] == "train" and i != train_id)

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (train_id, base),
            (other_id, base + " tail"),  # near-dup ACROSS the split
            (same_id, base + " end"),    # near-dup INSIDE train: no leak
        ],
        "doc_id long, text string",
    )
    got = split_leakage(docs, threshold=0.5)
    rows = got.collect()
    flagged = {(r.id_a, r.id_b) for r in rows}
    lo, hi = sorted((train_id, other_id))
    assert (lo, hi) in flagged
    # the within-train pair must NOT be flagged
    lo2, hi2 = sorted((train_id, same_id))
    assert (lo2, hi2) not in flagged
    for r in rows:
        assert r.split_a != r.split_b


# ---------------------------------------------------------------------------
# decontaminate_spans (GPT-3-style span removal)
# ---------------------------------------------------------------------------


def _dc(spark, docs_rows, bench_rows, k=4):
    from stac_fastapi_duckdb_spark.pipeline.contamination import (
        decontaminate_spans,
    )

    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "bench_id long, text string")
    return {
        r.doc_id: r
        for r in decontaminate_spans(docs, bench, window_tokens=k).collect()
    }


def test_decontaminate_removes_benchmark_span(spark):
    out = _dc(
        spark,
        [(1, "intro words here then the secret eval answer text ends now")],
        [(100, "the secret eval answer text")],
        k=5,
    )
    assert out[1].clean_text == "intro words here then ends now"
    assert out[1].n_removed == 5 and out[1].n_tokens == 11


def test_decontaminate_merges_overlapping_hits(spark):
    # two overlapping bench 4-gram hits merge into one interval
    out = _dc(
        spark,
        [(1, "a b c d e f g h i")],
        [(100, "c d e f"), (101, "d e f g")],
        k=4,
    )
    assert out[1].clean_text == "a b h i"
    assert out[1].n_removed == 5


def test_decontaminate_untouched_docs_pass_through(spark):
    out = _dc(
        spark,
        [(1, "completely clean document text"), (2, "more clean words")],
        [(100, "benchmark only content never matching")],
        k=4,
    )
    assert out[1].n_removed == 0
    assert out[1].clean_text == "completely clean document text"
    assert out[2].n_removed == 0


def test_decontaminate_short_bench_items_ignored(spark):
    # bench item shorter than the window contributes no fingerprints
    out = _dc(
        spark,
        [(1, "a b c d e")],
        [(100, "a b")],
        k=4,
    )
    assert out[1].n_removed == 0


def test_decontaminate_whole_doc_removed(spark):
    out = _dc(
        spark,
        [(1, "exact benchmark item text"), (2, "unrelated words entirely here")],
        [(100, "exact benchmark item text")],
        k=4,
    )
    assert out[1].clean_text == "" and out[1].n_removed == 4
    assert out[2].n_removed == 0


def test_decontaminate_empty_inputs(spark):
    from stac_fastapi_duckdb_spark.pipeline.contamination import (
        decontaminate_spans,
    )

    docs = spark.createDataFrame([(1, "some doc words")], "doc_id long, text string")
    empty = spark.createDataFrame([], "bench_id long, text string")
    out = decontaminate_spans(docs, empty, window_tokens=3).collect()
    assert out[0].n_removed == 0
    no_docs = spark.createDataFrame([], "doc_id long, text string")
    bench = spark.createDataFrame([(1, "a b c")], "bench_id long, text string")
    assert decontaminate_spans(no_docs, bench, window_tokens=3).count() == 0
