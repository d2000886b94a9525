"""Per-batch delta maintenance of the decision sidecars
(pipeline/ingest.py).

Contract under test, per family (fp_stream, incr_flagged +
standing_lines, deletion_sigs + edit_pairs):
  (a) EXACTNESS — after an append, standing ∪ delta row-equals a
      from-scratch rebuild over corpus ∪ batch;
  (b) BATCH-ONLY WORK — the delta build's executed plan reads the
      arriving batch (plus slim standing artifacts), never re-scans
      the corpus text; the one allowed corpus-text touch (the
      edit-pairs canonical fetch) is a broadcast-filtered point read;
  (c) FAIL-LOUD — preconditions (monotone ids, bucket-cap headroom)
      raise instead of silently diverging.
"""

import os

import pytest
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.pipeline import ingest as ing
from stac_fastapi_duckdb_spark.sources import sidecar as sc

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def sidecar_root(tmp_path, monkeypatch):
    root = str(tmp_path / "artifacts")
    monkeypatch.setenv("SPARK_GRAFT_SIDECAR_DIR", root)
    return root


def _write_docs(spark, tmp_path, name, rows):
    p = str(tmp_path / f"{name}.parquet")
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(p)
    return spark.read.parquet(p), p


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _scanned_dirs(df) -> set:
    """The source directories a plan actually reads (inputFiles is
    exact — plan strings elide long paths)."""
    return {
        os.path.basename(os.path.dirname(f.replace("file://", "")))
        for f in df.inputFiles()
    }


# --- fp_stream --------------------------------------------------------------


def test_fp_stream_append_equals_rebuild_and_scans_batch_only(
    spark, sidecar_root, tmp_path
):
    from stac_fastapi_duckdb_spark.pipeline.dedup import window_fp_stream

    corpus, _ = _write_docs(
        spark,
        tmp_path,
        "corpus",
        [
            (1, "one two three four five six seven eight nine ten"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota"),
        ],
    )
    batch, _ = _write_docs(
        spark,
        tmp_path,
        "batch",
        [
            (10, "one two three four five six seven eight nine ten"),
            (11, "ten nine eight seven six five four three two one"),
        ],
    )
    sc.write_sidecar(window_fp_stream(corpus, 8), "fp_stream", "t", "fp0")
    ing.append_fp_stream_batch(batch, "t", "fp1", k=8)
    got = sc.load_sidecar(spark, "fp_stream", "t", "fp1")
    want = window_fp_stream(corpus.unionByName(batch), 8)
    cols = ["doc_id", "pos", "fp"]
    assert _rows(got, cols) == _rows(want, cols)
    # (b) the delta plan reads the batch parquet only — the corpus is
    # neither scanned nor re-exploded, and the standing chain is not
    # even opened (per-document state unions trivially)
    assert _scanned_dirs(window_fp_stream(batch, 8)) == {"batch.parquet"}


# --- incr_flagged + standing_lines ------------------------------------------


def test_line_batch_append_equals_one_shot_and_scans_batch_only(
    spark, sidecar_root, tmp_path, monkeypatch
):
    # keep the returned deltas' lazy lineage inspectable: a persisted
    # DataFrame's inputFiles() sees only the InMemoryRelation
    import pyspark.sql.classic.dataframe as _cdf

    monkeypatch.setattr(
        _cdf.DataFrame, "persist", lambda self, *a, **k: self
    )
    monkeypatch.setattr(
        _cdf.DataFrame, "unpersist", lambda self, *a, **k: self
    )
    from stac_fastapi_duckdb_spark.pipeline.text import (
        incremental_flag_lines,
        keyed_lines,
    )

    corpus, _ = _write_docs(
        spark,
        tmp_path,
        "corpus",
        [(1, "a standing corpus line\nanother corpus only line")],
    )
    b1, _ = _write_docs(
        spark,
        tmp_path,
        "b1",
        [
            (10, "a standing corpus line\nfresh line from batch one"),
            (11, "fresh line from batch one\nsecond fresh in batch one"),
        ],
    )
    b2, _ = _write_docs(
        spark,
        tmp_path,
        "b2",
        [
            (
                20,
                "fresh line from batch one\nsecond fresh in batch one\n"
                "a genuinely new line in two\nshort ln",
            )
        ],
    )
    base = (
        keyed_lines(corpus)
        .filter(F.col("_e"))
        .select(F.col("_k").alias("h"))
        .distinct()
    )
    sc.write_sidecar(base, "standing_lines", "t", "fp0")
    # batch 1 lands: verdicts are the first incr_flagged write, its
    # surviving hashes advance the standing set
    f1 = incremental_flag_lines(
        keyed_lines(b1),
        spark.read.parquet(*sc.data_paths("standing_lines", "t")),
        base_distinct=True,
    ).persist()
    sc.write_sidecar(f1, "incr_flagged", "t", "fp1")
    sc.append_sidecar(
        f1.filter(F.col("_e") & F.col("_keep"))
        .select(F.col("_k").alias("h"))
        .distinct(),
        "standing_lines",
        "t",
        "fp1",
    )
    # batch 2 lands through the ingest API
    flagged2 = ing.append_line_batch(spark, b2, "t", "fp2")
    cols = ["doc_id", "pos", "line", "_e", "_k", "_keep"]
    got = sc.load_sidecar(spark, "incr_flagged", "t", "fp2")
    # (a) one-shot reference: both batches flagged together against the
    # ORIGINAL standing set — batch-by-batch with the set advanced in
    # between must reproduce it verdict-for-verdict
    want = incremental_flag_lines(
        keyed_lines(b1.unionByName(b2)), base, base_distinct=True
    )
    assert _rows(got, cols) == _rows(want, cols)
    # the standing set after both appends equals the one-shot union
    want_h = base.unionByName(
        want.filter(F.col("_e") & F.col("_keep"))
        .select(F.col("_k").alias("h"))
        .distinct()
    ).distinct()
    got_h = sc.load_sidecar(spark, "standing_lines", "t", "fp2")
    assert _rows(got_h, ["h"]) == _rows(want_h, ["h"])
    # a repeated b1 line was dropped by MEMBERSHIP (standing set), the
    # genuinely new line survives, the short line survives untouched
    by_line = {r["line"]: r["_keep"] for r in flagged2.collect()}
    assert by_line["fresh line from batch one"] is False
    assert by_line["a genuinely new line in two"] is True
    assert by_line["short ln"] is True
    # (b) the verdict build reads the batch parquet + the slim standing
    # chain (data-* sidecar dirs) — the corpus text is never scanned
    dirs = _scanned_dirs(flagged2)
    assert "b2.parquet" in dirs
    assert "corpus.parquet" not in dirs
    assert any(d.startswith("data-") for d in dirs)  # the standing set
    f1.unpersist()


# --- deletion_sigs + edit_pairs ---------------------------------------------


def _edit_fixture(spark, tmp_path):
    corpus, _ = _write_docs(
        spark,
        tmp_path,
        "corpus",
        [
            (1, "alpha beta gamma delta"),
            (2, "alpha beta gamma delta epsilon"),
            (3, "totally unrelated document text here"),
        ],
    )
    batch, _ = _write_docs(
        spark,
        tmp_path,
        "batch",
        [
            (10, "alpha beta gamma delta"),  # clone of standing doc 1
            (11, "zeta eta theta iota"),  # new-only cluster...
            (12, "zeta eta theta iota"),  # ...pairs inside the batch
            (13, "nothing shared with anyone at all"),
        ],
    )
    return corpus, batch


def test_edit_pairs_append_equals_rebuild_and_batch_only_sigs(
    spark, sidecar_root, tmp_path, monkeypatch
):
    import pyspark.sql.classic.dataframe as _cdf

    monkeypatch.setattr(
        _cdf.DataFrame, "persist", lambda self, *a, **k: self
    )
    monkeypatch.setattr(
        _cdf.DataFrame, "unpersist", lambda self, *a, **k: self
    )
    from stac_fastapi_duckdb_spark.pipeline.dedup import (
        deletion_signatures,
        edit_distance_pairs,
    )

    corpus, batch = _edit_fixture(spark, tmp_path)
    sigs0 = deletion_signatures(corpus)
    sc.write_sidecar(sigs0, "deletion_sigs", "t", "fp0")
    pairs0 = edit_distance_pairs(
        corpus, max_dist=50, pair_mode="star", signatures=sigs0
    )
    sc.write_sidecar(pairs0, "edit_pairs", "t", "fp0")
    delta = ing.append_edit_pairs_batch(
        spark, batch, corpus, "t", "fp1", max_dist=50
    )
    # (a) pairs: standing ∪ delta == star rebuild over corpus ∪ batch
    both = corpus.unionByName(batch)
    want_pairs = edit_distance_pairs(both, max_dist=50, pair_mode="star")
    got_pairs = sc.load_sidecar(spark, "edit_pairs", "t", "fp1")
    cols = ["id_a", "id_b", "dist"]
    assert _rows(got_pairs, cols) == _rows(want_pairs, cols)
    # the delta itself contains exactly the expected new links: the
    # standing canonical adopts the clone, the new-only cluster stars
    assert {(r["id_a"], r["id_b"]) for r in delta.collect()} == {
        (1, 10),
        (11, 12),
    }
    # (a) signatures: chain == from-scratch signatures of the union
    got_sigs = sc.load_sidecar(spark, "deletion_sigs", "t", "fp1")
    assert _rows(got_sigs, ["_id", "sig"]) == _rows(
        deletion_signatures(both), ["_id", "sig"]
    )
    # (b) the signature/window work runs over the BATCH alone (the
    # standing signatures come from the written chain — its data-* dirs
    # are in the read set, so they were NOT recomputed from corpus
    # text); the corpus parquet is touched only by the candidate text
    # fetch, which the plan shows broadcast-filtered to candidate ids
    dirs = _scanned_dirs(delta)
    assert "batch.parquet" in dirs
    assert any(d.startswith("data-") for d in dirs)  # standing sigs
    assert "corpus.parquet" in dirs  # the one allowed touch: text fetch
    assert "BroadcastHashJoin" in _plan(delta)
    # and the batch's signature derivation itself never opens corpus
    assert _scanned_dirs(deletion_signatures(batch)) == {"batch.parquet"}


def test_edit_pairs_append_rejects_nonmonotone_ids(
    spark, sidecar_root, tmp_path
):
    from stac_fastapi_duckdb_spark.pipeline.dedup import (
        deletion_signatures,
        edit_distance_pairs,
    )

    corpus, _ = _edit_fixture(spark, tmp_path)
    sigs0 = deletion_signatures(corpus)
    sc.write_sidecar(sigs0, "deletion_sigs", "t", "fp0")
    sc.write_sidecar(
        edit_distance_pairs(
            corpus, max_dist=50, pair_mode="star", signatures=sigs0
        ),
        "edit_pairs",
        "t",
        "fp0",
    )
    # id 0 < every standing id — the star canonicals would change;
    # the append must refuse
    bad = spark.createDataFrame(
        [(0, "alpha beta gamma delta")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="monotone ingest ids"):
        ing.append_edit_pairs_batch(spark, bad, corpus, "t", "fp1")
    # a RE-INGESTED id above its bucket's canonical is just as unsound
    # (it would duplicate that bucket's standing pairs) — also refused
    reingest = spark.createDataFrame(
        [(2, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="monotone ingest ids"):
        ing.append_edit_pairs_batch(spark, reingest, corpus, "t", "fp1")


def test_edit_pairs_append_rejects_bucket_cap_crossing(
    spark, sidecar_root, tmp_path
):
    from stac_fastapi_duckdb_spark.pipeline.dedup import (
        deletion_signatures,
        edit_distance_pairs,
    )

    corpus, batch = _edit_fixture(spark, tmp_path)
    sigs0 = deletion_signatures(corpus)
    sc.write_sidecar(sigs0, "deletion_sigs", "t", "fp0")
    sc.write_sidecar(
        edit_distance_pairs(
            corpus, max_dist=50, pair_mode="star", signatures=sigs0
        ),
        "edit_pairs",
        "t",
        "fp0",
    )
    # docs 1, 2 and clone 10 land a shared bucket at size 3 > cap 2;
    # the rebuild would DROP that bucket, which an append-only pair
    # set cannot express
    with pytest.raises(ValueError, match="max_bucket_size"):
        ing.append_edit_pairs_batch(
            spark, batch, corpus, "t", "fp1", max_bucket_size=2
        )


def test_line_batch_torn_state_fails_loud(spark, sidecar_root, tmp_path):
    """A batch land interrupted between its two family appends leaves
    incr_flagged and standing_lines at different fingerprints; the
    NEXT land must refuse instead of silently flagging against the
    torn standing set."""
    from stac_fastapi_duckdb_spark.pipeline.text import keyed_lines

    corpus, _ = _write_docs(
        spark, tmp_path, "corpus",
        [(1, "a standing corpus line\nanother corpus only line")],
    )
    b, _ = _write_docs(
        spark, tmp_path, "b", [(10, "some fresh batch line here")]
    )
    base = (
        keyed_lines(corpus)
        .filter(F.col("_e"))
        .select(F.col("_k").alias("h"))
        .distinct()
    )
    sc.write_sidecar(base, "standing_lines", "t", "fp0")
    # simulate the crash: verdicts landed at fp1, the standing set did not
    sc.write_sidecar(spark.range(0), "incr_flagged", "t", "fp1")
    with pytest.raises(ValueError, match="different fingerprints"):
        ing.append_line_batch(spark, b, "t", "fp2")


def test_edit_pairs_over_cap_bucket_does_not_wedge_appends(
    spark, sidecar_root, tmp_path
):
    """A bucket ALREADY over max_bucket_size has no standing pairs (the
    rebuild drops over-cap buckets), so the append must emit nothing
    for it — not refuse forever. Only a crossing that would retract
    standing pairs raises."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import (
        deletion_signatures,
        edit_distance_pairs,
    )

    corpus, batch = _edit_fixture(spark, tmp_path)
    sigs0 = deletion_signatures(corpus)
    sc.write_sidecar(sigs0, "deletion_sigs", "t", "fp0")
    # standing pair set built at cap=1: every shared bucket is over cap
    # already, so NO standing pairs exist anywhere
    pairs0 = edit_distance_pairs(
        corpus, max_dist=50, pair_mode="star",
        max_bucket_size=1, signatures=sigs0,
    )
    sc.write_sidecar(pairs0, "edit_pairs", "t", "fp0")
    delta = ing.append_edit_pairs_batch(
        spark, batch, corpus, "t", "fp1", max_dist=50, max_bucket_size=1
    )
    # equivalence at the SAME cap: rebuild over corpus ∪ batch at cap=1
    # drops every multi-member bucket — empty pair set, and so is ours
    both = corpus.unionByName(batch)
    want = edit_distance_pairs(
        both, max_dist=50, pair_mode="star", max_bucket_size=1
    )
    got = sc.load_sidecar(spark, "edit_pairs", "t", "fp1")
    cols = ["id_a", "id_b", "dist"]
    assert _rows(got, cols) == _rows(want, cols) == []
    assert delta.count() == 0
    delta.unpersist()


def test_edit_pairs_append_maintains_max_id_metadata(
    spark, sidecar_root, tmp_path
):
    """Each land advances the sig sidecar's running max-id scalar so
    the next land's monotonicity guard is a metadata read, not a
    standing-chain aggregation."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import (
        deletion_signatures,
        edit_distance_pairs,
    )

    corpus, batch = _edit_fixture(spark, tmp_path)
    sigs0 = deletion_signatures(corpus)
    sc.write_sidecar(sigs0, "deletion_sigs", "t", "fp0")  # no extra:
    # first land exercises the chain-aggregation fallback
    sc.write_sidecar(
        edit_distance_pairs(
            corpus, max_dist=50, pair_mode="star", signatures=sigs0
        ),
        "edit_pairs", "t", "fp0",
    )
    delta = ing.append_edit_pairs_batch(
        spark, batch, corpus, "t", "fp1", max_dist=50
    )
    delta.unpersist()
    meta = sc._read_meta("deletion_sigs", "t", None)
    assert meta["extra"]["max_id"] == 13  # the batch's maximum doc id


def test_edit_pairs_two_successive_batches(spark, sidecar_root, tmp_path):
    """Two successive lands: the second uses the max-id metadata fast
    path and the chain still equals the from-scratch rebuild over all
    three corpus states."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import (
        deletion_signatures,
        edit_distance_pairs,
    )

    corpus, batch = _edit_fixture(spark, tmp_path)
    b2, _ = _write_docs(
        spark,
        tmp_path,
        "batch2",
        [
            (20, "zeta eta theta iota"),  # joins the batch-1 cluster
            (21, "alpha beta gamma delta epsilon"),  # clone of doc 2
            (22, "entirely novel text again here"),
        ],
    )
    sigs0 = deletion_signatures(corpus)
    sc.write_sidecar(sigs0, "deletion_sigs", "t", "fp0")
    sc.write_sidecar(
        edit_distance_pairs(
            corpus, max_dist=50, pair_mode="star", signatures=sigs0
        ),
        "edit_pairs", "t", "fp0",
    )
    d1 = ing.append_edit_pairs_batch(spark, batch, corpus, "t", "fp1")
    d1.unpersist()
    all1 = corpus.unionByName(batch)
    d2 = ing.append_edit_pairs_batch(spark, b2, all1, "t", "fp2")
    d2.unpersist()
    both = all1.unionByName(b2)
    want = edit_distance_pairs(both, max_dist=50, pair_mode="star")
    got = sc.load_sidecar(spark, "edit_pairs", "t", "fp2")
    cols = ["id_a", "id_b", "dist"]
    assert _rows(got, cols) == _rows(want, cols)
    assert sc.load_sidecar(spark, "deletion_sigs", "t", "fp2").count() == (
        deletion_signatures(both).count()
    )
    assert sc._read_meta("deletion_sigs", "t", None)["extra"]["max_id"] == 22


def test_line_batch_lands_property(spark, sidecar_root):
    """PROPERTY: for randomized batch sequences over a small line
    alphabet (maximizing cross-batch collisions), sequential lands
    through append_line_batch reproduce the one-shot verdicts over the
    concatenated ingest row-for-row, and the standing set equals the
    one-shot union — the exactness contract under arbitrary batch
    boundaries."""
    import random

    from stac_fastapi_duckdb_spark.pipeline.text import (
        incremental_flag_lines,
        keyed_lines,
    )

    lines_pool = [
        "first long boilerplate line here",
        "second long boilerplate line here",
        "third distinct content line okay",
        "fourth distinct content line okay",
        "short",  # ineligible — always kept
    ]
    for seed in range(3):
        rng = random.Random(seed)
        root_tag = f"prop{seed}"
        corpus_rows = [(1, "a standing corpus line for the property\n"
                        + rng.choice(lines_pool))]
        corpus = spark.createDataFrame(
            corpus_rows, "doc_id long, text string"
        )
        base = (
            keyed_lines(corpus)
            .filter(F.col("_e"))
            .select(F.col("_k").alias("h"))
            .distinct()
        )
        sc.write_sidecar(base, "standing_lines", root_tag, "fp0")
        next_id = 10
        batches = []
        for _ in range(rng.randint(2, 3)):
            docs = []
            for _ in range(rng.randint(1, 3)):
                text = "\n".join(
                    rng.choice(lines_pool)
                    for _ in range(rng.randint(1, 4))
                )
                docs.append((next_id, text))
                next_id += 1
            batches.append(
                spark.createDataFrame(docs, "doc_id long, text string")
            )
        # first batch initializes the verdict family; later ones land
        # through the ingest API
        f1 = incremental_flag_lines(
            keyed_lines(batches[0]), base, base_distinct=True
        ).persist()
        sc.write_sidecar(f1, "incr_flagged", root_tag, "fp1")
        sc.append_sidecar(
            f1.filter(F.col("_e") & F.col("_keep"))
            .select(F.col("_k").alias("h"))
            .distinct(),
            "standing_lines", root_tag, "fp1",
        )
        for i, b in enumerate(batches[1:], start=2):
            out = ing.append_line_batch(
                spark, b, root_tag, f"fp{i}",
                flagged_family="incr_flagged",
                standing_family="standing_lines",
            )
            out.unpersist()
        allb = batches[0]
        for b in batches[1:]:
            allb = allb.unionByName(b)
        want = incremental_flag_lines(
            keyed_lines(allb), base, base_distinct=True
        )
        cols = ["doc_id", "pos", "line", "_e", "_k", "_keep"]
        got = sc.load_sidecar(
            spark, "incr_flagged", root_tag, f"fp{len(batches)}"
        )
        assert _rows(got, cols) == _rows(want, cols), f"seed {seed}"
        f1.unpersist()


# --- novelty_counts + shingle_keys ------------------------------------------


def test_novelty_batch_append_equals_rebuild_and_scans_batch_only(
    spark, sidecar_root, tmp_path, monkeypatch
):
    import pyspark.sql.classic.dataframe as _cdf

    monkeypatch.setattr(
        _cdf.DataFrame, "persist", lambda self, *a, **k: self
    )
    monkeypatch.setattr(
        _cdf.DataFrame, "unpersist", lambda self, *a, **k: self
    )
    from stac_fastapi_duckdb_spark.pipeline.dedup import shingles_col
    from stac_fastapi_duckdb_spark.pipeline.text import novelty_counts

    corpus, _ = _write_docs(
        spark,
        tmp_path,
        "corpus",
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox sleeps all day long today"),
        ],
    )
    batch, _ = _write_docs(
        spark,
        tmp_path,
        "batch",
        [
            (10, "the quick brown fox jumps over the fence now"),
            (11, "entirely novel shingle content lives right here"),
            (12, "entirely novel shingle content lives right here"),
        ],
    )
    # group cold build: counts + standing key set off one derivation
    firsts = (
        corpus.select(
            "doc_id",
            F.explode(shingles_col(F.col("text"), 3)).alias("_g"),
        )
        .select("doc_id", F.xxhash64("_g").alias("_k"))
        .groupBy("_k")
        .agg(F.min("doc_id").alias("_first"))
    )
    sc.write_sidecar(
        firsts.groupBy(F.col("_first").alias("doc_id")).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_novel")
        ),
        "novelty_counts", "t", "fp0",
    )
    sc.write_sidecar(
        firsts.select(F.col("_k").alias("k")),
        "shingle_keys", "t", "fp0", extra={"max_id": 2},
    )
    delta = ing.append_novelty_batch(spark, batch, "t", "fp1")
    got = sc.load_sidecar(spark, "novelty_counts", "t", "fp1")
    want = novelty_counts(corpus.unionByName(batch))
    cols = ["doc_id", "n_novel"]
    assert _rows(got, cols) == _rows(want, cols)
    # doc 12 clones doc 11 → no novelty row for 12 in either path
    assert 12 not in {r["doc_id"] for r in got.collect()}
    # the standing key set equals the union's distinct keys
    both_keys = (
        corpus.unionByName(batch)
        .select(F.explode(shingles_col(F.col("text"), 3)).alias("_g"))
        .select(F.xxhash64("_g").alias("k"))
        .distinct()
    )
    got_keys = sc.load_sidecar(spark, "shingle_keys", "t", "fp1")
    assert _rows(got_keys, ["k"]) == _rows(both_keys, ["k"])
    assert sc._read_meta("shingle_keys", "t", None)["extra"]["max_id"] == 12
    # (b) the delta reads the batch + the slim standing key chain —
    # never the corpus text
    dirs = _scanned_dirs(delta)
    assert "batch.parquet" in dirs
    assert "corpus.parquet" not in dirs
    assert any(d.startswith("data-") for d in dirs)
    # (c) monotonicity guard
    with pytest.raises(ValueError, match="monotone ingest ids"):
        ing.append_novelty_batch(
            spark,
            spark.createDataFrame(
                [(5, "whatever text")], "doc_id long, text string"
            ),
            "t",
            "fp2",
        )


def test_novelty_group_cold_build_matches_library(spark, sidecar_root):
    """The group ingest pass writes exactly novelty_counts' rows, and
    the artifact accessor serves them with the key sidecar in place."""
    from stac_fastapi_duckdb_spark.plans import entry_queries as eq
    from stac_fastapi_duckdb_spark.pipeline.text import novelty_counts

    eq._ARTIFACT_CACHE.pop(spark, None)
    got = eq._novelty_counts_artifact(spark, SF)
    want = novelty_counts(
        spark.read.parquet(f"{SF}/documents.parquet")
    )
    cols = ["doc_id", "n_novel"]
    assert _rows(got, cols) == _rows(want, cols)
    tag = sc.dataset_tag(SF)
    fp = sc.source_fingerprint(f"{SF}/documents.parquet")
    assert sc.load_meta("shingle_keys", tag, fp)["max_id"] is not None
    eq._ARTIFACT_CACHE.pop(spark, None)
