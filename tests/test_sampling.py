"""pipeline/sampling.py: determinism, split stability, and packing
invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.pipeline.sampling import (
    dataset_split,
    hash_sample,
    label_balance,
    pack_sequences,
    stratified_hash_sample,
)

SF = "/root/testdata/sf0.001"


def test_hash_sample_deterministic_and_partitioning_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2, "s1").select("doc_id").collect()}
    b = {
        r.doc_id
        for r in hash_sample(docs.repartition(13), "doc_id", 0.2, "s1")
        .select("doc_id")
        .collect()
    }
    assert a == b and 0 < len(a) < docs.count()
    # different salt → a different (roughly independent) sample
    c = {r.doc_id for r in hash_sample(docs, "doc_id", 0.2, "s2").select("doc_id").collect()}
    assert c != a


def test_dataset_split_disjoint_exhaustive_and_stable_under_growth(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    full = {
        r.doc_id: r.split
        for r in dataset_split(docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    assert set(full.values()) == {"train", "val", "test"}
    assert len(full) == docs.count()  # exhaustive, one label each
    # stability: splitting HALF the corpus assigns the same labels
    half = docs.filter(F.col("doc_id") % 2 == 0)
    half_split = {
        r.doc_id: r.split
        for r in dataset_split(half, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}).collect()
    }
    assert all(full[k] == v for k, v in half_split.items())


def test_pack_sequences_budget_and_contiguity(spark):
    rows = [(1, i, 500) for i in range(10)]  # 10 docs × 500 tokens
    df = spark.createDataFrame(rows, "grp int, ord int, toks long")
    packed = pack_sequences(df, "grp", "ord", "toks", budget=2048).collect()
    by_pack = {}
    for r in packed:
        by_pack.setdefault(r.pack_id, []).append(r.ord)
    # 500*4=2000 fits, 5th overflows → packs of 4/4/2 docs… actually
    # cum_excl DIV 2048: ords 0-4 have cum 0,500,...,2000 → ids 0,0,0,0,0
    assert by_pack[0] == [0, 1, 2, 3, 4]
    for pack in by_pack.values():
        assert pack == sorted(pack)  # contiguous in order column
    # oversized doc still gets exactly one pack id
    big = spark.createDataFrame([(1, 0, 9000), (1, 1, 10)], "grp int, ord int, toks long")
    got = {r.ord: r.pack_id for r in pack_sequences(big, "grp", "ord", "toks", 2048).collect()}
    assert got[0] == 0 and got[1] == 4  # follower starts after the giant


def test_label_balance_fractions_sum_to_one(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = label_balance(docs, "lang").collect()
    assert abs(sum(r.fraction for r in rows) - 1.0) < 1e-4
    assert sum(r.n for r in rows) == docs.count()


def test_corpus_mixture_rates_and_determinism(spark):
    from stac_fastapi_duckdb_spark.pipeline.sampling import corpus_mixture

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sources = [
        ("full", docs, 1.0),
        ("half", docs, 0.5),
    ]
    mix = corpus_mixture(sources, "doc_id", salt="m1")
    counts = {r.source_name: r.cnt for r in mix.groupBy("source_name").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    n = docs.count()
    assert counts["full"] == n  # rate 1.0 keeps everything
    assert 0.3 * n < counts["half"] < 0.7 * n  # ~half, hash-determined
    again = corpus_mixture(sources, "doc_id", salt="m1")
    assert again.count() == mix.count()  # fully deterministic


def test_stratified_sample_per_stratum_rates_and_determinism(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    frac = {"en": 0.5, "de": 0.2}
    out = stratified_hash_sample(
        docs, "doc_id", "lang", frac, default_fraction=0.0, salt="s1"
    )
    by_lang = {
        r.lang: r.n
        for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    totals = {
        r.lang: r.n
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    # unlisted strata use default_fraction=0 → dropped entirely
    assert set(by_lang) <= {"en", "de"}
    for lang, f in frac.items():
        if totals.get(lang, 0) >= 20:
            assert 0.5 * f < by_lang.get(lang, 0) / totals[lang] < 1.5 * f
    # partitioning-invariant determinism
    again = stratified_hash_sample(
        docs.repartition(13), "doc_id", "lang", frac, default_fraction=0.0, salt="s1"
    )
    assert {r.doc_id for r in again.select("doc_id").collect()} == {
        r.doc_id for r in out.select("doc_id").collect()
    }


def test_stratified_sample_matches_hash_sample_per_stratum(spark):
    # within one stratum the kept set must equal plain hash_sample at
    # that stratum's rate (same hash, same salt) — composability contract
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    strat = stratified_hash_sample(
        docs, "doc_id", "lang", {"en": 0.3}, default_fraction=0.0, salt="x"
    )
    plain = hash_sample(docs.filter(F.col("lang") == "en"), "doc_id", 0.3, "x")
    assert {r.doc_id for r in strat.collect()} == {r.doc_id for r in plain.collect()}


def test_shuffle_shards_deterministic_and_dense(spark):
    from pyspark.sql import functions as F

    from stac_fastapi_duckdb_spark.pipeline.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = shuffle_shards(df, num_shards=4).collect()
    b = shuffle_shards(df.repartition(7), num_shards=4).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # partitioning-invariant
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.shard_pos)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, poss in by_shard.items():
        # positions are dense 1..n within each shard
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # a different seed is a different permutation
    c = shuffle_shards(df, num_shards=4, seed="shuf-v2").collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_shuffle_shards_is_actually_shuffled(spark):
    from stac_fastapi_duckdb_spark.pipeline.sampling import shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(500)], "doc_id long")
    rows = shuffle_shards(df, num_shards=1).collect()
    order = [r.doc_id for r in sorted(rows, key=lambda r: r.shard_pos)]
    # the permutation must not be the identity or a near-sorted order:
    # count positions where consecutive output ids are consecutive inputs
    runs = sum(1 for x, y in zip(order, order[1:]) if y == x + 1)
    assert runs < 25  # random permutation: expected ~1


# ---------------------------------------------------------------------------
# weighted_sample (Efraimidis–Spirakis race) + sampled_quantiles
# ---------------------------------------------------------------------------

def test_weighted_sample_deterministic_and_k_per_group(spark):
    from stac_fastapi_duckdb_spark.pipeline.sampling import weighted_sample

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = weighted_sample(docs, "n_chars", k=10, group_col="lang")
    b = weighted_sample(docs.repartition(11), "n_chars", k=10, group_col="lang")
    rows_a = {(r["lang"], r["doc_id"]) for r in a.collect()}
    rows_b = {(r["lang"], r["doc_id"]) for r in b.collect()}
    assert rows_a == rows_b
    per_group = {}
    for lang, _ in rows_a:
        per_group[lang] = per_group.get(lang, 0) + 1
    n_langs = docs.select("lang").distinct().count()
    assert all(v <= 10 for v in per_group.values()) and len(per_group) == n_langs


def test_weighted_sample_favors_heavy_weights(spark):
    # two weight classes 100:1 — the heavy class must dominate the
    # sample far beyond its 50% population share
    from stac_fastapi_duckdb_spark.pipeline.sampling import weighted_sample

    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, F.lit(100.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    got = weighted_sample(df, "w", k=200)
    heavy = got.filter(F.col("w") == 100.0).count()
    assert heavy > 160  # E[heavy] ≈ 198; <=160 is ~impossible


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from stac_fastapi_duckdb_spark.pipeline.sampling import weighted_sample

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 50, F.lit(-1.0)).otherwise(F.lit(1.0)).alias("w"),
    )
    got = weighted_sample(df, "w", k=100).collect()
    assert len(got) == 50 and all(r["w"] > 0 for r in got)


def test_sampled_quantiles_close_to_exact(spark):
    from stac_fastapi_duckdb_spark.pipeline.sampling import sampled_quantiles

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    got = {
        r["event_type"]: r["q50"]
        for r in sampled_quantiles(
            ev, "value", [0.5], fraction=0.2, key_col="event_id",
            group_col="event_type",
        ).collect()
    }
    exact = {
        r["event_type"]: r["q"]
        for r in ev.groupBy("event_type")
        .agg(F.percentile(F.col("value").cast("double"), 0.5).alias("q"))
        .collect()
    }
    for t, q in got.items():
        spread = abs(exact[t]) + 1e-9
        assert abs(q - exact[t]) / spread < 0.25


def test_sampled_quantiles_filter_pushes_into_scan(spark):
    # the sample predicate must reach the parquet scan as a residual
    # filter (no shuffle, no Python) — check there's exactly the one
    # groupBy exchange in the plan
    from stac_fastapi_duckdb_spark.pipeline.sampling import sampled_quantiles

    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    plan = (
        sampled_quantiles(ev, "value", [0.5], group_col="event_type")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_stratified_exact_sample_quotas_and_determinism(spark):
    from stac_fastapi_duckdb_spark.pipeline.sampling import (
        stratified_exact_sample,
    )

    rows = [(i, "big" if i < 100 else "small") for i in range(110)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_exact_sample(df, "lang", 15, "doc_id")
    per = {r[0]: r[1] for r in out.groupBy("lang").count().collect()}
    # exact quota from the large stratum, everything from the small one
    assert per == {"big": 15, "small": 10}
    # deterministic across reruns and repartitionings
    a = sorted(r.doc_id for r in out.collect())
    b = sorted(
        r.doc_id
        for r in stratified_exact_sample(
            df.repartition(7), "lang", 15, "doc_id"
        ).collect()
    )
    assert a == b
    # ranks are 1..n within each stratum
    ranks = [
        sorted(r.sample_rank for r in out.filter(F.col("lang") == s).collect())
        for s in ("big", "small")
    ]
    assert ranks[0] == list(range(1, 16)) and ranks[1] == list(range(1, 11))
    # the draw is hash-ordered, not head-of-table: some kept id >= 50
    assert any(i >= 50 for i in a if i < 100)


def test_stratified_exact_sample_window_group_limit_plan(spark):
    from stac_fastapi_duckdb_spark.pipeline.sampling import (
        stratified_exact_sample,
    )

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = (
        stratified_exact_sample(df.select("doc_id", "lang"), "lang", 5, "doc_id")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the rank filter must push into the window as a group-limit heap
    assert "WindowGroupLimit" in plan


def test_stratified_exact_sample_null_keys_not_privileged(spark):
    """NULL keys used to hash to NULL and sort first, deterministically
    stealing the top quota slots; now they hash via a sentinel and
    compete like any other key."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import (
        stratified_exact_sample,
    )

    rows = [("s", f"k{i:03d}") for i in range(50)] + [("s", None)] * 3
    df = spark.createDataFrame(rows, "stratum string, k string")
    out = stratified_exact_sample(df, "stratum", 10, "k")
    got = [r.k for r in out.collect()]
    assert len(got) == 10
    # the 3 NULL-key rows must NOT all occupy top slots; with a real
    # hash the chance all 3 land in a specific 10-of-53 draw is tiny
    assert sum(1 for k in got if k is None) < 3
    # determinism unchanged
    again = [r.k for r in stratified_exact_sample(df, "stratum", 10, "k").collect()]
    assert sorted(got, key=lambda x: (x is None, x)) == sorted(
        again, key=lambda x: (x is None, x)
    )
    # non-null-only input: ranking identical to the md5 oracle recipe
    nn = spark.createDataFrame(
        [("s", f"k{i:03d}") for i in range(20)], "stratum string, k string"
    )
    out2 = stratified_exact_sample(nn, "stratum", 5, "k")
    assert out2.count() == 5
