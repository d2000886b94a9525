"""Approximate-aggregate sketches: the scale path for distincts and
quantiles when exact shuffles are too expensive. Accuracy is contracted
by relative-error bounds against exact answers (cross-engine value
oracles don't apply — sketch internals differ by implementation)."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_hll_distinct_within_rsd(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx = ev.select(
        F.approx_count_distinct("user_id", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx - exact) / exact < 0.05


def test_approx_quantiles_within_epsilon(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    qs = li.approxQuantile("l_extendedprice", [0.25, 0.5, 0.75], 0.01)
    n = li.count()
    for q, v in zip([0.25, 0.5, 0.75], qs):
        # rank of the returned value must be within eps*n of the target
        rank = li.filter(F.col("l_extendedprice") <= v).count()
        assert abs(rank - q * n) <= 0.011 * n


def test_percentile_approx_groupwise(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 10000).alias("p50"),
        F.min("value").alias("mn"),
        F.max("value").alias("mx"),
    )
    for r in out.collect():
        assert r.mn <= r.p50 <= r.mx


# ---------------------------------------------------------------------------
# KMV k-minimum-values sketch (pipeline/sketch.py) — unlike HLL its
# construction is deterministic and engine-replayable (oracle-checked in
# the registry); here: accuracy, exact-below-k, mergeability, and
# partitioning invariance
# ---------------------------------------------------------------------------

def test_kmv_estimate_within_error_bound(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import kmv_distinct

    ev = spark.read.parquet(f"{SF}/events.parquet")
    got = {
        r["event_type"]: (r["sketch_size"], r["est_distinct"])
        for r in kmv_distinct(ev, "event_type", "user_id", k=256).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for t, (sk_size, est) in got.items():
        if sk_size < 256:  # below k the sketch IS the value set
            assert est == exact[t]
        else:  # 1/sqrt(k-2) ≈ 6.3% at k=256; allow 4 sigma
            assert abs(est - exact[t]) / exact[t] < 0.25


def test_kmv_sketch_deterministic_and_partitioning_invariant(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import kmv_sketch

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = {r["lang"]: r["sk"] for r in kmv_sketch(docs, "lang", "text").collect()}
    b = {
        r["lang"]: r["sk"]
        for r in kmv_sketch(docs.repartition(17), "lang", "text").collect()
    }
    assert a == b
    for sk in a.values():
        assert sk == sorted(sk) and len(sk) == len(set(sk)) <= 64


def test_kmv_sketches_merge_to_the_union_sketch(spark):
    # sketch(A ∪ B) == k-min(merge(sketch(A), sketch(B))) — the roll-up
    # contract that lets per-shard sketches combine without raw data
    from stac_fastapi_duckdb_spark.pipeline.sketch import kmv_sketch

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    whole = {r["lang"]: r["sk"] for r in kmv_sketch(docs, "lang", "text").collect()}
    sa = {r["lang"]: r["sk"] for r in kmv_sketch(half_a, "lang", "text").collect()}
    sb = {r["lang"]: r["sk"] for r in kmv_sketch(half_b, "lang", "text").collect()}
    for lang, sk in whole.items():
        merged = sorted(set(sa.get(lang, [])) | set(sb.get(lang, [])))[:64]
        assert merged == sk


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def _cms_docs_tokens(spark):
    from pyspark.sql import functions as F

    return (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            F.explode(
                F.split(F.lower(F.trim(F.col("text"))), r"\s+")
            ).alias("token")
        )
        .filter(F.col("token") != "")
    )


def test_cms_estimate_overcounts_never_undercounts(spark):
    from pyspark.sql import functions as F

    from stac_fastapi_duckdb_spark.pipeline.sketch import (
        cms_estimate,
        cms_sketch,
    )

    toks = _cms_docs_tokens(spark)
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.orderBy(F.col("exact_n").desc(), "token").limit(30)
    sk = cms_sketch(toks, "token", depth=4, width=512)
    est = cms_estimate(sk, probes.select("token"), "token", depth=4, width=512)
    rows = probes.join(est, "token").collect()
    assert len(rows) == 30
    for r in rows:
        assert r.est_n >= r.exact_n  # CMS error is one-sided
    # heavy hitters dominate collisions: top tokens estimate tightly
    total = toks.count()
    for r in rows:
        assert r.est_n - r.exact_n <= 2 * total / 512 * 4


def test_cms_exact_when_width_dwarfs_vocabulary(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import (
        cms_estimate,
        cms_sketch,
    )

    rows = [(f"w{i % 7}",) for i in range(70)]
    df = spark.createDataFrame(rows, "token string")
    sk = cms_sketch(df, "token", depth=4, width=65536)
    est = {
        r.token: r.est_n
        for r in cms_estimate(
            sk, df.distinct(), "token", depth=4, width=65536
        ).collect()
    }
    assert est == {f"w{i}": 10 for i in range(7)}


def test_cms_merge_equals_union_sketch(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import cms_merge, cms_sketch

    a = spark.createDataFrame([(f"x{i % 5}",) for i in range(40)], "v string")
    b = spark.createDataFrame([(f"x{i % 9}",) for i in range(63)], "v string")
    merged = {
        (r.row, r.cell): r.cnt
        for r in cms_merge(cms_sketch(a, "v"), cms_sketch(b, "v")).collect()
    }
    union = {
        (r.row, r.cell): r.cnt
        for r in cms_sketch(a.unionByName(b), "v").collect()
    }
    assert merged == union


def test_cms_missing_probe_estimates_zero_or_collision(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import (
        cms_estimate,
        cms_sketch,
    )

    df = spark.createDataFrame([("present",)] * 5, "v string")
    sk = cms_sketch(df, "v", depth=4, width=1024)
    probes = spark.createDataFrame([("absent",)], "v string")
    got = cms_estimate(sk, probes, "v", depth=4, width=1024).collect()[0]
    assert got.est_n in (0, 5)  # 0 unless all 4 rows collide


# ---------------------------------------------------------------------------
# open HyperLogLog (pipeline/sketch.py hll_*) — deterministic registers,
# exact-int harmonic sum; oracle-checked in the registry. Here: accuracy
# on a known cardinality (raw branch), small-range branch, mergeability,
# and partitioning invariance
# ---------------------------------------------------------------------------


def test_hll_open_sketch_accuracy_raw_branch(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import hll_distinct

    n = 20_000  # ≫ 2.5m at p=9 → exercises the raw alpha·m²/Z branch
    big = spark.range(0, n).selectExpr("'g' AS g", "CAST(id AS STRING) AS v")
    est = hll_distinct(big, "g", "v", p=9).collect()[0]
    assert est.zero_regs == 0 or est.est_distinct > 2.5 * 512
    # 1.04/sqrt(512) ≈ 4.6 % std error; 3σ bound
    assert abs(est.est_distinct - n) / n < 0.15


def test_hll_small_range_uses_linear_counting(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import hll_distinct

    import math

    small = spark.range(0, 100).selectExpr(
        "'g' AS g", "CAST(id AS STRING) AS v"
    )
    est = hll_distinct(small, "g", "v", p=9).collect()[0]
    # deterministic: estimate must equal m·ln(m/V) exactly
    expected = round(512.0 * math.log(512.0 / est.zero_regs), 4)
    assert est.est_distinct == expected
    assert abs(est.est_distinct - 100) / 100 < 0.15


def test_hll_merge_equals_union_sketch(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import (
        hll_estimate,
        hll_merge,
        hll_sketch,
    )

    big = spark.range(0, 5_000).selectExpr(
        "'g' AS g", "CAST(id AS STRING) AS v"
    )
    a = hll_sketch(big.filter("id % 2 = 0"), "g", "v", 9)
    b = hll_sketch(big.filter("id % 3 != 0"), "g", "v", 9)  # overlapping!
    merged = hll_merge(a, b, "g")
    union = hll_sketch(
        big.filter("id % 2 = 0 OR id % 3 != 0"), "g", "v", 9
    )
    assert merged.collect()[0].regs == union.collect()[0].regs
    # and therefore identical estimates
    assert (
        hll_estimate(merged, 9).collect()[0].est_distinct
        == hll_estimate(union, 9).collect()[0].est_distinct
    )


def test_hll_partitioning_invariant(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import hll_sketch

    ev = spark.read.parquet(f"{SF}/events.parquet")
    one = hll_sketch(ev.coalesce(1), "event_type", "user_id", 9)
    many = hll_sketch(ev.repartition(32), "event_type", "user_id", 9)
    assert sorted((r.event_type, r.regs) for r in one.collect()) == sorted(
        (r.event_type, r.regs) for r in many.collect()
    )


def test_hll_empty_input(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import hll_distinct

    empty = spark.createDataFrame([], "g string, v string")
    assert hll_distinct(empty, "g", "v", 9).count() == 0


# ---------------------------------------------------------------------------
# KMV theta-sketch overlap (pipeline/sketch.py kmv_overlap)
# ---------------------------------------------------------------------------


def test_kmv_overlap_exact_below_k(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import kmv_overlap

    a = spark.range(0, 50).selectExpr("CAST(id AS STRING) AS v")
    b = spark.range(30, 80).selectExpr("CAST(id AS STRING) AS v")
    r = kmv_overlap(a, b, "v", k=256).collect()[0]
    # both sets fit the sketch → θ = full space → everything exact
    assert (r.n_a, r.n_b, r.n_inter) == (50, 50, 20)
    assert (r.est_a, r.est_b, r.est_intersection) == (50.0, 50.0, 20.0)
    assert r.est_jaccard == round(20 / 80, 6)


def test_kmv_overlap_estimates_above_k(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import kmv_overlap

    a = spark.range(0, 10_000).selectExpr("CAST(id AS STRING) AS v")
    b = spark.range(5_000, 15_000).selectExpr("CAST(id AS STRING) AS v")
    r = kmv_overlap(a, b, "v", k=512).collect()[0]
    # true: |A|=|B|=10k, |A∩B|=5k, J=1/3; k=512 → ~4.4 % std error, 4σ
    assert abs(r.est_a - 10_000) / 10_000 < 0.2
    assert abs(r.est_b - 10_000) / 10_000 < 0.2
    assert abs(r.est_intersection - 5_000) / 5_000 < 0.3
    assert abs(r.est_jaccard - 1 / 3) < 0.1


def test_kmv_overlap_disjoint_and_empty(spark):
    from stac_fastapi_duckdb_spark.pipeline.sketch import kmv_overlap

    a = spark.range(0, 40).selectExpr("CAST(id AS STRING) AS v")
    b = spark.range(1_000, 1_040).selectExpr("CAST(id AS STRING) AS v")
    r = kmv_overlap(a, b, "v", k=64).collect()[0]
    assert r.n_inter == 0 and r.est_intersection == 0.0
    empty = spark.createDataFrame([], "v string")
    r2 = kmv_overlap(a, empty, "v", k=64).collect()[0]
    assert (r2.n_b, r2.n_inter, r2.est_jaccard) == (0, 0, 0.0)
