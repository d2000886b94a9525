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
