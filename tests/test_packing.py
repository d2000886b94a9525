"""Sequence-packing operator tests (pipeline/packing.py)."""

import pytest
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.pipeline.packing import (
    pack_chunks,
    pack_greedy,
)


@pytest.fixture(scope="module")
def docs(spark):
    # token counts chosen to exercise fits / overflow / oversize /
    # empty within both packers at ctx_len=8
    counts = [5, 10, 3, 0, 25, 7, 9, 2, 11, 6]
    return spark.createDataFrame(
        [(i, " ".join(["tok"] * n)) for i, n in enumerate(counts)],
        "doc_id long, text string",
    )


def test_pack_chunks_offsets_are_contiguous_per_shard(spark, docs):
    rows = pack_chunks(docs, ctx_len=8, n_shards=2).orderBy(
        "shard", "doc_id"
    ).collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(rows) == 10
    for shard_rows in by_shard.values():
        expect = 0
        for r in shard_rows:
            assert r.tok_offset == expect  # exclusive running sum
            expect += r.n_toks
            if r.n_toks == 0:
                assert r.n_chunks == 0
            else:
                assert r.chunk_first == r.tok_offset // 8
                assert r.chunk_last == (r.tok_offset + r.n_toks - 1) // 8
                assert r.n_chunks == r.chunk_last - r.chunk_first + 1


def test_pack_greedy_invariants(spark, docs):
    ctx = 8
    rows = pack_greedy(docs, ctx_len=ctx, n_shards=2).orderBy(
        "shard", "doc_id"
    ).collect()
    assert len(rows) == 10
    by_bin = {}
    for r in rows:
        assert r.oversize == (r.n_toks > ctx)
        by_bin.setdefault((r.shard, r.bin), []).append(r)
    for members in by_bin.values():
        if any(m.oversize for m in members):
            # an oversize doc owns its bin
            assert len(members) == 1
        else:
            # no bin overflows; offsets are the running fill
            total = sum(m.n_toks for m in members)
            assert total <= ctx
            fill = 0
            for m in sorted(members, key=lambda m: m.doc_id):
                assert m.bin_offset == fill
                fill += m.n_toks
    # bins are consecutively numbered from 0 per shard
    for shard in {r.shard for r in rows}:
        bins = sorted({r.bin for r in rows if r.shard == shard})
        assert bins == list(range(len(bins)))


def test_pack_greedy_doc_would_fit_later_but_never_backtracks(spark):
    # first-fit in id order: doc 2 (n=6) could join doc 0's bin (2+6=8)
    # but doc 1 already closed it — contiguity is the contract
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b c d e f g"), (2, "a b c d e f")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in pack_greedy(docs, ctx_len=8, n_shards=1).collect()
    }
    assert rows[0].bin == 0 and rows[1].bin == 1 and rows[2].bin == 2


def test_mixture_sample_quotas_and_determinism(spark):
    from stac_fastapi_duckdb_spark.pipeline.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b") for i in range(100)],
        "doc_id long, source string",
    ).union(
        spark.createDataFrame([(100, "c")], "doc_id long, source string")
    )
    out = mixture_sample(df, {"a": 3.0, "b": 1.0}, budget=40)
    got = out.groupBy("source").count().collect()
    counts = {r.source: r["count"] for r in got}
    # quotas: a -> floor(40*3/4)=30, b -> floor(40*1/4)=10, c absent -> 0
    assert counts == {"a": 30, "b": 10}
    # deterministic under rerun and repartition
    again = mixture_sample(
        df.repartition(7), {"a": 3.0, "b": 1.0}, budget=40
    )
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_mixture_sample_small_group_contributes_what_it_has(spark):
    from stac_fastapi_duckdb_spark.pipeline.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "a") for i in range(5)] + [(i + 10, "b") for i in range(50)],
        "doc_id long, source string",
    )
    out = mixture_sample(df, {"a": 1.0, "b": 1.0}, budget=40)
    counts = {
        r.source: r["count"] for r in out.groupBy("source").count().collect()
    }
    assert counts == {"a": 5, "b": 20}


def test_mixture_sample_quotas_are_exact_floors(spark):
    """Quota = floor(budget·w/Σw) computed in exact rational
    arithmetic: non-representable weight ratios must not round a quota
    off by one (ADVICE r8 — float truncation of budget·w/Σw)."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import mixture_sample

    df = spark.createDataFrame(
        [(i, "a" if i < 500 else "b") for i in range(1000)],
        "doc_id long, source string",
    )
    # w = 0.1/0.2: float(0.1)/float(0.3) ≈ 0.33333333333333337 — naive
    # int(3000 * 0.1 / 0.30000000000000004) = 999 while the exact floor
    # of budget·w_a/(w_a+w_b) over the BINARY values of 0.1 and 0.2 is
    # 1000·... — assert against the Fraction ground truth directly
    from fractions import Fraction

    budget = 3000
    wa, wb = 0.1, 0.2
    exact_a = int(Fraction(budget) * Fraction(wa) / (Fraction(wa) + Fraction(wb)))
    out = mixture_sample(df, {"a": wa, "b": wb}, budget=budget)
    counts = {
        r.source: r["count"] for r in out.groupBy("source").count().collect()
    }
    # group a has only 500 rows; quota exact_a (≈1000) caps at 500 —
    # use a small-budget variant for the uncapped check
    assert counts["a"] == min(500, exact_a)
    budget = 7
    exact = {
        g: int(
            Fraction(budget) * Fraction(w) / (Fraction(wa) + Fraction(wb))
        )
        for g, w in {"a": wa, "b": wb}.items()
    }
    out = mixture_sample(df, {"a": wa, "b": wb}, budget=budget)
    counts = {
        r.source: r["count"] for r in out.groupBy("source").count().collect()
    }
    assert counts == {g: q for g, q in exact.items() if q > 0}
