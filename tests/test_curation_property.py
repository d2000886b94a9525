"""Property-based tests for the curation operators added this round:
duplicate_spans against a pure-Python reference (window fingerprints,
cross-doc duplication, maximal-span merging), shingle containment
bounds/symmetry, and shuffle_shards permutation invariants.
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stac_fastapi_duckdb_spark.pipeline.dedup import (
    duplicate_spans,
    shingle_containment_pairs,
)
from stac_fastapi_duckdb_spark.pipeline.sampling import shuffle_shards

# tiny alphabet → shared windows arise naturally between random docs
token = st.sampled_from(["a", "b", "c", "d"])
doc = st.lists(token, min_size=1, max_size=24)

K = 4  # window size under test (shorter than the contract's 8 so
# random docs collide often enough to exercise the merge logic)


def _ref_spans(docs: list[list[str]], k: int):
    """Pure-Python duplicate_spans: same fingerprints, same ≥2-distinct-
    docs rule, same overlap/adjacency merge."""
    wins = defaultdict(set)  # fp -> {doc}
    per_doc = defaultdict(list)  # doc -> [pos]
    for i, toks in enumerate(docs):
        for p in range(len(toks) - k + 1):
            fp = hashlib.md5(" ".join(toks[p : p + k]).encode()).hexdigest()[:16]
            wins[fp].add(i)
            per_doc[i].append((p, fp))
    out = set()
    for i, pairs in per_doc.items():
        dup_pos = sorted(p for p, fp in pairs if len(wins[fp]) >= 2)
        if not dup_pos:
            continue
        start = prev = dup_pos[0]
        n_win = 1
        for p in dup_pos[1:]:
            if p - prev > k:
                out.add((i, start, prev + k - start, n_win))
                start, n_win = p, 0
            prev = p
            n_win += 1
        out.add((i, start, prev + k - start, n_win))
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc, min_size=2, max_size=10))
def test_duplicate_spans_matches_python_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.span_start, r.span_len, r.n_windows)
        for r in duplicate_spans(df, window_tokens=K).collect()
    }
    assert got == _ref_spans(docs, K)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc, min_size=2, max_size=8))
def test_containment_bounds_and_dominates_jaccard(spark, docs):
    from stac_fastapi_duckdb_spark.pipeline.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    cont = {
        (r.id_a, r.id_b): r.containment
        for r in shingle_containment_pairs(df, None, threshold=0.0).collect()
    }
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, None, threshold=0.0).collect()
    }
    for pair, c in cont.items():
        assert 0.0 <= c <= 1.0
        # containment >= jaccard always: |∩|/min >= |∩|/|∪|
        assert c >= jac[pair] - 1e-9


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=10_000),
        min_size=1,
        max_size=60,
        unique=True,
    ),
    shards=st.integers(min_value=1, max_value=5),
)
def test_shuffle_shards_partitions_and_positions(spark, ids, shards):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    rows = shuffle_shards(df, num_shards=shards).collect()
    assert len(rows) == len(ids)  # a permutation: no loss, no dup
    assert {r.doc_id for r in rows} == set(ids)
    by_shard = defaultdict(list)
    for r in rows:
        assert 0 <= r.shard < shards
        by_shard[r.shard].append(r.shard_pos)
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
