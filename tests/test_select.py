"""Greedy k-center selection (pipeline/select.py): agreement with a
NumPy reference replay, spread/cover invariants, edge cases."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.pipeline.select import k_center_select


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _greedy_reference(vecs, k):
    """Driver-side replay of the same rounded greedy: seed = argmax
    rounded sq-norm (tie → min id), then argmax of rounded min-dist."""
    v = np.asarray(vecs, dtype=np.float64)
    norms = np.round((v * v).sum(axis=1), 6)
    seed = int(np.lexsort((np.arange(len(v)), -norms))[0])
    selected = [(0, seed, None)]
    mind = None
    for r in range(1, k):
        d = np.round(((v - v[selected[-1][1]]) ** 2).sum(axis=1), 6)
        mind = d if mind is None else np.minimum(mind, d)
        nxt = int(np.lexsort((np.arange(len(v)), -mind))[0])
        if mind[nxt] <= 0.0:
            break
        selected.append((r, nxt, float(mind[nxt])))
    return selected


def test_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(60, 8)).astype(np.float32)
    got = [
        (r.sel_rank, r.vec_id, r.mind)
        for r in k_center_select(_emb(spark, vecs), k=6).orderBy("sel_rank").collect()
    ]
    want = [(r, i, m) for r, i, m in _greedy_reference(vecs, 6)]
    assert [(g[0], g[1]) for g in got] == [(w[0], w[1]) for w in want]
    for g, w in zip(got, want):
        if w[2] is None:
            assert g[2] is None
        else:
            assert g[2] == pytest.approx(w[2], abs=1e-6)


def test_cover_radius_non_increasing_and_ids_distinct(spark):
    rng = np.random.default_rng(11)
    out = (
        k_center_select(_emb(spark, rng.normal(size=(80, 6))), k=8)
        .orderBy("sel_rank")
        .collect()
    )
    ids = [r.vec_id for r in out]
    assert len(ids) == len(set(ids)) == 8
    minds = [r.mind for r in out[1:]]
    assert all(a >= b for a, b in zip(minds, minds[1:]))


def test_k_exceeding_pool_and_duplicates_stop_early(spark):
    # 3 distinct points, one duplicated: the 4th pick would have
    # mind=0 and the loop must stop at 3 selections.
    df = _emb(spark, [[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 0.0]])
    out = k_center_select(df, k=10).collect()
    assert len(out) == 3


def test_empty_input(spark):
    df = _emb(spark, []).filter(F.lit(False))
    assert k_center_select(df, k=3).count() == 0


def test_driver_and_distributed_paths_identical(spark, monkeypatch):
    """The bounded-pool driver greedy must reproduce the distributed
    loop's selection sequence AND its rounded cover distances
    bit-for-bit (same _round6/_sqd replication the chain-verify path
    proves); forcing the cap to 0 routes the same input through the
    distributed rounds."""
    import stac_fastapi_duckdb_spark.pipeline.select as sel

    rng = np.random.default_rng(23)
    vecs = rng.normal(size=(120, 8)).astype(np.float32)
    # duplicate a few rows so exhaustion/tie handling is exercised too
    vecs = np.vstack([vecs, vecs[:5]])
    fast = [
        (r.sel_rank, r.vec_id, r.mind)
        for r in sel.k_center_select(_emb(spark, vecs), k=9)
        .orderBy("sel_rank")
        .collect()
    ]
    monkeypatch.setattr(sel, "_DRIVER_POOL_MAX", 0)
    slow = [
        (r.sel_rank, r.vec_id, r.mind)
        for r in sel.k_center_select(_emb(spark, vecs), k=9)
        .orderBy("sel_rank")
        .collect()
    ]
    assert fast == slow
