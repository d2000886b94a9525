"""Weighted PageRank (pipeline/graph.py): closed-form and NumPy
power-iteration agreement, mass conservation, dangling handling,
transition-edge extraction."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.pipeline.graph import pagerank, transition_edges


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src string, dst string, w double")


def _numpy_pagerank(edge_rows, iters=5, d=0.85):
    nodes = sorted({r[0] for r in edge_rows} | {r[1] for r in edge_rows})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outw = np.zeros(n)
    for s, _, w in edge_rows:
        outw[idx[s]] += w
    pr = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t, w in edge_rows:
            contrib[idx[t]] += pr[idx[s]] * w / outw[idx[s]]
        dang = pr[outw == 0].sum()
        pr = (1 - d) / n + d * (contrib + dang / n)
    return {nodes[i]: pr[i] for i in range(n)}


def test_matches_numpy_power_iteration(spark):
    rows = [
        ("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
        ("c", "a", 1.0), ("b", "d", 3.0),  # d is dangling
    ]
    got = {r.node: r.pr for r in pagerank(_edges(spark, rows), iters=5).collect()}
    want = _numpy_pagerank(rows, iters=5)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_mass_conserved_and_positive(spark):
    rng = np.random.default_rng(3)
    nodes = [f"n{i}" for i in range(12)]
    rows = [
        (nodes[i], nodes[j], float(rng.integers(1, 5)))
        for i in range(12)
        for j in rng.choice(12, size=3, replace=False)
        if i != j
    ]
    out = pagerank(_edges(spark, rows), iters=4).collect()
    total = sum(r.pr for r in out)
    assert total == pytest.approx(1.0, abs=1e-4)
    assert all(r.pr > 0 for r in out)


def test_two_node_closed_form(spark):
    # a→b only: pr(a) collects no inbound mass except the dangling
    # redistribution from b; verify against the exact recurrence.
    rows = [("a", "b", 1.0)]
    got = {r.node: r.pr for r in pagerank(_edges(spark, rows), iters=5).collect()}
    pa = pb = 0.5
    for _ in range(5):
        pa, pb = 0.075 + 0.85 * (pb / 2), 0.075 + 0.85 * (pa + pb / 2)
    assert got["a"] == pytest.approx(pa, abs=1e-6)
    assert got["b"] == pytest.approx(pb, abs=1e-6)


def test_transition_edges_orders_by_ts_then_id(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10, "view"),
            (2, "2024-01-01 00:00:01", 10, "cart"),
            (3, "2024-01-01 00:00:01", 10, "buy"),  # ts tie → id order
            (4, "2024-01-01 00:00:00", 20, "view"),
        ],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r.src, r.dst): r.w
        for r in transition_edges(ev).collect()
    }
    # user 10: view→cart (ts), cart→buy (id tiebreak); user 20: none
    assert got == {("view", "cart"): 1.0, ("cart", "buy"): 1.0}


def test_empty_edges(spark):
    assert pagerank(_edges(spark, []), iters=3).count() == 0


def test_driver_fixpoint_matches_distributed_loop(spark, monkeypatch):
    """The bounded-pool driver path (default at vocab-bounded edge
    counts) and the distributed join+agg loop must agree EXACTLY on the
    rounded output — the same equivalence contract as k-center's driver
    greedy."""
    from stac_fastapi_duckdb_spark.pipeline import graph as G

    rows = [
        ("a", "b", 2.0), ("a", "c", 1.0), ("b", "c", 1.0),
        ("c", "a", 1.0), ("b", "d", 3.0), ("e", "a", 4.0),
        ("d", "d", 1.0),  # self-loop: contributes to its own rank
    ]
    fast = {r.node: r.pr for r in pagerank(_edges(spark, rows), iters=5).collect()}
    monkeypatch.setattr(G, "_DRIVER_GRAPH_MAX", 0)
    slow = {r.node: r.pr for r in pagerank(_edges(spark, rows), iters=5).collect()}
    assert fast == slow


def test_driver_path_plans_local_relation(spark):
    # the served result is a LocalRelation: no joins, no Python eval,
    # no iterative jobs left in the query-time plan
    rows = [("a", "b", 1.0), ("b", "a", 2.0)]
    plan = (
        pagerank(_edges(spark, rows), iters=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LocalTableScan" in plan
    for bad in ("Join", "Exchange", "BatchEvalPython", "ArrowEvalPython"):
        assert bad not in plan


def test_transition_edges_plan_is_window_plus_partial_agg(spark):
    # the data-heavy half at scale: ONE window shuffle on user_id, then
    # a partially-aggregated edge reduction — no Python, no join
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = (
        transition_edges(ev)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" in plan and "HashAggregate" in plan
    for bad in ("BatchEvalPython", "ArrowEvalPython", "CartesianProduct",
                "SortMergeJoin"):
        assert bad not in plan
