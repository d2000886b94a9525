"""Distributed iterative graph computation: weighted PageRank.

Curation pipelines rank sources/domains by link or co-occurrence
structure (e.g. a crawl's domain graph feeds quality priors).  The
engine-level requirement is an ITERATIVE fixed point over a
distributed edge list — the one workload shape Catalyst cannot express
in a single plan, so the operator owns the loop and keeps every
iteration declarative.

Spark shape (scale-first):

- The edge list stays a DataFrame end-to-end; one iteration is
  ``edges ⋈ ranks on src → groupBy(dst) sum`` — a shuffle join plus a
  partial-aggregated shuffle.  With ranks small (this repo's
  event-type transition graph) AQE broadcasts the rank side and the
  iteration is map-side; with web-scale ranks both sides hash-shuffle
  on the node key, and pre-partitioning ``edges`` by ``src`` once lets
  every iteration reuse the same exchange.
- Dangling mass (nodes with no out-edges) is folded back uniformly via
  a 1-row aggregate broadcast-crossJoined into the update — no driver
  scalar, the plan stays lazy.
- Per-iteration ``localCheckpoint(eager=False)`` truncates lineage the
  same way `pipeline/dedup.py`'s connected-components loop does, so
  deep iteration counts do not blow up the optimizer.

The transition-graph builder (`transition_edges`) is the data-heavy
half at 100 TB: a per-user ``lead()`` window (one shuffle on user_id,
which a bucketed-by-user events layout serves shuffle-free) reduced
immediately to a (src, dst, weight) edge list bounded by the
event-type vocabulary squared.

Float contract: rank arithmetic runs in DOUBLE; magnitudes are O(1)
and the iteration count is fixed, so cross-engine divergence is
bounded at ~1e-15 — outputs are ROUNDed to 6 decimals, and the DuckDB
oracle replays the identical unrolled update.

Reference parity note: no graph surface exists in the reference
(stac-fastapi-duckdb); beyond-reference training-data operator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# driver-fixpoint edge cap: same bound (and same rationale) as
# pipeline.similarity._DRIVER_POOL_MAX — the transition graph is
# vocabulary-bounded by construction (event-type vocab², ~25 edges at
# every SF here), so 8k edges × 3 slim columns is a few hundred KB of
# driver memory; anything larger falls back to the distributed loop.
_DRIVER_GRAPH_MAX = 8192


def transition_edges(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """(src, dst, w) weighted edge list from per-user event-type
    transitions: order each user's events by (ts, id) — the id breaks
    timestamp ties deterministically — and count consecutive pairs."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
    return (
        events.select(
            F.col(type_col).alias("src"),
            F.lead(type_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).cast("double").alias("w"))
    )


def pagerank(
    edges: DataFrame,
    iters: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank over ``edges(src, dst, w)`` with a fixed
    iteration count.  Returns ``(node, pr)`` with ``pr`` rounded to 6
    decimals; ranks sum to 1 (damping leak + dangling mass are both
    folded back).

    Update (standard weighted form, dangling mass redistributed
    uniformly)::

        pr'(v) = (1-d)/N + d * ( Σ_{u→v} pr(u)·w(u,v)/out_w(u)
                                 + dangling_mass/N )
    """
    # Materialize the (small, vocabulary-bounded) edge list ONCE: every
    # iteration re-reads it, and without this the upstream extraction —
    # at 100 TB a full window over the events table — would be
    # recomputed per iteration.  localCheckpoint keeps it executor-side.
    edges = edges.localCheckpoint(eager=False)
    # BOUNDED-POOL fast path (same contract as k-center/MMR's driver
    # greedy): the edge list is aggregated to (src, dst) pairs, so it is
    # bounded by the node vocabulary squared at ANY corpus scale — when
    # it fits the driver cap, fetch it once (one CollectLimit job over
    # the already-materialized checkpoint) and run the identical
    # fixpoint in driver doubles: the 5-round distributed loop's
    # ~10 join+agg jobs (pure scheduling floor at bench scale) become
    # zero, and the result is served as a LocalRelation through the
    # same F.round(…, 6).  The distributed loop below remains the >cap
    # fallback and the equivalence oracle.
    probe = edges.limit(_DRIVER_GRAPH_MAX + 1).collect()
    if len(probe) <= _DRIVER_GRAPH_MAX:
        return _pagerank_driver(edges.sparkSession, probe, iters, damping)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outw = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    src_nodes = edges.select(F.col("src").alias("node")).distinct()
    # N is a bounded driver scalar (node-count), fetched once.
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("pr", F.lit(0.0))
    ranks = nodes.withColumn("pr", F.lit(1.0 / n))
    base = float(1.0 - damping) / n
    for _ in range(iters):
        contrib = (
            edges.join(outw, "src")
            .join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("w") / F.col("out_w")).alias("contrib"))
        )
        dangling = (
            ranks.join(src_nodes, "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("__dang"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("contrib"), F.lit(0.0))
                        + F.col("__dang") / F.lit(float(n))
                    )
                ).alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", F.round("pr", 6).alias("pr"))


def _pagerank_driver(
    spark: SparkSession,
    edge_rows: list,
    iters: int,
    damping: float,
) -> DataFrame:
    """Exact driver fixpoint over a fully-fetched bounded edge list:
    the identical update as the distributed loop in IEEE-754 double
    arithmetic (Python floats ARE Java doubles), with the result served
    as a LocalRelation through the same ``F.round(pr, 6)`` projection —
    so the two paths agree to the rounded output.  Edge rows are
    accumulated in sorted (src, dst) order so repeated runs are
    bit-deterministic; the distributed sum's partition order differs in
    the ~1e-16 tail, which the 6-decimal round absorbs (the module
    float contract)."""
    from stac_fastapi_duckdb_spark.functions.localrel import local_rows_df

    rows = sorted((r["src"], r["dst"], float(r["w"])) for r in edge_rows)
    nodes = sorted({s for s, _, _ in rows} | {t for _, t, _ in rows})
    n = len(nodes)
    schema = "node string, pr double"
    if n == 0:
        return spark.createDataFrame([], schema)
    idx = {v: i for i, v in enumerate(nodes)}
    out_w = [0.0] * n
    is_src = [False] * n
    for s, _, w in rows:
        out_w[idx[s]] += w
        is_src[idx[s]] = True
    pr = [1.0 / n] * n
    base = float(1.0 - damping) / n
    for _ in range(iters):
        contrib = [0.0] * n
        for s, t, w in rows:
            si = idx[s]
            contrib[idx[t]] += pr[si] * w / out_w[si]
        # dangling = rank mass on nodes absent from the src side (the
        # distributed loop's left_anti against src_nodes, replicated
        # literally rather than as out_w == 0 so zero-weight edges
        # cannot diverge the two paths)
        dang = 0.0
        for i in range(n):
            if not is_src[i]:
                dang += pr[i]
        pr = [
            base + damping * (contrib[i] + dang / float(n))
            for i in range(n)
        ]
    out = local_rows_df(
        spark, [(nodes[i], pr[i]) for i in range(n)], schema
    )
    return out.select("node", F.round("pr", 6).alias("pr"))
