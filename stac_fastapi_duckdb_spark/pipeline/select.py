"""Diversity-driven subset selection for corpus curation.

Greedy k-center (Gonzalez farthest-point traversal, the classic
2-approximation to the k-center cover) is the standard "coreset /
diverse subset" selector in training-data curation: pick the document
or embedding that is farthest from everything already selected, k
times.  The selected set is a maximally-spread sample — the opposite
of random sampling, which oversamples dense regions.

Spark shape (scale-first):

- The inner loop is k rounds of **one map-only scan + TakeOrdered(1)**
  over the candidate pool: maintain ``mind`` = each point's squared
  distance to its nearest already-selected center as a pure Column
  expression (``LEAST`` chain over broadcast center literals — no UDF,
  no shuffle), and take the argmax with a deterministic
  ``(mind DESC, id ASC)`` tie-break.  Per round the driver receives
  exactly ONE row (the new center and its vector) — bounded like a
  probe-vector fetch, never a data collect.
- The candidate pool is cached once and unpersisted before returning;
  lineage stays k-shallow (the LEAST chain), so no checkpointing is
  needed for practical k.
- At 100 TB you do not run farthest-point over every row: compose with
  ``pipeline.sampling.hash_sample`` to draw a deterministic candidate
  pool first (k-center on a uniform sample preserves the cover radius
  up to sampling error), then run this operator over the pool.  The
  per-round cost is then pool-sized and map-only regardless of corpus
  size.

Float contract (oracle-replayable): distances are computed in DOUBLE
from the float vectors with a left fold, then ROUNDed to 6 decimals
BEFORE both the ``LEAST`` update and the argmax comparison — so the
selection sequence is identical in any engine that replays the same
rounded arithmetic (the DuckDB oracle does), immune to last-ulp
fold-order divergence.

Reference parity note: the reference engine (stac-fastapi-duckdb) has
no selection operators at all — this is part of the beyond-reference
training-data surface, like `pipeline/dedup.py` and
`pipeline/sampling.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, LongType, StructField, StructType


def _sq_dist(vec_col: F.Column, center: list[float]) -> F.Column:
    """Squared L2 distance from an array<float|double> column to a
    broadcast literal center, as a pure JVM fold (no UDF)."""
    lit = F.array(*[F.lit(float(x)) for x in center])
    return F.aggregate(
        F.zip_with(
            vec_col.cast("array<double>"), lit, lambda a, b: (a - b) * (a - b)
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sq_norm(vec_col: F.Column) -> F.Column:
    return F.aggregate(
        vec_col.cast("array<double>"),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )


# driver-greedy pool cap: same bound (and same rationale) as
# pipeline.similarity._DRIVER_POOL_MAX — ~8k rows × dim doubles is a
# few MB of driver memory, far under any realistic driver heap, and the
# module contract says a 100 TB run feeds a hash_sample'd pool anyway
_DRIVER_POOL_MAX = 8192


def _round6_repl(x: float) -> float:
    """java.math.BigDecimal.valueOf(x).setScale(6, HALF_UP)
    .doubleValue() — the exact driver-side replication of Spark's
    F.round(x, 6): valueOf goes through Double.toString (the shortest
    round-trip decimal), which Python's repr matches numerically."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(
        Decimal(repr(x)).quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
    )


def _sqd_repl(a: list, b: list) -> float:
    """Sequential left fold matching _sq_dist's F.aggregate order."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += (x - y) * (x - y)
    return acc


def _k_center_driver(
    spark: SparkSession, rows: list, id_col: str, k: int
) -> DataFrame:
    """Exact greedy k-center over a fully-fetched bounded pool: the
    identical selection sequence as the distributed loop (same rounded
    arithmetic — ``_round6_repl``/``_sqd_repl`` replicate
    ``F.round(_sq_dist(...), 6)`` bit-for-bit, min over centers is
    order-independent, argmax ties to the smallest id), with zero
    further Spark jobs.  Selected points stay in the pool with
    mind = 0 exactly as the distributed form keeps them in ``base``;
    an argmax of 0 means every remaining point coincides with a center
    — the same exhaustion stop."""
    out_schema = StructType(
        [
            StructField("sel_rank", LongType(), False),
            StructField(id_col, LongType(), False),
            StructField("mind", DoubleType(), True),
        ]
    )
    import numpy as np

    from stac_fastapi_duckdb_spark.functions.localrel import local_rows_df

    ids = [r["__id"] for r in rows]
    if not ids:
        return local_rows_df(spark, [], out_schema)
    # float32 parquet values → exact float64 (widening); elementwise
    # numpy ops are per-element IEEE and np.cumsum(...)[-1] IS the
    # sequential left fold F.aggregate performs (verified bit-exact in
    # tests), so only the final ROUND needs the Decimal replication
    V = np.asarray([[float(x) for x in r["__v"]] for r in rows], dtype=np.float64)
    norms = np.cumsum(V * V, axis=1)[:, -1]
    n6 = [_round6_repl(float(x)) for x in norms]
    # seed: argmax ROUND(squared norm, 6), smallest id on ties
    si = min(range(len(ids)), key=lambda i: (-n6[i], ids[i]))
    selected: list = [(0, ids[si], None)]
    d0 = np.cumsum((V - V[si]) ** 2, axis=1)[:, -1]
    mind = [_round6_repl(float(x)) for x in d0]
    while len(selected) < k:
        ai = min(range(len(ids)), key=lambda i: (-mind[i], ids[i]))
        if mind[ai] <= 0.0:
            break  # pool exhausted: every remaining point coincides
        selected.append((len(selected), ids[ai], float(mind[ai])))
        d = np.cumsum((V - V[ai]) ** 2, axis=1)[:, -1]
        for i, x in enumerate(d):
            # min over centers is order-independent; rounding first
            # matches the distributed LEAST(ROUND(d),…) exactly
            r = _round6_repl(float(x))
            if r < mind[i]:
                mind[i] = r
    return local_rows_df(spark, selected, out_schema)


def k_center_select(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Greedy k-center (farthest-point) selection over an embedding
    table.  Returns exactly ``k`` rows ``(sel_rank, <id_col>, mind)``:

    - ``sel_rank`` — selection order, 0-based;
    - ``mind`` — the point's squared distance to the nearest
      previously-selected center AT THE MOMENT it was chosen (the
      running cover radius; non-increasing in ``sel_rank``).  NULL for
      the seed.

    Seed = argmax of ROUND(squared norm, 6), ties to the smallest id
    (deterministic, engine-replayable).  Empty input → 0 rows; k larger
    than the pool → every point once.

    BATCHED GREEDY (round 7, deepened round 8): a naive loop pays one
    Catalyst plan + TakeOrdered job per selection — a fixed per-round
    constant that multiplies by k. Instead each distributed round
    fetches the top ``max(j+1, 64)`` rows by current cover distance
    (j = selections still needed; a bounded ~64·dim-double driver
    fetch) and CHAIN-VERIFIES follow-up selections driver-side: after
    accepting the round's argmax c, the next shortlist candidate x (by
    updated mind, id-tiebreak) is provably the global argmax iff its
    updated ``mind(x) >`` the LAST fetched row's pre-round mind —
    every point outside the shortlist had mind ≤ that bound and minds
    only decrease (the deep fetch exists to push that bound LOW enough
    that a whole k-selection usually verifies inside one round). Ties
    or bound violations fall back to a fresh distributed round, so the
    selected sequence is IDENTICAL to the one-job-per-round loop (the
    DuckDB oracle replays it round by round); typically the whole
    k-selection takes 2 jobs (seed + one round) instead of k. Driver-side mind updates replicate
    Spark's ``F.round(x, 6)`` exactly (BigDecimal HALF_UP on the
    shortest decimal repr — what java.math.BigDecimal.valueOf does).
    """
    import math

    if k < 1:
        raise ValueError("k must be >= 1")
    spark: SparkSession = df.sparkSession
    base = df.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    pool_probe = base.limit(_DRIVER_POOL_MAX + 1).collect()
    if len(pool_probe) <= _DRIVER_POOL_MAX:
        # BOUNDED-POOL fast path (same contract as mmr_rerank's driver
        # greedy): the candidate pool fits the driver cap — at scale
        # the pool is a hash_sample coreset by the module contract, so
        # this is the common serving shape. ONE Spark job (the bounded
        # CollectLimit fetch) + an exact driver greedy that replicates
        # the distributed arithmetic bit-for-bit (_round6/_sqd are the
        # same replications the chain-verify path already proves); the
        # distributed loop below remains the >cap fallback and the
        # equivalence is pinned by tests/test_select.py.
        return _k_center_driver(spark, pool_probe, id_col, k)
    # don't re-cache a projection of an already-cached input: the
    # per-invocation cache build would dominate the whole selection
    own_cache = not df.is_cached
    if own_cache:
        base = base.persist()
    out_schema = StructType(
        [
            StructField("sel_rank", LongType(), False),
            StructField(id_col, LongType(), False),
            StructField("mind", DoubleType(), True),
        ]
    )

    _round6 = _round6_repl
    _sqd = _sqd_repl

    try:
        seed = (
            base.select("__id", "__v", F.round(_sq_norm(F.col("__v")), 6).alias("__n"))
            .orderBy(F.col("__n").desc(), F.col("__id").asc())
            .first()
        )
        if seed is None:
            return spark.createDataFrame([], out_schema)
        selected = [(0, seed["__id"], None)]
        centers = [[float(x) for x in seed["__v"]]]
        exhausted = False
        # shortlist OVERFETCH (round 8): the verification bound is the
        # LAST fetched row's pre-round mind, so a deeper fetch lowers
        # the bound and lets the driver chain accept more follow-up
        # selections before a fresh distributed round is needed — on a
        # dense pool (near-uniform cover distances) a shallow fetch's
        # bound sits right at the next pick's updated mind, forcing
        # ~one round per pick. 1024 rows × dim doubles is a ~0.5 MB
        # bounded driver fetch at any pool size; selection stays EXACT
        # (the bound argument is unchanged — measured sweep at sf0.1:
        # depth 64 → 3 rounds, 256 → 2, 1024 → 1, identical picks).
        overfetch = max(k + 1, 1024)
        while len(selected) < k and not exhausted:
            j = k - len(selected)
            # ONE distributed round: deep top-m by the full current mind
            mind: F.Column | None = None
            for c in centers:
                d_new = F.round(_sq_dist(F.col("__v"), c), 6)
                mind = d_new if mind is None else F.least(mind, d_new)
            want = max(j + 1, overfetch)
            top = (
                base.select("__id", "__v", mind.alias("__m"))
                .orderBy(F.col("__m").desc(), F.col("__id").asc())
                .limit(want)
                .collect()
            )
            if not top or top[0]["__m"] is None or top[0]["__m"] <= 0.0:
                break  # pool exhausted: every remaining point coincides
            # bound: every row OUTSIDE the fetched shortlist has
            # pre-round mind <= this (and minds only decrease)
            bound = top[-1]["__m"] if len(top) == want else -math.inf
            shortlist = [
                (r["__id"], [float(x) for x in r["__v"]], r["__m"])
                for r in top
            ]
            # LAZY chain argmax: minds only DECREASE as centers are
            # added, so a max-heap with deferred updates is exact —
            # pop the stored max; if its mind is stale (misses centers
            # added after its last fold), fold ONLY those and re-push;
            # a pop that is up-to-date is the true argmax (everything
            # below it in the heap is an upper bound on its own mind).
            # min() over centers is order-independent, so lazy folding
            # yields bit-identical minds to the eager whole-shortlist
            # fold. Touches O(accepted + staled) candidates instead of
            # O(k · shortlist).
            import heapq

            n_base = len(centers)  # centers already folded into __m
            heap = [(-cm, cid, cvec, n_base) for cid, cvec, cm in shortlist]
            heapq.heapify(heap)
            first_in_round = True
            while heap and len(selected) < k:
                negm, cid, cvec, upto = heapq.heappop(heap)
                cm = -negm
                if upto < len(centers):
                    for c in centers[upto:]:
                        d = _round6(_sqd(cvec, c))
                        if d < cm:
                            cm = d
                    heapq.heappush(heap, (-cm, cid, cvec, len(centers)))
                    continue
                if not first_in_round and not (cm > bound):
                    # an unfetched row might tie or beat it — re-derive
                    # distributedly (selection stays exact)
                    break
                if cm <= 0.0:
                    # only reachable when no rows exist outside the
                    # shortlist (bound = -inf): the global argmax
                    # coincides with a center — pool exhausted, same
                    # stop as the per-round loop. (first_in_round with
                    # cm <= 0 is pre-checked on top[0].)
                    exhausted = True
                    break
                first_in_round = False
                selected.append((len(selected), cid, float(cm)))
                centers.append(cvec)
        from stac_fastapi_duckdb_spark.functions.localrel import (
            local_rows_df,
        )

        return local_rows_df(spark, selected, out_schema)
    finally:
        if own_cache:
            base.unpersist()
