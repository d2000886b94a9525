"""Approximate-nearest-neighbor search over an embedding column.

Three tiers, all returning the same (vec_id, cos_sim) shape:

- **brute_force_topk** — exact baseline. Broadcast the probe vector,
  JVM-side fold for the dot product (functions/vectors.py), global
  top-k via orderBy+limit (TakeOrderedAndProject: per-partition heap +
  single merge — already the optimal distributed plan; no shuffle of
  the full table).
- **srp_lsh buckets** — random-hyperplane (SRP) signatures: sign-bit
  sketch of ``num_planes`` projections, computed in one vectorized
  pandas UDF (numpy matmul per Arrow batch). Probe hits only its own
  bucket (plus optional multi-probe neighbors) — the scale path where
  scanning every vector is off the table.
- **ivf_topk** — inverted-file index: coarse centroids from a driver
  k-means over a bounded sample, assignment via the same matmul UDF,
  probe searches the ``nprobe`` nearest cells only.

The plane/centroid matrices are seeded (deterministic) and broadcast
via UDF closure — kilobytes, not data.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from stac_fastapi_duckdb_spark.functions import vectors as V


def brute_force_topk(
    df: DataFrame,
    probe: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal probe vector."""
    probe_lit = F.array(*[F.lit(float(x)) for x in probe])
    return (
        df.select(
            F.col(id_col),
            F.round(
                V.cosine_similarity(F.col(vec_col), probe_lit), 6
            ).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _srp_planes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    return np.random.RandomState(seed).normal(size=(num_planes, dim)).astype(np.float64)


def _signature_udf(planes: np.ndarray):
    @F.pandas_udf(LongType())
    def _sig(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        bits = (m @ planes.T) > 0  # (batch, planes)
        weights = (1 << np.arange(bits.shape[1], dtype=np.uint64))
        return pd.Series((bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64))

    return _sig


def with_srp_signature(
    df: DataFrame,
    dim: int,
    num_planes: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    out_col: str = "srp_sig",
) -> DataFrame:
    """Attach the random-hyperplane signature bucket key."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import ensure_parallelism

    return ensure_parallelism(df).withColumn(
        out_col, _signature_udf(_srp_planes(dim, num_planes, seed))(F.col(vec_col))
    )


def srp_lsh_topk(
    df: DataFrame,
    probe: list[float],
    k: int = 10,
    num_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe_bits: int = 1,
) -> DataFrame:
    """ANN top-k scanning only the probe's SRP bucket (+ buckets within
    ``multiprobe_bits`` sign flips — multi-probe recovers recall lost to
    quantization). At scale: bucket column is a join/partition key, so
    the scan prunes to ~n/2^planes rows per probe."""
    planes = _srp_planes(len(probe), num_planes, seed)
    pv = np.asarray(probe, dtype=np.float64)
    pbits = (planes @ pv) > 0
    weights = 1 << np.arange(num_planes, dtype=np.uint64)
    psig = int((pbits.astype(np.uint64) * weights).sum())

    sigs = {psig}
    if multiprobe_bits >= 1:
        for i in range(num_planes):
            sigs.add(psig ^ (1 << i))
    if multiprobe_bits >= 2:
        for i in range(num_planes):
            for j in range(i + 1, num_planes):
                sigs.add(psig ^ (1 << i) ^ (1 << j))

    bucketed = with_srp_signature(df, len(probe), num_planes, seed, vec_col)
    candidates = bucketed.filter(F.col("srp_sig").isin([int(s) for s in sigs]))
    return brute_force_topk(candidates, probe, k, id_col, vec_col)


def train_ivf_centroids(
    df: DataFrame,
    dim: int,
    num_cells: int = 16,
    sample_size: int = 10000,
    iters: int = 10,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Coarse quantizer: k-means on a bounded driver-side sample.

    The sample is capped (``sample_size``) so this is O(sample) on the
    driver regardless of table size — the standard IVF training shape.
    The sample is the ``sample_size`` rows with smallest seeded
    ``xxhash64(id)`` — a scan-order-invariant pseudorandom draw (plain
    ``.limit`` would take the head of the scan, which on clustered or
    sorted data yields unrepresentative centroids). Spark plans the
    orderBy+limit as TakeOrdered (per-partition heap, no full sort).
    """
    rows = (
        df.select(vec_col, F.xxhash64(F.col(id_col), F.lit(seed)).alias("_h"))
        .orderBy("_h")
        .limit(sample_size)
        .toPandas()[vec_col]
    )
    x = np.stack(rows.to_numpy()).astype(np.float64)
    rng = np.random.RandomState(seed)
    cent = x[rng.choice(len(x), size=min(num_cells, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cent)):
            mask = assign == c
            if mask.any():
                cent[c] = x[mask].mean(axis=0)
    return cent


def _assign_udf(centroids: np.ndarray):
    @F.pandas_udf(LongType())
    def _assign(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        d = ((m[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        return pd.Series(d.argmin(axis=1).astype(np.int64))

    return _assign


def with_ivf_cell(
    df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding", out_col: str = "ivf_cell"
) -> DataFrame:
    """Attach the IVF cell id. Persist/partition the table by this
    column so probes prune to nprobe cells (partition pruning at scale)."""
    return df.withColumn(out_col, _assign_udf(centroids)(F.col(vec_col)))


def ivf_topk(
    df: DataFrame,
    probe: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "ivf_cell",
) -> DataFrame:
    """ANN top-k over the ``nprobe`` cells nearest to the probe. If the
    cell column is absent it is computed on the fly (tests); in
    production it is precomputed + used as the partition key."""
    pv = np.asarray(probe, dtype=np.float64)
    order = (((centroids - pv[None, :]) ** 2).sum(axis=1)).argsort()[:nprobe]
    if cell_col not in df.columns:
        df = with_ivf_cell(df, centroids, vec_col, cell_col)
    candidates = df.filter(F.col(cell_col).isin([int(c) for c in order]))
    return brute_force_topk(candidates, probe, k, id_col, vec_col)


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    num_planes: int = 12,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Cosine ≥ τ pairs: SRP-bucket self-join (near-identical vectors
    share sign bits with high probability) + exact verify in-bucket.
    → (id_a, id_b, cos_sim)."""
    from pyspark.sql.window import Window

    first = df.limit(1).select(F.size(vec_col).alias("d")).collect()
    if not first:
        return df.sparkSession.createDataFrame(
            [], "id_a long, id_b long, cos_sim double"
        )
    dim = first[0]["d"]
    # skew guard (same as the minhash/simhash bucket joins): a single
    # dense bucket — boilerplate-identical or highly correlated
    # embeddings — would otherwise go quadratic on one reducer at scale.
    # Degenerate buckets are dropped BEFORE the pair expansion.
    # repartition on the bucket key BEFORE aliasing the two join sides:
    # both sides then share one identical shuffle child, which AQE
    # reuses at runtime instead of running the signature UDF + exchange
    # twice (~25% faster at sf0.1; at scale it halves the UDF work)
    bucketed = (
        with_srp_signature(df, dim, num_planes, seed, vec_col)
        .withColumn(
            "_bucket_n", F.count(F.lit(1)).over(Window.partitionBy("srp_sig"))
        )
        .filter(F.col("_bucket_n") <= max_bucket_size)
        .drop("_bucket_n")
        .repartition("srp_sig")
    )
    a = bucketed.select(
        F.col("srp_sig"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va")
    )
    b = bucketed.select(
        F.col("srp_sig"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb")
    )
    return (
        a.join(b, "srp_sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(V.cosine_similarity("_va", "_vb"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )
