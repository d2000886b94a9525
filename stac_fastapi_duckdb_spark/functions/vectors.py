"""Vector math over ``array<float/double>`` columns — all JVM-side.

Built from ``F.zip_with`` / ``F.aggregate`` higher-order functions so the
hot path stays inside whole-stage codegen: no Python, no Arrow transfer.
These power the similarity-search and embedding-dedup operators
(pipeline/similarity.py, pipeline/dedup.py) — beyond-reference
capability, SURVEY §7.4.

Determinism note: ``F.aggregate`` is a sequential left fold per row, so
float sums are order-stable — safe for oracle comparison after rounding.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Dot product. With ``dim`` (the column's KNOWN fixed length) the
    sum is unrolled into ``dim`` literal terms — same sequential
    left-to-right IEEE adds as the fold (bit-identical, including the
    leading ``0.0 +``), fully inside whole-stage codegen instead of the
    interpreted HOF lambda. MEASURED CAVEAT (round 7, PERF.md): the
    unroll's per-invocation Catalyst planning + codegen compile costs
    ~1.4 s for a 64-dim cosine, which LOSES to the interpreted fold up
    to at least 200k rows/invocation — every current call site uses the
    fold (dim=None); reach for the unroll only in a reused/cached plan
    over many millions of rows per invocation."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    if dim is not None:
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            acc = acc + F.element_at(a, i).cast("double") * F.element_at(
                b, i
            ).cast("double")
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str, dim: int | None = None) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    if dim is not None:
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            x = F.element_at(a, i).cast("double")
            acc = acc + x * x
        return F.sqrt(acc)
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(
    a: Column | str, b: Column | str, dim: int | None = None
) -> Column:
    return dot(a, b, dim) / (l2_norm(a, dim) * l2_norm(b, dim))


def l2_distance(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
