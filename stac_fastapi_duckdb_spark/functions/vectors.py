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


def dot(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


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
