"""Column-level function helpers: geometry, vector algebra, skew tools,
URL canonicalization."""

from stac_fastapi_duckdb_spark.functions.bloom import (  # noqa: F401
    bloom_filter_injected,
    enable_runtime_bloom,
    freeze_plan,
    semi_reduce,
)
from stac_fastapi_duckdb_spark.functions.skew import (  # noqa: F401
    salted_join,
    skewed_key_stats,
    two_phase_agg,
)
from stac_fastapi_duckdb_spark.functions.urls import (  # noqa: F401
    normalize_url_cols,
    normalize_urls,
)
from stac_fastapi_duckdb_spark.functions.vectors import (  # noqa: F401
    cosine_similarity,
    dot,
    l2_distance,
    l2_norm,
)
