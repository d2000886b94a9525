"""Structured Streaming operators (beyond-reference: SURVEY.md §2.9)."""

from stac_fastapi_duckdb_spark.streaming.events import (  # noqa: F401
    hourly_rollup,
    normalize_event_ts,
    read_events_stream,
    run_to_memory,
    session_windows,
    streaming_dedup,
)
from stac_fastapi_duckdb_spark.streaming.joins import (  # noqa: F401
    enrich_with_dim,
    enriched_hourly_value,
    view_purchase_pairs,
)
from stac_fastapi_duckdb_spark.streaming.dedup_ingest import (  # noqa: F401
    admit_batch,
    run_dedup_ingest,
)
from stac_fastapi_duckdb_spark.streaming.sketches import (  # noqa: F401
    merge_cms_batch,
    merge_sketch_batch,
    streaming_cms_counts,
    streaming_hll_distinct,
)
from stac_fastapi_duckdb_spark.streaming.upsert import (  # noqa: F401
    merge_upsert_batch,
    streaming_upsert,
)
