from stac_fastapi_duckdb_spark.operators.datetime_filter import (
    datetime_predicate,
    parse_datetime_interval,
)
from stac_fastapi_duckdb_spark.operators.cql2 import cql2_to_column
from stac_fastapi_duckdb_spark.operators.stacql import stacql_to_column
from stac_fastapi_duckdb_spark.operators.sort import populate_sort, resolve_sort_field
from stac_fastapi_duckdb_spark.operators.spatial import (
    bbox_predicate,
    intersects_predicate,
)
from stac_fastapi_duckdb_spark.operators.search import SearchBuilder, execute_search
from stac_fastapi_duckdb_spark.operators.asof import asof_join
from stac_fastapi_duckdb_spark.operators.cdc import (
    apply_cdc,
    latest_changes,
    scd2_extend,
    scd2_from_changelog,
)
from stac_fastapi_duckdb_spark.operators.rangejoin import point_in_interval_join
from stac_fastapi_duckdb_spark.operators.queryables import queryables

__all__ = [
    "datetime_predicate",
    "parse_datetime_interval",
    "cql2_to_column",
    "stacql_to_column",
    "populate_sort",
    "resolve_sort_field",
    "bbox_predicate",
    "intersects_predicate",
    "SearchBuilder",
    "execute_search",
    "asof_join",
    "point_in_interval_join",
    "queryables",
    "apply_cdc",
    "latest_changes",
    "scd2_extend",
    "scd2_from_changelog",
]
