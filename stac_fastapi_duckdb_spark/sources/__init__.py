from stac_fastapi_duckdb_spark.sources.catalog import CollectionCatalog
from stac_fastapi_duckdb_spark.sources.layout import (
    with_zorder,
    write_zordered,
    zorder_value,
)

__all__ = [
    "CollectionCatalog",
    "with_zorder",
    "write_zordered",
    "zorder_value",
]
