from stac_fastapi_duckdb_spark.sources.catalog import CollectionCatalog

__all__ = ["CollectionCatalog"]
