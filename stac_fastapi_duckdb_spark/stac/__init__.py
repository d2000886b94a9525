from stac_fastapi_duckdb_spark.stac.serialize import create_stac_item, convert_value

__all__ = ["create_stac_item", "convert_value"]
