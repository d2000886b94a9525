"""HTTP API layer (S-series route surface over the search operators).

Import is lazy-friendly: the engine package never imports this — web
framework dependencies stay optional for library users.
"""

from stac_fastapi_duckdb_spark.api.app import create_app

__all__ = ["create_app"]
