"""PySpark-native analytics engine with the query surface of
Healy-Hyperspatial/stac-fastapi-duckdb.

The reference (read-only snapshot at /root/reference) is a STAC API
server that compiles search parameters into DuckDB SQL over GeoParquet
files. This package re-expresses that capability surface — multi-source
parquet scan, predicate compilation (temporal NULL-interval semantics,
spatial intersection, CQL2 boolean algebra), multi-key sort, pagination,
union-all, count, row→STAC-Item serialization — as idiomatic PySpark
DataFrame plans, plus the large-scale training-data-pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) the
reference lacks.

Design rules (see SURVEY.md §4, §7):
- Predicates are built as ``pyspark.sql.Column`` expressions, never SQL
  strings (kills the injection class in reference
  ``database_logic.py:640-644``).
- Plans stay declarative so Catalyst gets pushdown/pruning for free.
- Python UDFs only where built-ins can't express semantics, and then
  always Arrow-batched (pandas_udf / mapInPandas).
"""

__version__ = "0.1.0"

from stac_fastapi_duckdb_spark.session import get_spark

__all__ = ["get_spark", "__version__"]
