"""Driver-contract query suite: every operator from SURVEY.md §2 (plus
beyond-reference pipeline operators) expressed twice —

- as a PySpark DataFrame plan (``(spark, sf_dir) -> DataFrame``), and
- as the equivalent ANSI SQL the DuckDB oracle runs on the same tables.

The testdata tables are TPC-H-ish, not STAC-shaped, so STAC operators
are exercised by deriving the STAC column shapes (nullable datetime /
start_datetime / end_datetime, bbox arrays) from the synthetic columns
with IDENTICAL expressions on both sides; the predicate under test is
then byte-for-byte the engine's own operator implementation.

Column-name parity rule (driver compare): every computed column is
aliased identically in the Spark plan and the SQL string.

Float policy: money aggregates go through DECIMAL(18,2) so sums are
EXACT and order-independent in both engines; ratios are rounded to a
fixed scale in both.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.functions import vectors as V
from stac_fastapi_duckdb_spark.operators.cql2 import cql2_to_column
from stac_fastapi_duckdb_spark.operators.datetime_filter import datetime_predicate
from stac_fastapi_duckdb_spark.operators.stacql import stacql_to_column


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts is TIMESTAMP(NANOS) parquet — Spark reads it as long ns
    (nanosAsLong, session.py); convert to µs TimestampType here. The
    matching oracle view is ``_EVENTS_SQL`` (DuckDB CAST ns→µs also
    truncates)."""
    ev = _t(spark, sf_dir, "events")
    return ev.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))


_EVENTS_SQL = "(SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)"


# ---------------------------------------------------------------------------
# helpers shared by the STAC-semantics queries: derive nullable STAC
# temporal columns from events (every 3rd event becomes an interval row)
# ---------------------------------------------------------------------------

def _stac_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    is_interval = (F.col("event_id") % 3) == 0
    return ev.select(
        "event_id",
        F.when(~is_interval, F.col("ts")).alias("datetime"),
        F.when(is_interval, F.col("ts") - F.expr("INTERVAL 2 DAYS")).alias(
            "start_datetime"
        ),
        F.when(is_interval, F.col("ts") + F.expr("INTERVAL 2 DAYS")).alias(
            "end_datetime"
        ),
    )


_STAC_EVENTS_SQL = """
    SELECT event_id,
           CASE WHEN event_id % 3 <> 0 THEN ts END AS datetime,
           CASE WHEN event_id % 3 = 0 THEN ts - INTERVAL 2 DAY END AS start_datetime,
           CASE WHEN event_id % 3 = 0 THEN ts + INTERVAL 2 DAY END AS end_datetime
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
"""


# ---------------------------------------------------------------------------
# Reference-parity operators (SURVEY §2)
# ---------------------------------------------------------------------------

def q_point_lookup(spark, sf):  # P2: WHERE id = ? LIMIT 1 (database_logic.py:168-189)
    return (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderkey") == 100)
        .limit(1)
        .select("o_orderkey", "o_custkey", "o_orderstatus")
    )


def q_ids_in_list(spark, sf):  # P3: id IN (...) (database_logic.py:211-215,840-843)
    keys = [1, 2, 3, 5, 8, 13, 21, 34, 55, 89, 144]
    return (
        _t(spark, sf, "orders")
        .filter(F.col("o_orderkey").isin(keys))
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


def q_collection_union(spark, sf):
    """S2+U1+P4: per-source constant-column injection + UNION ALL
    (database_logic.py:831-854). Two 'collections' carved from events."""
    ev = _events(spark, sf)
    a = ev.filter(F.col("event_type") == "click").withColumn(
        "collection", F.lit("col-click")
    )
    b = ev.filter(F.col("event_type") == "purchase").withColumn(
        "collection", F.lit("col-purchase")
    )
    return a.unionByName(b).select("event_id", "collection")


def q_datetime_exact(spark, sf):  # P5 (database_logic.py:261-273)
    return _stac_events(spark, sf).filter(
        datetime_predicate("2024-01-15T00:00:00Z")
    ).select("event_id")


def q_datetime_range(spark, sf):  # P6 (database_logic.py:279-292)
    return _stac_events(spark, sf).filter(
        datetime_predicate("2024-01-10T00:00:00Z/2024-01-20T00:00:00Z")
    ).select("event_id")


def q_datetime_gte(spark, sf):  # P7 (database_logic.py:293-302)
    return _stac_events(spark, sf).filter(
        datetime_predicate("2024-01-25T00:00:00Z/..")
    ).select("event_id")


def q_datetime_lte(spark, sf):  # P8 (database_logic.py:303-312)
    return _stac_events(spark, sf).filter(
        datetime_predicate("../2024-01-05T00:00:00Z")
    ).select("event_id")


def q_cql2_comparisons(spark, sf):  # C4-C6 (database_logic.py:566-594)
    df = _t(spark, sf, "customer")
    expr = {
        "op": "and",
        "args": [
            {"op": ">=", "args": [{"property": "c_acctbal"}, 1000]},
            {"op": "<", "args": [{"property": "c_acctbal"}, 5000]},
            {"op": "<>", "args": [{"property": "c_mktsegment"}, "BUILDING"]},
        ],
    }
    return df.filter(cql2_to_column(expr, df.columns)).select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )


def q_cql2_like_in(spark, sf):  # C7, C8 (database_logic.py:597-607)
    df = _t(spark, sf, "part")
    expr = {
        "op": "and",
        "args": [
            {"op": "like", "args": [{"property": "p_type"}, "PROMO%"]},
            {
                "op": "in",
                "args": [{"property": "p_brand"}, ["Brand#1", "Brand#2", "Brand#3"]],
            },
        ],
    }
    return df.filter(cql2_to_column(expr, df.columns)).select(
        "p_partkey", "p_type", "p_brand"
    )


def q_cql2_between_or_not(spark, sf):  # C2, C3, C9 (database_logic.py:557-615)
    df = _t(spark, sf, "part")
    expr = {
        "op": "or",
        "args": [
            {"op": "between", "args": [{"property": "p_size"}, 1, 5]},
            {
                "op": "not",
                "args": [{"op": "like", "args": [{"property": "p_name"}, "%a%"]}],
            },
        ],
    }
    return df.filter(cql2_to_column(expr, df.columns)).select(
        "p_partkey", "p_size", "p_name"
    )


def q_cql2_isnull(spark, sf):  # C10 (database_logic.py:617-620); NULLs derived
    df = _t(spark, sf, "customer").withColumn(
        "segment_opt", F.nullif(F.col("c_mktsegment"), F.lit("MACHINERY"))
    )
    expr = {"op": "isNull", "args": [{"property": "segment_opt"}]}
    return df.filter(cql2_to_column(expr, df.columns)).select("c_custkey")


def q_cql2_ilike(spark, sf):  # C12: advertised-but-missing in reference
    df = _t(spark, sf, "part")
    expr = {"op": "ilike", "args": [{"property": "p_type"}, "promo%"]}
    return df.filter(cql2_to_column(expr, df.columns)).select("p_partkey", "p_type")


def q_stacql_query(spark, sf):  # P12: query extension (stubbed in reference)
    df = _t(spark, sf, "supplier")
    q = {"s_acctbal": {"gte": 1000, "lt": 6000}, "s_name": {"startsWith": "Supplier#00000000"}}
    return df.filter(stacql_to_column(q, df.columns)).select("s_suppkey", "s_name", "s_acctbal")


def q_sort_multikey(spark, sf):  # O1-O3 multi-key ORDER BY + limit
    return (
        _t(spark, sf, "lineitem")
        .orderBy(
            F.col("l_returnflag").desc(),
            F.col("l_shipdate").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .limit(100)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate")
    )


def q_pagination_offset(spark, sf):  # O4: LIMIT/OFFSET look-ahead page
    return (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_orderkey").asc())
        .offset(5000)
        .limit(50)
        .select("o_orderkey", "o_orderdate")
    )


def q_topk(spark, sf):  # O4 topk → TakeOrderedAndProject physical op
    return (
        _t(spark, sf, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
        .select("o_orderkey", "o_totalprice")
    )


def q_count_matched(spark, sf):  # A1+A2: numMatched COUNT(*) with WHERE
    return (
        _t(spark, sf, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") > 0.05)
        )
        .agg(F.count(F.lit(1)).alias("matched"))
    )


def q_union_counts(spark, sf):  # U2: per-source counts summed
    ev = _events(spark, sf)
    a = ev.filter(F.col("event_type") == "click").agg(F.count(F.lit(1)).alias("cnt"))
    b = ev.filter(F.col("event_type") == "error").agg(F.count(F.lit(1)).alias("cnt"))
    return a.unionByName(b).agg(F.sum("cnt").cast("bigint").alias("total"))


def q_spatial_envelope(spark, sf):
    """P10 fast path: rectangle-overlap on derived bbox arrays — the
    pushdownable half of the bbox operator (operators/spatial.py).
    Synthetic geo: customer → 1°×1° tiles on a 60×30 grid."""
    df = _t(spark, sf, "customer").select(
        "c_custkey",
        F.array(
            (F.col("c_custkey") % 60).cast("double"),
            (F.col("c_custkey") % 30).cast("double"),
            (F.col("c_custkey") % 60 + 1).cast("double"),
            (F.col("c_custkey") % 30 + 1).cast("double"),
        ).alias("bbox"),
    )
    w, s, e, n = 10.0, 5.0, 20.0, 12.0
    b = F.col("bbox")
    return df.filter(
        (b[0] <= e) & (b[2] >= w) & (b[1] <= n) & (b[3] >= s)
    ).select("c_custkey")


# ---------------------------------------------------------------------------
# Beyond-reference analytics (TPC-H-style headline queries for bench)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark, sf):
    """TPC-H Q1 shape: the flagship aggregation. DECIMAL(18,2) sums for
    exact, order-independent oracle comparison."""
    l = _t(spark, sf, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1) - dec("l_discount"))).cast(
                    "decimal(18,4)"
                )
            )
            .cast("double")
            .alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_top_revenue_orders(spark, sf):
    """TPC-H Q3 shape: 3-way join (broadcast dims) + group + top-k."""
    c = _t(spark, sf, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    l = _t(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_region_revenue(spark, sf):
    """TPC-H Q5 shape: 5-way star join with broadcast dims."""
    r = _t(spark, sf, "region")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    ).cast("decimal(18,4)")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


def q_events_hourly_rollup(spark, sf):
    """Time-bucketed aggregation over the events table (batch twin of
    the streaming windowed agg in streaming/)."""
    ev = _events(spark, sf)
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("bucket", "event_type")
    )


# ---------------------------------------------------------------------------
# Training-data pipeline operators (documents / embeddings)
# ---------------------------------------------------------------------------

def q_dedup_exact(spark, sf):
    """Exact dedup: keep min doc_id per identical text (hash-groupBy)."""
    return (
        _t(spark, sf, "documents")
        .groupBy("text")
        .agg(F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("dups"))
        .select("keep_id", "dups")
    )


def q_token_count(spark, sf):
    """Whitespace token counting per document."""
    return _t(spark, sf, "documents").select(
        "doc_id",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("bigint").alias("n_tokens"),
    )


def q_text_fingerprint(spark, sf):
    """Document fingerprint: md5 over normalized text."""
    return _t(spark, sf, "documents").select(
        "doc_id", F.md5(F.lower(F.trim(F.col("text")))).alias("fp")
    )


def q_text_quality(spark, sf):
    """Quality scoring: char/token stats per doc (integer-exact)."""
    d = _t(spark, sf, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars_actual"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique_tokens"),
    )


def q_embedding_topk(spark, sf):
    """Brute-force cosine top-k ANN baseline: 10 nearest to vec_id=0.
    JVM-side higher-order-function dot/norm (functions/vectors.py)."""
    emb = _t(spark, sf, "embeddings")
    probe = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("probe_vec")
    )
    return (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(probe))
        .select(
            "vec_id",
            F.round(V.cosine_similarity("embedding", "probe_vec"), 6).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "point_lookup": q_point_lookup,
    "ids_in_list": q_ids_in_list,
    "collection_union": q_collection_union,
    "datetime_exact": q_datetime_exact,
    "datetime_range": q_datetime_range,
    "datetime_gte": q_datetime_gte,
    "datetime_lte": q_datetime_lte,
    "cql2_comparisons": q_cql2_comparisons,
    "cql2_like_in": q_cql2_like_in,
    "cql2_between_or_not": q_cql2_between_or_not,
    "cql2_isnull": q_cql2_isnull,
    "cql2_ilike": q_cql2_ilike,
    "stacql_query": q_stacql_query,
    "sort_multikey": q_sort_multikey,
    "pagination_offset": q_pagination_offset,
    "topk": q_topk,
    "count_matched": q_count_matched,
    "union_counts": q_union_counts,
    "spatial_envelope": q_spatial_envelope,
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "region_revenue": q_region_revenue,
    "events_hourly_rollup": q_events_hourly_rollup,
    "dedup_exact": q_dedup_exact,
    "token_count": q_token_count,
    "text_fingerprint": q_text_fingerprint,
    "text_quality": q_text_quality,
    "embedding_topk": q_embedding_topk,
}


ORACLE_SQL: dict[str, str] = {
    "point_lookup": """
        SELECT o_orderkey, o_custkey, o_orderstatus FROM orders
        WHERE o_orderkey = 100 LIMIT 1
    """,
    "ids_in_list": """
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderkey IN (1,2,3,5,8,13,21,34,55,89,144)
    """,
    "collection_union": """
        SELECT event_id, 'col-click' AS collection FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) WHERE event_type = 'click'
        UNION ALL
        SELECT event_id, 'col-purchase' AS collection FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) WHERE event_type = 'purchase'
    """,
    "datetime_exact": f"""
        SELECT event_id FROM ({_STAC_EVENTS_SQL})
        WHERE (datetime IS NOT NULL AND datetime = TIMESTAMP '2024-01-15 00:00:00')
           OR (datetime IS NULL AND start_datetime IS NOT NULL AND end_datetime IS NOT NULL
               AND start_datetime <= TIMESTAMP '2024-01-15 00:00:00'
               AND end_datetime >= TIMESTAMP '2024-01-15 00:00:00')
    """,
    "datetime_range": f"""
        SELECT event_id FROM ({_STAC_EVENTS_SQL})
        WHERE (datetime IS NOT NULL
               AND datetime >= TIMESTAMP '2024-01-10 00:00:00'
               AND datetime <= TIMESTAMP '2024-01-20 00:00:00')
           OR (datetime IS NULL AND start_datetime IS NOT NULL AND end_datetime IS NOT NULL
               AND start_datetime <= TIMESTAMP '2024-01-20 00:00:00'
               AND end_datetime >= TIMESTAMP '2024-01-10 00:00:00')
    """,
    "datetime_gte": f"""
        SELECT event_id FROM ({_STAC_EVENTS_SQL})
        WHERE (datetime IS NOT NULL AND datetime >= TIMESTAMP '2024-01-25 00:00:00')
           OR (datetime IS NULL AND end_datetime IS NOT NULL
               AND end_datetime >= TIMESTAMP '2024-01-25 00:00:00')
    """,
    "datetime_lte": f"""
        SELECT event_id FROM ({_STAC_EVENTS_SQL})
        WHERE (datetime IS NOT NULL AND datetime <= TIMESTAMP '2024-01-05 00:00:00')
           OR (datetime IS NULL AND start_datetime IS NOT NULL
               AND start_datetime <= TIMESTAMP '2024-01-05 00:00:00')
    """,
    "cql2_comparisons": """
        SELECT c_custkey, c_acctbal, c_mktsegment FROM customer
        WHERE c_acctbal >= 1000 AND c_acctbal < 5000 AND c_mktsegment <> 'BUILDING'
    """,
    "cql2_like_in": """
        SELECT p_partkey, p_type, p_brand FROM part
        WHERE p_type LIKE 'PROMO%' AND p_brand IN ('Brand#1','Brand#2','Brand#3')
    """,
    "cql2_between_or_not": """
        SELECT p_partkey, p_size, p_name FROM part
        WHERE p_size BETWEEN 1 AND 5 OR NOT (p_name LIKE '%a%')
    """,
    "cql2_isnull": """
        SELECT c_custkey FROM (
            SELECT c_custkey, NULLIF(c_mktsegment, 'MACHINERY') AS segment_opt
            FROM customer
        ) WHERE segment_opt IS NULL
    """,
    "cql2_ilike": """
        SELECT p_partkey, p_type FROM part WHERE lower(p_type) LIKE 'promo%'
    """,
    "stacql_query": """
        SELECT s_suppkey, s_name, s_acctbal FROM supplier
        WHERE s_acctbal >= 1000 AND s_acctbal < 6000
          AND s_name LIKE 'Supplier#00000000%'
    """,
    "sort_multikey": """
        SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate FROM lineitem
        ORDER BY l_returnflag DESC, l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
        LIMIT 100
    """,
    "pagination_offset": """
        SELECT o_orderkey, o_orderdate FROM orders
        ORDER BY o_orderkey ASC LIMIT 50 OFFSET 5000
    """,
    "topk": """
        SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
    "count_matched": """
        SELECT count(*) AS matched FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00' AND l_discount > 0.05
    """,
    "union_counts": """
        SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM (
            SELECT count(*) AS cnt FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) WHERE event_type = 'click'
            UNION ALL
            SELECT count(*) AS cnt FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) WHERE event_type = 'error'
        )
    """,
    "spatial_envelope": """
        SELECT c_custkey FROM (
            SELECT c_custkey,
                   CAST(c_custkey % 60 AS DOUBLE) AS x0,
                   CAST(c_custkey % 30 AS DOUBLE) AS y0,
                   CAST(c_custkey % 60 + 1 AS DOUBLE) AS x1,
                   CAST(c_custkey % 30 + 1 AS DOUBLE) AS y1
            FROM customer
        ) WHERE x0 <= 20.0 AND x1 >= 10.0 AND y0 <= 12.0 AND y1 >= 5.0
    """,
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE)
                    AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "top_revenue_orders": """
        SELECT l_orderkey, o_orderdate,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE)
                    AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
          AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
    """,
    "region_revenue": """
        SELECT n_name,
               CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DOUBLE)
                    AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY n_name
        ORDER BY revenue DESC, n_name ASC
    """,
    "events_hourly_rollup": """
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events)
        GROUP BY 1, 2
        ORDER BY bucket, event_type
    """,
    "dedup_exact": """
        SELECT MIN(doc_id) AS keep_id, count(*) AS dups
        FROM documents GROUP BY text
    """,
    "token_count": """
        SELECT doc_id,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens
        FROM documents
    """,
    "text_fingerprint": """
        SELECT doc_id, md5(lower(trim(text))) AS fp FROM documents
    """,
    "text_quality": """
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars_actual,
               CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
               CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT)
                    AS n_unique_tokens
        FROM documents
    """,
    "embedding_topk": """
        SELECT vec_id,
               ROUND(list_cosine_similarity(
                   CAST(embedding AS DOUBLE[]),
                   (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)
               ), 6) AS cos_sim
        FROM embeddings
        WHERE vec_id <> 0
        ORDER BY cos_sim DESC, vec_id ASC
        LIMIT 10
    """,
}
