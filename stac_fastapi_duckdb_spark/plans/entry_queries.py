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

from stac_fastapi_duckdb_spark.functions import money as M
from stac_fastapi_duckdb_spark.functions import vectors as V
from stac_fastapi_duckdb_spark.operators.cql2 import cql2_to_column
from stac_fastapi_duckdb_spark.operators.datetime_filter import datetime_predicate
from stac_fastapi_duckdb_spark.operators.stacql import stacql_to_column
from stac_fastapi_duckdb_spark.pipeline import dedup as P_dedup
from stac_fastapi_duckdb_spark.pipeline import multimodal as P_mm
from stac_fastapi_duckdb_spark.pipeline import similarity as P_sim
from stac_fastapi_duckdb_spark.pipeline import text as P_text
from stac_fastapi_duckdb_spark.streaming import events as P_stream


import weakref

# Keyed by the live session object (weakly): id(spark) can be reused by a
# new session after the old one is GC'd, which would hand out cached
# DataFrames bound to a dead session; weak keys also self-evict.
_CONF_GUARDED: "weakref.WeakSet[SparkSession]" = weakref.WeakSet()


def _ensure_session_confs(spark: SparkSession) -> None:
    """The driver may run these queries on ITS OWN SparkSession without
    this repo's session defaults. Two of them are correctness-critical
    and runtime-settable, so set them defensively (once per session):
    nanosAsLong (events.parquet is TIMESTAMP(NANOS) — a plain session
    errors with PARQUET_TYPE_ILLEGAL) and UTC so timestamp hashing
    matches the DuckDB oracle."""
    if spark in _CONF_GUARDED:
        return
    for conf, val in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
    ):
        try:
            spark.conf.set(conf, val)
        except Exception:
            pass  # static in this deployment; session.py already set it
    _CONF_GUARDED.add(spark)


_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[tuple[str, str], DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Base-table reader. With ``SPARK_GRAFT_CACHE_INPUTS=1`` the table
    is served from Spark's in-memory columnar cache — the long-lived
    serving mode the bench uses, symmetric to the DuckDB baseline's
    ``enable_object_cache=true`` + OS page cache (reference
    ``config.py:142-150``): both engines then measure query compute,
    not per-run parquet decode. Off by default (correctness runs, plan
    goldens, and tests all exercise the cold parquet path, where
    pushdown/pruning assertions live). At cluster scale the knob is
    per-table: cache dims and hot extracts, never the 100 TB fact."""
    import os as _os

    _ensure_session_confs(spark)
    if _os.environ.get("SPARK_GRAFT_CACHE_INPUTS") == "1":
        per_session = _TABLE_CACHE.setdefault(spark, {})
        key = (sf_dir, name)
        df = per_session.get(key)
        if df is None:
            path = f"{sf_dir}/{name}.parquet"
            df = spark.read.parquet(path)
            # A cached table inherits the SCAN's partitioning, and the
            # test parquet ships as one small (often single-row-group)
            # file — cached as ONE partition, every map-side stage over
            # it would run single-threaded on a 32-core machine. Size
            # the cache by compressed bytes (~2 MB/partition, capped at
            # the core count): a real deployment likewise repartitions
            # a hot table once at cache build, not per query.
            parts = _cache_partitions(spark, path)
            if parts > 1:
                df = df.repartition(parts)
            df = df.cache()
            per_session[key] = df
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _cache_partitions(spark: SparkSession, path: str) -> int:
    """~2 MB compressed bytes or ~50k rows per cached partition,
    whichever asks for more (zstd squeezes the synthetic text/props
    tables 20×+, so bytes alone undersizes them), capped at the core
    count. Footer-only driver reads, once per cache build."""
    import os as _os

    try:
        files = (
            [
                _os.path.join(path, f)
                for f in _os.listdir(path)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            ]
            if _os.path.isdir(path)
            else [path]
        )
        size = sum(_os.path.getsize(f) for f in files)
        import pyarrow.parquet as _pq

        rows = sum(_pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        # pyarrow raises ArrowInvalid (not OSError) on a corrupt or
        # truncated footer — any failure here means "size unknown",
        # and the answer to that is 1 partition, not a crash
        return 1
    want = max(size // (2 << 20), rows // 50_000)
    return max(1, min(spark.sparkContext.defaultParallelism, want))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.ts has shipped as TIMESTAMP(NANOS) parquet (read as raw ns
    longs under nanosAsLong) AND as plain timestamp[us] (read as
    TIMESTAMP_NTZ) — normalize adaptively by schema to µs TimestampType.
    The matching oracle view is ``_EVENTS_SQL`` (DuckDB CAST is an
    identity on timestamp[us] and an ns→µs truncation on nanos)."""
    return P_stream.normalize_event_ts(_t(spark, sf_dir, "events"))


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


def q_cql2_text(spark, sf):
    """CQL2-TEXT encoding (upstream Filter-extension GET default): the
    text grammar parses to the SAME dict AST the JSON path compiles
    (operators/cql2_text.py), so one Column compiler serves both. The
    reference only ever sees pre-parsed JSON (database_logic.py:488-521);
    text support is what its conformance advertisement implies."""
    from stac_fastapi_duckdb_spark.operators.cql2_text import parse_cql2_text

    df = _t(spark, sf, "orders")
    text = (
        "(o_totalprice BETWEEN 1000.0 AND 50000.0"
        " OR o_orderpriority IN ('1-URGENT', '2-HIGH'))"
        " AND o_orderpriority NOT LIKE '%LOW%'"
        " AND o_orderstatus <> 'P'"
        " AND o_orderdate >= DATE('1995-01-01')"
    )
    return df.filter(cql2_to_column(parse_cql2_text(text), df.columns)).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )


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
    """TPC-H Q1 shape: the flagship aggregation. Integer-unit money sums
    (functions/money.py): exact and order-independent like the previous
    DECIMAL(18,2) formulation, ~2x faster per row in codegen. Overflow
    bound: < 2^40 rows * 10^7 cents fits int64."""
    l = _t(spark, sf, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2001-09-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            M.sum_money("l_quantity").alias("sum_qty"),
            M.sum_money("l_extendedprice").alias("sum_base_price"),
            M.sum_money_product("l_extendedprice", "l_discount").alias(
                "sum_disc_price"
            ),
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
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            M.sum_money_product("l_extendedprice", "l_discount").alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def _fact_hint(df: DataFrame) -> DataFrame:
    """SHUFFLE_HASH on the narrower side of a fact-fact join skips both
    sort passes (~2× measured at sf0.1/sf1), but a shuffled-hash build
    must fit per-task memory and cannot spill its hash table the way
    sort-merge spills — under heavy key skew the pinned hint risks an
    executor OOM where Catalyst's default would degrade gracefully.
    Set ``SPARK_GRAFT_NO_SHUFFLE_HASH=1`` to drop the hint for skewed
    production reuse; the bench default keeps it (AQE skew-join splits
    oversized shuffle partitions before the build, bounding each
    per-task hash table)."""
    import os as _os

    if _os.environ.get("SPARK_GRAFT_NO_SHUFFLE_HASH"):
        return df
    return df.hint("SHUFFLE_HASH")


def q_region_revenue(spark, sf):
    """TPC-H Q5 shape: 5-way star join with broadcast dims. The one
    fact-fact join (lineitem⋈orders) uses SHUFFLE_HASH on the narrower
    orders side — same exchanges as the default sort-merge but no sort
    of either side (A/B'd 0.92→0.65 s at sf0.1, 1.49→1.13 s at sf1);
    per-partition hash build stays bounded by the shuffle partition
    count, which AQE sizes at scale. Skew caveat + env off-switch:
    see ``_fact_hint``."""
    r = _t(spark, sf, "region")
    n = _t(spark, sf, "nation")
    c = _t(spark, sf, "customer")
    o = _t(spark, sf, "orders")
    l = _t(spark, sf, "lineitem")
    return (
        l.join(_fact_hint(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            M.sum_money_product("l_extendedprice", "l_discount").alias("revenue")
        )
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


def q_minhash_near_dup(spark, sf):
    """MinHash+LSH near-dup detection: shingle→seeded-xxhash64 minhash →
    banded bucket join → exact Jaccard verify. Oracle is the exact
    all-pairs Jaccard (LSH recall at j≥0.8 with 32 bands ≈ 1-6e-15)."""
    docs = _t(spark, sf, "documents")
    cand = P_dedup.minhash_lsh_candidates(docs, bands=32)
    return P_dedup.ngram_jaccard_pairs(docs, cand, threshold=0.8)


def q_ngram_jaccard(spark, sf):
    """Word-3-gram Jaccard ≥ 0.8 pairs via the CANDIDATE-JOIN form:
    128-hash / 64-band LSH candidates (per-pair miss ≈ (1-0.8²)⁶⁴ ≈
    6e-30 at the threshold — effectively exhaustive) verified by exact
    shingle Jaccard. The brute-force crossJoin branch of
    ``ngram_jaccard_pairs`` is deliberately NOT registered — it is the
    test-only verification oracle (tests/test_dedup.py); no contract
    plan contains a cartesian product (pinned in
    tests/test_plan_regression.py)."""
    docs = _t(spark, sf, "documents")
    cand = P_dedup.minhash_lsh_candidates(docs, num_hashes=128, bands=64)
    return P_dedup.ngram_jaccard_pairs(docs, cand, threshold=0.8)


def q_minhash_dedup_map(spark, sf):
    """Full near-dup dedup: LSH candidates → verify → id→canonical map."""
    return P_dedup.minhash_dedup(_t(spark, sf, "documents"), bands=32)


def q_simhash_pairs(spark, sf):
    """SimHash Hamming≤8 pairs via pigeonhole banding. Token hash is the
    low-64-bits-of-md5, so the DuckDB oracle rebuilds the identical
    signatures (md5 hex → bit votes) and brute-forces all pairs — the
    banding recall claim is value-checked, not taken on faith."""
    out = P_dedup.simhash_near_dup_pairs(
        _t(spark, sf, "documents"), max_hamming=8
    )
    return out.select("id_a", "id_b", F.col("hamming").cast("int").alias("hamming"))


def q_language_id(spark, sf):
    """Heuristic language ID: CJK script ratio → zh, else best stopword-
    profile overlap (en/de/fr/es), ties → first profile, no hits → und."""
    return _t(spark, sf, "documents").select(
        "doc_id", P_text.lang_id_col(F.col("text")).alias("lang_pred")
    )


def q_text_analysis(spark, sf):
    """One-pass combined text analysis: language, token counts
    (whitespace + BPE-ish pretokenizer), quality score, fingerprint."""
    return P_text.analyze_documents(_t(spark, sf, "documents"))


def q_quality_features(spark, sf):
    """Per-doc quality signals: lengths, diversity, punct/digit/upper
    ratios, stopword hit ratio."""
    return P_text.quality_features(_t(spark, sf, "documents"))


def q_embedding_near_dup(spark, sf):
    """Embedding near-dup pairs (cos ≥ 0.95) via SRP-LSH bucket self-join
    + exact verify. Planted dups: table unioned with an id-shifted copy
    of itself (identical vectors ⇒ identical SRP signature ⇒ recall 1)."""
    emb = _t(spark, sf, "embeddings")
    shifted = emb.select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding", "label"
    )
    return P_sim.embedding_near_dup_pairs(
        emb.unionByName(shifted), threshold=0.95
    )


def _probe_embedding(sf_dir: str, vec_id: int = 0) -> list[float]:
    """Driver-side point read of ONE probe vector straight from the
    parquet row-group (pyarrow predicate read — no Spark job). At
    serving time the probe arrives with the request; fetching it from
    the corpus is harness plumbing and must not cost a distributed job
    per query. Bounded: reads only the row groups whose stats admit
    the single vec_id, one row out."""
    import pyarrow.dataset as ds

    t = ds.dataset(f"{sf_dir}/embeddings.parquet").to_table(
        filter=ds.field("vec_id") == vec_id, columns=["embedding"]
    )
    return [float(x) for x in t.column("embedding")[0].as_py()]


_ANN_INDEX_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)

# frozen trained artifacts (unigram LMs, hashed-corpus vectors, …):
# built once per session/SF and served many times — the deployment
# shape every scorer docstring promises ("persist once, broadcast into
# every scoring pass"). Weak session keys, same rationale as above.
_ARTIFACT_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def _session_artifact(spark: SparkSession, key, builder):
    per_session = _ARTIFACT_CACHE.setdefault(spark, {})
    if key not in per_session:
        per_session[key] = builder()
    return per_session[key]


def _artifact_df(
    spark: SparkSession,
    family: str,
    sf: str,
    build,
    sources: tuple[str, ...] = ("documents",),
    partitions: int | None = None,
):
    """Three-tier corpus-constant DataFrame artifact: session memory →
    written fingerprint-validated sidecar (sources/sidecar.py) →
    build. On first build the artifact is WRITTEN and then served from
    the written form (the round-trip IS the tested path), so a new
    session whose sources still fingerprint-match loads the parquet
    with zero rebuild jobs; a source change invalidates and rebuilds.
    ``build`` returns the unpersisted DataFrame; this wrapper owns
    persist + eager materialization. ``partitions`` shapes the written
    (and therefore cached) layout: row-heavy artifacts whose consumers
    start with a partial aggregate need >1 files, or AQE's small-output
    coalescing leaves the serving-side partial agg SERIAL on one
    cached partition."""
    from stac_fastapi_duckdb_spark.sources import sidecar as _sc

    def full():
        fp = _sc.source_fingerprint(*[f"{sf}/{t}.parquet" for t in sources])
        tag = _sc.dataset_tag(sf)
        df = _sc.load_sidecar(spark, family, tag, fp)
        if df is None:
            _sc.write_sidecar(build(), family, tag, fp, partitions=partitions)
            df = spark.read.parquet(_sc.data_path(family, tag))
        if partitions is not None and df.rdd.getNumPartitions() < partitions:
            # a pre-round-10 single-file sidecar (or a small-file read
            # coalesce) would serialize the consumer's partial agg —
            # re-split the CACHED form; the disk form heals on the
            # next fingerprint change
            df = df.repartition(partitions)
        df = df.persist()
        df.count()  # materialize the load eagerly, off the query path
        return df

    return _session_artifact(spark, (family, sf), full)


def _ivfpq_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANN SERVING table: embeddings + precomputed ``ivf_cell`` +
    ``pq_code``, built and persisted ONCE per session/SF — the offline
    index build of the FAISS IVFADC architecture (train once, encode
    once, serve many). Serving queries over it plan a single job:
    cell-pruned in-memory scan → ADC/exact fold → TakeOrderedAndProject
    — no pandas_udf assignment, no interpreted code derivation on the
    query path. At 100 TB this materialization is ``write_ivf_layout``
    (cells = partition directories pruned at the manifest, codes =
    narrow columns scanned instead of the float vectors); the persisted
    DataFrame is the local-mode equivalent of that layout."""
    import numpy as np

    from stac_fastapi_duckdb_spark.plans.ivf_index import IVF_CENTROIDS
    from stac_fastapi_duckdb_spark.plans.pq_index import PQ_CODEBOOKS

    per_session = _ANN_INDEX_CACHE.setdefault(spark, {})
    df = per_session.get(sf_dir)
    if df is None:
        from stac_fastapi_duckdb_spark.sources import sidecar as _sc

        fp = _sc.source_fingerprint(f"{sf_dir}/embeddings.parquet")
        tag = _sc.dataset_tag(sf_dir)
        df = _sc.load_sidecar(spark, "ivfpq_index", tag, fp)
        if df is None:
            emb = _t(spark, sf_dir, "embeddings")
            built = P_sim.with_pq_codes(
                P_sim.with_ivf_cell(
                    emb, np.asarray(IVF_CENTROIDS, dtype=np.float64)
                ),
                np.asarray(PQ_CODEBOOKS, dtype=np.float64),
            )
            # written clustered by cell — the local-mode form of
            # write_ivf_layout's cell-partitioned directories
            _sc.write_sidecar(built, "ivfpq_index", tag, fp, sort_cols=("ivf_cell",))
            df = spark.read.parquet(_sc.data_path("ivfpq_index", tag))
        df = df.persist()
        df.count()  # materialize the build eagerly, off the query path
        per_session[sf_dir] = df
    return df


def q_ann_srp_topk(spark, sf):
    """ANN top-k via random-hyperplane LSH buckets + multiprobe (approx —
    candidate set is the probe's bucket neighborhood, so no SQL oracle)."""
    emb = _t(spark, sf, "embeddings")
    probe = _probe_embedding(sf)
    return P_sim.srp_lsh_topk(
        emb.filter(F.col("vec_id") != 0), probe, k=10,
        num_planes=8, multiprobe_bits=2,
    )


def q_ann_ivf_topk(spark, sf):
    """ANN top-k via IVF coarse quantizer: FROZEN centroids (the index
    artifact — training is an offline build step, see plans/ivf_index),
    nprobe nearest cells, exact top-k inside them. Deterministic, so
    the DuckDB oracle replays cell assignment + pruning from the same
    centroid literals. Serves from the precomputed index table
    (``_ivfpq_indexed``): the cell column already exists, so the query
    is cell filter → exact top-k, one job."""
    import numpy as np

    from stac_fastapi_duckdb_spark.plans.ivf_index import IVF_CENTROIDS

    probe = _probe_embedding(sf)
    rest = _ivfpq_indexed(spark, sf).filter(F.col("vec_id") != 0)
    return P_sim.ivf_topk(
        rest, probe, np.asarray(IVF_CENTROIDS, dtype=np.float64), k=10, nprobe=4
    )


def q_ann_pq_topk(spark, sf):
    """ANN top-k via product quantization + asymmetric distance:
    FROZEN per-subspace codebooks (plans/pq_index — the offline index
    artifact), codes assigned in pure Column algebra, per-row distance
    = m LUT lookups. The DuckDB oracle replays assignment and ADC from
    the same literals — identical IEEE op order makes distances
    bit-identical, so codes, ties, and ranking match exactly."""
    import numpy as np

    from stac_fastapi_duckdb_spark.plans.pq_index import PQ_CODEBOOKS

    probe = _probe_embedding(sf)
    rest = _ivfpq_indexed(spark, sf).filter(F.col("vec_id") != 0)
    return P_sim.pq_adc_topk(
        rest, probe, np.asarray(PQ_CODEBOOKS, dtype=np.float64), k=10
    )


def _pq_adc_dist_sql(row_vec: str, probe_vec: str) -> str:
    """The bitwise-replayable ADC distance expression over the frozen
    codebooks, parameterized by the row/probe vector SQL expressions —
    shared by the ann_pq_topk and ann_ivfpq_topk oracles."""
    from stac_fastapi_duckdb_spark.plans.pq_index import PQ_CODEBOOKS

    m = len(PQ_CODEBOOKS)
    dsub = len(PQ_CODEBOOKS[0][0])

    def lst(v):
        return "[" + ", ".join(repr(float(x)) for x in v) + "]"

    def cb_lit(j):
        # ::DOUBLE[][] is LOAD-BEARING: DuckDB types a bare
        # 17-fractional-digit literal as DECIMAL(18,17), which silently
        # runs the whole distance computation in decimal arithmetic
        # (~1e-7 off the IEEE result — caught by the embeddings
        # differential fuzzer; the fixed testdata never crossed a
        # rounding boundary)
        return (
            "["
            + ", ".join(lst(c) for c in PQ_CODEBOOKS[j])
            + "]::DOUBLE[][]"
        )

    def dists(j, vec):
        off = j * dsub
        return (
            f"list_transform({cb_lit(j)}, cent -> list_sum("
            f"list_transform(range(1, {dsub + 1}), i -> "
            f"({vec}[{off}+i]-cent[i])*({vec}[{off}+i]-cent[i]))))"
        )

    terms = []
    for j in range(m):
        d_row = dists(j, row_vec)
        lut = dists(j, probe_vec)
        terms.append(f"({lut})[(list_position({d_row}, list_min({d_row})))]")
    return " + ".join(terms)


def _pq_oracle_sql() -> str:
    """Generate the ann_pq_topk oracle from the frozen codebooks: the
    SAME sequential (p-c)*(p-c) folds as the Spark Column algebra and
    the Python LUT, so every double matches bitwise."""
    dist = _pq_adc_dist_sql("e.embedding", "p.pe")
    # floor-based half-up rounding mirrors the Spark side exactly (both
    # engines' ROUND() disagree at decimal boundaries; floor(x*1e6+0.5)
    # is pure IEEE arithmetic on the bit-identical distance)
    return f"""
        SELECT vec_id, floor(dist * 1e6 + 0.5) / 1e6 AS adc_dist FROM (
            SELECT e.vec_id AS vec_id, {dist} AS dist
            FROM embeddings e,
                 (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0) p
            WHERE e.vec_id <> 0
        )
        ORDER BY floor(dist * 1e6 + 0.5) / 1e6 ASC, vec_id ASC
        LIMIT 10
    """


def q_ann_ivfpq_topk(spark, sf):
    """IVF-PQ search — the FAISS IVFADC architecture
    (pipeline/similarity.py ivfpq_topk): frozen coarse centroids prune
    the SCAN to nprobe=4 cells, frozen PQ codebooks prune the BYTES
    per scanned row (LUT distance over m codes). The billion-vector
    memory/IO shape: cells are the partition key, codes the columns,
    full-precision vectors never leave storage. Oracle composes the
    two proven replays — cell assignment + pruning, then bitwise ADC —
    so ranking matches exactly.

    SERVING SHAPE (round 7): probe fetched by a driver-side pyarrow
    point read (no job), cells and codes precomputed on the persisted
    index table (``_ivfpq_indexed``) — the timed query is ONE job:
    in-memory cell-pruned scan → m LUT lookups per row →
    TakeOrderedAndProject."""
    import numpy as np

    from stac_fastapi_duckdb_spark.plans.ivf_index import IVF_CENTROIDS
    from stac_fastapi_duckdb_spark.plans.pq_index import PQ_CODEBOOKS

    probe = _probe_embedding(sf)
    rest = _ivfpq_indexed(spark, sf).filter(F.col("vec_id") != 0)
    return P_sim.ivfpq_topk(
        rest,
        probe,
        np.asarray(IVF_CENTROIDS, dtype=np.float64),
        np.asarray(PQ_CODEBOOKS, dtype=np.float64),
        k=10,
        nprobe=4,
    )


def _ivfpq_oracle_sql() -> str:
    """Compose the two proven replays: ann_ivf_topk's cell assignment
    + probe-cell pruning, then ann_pq_topk's bitwise ADC over the
    surviving rows."""
    dist = _pq_adc_dist_sql("a.embedding", "p.pe")
    return f"""
        WITH base AS (
            SELECT vec_id, embedding, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings
        ), dists AS (
            SELECT b.vec_id, b.embedding, c.c AS cell,
                   list_sum(list_transform(range(1, 65),
                                           i -> (b.v[i] - c.cv[i]) ** 2)) AS dsq
            FROM base b CROSS JOIN {{cents}} AS c(c, cv)
        ), assigned AS (
            SELECT vec_id, embedding, cell FROM (
                SELECT vec_id, embedding, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dsq ASC, cell ASC) AS rn
                FROM dists WHERE vec_id <> 0) WHERE rn = 1
        ), probe_cells AS (
            SELECT cell FROM (
                SELECT cell, row_number() OVER (ORDER BY dsq ASC, cell ASC) AS rn
                FROM dists WHERE vec_id = 0) WHERE rn <= 4
        )
        SELECT vec_id, floor(dist * 1e6 + 0.5) / 1e6 AS adc_dist FROM (
            SELECT a.vec_id AS vec_id, {dist} AS dist
            FROM assigned a,
                 (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0) p
            WHERE a.cell IN (SELECT cell FROM probe_cells)
        )
        ORDER BY floor(dist * 1e6 + 0.5) / 1e6 ASC, vec_id ASC
        LIMIT 10
    """


def _media(spark, sf):
    """Synthesize a media table from documents: payload = UTF-8 bytes of
    the text as an opaque binary column (the real corpus would carry
    image/audio bytes; the Spark-side schema/plumbing is identical)."""
    return _t(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, F.lit("image"))
        .otherwise(F.lit("audio"))
        .alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )


def q_multimodal_metadata(spark, sf):
    """Metadata-only media projection (payload never decoded): byte
    length + content hash; binary column pruned out of the result."""
    return P_mm.media_metadata(_media(spark, sf), algo="md5")


def _media_features_artifact(spark, sf) -> DataFrame:
    """Decoded media features as a FROZEN artifact: feature extraction
    (the mapInPandas decode) runs ONCE per session/SF and the typed
    feature table persists — the decode-once feature store every
    production multimodal pipeline writes at ingest (payload bytes are
    decoded exactly once; downstream queries read the small typed
    features, never the blobs). The live decode path stays exercised
    by the phash/audio-frame queries and the package tests. Persisted
    to a written sidecar (sources/sidecar.py): the decode runs once
    per INGEST, not once per session."""

    def build():
        return P_mm.extract_features(_media(spark, sf), codec="fake")

    return _artifact_df(spark, "media_features", sf, build)


def q_multimodal_features(spark, sf):
    """mapInPandas feature extraction over binary media payloads with the
    deterministic fake decoder (real decoders stubbed per build brief),
    served from the decode-once feature-store artifact
    (_media_features_artifact). The decoder derives features from an
    md5 counter stream (byte/256 — exact in float32 and double), so
    the DuckDB oracle re-derives them with md5 hex arithmetic; emitted
    as a fixed-scale CSV string so the driver canonicalizer can
    sort/hash the column (raw array<float> is unhashable
    driver-side)."""
    feats = _media_features_artifact(spark, sf)
    return feats.select(
        "media_id",
        "kind",
        "n_bytes",
        F.concat_ws(
            ",",
            F.transform(
                F.col("features"),
                lambda x: F.format_number(x.cast("double"), 8),
            ),
        ).alias("features_csv"),
    )


def q_frame_sample(spark, sf):
    """Video frame-sampling plan: (media, n_frames) → one row per
    sampled frame idx via sequence+explode (JVM-side row expansion)."""
    vids = _t(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("n_chars") % 300 + 1).alias("n_frames"),
    )
    return P_mm.frame_sample_plan(vids, every_n=30)


def _audio(spark, sf):
    """Synthetic audio metadata derived from documents (deterministic
    integer math, mirrored exactly in the oracle SQL)."""
    return _t(spark, sf, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.lit(8000) * (F.lit(1) + F.col("doc_id") % 2)).alias("sample_rate"),
        ((F.col("n_chars") * 37) % 20000).alias("n_samples"),
    )


def q_audio_frames(spark, sf):
    """Audio analysis-frame windowing plan (pipeline/multimodal.py):
    overlapping frame rows expanded JVM-side via sequence+explode."""
    return P_mm.audio_frame_plan(
        _audio(spark, sf), frame_length=1024, hop_length=512
    )


def q_audio_frame_features(spark, sf):
    """Per-frame RMS/zero-crossing features over fake-decoded waveforms
    (mapInPandas; decode-once-window-locally). No SQL oracle: the
    hash-seeded waveform isn't SQL-expressible — rows-only check."""
    return P_mm.audio_frame_features(
        # deterministic subsample (limit() without order is not)
        _media(spark, sf).filter(
            (F.col("kind") == "audio") & (F.col("media_id") % 5 == 1)
        ),
        frame_length=1024,
        hop_length=512,
        codec="fake",
    )


def q_daily_from_hourly(spark, sf):
    """Hierarchical rollup reuse (the hypertable/continuous-aggregate
    pattern): the daily aggregate is computed FROM the hourly aggregate,
    not the raw events — algebraic partials (count-sum, sum-sum)
    re-aggregate exactly, so at scale the day/week/month tiers read the
    hour tier instead of rescanning raw data. Oracle: direct daily
    GROUP BY over raw events."""
    hourly = (
        _events(spark, sf)
        .groupBy(
            F.date_trunc("hour", "ts").alias("bucket"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("_sv"),
        )
    )
    return (
        hourly.groupBy(
            F.date_trunc("day", "bucket").alias("day"), "event_type"
        )
        .agg(
            F.sum("n").alias("n"),
            F.sum("_sv").cast("double").alias("sum_value"),
        )
    )


def q_unpivot_events(spark, sf):
    """Unpivot (melt): per-user type-count columns back to long form via
    the stack expression; oracle re-derives the long form directly."""
    types = ["click", "view", "purchase", "error", "signup"]
    wide = (
        _events(spark, sf)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )
    stack_expr = "stack({n}, {args}) as (event_type, n)".format(
        n=len(types), args=", ".join(f"'{t}', `{t}`" for t in types)
    )
    return wide.select("user_id", F.expr(stack_expr)).filter(F.col("n") > 0)


def q_pivot_events(spark, sf):
    """Pivot: per-user event-type counts as columns (explicit value list
    so the plan needs no discovery pass — at scale an implicit pivot
    adds a distinct scan). Oracle: conditional aggregation."""
    types = ["click", "view", "purchase", "error", "signup"]
    return (
        _events(spark, sf)
        .groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )


def q_window_analytics(spark, sf):
    """Ranking-window surface: percent_rank / cume_dist / ntile /
    lag-delta over one (partition, order) spec — one shuffle, one
    Window node; output thinned afterwards (the window still sees full
    partitions)."""
    from pyspark.sql import Window

    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        "o_totalprice", "o_orderkey"
    )
    return (
        o.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(
                F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2
            ).alias("delta_prev"),
        )
        .filter(F.col("o_orderkey") % 20 == 0)
    )


def q_props_map_explode(spark, sf):
    """Typed JSON → MapType → explode (one row per key/value) →
    aggregate per key: the generic schema-on-read path for ragged
    payloads where get_json_object's fixed paths don't fit."""
    ev = _t(spark, sf, "events")
    m = F.from_json("props", "map<string,bigint>")
    return (
        ev.select("event_type", F.explode(m).alias("key", "val"))
        .groupBy("event_type", "key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("val").alias("sum_val"),
        )
    )


def q_string_funcs(spark, sf):
    """Scalar string-function surface (regexp extraction, edit
    distance, padding, splitting, reversal) — all JVM built-ins inside
    whole-stage codegen; deterministic doc subset."""
    d = _t(spark, sf, "documents").filter(F.col("doc_id") % 10 == 0)
    return d.select(
        "doc_id",
        F.regexp_extract("text", "([0-9]+)", 1).alias("first_num"),
        F.levenshtein("lang", "source").alias("lev"),
        F.reverse("lang").alias("rev_lang"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("padded"),
        F.split_part(F.col("source"), F.lit("c"), F.lit(2)).alias("src_num"),
        F.translate("lang", "en", "xy").alias("translated"),
    )


def q_datetime_funcs(spark, sf):
    """Scalar date/time-function surface (dow/doy/week extraction,
    quarter truncation, month-end, day arithmetic). DuckDB's dayofweek
    is 0-based Sunday vs Spark's 1-based — normalized in the oracle."""
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") % 100 == 0)
    return o.select(
        "o_orderkey",
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.weekofyear("o_orderdate").alias("week"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.datediff("o_orderdate", F.lit("1995-01-01").cast("date")).alias(
            "days_since"
        ),
        F.add_months("o_orderdate", 3).cast("timestamp").alias("plus_3mo"),
    )


def q_pivot_dynamic(spark, sf):
    """Dynamic pivot: Spark discovers the pivot values with an extra
    distinct pass (fine for interactive use; the explicit-list variant
    ``pivot_events`` is the at-scale path). Sums through DECIMAL so
    pivot cells hash-match the conditional-aggregation oracle."""
    return (
        _events(spark, sf)
        .groupBy("user_id")
        .pivot("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
        )
    )


def q_range_join(spark, sf):
    """Point-in-interval range join via granule bucketing (one
    equi-shuffle instead of a nested-loop BETWEEN join): each click
    joined to same-user 4-day windows derived from every-3rd events.
    Oracle: plain SQL BETWEEN join."""
    from stac_fastapi_duckdb_spark.operators.rangejoin import (
        point_in_interval_join,
    )

    ev = _events(spark, sf)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    windows = (
        ev.filter(F.col("event_id") % 3 == 0)
        .select(
            F.col("event_id").alias("w_id"),
            "user_id",
            (F.col("ts") - F.expr("INTERVAL 2 DAYS")).alias("w_start"),
            (F.col("ts") + F.expr("INTERVAL 2 DAYS")).alias("w_end"),
        )
    )
    out = point_in_interval_join(
        clicks, windows, "ts", "w_start", "w_end", on="user_id",
        granule_seconds=86400,
    )
    return out.select("event_id", "user_id", "ts", "w_id", "w_start", "w_end")


def q_dedup_clusters(spark, sf):
    """Transitive near-dup clusters: LSH candidates → exact-Jaccard
    verify → iterative min-label connected components over ALL docs.
    Oracle: the same propagation unrolled as SQL (6 rounds ≫ cluster
    diameter at this scale; Spark side stops at fixpoint)."""
    docs = _t(spark, sf, "documents")
    cand = P_dedup.minhash_lsh_candidates(docs, bands=32)
    pairs = P_dedup.ngram_jaccard_pairs(docs, cand, threshold=0.8)
    return P_dedup.connected_components(pairs, all_ids=docs)


def q_asof_join(spark, sf):
    """As-of join (operators/asof.py): for each click, the most recent
    purchase by the same user at-or-before the click. One equi-shuffle
    union+window plan; oracle is DuckDB's native ASOF LEFT JOIN."""
    from stac_fastapi_duckdb_spark.operators.asof import asof_join

    ev = _events(spark, sf)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_event_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    return asof_join(
        clicks, purchases, "user_id", "ts", "p_ts", ["p_event_id", "p_value"]
    )


def q_skew_agg(spark, sf):
    """Salted two-phase aggregation over a skewed key (5 event types for
    100k+ rows): groupBy(key, salt) partials → groupBy(key) finals.
    Algebraic aggregates recombine exactly, so the plain GROUP BY is the
    oracle for ANY salt assignment."""
    from stac_fastapi_duckdb_spark.functions.skew import two_phase_agg

    out = two_phase_agg(
        _events(spark, sf),
        ["event_type"],
        {
            "n": ("count", F.lit(1)),
            "sum_value": ("sum", F.col("value").cast("decimal(18,6)")),
            "max_value": ("max", "value"),
        },
        buckets=16,
    )
    return out.select(
        "event_type",
        "n",
        F.col("sum_value").cast("double").alias("sum_value"),
        "max_value",
    )


def q_stateful_sessions(spark, sf):
    """Custom stateful streaming operator: per-user gap sessionization as
    an applyInPandasWithState state machine (constant-size state per key,
    event-time timeouts). Deterministic finite-replay output: every
    session proven closed by a later event, plus final sessions whose
    last_ts + gap ≤ the end-of-stream watermark (= max ts, delay 0)."""
    from stac_fastapi_duckdb_spark.streaming.stateful import (
        stateful_sessionize,
    )

    stream = P_stream.read_events_stream(spark, f"{sf}/events.parquet")
    out = P_stream.run_to_memory(
        stateful_sessionize(stream), spark, output_mode="append"
    )
    return out.select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.round("sum_value", 6).alias("sum_value"),
    )


def q_keyset_pagination(spark, sf):
    """Keyset (search-after) pagination — the scale-correct replacement
    for the reference's integer OFFSET token (database_logic.py:924-928):
    a (last sort key, last id) token compiles to a pushdownable range
    predicate, so deep pages cost the same as page one instead of a
    global sort-and-skip. Token here: after (1996-06-01, key 3000)."""
    from datetime import datetime

    after_date = datetime(1996, 6, 1)
    after_key = 3000
    o = _t(spark, sf, "orders")
    keyset = (F.col("o_orderdate") > F.lit(after_date)) | (
        (F.col("o_orderdate") == F.lit(after_date))
        & (F.col("o_orderkey") > after_key)
    )
    return (
        o.filter(keyset)
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_orderdate", "o_totalprice")
        .limit(50)
    )


def q_rank_dedup(spark, sf):
    """Quality-ranked canonical selection: keep the best-quality doc per
    language (window row_number) — the 'keep best of near-dup cluster'
    pattern at the cluster-representative stage of a data pipeline."""
    from pyspark.sql.window import Window

    d = _t(spark, sf, "documents").select(
        "doc_id",
        "lang",
        P_text.quality_score_col(F.col("text")).alias("quality"),
    )
    w = Window.partitionBy("lang").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return (
        d.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("lang", "rk", "doc_id", "quality")
    )


def q_user_stats(spark, sf):
    """Per-user behavioral aggregates: event count, exact distinct event
    types, exact value sum, activity span."""
    return (
        _events(spark, sf)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


def q_streaming_hourly_rollup(spark, sf):
    """Structured Streaming ingest of the events table (file source,
    AvailableNow trigger) → watermarked tumbling-window rollup → memory
    sink. Produces EXACTLY the batch rollup, so the batch SQL is the
    oracle — the streaming path is held to the same correctness gate."""
    stream = P_stream.read_events_stream(spark, f"{sf}/events.parquet")
    return P_stream.run_to_memory(P_stream.hourly_rollup(stream), spark)


def q_sessionize(spark, sf):
    """Gap-based session windows (30 min) per user via F.session_window —
    the same operator serves batch and streaming; oracle is the classic
    gaps-and-islands SQL (lag + cumulative sum)."""
    return P_stream.session_windows(_events(spark, sf), "30 minutes")


def q_semi_join(spark, sf):
    """EXISTS → left-semi join (TPC-H Q4 shape). A semi join never
    duplicates probe-side rows, so at 100 TB it avoids materializing the
    N:M match explosion an inner-join+distinct would shuffle; Catalyst
    plans the same LeftSemi it would derive from SQL EXISTS.
    SHUFFLE_HASH on the build side skips both sort passes (a semi probe
    only needs set membership): A/B'd 0.44→0.33 s at sf0.1 and
    1.18→0.46 s at sf1. Per-partition build = the filtered key set /
    shuffle-partition count, which AQE keeps bounded at scale. The
    explicit hint (vs preferSortMergeJoin=false) keeps the plan
    deterministic across stat estimates; the cost is forgoing the
    broadcast Catalyst would pick at toy scale — at production scale
    neither filtered side is broadcastable anyway."""
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    l = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(_fact_hint(l), o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_anti_join(spark, sf):
    """NOT EXISTS → left-anti join (TPC-H Q22 shape): well-funded
    customers with no 1995 orders. One equi-shuffle, no row duplication.
    (The right side is date-filtered because every customer in the
    synthetic data has at least one order overall.)"""
    c = _t(spark, sf, "customer").filter(F.col("c_acctbal") > 6000)
    o = _t(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


def q_scalar_subquery(spark, sf):
    """Correlated scalar subquery, decorrelated (TPC-H Q17 shape):
    lineitems below half their part's average quantity. Expressed as the
    decorrelated plan Catalyst itself would produce — per-part aggregate
    broadcast back onto the fact table — so the fact table is scanned
    twice but shuffled zero times on the probe side. The half-average
    predicate is kept in exact integer/decimal arithmetic
    (2*qty*cnt < sum_qty) so the boundary is float-noise-free in both
    engines."""
    l = _t(spark, sf, "lineitem")
    per_part = l.groupBy(F.col("l_partkey").alias("ap_partkey")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("part_sum_qty"),
        F.count(F.lit(1)).alias("part_cnt"),
    )
    return (
        l.join(F.broadcast(per_part), l.l_partkey == per_part.ap_partkey)
        .filter(
            F.col("l_quantity").cast("decimal(18,2)") * F.col("part_cnt") * 2
            < F.col("part_sum_qty")
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


def q_rollup_agg(spark, sf):
    """GROUP BY ROLLUP with grouping_id: hierarchical subtotals in ONE
    pass (Spark expands grouping sets map-side; no per-level rescan)."""
    l = _t(spark, sf, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        M.sum_money("l_quantity").alias("sum_qty"),
    )


def q_cube_agg(spark, sf):
    """GROUP BY CUBE over (event_type, day): all 4 grouping combinations
    in one shuffle."""
    ev = _events(spark, sf)
    return ev.cube(
        F.col("event_type"), F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
    )


def q_bloom_pruned_join(spark, sf):
    """Shuffle join with Catalyst's runtime bloom-filter pruning
    (functions/bloom.py): the filtered orders side builds a bloom
    filter that drops non-matching lineitem rows BEFORE their shuffle.
    False-positive-only, so the result is byte-identical to the plain
    join — which is exactly what the oracle checks. Injection needs the
    build side to look non-broadcastable (Catalyst skips bloom when it
    would broadcast instead) and the probe scan to look expensive, so
    both thresholds are overridden WHILE the plan is compiled
    (freeze_plan) and restored before returning — the session the
    driver hands us is left untouched."""
    from stac_fastapi_duckdb_spark.functions.bloom import (
        enable_runtime_bloom,
        freeze_plan,
        restore_confs,
    )

    prev = enable_runtime_bloom(
        spark, creation_side_max="100MB", application_side_min="0"
    )
    try:
        prev["spark.sql.autoBroadcastJoinThreshold"] = spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        l = _t(spark, sf, "lineitem")
        o = _t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
        return freeze_plan(
            l.join(o, l.l_orderkey == o.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                .cast("double")
                .alias("revenue"),
            )
        )
    finally:
        restore_confs(spark, prev)


def q_scd2_intervals(spark, sf):
    """SCD2 dimension build from the events change log: per-user
    event_type state intervals with consecutive-duplicate suppression
    (operators/cdc.py). One shuffle on user_id; oracle is the classic
    lag-filter + lead SQL."""
    from stac_fastapi_duckdb_spark.operators.cdc import scd2_from_changelog

    return scd2_from_changelog(
        _events(spark, sf),
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_cols=["event_id"],
    )


def q_cdc_apply(spark, sf):
    """Batch MERGE emulation: compact an orders-derived CDC feed
    (latest order per customer wins; finalized orders delete, others
    set the balance) into the customer snapshot (operators/cdc.py)."""
    from stac_fastapi_duckdb_spark.operators.cdc import apply_cdc

    changes = _t(spark, sf, "orders").select(
        F.col("o_custkey").alias("c_custkey"),
        F.when(F.col("o_orderstatus") == "F", "D").otherwise("U").alias("op"),
        F.col("o_totalprice").alias("c_acctbal"),
        "o_orderdate",
        "o_orderkey",
    )
    return apply_cdc(
        _t(spark, sf, "customer"),
        changes,
        key_cols=["c_custkey"],
        op_col="op",
        ts_col="o_orderdate",
        set_cols=["c_acctbal"],
        tiebreak_cols=["o_orderkey"],
    )


def q_set_intersect(spark, sf):
    """INTERSECT (distinct semantics): users who both clicked and
    purchased — Spark plans a LeftSemi over pre-aggregated distincts."""
    ev = _t(spark, sf, "events")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id")
    buys = ev.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


def q_set_except(spark, sf):
    """EXCEPT (distinct semantics): users with views but no high-value
    errors — LeftAnti over distincts. (The error side is value-filtered
    because the synthetic data gives every user every event type.)"""
    ev = _t(spark, sf, "events")
    views = ev.filter(F.col("event_type") == "view").select("user_id")
    errors = ev.filter(
        (F.col("event_type") == "error") & (F.col("value") > 95)
    ).select("user_id")
    return views.subtract(errors)


def q_stats_agg(spark, sf):
    """Statistical moments per group: sample stddev/variance, Pearson
    correlation and covariance — single-pass merge-formula aggregates
    (no two-scan mean-then-moments plan)."""
    l = _t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_discount"), 6).alias("sd_disc"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        # + 0.0 pins IEEE zero sign: a corr/covar in (-5e-7, 0) would
        # round to -0.0 and format differently across engines.
        # corr as try_divide(covar, sd·sd) rather than F.corr: under
        # ANSI mode F.corr THROWS on a zero-variance group where
        # DuckDB's corr returns NULL (differential-fuzz finding); the
        # composition is the same single-pass moments with a
        # NULL-on-zero-denominator division
        (
            F.round(
                F.try_divide(
                    F.covar_samp("l_quantity", "l_extendedprice"),
                    F.stddev_samp("l_quantity")
                    * F.stddev_samp("l_extendedprice"),
                ),
                6,
            )
            + F.lit(0.0)
        ).alias("corr_qp"),
        (F.round(F.covar_samp("l_quantity", "l_extendedprice"), 4) + F.lit(0.0)).alias("cov_qp"),
    )


def q_histogram(spark, sf):
    """Fixed-width histogram binning (floor division on the measure) —
    the scan-side profile op behind data-quality dashboards."""
    l = _t(spark, sf, "lineitem")
    return (
        l.groupBy(
            F.floor(F.col("l_extendedprice") / 5000).cast("bigint").alias("bin")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def q_hash_sample(spark, sf):
    """Deterministic ~10% corpus sample: membership is a pure function
    of md5(doc_id) — reproducible across reruns, partitionings, and
    engines (pipeline/sampling.py; df.sample would be seed- and
    split-dependent)."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import hash_sample

    return hash_sample(
        _t(spark, sf, "documents"), "doc_id", 0.1, salt="corpus-v1"
    ).select("doc_id", "lang")


def q_stratified_sample(spark, sf):
    """Per-stratum deterministic downsampling: keep 50% of en, 20% of
    de, 10% of zh, 5% of everything else — the corpus-reweighting
    primitive (pipeline/sampling.py stratified_hash_sample). Zero
    shuffle: the per-stratum threshold is a literal CASE in the scan's
    residual filter."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import (
        stratified_hash_sample,
    )

    return stratified_hash_sample(
        _t(spark, sf, "documents"),
        "doc_id",
        "lang",
        {"en": 0.5, "de": 0.2, "zh": 0.1},
        default_fraction=0.05,
        salt="corpus-v1",
    ).select("doc_id", "lang")


def q_contamination(spark, sf):
    """Benchmark-contamination screen: corpus docs sharing ≥50% of a
    benchmark item's distinct 3-gram shingles
    (pipeline/contamination.py). The benchmark side (every 23rd doc
    here) is broadcast — the corpus is never shuffled; only matched
    (doc, bench) pairs reach the aggregation."""
    from stac_fastapi_duckdb_spark.pipeline.contamination import (
        contamination_overlap,
    )

    docs = _t(spark, sf, "documents")
    bench = docs.filter(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return contamination_overlap(
        docs, bench, bench_id_col="bench_id", min_ratio=0.5
    )


def q_decontaminate(spark, sf):
    """GPT-3-style benchmark decontamination
    (pipeline/contamination.py decontaminate_spans): every 8-token run
    shared with a benchmark item (every 23rd doc) is cut from the
    corpus text, overlapping hits merged into maximal intervals,
    documents rebuilt. The tiny DISTINCT benchmark fingerprint set is
    broadcast and the corpus window stream joins it map-side (left
    semi) — the corpus is never shuffled to find hits; only matched
    positions enter the interval merge. BOTH precomputed sides serve
    from frozen artifacts: the benchmark fingerprint set
    (_bench_fps_artifact — the precomputed benchmark n-gram file of
    the published procedure, built once per benchmark suite) and the
    corpus window stream (_fp_stream_artifact — the written
    ExactSubstr fingerprint sidecar shared with the span-dedup family;
    round 10 re-measured the live-explode alternative at 1.9 s vs
    1.2 s served at sf0.1, flipping the earlier call — the persisted
    stream is memory-cached now). The rebuild still tokenizes the docs
    (map-only). Oracle replays fingerprints, semi join, islands, and
    the token rebuild from base parquet."""
    from stac_fastapi_duckdb_spark.pipeline.contamination import (
        decontaminate_spans,
    )

    docs = _t(spark, sf, "documents")
    return decontaminate_spans(
        docs,
        None,
        window_tokens=8,
        bench_fps=_bench_fps_artifact(spark, sf),
        fp_stream=_fp_stream_artifact(spark, sf),
    )


def _bench_fps_artifact(spark, sf) -> DataFrame:
    """The DISTINCT benchmark window-fingerprint set (every 23rd doc's
    8-token md5 windows) as a FROZEN artifact — the precomputed
    benchmark n-gram file the GPT-3 decontamination procedure builds
    once per benchmark suite and reuses across every corpus sweep."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import window_fp_stream

    def build():
        docs = _t(spark, sf, "documents")
        bench = docs.filter(F.col("doc_id") % 23 == 0).select(
            F.col("doc_id").alias("bench_id"), "text"
        )
        return (
            window_fp_stream(bench, 8, "text", "bench_id")
            .select("fp")
            .distinct()
        )

    return _artifact_df(spark, "bench_fps", sf, build)


def q_funnel(spark, sf):
    """Ordered view→click→purchase funnel (operators/analytics.py):
    scan-pushed step filter → one per-user shuffle → JVM fold over the
    (ts, event_id)-sorted array — replaces the naive k-way self-join."""
    from stac_fastapi_duckdb_spark.operators.analytics import funnel_counts

    return funnel_counts(_events(spark, sf), ["view", "click", "purchase"])


def q_cohort_retention(spark, sf):
    """Weekly cohort retention triangle (operators/analytics.py):
    cohort = first-activity week; n_users/retention per week offset."""
    from stac_fastapi_duckdb_spark.operators.analytics import (
        cohort_retention,
    )

    return cohort_retention(_events(spark, sf))


def q_boilerplate(spark, sf):
    """Corpus-wide boilerplate profile: per-doc fraction of distinct
    3-gram shingles with document frequency ≥ 5 (pipeline/text.py
    boilerplate_stats) — one shuffle of 8-byte shingle hashes; the DF
    aggregate and the annotating join share that exchange (AQE reuse)."""
    from stac_fastapi_duckdb_spark.pipeline.text import boilerplate_stats

    return boilerplate_stats(_t(spark, sf, "documents"), min_df=5)


def q_tfidf_terms(spark, sf):
    """Per-doc top-5 salient terms by smoothed TF-IDF (pipeline/text.py
    tfidf_top_terms): DF via count-window over the TF aggregate's term
    partitioning (one shuffle, no DF self-join), rounded-score ordering
    for engine-portable ranking."""
    from stac_fastapi_duckdb_spark.pipeline.text import tfidf_top_terms

    return tfidf_top_terms(_t(spark, sf, "documents"), k=5)


def q_bm25_search(spark, sf):
    """Okapi BM25 lexical retrieval for a fixed query bag, served from
    the frozen inverted-index artifact (_bm25_artifact): term-filter
    the posting lists, idf from the literal lexicon map, one
    partial-agged per-doc sum + TakeOrderedAndProject top-k — a single
    exchange, no re-tokenization, bit-identical to the one-shot
    ``bm25_search`` (unit-tested; the oracle replays the one-shot
    formulation)."""
    from stac_fastapi_duckdb_spark.pipeline.text import bm25_search_indexed

    idx = _bm25_artifact(spark, sf)
    return bm25_search_indexed(
        idx["tf"],
        ["join", "scan", "filter"],
        idx["n"],
        idx["avgdl"],
        k=10,
        lexicon=idx["lex"],
    )


def q_incremental_dedup(spark, sf):
    """New-batch-vs-standing-corpus dedup (pipeline/dedup.py
    incremental_near_dup): banded minhash joined new→base only — no
    base×base pair expansion; every 5th doc plays the arriving batch.

    The oracle is EXHAUSTIVE exact Jaccard while the engine is
    LSH-candidate-limited, so the contract run closes the probabilistic
    gap the same way ``minhash_near_dup`` does: 32 bands of 2 hashes →
    per-pair miss probability at j≥0.8 is (1-0.8²)³² ≈ 3e-15, corpus-
    independent; and the base-bucket skew cap (a production guard that
    DROPS oversized boilerplate buckets, i.e. deliberately trades recall
    for bounded shuffle) is lifted here so a regenerated corpus with a
    heavy band cannot silently diverge from the exhaustive oracle. The
    capped default path is pkg-tested in tests/test_dedup.py."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import incremental_near_dup

    d = _t(spark, sf, "documents")
    return incremental_near_dup(
        d.filter(F.col("doc_id") % 5 == 0),
        d.filter(F.col("doc_id") % 5 != 0),
        bands=32,
        max_bucket_size=1_000_000,
    )


def q_chunk_documents(spark, sf):
    """Overlapping fixed-token chunking for embedding/pretraining
    windows (pipeline/text.py chunk_documents): pure per-row JVM array
    expansion, map-only — no shuffle at any corpus size."""
    from stac_fastapi_duckdb_spark.pipeline.text import chunk_documents

    return chunk_documents(
        _t(spark, sf, "documents"), chunk_tokens=32, overlap=8
    )


def q_dataset_split(spark, sf):
    """Hash-stable train/val/test split (80/10/10) + per-split stats —
    a doc never changes split when the corpus grows."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import dataset_split

    d = dataset_split(
        _t(spark, sf, "documents"),
        "doc_id",
        {"train": 0.8, "val": 0.1, "test": 0.1},
        salt="corpus-v1",
    )
    return d.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


def q_sequence_packing(spark, sf):
    """Greedy contiguous sequence packing per language (~2048-token
    packs; token estimate n_chars/4): running-total DIV budget, then
    per-pack stats (pipeline/sampling.py)."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import pack_sequences

    docs = _t(spark, sf, "documents").withColumn(
        "n_tokens", F.expr("n_chars DIV 4 + 1").cast("bigint")
    )
    packed = pack_sequences(docs, "lang", "doc_id", "n_tokens", budget=2048)
    return packed.groupBy("lang", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("pack_tokens"),
    )


def q_corpus_mixture(spark, sf):
    """Weighted deterministic corpus mixing: per-language sources
    sampled at different rates, unioned with a source tag, counted
    (pipeline/sampling.py corpus_mixture)."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import corpus_mixture

    docs = _t(spark, sf, "documents")
    sources = [
        ("en-full", docs.filter(F.col("lang") == "en"), 1.0),
        ("de-half", docs.filter(F.col("lang") == "de"), 0.5),
        ("fr-tenth", docs.filter(F.col("lang") == "fr"), 0.1),
    ]
    mix = corpus_mixture(sources, "doc_id", salt="mix-v1")
    return mix.groupBy("source_name").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


def q_label_balance(spark, sf):
    """Class-balance report: per-language doc counts and corpus
    fraction (windowed total over the tiny aggregate)."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import label_balance

    return label_balance(_t(spark, sf, "documents"), "lang")


def q_json_extract(spark, sf):
    """Schema-on-read JSON extraction (get_json_object, JVM-side) over
    the events.props payload column, aggregated per type — the
    semi-structured-ingest operator class (Kafka payloads, logs).
    The extraction is PROJECTED once before the aggregate: referencing
    the expression in four agg columns would otherwise parse the JSON
    payload four times per row (no cross-aggregate CSE)."""
    ev = _t(spark, sf, "events")
    kv = ev.select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    k = F.col("k")
    return kv.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.when(k > 50, 1)).alias("n_high"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


def q_grouping_sets(spark, sf):
    """Explicit GROUPING SETS ((flag),(status)) — two independent
    aggregation keyings in one Expand pass (DataFrame.groupingSets,
    Spark 4.0+)."""
    l = _t(spark, sf, "lineitem")
    return l.groupingSets(
        [[F.col("l_returnflag")], [F.col("l_linestatus")]],
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    ).agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )


def q_percentile_agg(spark, sf):
    """Exact interpolated percentiles per group (SortAggregate path —
    unlike approx_percentile there's no sketch error to reconcile with
    the oracle; both engines interpolate linearly)."""
    l = _t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", 0.5), 6).alias("p50_qty"),
        F.round(F.percentile("l_extendedprice", 0.25), 6).alias("p25_price"),
        F.round(F.percentile("l_extendedprice", 0.75), 6).alias("p75_price"),
    )


def q_rolling_window(spark, sf):
    """Per-user rolling 2-hour sum (RANGE frame over event-time
    seconds): the frame is time-based, so ties and gaps are handled
    identically in both engines; one shuffle on user_id."""
    from pyspark.sql import Window

    ev = _events(spark, sf)
    sec = F.unix_timestamp("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-7200, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("roll_sum"),
    )


def q_first_last_window(spark, sf):
    """first_value/last_value over an unbounded ordered frame with an
    event_id tiebreak (deterministic under timestamp ties), collapsed
    to one row per user."""
    from pyspark.sql import Window

    ev = _events(spark, sf)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.select(
            "user_id",
            F.first("event_type").over(w).alias("first_type"),
            F.last("event_type").over(w).alias("last_type"),
        )
        .distinct()
    )


def q_distinct_count(spark, sf):
    """Exact COUNT(DISTINCT) per group — Spark plans a two-stage expand
    + partial aggregate, no driver-side collection."""
    l = _t(spark, sf, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n"),
    )


def q_repetition_stats(spark, sf):
    """Gopher-style within-document repetition metrics (dup-word frac,
    top-bigram frac, dup-trigram frac) — the 'repetition removal'
    quality family. Pure higher-order-function Column algebra: map-only,
    fuses with the scan, zero shuffles."""
    return P_text.repetition_stats(_t(spark, sf, "documents"))


def _pii_documents(spark, sf):
    """Documents with deterministically injected PII (the corpus text is
    synthetic word soup with no real PII, so a meaningful value-level
    oracle needs known positives; the IDENTICAL injection expression
    runs on the DuckDB side)."""
    d = _t(spark, sf, "documents")
    id_s = F.col("doc_id").cast("string")
    synth = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        id_s,
        F.lit("@example.com"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" cc admin"), id_s, F.lit("@mail.test")),
        ).otherwise(F.lit("")),
        F.lit(" or +1-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".0.7"),
            ),
        ).otherwise(F.lit("")),
    )
    return d.select("doc_id", synth.alias("text"))


def q_pii_scrub(spark, sf):
    """PII audit + redaction over PII-injected documents: per-class
    match counts and the redacted-text fingerprint. RE2-compatible
    patterns so the DuckDB oracle runs the LITERAL same regexes."""
    out = P_text.pii_scrub(_pii_documents(spark, sf))
    return out.select(
        "doc_id",
        "n_emails",
        "n_ips",
        "n_phones",
        F.md5("redacted").alias("redacted_fp"),
    )


def q_url_normalize(spark, sf):
    """URL canonicalization (crawl-pipeline keying): scheme/host
    lowercased, default port + www. stripped, fragment dropped,
    tracking params removed + rest sorted, trailing slash collapsed.
    Spark-side uses the built-in parse_url decomposition; the oracle
    restates the same semantics with regexps."""
    from stac_fastapi_duckdb_spark.functions.urls import normalize_urls

    d = _t(spark, sf, "documents")
    id_s = F.col("doc_id").cast("string")
    raw = F.concat(
        F.lit("HTTPS://WWW."),
        F.col("source"),
        F.lit(".Example.COM"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/Docs/"),
        id_s,
        F.when(F.col("doc_id") % 2 == 0, F.lit("/")).otherwise(F.lit("")),
        F.lit("?utm_source=x&ref="),
        F.col("lang"),
        F.lit("&b=2&a=1#frag"),
    )
    return normalize_urls(d.select("doc_id", raw.alias("url")))


def q_stream_stream_join(spark, sf):
    """Watermarked stream-stream interval join (view→purchase
    attribution within 30 min per user): two file-source streams, both
    watermarked, inner-joined on user + bounded event-time range, run
    to completion with AvailableNow. State expires with the watermark —
    O(interval window), not O(stream). The batch form of the SAME
    builder is the oracle (restated in DuckDB SQL)."""
    from stac_fastapi_duckdb_spark.streaming import joins as SJ

    views = P_stream.read_events_stream(spark, f"{sf}/events.parquet")
    purchases = P_stream.read_events_stream(spark, f"{sf}/events.parquet")
    (v,) = SJ.split_by_type(views, "view")
    (p,) = SJ.split_by_type(purchases, "purchase")
    joined = SJ.view_purchase_pairs(v, p, within="30 minutes")
    return P_stream.run_to_memory(joined, spark, output_mode="append")


def _bm25_artifact(spark, sf) -> dict:
    """The BM25 inverted index as a FROZEN artifact: the full
    per-(doc, term) TF table (one partial-agged shuffle) persisted +
    the two corpus constants, built once per session/SF — the offline
    index build every lexical search engine runs (at 100 TB:
    ``bm25_tf_index`` written bucketed by term). Serving queries then
    plan one filtered in-memory scan instead of re-tokenizing the
    corpus per request. Same deployment shape as ``_lm_artifact`` /
    ``_hashed_vecs``."""
    from stac_fastapi_duckdb_spark.pipeline.text import (
        bm25_corpus_stats,
        bm25_tf_index,
    )
    from stac_fastapi_duckdb_spark.sources import sidecar as _sc

    def build():
        fp = _sc.source_fingerprint(f"{sf}/documents.parquet")
        tag = _sc.dataset_tag(sf)
        meta = _sc.load_meta("bm25_tf", tag, fp)
        # the lexicon is a SEPARATE sidecar slot: validate its own
        # fingerprint too — a missing lexicon, or one committed by a
        # racing builder against a different corpus while bm25_tf still
        # matches, must rebuild the WHOLE artifact rather than raise
        # FileNotFoundError or serve a lexicon inconsistent with the
        # postings/stats it keys.
        if meta is not None and _sc.load_meta("bm25_lexicon", tag, fp) is None:
            meta = None
        if meta is None:
            docs = _t(spark, sf, "documents")
            n_docs, avgdl = bm25_corpus_stats(docs)
            raw = bm25_tf_index(docs).persist()
            # the index DICTIONARY (term → document frequency) — what a
            # search engine's lexicon holds — written as its own tiny
            # sidecar table next to the postings
            lex_df = raw.groupBy("term").agg(
                F.count(F.lit(1)).cast("long").alias("df")
            )
            _sc.write_sidecar(lex_df, "bm25_lexicon", tag, fp, partitions=1)
            # the index's ON-DISK form: globally term-sorted posting
            # lists in small row groups, so a serving probe's term
            # filter prunes on row-group stats and reads only the query
            # terms' postings — written ONCE PER INGEST
            # (sources/sidecar.py), then every session serves from it.
            # bm25_probe_local reads THIS file driver-side.
            _sc.write_sidecar(
                raw,
                "bm25_tf",
                tag,
                fp,
                extra={"n_docs": n_docs, "avgdl": avgdl},
                partitions=1,
                sort_cols=("term", "doc_id"),
                block_size=1 << 20,
            )
            raw.unpersist()
            meta = {"n_docs": n_docs, "avgdl": avgdl}
        disk = _sc.data_path("bm25_tf", tag)
        # in-memory serving form: co-locate + sort each term's rows so
        # cached batches carry tight term min/max stats and a query's
        # term filter SKIPS every non-matching batch (the in-memory
        # equivalent of reading only the query terms' posting lists)
        tf = (
            spark.read.parquet(disk)
            .repartition(32, "term")
            .sortWithinPartitions("term")
            .persist()
        )
        tf.count()
        # lexicon reload is a driver-side pyarrow read of the tiny
        # (term, df) table — zero Spark jobs on a warm artifact
        import pyarrow.dataset as _pads

        lex_tbl = _pads.dataset(
            _sc.data_path("bm25_lexicon", tag)
        ).to_table()
        lex = dict(
            zip(
                lex_tbl.column("term").to_pylist(),
                lex_tbl.column("df").to_pylist(),
            )
        )
        return {
            "tf": tf,
            "n": int(meta["n_docs"]),
            "avgdl": float(meta["avgdl"]),
            "lex": lex,
            "path": disk,
        }

    return _session_artifact(spark, ("bm25_index", sf), build)


def q_hybrid_search(spark, sf):
    """Hybrid lexical+dense retrieval served at the SERVING TIER: the
    BM25 probe reads the query terms' posting lists from the WRITTEN
    term-sorted index (a bounded driver read sized by term document
    frequency), candidate vectors arrive via a bounded pyarrow point
    fetch (the vector-store lookup), and the float64 rerank replays
    the distributed Column algebra — zero Spark jobs on the query
    path; the Spark jobs are the index build + corpus stats, once per
    corpus (_bm25_artifact). Any serving failure degrades to the
    distributed retrieve-then-rerank plan (path equivalence pinned in
    tests/test_text.py); the oracle replays the one-shot
    formulation."""
    from stac_fastapi_duckdb_spark.pipeline.text import hybrid_search

    idx = _bm25_artifact(spark, sf)
    return hybrid_search(
        None,
        _t(spark, sf, "embeddings"),
        ["join", "scan", "filter"],
        probe_id=0,
        k=10,
        n_candidates=50,
        tf_index=idx["tf"],
        corpus_stats=(idx["n"], idx["avgdl"]),
        probe_vec=_probe_embedding(sf, 0),
        lexicon=idx["lex"],
        tf_index_path=idx["path"],
        embeddings_path=f"{sf}/embeddings.parquet",
    )


def q_stream_enrich(spark, sf):
    """Stream-static broadcast enrichment + watermarked rollup: the
    events stream joined to the static customer dim (broadcast,
    stateless, stream never shuffled pre-window), then hourly value per
    market segment. Oracle is the batch join+rollup restated in SQL."""
    from stac_fastapi_duckdb_spark.streaming import joins as SJ

    ev = P_stream.read_events_stream(spark, f"{sf}/events.parquet")
    dim = _t(spark, sf, "customer")
    out = SJ.enriched_hourly_value(
        ev, dim, ("user_id", "c_custkey"), "c_mktsegment"
    )
    return P_stream.run_to_memory(out, spark)


def q_embedding_outliers(spark, sf):
    """Embedding QC: distance-to-label-centroid z-score outliers.
    Centroids via posexplode + (label, dim) partial agg (map-side
    combine → labels×dim cells per partition), broadcast back; the
    distance pass is a map-only JVM fold; per-label stats via window."""
    return P_sim.embedding_outliers(_t(spark, sf, "embeddings"))


def q_left_outer_join(spark, sf):
    """LEFT OUTER join with null-side accounting: every event row kept,
    decorated with its customer segment where one exists (events.user_id
    0 has no customer — c_custkey starts at 1 — so the null branch is
    real). The small dim side broadcasts; unmatched rows surface as an
    explicit 'unmatched' bucket instead of silently dropping."""
    ev = _events(spark, sf)
    c = _t(spark, sf, "customer").select("c_custkey", "c_mktsegment")
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey, "left")
        .groupBy(
            F.coalesce(F.col("c_mktsegment"), F.lit("unmatched")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_gap_fill(spark, sf):
    """Hourly gap filling with LOCF per user (hypertable
    time_bucket_gapfill + locf shape): keyed rollup, per-key hourly
    spine via sequence-explode (no global-calendar cross join), running
    last(ignorenulls) fill."""
    from stac_fastapi_duckdb_spark.operators.analytics import gap_fill_hourly

    return gap_fill_hourly(_events(spark, sf))


def q_curation_pipeline(spark, sf):
    """The fused corpus-curation chain (lang gate → length gate →
    repetition gates → PII gate → exact dedup) composed as ONE scan:
    every score is a Column in a staged projection; only survivors
    reach the single fingerprint-keyed dedup shuffle. Thresholds here
    are tuned to bite on the synthetic corpus (each gate drops rows)."""
    from stac_fastapi_duckdb_spark.pipeline.text import curate_documents

    return curate_documents(
        _t(spark, sf, "documents"),
        lang="en",
        min_tokens=30,
        max_dup_word_frac=0.6,
        max_top_bigram_frac=0.05,
    )


def q_semdedup(spark, sf):
    """SemDeDup (Abbas et al. 2023): cluster embeddings with the FROZEN
    IVF centroid artifact, drop any vector cosine-≥0.95 similar to a
    lower-id cluster-mate (lowest such mate is the deterministic
    witness). Planted dups: the table unioned with an id-shifted copy —
    identical vectors land in the same cluster by construction. Cell
    assignments serve from the persisted ANN index table
    (_ivfpq_indexed — the identical with_ivf_cell derivation), so the
    per-query pandas assignment never re-runs: the query is one
    cluster shuffle + the per-cluster GEMM kernel. The oracle replays
    cluster assignment from the same centroid literals (row_number
    over exact L2, as ann_ivf_topk does) and the same witness
    reduction."""
    import numpy as np

    from stac_fastapi_duckdb_spark.plans.ivf_index import IVF_CENTROIDS

    idx = _ivfpq_indexed(spark, sf).select(
        "vec_id", "embedding", F.col("ivf_cell").alias("sem_cluster")
    )
    # offset far beyond any SF's id range: a colliding shift would make
    # planted ids ambiguous (vec_id+1000 overlaps the real 0..4999 range
    # at sf0.1) and the per-drop-id witness reduction ill-defined
    shifted = idx.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        "embedding",
        "sem_cluster",
    )
    return P_sim.semdedup(
        idx.unionByName(shifted),
        np.asarray(IVF_CENTROIDS, dtype=np.float64),
        threshold=0.95,
    )


def _fp_stream_artifact(spark, sf) -> DataFrame:
    """The 8-token md5 window-fingerprint stream over the corpus
    (``window_fp_stream``: doc_id, pos, fp) as a FROZEN artifact —
    the written fingerprint sidecar of the ExactSubstr/decontamination
    family: the stride-1 explode (the dominant cost at 100 TB, per the
    operator docstring) runs once per ingest, and every span-level
    consumer (duplication verdicts, benchmark probes) reads the slim
    (ids + 16-hex) table instead of re-exploding the text."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import window_fp_stream

    def build():
        return window_fp_stream(
            _t(spark, sf, "documents").select("doc_id", "text"), 8
        )

    return _artifact_df(spark, "fp_stream", sf, build)


def _doubled_fp_annotated_artifact(spark, sf) -> DataFrame:
    """The duplication VERDICT sidecar for the planted-duplication
    corpus (docs ∪ id-shifted copy): per-fingerprint distinct-doc
    count + owner over the doubled stream (``window_fp_annotated``),
    one fp window shuffle at build, persisted. The doubled stream is
    derived from the frozen corpus stream by a map-only id shift —
    identical text ⇒ identical windows — so not even the explode
    re-runs at build."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import window_fp_annotated

    def build():
        s = _fp_stream_artifact(spark, sf)
        doubled = s.unionByName(
            s.withColumn("doc_id", F.col("doc_id") + 10000)
        )
        return window_fp_annotated(doubled)

    return _artifact_df(spark, "doubled_fp_annotated", sf, build)


def q_duplicate_spans(spark, sf):
    """Cross-document duplicated-substring spans (Lee et al. 2022 exact
    substring dedup, restated at 8-token window granularity): md5
    window fingerprints, cross-doc duplication via ONE count-distinct
    window shuffle on the fingerprint, maximal-span merging by
    gaps-and-islands. Planted duplication: corpus unioned with an
    id-shifted copy, so every ≥8-token document carries at least one
    full-length duplicated span; organic cross-doc repeats merge into
    the same span set. Serves from the frozen duplication-verdict
    sidecar (_doubled_fp_annotated_artifact), so the query pays only
    the islands pass over duplicated positions. Fully deterministic
    (md5 — engine-neutral), so the oracle replays it span for span."""
    return P_dedup.duplicate_spans(
        None,
        window_tokens=8,
        annotated=_doubled_fp_annotated_artifact(spark, sf),
    )


def q_containment_dedup(spark, sf):
    """Asymmetric (doc-inside-doc) near-dup: anchor-window blocking +
    exact shingle CONTAINMENT ≥ 0.9 — the pair class Jaccard-tuned
    minhash is structurally blind to. Planted containment: each doc's
    first-half token prefix re-enters the corpus as a new doc
    (containment 1.0 against its parent, Jaccard only ~0.5). The
    anchor-window candidate generator is deterministic (shared md5
    8-token window ⇒ candidate — no hash-family miss probability), so
    the oracle replays blocking AND verification exactly."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import tokens_col

    docs = _t(spark, sf, "documents").select("doc_id", "text")
    toks = tokens_col(F.col("text"))
    half = docs.select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.slice(
                toks,
                1,
                F.greatest(
                    F.floor(F.size(toks) / 2).cast("int"), F.lit(1)
                ),
            ),
        ).alias("text"),
    )
    corpus = docs.unionByName(half)
    cand = P_dedup.anchor_window_candidates(
        corpus, window_tokens=8, max_bucket_size=1000
    )
    return P_dedup.shingle_containment_pairs(
        corpus, cand, threshold=0.9
    )


def q_quality_classifier(spark, sf):
    """Model-based quality filter in pure Column algebra: frozen
    hashed-feature linear scorer (plans/qc_index.py — the serving form
    of a fastText-style corpus-quality classifier), one map-only scan.
    The oracle recomputes the identical md5-bucket lookups and fold
    from the same weight literals."""
    return P_text.quality_classifier(_t(spark, sf, "documents"))


def q_dataset_fingerprint(spark, sf):
    """Order-invariant per-column corpus checksum (pipeline/validate):
    count / null-count / xor-hash / modular-sum-hash of md5-derived row
    hashes — the one-scan integrity check two copies of a 100 TB corpus
    can actually afford. Restricted here to int/string columns (float
    canonical formatting is engine-specific — documented in the
    operator)."""
    from stac_fastapi_duckdb_spark.pipeline.validate import dataset_fingerprint

    return dataset_fingerprint(
        _t(spark, sf, "documents"), ["doc_id", "text", "lang", "source", "n_chars"]
    )


def q_distribution_drift(spark, sf):
    """PSI drift between two corpus snapshots (odd/even doc ids) over
    the n_chars distribution: fixed-width bins, one partial-agg scan
    per side, #bins-sized full-outer join. The oracle replays the same
    bins, totals, and ε-smoothed log terms."""
    from stac_fastapi_duckdb_spark.pipeline.validate import distribution_drift

    d = _t(spark, sf, "documents")
    return distribution_drift(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        "n_chars",
        100.0,
    )


def q_remove_duplicate_spans(spark, sf):
    """Keep-one substring dedup: rebuild every document with its
    cross-document duplicated 8-token runs removed, except in the
    lowest-id owner of each run (pipeline.dedup.remove_duplicate_spans
    — the cleaning consumer of duplicate_spans). Planted duplication
    via the id-shifted copy: every copy is fully cleaned, every
    original keeps its text. The oracle replays ownership, interval
    merge, and the token-level rebuild exactly."""
    docs = _t(spark, sf, "documents").select("doc_id", "text")
    shifted = docs.select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    return P_dedup.remove_duplicate_spans(
        docs.unionByName(shifted),
        window_tokens=8,
        annotated=_doubled_fp_annotated_artifact(spark, sf),
    )


def q_profile_table(spark, sf):
    """Per-column data profile (count / nulls / exact distinct /
    lexicographic min-max of the canonical string) in ONE Expand-based
    aggregate pass — the data-quality quick look."""
    from stac_fastapi_duckdb_spark.pipeline.validate import profile_table

    return profile_table(
        _t(spark, sf, "documents"), ["doc_id", "text", "lang", "source", "n_chars"]
    )


def q_cluster_representatives(spark, sf):
    """Keep-best dedup: transitive minhash cluster map ⋈ frozen quality
    scores → highest-scoring member represents each cluster (id-asc
    tiebreak). bands=32 closes the LSH-vs-exhaustive-oracle gap the
    same way minhash_dedup_map does."""
    return P_dedup.cluster_representatives(
        _t(spark, sf, "documents"), bands=32
    )


def q_split_leakage(spark, sf):
    """Cross-split near-dup leakage audit: hash split (same rule as
    dataset_split) + deterministic anchor-window blocking + exact
    Jaccard, keeping pairs that straddle the split boundary. Every
    stage is deterministic, so the oracle replays it end to end."""
    from stac_fastapi_duckdb_spark.pipeline.contamination import split_leakage

    return split_leakage(_t(spark, sf, "documents"))


def q_shuffle_shards(spark, sf):
    """Deterministic global training shuffle: seeded md5 hash → shard +
    within-shard position; one uniform shuffle, no global sort. The
    oracle recomputes the identical permutation."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import shuffle_shards

    return shuffle_shards(
        _t(spark, sf, "documents").select("doc_id"), num_shards=8
    )


def _lm_artifact(spark, sf) -> dict:
    """The trained unigram LM as a FROZEN artifact: trained once per
    session/SF (one token-count shuffle + TakeOrdered cut), its ≤301
    (token, logprob) rows held in BOTH serving forms — a local literal
    table (for DataFrame-LM consumers like dsir) and the driver-side
    ``vocab`` dict + ``oov`` scalar that ``perplexity_score_lit``
    embeds as a literal map, making every scoring pass MAP-ONLY (no
    broadcast build, no explode shuffle). Exactly the deployment shape
    train_unigram_lm documents (CCNet LMs are pretrained artifacts)."""
    from stac_fastapi_duckdb_spark.pipeline.text import train_unigram_lm
    from stac_fastapi_duckdb_spark.sources import sidecar as _sc

    def build():
        # the trained LM is a ≤301-row (token, logprob) table — written
        # once per ingest (sources/sidecar.py), reloaded driver-side in
        # one tiny read by any later session
        fp = _sc.source_fingerprint(f"{sf}/documents.parquet")
        tag = _sc.dataset_tag(sf)
        df = _sc.load_sidecar(spark, "unigram_lm", tag, fp)
        if df is None:
            lm = train_unigram_lm(_t(spark, sf, "documents"), vocab_size=300)
            _sc.write_sidecar(lm, "unigram_lm", tag, fp, partitions=1)
            df = spark.read.parquet(_sc.data_path("unigram_lm", tag))
        rows = df.collect()
        return {
            "df": df,
            "vocab": {
                r["token"]: r["logprob"] for r in rows if r["token"] is not None
            },
            "oov": next(
                r["logprob"] for r in rows if r["token"] is None
            ),
        }

    return _session_artifact(spark, ("unigram_lm", sf), build)


def q_lm_perplexity(spark, sf):
    """CCNet-style unigram-LM perplexity filter: score every doc
    against the frozen top-300 add-one-smoothed LM artifact
    (_lm_artifact — trained once per session) by mean negative
    log-prob. The LM embeds as a literal map, so the scoring pass is a
    MAP-ONLY per-doc fold over the token array — one scan, zero
    shuffles/broadcasts (bit-identical to the exploded broadcast-join
    form; see perplexity_score_lit). The oracle replays the identical
    smoothing closed form in SQL."""
    from stac_fastapi_duckdb_spark.pipeline.text import perplexity_score_lit

    docs = _t(spark, sf, "documents")
    lm = _lm_artifact(spark, sf)
    return perplexity_score_lit(docs, lm["vocab"], lm["oov"]).select(
        "doc_id", "n_tokens", F.round("avg_nll", 6).alias("avg_nll")
    )


def _ngram_counts_artifact(spark, sf, n=2) -> DataFrame:
    """The corpus (gram, cnt) frequency table as a FROZEN artifact —
    the vocabulary/phrase statistics table every curation pipeline
    materializes once at ingest (boilerplate mining, contamination
    fingerprints, stop-phrase lists all read it). The explode + count
    shuffle runs once per session/SF; consumers pay only their own
    rank/filter. At 100 TB this is a written aggregate table refreshed
    per ingest batch, not recomputed per query."""
    from stac_fastapi_duckdb_spark.pipeline.text import corpus_ngrams

    def build():
        return corpus_ngrams(_t(spark, sf, "documents"), n=n)

    return _artifact_df(spark, f"ngram_counts_{n}", sf, build)


def q_top_bigrams(spark, sf):
    """Corpus bigram heavy hitters (boilerplate / stop-phrase mining):
    served from the frozen corpus frequency table
    (_ngram_counts_artifact — the explode + count shuffle runs once
    per session, the production ingest-time aggregate); the query is
    the deterministic (cnt DESC, gram ASC) top-100 over the cached
    aggregate, compiled to TakeOrderedAndProject."""
    return (
        _ngram_counts_artifact(spark, sf, n=2)
        .orderBy(F.col("cnt").desc(), F.col("gram"))
        .limit(100)
    )


def q_kmeans_round(spark, sf):
    """One distributed Lloyd round, declaratively: deterministic init
    (the k=8 vectors with vec_id < 8 — SQL-replayable), broadcast
    nearest-centroid assignment (vectorized pandas UDF), then the
    centroid update as a posexplode (cell, pos) partial aggregate —
    the same k×dim-bounded shuffle ``pipeline.similarity.lloyd_round``
    uses. Output: per-(cell, dim) member count + updated mean."""
    import numpy as np

    emb = _t(spark, sf, "embeddings")
    cent_rows = emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    centroids = np.array([r["embedding"] for r in cent_rows], dtype=np.float64)
    assigned = P_sim.kmeans_assign(emb, centroids, out_col="cell")
    return (
        assigned.select(
            "cell",
            F.posexplode(F.col("embedding").cast("array<double>")).alias(
                "pos", "val"
            ),
        )
        .groupBy("cell", "pos")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("val"), 6).alias("m"),
        )
        .select(
            F.col("cell").cast("bigint").alias("cell"),
            F.col("pos").cast("bigint").alias("pos"),
            "n",
            "m",
        )
    )


def q_global_row_ids(spark, sf):
    """Contiguous 0-based global row IDs in (n_chars, doc_id) order
    WITHOUT the single-reducer global sort (pipeline/ids.py): quantile
    range-buckets on the leading key, per-bucket counts → broadcast
    cumulative offsets, then row_number partitioned BY BUCKET — one
    data shuffle, parallel across 256 buckets. The oracle is the
    plain ROW_NUMBER total order the construction reproduces."""
    from stac_fastapi_duckdb_spark.pipeline.ids import assign_row_ids

    d = _t(spark, sf, "documents").select("doc_id", "n_chars")
    return assign_row_ids(d, ["n_chars", "doc_id"]).select(
        "doc_id", "n_chars", "row_id"
    )


def q_kmv_distinct(spark, sf):
    """Per-language approximate distinct-text count via a KMV
    k-minimum-values sketch (pipeline/sketch.py): md5-low-60-bit
    hashes, TWO-LEVEL k-min aggregation (salted cells bound every agg
    state to ~distinct/64 hashes; the merge level to 64·64 longs per
    group — the same merge that rolls up per-shard sketches), then the
    (k-1)/U_(k) estimator. Unlike HLL++ the sketch is an open
    deterministic function of the value set, so DuckDB replays the
    identical k smallest hashes and the ESTIMATE value-matches."""
    from stac_fastapi_duckdb_spark.pipeline.sketch import kmv_distinct

    return kmv_distinct(_t(spark, sf, "documents"), "lang", "text")


def q_hll_distinct(spark, sf):
    """Per-event-type approximate distinct users via an open
    HyperLogLog (pipeline/sketch.py hll_sketch/hll_estimate, Flajolet
    et al. 2007): md5-derived 60-bit hash → register = low 9 bits,
    rank = leading zeros of the remaining 51-bit word via exact
    integer bit-length (no floating log2). The register table is ONE
    partially-aggregated shuffle bounded by groups·512 cells whatever
    the input size, and the harmonic mean is computed as an exact
    int64 sum (Σ 2^(52-M_j)), so the estimate — raw branch AND the
    m·ln(m/V) linear-counting branch — replays bit-for-bit in DuckDB.
    The artifact (512 small ints per group) merges by element-wise max
    (hll_merge), the roll-up shape per-day/per-shard sketches need at
    100 TB."""
    from stac_fastapi_duckdb_spark.pipeline.sketch import hll_distinct

    return hll_distinct(_t(spark, sf, "events"), "event_type", "user_id", p=9)


def q_kmv_overlap(spark, sf):
    """Audience overlap (theta-sketch intersection over KMV sketches,
    pipeline/sketch.py kmv_overlap): distinct click-users vs distinct
    purchase-users from two k=64 KMV sketches — θ = min of the two
    k-th minimum hashes, every retained hash below θ is a uniform
    sample with inclusion probability θ/2^60, so |A∩B| ≈
    n_inter·2^60/θ. θ and the retain comparisons stay in exact int64
    (hashes overflow a double's mantissa); the only float ops are the
    final scale division and the Jaccard ratio, which the DuckDB
    oracle replays bit-for-bit. Each side is the bounded two-level KMV
    aggregation; the combine is a 1-row × 1-row join."""
    from stac_fastapi_duckdb_spark.pipeline.sketch import kmv_overlap

    ev = _t(spark, sf, "events")
    return kmv_overlap(
        ev.filter(F.col("event_type") == "click").select("user_id"),
        ev.filter(F.col("event_type") == "purchase").select("user_id"),
        "user_id",
        k=64,
    )


def q_weighted_sample(spark, sf):
    """Weighted k-per-group sample without replacement via the
    Efraimidis–Spirakis exponential race (pipeline/sampling.py):
    u = md5-content-hash → race key Exp(weight); 20 longest docs win
    per language — reproducible across reruns/partitionings/engines
    because u is a hash, not a seed stream. One shuffle on the group;
    the oracle replays the identical race."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import weighted_sample

    d = _t(spark, sf, "documents")
    return weighted_sample(
        d, "n_chars", k=20, group_col="lang"
    ).select("lang", "doc_id", "n_chars", F.round("race_key", 6).alias("race_key"))


def q_sampled_quantiles(spark, sf):
    """Exact interpolated quantiles over a deterministic 10% hash
    sample (pipeline/sampling.py sampled_quantiles): the sample filter
    is pure per-row Column algebra that pushes into the scan, then
    exact percentiles on the kept rows — the scalable quantile path
    whose sample (and therefore answer) any engine can replay, unlike
    an approx sketch's private registers."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import sampled_quantiles

    return sampled_quantiles(
        _t(spark, sf, "events"),
        "value",
        [0.5, 0.9, 0.99],
        fraction=0.1,
        key_col="event_id",
        group_col="event_type",
    )


def q_edit_distance_pairs(spark, sf):
    """Typo-level near-identical pairs (pipeline/dedup.py
    edit_distance_pairs): token-level deletion-neighborhood blocking
    (SymSpell/FastSS construction — deterministic, no hash-family miss
    probability) + exact character Levenshtein verification on the
    candidates only. The cap is lifted here (same convention as
    incremental_dedup) so the exhaustive-on-candidates oracle replays
    the identical blocking and distance. STAR pair mode (round 8):
    each doc verifies only against its signature bucket's minimum-id
    member, so output AND Levenshtein cost stay LINEAR in corpus size
    — the all-pairs form emits C(m,2) rows per m-clone cluster, the
    one super-linear-with-scale behavior the engine had (≈230 s/engine
    at sf1 on the planted 10-clone clusters). The surviving rows are
    the member→canonical keep/drop map a dedup pass applies; the
    oracle replays the identical star construction.

    Round 10: the VERIFIED PAIR SET itself is the served artifact
    (_edit_pairs_artifact) — it is exactly as corpus-constant as the
    blocking signatures it derives from, so the bucket join + banded
    Levenshtein verify run once per ingest (inside the artifact build,
    which still serves the signature sidecar) and the query serves the
    written (id_a, id_b, dist) table. The oracle recomputes the whole
    pipeline from base parquet every run."""
    return _edit_pairs_artifact(spark, sf)


def _ensure_edit_families(spark, sf) -> None:
    """ONE-PASS cold build of the near-identical artifact group
    (``deletion_sigs``, ``edit_pairs``): the pair verify consumes the
    signature stream the blocking build just computed, so the ingest
    job persists the signatures in memory and writes BOTH sidecars off
    that one derivation — instead of two sequential `_artifact_df`
    builds with a write → read-back → persist → count round trip in
    between (the round-10 cold table's 5.8× row). Stale-only rebuild,
    same layouts, same serve path as before."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import (
        deletion_signatures,
        edit_distance_pairs,
    )
    from stac_fastapi_duckdb_spark.sources import sidecar as _sc

    fp = _sc.source_fingerprint(f"{sf}/documents.parquet")
    tag = _sc.dataset_tag(sf)
    stale = [
        f
        for f in ("deletion_sigs", "edit_pairs")
        if _sc.load_meta(f, tag, fp) is None
    ]
    if not stale:
        return
    sigs = (
        _sc.load_sidecar(spark, "deletion_sigs", tag, fp)
        if "deletion_sigs" not in stale
        else deletion_signatures(_t(spark, sf, "documents"))
    ).persist()
    try:
        if "deletion_sigs" in stale:
            # the running max-id scalar is the O(1) monotonicity guard
            # pipeline/ingest.py append_edit_pairs_batch reads per land
            mx = sigs.agg(F.max("_id").alias("mx")).collect()[0]["mx"]
            _sc.write_sidecar(
                sigs, "deletion_sigs", tag, fp, extra={"max_id": mx}
            )
        if "edit_pairs" in stale:
            _sc.write_sidecar(
                edit_distance_pairs(
                    _t(spark, sf, "documents"),
                    max_dist=50,
                    max_bucket_size=1_000_000,
                    pair_mode="star",
                    signatures=sigs,
                ),
                "edit_pairs",
                tag,
                fp,
            )
    finally:
        sigs.unpersist()


def _edit_pairs_artifact(spark, sf) -> DataFrame:
    """The verified near-identical pair set (edit_distance_pairs, star
    mode, max_dist=50) as a FROZEN artifact keyed by the documents
    fingerprint — the keep/drop map a dedup pass applies, persisted by
    the ingest pipeline next to the blocking index it derives from
    (cold builds: one pass for both, :func:`_ensure_edit_families`;
    ingest batches: pipeline/ingest.py append_edit_pairs_batch)."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import edit_distance_pairs

    _ensure_edit_families(spark, sf)

    def build():  # pragma: no cover — ensure() already wrote the sidecar
        return edit_distance_pairs(
            _t(spark, sf, "documents"),
            max_dist=50,
            max_bucket_size=1_000_000,
            pair_mode="star",
            signatures=_deletion_sig_artifact(spark, sf),
        )

    return _artifact_df(spark, "edit_pairs", sf, build).select(
        "id_a", "id_b", "dist"
    )


def _deletion_sig_artifact(spark, sf) -> DataFrame:
    """The SymSpell deletion-neighborhood blocking index
    (``deletion_signatures``: _id, 16-hex sig, distinct) as a FROZEN
    artifact — one explode + per-doc window sums at build, persisted
    once per session/SF; the written near-identical blocking sidecar
    of the ingest pass (cold builds share the pair build's pass,
    :func:`_ensure_edit_families`)."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import (
        deletion_signatures,
    )

    _ensure_edit_families(spark, sf)

    def build():  # pragma: no cover — ensure() already wrote the sidecar
        return deletion_signatures(_t(spark, sf, "documents"))

    return _artifact_df(spark, "deletion_sigs", sf, build)


def q_trend_fit(spark, sf):
    """Per-event-type OLS value-over-time trend in closed form
    (pipeline/validate.py trend_fit): five EXACT decimal/integer moment
    sums in ONE partial-aggregated scan, then the double closed form —
    accumulation-order independent, so bit-stable under repartitioning
    and engine-identical (float covar_samp merges diverge in the last
    ulp). x = seconds since 2024-01-01 per the center-x contract."""
    from stac_fastapi_duckdb_spark.pipeline.validate import trend_fit

    ev = _events(spark, sf)
    x = F.unix_timestamp("ts") - F.lit(1704067200)
    return trend_fit(ev, x, F.col("value"), group_col="event_type")


def q_snapshot_diff(spark, sf):
    """Row-level snapshot delta (pipeline/validate.py snapshot_diff):
    snapshot B is derived deterministically from documents (drop
    doc_id%7, append ' v2' to text for doc_id%5, add doc_id%11 rows
    under shifted ids), then classified added/removed/changed/unchanged
    with ONE hash-carrying full-outer join — never the row bodies. The
    oracle rebuilds B and classifies with IS DISTINCT FROM (the same
    NULL semantics as the NULL-tagged hash)."""
    from stac_fastapi_duckdb_spark.pipeline.validate import snapshot_diff

    d = _t(spark, sf, "documents")
    did = F.col("doc_id")
    b = d.filter(did % 7 != 0).withColumn(
        "text",
        F.when(did % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))).otherwise(
            F.col("text")
        ),
    )
    b = b.unionByName(
        d.filter(did % 11 == 0).select(
            (did + 1_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
        )
    )
    return snapshot_diff(d, b, "doc_id", ["text", "lang"])


def q_streaming_topk(spark, sf):
    """Streaming trending top-k (streaming/events.py trending_topk):
    watermarked hourly counts maintained by the stream (the incremental
    half), rank-3 cut computed at serve time over the tiny aggregated
    sink (ranking is not incremental — a late row can reorder a whole
    window). Oracle is the batch count + QUALIFY restatement."""
    ev = P_stream.read_events_stream(spark, f"{sf}/events.parquet")
    return P_stream.trending_topk(ev, spark, k=3)


def q_quality_tiers(spark, sf):
    """CCNet head/middle/tail (pipeline/text.py quality_tiers):
    per-language equal-depth perplexity tertiles over the unigram-LM
    scores — ntile on (rounded avg_nll, doc_id), a total order on
    engine-stable values, so the oracle replays the exact buckets.

    Round 11: the per-document SCORES (doc_id, lang, n_tokens,
    avg_nll) are served from the ``lm_scores`` decision sidecar — they
    are exactly as corpus-constant as the frozen LM that produced them
    (CCNet scores the corpus once per snapshot), so the per-token
    literal-map fold runs once per ingest inside the artifact build
    and the query is ONE ntile window exchange over the slim written
    table. The oracle recomputes LM + scores + tiers from base parquet
    every run."""
    from stac_fastapi_duckdb_spark.pipeline.text import (
        quality_tiers_from_scores,
    )

    return quality_tiers_from_scores(_lm_scores_artifact(spark, sf))


def _lm_scores_artifact(spark, sf) -> DataFrame:
    """Per-document unigram-LM scores (doc_id, lang, n_tokens, rounded
    avg_nll) as a FROZEN artifact keyed by the documents fingerprint —
    the scored table every perplexity consumer (tiering, filtering,
    curation mixes) cuts at query time, persisted by the ingest pass
    next to the LM it derives from. Build is the map-only
    ``perplexity_score_lit`` fold (no shuffle at any corpus size);
    the determinism rounding is baked into the WRITTEN rows so every
    consumer tiers over the exact same totals order."""
    from stac_fastapi_duckdb_spark.pipeline.text import perplexity_score_lit

    def build():
        lm = _lm_artifact(spark, sf)
        return perplexity_score_lit(
            _t(spark, sf, "documents"),
            lm["vocab"],
            lm["oov"],
            carry_cols=("lang",),
        ).withColumn("avg_nll", F.round("avg_nll", 6))

    return _artifact_df(spark, "lm_scores", sf, build)


def q_streaming_dedup(spark, sf):
    """Exactly-once streaming ingest dedup (streaming/events.py
    streaming_dedup): watermark-bounded dropDuplicates state on
    (event_id, ts) — ids older than the watermark are forgotten, so
    state is bounded by event-time width, not stream length. Oracle is
    the batch DISTINCT the stream must converge to."""
    ev = P_stream.read_events_stream(spark, f"{sf}/events.parquet")
    out = P_stream.streaming_dedup(ev).select("event_id", "ts")
    return P_stream.run_to_memory(out, spark, output_mode="append")


def _ensure_line_families(spark, sf) -> None:
    """ONE-PASS cold build of the whole line-dedup artifact group
    (``keyed_lines``, ``flagged_lines``, ``standing_lines``,
    ``incr_flagged``): all four derive from the single keyed-lines
    explode of the corpus, so the ingest job computes it ONCE
    (persisted in memory) and fans the four sidecar writes off it —
    instead of four sequential `_artifact_df` builds each paying a
    write → read-back → persist → count round trip before the next
    could start (the round-10 cold table's 28× worst-case row was
    exactly this serialization). Only the families whose fingerprints
    are stale are rebuilt; fresh siblings are loaded, not recomputed.
    The consuming accessors below call this first, then serve through
    the usual `_artifact_df` load path, so layouts, session caching,
    and the append/ingest deltas (pipeline/ingest.py) are unchanged."""
    from stac_fastapi_duckdb_spark.pipeline.text import (
        flag_first_lines,
        incremental_flag_lines,
        keyed_lines,
    )
    from stac_fastapi_duckdb_spark.sources import sidecar as _sc

    fp = _sc.source_fingerprint(f"{sf}/documents.parquet")
    tag = _sc.dataset_tag(sf)
    fams = ("keyed_lines", "flagged_lines", "standing_lines", "incr_flagged")
    stale = [f for f in fams if _sc.load_meta(f, tag, fp) is None]
    if not stale:
        return
    kl = (
        _sc.load_sidecar(spark, "keyed_lines", tag, fp)
        if "keyed_lines" not in stale
        else keyed_lines(_t(spark, sf, "documents"))
    ).persist()
    try:
        if "keyed_lines" in stale:
            _sc.write_sidecar(kl, "keyed_lines", tag, fp)
        if "flagged_lines" in stale:
            _sc.write_sidecar(
                flag_first_lines(kl), "flagged_lines", tag, fp, partitions=16
            )
        if "standing_lines" in stale or "incr_flagged" in stale:
            # the standing set is a MAINTAINED artifact in production
            # (appended per batch — pipeline/ingest.py append_line_batch);
            # this is its initial build: docs ≡0 mod 7 are the standing
            # corpus, the rest arrive as the batch
            base = (
                kl.filter((F.col("doc_id") % 7 == 0) & F.col("_e"))
                .select(F.col("_k").alias("h"))
                .distinct()
            )
            if "standing_lines" in stale:
                _sc.write_sidecar(base, "standing_lines", tag, fp)
            if "incr_flagged" in stale:
                _sc.write_sidecar(
                    incremental_flag_lines(
                        kl.filter(F.col("doc_id") % 7 != 0),
                        base,
                        base_distinct=True,
                    ),
                    "incr_flagged",
                    tag,
                    fp,
                    partitions=16,
                )
    finally:
        kl.unpersist()


def _keyed_lines_artifact(spark, sf) -> DataFrame:
    """The exploded + keyed line stream (``keyed_lines``: doc_id, pos,
    line, eligibility, 60-bit salted key) as a FROZEN artifact, built
    once per session/SF and persisted — the materialized line-hash
    column every line-level pass (keep-first window, standing-set
    membership, line stats) consumes. At 100 TB this is a written
    sidecar table (slim: ids + 8-byte keys + the line text) produced
    by the ingest pass; per-query re-exploding the corpus text is the
    recompute this artifact exists to avoid. Cold builds go through
    the GROUP ingest pass (:func:`_ensure_line_families` — one corpus
    explode feeds every sibling)."""
    from stac_fastapi_duckdb_spark.pipeline.text import keyed_lines

    _ensure_line_families(spark, sf)

    def build():  # pragma: no cover — ensure() already wrote the sidecar
        return keyed_lines(_t(spark, sf, "documents"))

    return _artifact_df(spark, "keyed_lines", sf, build)


def _flagged_lines_artifact(spark, sf) -> DataFrame:
    """The corpus-first KEEP verdict stream (``flag_first_lines``:
    doc_id, pos, line, _keep) as a FROZEN artifact layered on the
    keyed-lines artifact. The verdict is corpus-constant (it depends
    only on the corpus, never on the consuming query), so in
    production it is the dedup-DECISION sidecar written once next to
    the line-hash table — the same artifact family as
    ``standing_lines``. Consumers that rebuild documents (line_dedup)
    then pay only their own groupBy(doc) shuffle; the window shuffle
    runs once per session/SF. Cold builds go through the GROUP ingest
    pass (:func:`_ensure_line_families`)."""
    from stac_fastapi_duckdb_spark.pipeline.text import flag_first_lines

    _ensure_line_families(spark, sf)

    def build():  # pragma: no cover — ensure() already wrote the sidecar
        return flag_first_lines(_keyed_lines_artifact(spark, sf))

    return _artifact_df(spark, "flagged_lines", sf, build, partitions=16)


def q_incremental_line_dedup(spark, sf):
    """Continuous-ingest line dedup (pipeline/text.py
    incremental_line_dedup): docs ≢0 mod 7 arrive as the new batch;
    the standing corpus-line-hash set comes from docs ≡0 mod 7. A line
    survives iff short, or batch-first AND absent from the standing
    set — the batch is windowed once on the salted line key then LEFT
    joined against the standing 8-byte hash set; the corpus is never
    re-shuffled. Round 10: the batch KEEP verdicts are themselves the
    served artifact (_incr_flagged_artifact — batch-constant the
    moment the batch lands, same decision-sidecar family as
    flagged_lines), so the window + membership join run once per
    ingest batch and the query is ONE groupBy(doc) rebuild. Oracle
    replays keys, window, anti filter, and rebuild from base parquet."""
    from stac_fastapi_duckdb_spark.pipeline.text import (
        incremental_line_dedup,
    )

    cleaned, _new_hashes = incremental_line_dedup(
        None, None, flagged=_incr_flagged_artifact(spark, sf)
    )
    return cleaned


def _incr_flagged_artifact(spark, sf) -> DataFrame:
    """The arriving batch's KEEP verdicts (incremental_flag_lines over
    the keyed-lines artifact vs the standing line-hash set) as a FROZEN
    artifact — batch-constant the moment the batch lands, so in
    production the window + membership join run ONCE per ingest batch
    and every later consumer reads the written verdicts; the same
    dedup-decision sidecar family as ``flagged_lines``. The standing
    set itself stays a maintained artifact (appended per batch —
    pipeline/ingest.py append_line_batch, and tests/test_sidecar.py's
    append-equivalence pins). Cold builds go through the GROUP ingest
    pass (:func:`_ensure_line_families` — one corpus explode feeds
    verdicts, standing set, and both line-verdict siblings)."""
    from stac_fastapi_duckdb_spark.pipeline.text import (
        incremental_flag_lines,
    )

    _ensure_line_families(spark, sf)

    def build():  # pragma: no cover — ensure() already wrote the sidecar
        kl = _keyed_lines_artifact(spark, sf)
        return incremental_flag_lines(
            kl.filter(F.col("doc_id") % 7 != 0),
            _standing_lines_artifact(spark, sf),
            base_distinct=True,
        )

    return _artifact_df(spark, "incr_flagged", sf, build, partitions=16)


def _standing_lines_artifact(spark, sf) -> DataFrame:
    """The standing corpus line-hash set (1-column ``h``) — built by
    the group ingest pass, grown by ``append_line_batch`` deltas."""
    _ensure_line_families(spark, sf)

    def build():  # pragma: no cover — ensure() already wrote the sidecar
        kl = _keyed_lines_artifact(spark, sf)
        return (
            kl.filter((F.col("doc_id") % 7 == 0) & F.col("_e"))
            .select(F.col("_k").alias("h"))
            .distinct()
        )

    return _artifact_df(spark, "standing_lines", sf, build)


def q_streaming_hll(spark, sf):
    """Continuously-maintained HLL register store
    (streaming/sketches.py): file-source stream → per-micro-batch
    bounded sketch merged into a standing store by element-wise max
    (foreachBatch, atomic dir swap), estimate over the final store.
    Max-merge is associative, commutative AND idempotent, so the
    streamed registers are BIT-IDENTICAL to the batch sketch whatever
    the micro-batch boundaries — the oracle is the same batch replay as
    ``hll_distinct``, holding a genuinely streaming pipeline to the
    value-level gate. State is 512 ints per group forever (vs
    identity-set state that grows with cardinality)."""
    from stac_fastapi_duckdb_spark.streaming.sketches import (
        streaming_hll_distinct,
    )

    return streaming_hll_distinct(
        spark, f"{sf}/events.parquet", "event_type", "user_id", p=9
    )


def q_streaming_cms(spark, sf):
    """Continuously-maintained count-min sketch
    (streaming/sketches.py streaming_cms_counts): per-micro-batch CMS
    cell-SUM-merged into a standing store. Sum-merge is NOT idempotent
    (unlike the HLL max-merge), so the store carries a
    `_merged_batch_id` marker swapped atomically with the cells — a
    replayed batch after a crash is a no-op, which is what makes the
    final cell table identical to the batch sketch and lets the batch
    SQL replay gate the streaming path. Probes: the 5 event types →
    (event_type, est_n) with the one-sided est ≥ exact guarantee."""
    from stac_fastapi_duckdb_spark.streaming.sketches import (
        streaming_cms_counts,
    )

    probes = _events(spark, sf).select("event_type").distinct()
    return streaming_cms_counts(
        spark, f"{sf}/events.parquet", probes, "event_type"
    )


def q_kcenter_select(spark, sf):
    """Greedy k-center coreset selection over embeddings
    (pipeline/select.py): k=5 farthest-point rounds, each ONE map-only
    scan + TakeOrdered(1), distances as rounded JVM folds (no UDF).
    Oracle unrolls the identical greedy as chained CTEs."""
    from stac_fastapi_duckdb_spark.pipeline.select import k_center_select

    return k_center_select(_t(spark, sf, "embeddings"), k=5)


def q_pagerank_transitions(spark, sf):
    """Weighted PageRank over the per-user event-type transition graph
    (pipeline/graph.py): lead() window → bounded edge list, then 5
    declarative join+agg iterations with dangling-mass fold-back.
    Oracle replays the unrolled update in SQL."""
    from stac_fastapi_duckdb_spark.pipeline.graph import (
        pagerank,
        transition_edges,
    )

    return pagerank(transition_edges(_events(spark, sf)), iters=5)


def q_cms_counts(spark, sf):
    """Count-min sketch frequency estimation (pipeline/sketch.py):
    build the 4×512 count table over document tokens (one
    partial-aggregated shuffle bounded by d·w), then estimate the top-20
    exact tokens against it — output (token, exact_n, est_n) with the
    one-sided est_n ≥ exact_n guarantee. md5-derived cells make the
    sketch AND the estimates engine-replayable. The sketch is built
    from the exact (token, count) aggregate this query needs anyway
    (cms_sketch_from_counts — CMS linearity makes it cell-identical):
    d md5s per DISTINCT token instead of per instance, and the vocab
    table is localCheckpointed so the explode+count pipeline runs once
    for both the probe and sketch branches (14.1 s → the aggregate
    cost of one token count at sf1)."""
    from stac_fastapi_duckdb_spark.pipeline.sketch import (
        cms_estimate,
        cms_sketch_from_counts,
    )

    toks = (
        _t(spark, sf, "documents")
        .select(
            F.explode(F.split(F.lower(F.trim(F.col("text"))), r"\s+")).alias(
                "token"
            )
        )
        .filter(F.col("token") != "")
    )
    exact = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_n"))
        # vocabulary-bounded (≪ corpus); two consumers below
        .localCheckpoint()
    )
    probes = exact.orderBy(F.col("exact_n").desc(), "token").limit(20)
    sk = cms_sketch_from_counts(exact, "token", "exact_n", depth=4, width=512)
    est = cms_estimate(sk, probes.select("token"), "token", depth=4, width=512)
    return probes.join(est, "token").select("token", "exact_n", "est_n")


def q_jl_projection(spark, sf):
    """Johnson-Lindenstrauss 64→16 projection (pipeline/similarity.py
    jl_project): frozen seeded Gaussian matrix, each output dim a
    pure-Column JVM fold — map-only, zero shuffle, no UDF. Long-form
    (vec_id, pos, val) output; oracle inlines the identical matrix
    literals."""
    from stac_fastapi_duckdb_spark.pipeline.similarity import jl_project

    return jl_project(_t(spark, sf, "embeddings"), dim=64, out_dim=16)


def q_top_paths(spark, sf):
    """Top-20 event-type trigram paths (operators/analytics.py
    top_paths): one user-window shuffle, both leads in a single Window
    node, partial-agg count, TakeOrderedAndProject top-k."""
    from stac_fastapi_duckdb_spark.operators.analytics import top_paths

    return top_paths(_events(spark, sf), n=3, k=20)


def q_event_pairs(spark, sf):
    """Frequent co-occurring event-type pairs (operators/analytics.py
    cooccurring_pairs): distinct (user, type) reduction FIRST, then the
    vocabulary-bounded self-join — size-2 frequent itemsets."""
    from stac_fastapi_duckdb_spark.operators.analytics import (
        cooccurring_pairs,
    )

    return cooccurring_pairs(_events(spark, sf), min_support=2)


def q_anomaly_hours(spark, sf):
    """Rolling-window volume anomalies (pipeline/validate.py
    rolling_count_anomalies): per-(type, hour) counts, exact integer
    trailing-window moments (the trend_fit contract), floored-variance
    z-score, top-20 by |z|. Oracle replays the identical frame and
    double expressions."""
    from stac_fastapi_duckdb_spark.pipeline.validate import (
        rolling_count_anomalies,
    )

    return rolling_count_anomalies(_events(spark, sf), trailing=24, k=20)


def q_dsir_select(spark, sf):
    """DSIR importance resampling (Xie et al. 2023): train TWO add-one
    smoothed top-300 unigram LMs — target = the lang='en' slice, raw =
    the whole corpus — merge them into one ≤600-row token map, and keep
    the 200 documents with the highest rounded log importance ratio
    Σ(log p_target − log p_raw). One explode + ONE broadcast join + one
    partial-agg groupBy + TakeOrderedAndProject; the oracle replays the
    identical two-LM smoothing closed form and the rounded-weight total
    order in SQL."""
    from stac_fastapi_duckdb_spark.pipeline.text import (
        dsir_select,
        train_unigram_lm,
    )

    docs = _t(spark, sf, "documents")
    target_lm = train_unigram_lm(docs.filter(F.col("lang") == "en"), vocab_size=300)
    raw_lm = train_unigram_lm(docs, vocab_size=300)
    return dsir_select(docs, target_lm, raw_lm, k=200)


def q_ngram_novelty(spark, sf):
    """Corpus-order n-gram novelty (pipeline/text.py ngram_novelty):
    per document, the fraction of its distinct word 3-grams whose first
    corpus occurrence (min doc_id) is that document — the marginal-
    coverage signal behind novelty-ordered curricula / soft dedup.
    Per-doc totals are a map-only F.size (no explode); only the
    first-occurrence side explodes, shuffled once on the 8-byte gram
    hash into a partial-agg min — frozen per session as the
    _novelty_counts_artifact (the ingest-time aggregate), so the query
    is the map-only totals + one doc-keyed join. Oracle replays the
    identical first-occurrence definition on the string grams."""
    from stac_fastapi_duckdb_spark.pipeline.text import ngram_novelty

    return ngram_novelty(
        _t(spark, sf, "documents"),
        novel=_novelty_counts_artifact(spark, sf),
    )


def _ensure_novelty_families(spark, sf) -> None:
    """ONE-PASS cold build of the novelty artifact group
    (``novelty_counts``, ``shingle_keys``): both derive from the same
    shingle explode + first-occurrence aggregation, so the ingest job
    computes the (key, first_doc) stream once and writes the per-doc
    totals AND the standing distinct shingle-key set off it. The key
    set is what makes the family APPENDABLE
    (pipeline/ingest.py append_novelty_batch): a landing batch's
    novelty is its shingles absent from the standing set, so the
    full-corpus explode never recurs under standing ingest. The
    running max doc id rides in the key sidecar's scalar metadata for
    the O(1) monotonicity guard."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import (
        ensure_parallelism,
        shingles_col,
    )
    from stac_fastapi_duckdb_spark.sources import sidecar as _sc

    fp = _sc.source_fingerprint(f"{sf}/documents.parquet")
    tag = _sc.dataset_tag(sf)
    stale = [
        f
        for f in ("novelty_counts", "shingle_keys")
        if _sc.load_meta(f, tag, fp) is None
    ]
    if not stale:
        return
    docs = ensure_parallelism(_t(spark, sf, "documents"))
    firsts = (
        docs.select(
            "doc_id",
            F.explode(shingles_col(F.col("text"), 3)).alias("_g"),
        )
        .select("doc_id", F.xxhash64("_g").alias("_k"))
        .groupBy("_k")
        .agg(F.min("doc_id").alias("_first"))
        .persist()
    )
    try:
        if "novelty_counts" in stale:
            _sc.write_sidecar(
                firsts.groupBy(F.col("_first").alias("doc_id")).agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_novel")
                ),
                "novelty_counts",
                tag,
                fp,
            )
        if "shingle_keys" in stale:
            mx = docs.agg(F.max("doc_id").alias("mx")).collect()[0]["mx"]
            _sc.write_sidecar(
                firsts.select(F.col("_k").alias("k")),
                "shingle_keys",
                tag,
                fp,
                extra={"max_id": mx},
            )
    finally:
        firsts.unpersist()


def _novelty_counts_artifact(spark, sf) -> DataFrame:
    """The corpus-constant per-doc first-occurrence totals of
    ngram_novelty (``novelty_counts``: doc_id, n_novel) as a FROZEN
    artifact — doc-cardinality output, one explode + two partial-agg
    shuffles at build, persisted once per session/SF. Cold builds go
    through the GROUP ingest pass (:func:`_ensure_novelty_families` —
    the same derivation also writes the standing shingle-key set the
    append path needs)."""
    from stac_fastapi_duckdb_spark.pipeline.text import novelty_counts

    _ensure_novelty_families(spark, sf)

    def build():  # pragma: no cover — ensure() already wrote the sidecar
        return novelty_counts(_t(spark, sf, "documents"))

    return _artifact_df(spark, "novelty_counts", sf, build)


def q_hash_embed(spark, sf):
    """Feature-hashing text vectorizer (pipeline/text.py hash_embed,
    the Weinberger et al. 2009 hashing trick): token → ±1 into
    md5-bucket mod 32, L2-normalized — the zero-vocabulary text vector
    feeding the ANN/clustering stack when no model embedding exists.
    ONE partial-agged shuffle of (doc, bucket, ±1); the norm is an
    exact int64 sum of squares so every value replays bit-for-bit.
    Long-form (doc_id, pos, val) output for the value gate (same
    convention as jl_projection). Serves from the frozen hashed-corpus
    artifact (_hashed_vecs): the vectorization's one shuffle runs once
    per session, queries are map-only over the persisted vectors."""
    return _hashed_vecs(spark, sf).select(
        "doc_id", F.posexplode("vec").alias("pos", "val")
    )


def _hashed_vecs(spark, sf) -> DataFrame:
    """The hashing-trick corpus vectors as a frozen artifact: one
    partial-agged shuffle at build, persisted per session/SF — the
    model-free analogue of a stored embedding column. Serving queries
    (posexplode, probe top-k) are then map-only/TakeOrdered jobs over
    the in-memory vectors; at cluster scale this materialization is a
    written column, not a per-query recompute."""
    from stac_fastapi_duckdb_spark.pipeline.text import hash_embed

    def build():
        return hash_embed(_t(spark, sf, "documents"), dim=32)

    return _artifact_df(spark, "hashed_vecs", sf, build)


def q_hashed_text_topk(spark, sf):
    """End-to-end model-free text retrieval: hash_embed the corpus
    (32-dim hashing-trick vectors), take doc 0's vector as the probe,
    return the 10 nearest other docs by dot product (vectors are
    unit-normalized, so dot IS cosine). The probe side is a 1-row
    broadcast; scoring is a map-only JVM zip_with fold feeding
    TakeOrderedAndProject — the corpus is never shuffled. The oracle
    re-derives the identical vectors and replays the scoring.
    Both sides serve from the frozen hashed-corpus artifact
    (_hashed_vecs, built once per session): the probe row is a bounded
    1-row fetch from the persisted vectors and embeds as a literal, so
    the timed query is ONE TakeOrdered job — previously the whole
    vectorization pipeline ran twice (probe branch + corpus branch)
    per invocation."""
    from stac_fastapi_duckdb_spark.functions import vectors as V

    vecs = _hashed_vecs(spark, sf)
    probe_row = vecs.filter(F.col("doc_id") == 0).select("vec").collect()
    probe_lit = F.array(
        *[F.lit(float(x)) for x in probe_row[0]["vec"]]
    )
    return (
        vecs.filter(F.col("doc_id") != 0)
        .select(
            "doc_id",
            F.round(V.dot(F.col("vec"), probe_lit), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
    )


def q_line_dedup(spark, sf):
    """Corpus-level exact line dedup, keep-first (pipeline/text.py
    line_dedup — the CCNet / RefinedWeb boilerplate-line pass): a line
    survives iff it is shorter than 10 trimmed chars or is the
    corpus-first occurrence of its normalized form. Serves from the
    frozen keep-verdict artifact (_flagged_lines_artifact — the
    corpus-constant window decision, the production dedup-decision
    sidecar), so the query is ONE groupBy(doc) whose single
    collect_list yields totals, kept count, and the rejoined text —
    no join back to the source, no per-query window shuffle. The
    oracle replays key, window, and rebuild verbatim."""
    from stac_fastapi_duckdb_spark.pipeline.text import line_dedup

    return line_dedup(None, flagged=_flagged_lines_artifact(spark, sf))


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
    "minhash_near_dup": q_minhash_near_dup,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_dedup_map": q_minhash_dedup_map,
    "simhash_pairs": q_simhash_pairs,
    "language_id": q_language_id,
    "text_analysis": q_text_analysis,
    "quality_features": q_quality_features,
    "embedding_near_dup": q_embedding_near_dup,
    "ann_srp_topk": q_ann_srp_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_pq_topk": q_ann_pq_topk,
    "multimodal_metadata": q_multimodal_metadata,
    "multimodal_features": q_multimodal_features,
    "frame_sample": q_frame_sample,
    "streaming_hourly_rollup": q_streaming_hourly_rollup,
    "sessionize": q_sessionize,
    "keyset_pagination": q_keyset_pagination,
    "rank_dedup": q_rank_dedup,
    "user_stats": q_user_stats,
    "stateful_sessions": q_stateful_sessions,
    "skew_agg": q_skew_agg,
    "asof_join": q_asof_join,
    "dedup_clusters": q_dedup_clusters,
    "range_join": q_range_join,
    "pivot_events": q_pivot_events,
    "daily_from_hourly": q_daily_from_hourly,
    "unpivot_events": q_unpivot_events,
    "semi_join": q_semi_join,
    "anti_join": q_anti_join,
    "scalar_subquery": q_scalar_subquery,
    "rollup_agg": q_rollup_agg,
    "cube_agg": q_cube_agg,
    "distinct_count": q_distinct_count,
    "scd2_intervals": q_scd2_intervals,
    "cdc_apply": q_cdc_apply,
    "bloom_pruned_join": q_bloom_pruned_join,
    "audio_frames": q_audio_frames,
    "audio_frame_features": q_audio_frame_features,
    "grouping_sets": q_grouping_sets,
    "percentile_agg": q_percentile_agg,
    "rolling_window": q_rolling_window,
    "first_last_window": q_first_last_window,
    "json_extract": q_json_extract,
    "hash_sample": q_hash_sample,
    "stratified_sample": q_stratified_sample,
    "contamination_check": q_contamination,
    "boilerplate_stats": q_boilerplate,
    "funnel_steps": q_funnel,
    "cohort_retention": q_cohort_retention,
    "chunk_documents": q_chunk_documents,
    "incremental_dedup": q_incremental_dedup,
    "tfidf_terms": q_tfidf_terms,
    "bm25_search": q_bm25_search,
    "dataset_split": q_dataset_split,
    "sequence_packing": q_sequence_packing,
    "label_balance": q_label_balance,
    "stats_agg": q_stats_agg,
    "histogram": q_histogram,
    "set_intersect": q_set_intersect,
    "set_except": q_set_except,
    "corpus_mixture": q_corpus_mixture,
    "pivot_dynamic": q_pivot_dynamic,
    "string_funcs": q_string_funcs,
    "datetime_funcs": q_datetime_funcs,
    "props_map_explode": q_props_map_explode,
    "window_analytics": q_window_analytics,
    "repetition_stats": q_repetition_stats,
    "pii_scrub": q_pii_scrub,
    "url_normalize": q_url_normalize,
    "stream_stream_join": q_stream_stream_join,
    "hybrid_search": q_hybrid_search,
    "stream_enrich": q_stream_enrich,
    "embedding_outliers": q_embedding_outliers,
    "curation_pipeline": q_curation_pipeline,
    "gap_fill": q_gap_fill,
    "left_outer_join": q_left_outer_join,
    "semdedup": q_semdedup,
    "duplicate_spans": q_duplicate_spans,
    "containment_dedup": q_containment_dedup,
    "quality_classifier": q_quality_classifier,
    "dataset_fingerprint": q_dataset_fingerprint,
    "cluster_representatives": q_cluster_representatives,
    "split_leakage": q_split_leakage,
    "shuffle_shards": q_shuffle_shards,
    "distribution_drift": q_distribution_drift,
    "profile_table": q_profile_table,
    "remove_duplicate_spans": q_remove_duplicate_spans,
    "lm_perplexity": q_lm_perplexity,
    "top_bigrams": q_top_bigrams,
    "kmeans_round": q_kmeans_round,
    "global_row_ids": q_global_row_ids,
    "kmv_distinct": q_kmv_distinct,
    "weighted_sample": q_weighted_sample,
    "sampled_quantiles": q_sampled_quantiles,
    "edit_distance_pairs": q_edit_distance_pairs,
    "trend_fit": q_trend_fit,
    "snapshot_diff": q_snapshot_diff,
    "quality_tiers": q_quality_tiers,
    "streaming_topk": q_streaming_topk,
    "streaming_dedup": q_streaming_dedup,
    "kcenter_select": q_kcenter_select,
    "pagerank_transitions": q_pagerank_transitions,
    "cms_counts": q_cms_counts,
    "jl_projection": q_jl_projection,
    "top_paths": q_top_paths,
    "event_pairs": q_event_pairs,
    "anomaly_hours": q_anomaly_hours,
    "dsir_select": q_dsir_select,
    "cql2_text": q_cql2_text,
    "ngram_novelty": q_ngram_novelty,
    "hll_distinct": q_hll_distinct,
    "kmv_overlap": q_kmv_overlap,
    "line_dedup": q_line_dedup,
    "streaming_hll": q_streaming_hll,
    "decontaminate": q_decontaminate,
    "hash_embed": q_hash_embed,
    "hashed_text_topk": q_hashed_text_topk,
    "incremental_line_dedup": q_incremental_line_dedup,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
    "streaming_cms": q_streaming_cms,
}


# HLL estimator constant alpha_512·512²·2^52 (pipeline/sketch.py
# hll_estimate with p=9): computed ONCE here and embedded verbatim in
# both engines' expressions so no cross-engine float arithmetic can
# diverge before the single estimate division
_HLL_C = (0.7213 / (1.0 + 1.079 / 512)) * 512 * 512 * float(1 << 52)

# word-3-gram shingle sets per doc, replicating pipeline.dedup.shingles_col:
# lower+trim, split \s+, 3-grams joined by ' ', distinct; <3 tokens → whole text
_SHINGLES_SQL = r"""
    SELECT doc_id,
           CASE WHEN len(t) >= 3
                THEN list_distinct(list_transform(
                         generate_series(1, len(t) - 2),
                         i -> concat_ws(' ', t[i], t[i+1], t[i+2])))
                ELSE [array_to_string(t, ' ')] END AS s
    FROM (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
          FROM documents)
"""

_JACCARD_PAIRS_SQL = f"""
    SELECT id_a, id_b, jaccard FROM (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.s, b.s))), 6) AS jaccard
        FROM ({_SHINGLES_SQL}) a JOIN ({_SHINGLES_SQL}) b ON a.doc_id < b.doc_id
    ) WHERE jaccard >= 0.8
"""

# replicates pipeline.text.lang_id_col: CJK ratio → zh; else argmax
# stopword-profile overlap (ties → first profile in en,de,fr,es order)
_LANG_SCORES_SQL = r"""
    SELECT doc_id, length(text) AS txt_len,
           length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk,
           len(list_intersect(toks, ['the','a','and','of','to','in','is','it','that','for'])) AS s_en,
           len(list_intersect(toks, ['der','die','das','und','ist','nicht','ein','zu','mit','den'])) AS s_de,
           len(list_intersect(toks, ['le','la','les','et','est','un','une','des','que','pour'])) AS s_fr,
           len(list_intersect(toks, ['el','la','los','las','es','un','una','que','de','por'])) AS s_es
    FROM (SELECT doc_id, text,
                 list_distinct(regexp_split_to_array(lower(trim(text)), '\s+')) AS toks
          FROM documents)
"""

_LANG_PRED_SQL = """
    CASE WHEN cjk * 2 > txt_len THEN 'zh'
         WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
         WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
         WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
         ELSE 'es' END
"""

# replicates pipeline.text.quality_score_col
_QUALITY_SQL = r"""
    ROUND(LEAST(1.0,
        (CASE WHEN n_tok > 0 THEN CAST(n_uniq AS DOUBLE) / n_tok ELSE 0.0 END) * 0.5
        + (CASE WHEN n_tok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.3 END) * 0.3
        + (CASE WHEN (CASE WHEN n_chars > 0
                           THEN CAST(n_punct AS DOUBLE) / n_chars
                           ELSE 1.0 END) < 0.2 THEN 1.0 ELSE 0.5 END) * 0.2), 6)
"""

_TEXT_STATS_SQL = r"""
    SELECT doc_id, text, len(t) AS n_tok, len(list_distinct(t)) AS n_uniq,
           length(text) AS n_chars,
           length(regexp_replace(text, '[^[:punct:]]', '', 'g')) AS n_punct,
           list_distinct(t) AS toks_d
    FROM (SELECT doc_id, text, regexp_split_to_array(lower(trim(text)), '\s+') AS t
          FROM documents)
"""


def _kcenter_sql(k: int = 5) -> str:
    """Greedy k-center unrolled as chained CTEs — the SQL oracle for
    pipeline.select.k_center_select.  Replays the identical rounded
    arithmetic: DOUBLE distances ROUNDed to 6 decimals before both the
    LEAST update and the (mind DESC, vec_id ASC) argmax."""

    def dist(a: str, b: str) -> str:
        return (
            "ROUND(list_sum(list_transform(range(1, 65), "
            f"i -> ({a}[i] - {b}[i]) ** 2)), 6)"
        )

    ctes = [
        "base AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)",
        (
            "c0 AS (SELECT vec_id, v FROM base ORDER BY "
            "ROUND(list_sum(list_transform(range(1, 65), i -> v[i] ** 2)), 6) "
            "DESC, vec_id ASC LIMIT 1)"
        ),
    ]
    for r in range(1, k):
        src = "base b" if r == 1 else f"d{r - 1} b"
        upd = (
            dist("b.v", "c.v")
            if r == 1
            else f"LEAST(b.mind, {dist('b.v', 'c.v')})"
        )
        ctes.append(
            f"d{r} AS (SELECT b.vec_id, b.v, {upd} AS mind "
            f"FROM {src} CROSS JOIN c{r - 1} c)"
        )
        ctes.append(
            f"c{r} AS (SELECT vec_id, v, mind FROM d{r} "
            "ORDER BY mind DESC, vec_id ASC LIMIT 1)"
        )
    selects = [
        "SELECT CAST(0 AS BIGINT) AS sel_rank, vec_id, "
        "CAST(NULL AS DOUBLE) AS mind FROM c0"
    ]
    for r in range(1, k):
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS sel_rank, vec_id, mind FROM c{r}"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def _pagerank_sql(iters: int = 5, damping: float = 0.85) -> str:
    """Weighted PageRank unrolled as chained CTEs — the SQL oracle for
    pipeline.graph.pagerank over transition_edges(events).  Same edge
    extraction (lead over (ts, event_id)) and the identical per-round
    update with uniform dangling-mass redistribution."""
    ctes = [
        f"ev AS (SELECT event_id, ts, user_id, event_type FROM {_EVENTS_SQL})",
        (
            "lead_t AS (SELECT event_type AS src, "
            "lead(event_type) OVER (PARTITION BY user_id "
            "ORDER BY ts ASC, event_id ASC) AS dst FROM ev)"
        ),
        (
            "edges AS (SELECT src, dst, CAST(count(*) AS DOUBLE) AS w "
            "FROM lead_t WHERE dst IS NOT NULL GROUP BY src, dst)"
        ),
        (
            "nodes AS (SELECT DISTINCT node FROM "
            "(SELECT src AS node FROM edges UNION SELECT dst FROM edges))"
        ),
        "outw AS (SELECT src, sum(w) AS out_w FROM edges GROUP BY src)",
        "ncnt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes)",
        "r0 AS (SELECT node, 1.0 / (SELECT n FROM ncnt) AS pr FROM nodes)",
    ]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(
            f"dang{i} AS (SELECT coalesce(sum(pr), 0.0) AS dang FROM r{p} "
            "WHERE node NOT IN (SELECT src FROM outw))"
        )
        ctes.append(
            f"c{i} AS (SELECT e.dst AS node, "
            "sum(r.pr * e.w / o.out_w) AS contrib "
            f"FROM edges e JOIN r{p} r ON e.src = r.node "
            "JOIN outw o ON e.src = o.src GROUP BY e.dst)"
        )
        ctes.append(
            f"r{i} AS (SELECT n.node, "
            f"(1.0 - {damping}) / (SELECT n FROM ncnt) "
            f"+ {damping} * (coalesce(c.contrib, 0.0) "
            f"+ (SELECT dang FROM dang{i}) / (SELECT n FROM ncnt)) AS pr "
            f"FROM nodes n LEFT JOIN c{i} c ON n.node = c.node)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT node, ROUND(pr, 6) AS pr FROM r{iters}"
    )


def _jl_sql(out_dim: int = 16, dim: int = 64, seed: int = 7) -> str:
    """JL projection oracle: inline the SAME frozen matrix literals
    (similarity.jl_matrix) and replay the per-dim dot product."""
    from stac_fastapi_duckdb_spark.pipeline.similarity import jl_matrix

    m = jl_matrix(out_dim, dim, seed)
    mat = "[" + ", ".join(
        "[" + ", ".join(repr(x) for x in row) + "]" for row in m
    ) + "]"
    return f"""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), mt(mat) AS (SELECT {mat})
        SELECT vec_id, CAST(j - 1 AS INT) AS pos,
               ROUND(list_sum(list_transform(range(1, {dim + 1}),
                                             i -> v[i] * mat[j][i])), 6)
                   + 0.0 AS val
        FROM base, mt, unnest(range(1, {out_dim + 1})) AS u(j)
    """


# count-min sketch replay: identical md5-derived cells for the build
# AND the probe side, min over the 4 rows (absent cell → 0)
_CMS_SQL = r"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
        FROM documents
    ), tok2 AS (
        SELECT token FROM tok WHERE token <> ''
    ), exact AS (
        SELECT token, CAST(count(*) AS BIGINT) AS exact_n
        FROM tok2 GROUP BY token
    ), probes AS (
        SELECT token, exact_n FROM exact
        ORDER BY exact_n DESC, token LIMIT 20
    ), cells AS (
        SELECT CAST(CAST('0x' || substr(md5('cms-v1:' || CAST(r AS VARCHAR)
                                        || ':' || token), 1, 8) AS UBIGINT)
                    % 512 AS BIGINT) AS cell,
               r
        FROM tok2, unnest(range(0, 4)) AS u(r)
    ), sk AS (
        SELECT r, cell, CAST(count(*) AS BIGINT) AS cnt
        FROM cells GROUP BY r, cell
    ), pc AS (
        SELECT p.token, p.exact_n, u.r,
               CAST(CAST('0x' || substr(md5('cms-v1:' || CAST(u.r AS VARCHAR)
                                        || ':' || p.token), 1, 8) AS UBIGINT)
                    % 512 AS BIGINT) AS cell
        FROM probes p, unnest(range(0, 4)) AS u(r)
    )
    SELECT token, exact_n,
           CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est_n
    FROM pc LEFT JOIN sk ON pc.r = sk.r AND pc.cell = sk.cell
    GROUP BY token, exact_n
"""


def _cc_unrolled_sql(rounds: int = 6) -> str:
    """Min-label propagation unrolled as chained CTEs — the SQL oracle
    for the iterative connected-components operator (converged result is
    identical once rounds ≥ cluster diameter)."""
    ctes = [
        f"e AS (SELECT id_a AS n, id_b AS m FROM ({_JACCARD_PAIRS_SQL})"
        f"      UNION ALL SELECT id_b, id_a FROM ({_JACCARD_PAIRS_SQL}))",
        "l0 AS (SELECT doc_id AS n, doc_id AS comp FROM documents)",
    ]
    for i in range(rounds):
        ctes.append(
            f"l{i + 1} AS (SELECT l.n, LEAST(l.comp, COALESCE(MIN(r.comp), l.comp)) AS comp"
            f"  FROM l{i} l LEFT JOIN e ON l.n = e.n LEFT JOIN l{i} r ON e.m = r.n"
            f"  GROUP BY l.n, l.comp)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT n AS doc_id, comp AS component FROM l{rounds}"
    )


def _srp_planes_values_sql(dim: int = 64, num_planes: int = 8, seed: int = 42) -> str:
    """VALUES rows ``(p, pv DOUBLE[])`` regenerated from the same seeded
    hyperplanes as pipeline.similarity._srp_planes — the planes are
    query parameters (like a literal probe vector), so the oracle
    replays the identical projections."""
    planes = P_sim._srp_planes(dim, num_planes, seed)
    rows = ", ".join(
        "(" + str(p) + ", ["
        + ", ".join(repr(float(x)) for x in row)
        + "]::DOUBLE[])"
        for p, row in enumerate(planes)
    )
    return f"(VALUES {rows})"


def _qc_weights_sql() -> str:
    """DOUBLE[] literal of the frozen quality-classifier weight table
    (plans/qc_index.py) — both engines score from the same literals."""
    from stac_fastapi_duckdb_spark.plans.qc_index import QC_WEIGHTS

    return "[" + ", ".join(repr(float(x)) for x in QC_WEIGHTS) + "]::DOUBLE[]"


def _qc_scores_sql() -> str:
    """(doc_id, n_tokens, qc_score) — replicates
    pipeline.text.quality_classifier: same frozen weight literals, same
    md5 low-60-bit bucket, same bias + mean-of-weights fold. Shared by
    the quality_classifier and cluster_representatives oracles."""
    return f"""
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               ROUND(0.05 + list_sum(list_transform(toks,
                   tok -> ({_qc_weights_sql()})[
                       CAST(CAST('0x' || substr(md5(tok), 18, 15) AS UBIGINT)
                            % 64 AS INTEGER) + 1]))
                   / len(toks), 6) AS qc_score
        FROM (SELECT doc_id,
                     string_split_regex(lower(trim(text)), '\\s+') AS toks
              FROM documents)
    """


def _ivf_centroids_values_sql() -> str:
    """VALUES rows ``(c, cv DOUBLE[])`` from the frozen IVF index
    artifact (plans/ivf_index.py) — both engines score against the
    same centroid literals."""
    from stac_fastapi_duckdb_spark.plans.ivf_index import IVF_CENTROIDS

    rows = ", ".join(
        "(" + str(c) + ", ["
        + ", ".join(repr(float(x)) for x in row)
        + "]::DOUBLE[])"
        for c, row in enumerate(IVF_CENTROIDS)
    )
    return f"(VALUES {rows})"


# simhash signature per doc, replicating pipeline.dedup.with_simhash:
# tokens = lower().split(); token hash = low 64 bits of md5; bit i of the
# signature = majority vote (ones*2 >= n_tok); signed-int64 reassembly.
_SIMHASH_SIGS_SQL = r"""
    SELECT doc_id,
           CAST(SUM(CASE WHEN i < 63 AND ones * 2 >= n_tok
                         THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS BIGINT)
           + CASE WHEN MAX(CASE WHEN i = 63 AND ones * 2 >= n_tok
                                THEN 1 ELSE 0 END) = 1
                  THEN -9223372036854775807 - 1 ELSE 0 END AS sig
    FROM (
        SELECT doc_id, n_tok, i,
               SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE 0 END) AS ones
        FROM (
            SELECT doc_id, n_tok, h, unnest(range(0, 64)) AS i
            FROM (
                SELECT doc_id, len(ts) AS n_tok,
                       CAST('0x' || substr(md5(unnest(ts)), 17, 16) AS UBIGINT) AS h
                FROM (
                    SELECT doc_id,
                           list_filter(regexp_split_to_array(lower(text), '\s+'),
                                       x -> x <> '') AS ts
                    FROM documents
                ) WHERE len(ts) > 0
            )
        )
        GROUP BY doc_id, n_tok, i
    )
    GROUP BY doc_id
    UNION ALL
    SELECT doc_id, 0 AS sig
    FROM (SELECT doc_id,
                 list_filter(regexp_split_to_array(lower(text), '\s+'),
                             x -> x <> '') AS ts
          FROM documents)
    WHERE len(ts) = 0
"""


# PII oracle shares the LITERAL pattern constants with the Spark
# operator (pipeline/text.py PII_PATTERNS are RE2-compatible by design)
from stac_fastapi_duckdb_spark.pipeline.text import PII_PATTERNS as _PII

_PII_EMAIL = _PII["email"][0]
_PII_IP = _PII["ip"][0]
_PII_PHONE = _PII["phone"][0]

# identical injection expression as _pii_documents (Spark side)
_PII_SYNTH_SQL = """
    SELECT doc_id,
           concat(text, ' contact user', CAST(doc_id AS VARCHAR), '@example.com',
                  CASE WHEN doc_id % 3 = 0
                       THEN concat(' cc admin', CAST(doc_id AS VARCHAR), '@mail.test')
                       ELSE '' END,
                  ' or +1-555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                  CASE WHEN doc_id % 4 = 0
                       THEN concat(' from 10.', CAST(doc_id % 200 AS VARCHAR), '.0.7')
                       ELSE '' END) AS text
    FROM documents
"""


ORACLE_SQL: dict[str, str] = {
    "dedup_clusters": _cc_unrolled_sql(),
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
    # money sums mirror functions/money.py: exact BIGINT unit counts
    # (cents; 1e-4 units for price*(1-disc)), one closing /10^k division
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) / 100.0 AS sum_base_price,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
                   AS sum_disc_price,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "top_revenue_orders": """
        SELECT l_orderkey, o_orderdate,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
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
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) / 10000.0
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
    "minhash_near_dup": _JACCARD_PAIRS_SQL,
    "ngram_jaccard": _JACCARD_PAIRS_SQL,
    # transitive default: canonical_id IS the connected component's min
    # id — same unrolled-propagation oracle as dedup_clusters, re-aliased
    "minhash_dedup_map": f"""
        SELECT doc_id, component AS canonical_id FROM ({_cc_unrolled_sql()})
    """,
    "language_id": f"""
        SELECT doc_id, {_LANG_PRED_SQL} AS lang_pred FROM ({_LANG_SCORES_SQL})
    """,
    "text_analysis": f"""
        SELECT st.doc_id AS doc_id,
               {_LANG_PRED_SQL} AS lang_pred,
               CAST(n_tok AS BIGINT) AS n_tokens,
               CAST(len(regexp_extract_all(st.text,
                    '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]', 0)) AS BIGINT) AS n_tokens_bpe,
               {_QUALITY_SQL} AS quality,
               md5(regexp_replace(lower(trim(st.text)), '\\s+', ' ', 'g')) AS fp
        FROM ({_TEXT_STATS_SQL}) st JOIN ({_LANG_SCORES_SQL}) ls
          ON st.doc_id = ls.doc_id
    """,
    "quality_features": f"""
        SELECT doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_tok AS BIGINT) AS n_tokens,
               ROUND(CASE WHEN n_tok > 0 THEN CAST(n_uniq AS DOUBLE) / n_tok ELSE 0.0 END, 6) AS unique_ratio,
               ROUND(CASE WHEN n_tok > 0 THEN CAST(n_chars AS DOUBLE) / n_tok ELSE 0.0 END, 6) AS mean_token_len,
               ROUND(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END, 6) AS punct_ratio,
               ROUND(CASE WHEN n_chars > 0 THEN CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) / n_chars ELSE 0.0 END, 6) AS digit_ratio,
               ROUND(CASE WHEN n_chars > 0 THEN CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE) / n_chars ELSE 0.0 END, 6) AS upper_ratio,
               ROUND(CASE WHEN LEAST(n_uniq, 10) > 0
                          THEN CAST(len(list_intersect(toks_d,
                               ['the','a','and','of','to','in','is','it','that','for'])) AS DOUBLE)
                               / LEAST(n_uniq, 10)
                          ELSE 0.0 END, 6) AS stopword_hit_ratio
        FROM ({_TEXT_STATS_SQL})
    """,
    "embedding_near_dup": """
        SELECT id_a, id_b, cos_sim FROM (
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                                CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
            FROM (SELECT vec_id, embedding FROM embeddings
                  UNION ALL SELECT vec_id + 1000, embedding FROM embeddings) a
            JOIN (SELECT vec_id, embedding FROM embeddings
                  UNION ALL SELECT vec_id + 1000, embedding FROM embeddings) b
              ON a.vec_id < b.vec_id
        ) WHERE cos_sim >= 0.95
    """,
    "multimodal_metadata": """
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
               CAST(strlen(text) AS BIGINT) AS n_bytes,
               md5(text) AS content_hash
        FROM documents
    """,
    "frame_sample": """
        SELECT media_id,
               unnest(generate_series(0, greatest(n_frames - 1, 0), 30)) AS frame_idx
        FROM (SELECT doc_id AS media_id, n_chars % 300 + 1 AS n_frames FROM documents)
    """,
    # replicates pipeline.multimodal._fake_decode: feature i = byte i of
    # the md5 counter stream md5(payload|0)++md5(payload|1), divided by
    # 256 (exact in fp), formatted at fixed 8-decimal scale
    "multimodal_features": """
        SELECT doc_id AS media_id,
               CASE WHEN doc_id % 2 = 0 THEN 'image' ELSE 'audio' END AS kind,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               array_to_string(list_transform(range(0, 32), i ->
                   printf('%.8f',
                          CAST('0x' || substr(md5(text || '|' || CAST(i // 16 AS VARCHAR)),
                                              (i % 16) * 2 + 1, 2) AS INT)
                          / 256.0)), ',') AS features_csv
        FROM documents
    """,
    "simhash_pairs": f"""
        WITH sigs AS ({_SIMHASH_SIGS_SQL})
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
        FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
        WHERE bit_count(xor(a.sig, b.sig)) <= 8
    """,
    # replicates pipeline.multimodal.audio_frame_features with the fake
    # md5-stream decoder: sample j = (byte_j - 128)/128 where byte_j is
    # byte j%16 of md5(payload|j//16); per-frame energy is an exact
    # integer sum, rms = sqrt(energy/(128^2*1024)) (correctly-rounded
    # sqrt of an exact double on both engines); zero-crossings compare
    # consecutive sample signs (b < 128) within the frame
    "audio_frame_features": """
        WITH p AS (
            SELECT doc_id AS media_id, text,
                   greatest(1024, least(CAST(octet_length(encode(text)) AS BIGINT) * 16,
                                        32768)) AS n
            FROM documents
            WHERE doc_id % 2 = 1 AND doc_id % 5 = 1
        ), bh AS (
            SELECT media_id, n, k, md5(text || '|' || CAST(k AS VARCHAR)) AS h
            FROM (SELECT media_id, text, n, unnest(range(0, (n + 15) // 16)) AS k FROM p)
        ), samples AS (
            SELECT media_id, n, k * 16 + off AS j,
                   CAST('0x' || substr(h, off * 2 + 1, 2) AS INT) AS b
            FROM (SELECT media_id, n, k, h, unnest(range(0, 16)) AS off FROM bh)
            WHERE k * 16 + off < n
        ), sgn AS (
            SELECT media_id, n, j, b, (b < 128) AS s,
                   lead(b < 128) OVER (PARTITION BY media_id ORDER BY j) AS s_next
            FROM samples
        ), contrib AS (
            SELECT media_id, n, j, b, s, s_next, unnest([j // 512 - 1, j // 512]) AS f
            FROM sgn
        )
        SELECT media_id, f AS frame_idx,
               sqrt(SUM((b - 128) * (b - 128)) / (16384.0 * 1024)) AS rms,
               CAST(SUM(CASE WHEN j - f * 512 < 1023 AND j < n - 1 AND s <> s_next
                             THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
        FROM contrib
        WHERE f >= 0 AND f <= (n - 1024) // 512 AND j - f * 512 < 1024
        GROUP BY media_id, f
    """,
    "ann_srp_topk": f"""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), sigs AS (
            SELECT b.vec_id,
                   CAST(SUM(CASE WHEN list_inner_product(b.v, pl.pv) > 0
                                 THEN CAST(1 AS BIGINT) << pl.p ELSE 0 END)
                        AS BIGINT) AS sig
            FROM base b CROSS JOIN {_srp_planes_values_sql()} AS pl(p, pv)
            GROUP BY b.vec_id
        ), probe AS (
            SELECT s.sig AS psig, b.v AS pv
            FROM sigs s JOIN base b USING (vec_id) WHERE b.vec_id = 0
        )
        SELECT s.vec_id, ROUND(list_cosine_similarity(b.v, p.pv), 6) AS cos_sim
        FROM sigs s JOIN base b USING (vec_id), probe p
        WHERE s.vec_id <> 0 AND bit_count(xor(s.sig, p.psig)) <= 2
        ORDER BY cos_sim DESC, s.vec_id ASC
        LIMIT 10
    """,
    "ann_pq_topk": _pq_oracle_sql(),
    "ann_ivf_topk": f"""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), dists AS (
            SELECT b.vec_id, b.v, c.c AS cell,
                   list_sum(list_transform(range(1, 65),
                                           i -> (b.v[i] - c.cv[i]) ** 2)) AS dsq
            FROM base b CROSS JOIN {_ivf_centroids_values_sql()} AS c(c, cv)
        ), assigned AS (
            SELECT vec_id, v, cell FROM (
                SELECT vec_id, v, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dsq ASC, cell ASC) AS rn
                FROM dists WHERE vec_id <> 0) WHERE rn = 1
        ), probe_cells AS (
            SELECT cell FROM (
                SELECT cell, row_number() OVER (ORDER BY dsq ASC, cell ASC) AS rn
                FROM dists WHERE vec_id = 0) WHERE rn <= 4
        ), probe AS (SELECT v AS pv FROM base WHERE vec_id = 0)
        SELECT a.vec_id, ROUND(list_cosine_similarity(a.v, p.pv), 6) AS cos_sim
        FROM assigned a, probe p
        WHERE a.cell IN (SELECT cell FROM probe_cells)
        ORDER BY cos_sim DESC, a.vec_id ASC
        LIMIT 10
    """,
    "daily_from_hourly": f"""
        SELECT date_trunc('day', ts) AS day, event_type,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM {_EVENTS_SQL}
        GROUP BY 1, 2
    """,
    "unpivot_events": f"""
        SELECT user_id, event_type, count(*) AS n
        FROM {_EVENTS_SQL}
        GROUP BY user_id, event_type
    """,
    "pivot_events": f"""
        SELECT user_id,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup
        FROM {_EVENTS_SQL}
        GROUP BY user_id
    """,
    "range_join": f"""
        SELECT l.event_id, l.user_id, l.ts, r.w_id, r.w_start, r.w_end
        FROM (SELECT event_id, user_id, ts FROM {_EVENTS_SQL}
              WHERE event_type = 'click') l
        JOIN (SELECT event_id AS w_id, user_id,
                     ts - INTERVAL 2 DAY AS w_start,
                     ts + INTERVAL 2 DAY AS w_end
              FROM {_EVENTS_SQL} WHERE event_id % 3 = 0) r
          ON l.user_id = r.user_id
         AND l.ts BETWEEN r.w_start AND r.w_end
    """,
    "asof_join": f"""
        SELECT l.event_id, l.user_id, l.ts,
               r.event_id AS p_event_id, r.value AS p_value
        FROM (SELECT event_id, user_id, ts FROM {_EVENTS_SQL}
              WHERE event_type = 'click') l
        ASOF LEFT JOIN
             (SELECT event_id, user_id, ts, value FROM {_EVENTS_SQL}
              WHERE event_type = 'purchase') r
          ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    "skew_agg": f"""
        SELECT event_type, count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
               MAX(value) AS max_value
        FROM {_EVENTS_SQL}
        GROUP BY event_type
    """,
    "stateful_sessions": f"""
        WITH m AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM {_EVENTS_SQL}
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM m
        ), g AS (
            SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_ts,
                   MAX(ts) + INTERVAL 30 MINUTE AS session_end,
                   count(*) AS n_events, SUM(value) AS sum_value
            FROM s GROUP BY user_id, sid
        )
        SELECT user_id, session_start, session_end, n_events,
               ROUND(sum_value, 6) AS sum_value
        FROM g
        WHERE last_ts + INTERVAL 30 MINUTE <=
              (SELECT max(ts) FROM {_EVENTS_SQL})
    """,
    "keyset_pagination": """
        SELECT o_orderkey, o_orderdate, o_totalprice FROM orders
        WHERE o_orderdate > TIMESTAMP '1996-06-01 00:00:00'
           OR (o_orderdate = TIMESTAMP '1996-06-01 00:00:00' AND o_orderkey > 3000)
        ORDER BY o_orderdate ASC, o_orderkey ASC
        LIMIT 50
    """,
    "rank_dedup": f"""
        SELECT lang, rk, doc_id, quality FROM (
            SELECT lang, doc_id, quality,
                   ROW_NUMBER() OVER (PARTITION BY lang
                                      ORDER BY quality DESC, doc_id ASC) AS rk
            FROM (SELECT doc_id, lang, {_QUALITY_SQL} AS quality
                  FROM ({_TEXT_STATS_SQL}) st
                  JOIN (SELECT doc_id AS did, lang FROM documents) d
                    ON st.doc_id = d.did)
        ) WHERE rk <= 3
    """,
    "user_stats": f"""
        SELECT user_id, count(*) AS n_events,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
               MIN(ts) AS first_ts, MAX(ts) AS last_ts
        FROM {_EVENTS_SQL}
        GROUP BY user_id
    """,
    "streaming_hourly_rollup": f"""
        SELECT date_trunc('hour', ts) AS bucket, event_type,
               count(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM {_EVENTS_SQL}
        GROUP BY 1, 2
    """,
    "sessionize": f"""
        WITH m AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                        THEN 1 ELSE 0 END AS new_s
            FROM {_EVENTS_SQL}
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
            SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sid
            FROM m
        )
        SELECT user_id, MIN(ts) AS session_start,
               MAX(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM s GROUP BY user_id, sid
    """,
    "semi_join": """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        GROUP BY o_orderpriority
    """,
    "anti_join": """
        SELECT c_mktsegment, COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        FROM customer
        WHERE c_acctbal > 6000
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '1995-01-01'
                            AND o_orderdate < TIMESTAMP '1996-01-01')
        GROUP BY c_mktsegment
    """,
    "scalar_subquery": """
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS total_price,
               COUNT(*) AS n
        FROM lineitem l JOIN (
            SELECT l_partkey AS ap_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(18,2))) AS part_sum_qty,
                   COUNT(*) AS part_cnt
            FROM lineitem GROUP BY l_partkey
        ) a ON l.l_partkey = a.ap_partkey
        WHERE CAST(l_quantity AS DECIMAL(18,2)) * part_cnt * 2 < part_sum_qty
    """,
    "rollup_agg": """
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag, l_linestatus) AS gid,
               COUNT(*) AS n,
               SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) / 100.0 AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "cube_agg": f"""
        SELECT event_type, date_trunc('day', ts) AS day,
               GROUPING(event_type, day) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
        FROM {_EVENTS_SQL}
        GROUP BY CUBE (event_type, day)
    """,
    "window_analytics": """
        SELECT o_orderkey, o_orderpriority, pr, cd, quartile, delta_prev
        FROM (
            SELECT o_orderkey, o_orderpriority,
                   ROUND(percent_rank() OVER w, 6) AS pr,
                   ROUND(cume_dist() OVER w, 6) AS cd,
                   ntile(4) OVER w AS quartile,
                   ROUND(o_totalprice - lag(o_totalprice) OVER w, 2)
                       AS delta_prev
            FROM orders
            WINDOW w AS (PARTITION BY o_orderpriority
                         ORDER BY o_totalprice, o_orderkey)
        ) WHERE o_orderkey % 20 = 0
    """,
    "props_map_explode": """
        WITH kv AS (
            SELECT event_type, props,
                   unnest(json_keys(CAST(props AS JSON))) AS key
            FROM events
        )
        SELECT event_type, key, COUNT(*) AS n,
               CAST(SUM(CAST(json_extract_string(CAST(props AS JSON),
                                                 '$.' || key)
                             AS BIGINT)) AS BIGINT) AS sum_val
        FROM kv GROUP BY event_type, key
    """,
    "string_funcs": """
        SELECT doc_id,
               regexp_extract(text, '([0-9]+)', 1) AS first_num,
               levenshtein(lang, source) AS lev,
               reverse(lang) AS rev_lang,
               lpad(CAST(doc_id AS VARCHAR), 8, '0') AS padded,
               split_part(source, 'c', 2) AS src_num,
               translate(lang, 'en', 'xy') AS translated
        FROM documents WHERE doc_id % 10 = 0
    """,
    "datetime_funcs": """
        SELECT o_orderkey,
               dayofweek(o_orderdate) + 1 AS dow,
               dayofyear(o_orderdate) AS doy,
               weekofyear(o_orderdate) AS week,
               CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)
                   AS quarter_start,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
                   AS month_end,
               datediff('day', DATE '1995-01-01',
                        CAST(o_orderdate AS DATE)) AS days_since,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP)
                   AS plus_3mo
        FROM orders WHERE o_orderkey % 100 = 0
    """,
    "pivot_dynamic": f"""
        SELECT user_id,
               CAST(SUM(CASE WHEN event_type = 'click'
                    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS click,
               CAST(SUM(CASE WHEN event_type = 'error'
                    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS error,
               CAST(SUM(CASE WHEN event_type = 'purchase'
                    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS purchase,
               CAST(SUM(CASE WHEN event_type = 'signup'
                    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS signup,
               CAST(SUM(CASE WHEN event_type = 'view'
                    THEN CAST(value AS DECIMAL(18,6)) END) AS DOUBLE) AS view
        FROM {_EVENTS_SQL}
        GROUP BY user_id
    """,
    "corpus_mixture": """
        WITH mix AS (
            SELECT 'en-full' AS source_name, n_chars FROM documents
            WHERE lang = 'en'
              AND CAST(('0x' || substring(
                    md5('mix-v1:en-full' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 10000 < 10000
            UNION ALL
            SELECT 'de-half', n_chars FROM documents
            WHERE lang = 'de'
              AND CAST(('0x' || substring(
                    md5('mix-v1:de-half' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 10000 < 5000
            UNION ALL
            SELECT 'fr-tenth', n_chars FROM documents
            WHERE lang = 'fr'
              AND CAST(('0x' || substring(
                    md5('mix-v1:fr-tenth' || CAST(doc_id AS VARCHAR)), 1, 8))
                  AS BIGINT) % 10000 < 1000
        )
        SELECT source_name, COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM mix GROUP BY source_name
    """,
    "set_intersect": """
        SELECT user_id FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
    "set_except": """
        SELECT user_id FROM events WHERE event_type = 'view'
        EXCEPT
        SELECT user_id FROM events WHERE event_type = 'error' AND value > 95
    """,
    "stats_agg": """
        SELECT l_returnflag,
               ROUND(stddev_samp(l_discount), 6) AS sd_disc,
               ROUND(var_samp(l_quantity), 6) AS var_qty,
               ROUND(corr(l_quantity, l_extendedprice), 6) + 0.0 AS corr_qp,
               ROUND(covar_samp(l_quantity, l_extendedprice), 4) + 0.0 AS cov_qp
        FROM lineitem GROUP BY l_returnflag
    """,
    "histogram": """
        SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS bin,
               COUNT(*) AS n
        FROM lineitem GROUP BY 1
    """,
    "hash_sample": """
        SELECT doc_id, lang FROM documents
        WHERE CAST(('0x' || substring(
                  md5('corpus-v1' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 10000 < 1000
    """,
    "stratified_sample": """
        SELECT doc_id, lang FROM documents
        WHERE CAST(('0x' || substring(
                  md5('corpus-v1' || CAST(doc_id AS VARCHAR)), 1, 8))
              AS BIGINT) % 10000
              < CASE lang WHEN 'en' THEN 5000 WHEN 'de' THEN 2000
                          WHEN 'zh' THEN 1000 ELSE 500 END
    """,
    "bm25_search": r"""
        WITH d AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM documents
        ),
        st AS (
            SELECT (SELECT COUNT(*) FROM documents) AS n,
                   (SELECT AVG(len(string_split_regex(lower(trim(text)),
                                                      '\s+')))
                    FROM documents) AS avgdl
        ),
        e AS (
            SELECT doc_id, len(toks) AS dl,
                   unnest(list_filter(toks,
                       t -> t IN ('join', 'scan', 'filter'))) AS term
            FROM d
        ),
        tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM e GROUP BY 1, 2, 3),
        sc AS (
            SELECT doc_id,
                   ln(1.0 + (st.n - (COUNT(*) OVER (PARTITION BY term)) + 0.5)
                            / ((COUNT(*) OVER (PARTITION BY term)) + 0.5))
                   * (tf * (1.2 + 1))
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / st.avgdl)) AS s
            FROM tf, st
        )
        SELECT doc_id, ROUND(SUM(s), 6) AS score FROM sc GROUP BY doc_id
        ORDER BY score DESC, doc_id ASC LIMIT 10
    """,
    "tfidf_terms": r"""
        WITH e AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\s+'))
                       AS term
            FROM documents
        ),
        tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM e GROUP BY 1, 2),
        sc AS (
            SELECT doc_id, term, tf,
                   ROUND(tf * (ln((1 + (SELECT COUNT(*) FROM documents))
                                  * 1.0
                                  / (1 + COUNT(*) OVER (PARTITION BY term)))
                               + 1), 6) AS tfidf
            FROM tf
        )
        SELECT doc_id, term, tf, tfidf FROM (
            SELECT *, row_number() OVER (PARTITION BY doc_id
                                         ORDER BY tfidf DESC, term ASC) AS rn
            FROM sc
        ) WHERE rn <= 5
    """,
    "incremental_dedup": f"""
        SELECT new_id, base_id, jaccard FROM (
            SELECT a.doc_id AS new_id, b.doc_id AS base_id,
                   ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))), 6)
                       AS jaccard
            FROM ({_SHINGLES_SQL}) a JOIN ({_SHINGLES_SQL}) b
              ON a.doc_id % 5 = 0 AND b.doc_id % 5 <> 0
        ) WHERE jaccard >= 0.8
    """,
    "chunk_documents": r"""
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM documents
        ),
        c AS (
            SELECT doc_id, toks, len(toks) AS n,
                   CAST(floor((greatest(len(toks) - 32, 0) + 23) / 24)
                        AS INTEGER) + 1 AS n_chunks
            FROM t
        )
        SELECT doc_id,
               CAST(unnest(range(0, n_chunks)) AS INTEGER) AS chunk_idx,
               array_to_string(
                   toks[unnest(range(0, n_chunks)) * 24 + 1
                        : unnest(range(0, n_chunks)) * 24 + 32], ' ')
                   AS chunk_text,
               CAST(least(32, n - unnest(range(0, n_chunks)) * 24)
                    AS INTEGER) AS chunk_n_tokens
        FROM c
    """,
    "funnel_steps": f"""
        WITH ev AS (
            SELECT user_id, ts, event_id, event_type FROM {_EVENTS_SQL}
            WHERE event_type IN ('view', 'click', 'purchase')
        ),
        s1 AS (
            SELECT user_id, min(row(ts, event_id)) AS k FROM ev
            WHERE event_type = 'view' GROUP BY user_id
        ),
        s2 AS (
            SELECT e.user_id, min(row(e.ts, e.event_id)) AS k
            FROM ev e JOIN s1 ON e.user_id = s1.user_id
            WHERE e.event_type = 'click' AND row(e.ts, e.event_id) > s1.k
            GROUP BY e.user_id
        ),
        s3 AS (
            SELECT e.user_id, min(row(e.ts, e.event_id)) AS k
            FROM ev e JOIN s2 ON e.user_id = s2.user_id
            WHERE e.event_type = 'purchase' AND row(e.ts, e.event_id) > s2.k
            GROUP BY e.user_id
        )
        SELECT 1 AS step, 'view' AS step_name,
               (SELECT COUNT(*) FROM s1) AS n_users
        UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
    """,
    "cohort_retention": f"""
        WITH uw AS (
            SELECT DISTINCT user_id,
                   CAST(date_trunc('week', ts) AS DATE) AS w
            FROM {_EVENTS_SQL}
        ),
        f AS (SELECT user_id, min(w) AS cohort_week FROM uw GROUP BY user_id),
        act AS (
            SELECT f.cohort_week,
                   CAST((uw.w - f.cohort_week) / 7 AS INTEGER) AS week_offset
            FROM uw JOIN f ON uw.user_id = f.user_id
        ),
        agg AS (
            SELECT cohort_week, week_offset, COUNT(*) AS n_users
            FROM act GROUP BY cohort_week, week_offset
        )
        SELECT cohort_week, week_offset, n_users,
               ROUND(CAST(n_users AS DOUBLE) /
                     MAX(CASE WHEN week_offset = 0 THEN n_users END)
                         OVER (PARTITION BY cohort_week), 6) AS retention
        FROM agg
    """,
    "boilerplate_stats": f"""
        WITH sh AS ({_SHINGLES_SQL}),
        e AS (SELECT doc_id, unnest(s) AS g FROM sh),
        dfreq AS (SELECT g, COUNT(*) AS df FROM e GROUP BY g)
        SELECT doc_id,
               COUNT(*) AS n_shingles,
               CAST(SUM(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_boilerplate,
               ROUND(SUM(CASE WHEN df >= 5 THEN 1 ELSE 0 END) * 1.0
                     / COUNT(*), 6) AS boilerplate_ratio
        FROM e JOIN dfreq USING (g)
        GROUP BY doc_id
    """,
    "contamination_check": f"""
        WITH sh AS ({_SHINGLES_SQL}),
        be AS (
            SELECT doc_id AS bench_id, len(s) AS bench_n, unnest(s) AS g
            FROM sh WHERE doc_id % 23 = 0
        ),
        de AS (SELECT doc_id, unnest(s) AS g FROM sh),
        j AS (
            SELECT de.doc_id, be.bench_id, be.bench_n,
                   COUNT(*) AS n_overlap
            FROM de JOIN be USING (g)
            GROUP BY de.doc_id, be.bench_id, be.bench_n
        )
        SELECT doc_id, bench_id, n_overlap,
               ROUND(CAST(n_overlap AS DOUBLE) / bench_n, 6) AS ratio
        FROM j
        WHERE CAST(n_overlap AS DOUBLE) / bench_n >= 0.5
    """,
    "dataset_split": """
        WITH b AS (
            SELECT n_chars,
                   CAST(('0x' || substring(
                       md5('corpus-v1' || CAST(doc_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 10000 AS bucket
            FROM documents
        )
        SELECT CASE WHEN bucket < 8000 THEN 'train'
                    WHEN bucket < 9000 THEN 'val'
                    ELSE 'test' END AS split,
               COUNT(*) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS sum_chars
        FROM b GROUP BY 1
    """,
    "sequence_packing": """
        WITH t AS (
            SELECT lang, doc_id,
                   CAST(n_chars // 4 + 1 AS BIGINT) AS n_tokens
            FROM documents
        ), p AS (
            SELECT lang, n_tokens,
                   CAST(COALESCE(SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) // 2048 AS BIGINT) AS pack_id
            FROM t
        )
        SELECT lang, pack_id, COUNT(*) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
        FROM p GROUP BY lang, pack_id
    """,
    "label_balance": """
        SELECT lang, n, ROUND(n / SUM(n) OVER (), 6) AS fraction
        FROM (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n
              FROM documents GROUP BY lang)
    """,
    "json_extract": """
        SELECT event_type, CAST(SUM(k) AS BIGINT) AS sum_k,
               COUNT(CASE WHEN k > 50 THEN 1 END) AS n_high,
               MIN(k) AS min_k, MAX(k) AS max_k
        FROM (SELECT event_type,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events)
        GROUP BY event_type
    """,
    "grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               GROUPING(l_returnflag, l_linestatus) AS gid,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS sum_price
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    "percentile_agg": """
        SELECT l_returnflag,
               ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50_qty,
               ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
               ROUND(quantile_cont(l_extendedprice, 0.75), 6) AS p75_price
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "rolling_window": f"""
        SELECT event_id, user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(epoch(ts) AS BIGINT)
                   RANGE BETWEEN 7200 PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS roll_sum
        FROM {_EVENTS_SQL}
    """,
    "first_last_window": f"""
        SELECT DISTINCT user_id,
               first_value(event_type) OVER w AS first_type,
               last_value(event_type) OVER w AS last_type
        FROM {_EVENTS_SQL}
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    """,
    "audio_frames": """
        WITH a AS (
            SELECT doc_id AS media_id,
                   8000 * (1 + doc_id % 2) AS sample_rate,
                   (n_chars * 37) % 20000 AS n_samples
            FROM documents
        ), f AS (
            SELECT media_id, sample_rate,
                   CASE WHEN n_samples >= 1024
                        THEN (n_samples - 1024) // 512 + 1
                        ELSE 0 END AS n_frames
            FROM a
        )
        SELECT media_id,
               unnest(generate_series(0, n_frames - 1)) AS frame_idx,
               unnest(generate_series(0, n_frames - 1)) * 512 AS start_sample,
               unnest(generate_series(0, n_frames - 1)) * 512 + 1024 AS end_sample,
               ROUND(unnest(generate_series(0, n_frames - 1)) * 512 * 1000.0
                     / sample_rate, 6) AS start_ms
        FROM f WHERE n_frames > 0
    """,
    "bloom_pruned_join": """
        SELECT o_orderpriority, COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
        GROUP BY o_orderpriority
    """,
    "scd2_intervals": f"""
        WITH c AS (
            SELECT user_id, ts, event_id, event_type,
                   lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev
            FROM {_EVENTS_SQL}
        ), k AS (
            SELECT user_id, ts, event_id, event_type FROM c
            WHERE prev IS NULL OR prev <> event_type
        )
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   IS NULL AS is_current
        FROM k
    """,
    "cdc_apply": """
        WITH w AS (
            SELECT o_custkey, o_orderstatus, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC,
                                               o_orderkey DESC) AS rn
            FROM orders
        ), ch AS (
            SELECT o_custkey AS k,
                   CASE WHEN o_orderstatus = 'F' THEN 'D' ELSE 'U' END AS op,
                   o_totalprice AS new_bal
            FROM w WHERE rn = 1
        )
        SELECT COALESCE(c_custkey, k) AS c_custkey, c_name, c_nationkey,
               c_mktsegment,
               CASE WHEN op IS NOT NULL THEN new_bal
                    ELSE c_acctbal END AS c_acctbal
        FROM customer FULL OUTER JOIN ch ON c_custkey = k
        WHERE op IS NULL OR op <> 'D'
    """,
    "distinct_count": """
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_supp,
               COUNT(DISTINCT l_partkey) AS n_part,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY l_returnflag
    """,
    "repetition_stats": r"""
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(trim(text)), '\s+') AS w
            FROM documents
        ), g AS (
            SELECT doc_id, w, len(w) AS n,
                   CASE WHEN len(w) >= 2
                        THEN list_transform(generate_series(1, len(w)-1),
                             i -> concat_ws(' ', w[i], w[i+1]))
                        ELSE [] END AS bg,
                   CASE WHEN len(w) >= 3
                        THEN list_transform(generate_series(1, len(w)-2),
                             i -> concat_ws(' ', w[i], w[i+1], w[i+2]))
                        ELSE [] END AS tg
            FROM t
        )
        SELECT doc_id,
               CAST(n AS BIGINT) AS n_tokens,
               ROUND(CASE WHEN n > 0
                          THEN (n - len(list_distinct(w))) / CAST(n AS DOUBLE)
                          ELSE 0.0 END, 6) AS dup_word_frac,
               ROUND(CASE WHEN n >= 2
                          THEN COALESCE(list_aggregate(
                                   list_transform(list_distinct(bg),
                                       g2 -> len(list_filter(bg, x -> x = g2))),
                                   'max'), 0) / CAST(n - 1 AS DOUBLE)
                          ELSE 0.0 END, 6) AS top_bigram_frac,
               ROUND(CASE WHEN n >= 3
                          THEN len(list_filter(tg,
                                   x -> len(list_filter(tg, y -> y = x)) > 1))
                               / CAST(n - 2 AS DOUBLE)
                          ELSE 0.0 END, 6) AS dup_trigram_frac
        FROM g
    """,
    "pii_scrub": f"""
        WITH s AS ({_PII_SYNTH_SQL})
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
               CAST(len(regexp_extract_all(text, '{_PII_IP}')) AS BIGINT) AS n_ips,
               CAST(len(regexp_extract_all(text, '{_PII_PHONE}')) AS BIGINT) AS n_phones,
               md5(regexp_replace(regexp_replace(regexp_replace(text,
                   '{_PII_EMAIL}', '<EMAIL>', 'g'),
                   '{_PII_IP}', '<IP>', 'g'),
                   '{_PII_PHONE}', '<PHONE>', 'g')) AS redacted_fp
        FROM s
    """,
    "url_normalize": r"""
        WITH s AS (
            SELECT doc_id,
                   concat('HTTPS://WWW.', source, '.Example.COM',
                          CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END,
                          '/Docs/', CAST(doc_id AS VARCHAR),
                          CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END,
                          '?utm_source=x&ref=', lang, '&b=2&a=1#frag') AS url
            FROM documents
        ), u AS (
            SELECT doc_id, regexp_replace(url, '#.*$', '') AS nf FROM s
        ), p AS (
            SELECT doc_id,
                   lower(regexp_extract(nf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
                   regexp_replace(lower(split_part(
                       regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
                       ':', 1)), '^www\.', '') AS host,
                   regexp_extract(nf, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)', 1) AS path0,
                   list_sort(list_filter(
                       string_split(regexp_extract(nf, '\?([^#]*)', 1), '&'),
                       pp -> NOT regexp_matches(pp, '^utm_')
                             AND NOT regexp_matches(pp, '^ref=')
                             AND pp <> '')) AS kept
            FROM u
        )
        SELECT doc_id,
               concat(scheme, '://', host,
                      CASE WHEN regexp_replace(path0, '/+$', '') = ''
                           THEN '/' ELSE regexp_replace(path0, '/+$', '') END,
                      CASE WHEN len(kept) > 0
                           THEN concat('?', array_to_string(kept, '&'))
                           ELSE '' END) AS url_norm,
               regexp_extract(host, '([^.]+\.[^.]+)$', 1) AS domain,
               CAST(len(kept) AS BIGINT) AS n_params
        FROM p
    """,
    "stream_stream_join": f"""
        SELECT v.user_id AS user_id,
               v.event_id AS view_id,
               p.event_id AS purchase_id,
               v.ts AS view_ts,
               p.ts AS purchase_ts
        FROM (SELECT * FROM {_EVENTS_SQL} e WHERE event_type = 'view') v
        JOIN (SELECT * FROM {_EVENTS_SQL} e WHERE event_type = 'purchase') p
          ON v.user_id = p.user_id
         AND p.ts > v.ts
         AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    "hybrid_search": r"""
        WITH d AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM documents
        ),
        st AS (
            SELECT (SELECT COUNT(*) FROM documents) AS n,
                   (SELECT AVG(len(string_split_regex(lower(trim(text)),
                                                      '\s+')))
                    FROM documents) AS avgdl
        ),
        e AS (
            SELECT doc_id, len(toks) AS dl,
                   unnest(list_filter(toks,
                       t -> t IN ('join', 'scan', 'filter'))) AS term
            FROM d
        ),
        tf AS (SELECT doc_id, dl, term, COUNT(*) AS tf FROM e GROUP BY 1, 2, 3),
        sc AS (
            SELECT doc_id,
                   ln(1.0 + (st.n - (COUNT(*) OVER (PARTITION BY term)) + 0.5)
                            / ((COUNT(*) OVER (PARTITION BY term)) + 0.5))
                   * (tf * (1.2 + 1))
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / st.avgdl)) AS s
            FROM tf, st
        ),
        bm AS (
            SELECT doc_id, ROUND(SUM(s), 6) AS bm25 FROM sc GROUP BY doc_id
            ORDER BY bm25 DESC, doc_id ASC LIMIT 50
        ),
        probe AS (
            SELECT CAST(embedding AS DOUBLE[]) AS pv
            FROM embeddings WHERE vec_id = 0
        ),
        rr AS (
            SELECT bm.doc_id, bm.bm25,
                   ROUND(list_cosine_similarity(
                       CAST(emb.embedding AS DOUBLE[]), probe.pv), 6) + 0.0 AS cos_sim
            FROM bm JOIN embeddings emb ON emb.vec_id = bm.doc_id, probe
        )
        SELECT doc_id, bm25, cos_sim,
               ROUND(0.1 * bm25 + cos_sim, 6) + 0.0 AS hybrid
        FROM rr
        ORDER BY hybrid DESC, doc_id ASC LIMIT 10
    """,
    "stream_enrich": f"""
        SELECT date_trunc('hour', e.ts) AS bucket,
               c.c_mktsegment,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
        FROM {_EVENTS_SQL} e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1, 2
    """,
    "embedding_outliers": r"""
        WITH cent AS (
            SELECT label, t.i AS i,
                   ROUND(AVG(CAST(embedding[t.i] AS DOUBLE)), 6) AS c
            FROM embeddings,
                 unnest(generate_series(1, len(embedding))) AS t(i)
            GROUP BY label, t.i
        ), cl AS (
            SELECT label, list(c ORDER BY i) AS centroid FROM cent GROUP BY label
        ), d AS (
            SELECT e.vec_id, e.label,
                   ROUND(sqrt(list_aggregate(list_transform(
                       generate_series(1, len(e.embedding)),
                       j -> (CAST(e.embedding[j] AS DOUBLE) - cl.centroid[j]) ^ 2),
                       'sum')), 6) AS dist
            FROM embeddings e JOIN cl ON e.label = cl.label
        )
        SELECT vec_id, label, dist,
               -- + 0.0 normalizes IEEE -0.0 (tiny negative z rounded)
               ROUND(CASE WHEN STDDEV_SAMP(dist) OVER (PARTITION BY label) > 0
                     THEN (dist - AVG(dist) OVER (PARTITION BY label))
                          / STDDEV_SAMP(dist) OVER (PARTITION BY label)
                     ELSE 0.0 END, 4) + 0.0 AS z,
               ROUND(CASE WHEN STDDEV_SAMP(dist) OVER (PARTITION BY label) > 0
                     THEN (dist - AVG(dist) OVER (PARTITION BY label))
                          / STDDEV_SAMP(dist) OVER (PARTITION BY label)
                     ELSE 0.0 END, 4) + 0.0 > 2.0 AS is_outlier
        FROM d
    """,
    "curation_pipeline": f"""
        WITH t AS (
            SELECT doc_id, text,
                   regexp_split_to_array(lower(trim(text)), '\\s+') AS w
            FROM documents
        ), g AS (
            SELECT doc_id, text, w, len(w) AS n,
                   CASE WHEN len(w) >= 2
                        THEN list_transform(generate_series(1, len(w)-1),
                             i -> concat_ws(' ', w[i], w[i+1]))
                        ELSE [] END AS bg
            FROM t
        ), rep AS (
            SELECT doc_id, CAST(n AS BIGINT) AS n_tokens,
                   ROUND(CASE WHEN n > 0
                              THEN (n - len(list_distinct(w))) / CAST(n AS DOUBLE)
                              ELSE 0.0 END, 6) AS dup_word_frac,
                   ROUND(CASE WHEN n >= 2
                              THEN COALESCE(list_aggregate(
                                       list_transform(list_distinct(bg),
                                           g2 -> len(list_filter(bg, x -> x = g2))),
                                       'max'), 0) / CAST(n - 1 AS DOUBLE)
                              ELSE 0.0 END, 6) AS top_bigram_frac
            FROM g
        ), lang AS (
            SELECT doc_id, {_LANG_PRED_SQL} AS lang_pred FROM ({_LANG_SCORES_SQL})
        ), pii AS (
            SELECT doc_id,
                   len(regexp_extract_all(text, '{_PII_EMAIL}'))
                   + len(regexp_extract_all(text, '{_PII_IP}'))
                   + len(regexp_extract_all(text, '{_PII_PHONE}')) AS n_pii
            FROM documents
        ), fp AS (
            SELECT doc_id,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
            FROM documents
        ), kept AS (
            SELECT r.doc_id, r.n_tokens, l.lang_pred, f.fp
            FROM rep r
            JOIN lang l USING (doc_id)
            JOIN pii p USING (doc_id)
            JOIN fp f USING (doc_id)
            WHERE l.lang_pred = 'en' AND r.n_tokens >= 30
              AND r.dup_word_frac <= 0.6 AND r.top_bigram_frac <= 0.05
              AND p.n_pii = 0
        )
        SELECT MIN(doc_id) AS doc_id, fp, MIN(n_tokens) AS n_tokens,
               MIN(lang_pred) AS lang_pred
        FROM kept GROUP BY fp
    """,
    "gap_fill": f"""
        WITH hourly AS (
            SELECT user_id, date_trunc('hour', ts) AS bucket,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS v
            FROM {_EVENTS_SQL} GROUP BY 1, 2
        ), spine AS (
            SELECT user_id,
                   unnest(generate_series(min(bucket), max(bucket),
                                          INTERVAL 1 HOUR)) AS bucket
            FROM hourly GROUP BY user_id
        )
        SELECT s.user_id, s.bucket, h.v IS NULL AS is_gap,
               last_value(h.v IGNORE NULLS)
                   OVER (PARTITION BY s.user_id ORDER BY s.bucket) AS v_filled
        FROM spine s LEFT JOIN hourly h
          ON s.user_id = h.user_id AND s.bucket = h.bucket
    """,
    "left_outer_join": f"""
        SELECT COALESCE(c.c_mktsegment, 'unmatched') AS segment,
               COUNT(*) AS n_events,
               COUNT(DISTINCT e.user_id) AS n_users
        FROM {_EVENTS_SQL} e LEFT JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY 1
    """,
    # frozen-centroid replay (same literals, exact L2 + row_number argmin
    # — the ann_ivf_topk technique), then the same in-cluster pair rule
    # and lowest-keep-id witness reduction as pipeline.similarity.semdedup
    "semdedup": f"""
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
            UNION ALL
            SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[]) FROM embeddings
        ), dists AS (
            SELECT b.vec_id, b.v, c.c AS cell,
                   list_sum(list_transform(range(1, 65),
                                           i -> (b.v[i] - c.cv[i]) ** 2)) AS dsq
            FROM base b CROSS JOIN {_ivf_centroids_values_sql()} AS c(c, cv)
        ), assigned AS (
            SELECT vec_id, v, cell FROM (
                SELECT vec_id, v, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dsq ASC, cell ASC) AS rn
                FROM dists) WHERE rn = 1
        ), pairs AS (
            SELECT b.vec_id AS drop_id, a.vec_id AS keep_id,
                   CAST(a.cell AS BIGINT) AS cluster,
                   ROUND(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
            FROM assigned a JOIN assigned b
              ON a.cell = b.cell AND a.vec_id < b.vec_id
        )
        SELECT drop_id, keep_id, cluster, cos_sim FROM (
            SELECT drop_id, keep_id, cluster, cos_sim,
                   row_number() OVER (PARTITION BY drop_id
                                      ORDER BY keep_id ASC) AS rn
            FROM pairs WHERE cos_sim >= 0.95)
        WHERE rn = 1
    """,
    # same md5 8-token window fingerprints, same >=2-distinct-docs rule,
    # same gaps-and-islands merge as pipeline.dedup.duplicate_spans
    "duplicate_spans": r"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 10000, text FROM documents
        ), t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM corpus
        ), w AS (
            SELECT doc_id,
                   unnest(generate_series(1, len(toks) - 7)) AS i, toks
            FROM t WHERE len(toks) >= 8
        ), fps AS (
            SELECT doc_id, i - 1 AS pos,
                   substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 16) AS fp
            FROM w
        ), dup AS (
            SELECT doc_id, pos FROM fps
            WHERE fp IN (SELECT fp FROM fps GROUP BY fp
                         HAVING count(DISTINCT doc_id) >= 2)
        ), marked AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos, 1, -9) OVER
                                (PARTITION BY doc_id ORDER BY pos) > 8
                        THEN 1 ELSE 0 END AS nw
            FROM dup
        ), isl AS (
            SELECT doc_id, pos,
                   sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS isl
            FROM marked
        )
        SELECT doc_id, CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + 8 - min(pos) AS BIGINT) AS span_len,
               count(*) AS n_windows
        FROM isl GROUP BY doc_id, isl
    """,
    # same half-doc planting, same anchor-window blocking (shared md5
    # 8-token window, bucket cap 1000), same exact 3-gram containment as
    # pipeline.dedup.anchor_window_candidates + shingle_containment_pairs
    "containment_dedup": r"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 10000,
                   array_to_string(
                       (string_split_regex(lower(trim(text)), '\s+'))
                           [1:greatest(len(string_split_regex(lower(trim(text)), '\s+')) // 2, 1)],
                       ' ') AS text
            FROM documents
        ), t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM corpus
        ), wf AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       generate_series(1, len(toks) - 7),
                       i -> substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 16)))) AS fp
            FROM t WHERE len(toks) >= 8
        ), ok_fp AS (
            SELECT fp FROM wf GROUP BY fp
            HAVING count(DISTINCT doc_id) BETWEEN 2 AND 1000
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM wf a JOIN wf b ON a.fp = b.fp AND a.doc_id < b.doc_id
            WHERE a.fp IN (SELECT fp FROM ok_fp)
        ), sh AS (
            SELECT doc_id,
                   CASE WHEN len(toks) >= 3
                        THEN list_distinct(list_transform(
                                 generate_series(1, len(toks) - 2),
                                 i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))
                        ELSE [array_to_string(toks, ' ')] END AS s
            FROM t
        )
        SELECT id_a, id_b, containment FROM (
            SELECT c.id_a, c.id_b,
                   ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / least(len(a.s), len(b.s)), 6) AS containment
            FROM cand c JOIN sh a ON c.id_a = a.doc_id
                        JOIN sh b ON c.id_b = b.doc_id
        ) WHERE containment >= 0.9
    """,
    # same frozen weight literals, same md5 low-60-bit bucket, same
    # bias + mean-of-weights fold as pipeline.text.quality_classifier
    "quality_classifier": f"""
        SELECT doc_id, n_tokens, qc_score, qc_score >= 0 AS qc_keep
        FROM ({_qc_scores_sql()})
    """,
    # transitive dedup map (min-label propagation unrolled) ⋈ frozen
    # quality scores → same (score DESC, id ASC) representative rule as
    # pipeline.dedup.cluster_representatives
    "cluster_representatives": f"""
        WITH j AS (
            SELECT cc.doc_id, cc.component AS canonical_id, qs.qc_score
            FROM ({_cc_unrolled_sql()}) cc
            JOIN ({_qc_scores_sql()}) qs ON cc.doc_id = qs.doc_id
        ), r AS (
            SELECT canonical_id, doc_id AS rep_id, qc_score AS rep_score,
                   CAST(count(*) OVER (PARTITION BY canonical_id) AS BIGINT)
                       AS n_members,
                   row_number() OVER (PARTITION BY canonical_id
                                      ORDER BY qc_score DESC, doc_id ASC) AS rn
            FROM j
        )
        SELECT canonical_id, rep_id, rep_score, n_members FROM r WHERE rn = 1
    """,
    # same md5-bucket split rule as dataset_split, same anchor-window
    # blocking as containment_dedup, same exact shingle Jaccard — the
    # whole chain replayed, as pipeline.contamination.split_leakage runs it
    "split_leakage": rf"""
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM documents
        ), wf AS (
            SELECT doc_id,
                   unnest(list_distinct(list_transform(
                       generate_series(1, len(toks) - 7),
                       i -> substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 16)))) AS fp
            FROM t WHERE len(toks) >= 8
        ), ok_fp AS (
            SELECT fp FROM wf GROUP BY fp
            HAVING count(DISTINCT doc_id) BETWEEN 2 AND 1000
        ), cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
            FROM wf a JOIN wf b ON a.fp = b.fp AND a.doc_id < b.doc_id
            WHERE a.fp IN (SELECT fp FROM ok_fp)
        ), pairs AS (
            SELECT c.id_a, c.id_b,
                   ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                         / len(list_distinct(list_concat(a.s, b.s))), 6)
                       AS jaccard
            FROM cand c JOIN ({_SHINGLES_SQL}) a ON c.id_a = a.doc_id
                        JOIN ({_SHINGLES_SQL}) b ON c.id_b = b.doc_id
        ), sp AS (
            SELECT doc_id,
                   CASE WHEN bucket < 8000 THEN 'train'
                        WHEN bucket < 9000 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT doc_id,
                         CAST(('0x' || substring(
                             md5('corpus-v1' || CAST(doc_id AS VARCHAR)), 1, 8))
                         AS BIGINT) % 10000 AS bucket
                  FROM documents)
        )
        SELECT p.id_a, sa.split AS split_a, p.id_b, sb.split AS split_b,
               p.jaccard
        FROM pairs p JOIN sp sa ON p.id_a = sa.doc_id
                     JOIN sp sb ON p.id_b = sb.doc_id
        WHERE p.jaccard >= 0.8 AND sa.split <> sb.split
    """,
    # same fixed-width bins, totals, and eps-smoothed log terms as
    # pipeline.validate.distribution_drift (+0.0 pins the zero sign)
    "distribution_drift": """
        WITH a AS (
            SELECT CAST(FLOOR(n_chars / 100.0) AS BIGINT) AS bin,
                   COUNT(*) AS n_a
            FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
        ), b AS (
            SELECT CAST(FLOOR(n_chars / 100.0) AS BIGINT) AS bin,
                   COUNT(*) AS n_b
            FROM documents WHERE doc_id % 2 = 1 GROUP BY 1
        ), j AS (
            SELECT COALESCE(a.bin, b.bin) AS bin,
                   CAST(COALESCE(n_a, 0) AS BIGINT) AS n_a,
                   CAST(COALESCE(n_b, 0) AS BIGINT) AS n_b
            FROM a FULL OUTER JOIN b ON a.bin = b.bin
        ), p AS (
            SELECT bin, n_a, n_b,
                   n_a / (SUM(n_a) OVER ()) AS p_a,
                   n_b / (SUM(n_b) OVER ()) AS p_b
            FROM j
        )
        SELECT bin, n_a, n_b,
               ROUND(p_a, 6) AS p_a, ROUND(p_b, 6) AS p_b,
               ROUND((p_a - p_b) * ln((p_a + 1e-6) / (p_b + 1e-6)), 6) + 0.0
                   AS psi_term
        FROM p
    """,
    # same seeded md5 hash, same (hash, id) within-shard order as
    # pipeline.sampling.shuffle_shards
    "shuffle_shards": """
        WITH h AS (
            SELECT doc_id,
                   CAST('0x' || substr(md5('shuf-v1:' || CAST(doc_id AS VARCHAR)),
                                       18, 15) AS BIGINT) AS _h
            FROM documents
        )
        SELECT doc_id,
               CAST(_h % 8 AS INTEGER) AS shard,
               CAST(row_number() OVER (PARTITION BY _h % 8
                                       ORDER BY _h ASC, doc_id ASC) AS BIGINT)
                   AS shard_pos
        FROM h
    """,

    # same ownership rule (lowest doc_id per fingerprint), same interval
    # merge, same token rebuild as pipeline.dedup.remove_duplicate_spans
    "remove_duplicate_spans": r"""
        WITH corpus AS (
            SELECT doc_id, text FROM documents
            UNION ALL SELECT doc_id + 10000, text FROM documents
        ), t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM corpus
        ), w AS (
            SELECT doc_id,
                   unnest(generate_series(1, len(toks) - 7)) AS i, toks
            FROM t WHERE len(toks) >= 8
        ), fps AS (
            SELECT doc_id, i - 1 AS pos,
                   substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 16) AS fp
            FROM w
        ), stats AS (
            SELECT fp, count(DISTINCT doc_id) AS nd, min(doc_id) AS owner
            FROM fps GROUP BY fp
        ), marked AS (
            SELECT DISTINCT f.doc_id, f.pos
            FROM fps f JOIN stats s ON f.fp = s.fp
            WHERE s.nd >= 2 AND f.doc_id <> s.owner
        ), mk AS (
            SELECT doc_id, pos,
                   CASE WHEN pos - lag(pos, 1, -9) OVER
                                (PARTITION BY doc_id ORDER BY pos) > 8
                        THEN 1 ELSE 0 END AS nw
            FROM marked
        ), isl AS (
            SELECT doc_id, pos,
                   sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS UNBOUNDED PRECEDING) AS isl
            FROM mk
        ), iv AS (
            SELECT doc_id, min(pos) AS lo, max(pos) + 8 - 1 AS hi
            FROM isl GROUP BY doc_id, isl
        ), tok AS (
            SELECT doc_id, unnest(generate_series(1, len(toks))) - 1 AS p,
                   toks
            FROM t
        ), tk AS (
            SELECT doc_id, p, toks[p + 1] AS tk FROM tok
        ), rm AS (
            SELECT DISTINCT k.doc_id, k.p
            FROM tk k JOIN iv ON k.doc_id = iv.doc_id
                            AND k.p BETWEEN iv.lo AND iv.hi
        ), kept AS (
            SELECT tk.doc_id,
                   coalesce(string_agg(tk.tk, ' ' ORDER BY tk.p), '')
                       AS clean_text
            FROM tk LEFT JOIN rm ON tk.doc_id = rm.doc_id AND tk.p = rm.p
            WHERE rm.p IS NULL
            GROUP BY tk.doc_id
        ), rmn AS (
            SELECT doc_id, count(*) AS n_removed FROM rm GROUP BY doc_id
        )
        SELECT t.doc_id,
               coalesce(k.clean_text, '') AS clean_text,
               CAST(len(t.toks) AS BIGINT) AS n_tokens,
               CAST(coalesce(rmn.n_removed, 0) AS BIGINT) AS n_removed
        FROM t LEFT JOIN kept k ON t.doc_id = k.doc_id
               LEFT JOIN rmn ON t.doc_id = rmn.doc_id
    """,
    # same canonical-string casts, counts, and lexicographic min/max as
    # pipeline.validate.profile_table
    "profile_table": """
        SELECT 'doc_id' AS col_name,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               count(DISTINCT CAST(doc_id AS VARCHAR)) AS n_distinct,
               min(CAST(doc_id AS VARCHAR)) AS min_str,
               max(CAST(doc_id AS VARCHAR)) AS max_str
        FROM documents
    
UNION ALL

        SELECT 'text' AS col_name,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               count(DISTINCT CAST(text AS VARCHAR)) AS n_distinct,
               min(CAST(text AS VARCHAR)) AS min_str,
               max(CAST(text AS VARCHAR)) AS max_str
        FROM documents
    
UNION ALL

        SELECT 'lang' AS col_name,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               count(DISTINCT CAST(lang AS VARCHAR)) AS n_distinct,
               min(CAST(lang AS VARCHAR)) AS min_str,
               max(CAST(lang AS VARCHAR)) AS max_str
        FROM documents
    
UNION ALL

        SELECT 'source' AS col_name,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               count(DISTINCT CAST(source AS VARCHAR)) AS n_distinct,
               min(CAST(source AS VARCHAR)) AS min_str,
               max(CAST(source AS VARCHAR)) AS max_str
        FROM documents
    
UNION ALL

        SELECT 'n_chars' AS col_name,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               count(DISTINCT CAST(n_chars AS VARCHAR)) AS n_distinct,
               min(CAST(n_chars AS VARCHAR)) AS min_str,
               max(CAST(n_chars AS VARCHAR)) AS max_str
        FROM documents
    """,
    # same md5-low-60-bit row hashes, same commutative aggregates as
    # pipeline.validate.dataset_fingerprint
    "dataset_fingerprint": "\nUNION ALL\n".join(
        f"""
        SELECT '{c}' AS col_name,
               count(*) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_nulls,
               bit_xor(CAST('0x' || substr(md5(CAST({c} AS VARCHAR)), 18, 15)
                            AS BIGINT)) AS xor_hash,
               CAST(sum(CAST('0x' || substr(md5(CAST({c} AS VARCHAR)), 18, 15)
                             AS BIGINT) % 1000000007) AS BIGINT) AS sum_hash
        FROM documents
        """
        for c in ["doc_id", "text", "lang", "source", "n_chars"]
    ),
    # identical add-one smoothing closed form as pipeline.text
    # train_unigram_lm + perplexity_score: top-300 vocab by
    # (count DESC, token ASC) — a total order, so the cut is
    # deterministic in both engines
    "lm_perplexity": r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
            FROM documents
        ), counts AS (
            SELECT token, count(*) AS n FROM tok GROUP BY token
        ), total AS (
            SELECT sum(n) AS t FROM counts
        ), top AS (
            SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 300
        ), kept AS (
            SELECT count(*) AS v FROM top
        ), lm AS (
            SELECT token, ln((n + 1.0) / (t + v + 1)) AS logprob
            FROM top, total, kept
        ), oov AS (
            SELECT -ln(CAST(t + v + 1 AS DOUBLE)) AS o FROM total, kept
        )
        SELECT tok.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               ROUND(avg(-coalesce(lm.logprob, oov.o)), 6) AS avg_nll
        FROM tok LEFT JOIN lm USING (token), oov
        GROUP BY tok.doc_id
    """,
    # positional (non-distinct) word bigrams; (cnt DESC, gram ASC) is a
    # total order so the top-100 boundary matches exactly
    "top_bigrams": r"""
        WITH t AS (
            SELECT regexp_split_to_array(lower(trim(text)), '\s+') AS w
            FROM documents
        ), g AS (
            SELECT array_to_string(w[i:i+1], ' ') AS gram
            FROM t, unnest(range(1, len(w))) AS u(i)
            WHERE len(w) >= 2
        )
        SELECT gram, CAST(count(*) AS BIGINT) AS cnt
        FROM g GROUP BY gram
        ORDER BY cnt DESC, gram ASC
        LIMIT 100
    """,
    # one Lloyd round from the deterministic vec_id<8 init: nearest
    # centroid by squared L2 (ties → lowest cell, same as numpy argmin)
    # then per-(cell, dim) count + mean — replicates
    # pipeline.similarity.kmeans_assign + the lloyd_round update
    "kmeans_round": """
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ), cent AS (
            SELECT vec_id AS cell, v AS cv FROM base WHERE vec_id < 8
        ), dists AS (
            SELECT b.vec_id, b.v, c.cell,
                   list_sum(list_transform(range(1, 65),
                                           i -> (b.v[i] - c.cv[i]) ** 2)) AS dsq
            FROM base b CROSS JOIN cent c
        ), assigned AS (
            SELECT vec_id, v, cell FROM (
                SELECT vec_id, v, cell,
                       row_number() OVER (PARTITION BY vec_id
                                          ORDER BY dsq ASC, cell ASC) AS rn
                FROM dists) WHERE rn = 1
        )
        SELECT CAST(cell AS BIGINT) AS cell,
               CAST(i AS BIGINT) AS pos,
               CAST(count(*) AS BIGINT) AS n,
               ROUND(avg(v[i + 1]), 6) AS m
        FROM assigned, unnest(range(0, 64)) AS u(i)
        GROUP BY cell, i
    """,
    # the bucketed two-level construction reproduces the plain total
    # order exactly, so the oracle IS the naive form the Spark plan
    # deliberately avoids
    "global_row_ids": """
        SELECT doc_id, n_chars,
               CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1
                    AS BIGINT) AS row_id
        FROM documents
    """,
    # replay the KMV sketch: same 60-bit md5 hash, k=64 smallest
    # distinct values per group, same (k-1)/U_(k) estimator arithmetic
    # (exact-int → double conversions are IEEE-identical in both
    # engines)
    "kmv_distinct": """
        WITH hv AS (
            SELECT DISTINCT lang,
                   CAST(CAST('0x' || substr(md5(text), 18, 15) AS UBIGINT)
                        AS BIGINT) AS h
            FROM documents
        ), r AS (
            SELECT lang, h,
                   row_number() OVER (PARTITION BY lang ORDER BY h) AS rn
            FROM hv
        ), s AS (
            SELECT lang, count(*) AS n_sk, max(h) AS kth
            FROM r WHERE rn <= 64 GROUP BY lang
        )
        SELECT lang, CAST(n_sk AS INT) AS sketch_size,
               ROUND(CASE WHEN n_sk < 64 THEN CAST(n_sk AS DOUBLE)
                          ELSE 63.0 * 1152921504606846976.0
                               / CAST(kth AS DOUBLE) END, 4) AS est_distinct
        FROM s
    """,
    "streaming_dedup": f"""
        SELECT event_id, ts FROM {_EVENTS_SQL} GROUP BY event_id, ts
    """,
    # replay the exponential race: identical md5-derived u, -ln(u)/w
    # race key, (race ASC, doc_id ASC) rank per language
    "weighted_sample": """
        WITH r AS (
            SELECT lang, doc_id, n_chars,
                   -ln((CAST(CAST('0x' || substr(
                            md5('ws-v1:' || CAST(doc_id AS VARCHAR)), 18, 15)
                            AS UBIGINT) AS DOUBLE) + 1.0)
                        / 1152921504606846976.0)
                       / CAST(n_chars AS DOUBLE) AS race_key
            FROM documents WHERE n_chars > 0
        ), k AS (
            SELECT lang, doc_id, n_chars, race_key,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY race_key ASC, doc_id ASC) AS rn
            FROM r
        )
        SELECT lang, doc_id, n_chars, ROUND(race_key, 6) AS race_key
        FROM k WHERE rn <= 20
    """,
    # same deterministic 10% hash sample (first-8-hex md5 bucket rule
    # of pipeline.sampling.hash_bucket), then exact linear-interpolation
    # quantiles on the kept rows
    "sampled_quantiles": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_sample,
               ROUND(quantile_cont(value, 0.5), 6) AS q50,
               ROUND(quantile_cont(value, 0.9), 6) AS q90,
               ROUND(quantile_cont(value, 0.99), 6) AS q99
        FROM events
        WHERE CAST('0x' || substr(md5('sq-v1' || CAST(event_id AS VARCHAR)),
                                  1, 8) AS UBIGINT) % 10000 < 1000
        GROUP BY event_type
    """,
    # replay the deletion-neighborhood blocking (full-sequence signature
    # + every single-token-deletion signature) and the exact Levenshtein
    # verification on the shared-signature candidates
    "edit_distance_pairs": r"""
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks,
                   text
            FROM documents
        ), e AS (
            -- one 60-bit md5 per TOKEN; deleted sequences are then
            -- summarized by exact rolling sums (O(n) per doc), mod
            -- 2^60 only at the end — replays the Spark construction
            SELECT doc_id, g.i AS p1,
                   CAST(CAST('0x' || substr(md5(toks[g.i]), 18, 15)
                        AS UBIGINT) AS HUGEINT) AS h
            FROM t, unnest(generate_series(1, len(toks))) AS g(i)
        ), s AS (
            SELECT doc_id, p1, h,
                   SUM(h) OVER (PARTITION BY doc_id) AS sm,
                   SUM(h * p1) OVER (PARTITION BY doc_id) AS wm,
                   COALESCE(SUM(h) OVER (PARTITION BY doc_id
                       ORDER BY p1 DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS tl
            FROM e
        ), sigs AS (
            SELECT DISTINCT doc_id,
                   substr(md5(
                       CAST(CAST((sm - h) % 1152921504606846976
                            AS BIGINT) AS VARCHAR)
                       || ':' ||
                       CAST(CAST((wm - h * p1 - tl) % 1152921504606846976
                            AS BIGINT) AS VARCHAR)), 1, 16) AS sig
            FROM s
            UNION
            SELECT DISTINCT doc_id,
                   substr(md5(
                       CAST(CAST(sm % 1152921504606846976
                            AS BIGINT) AS VARCHAR)
                       || ':' ||
                       CAST(CAST(wm % 1152921504606846976
                            AS BIGINT) AS VARCHAR)), 1, 16)
            FROM s
        ), canon AS (
            -- star construction: every bucket member pairs only with
            -- the bucket's minimum-id member (linear pair output)
            SELECT sig, MIN(doc_id) AS ca FROM sigs GROUP BY sig
        ), cand AS (
            SELECT DISTINCT c.ca AS id_a, s.doc_id AS id_b
            FROM sigs s JOIN canon c USING (sig)
            WHERE s.doc_id > c.ca
        )
        SELECT id_a, id_b,
               CAST(levenshtein(ta.text, tb.text) AS BIGINT) AS dist
        FROM cand
        JOIN t ta ON ta.doc_id = id_a
        JOIN t tb ON tb.doc_id = id_b
        WHERE levenshtein(ta.text, tb.text) <= 50
    """,
    # replay the exact-sum construction: integer x, DECIMAL(18,6) y,
    # exact moment sums, then the identical double closed form — no
    # float accumulation anywhere, so no merge-order divergence
    "trend_fit": f"""
        WITH b AS (
            -- floor, not CAST: epoch() carries fractional seconds and a
            -- bigint cast would round them, while Spark's
            -- unix_timestamp truncates
            SELECT event_type,
                   CAST(floor(epoch(ts)) AS BIGINT) - 1704067200 AS x,
                   CAST(value AS DECIMAL(18,6)) AS y
            FROM {_EVENTS_SQL}
        ), s AS (
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(x AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                   CAST(sum(CAST(x * x AS DECIMAL(38,0))) AS DOUBLE) AS sxx,
                   CAST(sum(y) AS DOUBLE) AS sy,
                   CAST(sum(y * y) AS DOUBLE) AS syy,
                   CAST(sum(CAST(x AS DECIMAL(19,0)) * y) AS DOUBLE) AS sxy
            FROM b GROUP BY event_type
        )
        SELECT event_type, n,
               ROUND(CASE WHEN n * sxx - sx * sx > 0
                          THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                     END, 6) + 0.0 AS slope,
               ROUND((sy - CASE WHEN n * sxx - sx * sx > 0
                                THEN (n * sxy - sx * sy) / (n * sxx - sx * sx)
                           END * sx) / n, 6) + 0.0 AS intercept,
               ROUND(CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
                          THEN ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                               / ((n * sxx - sx * sx) * (n * syy - sy * sy))
                     END, 6) + 0.0 AS r2
        FROM s
    """,
    # rebuild the derived snapshot and classify with IS DISTINCT FROM —
    # the same NULL semantics as the engine's NULL-tagged row hashes
    "snapshot_diff": """
        WITH a AS (SELECT doc_id, text, lang FROM documents),
        b AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 5 = 0 THEN text || ' v2' ELSE text END
                       AS text,
                   lang
            FROM documents WHERE doc_id % 7 <> 0
            UNION ALL
            SELECT doc_id + 1000000, text, lang FROM documents
            WHERE doc_id % 11 = 0
        ), j AS (
            SELECT CASE WHEN a.doc_id IS NULL THEN 'added'
                        WHEN b.doc_id IS NULL THEN 'removed'
                        WHEN a.text IS DISTINCT FROM b.text
                             OR a.lang IS DISTINCT FROM b.lang THEN 'changed'
                        ELSE 'unchanged' END AS status
            FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
        )
        SELECT status, CAST(count(*) AS BIGINT) AS n FROM j GROUP BY status
    """,
    # the lm_perplexity replay + per-language ntile over the same
    # (rounded avg_nll, doc_id) total order
    "quality_tiers": r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
            FROM documents
        ), counts AS (
            SELECT token, count(*) AS n FROM tok GROUP BY token
        ), total AS (
            SELECT sum(n) AS t FROM counts
        ), top AS (
            SELECT token, n FROM counts ORDER BY n DESC, token LIMIT 300
        ), kept AS (
            SELECT count(*) AS v FROM top
        ), lm AS (
            SELECT token, ln((n + 1.0) / (t + v + 1)) AS logprob
            FROM top, total, kept
        ), oov AS (
            SELECT -ln(CAST(t + v + 1 AS DOUBLE)) AS o FROM total, kept
        ), scored AS (
            SELECT tok.doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   ROUND(avg(-coalesce(lm.logprob, oov.o)), 6) AS avg_nll
            FROM tok LEFT JOIN lm USING (token), oov
            GROUP BY tok.doc_id
        ), tiered AS (
            SELECT s.doc_id, d.lang, s.n_tokens, s.avg_nll,
                   CAST(ntile(3) OVER (PARTITION BY d.lang
                                       ORDER BY s.avg_nll ASC, s.doc_id ASC)
                        AS BIGINT) AS tier
            FROM scored s JOIN documents d ON s.doc_id = d.doc_id
        )
        SELECT doc_id, lang, n_tokens, avg_nll, tier,
               CASE WHEN tier = 1 THEN 'head'
                    WHEN tier = 3 THEN 'tail'
                    ELSE 'middle' END AS tier_label
        FROM tiered
    """,
    "streaming_topk": f"""
        WITH c AS (
            SELECT date_trunc('hour', ts) AS window_start, event_type,
                   CAST(count(*) AS BIGINT) AS n
            FROM {_EVENTS_SQL} GROUP BY 1, 2
        )
        SELECT window_start, event_type, n,
               CAST(row_number() OVER (PARTITION BY window_start
                                       ORDER BY n DESC, event_type)
                    AS BIGINT) AS rnk
        FROM c QUALIFY rnk <= 3
    """,
    "kcenter_select": _kcenter_sql(5),
    "pagerank_transitions": _pagerank_sql(5, 0.85),
    "cms_counts": _CMS_SQL,
    "jl_projection": _jl_sql(16, 64, 7),
    # same window (leads evaluated over (ts, event_id) order), same
    # completeness filter (trailing windows dropped), same tie-break
    "top_paths": f"""
        WITH p AS (
            SELECT concat_ws('>', event_type,
                             lead(event_type, 1) OVER w,
                             lead(event_type, 2) OVER w) AS path,
                   lead(event_type, 2) OVER w AS last_step
            FROM {_EVENTS_SQL}
            WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        )
        SELECT path, CAST(count(*) AS BIGINT) AS n
        FROM p WHERE last_step IS NOT NULL
        GROUP BY path ORDER BY n DESC, path ASC LIMIT 20
    """,
    "event_pairs": f"""
        WITH ut AS (
            SELECT DISTINCT user_id AS u, event_type AS t FROM {_EVENTS_SQL}
        )
        SELECT a.t AS item_a, b.t AS item_b,
               CAST(count(*) AS BIGINT) AS n_users
        FROM ut a JOIN ut b ON a.u = b.u AND a.t < b.t
        GROUP BY item_a, item_b HAVING count(*) >= 2
    """,
    # identical trailing frame, identical exact integer moments, and the
    # identical double expression order (subtract mean, divide by
    # sqrt(floored var)) — bit-stable cross-engine
    "anomaly_hours": f"""
        WITH hourly AS (
            SELECT event_type AS grp, date_trunc('hour', ts) AS hour,
                   CAST(count(*) AS BIGINT) AS n
            FROM {_EVENTS_SQL} GROUP BY 1, 2
        ), stats AS (
            SELECT grp, hour, n,
                   CAST(count(*) OVER w AS BIGINT) AS m,
                   CAST(sum(n) OVER w AS BIGINT) AS s1,
                   CAST(sum(n * n) OVER w AS BIGINT) AS s2
            FROM hourly
            WINDOW w AS (PARTITION BY grp ORDER BY hour ASC
                         ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
        )
        SELECT grp AS event_type, hour, n,
               ROUND(ABS((CAST(n AS DOUBLE)
                          - CAST(s1 AS DOUBLE) / CAST(m AS DOUBLE))
                         / sqrt(GREATEST(
                               (CAST(s2 AS DOUBLE)
                                - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                                  / CAST(m AS DOUBLE))
                               / (CAST(m AS DOUBLE) - 1.0), 1.0))), 6)
                   + 0.0 AS abs_z
        FROM stats WHERE m >= 2
        ORDER BY abs_z DESC, event_type ASC, hour ASC LIMIT 20
    """,
    # DSIR: two add-one-smoothed top-300 unigram LMs (target = lang='en'
    # slice, raw = full corpus), per-doc log importance ratio summed over
    # tokens with each model's OOV fallback; rounded weight + doc_id is a
    # total order so the top-200 boundary replays exactly — replicates
    # pipeline.text.train_unigram_lm + dsir_select
    "dsir_select": r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
            FROM documents
        ), ttok AS (
            SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS token
            FROM documents WHERE lang = 'en'
        ), rcounts AS (
            SELECT token, count(*) AS n FROM tok GROUP BY token
        ), rtotal AS (SELECT sum(n) AS t FROM rcounts),
        rtop AS (SELECT token, n FROM rcounts ORDER BY n DESC, token LIMIT 300),
        rkept AS (SELECT count(*) AS v FROM rtop),
        rlm AS (
            SELECT token, ln((n + 1.0) / (t + v + 1)) AS lp FROM rtop, rtotal, rkept
        ),
        roov AS (SELECT -ln(CAST(t + v + 1 AS DOUBLE)) AS o FROM rtotal, rkept),
        tcounts AS (
            SELECT token, count(*) AS n FROM ttok GROUP BY token
        ), ttotal AS (SELECT sum(n) AS t FROM tcounts),
        ttop AS (SELECT token, n FROM tcounts ORDER BY n DESC, token LIMIT 300),
        tkept AS (SELECT count(*) AS v FROM ttop),
        tlm AS (
            SELECT token, ln((n + 1.0) / (t + v + 1)) AS lp FROM ttop, ttotal, tkept
        ),
        toov AS (SELECT -ln(CAST(t + v + 1 AS DOUBLE)) AS o FROM ttotal, tkept),
        vocab AS (
            SELECT coalesce(tlm.token, rlm.token) AS token,
                   tlm.lp AS lp_t, rlm.lp AS lp_r
            FROM tlm FULL OUTER JOIN rlm ON tlm.token = rlm.token
        )
        SELECT tok.doc_id,
               CAST(count(*) AS BIGINT) AS n_tokens,
               ROUND(sum(coalesce(vocab.lp_t, toov.o)
                         - coalesce(vocab.lp_r, roov.o)), 6) AS log_weight
        FROM tok LEFT JOIN vocab USING (token), toov, roov
        GROUP BY tok.doc_id
        ORDER BY log_weight DESC, doc_id ASC
        LIMIT 200
    """,
    "cql2_text": """
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        WHERE (o_totalprice BETWEEN 1000.0 AND 50000.0
               OR o_orderpriority IN ('1-URGENT', '2-HIGH'))
          AND o_orderpriority NOT LIKE '%LOW%'
          AND o_orderstatus <> 'P'
          AND o_orderdate >= DATE '1995-01-01'
    """,
    # first-occurrence novelty replayed on the string grams (the Spark
    # side joins on xxhash64(gram); min-per-gram is hash-invariant)
    "ngram_novelty": f"""
        WITH sh AS ({_SHINGLES_SQL}),
        firsts AS (
            SELECT g, MIN(doc_id) AS first_doc
            FROM (SELECT doc_id, unnest(s) AS g FROM sh) GROUP BY g
        ),
        novel AS (
            SELECT first_doc AS doc_id, COUNT(*) AS n_novel
            FROM firsts GROUP BY first_doc
        )
        SELECT sh.doc_id,
               CAST(len(sh.s) AS BIGINT) AS n_grams,
               CAST(COALESCE(novel.n_novel, 0) AS BIGINT) AS n_novel,
               ROUND(CAST(COALESCE(novel.n_novel, 0) AS DOUBLE)
                     / len(sh.s), 6) AS novelty_frac
        FROM sh LEFT JOIN novel USING (doc_id)
    """,
    # replay the HLL registers (same md5 hash, reg = h mod 512, rank
    # via exact integer bit-length) and the estimator: the harmonic
    # mean is the exact int64 sum Σ 2^(52-M_j) — zero registers
    # contribute 2^52 each — so raw AND linear-counting branches are
    # bit-identical; _HLL_C is alpha_512·512²·2^52 computed once in
    # Python and embedded verbatim on both engines
    "hll_distinct": f"""
        WITH hv AS (
            SELECT DISTINCT event_type,
                   CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 18, 15)
                        AS UBIGINT) AS BIGINT) AS h
            FROM events
        ), cells AS (
            SELECT event_type, h % 512 AS reg,
                   MAX(CASE WHEN h // 512 = 0 THEN 52
                            ELSE 52 - length(bin(h // 512)) END) AS mx
            FROM hv GROUP BY 1, 2
        ), agg AS (
            SELECT event_type,
                   CAST(SUM(CAST(pow(2.0, 52 - mx) AS BIGINT)) AS BIGINT) AS zi_p,
                   COUNT(*) AS np
            FROM cells GROUP BY 1
        )
        SELECT event_type,
               CAST(512 - np AS INT) AS zero_regs,
               ROUND(CASE WHEN ({_HLL_C!r})
                               / CAST(zi_p + (512 - np) * 4503599627370496
                                      AS DOUBLE) <= 1280.0
                           AND np < 512
                          THEN 512.0 * ln(512.0 / CAST(512 - np AS DOUBLE))
                          ELSE ({_HLL_C!r})
                               / CAST(zi_p + (512 - np) * 4503599627370496
                                      AS DOUBLE) END,
                     4) AS est_distinct
        FROM agg
    """,
    # replay the theta-sketch overlap: identical k=64 KMV sketches per
    # side, θ = least k-th minimum (int64 comparisons — hashes
    # overflow a double mantissa), counts below θ, then the same
    # scale division / Jaccard ratio
    "kmv_overlap": """
        WITH ha AS (
            SELECT DISTINCT CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 18, 15)
                   AS UBIGINT) AS BIGINT) AS h
            FROM events WHERE event_type = 'click'
        ), hb AS (
            SELECT DISTINCT CAST(CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 18, 15)
                   AS UBIGINT) AS BIGINT) AS h
            FROM events WHERE event_type = 'purchase'
        ), ska AS (
            SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM ha)
            WHERE rn <= 64
        ), skb AS (
            SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) rn FROM hb)
            WHERE rn <= 64
        ), th AS (
            SELECT LEAST(
                CASE WHEN (SELECT count(*) FROM ska) < 64
                     THEN 1152921504606846976 ELSE (SELECT max(h) FROM ska) END,
                CASE WHEN (SELECT count(*) FROM skb) < 64
                     THEN 1152921504606846976 ELSE (SELECT max(h) FROM skb) END
            ) AS t
        ), cnt AS (
            SELECT
                (SELECT count(*) FROM ska, th WHERE h < t) AS n_a,
                (SELECT count(*) FROM skb, th WHERE h < t) AS n_b,
                (SELECT count(*) FROM ska JOIN skb USING (h), th
                 WHERE h < t) AS n_inter,
                (SELECT t FROM th) AS t
        )
        SELECT CAST(n_a AS INT) AS n_a, CAST(n_b AS INT) AS n_b,
               CAST(n_inter AS INT) AS n_inter,
               ROUND(n_a * (1152921504606846976.0 / CAST(t AS DOUBLE)), 4) AS est_a,
               ROUND(n_b * (1152921504606846976.0 / CAST(t AS DOUBLE)), 4) AS est_b,
               ROUND(n_inter * (1152921504606846976.0 / CAST(t AS DOUBLE)), 4)
                   AS est_intersection,
               ROUND(CASE WHEN n_a + n_b - n_inter = 0 THEN 0.0
                          ELSE CAST(n_inter AS DOUBLE)
                               / CAST(n_a + n_b - n_inter AS DOUBLE) END, 6)
                   AS est_jaccard
        FROM cnt
    """,
    # replay the line-dedup decision exactly: same 60-bit md5 line key
    # (composite per-occurrence key for sub-10-char lines), same
    # first-occurrence window ordered (doc_id, pos), same rejoin —
    # string_agg skips the dropped (NULL) lines; COALESCE matches
    # Spark's array_join('') on a doc whose every line was dropped
    "line_dedup": """
        WITH ls AS (
            SELECT doc_id,
                   unnest(string_split(text, chr(10))) AS line,
                   unnest(range(0, len(string_split(text, chr(10))))) AS pos
            FROM documents
        ), keyed AS (
            SELECT doc_id, pos, line,
                   length(lower(trim(line))) >= 10 AS elig,
                   CAST(CAST('0x' || substr(md5(
                       CASE WHEN length(lower(trim(line))) >= 10
                            THEN lower(trim(line))
                            ELSE CAST(doc_id AS VARCHAR) || ':' ||
                                 CAST(pos AS VARCHAR) || ':' ||
                                 lower(trim(line)) END
                   ), 18, 15) AS UBIGINT) AS BIGINT) AS k
            FROM ls
        ), flagged AS (
            SELECT doc_id, pos, line,
                   (NOT elig) OR
                   row_number() OVER (PARTITION BY k ORDER BY doc_id, pos) = 1
                       AS keep
            FROM keyed
        )
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
               COALESCE(
                   string_agg(CASE WHEN keep THEN line END, chr(10)
                              ORDER BY pos),
                   '') AS text_deduped
        FROM flagged GROUP BY doc_id
    """,
}

# the streamed register store is bit-identical to the batch sketch
# (max-merge is associative/commutative/idempotent), so the streaming
# query shares the batch replay verbatim
ORACLE_SQL["streaming_hll"] = ORACLE_SQL["hll_distinct"]

# same fingerprints, bench semi join, islands, and token rebuild as
# pipeline.contamination.decontaminate_spans (k=8, bench = doc_id%23)
ORACLE_SQL["decontaminate"] = r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(lower(trim(text)), '\s+') AS toks
        FROM documents
    ), bw AS (
        SELECT unnest(generate_series(1, len(toks) - 7)) AS i, toks
        FROM t WHERE doc_id % 23 = 0 AND len(toks) >= 8
    ), bfp AS (
        SELECT DISTINCT
               substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 16) AS fp
        FROM bw
    ), w AS (
        SELECT doc_id,
               unnest(generate_series(1, len(toks) - 7)) AS i, toks
        FROM t WHERE len(toks) >= 8
    ), fps AS (
        SELECT doc_id, i - 1 AS pos,
               substr(md5(array_to_string(toks[i:i+7], ' ')), 1, 16) AS fp
        FROM w
    ), marked AS (
        SELECT DISTINCT f.doc_id, f.pos FROM fps f JOIN bfp USING (fp)
    ), mk AS (
        SELECT doc_id, pos,
               CASE WHEN pos - lag(pos, 1, -9) OVER
                            (PARTITION BY doc_id ORDER BY pos) > 8
                    THEN 1 ELSE 0 END AS nw
        FROM marked
    ), isl AS (
        SELECT doc_id, pos,
               sum(nw) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS UNBOUNDED PRECEDING) AS isl
        FROM mk
    ), iv AS (
        SELECT doc_id, min(pos) AS lo, max(pos) + 8 - 1 AS hi
        FROM isl GROUP BY doc_id, isl
    ), tok AS (
        SELECT doc_id, unnest(generate_series(1, len(toks))) - 1 AS p,
               toks
        FROM t
    ), tk AS (
        SELECT doc_id, p, toks[p + 1] AS tk FROM tok
    ), rm AS (
        SELECT DISTINCT k.doc_id, k.p
        FROM tk k JOIN iv ON k.doc_id = iv.doc_id
                        AND k.p BETWEEN iv.lo AND iv.hi
    ), kept AS (
        SELECT tk.doc_id,
               coalesce(string_agg(tk.tk, ' ' ORDER BY tk.p), '')
                   AS clean_text
        FROM tk LEFT JOIN rm ON tk.doc_id = rm.doc_id AND tk.p = rm.p
        WHERE rm.p IS NULL
        GROUP BY tk.doc_id
    ), rmn AS (
        SELECT doc_id, count(*) AS n_removed FROM rm GROUP BY doc_id
    )
    SELECT t.doc_id,
           coalesce(k.clean_text, '') AS clean_text,
           CAST(len(t.toks) AS BIGINT) AS n_tokens,
           CAST(coalesce(rmn.n_removed, 0) AS BIGINT) AS n_removed
    FROM t LEFT JOIN kept k ON t.doc_id = k.doc_id
           LEFT JOIN rmn ON t.doc_id = rmn.doc_id
"""

# same md5 bucket/sign hashes, integer raw counts, exact-int norm, and
# per-dim rounded division as pipeline.text.hash_embed (dim=32)
ORACLE_SQL["hash_embed"] = r"""
    WITH t AS (
        SELECT doc_id,
               unnest(string_split_regex(lower(trim(text)), '\s+')) AS tk
        FROM documents
    ), cell AS (
        SELECT doc_id,
               CAST(CAST('0x' || substr(md5('he-v1:' || tk), 1, 8)
                    AS UBIGINT) AS BIGINT) % 32 AS b,
               CASE WHEN CAST(CAST('0x' || substr(md5('he-v1:' || tk), 9, 8)
                              AS UBIGINT) AS BIGINT) % 2 = 0
                    THEN 1 ELSE -1 END AS s
        FROM t
    ), raw AS (
        SELECT doc_id, b, CAST(SUM(s) AS BIGINT) AS v
        FROM cell GROUP BY 1, 2
    ), nrm AS (
        SELECT doc_id, sqrt(CAST(SUM(v * v) AS DOUBLE)) AS nm
        FROM raw GROUP BY 1
    ), dims AS (
        SELECT doc_id, unnest(range(0, 32)) AS b
        FROM (SELECT DISTINCT doc_id FROM documents)
    )
    SELECT d.doc_id,
           CAST(d.b AS INT) AS pos,
           ROUND(CASE WHEN nm > 0
                      THEN CAST(COALESCE(raw.v, 0) AS DOUBLE) / nm
                      ELSE 0.0 END, 6) AS val
    FROM dims d
    LEFT JOIN raw ON d.doc_id = raw.doc_id AND d.b = raw.b
    JOIN nrm ON d.doc_id = nrm.doc_id
"""

# re-derive the hash_embed vectors (identical CTEs) and replay the
# dot-product scoring against doc 0's vector; the per-dim values are
# rounded to 6 before the dot on BOTH sides, and the final score is
# rounded to 6 (same absorption of sum-order ulps as embedding_topk)
ORACLE_SQL["hashed_text_topk"] = (
    "WITH he AS (" + ORACLE_SQL["hash_embed"] + ")"
    + r"""
    SELECT d.doc_id,
           ROUND(SUM(d.val * p.val), 6) AS score
    FROM he d JOIN he p ON d.pos = p.pos AND p.doc_id = 0
    WHERE d.doc_id <> 0
    GROUP BY d.doc_id
    ORDER BY score DESC, d.doc_id ASC
    LIMIT 10
"""
)

# same keys/window/rebuild as line_dedup, plus the standing-set anti
# filter (base = docs ≡0 mod 7's eligible line keys)
ORACLE_SQL["incremental_line_dedup"] = """
    WITH ls AS (
        SELECT doc_id,
               unnest(string_split(text, chr(10))) AS line,
               unnest(range(0, len(string_split(text, chr(10))))) AS pos
        FROM documents WHERE doc_id % 7 <> 0
    ), keyed AS (
        SELECT doc_id, pos, line,
               length(lower(trim(line))) >= 10 AS elig,
               CAST(CAST('0x' || substr(md5(
                   CASE WHEN length(lower(trim(line))) >= 10
                        THEN lower(trim(line))
                        ELSE CAST(doc_id AS VARCHAR) || ':' ||
                             CAST(pos AS VARCHAR) || ':' ||
                             lower(trim(line)) END
               ), 18, 15) AS UBIGINT) AS BIGINT) AS k
        FROM ls
    ), base AS (
        SELECT DISTINCT CAST(CAST('0x' || substr(md5(lower(trim(line))), 18, 15)
               AS UBIGINT) AS BIGINT) AS k
        FROM (
            SELECT unnest(string_split(text, chr(10))) AS line
            FROM documents WHERE doc_id % 7 = 0
        )
        WHERE length(lower(trim(line))) >= 10
    ), flagged AS (
        SELECT doc_id, pos, line,
               (NOT elig) OR (rn = 1 AND k NOT IN (SELECT k FROM base))
                   AS keep
        FROM (
            SELECT *, row_number() OVER (PARTITION BY k
                                         ORDER BY doc_id, pos) AS rn
            FROM keyed
        )
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           COALESCE(
               string_agg(CASE WHEN keep THEN line END, chr(10)
                          ORDER BY pos),
               '') AS text_deduped
    FROM flagged GROUP BY doc_id
"""

ORACLE_SQL["ann_ivfpq_topk"] = _ivfpq_oracle_sql().format(
    cents=_ivf_centroids_values_sql()
)

# the exactly-once sum-merge makes the streamed CMS cell table equal
# the batch sketch — replay cells + probe estimates over events
ORACLE_SQL["streaming_cms"] = f"""
    WITH ev AS ({_EVENTS_SQL}), probes AS (
        SELECT DISTINCT event_type FROM ev
    ), cells AS (
        SELECT CAST(CAST('0x' || substr(md5('cms-v1:' || CAST(r AS VARCHAR)
                                        || ':' || event_type), 1, 8) AS UBIGINT)
                    % 512 AS BIGINT) AS cell,
               r
        FROM ev, unnest(range(0, 4)) AS u(r)
    ), sk AS (
        SELECT r, cell, CAST(count(*) AS BIGINT) AS cnt
        FROM cells GROUP BY r, cell
    ), pc AS (
        SELECT p.event_type, u.r,
               CAST(CAST('0x' || substr(md5('cms-v1:' || CAST(u.r AS VARCHAR)
                                        || ':' || p.event_type), 1, 8) AS UBIGINT)
                    % 512 AS BIGINT) AS cell
        FROM probes p, unnest(range(0, 4)) AS u(r)
    )
    SELECT event_type,
           CAST(min(coalesce(sk.cnt, 0)) AS BIGINT) AS est_n
    FROM pc LEFT JOIN sk ON pc.r = sk.r AND pc.cell = sk.cell
    GROUP BY event_type
"""


def q_entity_match_pairs(spark, sf):
    """Record-linkage candidate+verify pairs (pipeline/entities.py):
    customers blocked on (nation, market segment), in-block STAR
    expansion after the skew cap (each record verifies only against
    its block's minimum-id record — m-1 pairs per block, linear output
    at any duplicate-cluster size; the all-pairs form stays available
    for the transitive-closure consumer, see q_entity_resolution),
    exact JVM Levenshtein verify. The tabular sibling of the document
    near-dup stack — one shuffle on the blocking key, never all-pairs.
    Oracle: blocked min-id join + DuckDB levenshtein() with the same
    block-size gate."""
    from stac_fastapi_duckdb_spark.pipeline.entities import blocked_match_pairs

    return blocked_match_pairs(
        _t(spark, sf, "customer"),
        "c_custkey",
        "c_name",
        ["c_nationkey", "c_mktsegment"],
        max_dist=1,
        pair_mode="star",
    )


def q_entity_resolution(spark, sf):
    """Entity clusters: verified match pairs → iterative min-label
    connected components seeded with EVERY customer (singletons map to
    themselves); entity_id = min custkey in the cluster. Oracle: the
    same propagation unrolled as chained CTEs (8 rounds ≫ observed
    cluster diameter; Spark side stops at fixpoint)."""
    from stac_fastapi_duckdb_spark.pipeline.entities import resolve_entities

    return resolve_entities(
        _t(spark, sf, "customer"),
        "c_custkey",
        "c_name",
        ["c_nationkey", "c_mktsegment"],
        max_dist=1,
    )


QUERIES["entity_match_pairs"] = q_entity_match_pairs
QUERIES["entity_resolution"] = q_entity_resolution

_ENTITY_PAIRS_SQL = """
    WITH blk AS (
        SELECT c_nationkey AS bk1, c_mktsegment AS bk2,
               c_custkey AS id, c_name AS nm
        FROM customer
    ), ok AS (
        SELECT bk1, bk2 FROM blk GROUP BY bk1, bk2
        HAVING COUNT(*) >= 2 AND COUNT(*) <= 10000
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
    FROM blk a
    JOIN blk b ON a.bk1 = b.bk1 AND a.bk2 = b.bk2 AND a.id < b.id
    JOIN ok ON a.bk1 = ok.bk1 AND a.bk2 = ok.bk2
    WHERE levenshtein(a.nm, b.nm) <= 1
"""

# the REGISTERED entity_match_pairs query runs in STAR mode (linear
# pair output); the all-pairs _ENTITY_PAIRS_SQL above stays as the
# edge feed for the entity_resolution CC replay below
ORACLE_SQL["entity_match_pairs"] = """
    WITH blk AS (
        SELECT c_nationkey AS bk1, c_mktsegment AS bk2,
               c_custkey AS id, c_name AS nm
        FROM customer
    ), grp AS (
        SELECT bk1, bk2, MIN(id) AS cid FROM blk GROUP BY bk1, bk2
        HAVING COUNT(*) >= 2 AND COUNT(*) <= 10000
    )
    SELECT g.cid AS id_a, b.id AS id_b,
           CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
    FROM grp g
    JOIN blk a ON a.bk1 = g.bk1 AND a.bk2 = g.bk2 AND a.id = g.cid
    JOIN blk b ON b.bk1 = g.bk1 AND b.bk2 = g.bk2 AND b.id > g.cid
    WHERE levenshtein(a.nm, b.nm) <= 1
"""


def _entity_cc_sql(rounds: int = 8) -> str:
    """Min-label propagation over the entity match pairs, unrolled —
    same construction as _cc_unrolled_sql but seeded from the customer
    table and the blocked-Levenshtein edge list."""
    ctes = [
        f"e AS (SELECT id_a AS n, id_b AS m FROM ({_ENTITY_PAIRS_SQL})"
        f"      UNION ALL SELECT id_b, id_a FROM ({_ENTITY_PAIRS_SQL}))",
        "l0 AS (SELECT c_custkey AS n, c_custkey AS comp FROM customer)",
    ]
    for i in range(rounds):
        ctes.append(
            f"l{i + 1} AS (SELECT l.n, LEAST(l.comp, COALESCE(MIN(r.comp), l.comp)) AS comp"
            f"  FROM l{i} l LEFT JOIN e ON l.n = e.n LEFT JOIN l{i} r ON e.m = r.n"
            f"  GROUP BY l.n, l.comp)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT n AS c_custkey, comp AS entity_id FROM l{rounds}"
    )


ORACLE_SQL["entity_resolution"] = _entity_cc_sql()


def q_scd2_as_of(spark, sf):
    """Time-travel snapshot: rebuild the SCD2 dimension from the events
    changelog, then read every user's state as of 2024-01-15T00:00Z —
    a map-only interval filter on top of the interval build (the
    Delta/Iceberg AS OF access pattern over an explicit SCD2 table).
    Oracle: the scd2_intervals SQL + the same covering-interval
    predicate."""
    from stac_fastapi_duckdb_spark.operators.cdc import (
        scd2_from_changelog,
        snapshot_as_of,
    )

    dim = scd2_from_changelog(
        _events(spark, sf),
        key_cols=["user_id"],
        ts_col="ts",
        attr_cols=["event_type"],
        tiebreak_cols=["event_id"],
    )
    return snapshot_as_of(dim, "2024-01-15 00:00:00")


QUERIES["scd2_as_of"] = q_scd2_as_of

ORACLE_SQL["scd2_as_of"] = f"""
    WITH c AS (
        SELECT user_id, ts, event_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev
        FROM {_EVENTS_SQL}
    ), k AS (
        SELECT user_id, ts, event_id, event_type FROM c
        WHERE prev IS NULL OR prev <> event_type
    ), iv AS (
        SELECT user_id, event_type, ts AS valid_from,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM k
    )
    SELECT user_id, event_type, valid_from, valid_to FROM iv
    WHERE valid_from <= TIMESTAMP '2024-01-15 00:00:00'
      AND (valid_to IS NULL OR valid_to > TIMESTAMP '2024-01-15 00:00:00')
"""


def q_phash_near_dup(spark, sf):
    """Perceptual-hash media near-dup (pipeline/multimodal.py
    perceptual_hash + phash_near_dup_pairs): block-average aHash over
    the decoded sample stream, pigeonhole band buckets, exact Hamming
    verify. The media table plants a same-length "re-encoded" twin for
    every document (value noise on a fixed grid — the scenario aHash
    is built for: hamming 0-4 vs ≥13 for unrelated pairs here, like a
    re-compressed image; geometry changes are NOT matched, by design).
    With the stub codec samples are code points; a real deployment
    decodes pixel luma into the same plan. Oracle: the full bit-vote +
    banding + Hamming replay in SQL."""
    from stac_fastapi_duckdb_spark.pipeline.multimodal import phash_near_dup_pairs

    docs = _t(spark, sf, "documents")
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    twins = docs.select(
        (F.col("doc_id") + 1000000).alias("media_id"),
        F.encode(F.translate(F.col("text"), "e", "f"), "UTF-8").alias("payload"),
    )
    return phash_near_dup_pairs(base.unionByName(twins), max_hamming=6)


QUERIES["phash_near_dup"] = q_phash_near_dup

ORACLE_SQL["phash_near_dup"] = """
    WITH media AS (
        SELECT doc_id AS id, text AS s FROM documents
        UNION ALL
        SELECT doc_id + 1000000, translate(text, 'e', 'f') FROM documents
    ), d AS (
        SELECT id, s, length(s) AS n FROM media WHERE length(s) > 0
    ), ch AS (
        SELECT id, ((u.i - 1) * 64) // n AS b,
               ascii(substr(s, CAST(u.i AS INT), 1)) AS c
        FROM d, unnest(range(1, n + 1)) AS u(i)
    ), bs AS (
        SELECT id, b, CAST(sum(c) AS BIGINT) AS bsum,
               CAST(count(*) AS BIGINT) AS cnt
        FROM ch GROUP BY id, b
    ), tot AS (
        SELECT id, CAST(sum(bsum) AS BIGINT) AS total,
               CAST(sum(cnt) AS BIGINT) AS n
        FROM bs GROUP BY id
    ), bits AS (
        -- exact integer cross-product vote, same as the engine:
        -- block_sum * n > total * block_len; absent blocks vote 0
        SELECT t.id, g.b,
               CASE WHEN bs.bsum IS NOT NULL
                         AND bs.bsum * t.n > t.total * bs.cnt
                    THEN 1 ELSE 0 END AS bit
        FROM tot t
        CROSS JOIN unnest(range(0, 64)) AS g(b)
        LEFT JOIN bs ON bs.id = t.id AND bs.b = g.b
    ), bands AS (
        SELECT id, b // 8 AS band, sum(bit << CAST(b % 8 AS INT)) AS val
        FROM bits GROUP BY id, b // 8
    ), sized AS (
        SELECT band, val FROM bands GROUP BY band, val
        HAVING COUNT(*) BETWEEN 2 AND 1000
    ), cand AS (
        SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM bands a
        JOIN bands b USING (band, val)
        JOIN sized sz ON sz.band = a.band AND sz.val = a.val
        WHERE a.id < b.id
    ), ham AS (
        SELECT c.id_a, c.id_b,
               CAST(sum(CASE WHEN ba.bit <> bb.bit THEN 1 ELSE 0 END)
                    AS BIGINT) AS hamming
        FROM cand c
        JOIN bits ba ON ba.id = c.id_a
        JOIN bits bb ON bb.id = c.id_b AND bb.b = ba.b
        GROUP BY c.id_a, c.id_b
    )
    SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 6
"""


def q_span_dedup(spark, sf):
    """ExactSubstr-style repeated-span dedup (pipeline/text.py
    span_dedup — Lee et al. 2022 semantics, suffix array replaced by
    the distributed k-token window-hash construction): every 4-token
    window is hashed; windows whose hash occurred earlier in corpus
    order are duplicates; covered tokens are removed keeping the
    corpus-first occurrence. The dup-position map serves from the
    frozen sidecar (_span_dup_map_artifact), so the query is the
    map-only tokenize + one rebuild join. Oracle: verbatim hash +
    keep-first window + coverage + rebuild replay in SQL."""
    from stac_fastapi_duckdb_spark.pipeline.text import span_dedup

    return span_dedup(
        _t(spark, sf, "documents"),
        k=4,
        dup_map=_span_dup_map_artifact(spark, sf),
    )


def _span_dup_map_artifact(spark, sf) -> DataFrame:
    """The corpus-constant dup-position map of span_dedup
    (``span_dup_map`` at k=4: doc_id, _dup_pos) as a FROZEN artifact —
    affected-docs cardinality, one explode + one hash-window shuffle
    at build, persisted once per session/SF (the written ExactSubstr
    sidecar)."""
    from stac_fastapi_duckdb_spark.pipeline.text import span_dup_map

    def build():
        return span_dup_map(_t(spark, sf, "documents"), k=4)

    return _artifact_df(spark, "span_dup_map", sf, build)


QUERIES["span_dedup"] = q_span_dedup

ORACLE_SQL["span_dedup"] = """
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ), win AS (
        SELECT doc_id, CAST(pos AS INTEGER) AS pos,
               CAST(CAST('0x' || substr(md5(array_to_string(
                   toks[pos+1 : pos+4], chr(31))), 18, 15)
                   AS UBIGINT) AS BIGINT) AS h
        FROM toks,
             unnest(range(0, greatest(len(toks) - 3, 0))) AS u(pos)
    ), dup AS (
        SELECT doc_id, pos FROM (
            SELECT doc_id, pos,
                   row_number() OVER (PARTITION BY h
                                      ORDER BY doc_id, pos) AS rn
            FROM win
        ) WHERE rn > 1
    ), cov AS (
        SELECT DISTINCT doc_id, pos + off AS ti
        FROM dup, unnest(range(0, 4)) AS o(off)
    ), tok_rows AS (
        SELECT doc_id, unnest(toks) AS tok,
               unnest(range(0, len(toks))) AS ti
        FROM toks
    ), marked AS (
        SELECT r.doc_id, r.tok, r.ti, (c.ti IS NOT NULL) AS rem
        FROM tok_rows r
        LEFT JOIN cov c ON r.doc_id = c.doc_id AND r.ti = c.ti
    ), agg AS (
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN rem THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_removed,
               COALESCE(string_agg(CASE WHEN NOT rem THEN tok END,
                                   ' ' ORDER BY ti), '')
                   AS text_deduped
        FROM marked GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(a.n_tokens, 0) AS n_tokens,
           COALESCE(a.n_removed, 0) AS n_removed,
           COALESCE(a.text_deduped, '') AS text_deduped
    FROM toks t LEFT JOIN agg a USING (doc_id)
"""


def q_mmr_rerank(spark, sf):
    """MMR diversified top-k (pipeline/similarity.py mmr_rerank,
    Carbonell & Goldstein 1998): cosine top-64 candidate pool against
    vec_id 0, then 8 greedy rounds of lam*rel - (1-lam)*max-sim-to-
    selected, each round one distributed argmax. Oracle: the pool +
    every greedy round unrolled as chained CTEs with the identical
    floor-half-up 6dp rounding and id tie-break."""
    from stac_fastapi_duckdb_spark.pipeline.similarity import mmr_rerank

    emb = _t(spark, sf, "embeddings")
    # probe via the pyarrow row-group point read (_probe_embedding) —
    # the same zero-Spark-job fetch the ANN queries use; a filter +
    # collect would schedule a job per query call for one row
    return mmr_rerank(
        emb.filter(F.col("vec_id") != 0),
        _probe_embedding(sf, 0),
        k=8,
        pool=64,
        lam=0.7,
    )


QUERIES["mmr_rerank"] = q_mmr_rerank


def _mmr_oracle_sql(k: int = 8, pool: int = 64, lam: float = 0.7) -> str:
    """Unrolled greedy-MMR replay: step i's penalty is the 6dp
    floor-rounded max cosine to the i-1 already-selected vectors; the
    lam/mu blend uses the same IEEE doubles the Spark side used.
    Every step CTE is AS MATERIALIZED — step i references s1..s{i-1},
    and DuckDB's default CTE inlining would re-expand the whole greedy
    prefix at every reference (exponential plan blowup)."""
    mu = 1.0 - lam
    r6 = "floor({} * 1e6 + 0.5) / 1e6"
    cos = (
        "list_cosine_similarity(c.v, (SELECT v FROM s{j}))"
    )
    parts = [
        f"""WITH cand AS MATERIALIZED (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                   {r6.format("list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0))")} AS rel
            FROM embeddings WHERE vec_id <> 0
            ORDER BY rel DESC, vec_id ASC LIMIT {pool}
        )"""
    ]
    for i in range(1, k + 1):
        if i == 1:
            pen = "0.0"
            where = ""
        else:
            sims = ", ".join(cos.format(j=j) for j in range(1, i))
            inner = f"greatest({sims})" if i > 2 else cos.format(j=1)
            pen = r6.format(inner)
            where = "WHERE " + " AND ".join(
                f"c.vec_id <> (SELECT vec_id FROM s{j})" for j in range(1, i)
            )
        # ::DOUBLE on the lam/mu literals is LOAD-BEARING: DuckDB types
        # a bare 17-digit literal as DECIMAL and evaluates the blend in
        # decimal arithmetic, which can land an ulp off the IEEE
        # double product at a rounding boundary (caught by the
        # embeddings differential fuzzer; same gotcha as the PQ
        # codebook literals)
        parts.append(
            f"""s{i} AS MATERIALIZED (
            SELECT c.vec_id, c.v, c.rel,
                   CAST({lam!r} AS DOUBLE) * c.rel
                     - CAST({mu!r} AS DOUBLE) * CAST({pen} AS DOUBLE) AS score
            FROM cand c {where}
            ORDER BY score DESC, c.vec_id ASC LIMIT 1
        )"""
        )
    finals = " UNION ALL ".join(
        f"SELECT {i} AS rank, vec_id, rel, score AS mmr_score FROM s{i}"
        for i in range(1, k + 1)
    )
    return ",\n".join(parts) + f"\nSELECT * FROM ({finals}) ORDER BY rank"


ORACLE_SQL["mmr_rerank"] = _mmr_oracle_sql()


def q_seasonal_decompose(spark, sf):
    """Additive seasonal decomposition of the per-type hourly event
    series (operators/analytics.py seasonal_decompose_hourly): centered
    25-row moving-average trend, hour-of-day seasonal means of the
    detrended series, residual — interior (full-window) rows only so
    every mean is an exact integer sum with ONE division. Oracle: the
    identical rollup + window + seasonal-mean replay."""
    from stac_fastapi_duckdb_spark.operators.analytics import (
        seasonal_decompose_hourly,
    )

    return seasonal_decompose_hourly(_events(spark, sf))


QUERIES["seasonal_decompose"] = q_seasonal_decompose

ORACLE_SQL["seasonal_decompose"] = f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS y
        FROM {_EVENTS_SQL}
        GROUP BY event_type, date_trunc('hour', ts)
    ), trended AS (
        SELECT event_type, bucket, y,
               SUM(y) OVER w AS sw, COUNT(*) OVER w AS cw
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                     ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ), interior AS (
        SELECT event_type, bucket, y, sw,
               EXTRACT(hour FROM bucket) AS hod
        FROM trended WHERE cw = 25
    ), seas AS (
        SELECT event_type, hod,
               (CAST(SUM(y) AS DOUBLE)
                - CAST(SUM(sw) AS DOUBLE) / 25.0)
               / CAST(COUNT(*) AS DOUBLE) AS seasonal
        FROM interior GROUP BY event_type, hod
    )
    SELECT i.event_type, i.bucket, i.y,
           floor((CAST(i.sw AS DOUBLE) / 25.0) * 1e6 + 0.5) / 1e6
               AS trend,
           floor(s.seasonal * 1e6 + 0.5) / 1e6 AS seasonal,
           floor((CAST(i.y AS DOUBLE) - CAST(i.sw AS DOUBLE) / 25.0
                  - s.seasonal) * 1e6 + 0.5) / 1e6 AS residual
    FROM interior i JOIN seas s USING (event_type, hod)
    ORDER BY i.event_type, i.bucket
"""


def q_streaming_upsert(spark, sf):
    """Continuously-maintained keyed LWW upsert store
    (streaming/upsert.py streaming_upsert): per-micro-batch winners
    merged into a standing one-row-per-key parquet table with atomic
    swap; the (ts, event_id) total order makes the merge idempotent,
    so the final table equals the batch last-per-key query — which is
    the oracle."""
    from stac_fastapi_duckdb_spark.streaming.upsert import streaming_upsert

    cur = streaming_upsert(spark, f"{sf}/events.parquet")
    return cur.select(
        "user_id", "event_id", "ts", "event_type", "value"
    ).orderBy("user_id")


QUERIES["streaming_upsert"] = q_streaming_upsert

ORACLE_SQL["streaming_upsert"] = f"""
    SELECT user_id, event_id, ts, event_type, value FROM (
        SELECT *, row_number() OVER (
            PARTITION BY user_id ORDER BY ts DESC, event_id DESC
        ) AS rn
        FROM {_EVENTS_SQL}
    ) WHERE rn = 1
    ORDER BY user_id
"""


def q_stratified_exact_sample(spark, sf):
    """Exact-quota stratified sampling (pipeline/sampling.py
    stratified_exact_sample): 20 documents per language, ranked by the
    60-bit md5 of salt+doc_id with doc_id tiebreak — the balanced
    eval-set draw. Oracle: identical hash + window replay."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import (
        stratified_exact_sample,
    )

    docs = _t(spark, sf, "documents").select("doc_id", "lang")
    return stratified_exact_sample(docs, "lang", 20, "doc_id")


QUERIES["stratified_exact_sample"] = q_stratified_exact_sample

ORACLE_SQL["stratified_exact_sample"] = """
    SELECT doc_id, lang, sample_rank FROM (
        SELECT doc_id, lang,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY CAST(CAST('0x' || substr(md5(
                       'ses-v1' || CAST(doc_id AS VARCHAR)), 18, 15)
                       AS UBIGINT) AS BIGINT) ASC,
                   doc_id ASC
               ) AS sample_rank
        FROM documents
    ) WHERE sample_rank <= 20
"""


def q_attribution(spark, sf):
    """Last-touch attribution (operators/analytics.py
    last_touch_attribution): purchases credited to the user's most
    recent view/click within 24h — one union + running
    last(ignorenulls) window, ties total-ordered by (ts, side,
    event_id). Oracle: identical union + IGNORE NULLS window replay."""
    from stac_fastapi_duckdb_spark.operators.analytics import (
        last_touch_attribution,
    )

    return last_touch_attribution(_events(spark, sf))


QUERIES["attribution"] = q_attribution

ORACLE_SQL["attribution"] = f"""
    WITH u AS (
        SELECT user_id AS u, ts AS t, 0 AS side, event_id AS id,
               {{'sid': event_id, 'stype': event_type, 'sts': ts}} AS src
        FROM {_EVENTS_SQL} WHERE event_type IN ('view', 'click')
        UNION ALL
        SELECT user_id, ts, 1, event_id,
               CAST(NULL AS STRUCT(sid BIGINT, stype VARCHAR,
                                   sts TIMESTAMP))
        FROM {_EVENTS_SQL} WHERE event_type = 'purchase'
    ), c AS (
        SELECT *,
               last_value(src IGNORE NULLS) OVER (
                   PARTITION BY u ORDER BY t, side, id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS lastsrc
        FROM u
    )
    SELECT id AS conversion_id, u AS user_id, t AS conversion_ts,
           CASE WHEN lastsrc IS NOT NULL
                     AND lastsrc.sts >= t - INTERVAL 24 HOURS
                THEN lastsrc.sid END AS source_id,
           CASE WHEN lastsrc IS NOT NULL
                     AND lastsrc.sts >= t - INTERVAL 24 HOURS
                THEN lastsrc.stype END AS source_type,
           CASE WHEN lastsrc IS NOT NULL
                     AND lastsrc.sts >= t - INTERVAL 24 HOURS
                THEN (epoch_us(t) - epoch_us(lastsrc.sts)) // 1000000
                END AS lag_sec
    FROM c WHERE side = 1
"""


def q_phash_dedup_map(spark, sf):
    """Media dedup map: phash near-dup pairs resolved to a
    media_id → canonical_id assignment via the shared iterative
    min-label connected-components operator (pipeline/dedup.py
    connected_components) — every planted re-encode twin collapses
    onto its original; singletons map to themselves. Oracle: the full
    phash pair replay closed with unrolled min-label CTE rounds."""
    from stac_fastapi_duckdb_spark.pipeline.dedup import connected_components
    from stac_fastapi_duckdb_spark.pipeline.multimodal import (
        phash_near_dup_pairs,
    )

    docs = _t(spark, sf, "documents")
    base = docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("payload"),
    )
    twins = docs.select(
        (F.col("doc_id") + 1000000).alias("media_id"),
        F.encode(F.translate(F.col("text"), "e", "f"), "UTF-8").alias("payload"),
    )
    media = base.unionByName(twins)
    pairs = phash_near_dup_pairs(media, max_hamming=6)
    comp = connected_components(
        pairs, all_ids=media.select("media_id"), id_col="media_id"
    )
    return comp.select("media_id", F.col("component").alias("canonical_id"))


QUERIES["phash_dedup_map"] = q_phash_dedup_map


def _phash_cc_sql(rounds: int = 6) -> str:
    """Unrolled min-label closure over the phash pair replay. The pair
    subquery is MATERIALIZED once (it's the expensive part — the e CTE
    references it for both edge directions)."""
    pairs = ORACLE_SQL["phash_near_dup"].strip()
    assert pairs.startswith("WITH ")
    # splice the pair replay in as a prefix CTE chain: rename its final
    # SELECT into a CTE by wrapping the whole statement
    ctes = [
        f"p AS MATERIALIZED ({pairs})",
        "ids AS (SELECT doc_id AS media_id FROM documents"
        " UNION ALL SELECT doc_id + 1000000 FROM documents)",
        "e AS (SELECT id_a AS n, id_b AS m FROM p"
        " UNION ALL SELECT id_b, id_a FROM p)",
        "l0 AS (SELECT media_id AS n, media_id AS comp FROM ids)",
    ]
    for i in range(rounds):
        ctes.append(
            f"l{i + 1} AS (SELECT l.n,"
            f" LEAST(l.comp, COALESCE(MIN(r.comp), l.comp)) AS comp"
            f" FROM l{i} l LEFT JOIN e ON l.n = e.n"
            f" LEFT JOIN l{i} r ON e.m = r.n"
            f" GROUP BY l.n, l.comp)"
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"\nSELECT n AS media_id, comp AS canonical_id FROM l{rounds}"
    )


ORACLE_SQL["phash_dedup_map"] = _phash_cc_sql()


def q_interval_overlap(spark, sf):
    """Interval-overlap join (operators/rangejoin.py
    interval_overlap_join): per-user view windows [ts, ts+30min]
    overlapped with purchase windows [ts-1h, ts] — granule-decomposed
    equi-join, each pair emitted once at its canonical first shared
    granule (no distinct). Oracle: the plain SQL overlap join (DuckDB
    plans it as IEJoin), same exact µs overlap length."""
    from stac_fastapi_duckdb_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    ev = _events(spark, sf)
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("v_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("v_end"),
    )
    buys = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("buy_id"),
        F.col("user_id"),
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("b_start"),
        F.col("ts").alias("b_end"),
    )
    j = interval_overlap_join(
        views, buys, "v_start", "v_end", "b_start", "b_end", on="user_id"
    )
    overlap_sec = F.expr(
        "(unix_micros(least(v_end, b_end))"
        " - unix_micros(greatest(v_start, b_start))) div 1000000"
    )
    return j.select(
        "user_id", "view_id", "buy_id", overlap_sec.alias("overlap_sec")
    )


QUERIES["interval_overlap"] = q_interval_overlap

ORACLE_SQL["interval_overlap"] = f"""
    WITH v AS (
        SELECT event_id AS view_id, user_id, ts AS v_start,
               ts + INTERVAL 30 MINUTES AS v_end
        FROM {_EVENTS_SQL} WHERE event_type = 'view'
    ), b AS (
        SELECT event_id AS buy_id, user_id, ts - INTERVAL 1 HOUR AS b_start,
               ts AS b_end
        FROM {_EVENTS_SQL} WHERE event_type = 'purchase'
    )
    SELECT v.user_id, view_id, buy_id,
           (epoch_us(least(v_end, b_end))
            - epoch_us(greatest(v_start, b_start))) // 1000000 AS overlap_sec
    FROM v JOIN b ON v.user_id = b.user_id
       AND v.v_start <= b.b_end AND b.b_start <= v.v_end
"""


def q_linear_attribution(spark, sf):
    """Multi-touch linear attribution (operators/analytics.py
    linear_attribution): every view/click in a purchase's 24h lookback
    shares 1/n credit — composed from the granule range join; NULL-row
    for unattributed purchases. Oracle: plain point-in-interval SQL
    join + count window + anti-join replay."""
    from stac_fastapi_duckdb_spark.operators.analytics import (
        linear_attribution,
    )

    out = linear_attribution(_events(spark, sf))
    credit6 = (
        F.floor(F.col("credit") * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)
    ).alias("credit")
    return out.select(
        "conversion_id",
        "user_id",
        "source_id",
        "source_type",
        "n_sources",
        credit6,
    )


QUERIES["linear_attribution"] = q_linear_attribution

ORACLE_SQL["linear_attribution"] = f"""
    WITH s AS (
        SELECT user_id, ts AS sts, event_id AS source_id,
               event_type AS source_type
        FROM {_EVENTS_SQL} WHERE event_type IN ('view', 'click')
    ), c AS (
        SELECT user_id, event_id AS conversion_id, ts AS cts
        FROM {_EVENTS_SQL} WHERE event_type = 'purchase'
    ), pairs AS (
        SELECT c.conversion_id, c.user_id, s.source_id, s.source_type
        FROM c JOIN s ON c.user_id = s.user_id
           AND s.sts >= c.cts - INTERVAL 24 HOURS AND s.sts <= c.cts
    ), credited AS (
        SELECT conversion_id, user_id, source_id, source_type,
               CAST(COUNT(*) OVER (PARTITION BY conversion_id) AS BIGINT)
                   AS n_sources,
               floor((1.0 / COUNT(*) OVER (PARTITION BY conversion_id))
                     * 1e6 + 0.5) / 1e6 AS credit
        FROM pairs
    )
    SELECT * FROM credited
    UNION ALL
    SELECT c.conversion_id, c.user_id,
           CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR),
           CAST(0 AS BIGINT), CAST(NULL AS DOUBLE)
    FROM c WHERE c.conversion_id NOT IN (SELECT conversion_id FROM credited)
"""


def q_quarantine(spark, sf):
    """Data-quality quarantine gate (pipeline/validate.py
    quarantine_split): documents checked against three loader rules —
    nonempty text, known language, n_chars consistent with the text —
    one map-only pass; quarantined rows carry the violated-rule list.
    The graded testdata is clean, so the feed is deterministically
    corrupted first (doc_id % 11 → blanked text, % 13 → unknown lang,
    % 17 → off-by-one n_chars) — the gate is exercised, not vacuous.
    Oracle: the identical corruption + rule vector in SQL (NULL →
    failure)."""
    from stac_fastapi_duckdb_spark.pipeline.validate import quarantine_split

    docs = _t(spark, sf, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 11 == 0, F.lit("  ")).otherwise(
            F.col("text")
        ).alias("text"),
        F.when(F.col("doc_id") % 13 == 0, F.lit("xx")).otherwise(
            F.col("lang")
        ).alias("lang"),
        F.when(F.col("doc_id") % 17 == 0, F.col("n_chars") + 1).otherwise(
            F.col("n_chars")
        ).alias("n_chars"),
    )
    rules = [
        ("nonempty_text", F.length(F.trim(F.col("text"))) > 0),
        ("known_lang", F.col("lang").isin("en", "de", "fr", "es", "zh")),
        ("n_chars_consistent", F.col("n_chars") == F.length(F.col("text"))),
    ]
    _valid, bad = quarantine_split(docs, rules)
    return bad.select(
        "doc_id", F.array_join("failed_rules", ",").alias("failed_rules")
    )


QUERIES["quarantine"] = q_quarantine

ORACLE_SQL["quarantine"] = """
    WITH feed AS (
        SELECT doc_id,
               CASE WHEN doc_id % 11 = 0 THEN '  ' ELSE text END AS text,
               CASE WHEN doc_id % 13 = 0 THEN 'xx' ELSE lang END AS lang,
               CASE WHEN doc_id % 17 = 0 THEN n_chars + 1 ELSE n_chars END
                   AS n_chars
        FROM documents
    )
    SELECT doc_id,
           array_to_string(list_filter([
               CASE WHEN COALESCE(length(trim(text)) > 0, FALSE)
                    THEN NULL ELSE 'nonempty_text' END,
               CASE WHEN COALESCE(lang IN ('en','de','fr','es','zh'), FALSE)
                    THEN NULL ELSE 'known_lang' END,
               CASE WHEN COALESCE(n_chars = length(text), FALSE)
                    THEN NULL ELSE 'n_chars_consistent' END
           ], x -> x IS NOT NULL), ',') AS failed_rules
    FROM feed
    WHERE NOT (COALESCE(length(trim(text)) > 0, FALSE)
               AND COALESCE(lang IN ('en','de','fr','es','zh'), FALSE)
               AND COALESCE(n_chars = length(text), FALSE))
"""


# ---------------------------------------------------------------------------
# round 8: sequence packing + domain-mixture rebalancing
# ---------------------------------------------------------------------------


def q_pack_chunks(spark, sf):
    """GPT-style concatenated-stream sequence packing
    (pipeline/packing.py pack_chunks): within each of 8 md5-derived
    shards, documents concatenate in id order into one token stream
    sliced every 512 tokens; each document maps to its shard, token
    offset, and chunk span (documents may span boundaries — the
    no-padding pretraining layout). ONE window shuffle on the shard
    key (the exclusive running token sum); shards are independent
    packing workers, so parallelism scales with n_shards at any corpus
    size. Oracle replays shard hash, running sum, and chunk arithmetic
    verbatim."""
    from stac_fastapi_duckdb_spark.pipeline.packing import pack_chunks

    return pack_chunks(
        _t(spark, sf, "documents"), ctx_len=512, n_shards=8
    )


QUERIES["pack_chunks"] = q_pack_chunks

ORACLE_SQL["pack_chunks"] = """
    WITH base AS (
        SELECT doc_id,
               CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS UBIGINT) % 8 AS BIGINT) AS shard,
               CAST(len(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x <> '')) AS BIGINT) AS n_toks
        FROM documents
    ),
    off AS (
        SELECT doc_id, shard, n_toks,
               CAST(COALESCE(SUM(n_toks) OVER (
                   PARTITION BY shard ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS tok_offset
        FROM base
    )
    SELECT doc_id, shard, tok_offset, n_toks,
           CAST(tok_offset // 512 AS BIGINT) AS chunk_first,
           CAST(CASE WHEN n_toks > 0
                     THEN (tok_offset + n_toks - 1) // 512
                     ELSE tok_offset // 512 END AS BIGINT) AS chunk_last,
           CAST(CASE WHEN n_toks > 0
                     THEN (tok_offset + n_toks - 1) // 512
                          - tok_offset // 512 + 1
                     ELSE 0 END AS BIGINT) AS n_chunks
    FROM off
"""


def q_pack_greedy(spark, sf):
    """No-split first-fit sequence packing (pipeline/packing.py
    pack_greedy): within each shard, documents in id order fill
    512-token bins; a doc that would overflow opens a new bin;
    oversize docs get a flagged bin of their own — the
    instruction-tuning layout where examples stay intact. The greedy
    state is a nonlinear recurrence (no window/scan expresses it, and
    a JVM fold accumulating assignments is O(shard²) — measured 9.7 s
    at sf1), so it runs as an Arrow-batched LINEAR kernel per shard
    (applyInPandas — the semdedup-GEMM precedent): one shard shuffle,
    integer arithmetic over the batch. The oracle replays the
    identical fold as a per-shard recursive CTE."""
    from stac_fastapi_duckdb_spark.pipeline.packing import pack_greedy

    return pack_greedy(
        _t(spark, sf, "documents"), ctx_len=512, n_shards=8
    )


QUERIES["pack_greedy"] = q_pack_greedy

ORACLE_SQL["pack_greedy"] = """
    WITH RECURSIVE base AS (
        SELECT doc_id,
               CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)
                    AS UBIGINT) % 8 AS BIGINT) AS shard,
               CAST(len(list_filter(
                   regexp_split_to_array(lower(trim(text)), '\\s+'),
                   x -> x <> '')) AS BIGINT) AS n_toks
        FROM documents
    ),
    ord AS (
        SELECT doc_id, shard, n_toks,
               row_number() OVER (
                   PARTITION BY shard ORDER BY doc_id) AS rn
        FROM base
    ),
    rec AS (
        SELECT shard, doc_id, n_toks, rn,
               n_toks > 512 AS oversize,
               CAST(0 AS BIGINT) AS bin,
               CAST(0 AS BIGINT) AS bin_offset,
               CASE WHEN n_toks > 512 THEN CAST(513 AS BIGINT)
                    ELSE n_toks END AS fill
        FROM ord WHERE rn = 1
        UNION ALL
        SELECT o.shard, o.doc_id, o.n_toks, o.rn,
               o.n_toks > 512 AS oversize,
               CASE WHEN o.n_toks > 512 OR r.fill + o.n_toks > 512
                    THEN r.bin + 1 ELSE r.bin END AS bin,
               CASE WHEN o.n_toks > 512 OR r.fill + o.n_toks > 512
                    THEN CAST(0 AS BIGINT) ELSE r.fill END AS bin_offset,
               CASE WHEN o.n_toks > 512 THEN CAST(513 AS BIGINT)
                    WHEN r.fill + o.n_toks > 512 THEN o.n_toks
                    ELSE r.fill + o.n_toks END AS fill
        FROM rec r JOIN ord o ON o.shard = r.shard AND o.rn = r.rn + 1
    )
    SELECT doc_id, shard, bin, bin_offset, n_toks, oversize FROM rec
"""


def q_mixture_sample(spark, sf):
    """Target domain-mixture rebalancing (pipeline/sampling.py
    mixture_sample — the data-mixing step of a pretraining recipe,
    DoReMi-style domain weights applied as hard quotas): a 300-doc
    budget split across the 20 sources by weight (i %% 5 + 1 for
    src<i> — a skewed target mix), each source contributing its
    quota's top rows under the deterministic salted-md5 order (the
    same order contract as stratified_exact_sample). ONE window
    shuffle on the source key with WindowGroupLimit pushdown; quotas
    ride as a literal map. Oracle replays hash order and the same
    driver-computed integer quotas."""
    from stac_fastapi_duckdb_spark.pipeline.sampling import mixture_sample

    weights = {f"src{i}": (i % 5) + 1 for i in range(20)}
    docs = _t(spark, sf, "documents").select("doc_id", "source")
    return mixture_sample(docs, weights, budget=300)


QUERIES["mixture_sample"] = q_mixture_sample

ORACLE_SQL["mixture_sample"] = """
    SELECT doc_id, source, sample_rank FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY CAST(CAST('0x' || substr(md5(
                       'mix-v1' || CAST(doc_id AS VARCHAR)), 18, 15)
                       AS UBIGINT) AS BIGINT) ASC,
                   doc_id ASC
               ) AS sample_rank
        FROM documents
    ) WHERE sample_rank <= CASE source WHEN 'src0' THEN 5 WHEN 'src1' THEN 10 WHEN 'src10' THEN 5 WHEN 'src11' THEN 10 WHEN 'src12' THEN 15 WHEN 'src13' THEN 20 WHEN 'src14' THEN 25 WHEN 'src15' THEN 5 WHEN 'src16' THEN 10 WHEN 'src17' THEN 15 WHEN 'src18' THEN 20 WHEN 'src19' THEN 25 WHEN 'src2' THEN 15 WHEN 'src3' THEN 20 WHEN 'src4' THEN 25 WHEN 'src5' THEN 5 WHEN 'src6' THEN 10 WHEN 'src7' THEN 15 WHEN 'src8' THEN 20 WHEN 'src9' THEN 25 ELSE 0 END
"""
