"""sources/layout.py: Z-order writes must (a) preserve data exactly and
(b) measurably improve multi-column min-max skipping versus a hash
layout, as seen from the actual parquet footer stats."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.sources.layout import with_zorder, write_zordered

SF = "/root/testdata/sf0.001"
N_FILES = 8


def _file_boxes(path: str, col_a: str, col_b: str) -> list[tuple]:
    """(min_a, max_a, min_b, max_b) per parquet file, from footers."""
    boxes = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        sch = {md.schema.column(i).name: i for i in range(md.num_columns)}
        lo_a = hi_a = lo_b = hi_b = None
        for rg in range(md.num_row_groups):
            sa = md.row_group(rg).column(sch[col_a]).statistics
            sb = md.row_group(rg).column(sch[col_b]).statistics
            lo_a = sa.min if lo_a is None else min(lo_a, sa.min)
            hi_a = sa.max if hi_a is None else max(hi_a, sa.max)
            lo_b = sb.min if lo_b is None else min(lo_b, sb.min)
            hi_b = sb.max if hi_b is None else max(hi_b, sb.max)
        boxes.append((lo_a, hi_a, lo_b, hi_b))
    return boxes


def _mean_box_area(boxes, span_a, span_b) -> float:
    return sum(
        ((ha - la) / span_a) * ((hb - lb) / span_b) for la, ha, lb, hb in boxes
    ) / len(boxes)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "value"
    )
    base = tmp_path_factory.mktemp("zorder")
    zpath, hpath = str(base / "z"), str(base / "hash")
    write_zordered(ev, zpath, ["user_id", "value"], num_files=N_FILES)
    ev.repartition(N_FILES).write.parquet(hpath)
    return ev, zpath, hpath


def test_zorder_preserves_rows_exactly(spark, layouts):
    ev, zpath, _ = layouts
    back = spark.read.parquet(zpath)
    assert back.count() == ev.count()
    assert back.select(F.sum("event_id")).first()[0] == ev.select(
        F.sum("event_id")
    ).first()[0]
    assert set(back.columns) == set(ev.columns)  # __zvalue/__zr_* dropped


def test_zorder_tightens_minmax_on_both_dimensions(spark, layouts):
    ev, zpath, hpath = layouts
    lo_u, hi_u, lo_v, hi_v = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).first()
    span_u, span_v = (hi_u - lo_u) or 1, (hi_v - lo_v) or 1
    area_z = _mean_box_area(_file_boxes(zpath, "user_id", "value"), span_u, span_v)
    area_h = _mean_box_area(_file_boxes(hpath, "user_id", "value"), span_u, span_v)
    # hash layout: every file spans ~the full (user_id × value) box
    # (area ≈ 1); Z-order: each file covers a small tile of the curve
    assert area_h > 0.5
    assert area_z < area_h / 3


def test_zorder_skips_files_for_point_box_queries(spark, layouts):
    ev, zpath, _ = layouts
    lo_u, hi_u = ev.agg(F.min("user_id"), F.max("user_id")).first()
    mid = (lo_u + hi_u) / 2
    boxes = _file_boxes(zpath, "user_id", "value")
    # a narrow user_id slice must overlap strictly fewer z-files than all
    hit = sum(1 for la, ha, _, _ in boxes if la <= mid <= ha)
    assert hit < len(boxes)


def test_quantile_buckets_handle_skew(spark):
    # heavily skewed column: uniform buckets would put ~all rows in one
    # rank; quantile bucketing must still spread z-values
    df = spark.range(2000).select(
        F.col("id"),
        (F.col("id") % 40).alias("a"),
        F.when(F.col("id") % 100 == 0, F.col("id") * 1000.0)
        .otherwise(F.col("id") % 7)
        .alias("skewed"),
    )
    z = with_zorder(df, ["a", "skewed"], bits=6, quantile_buckets=True)
    n_distinct = z.select("__zvalue").distinct().count()
    assert n_distinct > 50
