"""Manifest-level file skipping: a driver-side min-max index over
parquet footers.

Spark prunes row groups *inside* each file it opens via parquet
statistics, but for a point lookup over a 100k-file dataset it still
lists, opens, and footer-reads every file. Table formats (Iceberg/
Delta) fix this with a manifest of per-file column stats; this module
is the same idea for plain parquet directories: one footer sweep builds
``{file → (min, max, null_count)}`` for the lookup columns, and point/
range reads then mount ONLY the overlapping files into the DataFrame.

Designed use: key-sorted or Z-ordered layouts (sources/layout.py),
where a point lookup prunes to exactly one file — turning the
reference's ``WHERE id = ? LIMIT 1`` (reference
``database_logic.py:168-189``) into a single-file, single-row-group
scan regardless of table size. The index is metadata-only (KBs per
1000 files), cheap to persist as JSON next to the data, and safe: a
file with missing stats is always kept.
"""

from __future__ import annotations

import glob as _glob
import json
import os
from typing import Any

from pyspark.sql import DataFrame, SparkSession


def _naive_utc(v: Any) -> Any:
    """Timestamp stats come back tz-aware from pyarrow when the file
    was written as TIMESTAMP(isAdjustedToUTC=true); the engine runs
    with a UTC session and queries with naive datetimes — normalize so
    the two compare."""
    import datetime

    if isinstance(v, datetime.datetime) and v.tzinfo is not None:
        return v.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return v


def build_file_index(path: str, columns: list[str]) -> dict[str, dict]:
    """One footer sweep over ``path/*.parquet`` (or a single parquet
    file) → per-file min/max for ``columns``. Run it where the data
    lives (driver-side here; as a distributed mapPartitions over file
    lists at cluster scale)."""
    import pyarrow.parquet as pq

    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(_glob.glob(os.path.join(path, "*.parquet")))
    index: dict[str, dict] = {}
    for f in files:
        md = pq.ParquetFile(f).metadata
        name_to_idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        stats: dict[str, Any] = {}
        for col in columns:
            if col not in name_to_idx:
                continue
            lo = hi = None
            ok = True
            for rg in range(md.num_row_groups):
                s = md.row_group(rg).column(name_to_idx[col]).statistics
                if s is None or not s.has_min_max:
                    ok = False
                    break
                lo = s.min if lo is None else min(lo, s.min)
                hi = s.max if hi is None else max(hi, s.max)
            if ok and lo is not None:
                stats[col] = {"min": _naive_utc(lo), "max": _naive_utc(hi)}
        index[f] = stats
    return index


def save_index(index: dict[str, dict], index_path: str) -> None:
    with open(index_path, "w") as fh:
        json.dump(index, fh, default=str)


def load_index(index_path: str) -> dict[str, dict]:
    with open(index_path) as fh:
        return json.load(fh)


def prune_files(
    index: dict[str, dict], col: str, lo: Any, hi: Any | None = None
) -> list[str]:
    """Files whose [min,max] for ``col`` overlaps [lo, hi] (point
    lookup when ``hi`` is None). Files without stats for ``col`` are
    kept — skipping is an optimization, never a correctness filter."""
    hi = lo if hi is None else hi
    keep = []
    for f, stats in index.items():
        s = stats.get(col)
        if s is None or not (s["max"] < lo or s["min"] > hi):
            keep.append(f)
    return keep


def indexed_read(
    spark: SparkSession,
    index: dict[str, dict],
    col: str,
    lo: Any,
    hi: Any | None = None,
) -> DataFrame:
    """Read only the files that can contain ``col`` ∈ [lo, hi]. The
    row-level predicate must still be applied by the caller (the index
    prunes FILES, not rows). An empty file set returns an empty
    DataFrame with the schema of the first indexed file."""
    files = prune_files(index, col, lo, hi)
    if not files:
        all_files = sorted(index)
        empty = spark.read.parquet(all_files[0]).limit(0)
        return empty
    return spark.read.parquet(*files)
