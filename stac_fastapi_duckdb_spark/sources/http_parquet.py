"""Executor-side HTTP(S) parquet reads — the Spark-native replacement
for the reference's DuckDB-httpfs remote path
(/root/reference/stac_fastapi/duckdb/config.py:112-121).

Spark's JVM parquet reader speaks file://, hdfs:// and s3a:// but not
plain http(s). Instead of the old download-to-driver shim, this module
implements a Python DataSource (Spark 4 `pyspark.sql.datasource` API)
that range-reads remote parquet ON THE EXECUTORS:

- **Planning (driver, metadata only).** For each URL the driver issues
  one 1-byte probe (Range support + file size) and, when ranges are
  supported, reads only the parquet FOOTER through a ranged file-like —
  never the data pages. Each row group becomes one input partition, so
  a 10k-file / 400k-row-group catalog fans out across the whole
  cluster exactly like a native FileScan.
- **Row-group skipping.** Comparison filters Spark pushes down
  (`pushFilters`) are evaluated against the footer's per-row-group
  column min/max statistics; non-overlapping row groups never issue a
  single data request. The filters are returned as "unsupported" so
  Spark still re-applies them row-level above — pruning is a pure
  I/O-elision optimization, identical in spirit to parquet predicate
  pushdown in the native reader.
- **Execution (executors).** Each task opens its own ranged reader and
  fetches exactly its row group's column chunks, yielding Arrow record
  batches straight into Spark's columnar pipeline. Servers without
  Range support degrade to one whole-file partition per URL, fetched
  into EXECUTOR memory (still never the driver).

URL forms accepted by the catalog: a single http(s) URL, a list of
URLs (multi-file collection), or a manifest URL ending in
``manifest.json`` whose body is a JSON array of parquet URLs (the
object-store "directory listing" analog; the manifest itself is
driver-side metadata, like a file listing).
"""

from __future__ import annotations

import json
import urllib.request
import weakref
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
)

_FOOTER_PREFETCH = 64 * 1024  # one tail request covers most footers
_PLAN_THREADS = 16  # driver-side planning concurrency (latency-bound I/O)


def _urlopen(req: urllib.request.Request):
    return urllib.request.urlopen(req, timeout=60)  # noqa: S310 — user-configured source URL


class RangedHttpFile:
    """Minimal seekable file-like over HTTP Range requests, shaped for
    pyarrow's PythonFile wrapper (read/seek/tell). The last
    ``_FOOTER_PREFETCH`` bytes are fetched once and served from memory
    — parquet footer parsing is dozens of tiny tail reads."""

    def __init__(self, url: str, size: int) -> None:
        self.url = url
        self._size = size
        self._pos = 0
        self._tail_start = max(0, size - _FOOTER_PREFETCH)
        self._tail: bytes | None = None
        self.closed = False

    def _fetch(self, start: int, end: int) -> bytes:
        """Inclusive byte range [start, end]."""
        req = urllib.request.Request(
            self.url, headers={"Range": f"bytes={start}-{end}"}
        )
        with _urlopen(req) as resp:
            return resp.read()

    def read(self, n: int = -1) -> bytes:
        if n < 0:
            n = self._size - self._pos
        n = min(n, self._size - self._pos)
        if n <= 0:
            return b""
        start, end = self._pos, self._pos + n - 1
        if start >= self._tail_start:
            if self._tail is None:
                self._tail = self._fetch(self._tail_start, self._size - 1)
            off = start - self._tail_start
            data = self._tail[off : off + n]
        else:
            data = self._fetch(start, end)
        self._pos += len(data)
        return data

    def seek(self, pos: int, whence: int = 0) -> int:
        if whence == 0:
            self._pos = pos
        elif whence == 1:
            self._pos += pos
        elif whence == 2:
            self._pos = self._size + pos
        return self._pos

    def tell(self) -> int:
        return self._pos

    def seekable(self) -> bool:
        return True

    def readable(self) -> bool:
        return True

    def writable(self) -> bool:
        return False

    def close(self) -> None:
        self.closed = True

    def size(self) -> int:
        return self._size


def probe_url(url: str) -> tuple[int, bool]:
    """→ (content_length, supports_ranges). One 1-byte request."""
    req = urllib.request.Request(url, headers={"Range": "bytes=0-0"})
    with _urlopen(req) as resp:
        if resp.status == 206:
            # Content-Range: bytes 0-0/12345
            total = int(resp.headers["Content-Range"].rsplit("/", 1)[1])
            return total, True
        length = resp.headers.get("Content-Length")
        return (int(length) if length else -1), False


def expand_manifest(url: str) -> list[str]:
    """A ``*manifest.json`` URL is a JSON array of parquet URLs —
    driver-side metadata, the object-store listing analog."""
    with _urlopen(urllib.request.Request(url)) as resp:
        urls = json.loads(resp.read().decode())
    if not isinstance(urls, list) or not all(isinstance(u, str) for u in urls):
        raise ValueError(f"manifest {url} must be a JSON array of URL strings")
    return urls


def is_manifest_url(url: str) -> bool:
    return url.split("?", 1)[0].endswith("manifest.json")


@dataclass
class _RowGroupPartition(InputPartition):
    url: str = ""
    size: int = 0
    row_group: int = -1  # -1 → whole file (no-Range fallback)
    ranged: bool = True


# (column, op, value) triples distilled from Spark's pushed filters;
# op ∈ {"eq", "gt", "ge", "lt", "le", "in"}
_FILTER_KINDS = {
    EqualTo: "eq",
    GreaterThan: "gt",
    GreaterThanOrEqual: "ge",
    LessThan: "lt",
    LessThanOrEqual: "le",
    In: "in",
}


def _stat_rules(filters: list[Filter]) -> list[tuple[str, str, object]]:
    rules = []
    for f in filters:
        kind = _FILTER_KINDS.get(type(f))
        if kind is None:
            continue
        col = f.attribute  # ColumnPath tuple
        if len(col) != 1:  # nested columns: no flat parquet stats
            continue
        rules.append((col[0], kind, f.value))
    return rules


def _rg_survives(stats: dict[str, tuple], rules) -> bool:
    """min/max elimination; missing stats → cannot prune."""
    for col, kind, value in rules:
        mm = stats.get(col)
        if mm is None:
            continue
        lo, hi = mm
        try:
            if kind == "eq" and (value < lo or value > hi):
                return False
            if kind == "in" and all(v < lo or v > hi for v in value):
                return False
            if kind in ("gt", "ge") and hi < value:
                return False
            if kind == "gt" and hi == value:
                return False
            if kind in ("lt", "le") and lo > value:
                return False
            if kind == "lt" and lo == value:
                return False
        except TypeError:  # incomparable types: never prune
            continue
    return True


class HttpParquetReader(DataSourceReader):
    def __init__(self, urls: list[str], spark_schema=None) -> None:
        self._urls = urls
        self._rules: list[tuple[str, str, object]] = []
        # probed lazily in partitions(); kept for schema() reuse
        self._probed: list[tuple[str, int, bool]] | None = None
        # the UNIFIED schema (multi-file collections may drift); each
        # file's batches are aligned to it in read()
        self._spark_schema = spark_schema

    def _probe_all(self) -> list[tuple[str, int, bool]]:
        if self._probed is None:
            # parallel metadata probes: planning a 10k-file catalog must
            # not serialize 10k HTTP round-trips on the driver (each is
            # ~latency-bound, so a thread pool scales ~linearly)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(max_workers=_PLAN_THREADS) as pool:
                probed = list(pool.map(probe_url, self._urls))
            self._probed = [
                (u, size, ranged)
                for u, (size, ranged) in zip(self._urls, probed)
            ]
        return self._probed

    def pushFilters(self, filters: list[Filter]):
        self._rules = _stat_rules(list(filters))
        # report everything unsupported: stats pruning elides I/O but
        # Spark must still evaluate the predicates row-level above
        return list(filters)

    def partitions(self):
        from concurrent.futures import ThreadPoolExecutor

        probed = self._probe_all()

        def plan_one(entry) -> list[_RowGroupPartition]:
            url, size, ranged = entry
            if not ranged or size < 0:
                return [_RowGroupPartition(url, size, -1, False)]
            # footer-only metadata read (driver: no data pages fetched)
            meta = pq.ParquetFile(
                pa.PythonFile(RangedHttpFile(url, size), mode="r")
            ).metadata
            return [
                _RowGroupPartition(url, size, rg, True)
                for rg in range(meta.num_row_groups)
                if not self._rules
                or _rg_survives(_rg_stats(meta.row_group(rg)), self._rules)
            ]  # pruned row groups never issue a data request

        # footer fetches are latency-bound: plan files concurrently
        with ThreadPoolExecutor(max_workers=_PLAN_THREADS) as pool:
            per_file = list(pool.map(plan_one, probed))
        parts: list[_RowGroupPartition] = [p for ps in per_file for p in ps]
        if not parts:
            # fully pruned: keep one empty marker partition so read()
            # still yields a zero-row batch with the right schema
            first, size, ranged = self._probe_all()[0]
            parts.append(_RowGroupPartition(first, size, -2, ranged))
        return parts

    def read(self, partition: _RowGroupPartition):
        if partition.ranged:
            src = pa.PythonFile(
                RangedHttpFile(partition.url, partition.size), mode="r"
            )
        else:  # no Range support: whole file into EXECUTOR memory
            with _urlopen(urllib.request.Request(partition.url)) as resp:
                src = pa.BufferReader(resp.read())
        pf = pq.ParquetFile(src)
        if partition.row_group == -2:  # fully-pruned marker: no rows
            return
        target = None
        if self._spark_schema is not None:
            from pyspark.sql.pandas.types import to_arrow_schema

            target = to_arrow_schema(self._spark_schema)
        batches = (
            pf.iter_batches()
            if partition.row_group < 0
            else pf.iter_batches(row_groups=[partition.row_group])
        )
        for batch in batches:
            yield _align_batch(batch, target) if target is not None else batch


def _align_batch(batch: pa.RecordBatch, target: pa.Schema) -> pa.RecordBatch:
    """Project a file's batch onto the unified schema: drifted files
    miss late-added columns (→ typed nulls) or carry narrower types
    (→ cast). No-op when the file already matches."""
    if batch.schema == target:
        return batch
    cols = []
    for field in target:
        idx = batch.schema.get_field_index(field.name)
        if idx >= 0:
            col = batch.column(idx)
            if col.type != field.type:
                col = col.cast(field.type)
        else:
            col = pa.nulls(batch.num_rows, type=field.type)
        cols.append(col)
    return pa.RecordBatch.from_arrays(cols, schema=target)


def _rg_stats(rg_meta) -> dict[str, tuple]:
    out = {}
    for i in range(rg_meta.num_columns):
        col = rg_meta.column(i)
        st = col.statistics
        if st is not None and st.has_min_max and "." not in col.path_in_schema:
            out[col.path_in_schema] = (st.min, st.max)
    return out


class HttpParquetDataSource(DataSource):
    """``spark.read.format("http_parquet").option("urls", json_list)``.

    Options: ``urls`` — JSON array of http(s) parquet URLs, or ``url``
    — a single URL (``*manifest.json`` expands to its listed URLs)."""

    @classmethod
    def name(cls) -> str:
        return "http_parquet"

    def _url_list(self) -> list[str]:
        if self.options.get("urls"):
            urls = json.loads(self.options["urls"])
        else:
            urls = [self.options["url"]]
        out: list[str] = []
        for u in urls:
            out.extend(expand_manifest(u) if is_manifest_url(u) else [u])
        if not out:
            raise ValueError("http_parquet: empty URL list")
        return out

    def schema(self):
        from concurrent.futures import ThreadPoolExecutor

        from pyspark.sql.pandas.types import from_arrow_schema

        # unify footers across ALL files (multi-file collections evolve:
        # newer files gain columns; a first-file-only schema would drop
        # them). Footer reads are latency-bound → thread pool, like
        # partitions().
        def one(url: str) -> pa.Schema:
            size, ranged = probe_url(url)
            if ranged and size >= 0:  # footer-only
                src = pa.PythonFile(RangedHttpFile(url, size), mode="r")
            else:
                with _urlopen(urllib.request.Request(url)) as resp:
                    src = pa.BufferReader(resp.read())
            return pq.ParquetFile(src).schema_arrow

        urls = self._url_list()
        with ThreadPoolExecutor(max_workers=_PLAN_THREADS) as pool:
            schemas = list(pool.map(one, urls))
        unified = pa.unify_schemas(schemas) if len(schemas) > 1 else schemas[0]
        return from_arrow_schema(unified, prefer_timestamp_ntz=True)

    def reader(self, schema) -> HttpParquetReader:
        return HttpParquetReader(self._url_list(), spark_schema=schema)


_REGISTERED_SESSIONS: "weakref.WeakSet" = weakref.WeakSet()


def ensure_registered(spark) -> None:
    """Idempotent per-session registration of the data source."""
    if spark in _REGISTERED_SESSIONS:
        return
    spark.dataSource.register(HttpParquetDataSource)
    try:  # required for pushFilters; runtime-settable, default off
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass  # already pinned via session defaults
    _REGISTERED_SESSIONS.add(spark)
