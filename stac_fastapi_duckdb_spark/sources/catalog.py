"""Collection registry: collection_id → parquet URL → cached DataFrame.

Reference behavior being re-expressed (citations into /root/reference):
- ``PARQUET_URLS_JSON`` env var maps collection_id → parquet URL
  (``stac_fastapi/duckdb/config.py:32,41,47-58``); unknown ids error
  (``config.py:74-78,91``).
- Collection JSON documents live at
  ``{STAC_FILE_PATH}/{collection_id}/collection.json``
  (``database_logic.py:75-102,123-133``).
- Every scan injects a constant ``collection`` column:
  ``SELECT *, ? AS collection FROM read_parquet(?)``
  (``database_logic.py:835``) → ``withColumn("collection", lit(cid))``.
- Schema probe ``SELECT * ... LIMIT 0`` (``database_logic.py:867-878``)
  → ``df.schema`` (metadata-only, no job).

Scale design: per-collection DataFrames are lazily created and cached in
a dict — Spark caches parquet footers per session, so repeated searches
re-plan without re-listing files. For a 100 TB deployment the better
layout is ONE table partitioned by ``collection`` (partition pruning
replaces the registry's source pruning); ``CollectionCatalog.from_table``
supports that layout: a single partitioned DataFrame where per-collection
access compiles to a partition-pruned filter instead of a separate scan.
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.errors import NotFoundError

COLLECTION_COL = "collection"


def _as_spark_py(v):
    """Normalize a pyarrow ``to_pylist`` value to what PySpark's
    ``Row.asDict(recursive=True)`` yields for the same cell: binary →
    bytearray, tz-aware timestamps → naive datetime in the driver's
    local zone (PySpark's TimestampType.fromInternal goes through
    ``datetime.fromtimestamp``), containers recursed."""
    import datetime as _dt

    if isinstance(v, (bytes, bytearray)):
        return bytearray(v)
    if isinstance(v, _dt.datetime) and v.tzinfo is not None:
        return v.astimezone().replace(tzinfo=None)
    if isinstance(v, list):
        return [_as_spark_py(x) for x in v]
    if isinstance(v, dict):
        return {k: _as_spark_py(x) for k, x in v.items()}
    return v


class PointReadUnavailable(Exception):
    """Raised by :meth:`CollectionCatalog.point_read` when the
    driver-side fast path cannot serve the collection (partitioned
    table, remote URL, non-parquet source, no usable manifest) — the
    caller falls back to the distributed plan. Never raised for a
    MISSING item (that returns ``None``)."""

# item-table source formats by extension; anything else is parquet
_FORMAT_EXTS = (
    (".csv", "csv"),
    (".csv.gz", "csv"),
    (".json", "json"),
    (".jsonl", "json"),
    (".ndjson", "json"),
    (".json.gz", "json"),
    (".orc", "orc"),
)


def _detect_format(urls: list[str]) -> str:
    """Extension-sniffed source format; a collection must be uniform
    (one format across its file list)."""
    fmts = set()
    for u in urls:
        base = u.lower().split("?", 1)[0].rstrip("/")
        for ext, fmt in _FORMAT_EXTS:
            if base.endswith(ext):
                fmts.add(fmt)
                break
        else:
            fmts.add("parquet")
    if len(fmts) > 1:
        raise ValueError(f"collection URL list mixes formats {fmts}: {urls}")
    return fmts.pop()

_HTTP_CACHE_DIR = os.environ.get(
    "SPARK_GRAFT_HTTP_CACHE", "/tmp/spark_graft_http_cache"
)


def _localize(url: str) -> str:
    """LEGACY driver-download shim, kept only as the fallback when the
    Python DataSource API is unavailable. The live http(s) path is
    ``sources/http_parquet.py``: executor-side ranged reads,
    partition-per-row-group, footer-stat skipping — the Spark-native
    analog of the reference's DuckDB httpfs (``config.py:112-121``)."""
    if not url.startswith(("http://", "https://")):
        return url
    import hashlib
    import urllib.request

    os.makedirs(_HTTP_CACHE_DIR, exist_ok=True)
    dest = os.path.join(
        _HTTP_CACHE_DIR, hashlib.sha256(url.encode()).hexdigest() + ".parquet"
    )
    if not os.path.exists(dest):
        tmp = dest + ".part"
        urllib.request.urlretrieve(url, tmp)  # noqa: S310 — user-configured source URL
        os.replace(tmp, dest)
    return dest


class CollectionCatalog:
    """Registry of STAC collections backed by parquet files or a
    single collection-partitioned table."""

    def __init__(
        self,
        spark: SparkSession,
        parquet_urls: dict[str, str] | None = None,
        stac_file_path: str | None = None,
    ) -> None:
        self.spark = spark
        self._urls: dict[str, str] = dict(parquet_urls or {})
        self._stac_file_path = stac_file_path
        self._df_cache: dict[str, DataFrame] = {}
        self._partitioned: DataFrame | None = None
        # collection_id → manifest min/max file index (sources/index.py)
        self._file_index: dict[str, dict[str, dict]] = {}

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @classmethod
    def from_env(cls, spark: SparkSession) -> "CollectionCatalog":
        """Mirror of reference config: PARQUET_URLS_JSON + STAC_FILE_PATH
        (``config.py:31-58``)."""
        raw = os.environ.get("PARQUET_URLS_JSON", "{}")
        return cls(spark, json.loads(raw), os.environ.get("STAC_FILE_PATH"))

    @classmethod
    def from_table(cls, spark: SparkSession, df: DataFrame) -> "CollectionCatalog":
        """Single-table layout: ``df`` already carries a ``collection``
        column (ideally a partition column → pruning is free)."""
        cat = cls(spark)
        cat._partitioned = df
        return cat

    def register(self, collection_id: str, url: str) -> None:
        self._urls[collection_id] = url
        self._df_cache.pop(collection_id, None)
        # the manifest holds absolute file paths into the previous dataset;
        # keeping it would make pruned_items_df skip files of the NEW url
        self._file_index.pop(collection_id, None)

    # ------------------------------------------------------------------
    # item tables
    # ------------------------------------------------------------------
    def collection_ids(self) -> list[str]:
        if self._partitioned is not None:
            # distinct over a partition column is a metadata-sized job
            return [
                r[0]
                for r in self._partitioned.select(COLLECTION_COL).distinct().collect()
            ]
        return sorted(self._urls)

    def items_df(self, collection_id: str) -> DataFrame:
        """DataFrame of one collection's items, with the injected
        constant ``collection`` column (reference S2).

        URL forms: a path/s3a/hdfs/file URL (native reader), an http(s)
        URL, a LIST of http(s) URLs (multi-file collection), or a
        ``*manifest.json`` URL — the http forms read through the
        executor-side ranged data source (``sources/http_parquet.py``),
        never a driver download."""
        if self._partitioned is not None:
            return self._partitioned.filter(F.col(COLLECTION_COL) == collection_id)
        if collection_id in self._df_cache:
            return self._df_cache[collection_id]
        url = self._urls.get(collection_id)
        if url is None:
            raise NotFoundError(f"Collection {collection_id} not configured")
        df = self._read_source(url).withColumn(
            COLLECTION_COL, F.lit(collection_id)
        )
        self._df_cache[collection_id] = df
        return df

    def _read_source(self, url) -> DataFrame:
        urls = list(url) if isinstance(url, (list, tuple)) else [url]
        n_http = sum(u.startswith(("http://", "https://")) for u in urls)
        if n_http == 0:
            # native reader: local / file:// / s3a:// / hdfs:// paths,
            # single or multi-path. Format by extension — the reference
            # is parquet-only (DuckDB read_parquet, config.py:112-121);
            # csv/ndjson item tables are a Spark-side extension for
            # catalogs that land raw exports before compaction.
            fmt = _detect_format(urls)
            reader = self.spark.read
            if fmt == "csv":
                # inferSchema is a convenience for small/landing tables
                # — it costs an extra pass, so production collections
                # should be compacted to parquet (sources/writer.py)
                return reader.options(
                    header=True, inferSchema=True, multiLine=False
                ).csv(*urls)
            if fmt == "json":
                # NDJSON (one item per line); the json reader unions
                # schemas across files natively
                return reader.json(*urls)
            if fmt == "orc":
                # ORC carries footer min/max stats like parquet, so
                # predicate pushdown and schema evolution work the
                # same way (Hive-era catalogs land item tables as ORC)
                if len(urls) > 1:
                    reader = reader.option("mergeSchema", "true")
                return reader.orc(*urls)
            # Multi-file parquet collections evolve (new
            # proj:*/properties columns appear in newer files);
            # mergeSchema unions the footers so late-added columns
            # surface as nulls in old files instead of being silently
            # dropped by the sampled-file schema.
            if len(urls) > 1:
                reader = reader.option("mergeSchema", "true")
            return reader.parquet(*urls)
        if n_http != len(urls):
            raise ValueError(
                f"collection URL list mixes http(s) and native paths: {urls}"
            )
        # http(s) collections are parquet-only (ranged reads need footer
        # metadata) — except *manifest.json, the object-store listing
        # analog the http source expands itself
        from stac_fastapi_duckdb_spark.sources.http_parquet import (
            is_manifest_url,
        )

        bad = [
            u
            for u in urls
            if _detect_format([u]) != "parquet" and not is_manifest_url(u)
        ]
        if bad:
            raise ValueError(
                f"http(s) collections are parquet-only (or *manifest.json): {bad}"
            )
        from stac_fastapi_duckdb_spark.sources import http_parquet as hp

        hp.ensure_registered(self.spark)
        return (
            self.spark.read.format("http_parquet")
            .option("urls", json.dumps(urls))
            .load()
        )

    # ------------------------------------------------------------------
    # manifest file-skipping (sources/index.py): point/range lookups over
    # a multi-file, key-sorted collection open only overlapping files
    # ------------------------------------------------------------------
    def build_item_index(
        self, collection_id: str, columns: Iterable[str] = ("id",)
    ) -> dict[str, dict]:
        """One parquet-footer sweep over the collection's files →
        driver-held ``{file → {col → (min,max)}}`` manifest. Metadata-only
        (KBs per 1000 files); makes ``pruned_items_df`` (and therefore
        ``get_one_item``) open only the files whose stats overlap the key
        instead of every file in the collection. Local paths only — a
        remote (http/s3a) collection is left unindexed and simply falls
        back to the full scan."""
        from stac_fastapi_duckdb_spark.sources.index import build_file_index

        url = self._urls.get(collection_id)
        if url is None:
            raise NotFoundError(f"Collection {collection_id} not configured")
        if not isinstance(url, str) or url.startswith(("http://", "https://")):
            # remote/multi-URL collections: the http data source does its
            # own footer-stat row-group skipping; no driver-side manifest
            return {}
        path = _localize(url)
        if not os.path.exists(path):
            return {}
        idx = build_file_index(path, list(columns))
        self._file_index[collection_id] = idx
        return idx

    def point_read(
        self, collection_id: str, item_id, id_col: str = "id"
    ) -> dict | None:
        """Serving-latency point lookup, entirely driver-side: manifest
        prune (``build_item_index``, built lazily on first use) to the
        files whose id stats admit ``item_id``, then a pyarrow
        predicate read of those files — row groups whose stats exclude
        the id are never decoded. On a key-sorted layout this opens ONE
        file and usually one row group, a few ms against a
        collection of any size; no Spark job is scheduled. Returns the
        item as a dict shaped exactly like
        ``Row.asDict(recursive=True)`` from the distributed plan
        (binary → bytearray, tz-aware timestamps → naive driver-local,
        the injected constant ``collection`` column appended), ``None``
        when the item is provably absent, and raises
        :class:`PointReadUnavailable` when this catalog/collection
        shape can't be served driver-side (the caller falls back to
        the Spark plan — see ``operators/search.py get_one_item``).

        The reference serves this with a full DuckDB query per lookup
        (``database_logic.py:156-189``); a long-lived Spark session
        pays ~0.3 s of scheduling for the same one-row answer, which
        is the wrong constant for an API's hottest endpoint."""
        from stac_fastapi_duckdb_spark.sources.index import prune_files

        if self._partitioned is not None:
            raise PointReadUnavailable("single-table catalog")
        url = self._urls.get(collection_id)
        if url is None:
            raise NotFoundError(f"Collection {collection_id} not configured")
        if not isinstance(url, str) or url.startswith(("http://", "https://")):
            raise PointReadUnavailable("remote or multi-URL collection")
        path = url[7:] if url.startswith("file://") else url
        if not os.path.exists(path) or _detect_format([path]) != "parquet":
            raise PointReadUnavailable("non-local or non-parquet source")
        idx = self._file_index.get(collection_id)
        if idx is None:
            # one-time footer sweep; cached on the catalog afterwards
            idx = self.build_item_index(collection_id, (id_col,))
        if not idx:
            raise PointReadUnavailable("no manifest index")
        files = prune_files(idx, id_col, item_id)
        if not files:
            return None  # stats prove no file can hold the key
        import pyarrow.dataset as pds
        import pyarrow.types as patypes

        def _unservable_type(t) -> str | None:
            # pyarrow renders maps as tuple lists, Spark as dicts;
            # naive (isAdjustedToUTC=false) timestamps come back
            # unchanged from pyarrow but Spark reinterprets them
            # through the UTC session tz and renders driver-local —
            # don't risk a value mismatch on either shape
            if patypes.is_map(t):
                return "map-typed column"
            if patypes.is_timestamp(t) and t.tz is None:
                return "naive (non-UTC-adjusted) timestamp column"
            if patypes.is_struct(t):
                return next(
                    (_unservable_type(f.type) for f in t if _unservable_type(f.type)),
                    None,
                )
            if patypes.is_list(t) or patypes.is_large_list(t):
                return _unservable_type(t.value_type)
            return None

        try:
            dataset = pds.dataset(files, format="parquet")
            for f in dataset.schema:
                reason = _unservable_type(f.type)
                if reason:
                    raise PointReadUnavailable(reason)
            tbl = dataset.to_table(filter=pds.field(id_col) == item_id)
        except PointReadUnavailable:
            raise
        except Exception as exc:  # corrupt footer, schema unification, …
            # any fast-path failure degrades to the Spark plan rather
            # than surfacing a 500 the distributed scan could serve
            raise PointReadUnavailable(f"pyarrow read failed: {exc}") from exc
        if tbl.num_rows == 0:
            return None
        row = {
            k: _as_spark_py(v) for k, v in tbl.slice(0, 1).to_pylist()[0].items()
        }
        row[COLLECTION_COL] = collection_id
        return row

    def pruned_items_df(
        self, collection_id: str, col: str, lo, hi=None
    ) -> DataFrame:
        """items_df restricted to the files whose [min,max] for ``col``
        overlaps [lo, hi] (point lookup when ``hi`` is None). File
        skipping is an optimization, never a correctness filter: the
        caller still applies the row predicate, files without stats are
        kept, and a collection without a built index falls back to the
        full items_df."""
        from stac_fastapi_duckdb_spark.sources.index import prune_files

        idx = self._file_index.get(collection_id)
        if self._partitioned is not None or not idx:
            return self.items_df(collection_id)
        files = prune_files(idx, col, lo, hi)
        if not files:
            return self.items_df(collection_id).limit(0)
        return self.spark.read.parquet(*files).withColumn(
            COLLECTION_COL, F.lit(collection_id)
        )

    def sources(self, collection_ids: Iterable[str] | None) -> list[tuple[str, DataFrame]]:
        """Resolve requested collections to (id, DataFrame) pairs;
        ``None``/empty → all configured (``database_logic.py:810-824``)."""
        ids = list(collection_ids) if collection_ids else self.collection_ids()
        return [(cid, self.items_df(cid)) for cid in ids]

    def columns(self, collection_ids: Iterable[str] | None) -> list[str]:
        """Union of column names across the requested sources —
        replaces the reference's LIMIT-0 schema probe
        (``database_logic.py:867-878``) with a metadata-only lookup."""
        seen: dict[str, None] = {}
        for _, df in self.sources(collection_ids):
            for c in df.columns:
                seen.setdefault(c)
        return list(seen)

    # ------------------------------------------------------------------
    # collection.json documents (reference S4: driver-side filesystem)
    # ------------------------------------------------------------------
    def all_collections(self) -> list[dict]:
        """List collection documents from the STAC_FILE_PATH tree
        (``database_logic.py:75-102``). Metadata, not a scan target —
        stays driver-side Python by design."""
        out: list[dict] = []
        base = self._stac_file_path
        if not base or not os.path.isdir(base):
            return out
        for name in sorted(os.listdir(base)):
            path = os.path.join(base, name, "collection.json")
            if os.path.isfile(path):
                with open(path) as f:
                    out.append(json.load(f))
        return out

    def find_collection(self, collection_id: str) -> dict:
        """Point lookup of one collection document
        (``database_logic.py:123-133``); missing → NotFoundError."""
        base = self._stac_file_path
        path = os.path.join(base or "", collection_id, "collection.json")
        if not base or not os.path.isfile(path):
            raise NotFoundError(f"Collection {collection_id} not found")
        with open(path) as f:
            return json.load(f)
