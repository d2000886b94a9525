"""URL canonicalization for crawl/dedup pipelines.

Web-scale corpora key many operations on the URL (per-domain caps,
crawl dedup, robots filtering), so URLs must first be normalized to a
canonical form: scheme/host lowercased, default ports and ``www.``
stripped, fragments dropped, tracking parameters removed and the rest
sorted, trailing slashes collapsed.

Everything is JVM-side Column algebra — ``parse_url`` (Spark's
built-in URL decomposition) plus regexp/array higher-order functions —
so canonicalization is map-only and fuses with the scan: no Python, no
shuffle, runs at scan speed at any scale. The parts (host, path, kept
params) are STAGED through an intermediate projection so each is
computed once; Catalyst's CollapseProject keeps multi-referenced
non-trivial expressions staged rather than inlining them per use.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# query params dropped during canonicalization: tracking keys.
# Plain prefix tests (cheap per-element string compare inside the
# filter lambda — no per-element regex evaluation).
_DROP_PARAM_PREFIXES = ("utm_", "ref=")


def _kept_params(query: Column) -> Column:
    """Split the query string, drop tracking params + empties, sort the
    remainder (param order is not semantically meaningful)."""
    parts = F.split(F.coalesce(query, F.lit("")), "&")
    kept = F.filter(
        parts,
        lambda p: (p != "")
        & ~p.startswith(_DROP_PARAM_PREFIXES[0])
        & ~p.startswith(_DROP_PARAM_PREFIXES[1]),
    )
    return F.array_sort(kept)


def normalize_urls(
    df: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Per-row URL canonicalization: id, canonical URL (``url_norm``),
    registered domain (``domain``), kept-param count (``n_params``)."""
    u = F.col(url_col)
    nofrag = F.regexp_replace(u, r"#.*$", "")
    staged = df.select(
        F.col(id_col),
        F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)).alias(
            "_scheme"
        ),
        F.regexp_replace(
            F.lower(F.parse_url(nofrag, F.lit("HOST"))), r"^www\.", ""
        ).alias("_host"),
        F.regexp_replace(
            F.coalesce(F.parse_url(nofrag, F.lit("PATH")), F.lit("")), r"/+$", ""
        ).alias("_path"),
        _kept_params(F.parse_url(nofrag, F.lit("QUERY"))).alias("_kept"),
    )
    q = F.array_join("_kept", "&")
    return staged.select(
        id_col,
        F.concat(
            "_scheme",
            F.lit("://"),
            "_host",
            F.when(F.col("_path") == "", F.lit("/")).otherwise(F.col("_path")),
            F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
        ).alias("url_norm"),
        F.regexp_extract("_host", r"([^.]+\.[^.]+)$", 1).alias("domain"),
        F.size("_kept").cast("bigint").alias("n_params"),
    )


def normalize_url_cols(url: Column | str) -> dict[str, Column]:
    """Unstaged single-expression form of the canonical parts (useful
    when composing into another projection; prefer ``normalize_urls``
    for whole-table canonicalization — it stages shared parts)."""
    u = F.col(url) if isinstance(url, str) else url
    nofrag = F.regexp_replace(u, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.regexp_replace(
        F.lower(F.parse_url(nofrag, F.lit("HOST"))), r"^www\.", ""
    )
    trimmed = F.regexp_replace(
        F.coalesce(F.parse_url(nofrag, F.lit("PATH")), F.lit("")), r"/+$", ""
    )
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    kept = _kept_params(F.parse_url(nofrag, F.lit("QUERY")))
    q = F.array_join(kept, "&")
    url_norm = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return {
        "url_norm": url_norm,
        "domain": F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1),
        "n_params": F.size(kept).cast("bigint"),
    }
