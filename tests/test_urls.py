"""URL canonicalization tests (functions/urls.py)."""

import pytest
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.functions.urls import normalize_urls


@pytest.fixture(scope="module")
def urls(spark):
    rows = [
        (1, "HTTPS://WWW.News.Example.COM:443/A/B/?utm_source=tw&b=2&a=1#top"),
        (2, "http://example.com"),                      # no path, no query
        (3, "https://sub.shop.example.org/p?ref=x&utm_campaign=y"),  # all params dropped
        (4, "https://example.com/x//"),                 # multiple trailing slashes
        (5, "https://example.com/?z=1&a=2"),            # root path with params
    ]
    return spark.createDataFrame(rows, "doc_id long, url string")


def test_normalize_url_canonical_form(urls):
    out = {r.doc_id: r for r in normalize_urls(urls).collect()}

    # case folding, port + www. stripping, fragment drop, param sort
    assert out[1].url_norm == "https://news.example.com/A/B?a=1&b=2"
    assert out[1].domain == "example.com"
    assert out[1].n_params == 2

    # bare host → '/' path, no query suffix
    assert out[2].url_norm == "http://example.com/"
    assert out[2].n_params == 0

    # every param is tracking → clean URL, subdomains kept in host
    assert out[3].url_norm == "https://sub.shop.example.org/p"
    assert out[3].domain == "example.org"
    assert out[3].n_params == 0

    # trailing slashes collapse
    assert out[4].url_norm == "https://example.com/x"

    # root path retained when params survive
    assert out[5].url_norm == "https://example.com/?a=2&z=1"


def test_normalize_url_is_map_only(urls):
    plan = normalize_urls(urls)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan


def test_normalize_url_idempotent(urls):
    """Canonicalizing an already-canonical URL is a no-op — the property
    that makes the form usable as a dedup/join key."""
    once = normalize_urls(urls).select("doc_id", F.col("url_norm").alias("url"))
    twice = {r.doc_id: r.url_norm for r in normalize_urls(once).collect()}
    first = {r.doc_id: r.url_norm for r in normalize_urls(urls).collect()}
    assert twice == first
