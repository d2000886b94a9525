"""Property-based tests for the round-5 text operators: repetition
metrics against a pure-Python reference, PII scrub fixpoint/count
parity with Python's regex engine, URL canonicalization idempotence.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from stac_fastapi_duckdb_spark.functions.urls import normalize_urls
from stac_fastapi_duckdb_spark.pipeline import text as T

# small alphabet → plenty of gram collisions
token = st.sampled_from(["a", "b", "c", "ab", "xyz", "b", "a"])
doc = st.lists(token, min_size=1, max_size=30)


def _ref_repetition(toks: list[str]):
    n = len(toks)
    dup_word = (n - len(set(toks))) / n if n else 0.0
    bg = [" ".join(toks[i : i + 2]) for i in range(n - 1)]
    top_bg = max(Counter(bg).values()) / (n - 1) if n >= 2 else 0.0
    tg = [" ".join(toks[i : i + 3]) for i in range(n - 2)]
    c = Counter(tg)
    dup_tg = sum(1 for g in tg if c[g] > 1) / (n - 2) if n >= 3 else 0.0
    return n, dup_word, top_bg, dup_tg


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(doc, min_size=1, max_size=12))
def test_repetition_stats_matches_python_reference(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(d)) for i, d in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in T.repetition_stats(df).collect()}
    for i, d in enumerate(docs):
        n, dw, tb, dt = _ref_repetition(d)
        r = got[i]
        assert r.n_tokens == n
        assert abs(r.dup_word_frac - dw) < 1e-6, (d, r)
        assert abs(r.top_bigram_frac - tb) < 1e-6, (d, r)
        assert abs(r.dup_trigram_frac - dt) < 1e-6, (d, r)


pii_fragment = st.one_of(
    st.sampled_from(["hello", "data", "x1y2", "...", "a-b", "@", "+", "10.1", "1.2.3"]),
    st.from_regex(r"[a-z]{1,8}@[a-z]{1,8}\.(com|io|org)", fullmatch=True),
    st.from_regex(r"\+[0-9][0-9-]{7,12}[0-9]", fullmatch=True),
    st.from_regex(r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", fullmatch=True),
)
pii_text = st.lists(pii_fragment, min_size=0, max_size=12).map(" ".join)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(pii_text, min_size=1, max_size=10))
def test_pii_scrub_count_parity_and_fixpoint(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in T.pii_scrub(df).collect()}
    for i, t in enumerate(texts):
        r = got[i]
        # count parity with Python's regex engine on the same patterns
        # (counts are measured on the RAW text, so findall is exact)
        assert r.n_emails == len(re.findall(T.PII_PATTERNS["email"][0], t))
        assert r.n_ips == len(re.findall(T.PII_PATTERNS["ip"][0], t))
        assert r.n_phones == len(re.findall(T.PII_PATTERNS["phone"][0], t))

    # fixpoint: scrubbing the redacted text finds nothing
    redacted = df.select(
        "doc_id", T.redact_pii_col("text").alias("text")
    )
    again = T.pii_scrub(redacted).collect()
    for r in again:
        assert (r.n_emails, r.n_ips, r.n_phones) == (0, 0, 0)


url_strategy = st.builds(
    lambda scheme, www, host, port, segs, slash, params, frag: (
        scheme
        + "://"
        + ("WWW." if www else "")
        + host
        + (":443" if port else "")
        + "/"
        + "/".join(segs)
        + ("/" if slash and segs else "")
        + ("?" + "&".join(params) if params else "")
        + ("#frag" if frag else "")
    ),
    scheme=st.sampled_from(["http", "HTTPS", "https"]),
    www=st.booleans(),
    host=st.sampled_from(["Example.COM", "a.b.example.org", "x.NET"]),
    port=st.booleans(),
    segs=st.lists(st.sampled_from(["Docs", "p", "Q1"]), max_size=3),
    slash=st.booleans(),
    params=st.lists(
        st.sampled_from(["a=1", "b=2", "utm_source=x", "ref=y", "z=9"]),
        max_size=4,
        unique=True,
    ),
    frag=st.booleans(),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(urls=st.lists(url_strategy, min_size=1, max_size=10))
def test_normalize_url_idempotent_property(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    once = normalize_urls(df)
    twice = normalize_urls(
        once.select("doc_id", F.col("url_norm").alias("url"))
    )
    a = {r.doc_id: r.url_norm for r in once.collect()}
    b = {r.doc_id: r.url_norm for r in twice.collect()}
    assert a == b
    for u in a.values():
        # canonical invariants: lowercase scheme+host, no fragment, no
        # default port, no www., no tracking params, no trailing slash
        assert u.startswith(("http://", "https://"))
        host = u.split("://", 1)[1].split("/", 1)[0]
        assert host == host.lower() and ":443" not in host
        assert not host.startswith("www.")
        assert "#" not in u and "utm_" not in u and "ref=" not in u
        if u.endswith("/"):
            # a trailing slash survives only as the bare root path
            tail = u.split("://", 1)[1]
            assert "/" not in tail[:-1]
