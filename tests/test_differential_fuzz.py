"""Cross-engine differential fuzzing: run document-table contract
queries on RANDOM generated corpora through BOTH the Spark plan and
its DuckDB oracle and compare values.

The per-round correctness gate checks the oracles on the fixed
testdata; this harness removes the fixed-corpus assumption — any
tokenization, hashing, rounding, or null-handling divergence that only
appears on corpora the testdata doesn't contain (empty strings,
whitespace runs, single-token docs, heavy duplication) fails here.
Alphabet is printable ASCII by design: the engines' regex/locale
semantics (RE2 vs Java) agree there, and that is the contract the
oracles state.
"""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stac_fastapi_duckdb_spark.plans import entry_queries as eq

# document-only queries: the generated corpus replaces documents.parquet
FUZZED_QUERIES = [
    "token_count",
    "text_fingerprint",
    "dedup_exact",
    "quality_classifier",
    "duplicate_spans",
    "shuffle_shards",
    "dataset_fingerprint",
    "profile_table",
]

word = st.sampled_from(
    ["a", "b", "ab", "ba", "x1", "Zq", "hello", "the", "a"]
)
text = st.one_of(
    st.just(""),
    st.just("   "),
    st.lists(word, min_size=1, max_size=30).map(" ".join),
    # whitespace-run variant: tabs/newlines between tokens
    st.lists(word, min_size=1, max_size=10).map("\t ".join),
)
corpus = st.lists(text, min_size=1, max_size=12)


def _norm(df) -> list[str]:
    """Same value normalization as tools/oracle_check.py."""
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{v:.6f}")
            else:
                row.append(str(v))
        rows.append("|".join(row))
    return sorted(rows)


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    return tmp_path_factory.mktemp("diff_fuzz")


_COUNTER = [0]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=corpus)
def test_spark_and_duckdb_agree_on_random_corpora(spark, fuzz_dir, texts):
    _COUNTER[0] += 1
    d = fuzz_dir / f"case{_COUNTER[0]}"
    d.mkdir()
    rows = [
        (i, t, "en", "fuzz", len(t)) for i, t in enumerate(texts)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    docs.coalesce(1).write.parquet(str(d / "documents.parquet"))

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{d}/documents.parquet/*.parquet')"
    )
    for name in FUZZED_QUERIES:
        sdf = eq.QUERIES[name](spark, str(d)).toPandas()
        odf = con.execute(eq.ORACLE_SQL[name]).fetchdf()
        assert sorted(sdf.columns) == sorted(odf.columns), name
        assert _norm(sdf) == _norm(odf), (
            f"{name} diverged on corpus {texts!r}"
        )
    con.close()
