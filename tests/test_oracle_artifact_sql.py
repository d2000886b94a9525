"""Serve-from-artifact DuckDB forms (tools/oracle_artifact_sql.py).

Contract: for every artifact-served bench query, the serve form —
which reads the written sidecar parquet and recomputes only the
query-side residual — returns exactly the rows of the full-recompute
oracle. This is what makes the --oracle-artifacts engine-vs-engine
serving comparison a fair timing: same values, symmetric state."""

import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def served(spark, tmp_path_factory):
    """Build every artifact once (running each Spark query warms and
    writes its sidecar families), sharing one DuckDB connection."""
    import os

    root = str(tmp_path_factory.mktemp("artifacts"))
    old = os.environ.get("SPARK_GRAFT_SIDECAR_DIR")
    os.environ["SPARK_GRAFT_SIDECAR_DIR"] = root
    from stac_fastapi_duckdb_spark.plans import entry_queries as eq
    from tools.oracle_artifact_sql import SERVE_SQL, ArtifactCtx

    eq._ARTIFACT_CACHE.pop(spark, None)
    eq._ANN_INDEX_CACHE.pop(spark, None)
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    for name in SERVE_SQL:
        eq.QUERIES[name](spark, SF).write.format("noop").mode(
            "overwrite"
        ).save()
    yield eq, con, ArtifactCtx(SF)
    eq._ARTIFACT_CACHE.pop(spark, None)
    eq._ANN_INDEX_CACHE.pop(spark, None)
    if old is None:
        os.environ.pop("SPARK_GRAFT_SIDECAR_DIR", None)
    else:
        os.environ["SPARK_GRAFT_SIDECAR_DIR"] = old


def _norm(rows):
    # the ONE canonicalization shared with the bench runtime validation
    from tools.oracle_artifact_sql import norm_rows

    return norm_rows(rows)


def _serve_names():
    from tools.oracle_artifact_sql import SERVE_SQL

    return sorted(SERVE_SQL)


def test_every_artifact_served_query_has_a_serve_form():
    """Coverage guard: a query added to bench.py's ARTIFACT_SERVED set
    (and having a full oracle) must ship a serve-from-artifact form,
    or the --oracle-artifacts fairness table silently loses it."""
    from bench import ARTIFACT_SERVED
    from stac_fastapi_duckdb_spark.plans.entry_queries import ORACLE_SQL
    from tools.oracle_artifact_sql import SERVE_SQL

    missing = ARTIFACT_SERVED & set(ORACLE_SQL) - set(SERVE_SQL)
    assert not missing, f"artifact-served queries without a serve form: {missing}"


@pytest.mark.parametrize("name", _serve_names())
def test_serve_form_matches_full_oracle(served, name):
    eq, con, ctx = served
    from tools.oracle_artifact_sql import SERVE_SQL

    full = _norm(con.execute(eq.ORACLE_SQL[name]).fetchall())
    got = _norm(con.execute(SERVE_SQL[name](ctx)).fetchall())
    assert len(full) > 0
    assert got == full
