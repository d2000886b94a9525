"""Driver-style correctness check: run each queries() entry on Spark and
its oracle_sql() on DuckDB; compare row count, sorted column names, and
order-insensitive rounded value multisets.

    PYTHONPATH=. python tools/oracle_check.py [name ...]
    SPARK_GRAFT_ORACLE_SF=/root/testdata/sf0.001 ... # other scale factor

At sf0.1 the LSH-dedup family's deliberately O(n²) oracles are
infeasible — pass an explicit subset to skip them there."""
import hashlib, math, os, sys
import duckdb
import pandas as pd
from stac_fastapi_duckdb_spark.session import get_spark
import __spark_entry__ as e

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
spark = get_spark("oracle-check")
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

def norm(df: pd.DataFrame) -> list:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for tup in df.itertuples(index=False):
        row = []
        for v in tup:
            if v is None or (isinstance(v, float) and math.isnan(v)):
                row.append("NULL")
            elif isinstance(v, float):
                row.append(f"{v:.6f}")
            elif hasattr(v, "isoformat"):
                row.append(v.isoformat()[:26])
            else:
                row.append(str(v))
        rows.append("|".join(row))
    return sorted(rows)

qs, osql = e.queries(), e.oracle_sql()
if len(sys.argv) > 1:  # optional subset: oracle_check.py name1 name2 ...
    qs = {k: v for k, v in qs.items() if k in set(sys.argv[1:])}
fails = []
for name, fn in qs.items():
    try:
        sdf = fn(spark, SF).toPandas()
        if name not in osql:
            print(f"{name:24s} rows={len(sdf):6d}  (no oracle)")
            continue
        odf = con.execute(osql[name]).fetchdf()
        a, b = norm(sdf), norm(odf)
        cols_match = sorted(sdf.columns) == sorted(odf.columns)
        if len(a) != len(b):
            fails.append(name); print(f"{name:24s} FAIL rowcount spark={len(a)} duckdb={len(b)}")
        elif not cols_match:
            fails.append(name); print(f"{name:24s} FAIL cols {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        elif a != b:
            fails.append(name)
            diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
            print(f"{name:24s} FAIL values; first diffs: {diff}")
        else:
            print(f"{name:24s} OK rows={len(a)}")
    except Exception as ex:
        fails.append(name)
        print(f"{name:24s} ERROR {type(ex).__name__}: {str(ex)[:200]}")

print("\nFAILED:", fails if fails else "none")
sys.exit(1 if fails else 0)
