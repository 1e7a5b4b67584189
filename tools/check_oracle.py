"""Local replica of the driver's Spark-vs-DuckDB correctness cross-check.

Usage: python tools/check_oracle.py [query ...]   (default: all with oracles)
Env:   SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # date/datetime representation differs between Spark toPandas
    # (datetime.date objects) and DuckDB fetchdf (datetime64) for the SAME
    # values; the driver's hash canonicalizes these, so stringify here too
    import datetime

    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype(str)
        elif df[c].dtype == object:
            first = next((v for v in df[c] if v is not None), None)
            if isinstance(first, (datetime.date, datetime.datetime)):
                df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> None:
    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    import __spark_entry__ as em
    from parquet_python_spark.session import get_spark

    names = sys.argv[1:] or [k for k in em.queries() if k in em.oracle_sql()]
    spark = get_spark("check_oracle", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    oracles = em.oracle_sql()
    qs = em.queries()
    n_bad = 0
    for name in names:
        try:
            sdf = qs[name](spark, sf_dir).toPandas()
            odf = con.execute(oracles[name]).fetchdf()
            s, o = canon(sdf), canon(odf)
            rows = len(s) == len(o)
            schema = list(s.columns) == list(o.columns) and all(
                str(a) == str(b) for a, b in zip(s.dtypes, o.dtypes)
            )
            values = rows and schema and s.equals(o)
            if not values and rows and schema:
                # locate first mismatch for debugging
                neq = (s != o) & ~(s.isna() & o.isna())
                bad = neq.any(axis=1)
                print(f"  first diffs:\n{s[bad].head(3)}\nvs\n{o[bad].head(3)}")
            status = "OK" if values else "FAIL"
            if not values:
                n_bad += 1
            print(
                f"{name}: {status} rows={len(s)}/{len(o)} schema_match={schema} "
                f"dtypes={dict(zip(s.columns, map(str, s.dtypes)))} vs "
                f"{dict(zip(o.columns, map(str, o.dtypes)))}"
            )
        except Exception as e:  # noqa: BLE001
            n_bad += 1
            print(f"{name}: ERR {type(e).__name__}: {e}")
    spark.stop()
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
