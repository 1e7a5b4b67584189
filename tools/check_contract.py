"""Local stand-in for the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at the same sf dir, compare
row count, column names, and an order-insensitive value hash.

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys

import duckdb

sys.path.insert(0, ".")


def norm_cell(v):
    import datetime
    import math

    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, (datetime.date, datetime.datetime)):
        return v.isoformat()
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return norm_cell(v.item())
        if isinstance(v, np.ndarray):
            return norm_cell(list(v))
    except ImportError:
        pass
    return str(v)


def value_hash(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "|".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha1()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from parquet_python_spark.session import get_spark

    spark = get_spark("contract-check")
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(rows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error {e}")
            failures.append(name)
            continue
        ok_n = len(rows) == len(orows)
        ok_c = sorted(cols) == sorted(ocols)
        ok_h = value_hash(rows, cols) == value_hash(orows, ocols)
        status = "ok   " if (ok_n and ok_c and ok_h) else "FAIL "
        print(
            f"{status}{name}: rows {len(rows)}/{len(orows)} "
            f"cols={'ok' if ok_c else f'{sorted(cols)} vs {sorted(ocols)}'} "
            f"hash={'ok' if ok_h else 'MISMATCH'}"
        )
        if status.startswith("FAIL"):
            failures.append(name)
            if not ok_h and ok_n and ok_c:
                # show first differing normalized line for debugging
                order = sorted(range(len(cols)), key=lambda i: cols[i])
                a = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
                oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
                b = sorted("|".join(norm_cell(r[i]) for i in oorder) for r in orows)
                for x, y in zip(a, b):
                    if x != y:
                        print(f"      spark : {x[:160]}")
                        print(f"      duckdb: {y[:160]}")
                        break
    print("FAILURES:", failures if failures else "none")
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
