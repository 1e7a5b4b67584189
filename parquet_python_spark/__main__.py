"""CLI with the reference's surface (``parquet [--metadata] [--limit N]
[--col C] [--format csv|json] FILE``, /root/reference/parquet/__main__.py:20-59)
re-expressed Spark-first.

    python -m parquet_python_spark [options] PATH

Differences from the reference, by design: PATH is any parquet file/dir
(Spark scan), --metadata prints the schema plus the engine's queryable
per-column stats (sources/sinks.describe_table) instead of a thrift page
walk, and output is written through Spark's distributed CSV/JSON sinks when
--out is given (stdout dump otherwise, row-limited like the reference).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        "parquet_python_spark", description="Read parquet files (Spark-backed)"
    )
    parser.add_argument("--metadata", action="store_true",
                        help="show schema + per-column stats")
    parser.add_argument("--no-data", action="store_true",
                        help="don't dump any data")
    parser.add_argument("--limit", type=int, default=-1,
                        help="max records to output")
    parser.add_argument("--col", action="append", type=str,
                        help="only include this column (repeatable)")
    parser.add_argument("--where", default=None,
                        help="SQL predicate applied before --limit "
                             "(Catalyst pushes it to the parquet scan; "
                             "the reference has no row filtering at all)")
    parser.add_argument("--no-headers", action="store_true",
                        help="skip CSV header row")
    parser.add_argument("--format", default="csv", choices=["csv", "json"],
                        help="output format")
    parser.add_argument("--out", default=None,
                        help="write via the distributed sink to this dir "
                             "instead of dumping to stdout")
    parser.add_argument("--cpus", type=int, default=None,
                        help="local[] parallelism")
    parser.add_argument("file", help="parquet file or directory")
    args = parser.parse_args(argv)

    from .session import get_spark
    from .sources.sinks import describe_table, scan, write_csv, write_jsonl

    spark = get_spark("pps-cli", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    try:
        df = scan(spark, args.file, args.col)
        if args.metadata:
            df.printSchema()
            for r in describe_table(df).collect():
                print(
                    f"{r['column_name']}: {r['dtype']} rows={r['n_rows']} "
                    f"nulls={r['n_nulls']} distinct={r['n_distinct']}"
                )
        if args.no_data:
            return
        if args.where:
            from pyspark.sql import functions as F

            # SQL semantics: WHERE sees the FULL schema, projection comes
            # after (a predicate on a non --col column must filter, not
            # crash); Catalyst still prunes the scan to the union of
            # projected + predicate columns
            base = scan(spark, args.file, None)
            df = base.filter(F.expr(args.where)).select(
                *(args.col or base.columns)
            )
        if args.limit >= 0:
            df = df.limit(args.limit)
        if args.out:
            if args.format == "json":
                write_jsonl(df, args.out)
            else:
                write_csv(df, args.out, header=not args.no_headers)
            return
        # stdout dump (reference behavior): tab-separated / json-lines
        if args.format == "json":
            import json

            for row in df.toJSON().toLocalIterator():
                json.loads(row)  # validate
                sys.stdout.write(row + "\n")
        else:
            cols = df.columns
            if not args.no_headers:
                sys.stdout.write("\t".join(cols) + "\n")
            for row in df.toLocalIterator():
                sys.stdout.write(
                    "\t".join("" if row[c] is None else str(row[c]) for c in cols)
                    + "\n"
                )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
