"""Sinks and metadata describe — the reference's consumer surface, Spark-first.

Reference parity (SURVEY.md §2.1):
    S1 scan          -> spark.read.parquet (Catalyst column pruning = P1)
    S2 DictReader    -> DataFrame rows (never needed; stay declarative)
    S3/S4 footer/metadata dump -> describe_table (schema + per-column stats)
    S5 CSV/TSV sink  -> write_csv   (reference __init__.py:499-526)
    S6 JSON-lines sink -> write_jsonl (reference __init__.py:483-496)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def scan(spark: SparkSession, path: str, columns: list[str] | None = None) -> DataFrame:
    """S1 + P1: parquet scan with column-projection pushdown.

    The reference prunes column chunks by dotted path before decode
    (__init__.py:443-445); Catalyst pushes the same projection into the
    parquet reader (visible as ReadSchema in .explain)."""
    df = spark.read.parquet(path)
    return df.select(*columns) if columns else df


def write_csv(df: DataFrame, path: str, sep: str = "\t", header: bool = True) -> None:
    """S5: tab-delimited CSV sink (reference defaults to \\t, __init__.py:510-515)."""
    df.write.mode("overwrite").option("sep", sep).option("header", header).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """S6: one JSON object per line (reference JsonWriter, __init__.py:483-496)."""
    df.write.mode("overwrite").json(path)


def describe_table(df: DataFrame) -> DataFrame:
    """S4 analog: per-column metadata report as a DataFrame.

    Replaces the reference's dump_metadata text report (__init__.py:119-220)
    with a queryable table: (column, dtype, n_rows, n_nulls, n_distinct).
    One pass over the data; every stat is a JVM-side aggregate.
    """
    aggs = []
    for f in df.schema.fields:
        aggs += [
            F.count(F.lit(1)).alias(f"{f.name}__rows"),
            F.sum(F.col(f.name).isNull().cast("long")).alias(f"{f.name}__nulls"),
            F.count_distinct(F.col(f.name)).alias(f"{f.name}__distinct"),
        ]
    row = df.agg(*aggs).collect()[0]
    spark = df.sparkSession
    data = [
        (
            f.name,
            f.dataType.simpleString(),
            int(row[f"{f.name}__rows"]),
            int(row[f"{f.name}__nulls"]),
            int(row[f"{f.name}__distinct"]),
        )
        for f in df.schema.fields
    ]
    return spark.createDataFrame(
        data, "column_name string, dtype string, n_rows long, n_nulls long, n_distinct long"
    )
