"""Converted-type transforms — Spark-first equivalents of the reference's
convert_column (converted_types.py:59-90, SURVEY.md §1.2 / D21).

The reference converts decoded column chunks from physical to logical types
(DECIMAL, DATE, TIME/TIMESTAMP_MILLIS, UTF8, UINT_*, JSON, BSON).  Here each
becomes a Catalyst expression usable inside any plan (and therefore subject
to constant folding / pushdown, which the reference's post-hoc list pass
never gets).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def decimal_from_unscaled(col: Column, precision: int, scale: int) -> Column:
    """DECIMAL: unscaled int × 10^-scale (converted_types.py:62-66)."""
    return (col.cast(f"decimal({precision},{scale})") / F.lit(10**scale)).cast(
        f"decimal({precision},{scale})"
    )


def date_from_days(col: Column) -> Column:
    """DATE: int32 ordinal days since epoch (converted_types.py:67-68)."""
    return F.date_add(F.lit("1970-01-01").cast("date"), col.cast("int"))


def time_millis(col: Column) -> Column:
    """TIME_MILLIS: int32 millis -> day-time interval (converted_types.py:69-70)."""
    return (col.cast("long") * F.lit(1000)).cast("interval day to second")


def timestamp_from_millis(col: Column) -> Column:
    """TIMESTAMP_MILLIS: int64 millis -> timestamp (converted_types.py:71-72)."""
    return F.timestamp_millis(col.cast("long"))


def utf8(col: Column) -> Column:
    """UTF8: bytes -> str (converted_types.py:73-74)."""
    return col.cast("string")


def uint8(col: Column) -> Column:
    """UINT_8: signed byte reinterpreted as unsigned (converted_types.py:75-82)."""
    return F.when(col < 0, col.cast("int") + 256).otherwise(col.cast("int"))


def uint16(col: Column) -> Column:
    return F.when(col < 0, col.cast("int") + 65536).otherwise(col.cast("int"))


def uint32(col: Column) -> Column:
    return F.when(col < 0, col.cast("long") + 2**32).otherwise(col.cast("long"))


def uint64(col: Column) -> Column:
    """UINT_64 needs decimal(20,0) headroom."""
    return F.when(
        col < 0, col.cast("decimal(20,0)") + F.lit(2**64).cast("decimal(21,0)")
    ).otherwise(col.cast("decimal(20,0)"))


def json_field(col: Column, path: str) -> Column:
    """JSON: parse + field access (converted_types.py:83-84).
    Catalyst prunes the parse to the accessed path."""
    return F.get_json_object(col, path)
