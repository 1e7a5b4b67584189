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
    """TIME_MILLIS: int32 millis -> day-time interval (converted_types.py:69-70).

    Built with make_dt_interval on an exact decimal seconds value: casting
    an integral straight to `interval day to second` interprets it as
    SECONDS (the target's end-field unit), which would inflate the value
    1000x."""
    return F.make_dt_interval(
        secs=col.cast("decimal(23,3)") / F.lit(1000)
    )


def timestamp_from_millis(col: Column) -> Column:
    """TIMESTAMP_MILLIS: int64 millis -> timestamp (converted_types.py:71-72)."""
    return F.timestamp_millis(col.cast("long"))


def time_micros(col: Column) -> Column:
    """TIME_MICROS: int64 micros -> day-time interval.  Unhandled by the
    reference (converted_types.py:88-90 logs and passes raw) — added for
    logical-type completeness.  Exact decimal division: a raw integral
    cast to the interval type would read the value as seconds (1e6x)."""
    return F.make_dt_interval(
        secs=col.cast("decimal(26,6)") / F.lit(1000000)
    )


def timestamp_from_micros(col: Column) -> Column:
    """TIMESTAMP_MICROS: int64 micros -> timestamp (reference-unhandled)."""
    return F.timestamp_micros(col.cast("long"))


def int_8(col: Column) -> Column:
    """INT_8: low byte of the stored physical int, sign-extended
    (reference-unhandled; parquet.thrift stores INT_8 in a physical INT32)."""
    b = F.pmod(col.cast("long"), F.lit(256))
    return F.when(b >= 128, b - 256).otherwise(b).cast("int")


def int_16(col: Column) -> Column:
    """INT_16: low 16 bits sign-extended (reference-unhandled)."""
    h = F.pmod(col.cast("long"), F.lit(65536))
    return F.when(h >= 32768, h - 65536).otherwise(h).cast("int")


def enum_str(col: Column) -> Column:
    """ENUM: byte array -> string (reference-unhandled; same wire as UTF8)."""
    return col.cast("string")


def _le_uint32(col: Column, offset: int) -> Column:
    """Little-endian uint32 at 1-based byte ``offset`` of a binary column,
    as a pure Catalyst expression (hex -> byte-pair reversal -> conv)."""
    h = F.hex(F.substring(col, offset, 4))
    rev = F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2),
        F.substring(h, 3, 2), F.substring(h, 1, 2),
    )
    return F.conv(rev, 16, 10).cast("long")


def interval_from_flba(col: Column) -> Column:
    """INTERVAL: 12-byte FLBA of three little-endian uint32s
    (months, days, millis) -> struct (parquet LogicalTypes; the reference
    passes the raw bytes through).  Pure Catalyst — no UDF."""
    return F.struct(
        _le_uint32(col, 1).alias("months"),
        _le_uint32(col, 5).alias("days"),
        _le_uint32(col, 9).alias("millis"),
    )


def interval_to_flba(months: Column, days: Column, millis: Column) -> Column:
    """Inverse of interval_from_flba (fixture/ingest path)."""

    def le(c: Column) -> Column:
        # pmod forces the value into uint32 range first: without it, lpad
        # of a >8-digit hex string would silently keep the HIGH-order
        # digits (dropping the low word), and negative longs would encode
        # as 16 F-digits.  Out-of-range inputs therefore wrap mod 2^32 —
        # the uint32 wire's arithmetic — instead of corrupting.
        h = F.lpad(F.hex(F.pmod(c.cast("long"), F.lit(2**32))), 8, "0")
        return F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2),
            F.substring(h, 3, 2), F.substring(h, 1, 2),
        )

    return F.unhex(F.concat(le(months), le(days), le(millis)))


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


# ----------------------------------------------------------------- BSON

def _bson_read_doc(mv: memoryview, pos: int) -> tuple[dict, int]:
    """Minimal BSON document parser (public spec, bsonspec.org §spec.bson):
    the element types the reference's optional `bson` dependency would
    produce for parquet BSON columns (converted_types.py:85-86)."""
    import struct

    doc_len = struct.unpack_from("<i", mv, pos)[0]
    end = pos + doc_len - 1  # last byte is the \x00 terminator
    pos += 4
    out: dict = {}
    while pos < end:
        etype = mv[pos]
        pos += 1
        zero = bytes(mv[pos:end]).index(b"\x00")
        name = bytes(mv[pos : pos + zero]).decode()
        pos += zero + 1
        if etype == 0x01:  # double
            out[name] = struct.unpack_from("<d", mv, pos)[0]
            pos += 8
        elif etype == 0x02:  # string
            n = struct.unpack_from("<i", mv, pos)[0]
            out[name] = bytes(mv[pos + 4 : pos + 4 + n - 1]).decode()
            pos += 4 + n
        elif etype in (0x03, 0x04):  # embedded document / array
            sub, pos = _bson_read_doc(mv, pos)
            out[name] = list(sub.values()) if etype == 0x04 else sub
        elif etype == 0x08:  # bool
            out[name] = bool(mv[pos])
            pos += 1
        elif etype == 0x0A:  # null
            out[name] = None
        elif etype == 0x10:  # int32
            out[name] = struct.unpack_from("<i", mv, pos)[0]
            pos += 4
        elif etype in (0x12, 0x09):  # int64 / UTC datetime millis
            out[name] = struct.unpack_from("<q", mv, pos)[0]
            pos += 8
        else:
            raise ValueError(f"unsupported BSON element type 0x{etype:02x}")
    return out, end + 1


def bson_loads(buf: bytes) -> dict:
    """bytes -> dict (the reference's bson.loads / BSON.decode analog)."""
    doc, _ = _bson_read_doc(memoryview(buf), 0)
    return doc


def bson_dumps(doc: dict) -> bytes:
    """dict -> BSON bytes (test/fixture helper; same element subset)."""
    import struct

    body = b""
    for name, v in doc.items():
        key = name.encode() + b"\x00"
        if isinstance(v, bool):
            body += b"\x08" + key + (b"\x01" if v else b"\x00")
        elif isinstance(v, float):
            body += b"\x01" + key + struct.pack("<d", v)
        elif isinstance(v, str):
            s = v.encode()
            body += b"\x02" + key + struct.pack("<i", len(s) + 1) + s + b"\x00"
        elif v is None:
            body += b"\x0a" + key
        elif isinstance(v, int):
            if -(2**31) <= v < 2**31:
                body += b"\x10" + key + struct.pack("<i", v)
            else:
                body += b"\x12" + key + struct.pack("<q", v)
        elif isinstance(v, dict):
            body += b"\x03" + key + bson_dumps(v)
        elif isinstance(v, (list, tuple)):
            body += b"\x04" + key + bson_dumps({str(i): x for i, x in enumerate(v)})
        else:
            raise TypeError(f"unsupported BSON value type {type(v)}")
    return struct.pack("<i", len(body) + 5) + body + b"\x00"


def bson_to_json(col: Column) -> Column:
    """BSON binary column -> JSON string (pandas UDF; per-document parsing
    is inherent to the format — a rare legacy type, not a hot path; the
    reference's own conversion is per-value too, converted_types.py:85-86)."""
    import json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def conv(s):
        return s.map(
            lambda b: None
            if b is None
            else json.dumps(bson_loads(bytes(b)), separators=(",", ":"))
        )

    conv.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(conv, "string")(col)


def bson_from_json(col: Column) -> Column:
    """JSON string column -> BSON bytes (fixture/ingest path; pairs with
    bson_to_json for round-trip coverage of the BSON converted type)."""
    import json

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def conv(s):
        return s.map(lambda j: None if j is None else bson_dumps(json.loads(j)))

    conv.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(conv, "binary")(col)
