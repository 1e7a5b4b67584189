"""Generic per-column encode/decode over arbitrary DataFrames.

Extends the engine beyond the tokens schema: any table becomes a blocks
table (one row per partition x column) and back, using the same codec
registry + auto-selector.  This is what lets the engine cover the
reference's full read path on its own fixtures (ints, strings, doubles,
arrays) — SURVEY.md §2.3 D1-D22 re-expressed Spark-first.

Column kinds:
    int      — any integral Spark type (encoded as int64 chunks)
    str      — StringType
    float64  — DoubleType (PLAIN, bit-exact)
    float32  — FloatType  (PLAIN, bit-exact)
    int_list — ArrayType(int)    (flattened values + lengths chunk)
    f32_list — ArrayType(float)  (flattened values + lengths chunk)

Round-trip is two Spark stages (encode -> blocks -> decode), each a single
applyInPandas over content-salted partitions; the row order inside a
partition is pinned by sorting on the key column, so all column chunks of
a partition zip back together positionally.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..codecs import decode_column, encode_column, params_from_json, params_to_json

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.IntegerType(), False),
        T.StructField("column", T.StringType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("params", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_values", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("enc_bytes", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),
    ]
)

_LIST_KINDS = {"int_list": "int", "f32_list": "float32"}
_SCALAR_KIND_ENC = {
    "int": ("int", lambda s: s.to_numpy(dtype=np.int64)),
    "str": ("str", lambda s: s.tolist()),
    "float64": ("float64", lambda s: s.to_numpy(dtype=np.float64)),
    "float32": ("float32", lambda s: s.to_numpy(dtype=np.float32)),
    # D7 FIXED_LEN_BYTE_ARRAY: a BinaryType column of equal-length values
    "flba": ("flba", lambda s: [bytes(v) for v in s.tolist()]),
    # D4 int96 timestamps: epoch-millis int64 -> Impala-layout 12-byte wire
    "int96_ts": ("int96_ts", lambda s: s.to_numpy(dtype=np.int64)),
}


def _encode_chunk(vals, kind: str, forced: str | None):
    codec, params, payload, _ = encode_column(vals, kind, codec=forced)
    return codec, params_to_json(params), payload


def _encode_chunk_nullable(series: pd.Series, kind: str, forced: str | None):
    """Definition-level null handling (reference __init__.py:295-317,336-338;
    SURVEY.md D17): a width-1 RLE/bit-packed-hybrid validity stream prefixes
    the payload, and only non-null values are value-encoded."""
    from ..codecs.rle import encode_hybrid

    mask = series.isna().to_numpy()
    if not mask.any():
        codec, params, payload = _encode_chunk(_conv_scalar(series, kind), kind, forced)
        return codec, params, payload, len(series)
    def_levels = (~mask).astype(np.int64)
    def_blob = encode_hybrid(def_levels, 1)
    present = series[~mask]
    codec, params, payload = _encode_chunk(_conv_scalar(present, kind), kind, forced)
    full = b"".join(
        [int(len(def_blob)).to_bytes(4, "little"), def_blob, payload]
    )
    p = params_from_json(params)
    p["__nulls__"] = True
    return codec, params_to_json(p), full, int((~mask).sum())


def _conv_scalar(series: pd.Series, kind: str):
    kind_name, conv = _SCALAR_KIND_ENC[kind]
    return conv(series)


def _decode_chunk_nullable(payload, n_rows, n_values, codec, params_json, kind):
    """Inverse of _encode_chunk_nullable: decode validity, weave nulls."""
    from ..codecs.rle import decode_hybrid

    params = params_from_json(params_json)
    if not params.pop("__nulls__", False):
        return decode_column(codec, payload, n_values, params, kind), None
    mv = memoryview(payload)
    def_sz = int.from_bytes(mv[0:4], "little")
    def_levels = decode_hybrid(bytes(mv[4 : 4 + def_sz]), 1, n_rows)
    vals = decode_column(codec, bytes(mv[4 + def_sz :]), n_values, params, kind)
    return vals, def_levels.astype(bool)


def encode_df(
    df: DataFrame,
    key_col: str,
    col_kinds: dict[str, str],
    n_parts: int = 16,
    forced_codecs: dict[str, str] | None = None,
) -> DataFrame:
    """Encode ``col_kinds`` columns of ``df`` into a blocks DataFrame.

    Partitioning is content-addressed (crc32 of the key column mod
    n_parts) so it is deterministic at any parallelism.
    """
    forced_codecs = forced_codecs or {}
    cols = [key_col] + [c for c in col_kinds if c != key_col]
    work = df.select(*cols).withColumn(
        "part_id",
        F.pmod(
            F.crc32(F.coalesce(F.col(key_col).cast("string"), F.lit(""))),
            F.lit(n_parts),
        ).cast("int"),
    )

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(key_col, kind="mergesort").reset_index(drop=True)
        part_id = int(pdf["part_id"].iloc[0])
        n_rows = len(pdf)
        rows = []

        def add(column, codec, params, payload, n_values):
            rows.append(
                {
                    "part_id": part_id,
                    "column": column,
                    "codec": codec,
                    "params": params,
                    "payload": payload,
                    "n_values": n_values,
                    "n_rows": n_rows,
                    "enc_bytes": len(payload),
                    "checksum": zlib.crc32(payload),
                }
            )

        for col, kind in col_kinds.items():
            forced = forced_codecs.get(col)
            if kind in _LIST_KINDS:
                elem_kind = _LIST_KINDS[kind]
                arrays = pdf[col].to_numpy()
                lens = np.fromiter(
                    (len(a) for a in arrays), dtype=np.int64, count=n_rows
                )
                dtype = np.int64 if elem_kind == "int" else np.float32
                flat = (
                    np.concatenate([np.asarray(a, dtype=dtype) for a in arrays])
                    if n_rows
                    else np.empty(0, dtype=dtype)
                )
                c, p, payload = _encode_chunk(lens, "int", None)
                add(col + ".lens", c, p, payload, len(lens))
                c, p, payload = _encode_chunk(flat, elem_kind, forced)
                add(col + ".vals", c, p, payload, len(flat))
            else:
                c, p, payload, n_vals = _encode_chunk_nullable(pdf[col], kind, forced)
                add(col, c, p, payload, n_vals)
        return pd.DataFrame(rows)

    return work.groupBy("part_id").applyInPandas(enc, schema=BLOCKS_SCHEMA)


def decode_df(blocks: DataFrame, key_col: str, col_kinds: dict[str, str], out_schema: T.StructType) -> DataFrame:
    """Inverse of :func:`encode_df`; returns rows bit-identical to input."""

    def dec(pdf: pd.DataFrame) -> pd.DataFrame:
        by_col = {r["column"]: r for _, r in pdf.iterrows()}
        out = {}

        def chunk(column, kind):
            row = by_col[column]
            payload = bytes(row["payload"])
            if zlib.crc32(payload) != int(row["checksum"]):
                raise ValueError(f"checksum mismatch in {column}")
            return decode_column(
                row["codec"], payload, int(row["n_values"]),
                params_from_json(row["params"]), kind,
            )

        n_rows = int(next(iter(by_col.values()))["n_rows"])
        for col, kind in col_kinds.items():
            if kind in _LIST_KINDS:
                elem_kind = _LIST_KINDS[kind]
                lens = np.asarray(chunk(col + ".lens", "int"), dtype=np.int64)
                flat = np.asarray(chunk(col + ".vals", elem_kind))
                offsets = np.zeros(n_rows + 1, dtype=np.int64)
                np.cumsum(lens, out=offsets[1:])
                out[col] = [flat[offsets[i] : offsets[i + 1]] for i in range(n_rows)]
            else:
                row = by_col[col]
                payload = bytes(row["payload"])
                if zlib.crc32(payload) != int(row["checksum"]):
                    raise ValueError(f"checksum mismatch in {col}")
                vals, valid = _decode_chunk_nullable(
                    payload, n_rows, int(row["n_values"]), row["codec"],
                    row["params"], kind,
                )
                if kind == "str":
                    vals = [b.decode() for b in vals]
                if valid is None:
                    out[col] = vals
                else:
                    # null weave (reference __init__.py:336-338)
                    woven = np.empty(n_rows, dtype=object)
                    woven[valid] = np.asarray(vals, dtype=object)[
                        : int(valid.sum())
                    ]
                    woven[~valid] = None
                    out[col] = woven
        return pd.DataFrame(out)[list(col_kinds)]

    return blocks.groupBy("part_id").applyInPandas(dec, schema=out_schema)


def roundtrip(
    df: DataFrame,
    key_col: str,
    col_kinds: dict[str, str],
    n_parts: int = 16,
    forced_codecs: dict[str, str] | None = None,
) -> DataFrame:
    """encode -> blocks -> decode; output schema mirrors the selected input
    columns (Spark types preserved via cast at the end)."""
    cols = list(col_kinds)
    in_schema = df.select(*cols).schema
    blocks = encode_df(df, key_col, col_kinds, n_parts, forced_codecs)
    decoded = decode_df(blocks, key_col, col_kinds, _pandas_safe_schema(in_schema))
    # cast back to the exact input Spark types (e.g. int32 vs int64)
    return decoded.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in in_schema.fields]
    )


def _pandas_safe_schema(schema: T.StructType) -> T.StructType:
    """Widen ints to long / float32 arrays stay float32 — what the pandas
    kernels naturally produce before the final cast."""
    fields = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            dt = T.LongType()
        fields.append(T.StructField(f.name, dt, True))
    return T.StructType(fields)
