"""DATA_PAGE_V2 framing, LZ4_RAW/BROTLI outer codecs, dict_dlba wire checks.

The reference reads V1 data pages only (/root/reference/parquet/__init__.py:
273-378) and raises on any outer codec beyond snappy/gzip (__init__.py:
234-236); these cover the modern-writer page shape and codecs on top of the
same engine kernels.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st


# ------------------------------------------------------------ wire framing

def test_page_v2_frame_roundtrip():
    from parquet_python_spark.codecs.registry import frame_page_v2, parse_page_v2

    assert parse_page_v2(frame_page_v2(b"LVL", b"DATA", 7, 2)) == (
        b"LVL", b"DATA", 7, 2,
    )
    # no nulls: def section omitted entirely, None on parse
    assert parse_page_v2(frame_page_v2(None, b"D", 5, 0)) == (None, b"D", 5, 0)


def test_page_v2_rejects_corrupt_frames():
    from parquet_python_spark.codecs.registry import frame_page_v2, parse_page_v2

    good = frame_page_v2(b"LVL", b"DATA", 7, 2)
    with pytest.raises(ValueError, match="magic"):
        parse_page_v2(b"XX" + good[2:])
    # def_len pointing past the buffer
    bad = good[:10] + (10**6).to_bytes(4, "little") + good[14:]
    with pytest.raises(ValueError, match="exceed"):
        parse_page_v2(bad)
    # nulls declared but no level section
    with pytest.raises(ValueError, match="definition levels"):
        parse_page_v2(frame_page_v2(None, b"D", 5, 3))
    # n_nulls > n_rows
    with pytest.raises(ValueError, match="exceed|header"):
        parse_page_v2(frame_page_v2(b"L", b"D", 2, 3))


@pytest.mark.parametrize("outer", ["lz4_raw", "brotli"])
def test_outer_lz4raw_brotli_roundtrip(outer):
    from parquet_python_spark.codecs.registry import unwrap_outer, wrap_outer

    buf = b"the quick brown fox " * 300
    params: dict = {}
    wrapped = wrap_outer(buf, params, outer)
    assert params["outer"] == outer and len(wrapped) < len(buf)
    assert unwrap_outer(wrapped, params) == buf
    # incompressible input: passthrough, params untouched
    rnd = np.random.default_rng(7).integers(0, 256, 4096, dtype=np.uint8)
    p2: dict = {}
    assert wrap_outer(rnd.tobytes(), p2, outer) == rnd.tobytes()
    assert "outer" not in p2


@pytest.mark.parametrize("outer", ["lz4_raw", "brotli"])
def test_bss_trial_under_new_outer_codecs(outer):
    """_select_float_codec's PLAIN-vs-BSS trial must run under the ACTUAL
    outer codec for the new pair too (r3 advice, extended)."""
    from parquet_python_spark.codecs.registry import encode_column, decode_column

    # slowly-varying doubles: classic BSS win under any byte-level codec
    vals = (np.arange(20_000, dtype=np.float64) * 1e-6 + 3.0)
    codec, params, payload, _ = encode_column(vals, "float64", outer=outer)
    out = decode_column(codec, payload, len(vals), params, "float64")
    assert np.asarray(out).tobytes() == vals.tobytes()  # bit-exact


# ----------------------------------------------- generic codec page shapes

_KIND_ARRS = {
    "int": pa.array([5, None, -3, None, 2**40] * 60, type=pa.int64()),
    "str": pa.array(["alpha", None, "", "beta-beta"] * 75),
    "float64": pa.array([1.5, None, -0.0, 3.25] * 75, type=pa.float64()),
    "bool": pa.array([True, None, False, True] * 75),
}


@pytest.mark.parametrize("kind", list(_KIND_ARRS))
@pytest.mark.parametrize("outer", [None, "zstd", "lz4_raw", "brotli"])
def test_encode_values_page_v2_roundtrip(kind, outer):
    from parquet_python_spark.operators.generic_codec import (
        _decode_values,
        _encode_values,
    )

    arr = _KIND_ARRS[kind]
    c, pj, payload, nv = _encode_values(arr, kind, None, page="v2", outer=outer)
    params = json.loads(pj)
    assert params["__page__"] == "v2"
    out = _decode_values(payload, len(arr), nv, c, pj, kind)
    assert out.equals(arr)
    # V2 contract: levels + header readable WITHOUT the data codec
    from parquet_python_spark.codecs.registry import parse_page_v2

    def_blob, _data, n_rows, n_nulls = parse_page_v2(payload)
    assert n_rows == len(arr) and n_nulls == arr.null_count
    assert (def_blob is not None) == (arr.null_count > 0)


@pytest.mark.parametrize("outer", ["zstd", "lz4_raw", "brotli"])
def test_encode_values_page_v1_whole_page_outer(outer):
    """V1 semantics: the outer codec wraps levels AND data as one unit
    (separate __pouter__ params so decode never double-unwraps)."""
    from parquet_python_spark.operators.generic_codec import (
        _decode_values,
        _encode_values,
    )

    arr = pa.array(([1, 2, 3, None] * 200), type=pa.int64())
    c, pj, payload, nv = _encode_values(arr, "int", None, page="v1", outer=outer)
    params = json.loads(pj)
    assert params.get("__pouter__") == outer
    out = _decode_values(payload, len(arr), nv, c, pj, "int")
    assert out.equals(arr)


def test_page_v2_header_mismatch_is_loud():
    from parquet_python_spark.operators.generic_codec import (
        _decode_values,
        _encode_values,
    )

    arr = pa.array([1, None, 3] * 100, type=pa.int64())
    c, pj, payload, nv = _encode_values(arr, "int", None, page="v2")
    with pytest.raises(ValueError, match="disagree"):
        _decode_values(payload, len(arr) + 1, nv, c, pj, "int")


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(-(2**50), 2**50)),
        min_size=0, max_size=400,
    ),
    page=st.sampled_from(["v1", "v2"]),
    outer=st.sampled_from([None, "zstd", "lz4_raw", "brotli"]),
)
def test_property_null_heavy_pages(vals, page, outer):
    """Null-heavy / all-null / empty chunks round-trip under both page
    shapes and every outer codec (the verdict's property-test ask)."""
    from parquet_python_spark.operators.generic_codec import (
        _decode_values,
        _encode_values,
    )

    arr = pa.array(vals, type=pa.int64())
    c, pj, payload, nv = _encode_values(arr, "int", None, page=page, outer=outer)
    assert nv == len(arr) - arr.null_count
    out = _decode_values(payload, len(arr), nv, c, pj, "int")
    assert out.equals(arr)


# --------------------------------------------------- dict_dlba wire checks

def _legal_dlba_wire():
    codes = np.array([0, 1, 2, 1, 0] * 8, dtype=np.int64)
    lens = np.array([1, 2, 3], dtype=np.int64)
    from parquet_python_spark.codecs.dictionary import encode_dict_dlba_wire

    return codes, lens, encode_dict_dlba_wire(codes, lens, b"abbccc")


def test_dict_dlba_legal_wire_still_decodes():
    from parquet_python_spark.codecs.dictionary import decode_dict_dlba_parts

    codes, lens, wire = _legal_dlba_wire()
    (l2, blob), idx = decode_dict_dlba_parts(wire, len(codes))
    assert list(l2) == [1, 2, 3] and blob == b"abbccc"
    assert (np.asarray(idx) == codes).all()


def test_dict_dlba_rejects_corrupt_wire():
    from parquet_python_spark.codecs.dictionary import (
        decode_dict_dlba_parts,
        encode_dict_dlba_wire,
    )

    codes, lens, wire = _legal_dlba_wire()
    # negative dictionary count
    bad = (-1).to_bytes(4, "little", signed=True) + wire[4:]
    with pytest.raises(ValueError, match="negative dictionary count"):
        decode_dict_dlba_parts(bad, len(codes))
    # lengths-sum / blob mismatch (blob truncated at encode)
    short = encode_dict_dlba_wire(codes, lens, b"abbcc")
    with pytest.raises(ValueError, match="do not match blob"):
        decode_dict_dlba_parts(short, len(codes))
    # blob size field pointing past the payload
    mv = bytearray(wire)
    pos = 8 + int.from_bytes(wire[4:8], "little")
    mv[pos : pos + 8] = (10**9).to_bytes(8, "little")
    with pytest.raises(ValueError, match="exceeds payload"):
        decode_dict_dlba_parts(bytes(mv), len(codes))
    # index width wider than the dictionary needs
    widths_at = 8 + int.from_bytes(wire[4:8], "little") + 8 + 6
    mv = bytearray(wire)
    mv[widths_at] = 33
    with pytest.raises(ValueError, match="index width"):
        decode_dict_dlba_parts(bytes(mv), len(codes))


# ------------------------------------------------ Spark end-to-end (V2 pages)

def test_encode_df_page_v2_outer_roundtrip(spark):
    """Whole-table round trip with V2 pages + LZ4_RAW outer: bit-identical
    rows, and every params blob carries the V2 marker."""
    from pyspark.sql import functions as F

    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df,
        encode_df,
    )

    df = spark.range(8_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 7 == 0, None)
        .otherwise(F.col("id") * 3)
        .alias("v"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.concat(F.lit("s"), F.col("id").cast("string")))
        .alias("s"),
    )
    kinds = {"k": "int", "v": "int", "s": "str"}
    blocks = encode_df(
        df, "k", kinds, n_parts=4, page="v2", outer="lz4_raw"
    ).cache()
    assert all('"__page__":"v2"' in r["params"] for r in blocks.collect())
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    got = sorted(
        (r["k"], r["v"], r["s"])
        for r in decode_df(blocks, "k", kinds, out_schema).collect()
    )
    exp = sorted((r["k"], r["v"], r["s"]) for r in df.collect())
    assert got == exp
    blocks.unpersist()
