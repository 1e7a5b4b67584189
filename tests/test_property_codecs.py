"""Property-based round-trip tests (hypothesis) over every codec kind.

The reference has no property testing (SURVEY.md §5); these harden the
engine's wire formats against edge shapes the fixture profiles miss:
empty chunks, single values, all-equal runs, width boundaries, negative
ints, zero-length strings, non-ascii bytes.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_python_spark.codecs import decode_column, encode_column

SET = settings(max_examples=60, deadline=None)


int_arrays = st.lists(
    st.integers(min_value=-(2**62), max_value=2**62 - 1), min_size=0, max_size=400
)
small_nonneg = st.lists(
    st.integers(min_value=0, max_value=2**17 - 1), min_size=0, max_size=400
)


@SET
@given(int_arrays)
def test_int_roundtrip_auto(vals):
    arr = np.array(vals, dtype=np.int64)
    codec, params, payload, _ = encode_column(arr, "int")
    out = decode_column(codec, payload, len(arr), params, "int")
    assert np.array_equal(np.asarray(out, dtype=np.int64), arr)


@SET
@given(small_nonneg, st.sampled_from(["plain64", "plain32", "bitpack", "for", "rle", "dict", "delta", "fsst"]))
def test_int_roundtrip_every_codec(vals, codec):
    arr = np.array(vals, dtype=np.int64)
    c, params, payload, _ = encode_column(arr, "int", codec=codec)
    out = decode_column(c, payload, len(arr), params, "int")
    assert np.array_equal(np.asarray(out, dtype=np.int64), arr)


@SET
@given(
    st.lists(
        st.integers(min_value=0, max_value=30), min_size=2, max_size=400
    ).map(lambda runs: [v for i, v in enumerate(runs) for _ in range(1 + (i * 7) % 40)])
)
def test_runny_rle_roundtrip(vals):
    arr = np.array(vals, dtype=np.int64)
    c, params, payload, _ = encode_column(arr, "int", codec="rle")
    out = decode_column(c, payload, len(arr), params, "int")
    assert np.array_equal(np.asarray(out, dtype=np.int64), arr)


@SET
@given(st.lists(st.text(max_size=40), min_size=0, max_size=200),
       st.sampled_from(["str_plain", "str_fsst", "dict", "str_dlba",
                        "str_dba", "dict_dlba"]))
def test_str_roundtrip(strings, codec):
    c, params, payload, _ = encode_column(strings, "str", codec=codec)
    out = decode_column(c, payload, len(strings), params, "str")
    assert [b.decode() for b in out] == strings


@given(st.lists(st.binary(max_size=200), min_size=0, max_size=300))
def test_dba_wire_roundtrip_binary(vals):
    """DELTA_BYTE_ARRAY over arbitrary binary values (any shared-prefix
    structure, empties, long runs) — encode/decode is the identity."""
    import numpy as np

    from parquet_python_spark.codecs.dba import decode_dba, encode_dba

    lens = np.array([len(b) for b in vals], dtype=np.int64)
    blob = b"".join(vals)
    _, payload = encode_dba(lens, blob)
    out_lens, out_blob = decode_dba(payload, len(vals))
    assert np.array_equal(out_lens, lens) and out_blob == blob


@SET
@given(st.lists(st.floats(allow_nan=False, width=32), min_size=0, max_size=300))
def test_f32_roundtrip_bit_exact(vals):
    arr = np.array(vals, dtype=np.float32)
    c, params, payload, _ = encode_column(arr, "float32")
    out = np.asarray(decode_column(c, payload, len(arr), params, "float32"))
    assert out.dtype == np.float32 and np.array_equal(out, arr)


@SET
@given(st.lists(st.floats(allow_nan=False), min_size=0, max_size=300))
def test_f64_roundtrip_bit_exact(vals):
    arr = np.array(vals, dtype=np.float64)
    c, params, payload, _ = encode_column(arr, "float64")
    out = np.asarray(decode_column(c, payload, len(arr), params, "float64"))
    assert out.dtype == np.float64 and np.array_equal(out, arr)


@given(st.lists(st.booleans(), min_size=0, max_size=400))
def test_bool_roundtrip(vals):
    import numpy as np

    from parquet_python_spark.codecs import decode_column, encode_column

    arr = np.asarray(vals, dtype=bool)
    codec, params, payload, _ = encode_column(arr, "bool")
    out = decode_column(codec, payload, len(arr), params, "bool")
    assert np.array_equal(np.asarray(out), arr)
    assert len(payload) == (len(arr) + 7) // 8
