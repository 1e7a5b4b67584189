"""Pin the vendored oracle decoder to the reference's own unit-test byte
vectors (/root/reference/test/test_encoding.py — the executable wire-format
spec, see SURVEY.md §5 / FIXTURES.md F2)."""

import struct
from io import BytesIO

import pytest

from parquet_python_spark import reference_decoder as ref


def test_plain_int32():
    fo = BytesIO(struct.pack("<3i", 1, -2, 3))
    assert ref.read_plain_int32(fo, 3) == [1, -2, 3]


def test_plain_int64():
    fo = BytesIO(struct.pack("<2q", 2**40, -7))
    assert ref.read_plain_int64(fo, 2) == [2**40, -7]


def test_plain_float_double():
    assert ref.read_plain_float(BytesIO(struct.pack("<2f", 1.5, -2.25)), 2) == [1.5, -2.25]
    assert ref.read_plain_double(BytesIO(struct.pack("<2d", 1.5, -2.25)), 2) == [1.5, -2.25]


def test_plain_byte_array():
    fo = BytesIO(struct.pack("<i", 3) + b"foo" + struct.pack("<i", 0) + struct.pack("<i", 2) + b"hi")
    assert ref.read_plain_byte_array(fo, 3) == [b"foo", b"", b"hi"]


def test_varint_single_byte():
    # reference test_encoding.py:92-99 — 0x7F -> 127
    assert ref.read_unsigned_var_int(BytesIO(b"\x7f")) == 127


def test_varint_multi_byte():
    # reference test_encoding.py:101-105 — FF FF FF 7F -> 0x0FFFFFFF
    assert ref.read_unsigned_var_int(BytesIO(b"\xff\xff\xff\x7f")) == 0x0FFFFFFF


def test_rle_run_width_30():
    # reference test_encoding.py:85-89 — header 2<<1, width 30, value 1<<30
    fo = BytesIO(struct.pack("<i", 1 << 30))
    assert ref.read_rle(fo, 2 << 1, 30) == [1 << 30, 1 << 30]


def test_bitpacked_worked_example():
    # reference test_encoding.py:111-118 — the documented parquet example:
    # bytes 0b10001000 0b11000110 0b11111010 at width 3 -> [0..7]
    fo = BytesIO(bytes([0b10001000, 0b11000110, 0b11111010]))
    assert ref.read_bitpacked(fo, 1 << 1, 3) == [0, 1, 2, 3, 4, 5, 6, 7]


def test_bitpacked_width_zero():
    # reference test_encoding.py:120-125 — width 0 yields zeros, no payload
    fo = BytesIO(b"")
    assert ref.read_bitpacked(fo, 1 << 1, 0) == [0] * 8


def test_width_from_max_int_table():
    # reference test_encoding.py:140-163 — exhaustive 0..255 widths
    from parquet_python_spark.codecs import width_from_max_int

    for v in range(256):
        expected = v.bit_length()
        assert width_from_max_int(v) == expected


def test_hybrid_with_length_prefix():
    # hybrid with 4-byte length framing (encoding.py:224-229)
    body = bytes([2 << 1]) + struct.pack("<i", 5)[:1]  # RLE: count 2, width 7
    buf = struct.pack("<i", len(body)) + body
    assert ref.read_rle_bit_packed_hybrid(BytesIO(buf), 7) == [5, 5]


def test_hybrid_empty_returns_none():
    buf = struct.pack("<i", 0)
    assert ref.read_rle_bit_packed_hybrid(BytesIO(buf), 7) is None


@pytest.mark.parametrize("width", [1, 2, 3, 5, 8, 13, 17, 24, 31])
def test_bitpacked_lsb_first_cross_byte(width):
    """Bit-packed values cross byte boundaries LSB-first; round-trip a known
    pattern through our encoder and the oracle."""
    from parquet_python_spark.codecs import pack_bits_lsb
    import numpy as np

    vals = np.arange(8, dtype=np.int64) % (1 << width)
    data = pack_bits_lsb(vals, width)
    got = ref.read_bitpacked(BytesIO(data), 1 << 1, width)
    assert got[:8] == list(vals)
