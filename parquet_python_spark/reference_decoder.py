"""Independent, pure-Python re-derivation of the reference decoder semantics.

This module is the test ORACLE: every byte stream our encoders produce must
decode to the original values through THESE functions, which re-state (not
copy) the wire semantics of jcrobak/parquet-python:

  * read_plain_*            — /root/reference/parquet/encoding.py:28-94
  * read_unsigned_var_int   — encoding.py:97-107
  * read_rle                — encoding.py:110-126
  * read_bitpacked          — encoding.py:139-180
  * read_rle_bit_packed_hybrid — encoding.py:216-237
  * PLAIN_DICTIONARY page   — /root/reference/parquet/__init__.py:344-373
  * dictionary page (PLAIN) — __init__.py:381-395

Implementation style is deliberately different from the reference (big-int
shifts instead of a sliding byte window) but provably equivalent: the
reference's bit-packed reader consumes groups*width bytes and emits
floor(total_bits / width) values taken LSB-first across byte boundaries,
which equals ``(int.from_bytes(raw,'little') >> i*width) & mask``.

The reference's own unit-test byte vectors
(/root/reference/test/test_encoding.py) are replayed against this module in
tests/test_reference_decoder.py to pin the equivalence.
"""

from __future__ import annotations

import struct
from io import BytesIO

__all__ = [
    "read_plain_int32",
    "read_plain_int64",
    "read_plain_float",
    "read_plain_double",
    "read_plain_byte_array",
    "read_unsigned_var_int",
    "read_rle",
    "read_bitpacked",
    "read_rle_bit_packed_hybrid",
    "read_dictionary_indices_page",
    "read_plain_dictionary_values",
]


def read_plain_int32(fo, count):
    """PLAIN int32: `<i` little-endian ×count (encoding.py:36-43)."""
    data = fo.read(4 * count)
    if len(data) != 4 * count:
        raise EOFError("short read in PLAIN int32")
    return list(struct.unpack("<%di" % count, data))


def read_plain_int64(fo, count):
    """PLAIN int64 (encoding.py:46-48)."""
    return list(struct.unpack("<%dq" % count, fo.read(8 * count)))


def read_plain_float(fo, count):
    """PLAIN float32 (encoding.py:57-59)."""
    return list(struct.unpack("<%df" % count, fo.read(4 * count)))


def read_plain_double(fo, count):
    """PLAIN float64 (encoding.py:62-64)."""
    return list(struct.unpack("<%dd" % count, fo.read(8 * count)))


def read_plain_byte_array(fo, count):
    """PLAIN byte array: per value `<i` length + payload (encoding.py:67-69)."""
    out = []
    for _ in range(count):
        (length,) = struct.unpack("<i", fo.read(4))
        out.append(fo.read(length))
    return out


def read_unsigned_var_int(fo):
    """ULEB128 (encoding.py:97-107)."""
    result = 0
    shift = 0
    while True:
        byte = fo.read(1)[0]
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result
        shift += 7


def read_rle(fo, header, bit_width):
    """RLE run: count = header>>1; value = ceil(width/8) LE bytes zero-padded
    to 4 and read as signed int32 (encoding.py:110-126)."""
    count = header >> 1
    nbytes = (bit_width + 7) // 8
    raw = fo.read(nbytes)
    raw = raw + b"\x00" * (4 - len(raw))
    (value,) = struct.unpack("<i", raw)
    return [value] * count


def read_bitpacked(fo, header, width):
    """Bit-packed run: groups = header>>1; groups*width bytes; values taken
    LSB-first, possibly crossing bytes; zero padding may yield extra zeros
    (encoding.py:139-180 — equivalent big-int formulation, see module doc)."""
    num_groups = header >> 1
    count = num_groups * 8
    byte_count = (width * count) // 8
    if width == 0:
        return [0] * count
    raw = fo.read(byte_count)
    big = int.from_bytes(raw, "little")
    mask = (1 << width) - 1
    emitted = (len(raw) * 8) // width
    return [(big >> (i * width)) & mask for i in range(emitted)]


def read_rle_bit_packed_hybrid(fo, width, length=None):
    """Hybrid loop (encoding.py:216-237): optional `<i` length prefix, then
    varint headers with LSB selecting RLE (0) vs bit-packed (1)."""
    if length is None:
        length = read_plain_int32(fo, 1)[0]
        raw = fo.read(length)
        if raw == b"":
            return None
        fo = BytesIO(raw)
    res = []
    while fo.tell() < length:
        header = read_unsigned_var_int(fo)
        if header & 1:
            res += read_bitpacked(fo, header, width)
        else:
            res += read_rle(fo, header, width)
    return res


def read_plain_dictionary_values(fo, num_values, physical_type="int32"):
    """Dictionary page payload: PLAIN values (reference __init__.py:381-395)."""
    readers = {
        "int32": read_plain_int32,
        "int64": read_plain_int64,
        "float": read_plain_float,
        "double": read_plain_double,
        "byte_array": read_plain_byte_array,
    }
    return readers[physical_type](fo, num_values)


def read_dictionary_indices_page(data: bytes, num_values: int):
    """PLAIN_DICTIONARY data page body: 1-byte bit width, then hybrid runs
    until the buffer is exhausted, truncated to num_values
    (reference __init__.py:344-368)."""
    bit_width = data[0]
    body = data[1:]
    fo = BytesIO(body)
    indices = []
    while fo.tell() < len(body):
        indices.extend(read_rle_bit_packed_hybrid(fo, bit_width, len(body)))
    return indices[:num_values]
