"""Low-level bit-stream primitives shared by all codecs.

Wire-format parity targets (see SURVEY.md §2.3):
  * ULEB128 varint        — /root/reference/parquet/encoding.py:97-107 (D9)
  * LSB-first bit-packing — /root/reference/parquet/encoding.py:139-180 (D12)

All kernels are vectorized numpy; no per-value Python in the hot path.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_varint",
    "decode_varint",
    "width_from_max_int",
    "pack_bits_lsb",
    "unpack_bits_lsb",
]


def width_from_max_int(value: int) -> int:
    """Bits needed to hold ``value``: ceil(log2(value+1)).

    Parity with /root/reference/parquet/encoding.py:129-131 (D11), expressed
    via int.bit_length (identical for all non-negative ints).
    """
    if value < 0:
        raise ValueError("width_from_max_int expects a non-negative value")
    return int(value).bit_length()


def encode_varint(value: int) -> bytes:
    """ULEB128-encode a non-negative int (7-bit groups, MSB continuation)."""
    if value < 0:
        raise ValueError("varint expects a non-negative value")
    out = bytearray()
    while True:
        group = value & 0x7F
        value >>= 7
        if value:
            out.append(group | 0x80)
        else:
            out.append(group)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """Decode a ULEB128 varint from ``buf`` at ``pos``; return (value, new_pos)."""
    result = 0
    shift = 0
    while True:
        byte = buf[pos]
        pos += 1
        result |= (byte & 0x7F) << shift
        if not byte & 0x80:
            return result, pos
        shift += 7


def pack_bits_lsb(values: np.ndarray, width: int) -> bytes:
    """Bit-pack ``values`` at ``width`` bits each, LSB-first within bytes.

    The produced byte stream is decodable by the reference's bit-packed-run
    reader (encoding.py:139-180): value bits are laid out least-significant
    bit first and may cross byte boundaries.  ``len(values)`` must be a
    multiple of 8 (one parquet "group" = 8 values); pad with zeros upstream.
    """
    n = len(values)
    if n == 0 or width == 0:
        return b""
    vals = np.asarray(values)
    if vals.dtype.kind not in "iu":
        vals = vals.astype(np.int64)
    if width > 57:
        # rare fallback: explicit (n, width) bit matrix
        if n % 8:
            raise ValueError("pack_bits_lsb needs a multiple of 8 values")
        v64 = np.ascontiguousarray(vals, dtype=np.uint64)
        shifts = np.arange(width, dtype=np.uint64)
        bits = ((v64[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        return np.packbits(bits.ravel(), bitorder="little").tobytes()
    # 8 consecutive values occupy exactly `width` bytes; build each group's
    # bit block in <=4 little-endian uint64 words with 8 vector shifts.
    # Full groups pack from a reshaped VIEW of the input (no copy, any int
    # dtype); only the <=7-value tail is padded separately — minimizing
    # memory traffic is what lets 32 concurrent workers scale.
    full = n - (n % 8)
    groups = full // 8
    n_words = (8 * width + 63) // 64
    parts = []
    if groups:
        V = vals[:full].reshape(groups, 8)
        W = np.zeros((groups, n_words), dtype=np.uint64)
        for j in range(8):
            bitpos = j * width
            k, shift = bitpos >> 6, bitpos & 63
            col = V[:, j].astype(np.uint64)
            W[:, k] |= col << np.uint64(shift)
            if shift and shift + width > 64:
                W[:, k + 1] |= col >> np.uint64(64 - shift)
        # first `width` bytes of each group's little-endian word block
        parts.append(W.view(np.uint8).reshape(groups, n_words * 8)[:, :width].tobytes())
    if n % 8:
        tail = np.zeros(8, dtype=np.uint64)
        tail[: n % 8] = vals[full:]
        W = np.zeros(n_words, dtype=np.uint64)
        for j in range(8):
            bitpos = j * width
            k, shift = bitpos >> 6, bitpos & 63
            W[k] |= tail[j] << np.uint64(shift)
            if shift and shift + width > 64:
                W[k + 1] |= tail[j] >> np.uint64(64 - shift)
        parts.append(W.view(np.uint8)[:width].tobytes())
    return b"".join(parts)


def unpack_bits_lsb(
    data: bytes | np.ndarray, width: int, count: int, out_dtype=np.int64
) -> np.ndarray:
    """Inverse of :func:`pack_bits_lsb`.

    ``out_dtype``: np.int64 (default) or np.int32 (valid when width <= 31) —
    the narrow output halves the result's memory writes AND all downstream
    traffic, which is what the 8->32-worker decode scaling bottlenecks on
    (one box, shared bandwidth).  The result is a zero-copy signed view of
    the unpack buffer — no trailing astype pass."""
    small = np.dtype(out_dtype).itemsize == 4 and width <= 31
    final = np.int32 if small else np.int64
    if count == 0:
        return np.empty(0, dtype=final)
    if width == 0:
        return np.zeros(count, dtype=final)
    raw = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    if width > 57:
        bits = np.unpackbits(raw, bitorder="little", count=count * width)
        weights = (np.int64(1) << np.arange(width, dtype=np.int64))
        return bits.reshape(count, width).astype(np.int64) @ weights
    # inverse of the grouped word packing: pad each width-byte group to its
    # word block, then extract the 8 values with vector shifts.
    groups = (count + 7) // 8
    need = groups * width
    if len(raw) < need:
        raw = np.concatenate([raw, np.zeros(need - len(raw), dtype=np.uint8)])
    n_words = (8 * width + 63) // 64
    block = np.zeros((groups, n_words * 8), dtype=np.uint8)
    block[:, :width] = raw[:need].reshape(groups, width)
    W = block.view(np.uint64)
    mask = np.uint64((1 << width) - 1)
    out = np.empty((groups, 8), dtype=np.uint32 if small else np.uint64)
    for j in range(8):
        bitpos = j * width
        k, shift = bitpos >> 6, bitpos & 63
        v = W[:, k] >> np.uint64(shift)
        if shift and shift + width > 64:
            v = v | (W[:, k + 1] << np.uint64(64 - shift))
        out[:, j] = v & mask  # store downcasts to the narrow buffer
    return out.reshape(-1)[:count].view(final)
