"""PLAIN encoders/decoders (vectorized) for the reference's physical types.

Wire parity: /root/reference/parquet/encoding.py:28-94 (SURVEY.md D1-D8).
Only the types the engine needs are implemented; all are zero-copy numpy.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_plain_int32",
    "decode_plain_int32",
    "encode_plain_int64",
    "decode_plain_int64",
    "encode_plain_float",
    "decode_plain_float",
    "encode_plain_double",
    "decode_plain_double",
    "encode_plain_byte_array",
    "decode_plain_byte_array",
    "encode_plain_boolean",
    "decode_plain_boolean",
]


def encode_plain_int32(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype="<i4").tobytes()


def decode_plain_int32(data: bytes, count: int) -> np.ndarray:
    return np.frombuffer(data, dtype="<i4", count=count)


def encode_plain_int64(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype="<i8").tobytes()


def decode_plain_int64(data: bytes, count: int) -> np.ndarray:
    return np.frombuffer(data, dtype="<i8", count=count)


def encode_plain_float(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype="<f4").tobytes()


def decode_plain_float(data: bytes, count: int) -> np.ndarray:
    return np.frombuffer(data, dtype="<f4", count=count)


def encode_plain_double(values: np.ndarray) -> bytes:
    return np.ascontiguousarray(values, dtype="<f8").tobytes()


def decode_plain_double(data: bytes, count: int) -> np.ndarray:
    return np.frombuffer(data, dtype="<f8", count=count)


def encode_plain_boolean(values: np.ndarray) -> bytes:
    """1 bit per value, LSB-first (reference reads via the bit-packed path
    at width 1, encoding.py:28-33)."""
    return np.packbits(
        np.ascontiguousarray(values, dtype=np.uint8), bitorder="little"
    ).tobytes()


def decode_plain_boolean(data: bytes, count: int) -> np.ndarray:
    return np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little", count=count
    ).astype(bool)


def encode_plain_byte_array(values: list[bytes] | np.ndarray) -> bytes:
    """Per value: `<i` length + raw bytes (encoding.py:67-69).

    Vectorized: lengths and payloads are assembled with one interleaved
    uint8 scatter instead of a per-value loop.
    """
    if len(values) == 0:
        return b""
    lengths = np.fromiter((len(v) for v in values), dtype=np.int64, count=len(values))
    payload = b"".join(values)
    total = 4 * len(values) + len(payload)
    out = np.empty(total, dtype=np.uint8)
    # target start offset of each [len][bytes] record
    starts = np.zeros(len(values), dtype=np.int64)
    starts[1:] = np.cumsum(lengths[:-1] + 4)
    len_le = np.ascontiguousarray(lengths, dtype="<i4").view(np.uint8).reshape(-1, 4)
    idx = starts[:, None] + np.arange(4)
    out[idx.ravel()] = len_le.ravel()
    src = np.frombuffer(payload, dtype=np.uint8)
    # positions of payload bytes: for each record, starts+4 .. starts+4+len
    mask = np.ones(total, dtype=bool)
    mask[idx.ravel()] = False
    out[mask] = src
    return out.tobytes()


def decode_plain_byte_array(data: bytes, count: int) -> list[bytes]:
    """Inverse of encode_plain_byte_array; returns a list of bytes objects."""
    out = []
    pos = 0
    mv = memoryview(data)
    for _ in range(count):
        n = int.from_bytes(mv[pos : pos + 4], "little", signed=True)
        pos += 4
        out.append(bytes(mv[pos : pos + n]))
        pos += n
    return out
