"""DELTA_BINARY_PACKED — the actual Parquet wire layout (public spec,
parquet-format Encodings.md; format enum parquet.thrift:297-300).

Neither the reference (jcrobak/parquet-python) nor this engine's own
``delta`` codec implements the real on-disk layout; this module does:

    header:  <block size in values: ULEB128>
             <miniblocks per block: ULEB128>
             <total value count:    ULEB128>
             <first value:   zigzag ULEB128>
    block:   <min delta:     zigzag ULEB128>
             <bit widths: 1 byte per miniblock>
             <miniblock payloads: LSB-first bit-packed, exactly
              values_per_miniblock * width / 8 bytes each (the last
              miniblock zero-pads to the full miniblock, per spec)>

Block geometry: 1024 values per block, 4 miniblocks of 256 (both
spec-legal: block multiple of 128, miniblock multiple of 32).  The large
miniblock keeps the per-miniblock Python loop negligible (one pack/unpack
kernel call per 256 values) while the per-block min-delta still adapts to
local drift — decode is one fused pass: unpack all miniblocks, add the
per-block min deltas, single cumsum.
"""

from __future__ import annotations

import numpy as np

from .bitstream import (
    decode_varint,
    encode_varint,
    pack_bits_lsb,
    unpack_bits_lsb,
    width_from_max_int,
)

__all__ = ["encode_delta_bp", "decode_delta_bp", "DELTA_BP_BLOCK", "DELTA_BP_MINIS"]

DELTA_BP_BLOCK = 1024
DELTA_BP_MINIS = 4


def _zigzag64(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag64(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


def encode_delta_bp(values) -> tuple[bytes, dict]:
    """Encode int64 values; returns (payload, params).  The payload is
    self-describing (params empty), matching the spec's page layout."""
    vals = np.ascontiguousarray(values, dtype=np.int64)
    n = len(vals)
    parts = [
        encode_varint(DELTA_BP_BLOCK),
        encode_varint(DELTA_BP_MINIS),
        encode_varint(n),
    ]
    if n == 0:
        parts.append(encode_varint(_zigzag64(0)))
        return b"".join(parts), {}
    # int64 diff would silently wrap across a > 2^62 value span (and the
    # normalized deltas span up to twice the delta range) — loud guard;
    # the selector never offers delta_bp for such chunks
    if int(vals.max()) - int(vals.min()) >= 2**62:
        raise ValueError("delta_bp: value span exceeds 2^62")
    first = int(vals[0])
    parts.append(encode_varint(_zigzag64(first)))
    deltas = np.diff(vals)
    vpm = DELTA_BP_BLOCK // DELTA_BP_MINIS
    nd = len(deltas)
    for pos in range(0, nd, DELTA_BP_BLOCK):
        blk = deltas[pos : pos + DELTA_BP_BLOCK]
        md = int(blk.min())
        parts.append(encode_varint(_zigzag64(md)))
        norm = (blk - md).astype(np.uint64)
        widths = bytearray(DELTA_BP_MINIS)
        packed = []
        for m in range(DELTA_BP_MINIS):
            mb = norm[m * vpm : (m + 1) * vpm]
            if len(mb) == 0:
                continue  # width stays 0, no payload (trailing empty mini)
            w = width_from_max_int(int(mb.max()))
            widths[m] = w
            if w == 0:
                continue  # all-min miniblock: no payload bytes
            if len(mb) < vpm:  # spec: last miniblock zero-pads to full size
                mb = np.concatenate(
                    [mb, np.zeros(vpm - len(mb), dtype=np.uint64)]
                )
            packed.append(pack_bits_lsb(mb, w))
        parts.append(bytes(widths))
        parts.extend(packed)
    return b"".join(parts), {}


def decode_delta_bp(data: bytes, n: int, params: dict | None = None) -> np.ndarray:
    """Inverse of :func:`encode_delta_bp` (vectorized: per-miniblock unpack
    into one delta buffer, then a single cumsum)."""
    buf = bytes(data)
    block, pos = decode_varint(buf, 0)
    minis, pos = decode_varint(buf, pos)
    total, pos = decode_varint(buf, pos)
    if total != n:
        raise ValueError(f"delta_bp: stored count {total} != requested {n}")
    zz_first, pos = decode_varint(buf, pos)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    first = _unzigzag64(zz_first)
    vpm = block // minis
    nd = n - 1
    out = np.empty(n, dtype=np.int64)
    out[0] = first
    deltas = out[1:]  # filled in place, then one cumsum pass
    done = 0
    while done < nd:
        zz_md, pos = decode_varint(buf, pos)
        md = _unzigzag64(zz_md)
        widths = buf[pos : pos + minis]
        pos += minis
        for m in range(minis):
            mb_count = min(vpm, nd - done)
            if mb_count <= 0:
                break
            w = widths[m]
            if w == 0:
                deltas[done : done + mb_count] = md
            else:
                nbytes = vpm * w // 8
                deltas[done : done + mb_count] = (
                    unpack_bits_lsb(buf[pos : pos + nbytes], w, mb_count) + md
                )
                pos += nbytes
            done += mb_count
    np.cumsum(deltas, out=deltas)
    out[1:] += first
    return out
