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
    if nd == 0:
        return b"".join(parts), {}
    # Vectorized across the whole chunk (round 6): the old per-miniblock
    # loop paid ~1k tiny pack_bits_lsb calls per 256k-value chunk — pure
    # python/numpy call overhead (~0.25s/chunk, >90% of the encode).  The
    # wire bytes are IDENTICAL: miniblocks are a multiple of 64 values, so
    # packing the concatenation of same-width miniblocks equals the
    # concatenation of their individual packs.
    nblocks = -(-nd // DELTA_BP_BLOCK)
    pad = nblocks * DELTA_BP_BLOCK - nd
    if pad:
        # pad with int64 max so block minima see only real values
        dpad = np.concatenate(
            [deltas, np.full(pad, np.iinfo(np.int64).max, dtype=np.int64)]
        )
    else:
        dpad = deltas
    D = dpad.reshape(nblocks, DELTA_BP_BLOCK)
    mins = D.min(axis=1)
    norm = (D - mins[:, None]).astype(np.uint64)
    if pad:
        norm.reshape(-1)[nd:] = 0  # spec: pad region packs as zeros
    M = norm.reshape(nblocks * DELTA_BP_MINIS, vpm)
    maxima = M.max(axis=1)
    widths = np.array(
        [width_from_max_int(int(x)) for x in maxima], dtype=np.uint8
    )
    # fully-pad miniblocks (no real value at all) stay width 0 / no payload
    # automatically: their max is the zeroed pad
    packed_by_mini: list[bytes | None] = [None] * len(maxima)
    for w in np.unique(widths):
        w = int(w)
        if w == 0:
            continue
        idx = np.flatnonzero(widths == w)
        blob = pack_bits_lsb(M[idx].reshape(-1), w)
        per = vpm * w // 8
        for r, i in enumerate(idx):
            packed_by_mini[i] = blob[r * per : (r + 1) * per]
    for b in range(nblocks):
        parts.append(encode_varint(_zigzag64(int(mins[b]))))
        base = b * DELTA_BP_MINIS
        parts.append(widths[base : base + DELTA_BP_MINIS].tobytes())
        for m in range(DELTA_BP_MINIS):
            p = packed_by_mini[base + m]
            if p is not None:
                parts.append(p)
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
    # Pass 1 (round 6): walk the stream structure only — varints and width
    # bytes — recording each payload-bearing miniblock's (dest, count, md,
    # byte offset).  Pass 2 unpacks all same-width miniblocks in ONE
    # kernel call each (payloads are full vpm-sized and vpm is a multiple
    # of 64, so unpacking their concatenation equals per-mini unpacks);
    # the old per-miniblock unpack paid ~1k tiny kernel calls per
    # 256k-value chunk, >90% of the decode.
    raw = np.frombuffer(buf, dtype=np.uint8)
    todo: list[tuple[int, int, int, int, int]] = []  # (dest, cnt, md, off, w)
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
                todo.append((done, mb_count, md, pos, w))
                pos += nbytes
            done += mb_count
    if todo:
        by_w: dict[int, list[tuple[int, int, int, int]]] = {}
        for dest, cnt, md, off, w in todo:
            by_w.setdefault(w, []).append((dest, cnt, md, off))
        for w, items in by_w.items():
            nbytes = vpm * w // 8
            cat = np.concatenate(
                [raw[off : off + nbytes] for _, _, _, off in items]
            )
            U = unpack_bits_lsb(cat, w, len(items) * vpm).reshape(-1, vpm)
            for r, (dest, cnt, md, _off) in enumerate(items):
                np.add(U[r, :cnt], md, out=deltas[dest : dest + cnt])
    np.cumsum(deltas, out=deltas)
    out[1:] += first
    return out
