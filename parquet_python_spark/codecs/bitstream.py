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
    bit first and may cross byte boundaries.  Counts that are not a
    multiple of 8 (one parquet "group" = 8 values) are zero-padded to the
    group boundary here — the reference's own zero-fill grammar
    (__init__.py:366-368); decode with the ORIGINAL count and the padding
    truncates away.
    """
    n = len(values)
    if n == 0 or width == 0:
        return b""
    vals = np.asarray(values)
    if vals.dtype.kind not in "iu":
        vals = vals.astype(np.int64)
    if width > 57:
        # rare fallback: explicit (n, width) bit matrix.  Zero-pad the tail
        # to a full 8-value group (callers like FOR/bitpack hand over raw
        # counts; the reference's group grammar zero-fills and truncates on
        # decode, __init__.py:366-368, so padded zeros are wire-legal)
        if n % 8:
            vals = np.concatenate(
                [vals, np.zeros(8 - n % 8, dtype=vals.dtype)]
            )
        v64 = np.ascontiguousarray(vals, dtype=np.uint64)
        shifts = np.arange(width, dtype=np.uint64)
        bits = ((v64[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
        return np.packbits(bits.ravel(), bitorder="little").tobytes()
    # Main path: 64-value superblocks.  64 values at `width` bits occupy
    # exactly `width` little-endian uint64 words — a fully CONTIGUOUS block,
    # so the byte stream is one sequential tobytes (memcpy) with no strided
    # gather and no per-group byte slicing.  The bit stream is identical to
    # eight consecutive 8-value groups (continuous LSB-first), so the wire
    # format the reference reads is unchanged.  Minimizing memory passes is
    # what lets 32 concurrent workers scale on one box.
    full64 = n - (n % 64)
    parts = []
    if full64:
        g = full64 // 64
        V = vals[:full64].reshape(g, 64)
        W = np.zeros((g, width), dtype=np.uint64)
        chunk = _cache_chunk(width)
        # cache-blocked: the 64 strided column passes stay inside one
        # L2-sized row chunk (4x faster than streaming the full matrix
        # through 64 times; measured on 8M x w17)
        for s in range(0, g, chunk):
            e = min(s + chunk, g)
            Vc, Wc = V[s:e], W[s:e]
            for j in range(64):
                bitpos = j * width
                k, shift = bitpos >> 6, bitpos & 63
                col = Vc[:, j].astype(np.uint64)
                Wc[:, k] |= col << np.uint64(shift)
                if shift and shift + width > 64:
                    Wc[:, k + 1] |= col >> np.uint64(64 - shift)
        parts.append(W.tobytes())
    if n % 64:
        parts.append(_pack_groups8(vals[full64:], width))
    return b"".join(parts)


def _cache_chunk(width: int) -> int:
    """Superblock rows per cache-blocked pass: ~1.5 MB working set
    (8*width B of words + ~256 B of values per row)."""
    return max(512, min(8192, 1_500_000 // (8 * width + 256)))


def _pack_groups8(vals: np.ndarray, width: int) -> bytes:
    """Pack < 64 values in 8-value groups (each exactly `width` bytes);
    the final partial group is zero-padded to 8 values."""
    n = len(vals)
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
    data: bytes | np.ndarray, width: int, count: int, out_dtype=np.int64,
    table: np.ndarray | None = None, offset: int = 0,
) -> np.ndarray:
    """Inverse of :func:`pack_bits_lsb`.

    ``out_dtype``: np.int64 (default) or np.int32 (valid when width <= 31) —
    the narrow output halves the result's memory writes AND all downstream
    traffic, which is what the 8->32-worker decode scaling bottlenecks on
    (one box, shared bandwidth).  The result is a zero-copy signed view of
    the unpack buffer — no trailing astype pass.

    ``table``: optional gather table — the unpacked values are treated as
    indices and ``table[value]`` is written to the result INSIDE the
    cache-blocked inner loop (fused unpack+gather).  This is the
    dictionary-decode fusion: a separate index buffer would cost an extra
    write+read of 4-8 B/value of memory traffic, the dominant term of the
    8->32 decode scaling wall.  Result dtype is table.dtype.

    ``offset``: optional constant added inside the same loop (the
    frame-of-reference fusion; wraparound uint64 add, viewed signed — the
    two's-complement low bits are exact for any ref the encoder admitted).
    table and offset are mutually exclusive."""
    if table is not None:
        final = table.dtype
    else:
        small = np.dtype(out_dtype).itemsize == 4 and width <= 31
        final = np.dtype(np.int32 if small else np.int64)
    if count == 0:
        return np.empty(0, dtype=final)
    if width == 0:
        if table is not None:
            return np.full(count, table[0], dtype=final)
        return np.full(count, offset, dtype=final) if offset \
            else np.zeros(count, dtype=final)
    raw = np.frombuffer(data, dtype=np.uint8) if not isinstance(data, np.ndarray) else data
    if width > 57:
        bits = np.unpackbits(raw, bitorder="little", count=count * width)
        weights = (np.int64(1) << np.arange(width, dtype=np.int64))
        idx = bits.reshape(count, width).astype(np.int64) @ weights
        if table is not None:
            return table[idx]
        return idx + offset if offset else idx
    # Main path mirrors the 64-value superblock packing: `width` uint64
    # words per 64 values, read as a zero-copy VIEW of the input bytes (no
    # pad-to-word-block copy pass); values extract with vector shifts
    # straight into the result buffer.  Only the <64-value tail pays the
    # padded 8-value-group path.
    mask = np.uint64((1 << width) - 1)
    off_u = np.uint64(offset & ((1 << 64) - 1)) if offset else None
    groups64 = count // 64
    need64 = groups64 * width * 8
    if table is not None:
        res = np.empty(count, dtype=final)
    else:
        res = np.empty(count, dtype=np.uint32 if final.itemsize == 4 else np.uint64)
    if groups64:
        try:
            W = raw[:need64].view(np.uint64).reshape(groups64, width)
        except ValueError:  # non-contiguous slice: one defensive copy
            W = np.frombuffer(
                raw[:need64].tobytes(), dtype=np.uint64
            ).reshape(groups64, width)
        out = res[: groups64 * 64].reshape(groups64, 64)
        chunk = _cache_chunk(width)
        for s in range(0, groups64, chunk):
            e = min(s + chunk, groups64)
            Wc, oc = W[s:e], out[s:e]
            for j in range(64):
                bitpos = j * width
                k, shift = bitpos >> 6, bitpos & 63
                v = Wc[:, k] >> np.uint64(shift)
                if shift and shift + width > 64:
                    v = v | (Wc[:, k + 1] << np.uint64(64 - shift))
                if table is not None:
                    oc[:, j] = table[v & mask]  # fused gather, L2-resident
                elif off_u is not None:
                    oc[:, j] = (v & mask) + off_u  # fused FOR add
                else:
                    oc[:, j] = v & mask  # store downcasts to narrow buffer
    tail_count = count - groups64 * 64
    if tail_count:
        # tail's narrow-buffer flag: for the fused-gather path the buffer
        # holds INDICES, so key it to the pack width, not the table value
        # dtype (an int32 table with width > 31 must not truncate indices
        # — unreachable while dict widths are <= 31, but latent otherwise)
        tail = _unpack_groups8(
            raw[need64:], width, tail_count, mask,
            (width <= 31) if table is not None else final.itemsize == 4,
        )
        if table is not None:
            tail = table[tail]
        elif off_u is not None:
            tail = tail + off_u
        res[groups64 * 64 :] = tail
    return res if table is not None else res.view(final)


def _unpack_groups8(
    raw: np.ndarray, width: int, count: int, mask: np.uint64, small: bool
) -> np.ndarray:
    """Unpack < 64 values: pad each width-byte 8-value group to its word
    block, then extract with vector shifts."""
    groups = (count + 7) // 8
    need = groups * width
    if len(raw) < need:
        raw = np.concatenate([raw, np.zeros(need - len(raw), dtype=np.uint8)])
    n_words = (8 * width + 63) // 64
    block = np.zeros((groups, n_words * 8), dtype=np.uint8)
    block[:, :width] = raw[:need].reshape(groups, width)
    W = block.view(np.uint64)
    out = np.empty((groups, 8), dtype=np.uint32 if small else np.uint64)
    for j in range(8):
        bitpos = j * width
        k, shift = bitpos >> 6, bitpos & 63
        v = W[:, k] >> np.uint64(shift)
        if shift and shift + width > 64:
            v = v | (W[:, k + 1] << np.uint64(64 - shift))
        out[:, j] = v & mask
    return out.reshape(-1)[:count]
