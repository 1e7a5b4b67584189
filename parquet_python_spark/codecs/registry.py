"""Codec registry + per-chunk auto-selector (the engine's 'optimizer').

SURVEY.md §4: codec auto-selection is a physical-data decision made inside
the encode kernel — sampled cardinality / run-count / value-range stats feed
a bytes cost model that picks dict / RLE-hybrid / FSST / bit-pack / FOR /
delta / PLAIN per column chunk.  The reference parses parquet Statistics but
never consumes them (parquet.thrift:198-206); here they drive the choice.

Public surface:
    encode_column(values, kind)  -> (codec_name, params_dict, payload_bytes)
    decode_column(codec, payload, n, params, kind) -> values
    chunk_stats(values)          -> dict of selector stats (also exported to
                                    the metrics/lineage table)
"""

from __future__ import annotations

import json

import numpy as np

from .bitstream import width_from_max_int
from .delta_bp import decode_delta_bp, encode_delta_bp
from .dictionary import decode_dict, dict_size_estimate, encode_dict
from .forpack import (
    decode_bitpack,
    decode_delta,
    decode_for,
    encode_bitpack,
    encode_delta,
    encode_for,
)
from .fsst import decode_fsst, encode_fsst, fsst_gain_sample
from .plain import (
    decode_plain_byte_array,
    decode_plain_int32,
    decode_plain_int64,
    encode_plain_byte_array,
    encode_plain_int32,
    encode_plain_int64,
)
from .rle import (
    decode_hybrid,
    encode_hybrid,
    encode_hybrid_params,
    hybrid_size_estimate,
)

__all__ = ["encode_column", "decode_column", "chunk_stats", "select_codec"]

_SAMPLE = 65536


def chunk_stats(values: np.ndarray) -> dict:
    """Sampled per-chunk statistics driving the codec selector."""
    vals = np.asarray(values)
    if vals.dtype.kind not in "iu":
        vals = vals.astype(np.int64)
    n = len(vals)
    if n == 0:
        return {
            "n": 0, "min": 0, "max": 0, "n_runs": 0,
            "card_est": 0, "pair_dup": 0.0,
        }
    sample = vals[:_SAMPLE]
    _, cnts = np.unique(sample, return_counts=True)
    card_sample = len(cnts)
    if n > len(sample):
        # Chao1 richness estimator: s + f1^2/(2*f2) — corrects the severe
        # undercount of plain sample-distinct on high-cardinality data
        # (uniform 2^17-range data would otherwise look dict-friendly)
        f1 = int((cnts == 1).sum())
        f2 = int((cnts == 2).sum())
        chao = card_sample + (f1 * f1) / (2 * f2) if f2 else card_sample * 2
        card_est = int(min(n, max(card_sample, chao)))
    else:
        card_est = card_sample
    # run structure measured on the sample, scaled to n (selector only needs
    # the cost ranking; the encoder itself re-segments exactly)
    boundaries = np.flatnonzero(sample[1:] != sample[:-1]) + 1
    counts = np.diff(np.concatenate(([0], boundaries, [len(sample)])))
    from .rle import MIN_RLE_RUN

    long_mask = counts >= MIN_RLE_RUN
    scale = n / len(sample)
    # delta width estimate for DELTA_BINARY_PACKED: bits to hold the
    # sampled (delta - min_delta) range.  Python-int span guard first —
    # an int64 np.diff would silently wrap on a > 2^62 value span.
    vmin, vmax = int(vals.min()), int(vals.max())
    if len(sample) >= 2 and vmax - vmin < 2**62:
        d = np.diff(sample.astype(np.int64))
        delta_w = width_from_max_int(int(d.max()) - int(d.min()))
    else:
        delta_w = 99  # delta_bp not applicable
    return {
        "n": n,
        "min": vmin,
        "max": vmax,
        "n_runs": max(1, int(len(counts) * scale)),
        "n_long_runs": int(long_mask.sum() * scale),
        "n_long_vals": int(counts[long_mask].sum() * scale),
        "card_est": card_est,
        "pair_dup": fsst_gain_sample(sample),
        "delta_w": delta_w,
    }


def select_codec(stats: dict, kind: str = "int") -> str:
    """Pick the codec with the smallest predicted encoded size."""
    n = stats["n"]
    if n == 0:
        return "plain64"
    lo, hi = stats["min"], stats["max"]
    nonneg = lo >= 0
    fits32 = -(2**31) <= lo and hi < 2**31
    costs: dict[str, float] = {}
    costs["plain64"] = 8 * n
    if fits32:
        costs["plain32"] = 4 * n
    if nonneg:
        w = width_from_max_int(hi)
        if w <= 31:
            costs["bitpack"] = (n + 7) // 8 * w
            # rle: long runs collapse to headers, the rest is bit-packed
            # (exactly the encoder's segmentation, see rle.encode_hybrid)
            n_long_runs = stats.get("n_long_runs", 0)
            n_bp = n - stats.get("n_long_vals", 0) + 8 * n_long_runs
            costs["rle"] = (
                n_long_runs * (3 + (w + 7) // 8)
                + (n_bp + 7) // 8 * w
                + 5 * (n_long_runs + 1)
            )
    w_for = width_from_max_int(max(hi - lo, 0))
    if w_for <= 62:
        costs["for"] = (n + 7) // 8 * w_for + 16
    w_d = stats.get("delta_w", 99)
    if n >= 2 and w_d <= 62:
        # DELTA_BINARY_PACKED: miniblocks are 256 values and the last one
        # zero-pads to FULL size (spec), so short chunks pay whole
        # miniblocks — cost counts ceil(deltas/256) padded miniblocks, not
        # raw n*w/8 (the unpadded formula overselected delta_bp on small
        # chunks ~3x).  Plus per-block overhead (min-delta varint + 4
        # width bytes per 1024) + header.  Wins on monotone/clustered keys
        # where deltas are narrow but the absolute range (FOR) is wide.
        n_minis = -(-(n - 1) // 256)
        costs["delta_bp"] = n_minis * 256 * w_d / 8 + (n / 1024) * 7 + 16
    card = max(stats["card_est"], 1)
    if card <= n // 2 or card <= 4096:
        costs["dict"] = dict_size_estimate(card, n, 8 if not fits32 else 4)
    avg_run = n / max(stats["n_runs"], 1)
    if (
        nonneg
        and stats["pair_dup"] > 0.45
        and hi < 2**24
        and card > 16
        and avg_run < 4  # run-dominated chunks belong to rle, not fsst
    ):
        # conservative: ~60% of duplicated pairs become symbol hits
        w = width_from_max_int(hi + 256)
        est_stream = n * (1 - min(stats["pair_dup"], 0.9) * 0.6)
        costs["fsst"] = est_stream * w / 8 + 2048
    return min(costs, key=costs.get)  # type: ignore[arg-type]


# ---------------------------------------------------------------- integers

def _enc_int(vals: np.ndarray, codec: str) -> tuple[dict, bytes]:
    if codec == "plain64":
        return {}, encode_plain_int64(vals)
    if codec == "plain32":
        return {}, encode_plain_int32(vals)
    if codec == "bitpack":
        payload, params = encode_bitpack(vals)
        return params, payload
    if codec == "for":
        payload, params = encode_for(vals)
        return params, payload
    if codec == "delta":
        payload, params = encode_delta(vals)
        return params, payload
    if codec == "delta_bp":
        payload, params = encode_delta_bp(vals)
        return params, payload
    if codec == "rle":
        w = width_from_max_int(int(np.max(vals, initial=0)))
        return encode_hybrid_params(vals, w)
    if codec == "dict":
        fits32 = len(vals) == 0 or (vals.min() >= -(2**31) and vals.max() < 2**31)
        ptype = "int32" if fits32 else "int64"
        return {"ptype": ptype}, encode_dict(
            vals.astype(np.int32) if ptype == "int32" else vals, ptype
        )
    if codec == "fsst":
        alphabet = int(np.max(vals, initial=0)) + 1
        payload, params = encode_fsst(vals, alphabet)
        return params, payload
    raise KeyError(f"unknown int codec {codec}")


def _dec_int(
    data: bytes, n: int, codec: str, params: dict, prefer32: bool = False
) -> np.ndarray:
    """prefer32: return int32 when the codec can produce it without an
    extra pass (token columns are int32 — the wide int64 default doubles
    every downstream memory touch, the 32-worker scaling bottleneck)."""
    if codec == "plain64":
        return np.asarray(decode_plain_int64(data, n), dtype=np.int64)
    if codec == "plain32":
        arr = decode_plain_int32(data, n)  # zero-copy '<i4' view
        return np.asarray(arr) if prefer32 else np.asarray(arr, dtype=np.int64)
    out_dtype = np.int32 if prefer32 else np.int64
    if codec == "bitpack":
        return decode_bitpack(data, n, params, out_dtype)
    if codec == "for":
        return decode_for(data, n, params, out_dtype)
    if codec == "delta":
        return decode_delta(data, n, params)
    if codec == "delta_bp":
        return decode_delta_bp(data, n, params)
    if codec == "rle":
        return decode_hybrid(
            data, params["width"], n, out_dtype, hdr2=params.get("hdr2", False)
        )
    if codec == "dict":
        vals = decode_dict(data, n, params.get("ptype", "int32"))
        if prefer32 and vals.dtype == np.int32:
            return vals
        return np.asarray(vals, dtype=np.int64)
    if codec == "fsst":
        return decode_fsst(data, n, params, out_dtype)
    raise KeyError(f"unknown int codec {codec}")


# ----------------------------------------------------------------- strings

def enc_str_lens_blob(lens: np.ndarray, blob: bytes, codec: str) -> tuple[dict, bytes]:
    """Core string encoding over Arrow-native (lengths, byte blob) layout.

    Lengths take the smaller of frame-of-reference and DELTA_BINARY_PACKED
    (recorded in params["lens_codec"]); codec "str_dlba" pins the
    delta_bp-lengths + raw-bytes layout — the Parquet
    DELTA_LENGTH_BYTE_ARRAY wire shape (public spec, Encodings.md: lengths
    as DELTA_BINARY_PACKED, then the concatenated byte data); codec
    "str_dba" is the Parquet DELTA_BYTE_ARRAY prefix-compressed wire
    (prefix lengths as delta_bp + suffixes as DLBA — see codecs/dba.py)."""
    if codec == "str_dba":
        from .dba import encode_dba

        return encode_dba(lens, blob)
    if codec == "str_dlba":
        len_payload, len_params = encode_delta_bp(lens)
        lens_codec = "dbp"
        body_src = "str_plain"
    else:
        for_payload, for_params = encode_for(lens)
        dbp_payload, dbp_params = encode_delta_bp(lens)
        if len(dbp_payload) < len(for_payload):
            len_payload, len_params, lens_codec = dbp_payload, dbp_params, "dbp"
        else:
            len_payload, len_params, lens_codec = for_payload, for_params, "for"
        body_src = codec
    if body_src == "str_plain":
        body = blob
        body_params: dict = {}
    elif body_src == "str_fsst":
        stream = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
        body, body_params = encode_fsst(stream, 256)
    else:
        raise KeyError(f"unknown str codec {codec}")
    payload = b"".join(
        [
            int(len(len_payload)).to_bytes(4, "little"),
            len_payload,
            int(len(blob)).to_bytes(8, "little"),
            body,
        ]
    )
    return (
        {"lens": len_params, "body": body_params, "lens_codec": lens_codec},
        payload,
    )


def dec_str_lens_blob(data: bytes, n: int, codec: str, params: dict):
    """Inverse of :func:`enc_str_lens_blob`; returns (lens, blob)."""
    if codec == "str_dba":
        from .dba import decode_dba

        return decode_dba(data, n)
    mv = memoryview(data)
    len_sz = int.from_bytes(mv[0:4], "little")
    if params.get("lens_codec", "for") == "dbp":
        lens = decode_delta_bp(bytes(mv[4 : 4 + len_sz]), n, params["lens"])
    else:
        lens = decode_for(mv[4 : 4 + len_sz], n, params["lens"])
    pos = 4 + len_sz
    blob_n = int.from_bytes(mv[pos : pos + 8], "little")
    pos += 8
    if codec in ("str_plain", "str_dlba"):
        blob = bytes(mv[pos:])[:blob_n]
    elif codec == "str_fsst":
        stream = decode_fsst(bytes(mv[pos:]), blob_n, params["body"])
        blob = stream.astype(np.uint8).tobytes()
    else:
        raise KeyError(f"unknown str codec {codec}")
    return lens, blob


def _enc_str(values, codec: str) -> tuple[dict, bytes]:
    """String-column codecs (non-Spark kernel API).  values: sequence of
    str/bytes.  Routed through the SAME zero-copy Arrow adapters the Spark
    hot path uses (arrow_io.encode_str_column) — one pa.array conversion,
    then buffer-level encode; no Python-level per-value loop anywhere."""
    import pyarrow as pa

    from .arrow_io import encode_str_column

    vals = list(values)
    # normalize when ANY element is bytes-like (mixed str/bytes input is
    # part of this API's contract; sniffing only vals[0] would crash on it)
    if any(isinstance(v, (bytes, bytearray, memoryview)) for v in vals):
        arr = pa.array(
            [v.encode() if isinstance(v, str) else bytes(v) for v in vals],
            type=pa.binary(),
        )
    else:
        arr = pa.array(vals, type=pa.utf8())
    c, params, payload = encode_str_column(arr, codec)
    return params, payload


def _dec_str(data: bytes, n: int, codec: str, params: dict) -> list[bytes]:
    import pyarrow as pa
    import pyarrow.compute as pc

    if codec == "dict":
        # binary (not utf8) dictionary expansion: this API must round-trip
        # arbitrary bytes, not just valid utf-8 text
        from .dictionary import decode_dict_parts

        uniques, indices = decode_dict_parts(data, n, "byte_array")
        dict_arr = pa.array(list(uniques), type=pa.binary())
        return pc.take(dict_arr, pa.array(indices, type=pa.int64())).to_pylist()
    if codec == "dict_dlba":
        from .arrow_io import string_array_from_lens_blob
        from .dictionary import decode_dict_dlba_parts

        (u_lens, u_blob), indices = decode_dict_dlba_parts(data, n)
        dict_arr = string_array_from_lens_blob(u_lens, u_blob, binary=True)
        return pc.take(dict_arr, pa.array(indices, type=pa.int64())).to_pylist()
    from .arrow_io import string_array_from_lens_blob

    lens, blob = dec_str_lens_blob(data, n, codec, params)
    # binary (arbitrary bytes) + large-offset promotion for >=2 GiB blobs
    arr = string_array_from_lens_blob(lens, blob, binary=True, allow_large=True)
    return arr.to_pylist()


def select_str_codec(values) -> str:
    """Selector for string columns: dict when low-cardinality, then
    DELTA_BYTE_ARRAY when consecutive values share long prefixes (sorted /
    clustered keys, URLs, paths), FSST when the byte stream shows motif
    repetition, plain otherwise.  DBA-vs-FSST compares estimated savings:
    dba removes ~gain of the blob outright, fsst converts ~60% of
    duplicated pairs to 1-symbol hits."""
    n = len(values)
    if n == 0:
        return "str_plain"
    probe = values[: min(n, 8192)]
    card = len(set(probe))
    if card <= max(16, len(probe) // 8):
        return "dict"
    sub = probe[:1024]
    blob = "".join(v if isinstance(v, str) else "" for v in sub).encode()
    fsst_g = 0.0
    if len(blob) > 256:
        stream = np.frombuffer(blob, dtype=np.uint8).astype(np.int64)
        fsst_g = fsst_gain_sample(stream)
    from .dba import dba_gain_sample

    lens = np.fromiter(
        (len(v.encode()) if isinstance(v, str) else 0 for v in sub),
        dtype=np.int64, count=len(sub),
    )
    dba_g = dba_gain_sample(lens, blob) if len(blob) else 0.0
    if dba_g > 0.3 and dba_g >= 0.6 * fsst_g:
        return "str_dba"
    if fsst_g > 0.5:
        return "str_fsst"
    return "str_plain"


# -------------------------------------------------- outer (page) compression

def wrap_outer(payload: bytes, params: dict, outer: str | None) -> bytes:
    """Optional whole-payload compression — parity with the reference's page
    decompress (D20: SNAPPY/GZIP at /root/reference/parquet/__init__.py:223-250).
    Orthogonal to the lightweight encodings; applied only when it shrinks
    (and never relied on by the <=-reference-size gate).  "gzip" matches the
    reference's GZIP member format (gzip.GzipFile) byte-compatibly;
    "snappy" covers the reference's other page codec via pyarrow's bundled
    raw-snappy; "zlib" is the raw-deflate variant and "zstd" the modern
    extra."""
    if not outer:
        return payload
    if outer == "zlib":
        import zlib

        compressed = zlib.compress(payload, 1)
    elif outer == "gzip":
        import gzip

        # mtime=0: deterministic output (checkpoint/resume reruns must be
        # byte-identical)
        compressed = gzip.compress(payload, compresslevel=1, mtime=0)
    elif outer in ("snappy", "zstd", "lz4_raw", "brotli"):
        # reference SNAPPY slot (D20, __init__.py:228-229) via pyarrow's
        # bundled codec (raw snappy format, same as python-snappy); zstd,
        # LZ4_RAW and BROTLI are the modern-writer extras the reference
        # raises on (__init__.py:234-236) — all four need the raw size
        # back at decompress (raw block formats carry no length framing).
        import pyarrow as pa

        compressed = bytes(pa.Codec(outer).compress(payload))
        if len(compressed) < len(payload):
            params["outer"] = outer
            params["outer_raw"] = len(payload)
            return compressed
        return payload
    else:
        raise KeyError(f"unknown outer codec {outer}")
    if len(compressed) < len(payload):
        params["outer"] = outer
        return compressed
    return payload


def unwrap_outer(payload: bytes, params: dict) -> bytes:
    outer = params.get("outer")
    if not outer:
        return payload
    if outer == "zlib":
        import zlib

        return zlib.decompress(payload)
    if outer == "gzip":
        import gzip

        return gzip.decompress(payload)
    if outer in ("snappy", "zstd", "lz4_raw", "brotli"):
        import pyarrow as pa

        return bytes(
            pa.Codec(outer).decompress(
                payload, decompressed_size=int(params["outer_raw"])
            )
        )
    raise KeyError(f"unknown outer codec {outer}")


# ----------------------------------------------------- DATA_PAGE_V2 framing

_PAGE_V2_MAGIC = b"P2"


def frame_page_v2(
    def_blob: bytes | None, data: bytes, n_rows: int, n_nulls: int
) -> bytes:
    """Assemble a DATA_PAGE_V2-shaped page: definition levels stored
    UNCOMPRESSED ahead of the (possibly outer-compressed) data section,
    with ``num_rows`` / ``num_nulls`` carried in the page header — the
    Parquet DataPageHeaderV2 layout (public format spec: levels are never
    inside the compressed region, so a reader can count rows and weave
    validity without touching the data codec).  The reference reads V1
    pages only (/root/reference/parquet/__init__.py:273-378); this is the
    beyond-reference page shape modern writers emit by default.

    Wire: [2B magic "P2"] [4B <u32 n_rows] [4B <u32 n_nulls]
          [4B <u32 def_len] [def levels, RLE/bit-packed width-1,
          UNCOMPRESSED] [data section]
    """
    def_blob = def_blob or b""
    return b"".join(
        [
            _PAGE_V2_MAGIC,
            int(n_rows).to_bytes(4, "little"),
            int(n_nulls).to_bytes(4, "little"),
            int(len(def_blob)).to_bytes(4, "little"),
            def_blob,
            data,
        ]
    )


def parse_page_v2(buf: bytes) -> tuple[bytes | None, bytes, int, int]:
    """Inverse of :func:`frame_page_v2`; returns
    (def_blob | None, data_section, n_rows, n_nulls).  Loud-fails on
    foreign bytes rather than decoding a fabricated page."""
    mv = memoryview(buf)
    if len(mv) < 14:
        raise ValueError("page_v2: buffer shorter than the fixed header")
    if bytes(mv[0:2]) != _PAGE_V2_MAGIC:
        raise ValueError("page_v2: bad magic")
    n_rows = int.from_bytes(mv[2:6], "little")
    n_nulls = int.from_bytes(mv[6:10], "little")
    def_len = int.from_bytes(mv[10:14], "little")
    if n_nulls > n_rows or def_len > len(mv) - 14:
        raise ValueError("page_v2: header lengths exceed payload")
    if n_nulls and not def_len:
        raise ValueError("page_v2: nulls declared but no definition levels")
    def_blob = bytes(mv[14 : 14 + def_len]) if def_len else None
    return def_blob, bytes(mv[14 + def_len :]), n_rows, n_nulls


# ------------------------------------------------------------- public API

def encode_column(values, kind: str = "int", codec: str | None = None, outer: str | None = None):
    """Encode one column chunk; returns (codec, params, payload, stats).

    ``outer`` optionally wraps the encoded payload in a general-purpose
    compressor (see wrap_outer) — the reference's page-compression layer."""
    codec, params, payload, stats = _encode_column_inner(values, kind, codec, outer)
    if outer:
        payload = wrap_outer(payload, params, outer)
    return codec, params, payload, stats


def _trial_compress_len(buf: bytes, outer: str) -> int:
    """Compressed size of ``buf`` under the ACTUAL outer codec (snappy and
    zstd have very different BSS win margins than deflate, so a zlib proxy
    can mispredict the PLAIN-vs-BSS trial for them).  gzip bodies ARE
    deflate streams, so zlib-1 is the exact proxy for both zlib and gzip."""
    if outer in ("snappy", "zstd", "lz4_raw", "brotli"):
        import pyarrow as pa

        return len(pa.Codec(outer).compress(buf))
    import zlib

    return len(zlib.compress(buf, 1))


def _select_float_codec(vals: np.ndarray, itemsize: int, outer: str | None) -> str:
    """PLAIN vs BYTE_STREAM_SPLIT for float chunks.  BSS is byte-identical
    in size to PLAIN on its own — it only pays off under an outer
    compressor — so the selection is a TRIAL: compress both layouts of a
    sample with the actual outer codec and keep BSS only when it shrinks
    the wrapped bytes.  Without an outer codec the answer is always
    PLAIN."""
    if not outer or len(vals) == 0:
        return "plain"
    from .plain import encode_bss

    sample = np.ascontiguousarray(vals[: min(len(vals), 16384)])
    plain_c = _trial_compress_len(sample.tobytes(), outer)
    bss_c = _trial_compress_len(encode_bss(sample, itemsize), outer)
    return "bss" if bss_c < plain_c * 0.98 else "plain"


def _encode_column_inner(values, kind: str, codec: str | None, outer: str | None = None):
    if kind == "int":
        # dtype-preserving: int32 inputs stay int32 through the kernels
        # (halves memory traffic — the scaling bottleneck at 32 workers)
        vals = np.asarray(values)
        if vals.dtype.kind not in "iu":
            vals = vals.astype(np.int64)
        stats = chunk_stats(vals)
        codec = codec or select_codec(stats, kind)
        params, payload = _enc_int(vals, codec)
        return codec, params, payload, stats
    if kind == "str":
        codec = codec or select_str_codec(values)
        params, payload = _enc_str(values, codec)
        stats = {"n": len(values)}
        return codec, params, payload, stats
    if kind == "bool":
        # D1 PLAIN boolean (reference encoding.py:28-33): 1 bit per value,
        # LSB-first — the same width-1 bit-packed layout the reference's
        # boolean reader consumes
        from .plain import encode_plain_boolean

        if codec not in (None, "plain_bool"):
            # don't silently ignore a forced codec (every other kind
            # honors or errors on it)
            raise KeyError(f"unknown bool codec {codec}")
        vals = np.asarray(values, dtype=bool)
        return "plain_bool", {}, encode_plain_boolean(vals), {"n": len(vals)}
    if kind in ("float32", "float64"):
        # PLAIN or BYTE_STREAM_SPLIT (Parquet's float encoding — streams
        # of byte k across all values; wins only under an outer codec, so
        # selection is trial-based in _select_float_codec)
        from .plain import (
            encode_bss,
            encode_plain_double,
            encode_plain_float,
        )

        itemsize = 4 if kind == "float32" else 8
        vals = np.ascontiguousarray(
            values, dtype="<f4" if itemsize == 4 else "<f8"
        )
        want = codec or _select_float_codec(vals, itemsize, outer)
        suffix = "f32" if itemsize == 4 else "f64"
        if want in (f"bss_{suffix}", "bss"):
            return f"bss_{suffix}", {}, encode_bss(vals, itemsize), {"n": len(vals)}
        if want not in (f"plain_{suffix}", "plain"):
            raise KeyError(f"unknown {kind} codec {want}")
        enc = encode_plain_float if itemsize == 4 else encode_plain_double
        return f"plain_{suffix}", {}, enc(vals), {"n": len(vals)}
    if kind == "flba":
        # D7 FIXED_LEN_BYTE_ARRAY (reference encoding.py:72-74): decimals,
        # UUIDs, md5 digests.  Width recorded in params.
        from .plain import encode_plain_flba

        if isinstance(values, np.ndarray) and values.dtype == np.uint8:
            width = values.shape[1] if values.ndim == 2 else 0
            n = values.shape[0] if values.ndim == 2 else 0
        else:
            n = len(values)
            width = len(values[0]) if n else 0
        return (
            "plain_flba",
            {"width": int(width)},
            encode_plain_flba(values, width),
            {"n": n},
        )
    if kind == "int96_ts":
        # D4 PLAIN int96 mapped to timestamps (reference encoding.py:51-54):
        # values are epoch millis int64; wire format is Impala-layout
        # (nanos-of-day <q, julian day <i), 12 bytes per value.
        from .plain import int96_from_epoch_millis

        vals = np.asarray(values, dtype=np.int64)
        return "int96", {}, int96_from_epoch_millis(vals), {"n": len(vals)}
    raise KeyError(f"unknown kind {kind}")


def decode_column(
    codec: str, payload: bytes, n: int, params: dict, kind: str = "int",
    prefer32: bool = False,
):
    payload = unwrap_outer(payload, params)
    if kind == "int":
        return _dec_int(payload, n, codec, params, prefer32)
    if kind == "str":
        return _dec_str(payload, n, codec, params)
    if kind == "bool":
        from .plain import decode_plain_boolean

        return np.asarray(decode_plain_boolean(payload, n), dtype=bool)
    if kind == "float32":
        from .plain import decode_bss, decode_plain_float

        if codec == "bss_f32":
            return decode_bss(payload, n, 4)
        return np.asarray(decode_plain_float(payload, n))
    if kind == "float64":
        from .plain import decode_bss, decode_plain_double

        if codec == "bss_f64":
            return decode_bss(payload, n, 8)
        return np.asarray(decode_plain_double(payload, n))
    if kind == "flba":
        from .plain import decode_plain_flba, flba_matrix_to_bytes_list

        return flba_matrix_to_bytes_list(
            decode_plain_flba(payload, n, int(params["width"]))
        )
    if kind == "int96_ts":
        from .plain import epoch_millis_from_int96

        return epoch_millis_from_int96(payload, n)
    raise KeyError(f"unknown kind {kind}")


def params_to_json(params: dict) -> str:
    return json.dumps(params, separators=(",", ":"))


def params_from_json(s: str) -> dict:
    return json.loads(s) if s else {}
