"""Block-level min/max statistics + predicate-pruned decode.

The reference parses parquet Statistics{min,max} but never consults them
(parquet.thrift:198-206, SURVEY.md §4); here they actually skip blocks.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def keyed_df(spark):
    return spark.range(20_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
        F.concat(F.lit("row"), F.col("id").cast("string")).alias("s"),
    )


def test_blocks_carry_minmax_stats(spark, keyed_df):
    from parquet_python_spark.operators.generic_codec import encode_df

    blocks = encode_df(
        keyed_df, "k", {"k": "int", "v": "int", "s": "str"},
        n_parts=8, partitioning="range",
    ).cache()
    stats = {
        (r["part_id"], r["column"]): (r["stat_min"], r["stat_max"])
        for r in blocks.collect()
    }
    # int chunks have stats; string chunks don't
    assert all(
        stats[(p, c)][0] is not None
        for (p, c) in stats
        if c in ("k", "v")
    )
    assert all(stats[(p, c)][0] is None for (p, c) in stats if c == "s")
    # range partitioning: per-part key ranges are disjoint and ordered
    k_ranges = sorted(v for (p, c), v in stats.items() if c == "k")
    for (lo1, hi1), (lo2, hi2) in zip(k_ranges, k_ranges[1:]):
        assert hi1 < lo2
    blocks.unpersist()


def test_pruned_decode_exact_and_selective(spark, keyed_df):
    from parquet_python_spark.operators.generic_codec import (
        decode_df_pruned,
        encode_df,
        _arrow_safe_schema,
    )

    kinds = {"k": "int", "v": "int", "s": "str"}
    blocks = encode_df(
        keyed_df, "k", kinds, n_parts=16, partitioning="range"
    ).cache()
    lo, hi = 5_000, 6_000
    out_schema = _arrow_safe_schema(keyed_df.select(*kinds).schema, kinds)
    dec = decode_df_pruned(blocks, "k", kinds, out_schema, "k", lo, hi)
    # superset semantics: everything in [lo, hi] present after exact filter
    got = sorted(
        (r["k"], r["v"], r["s"])
        for r in dec.filter((F.col("k") >= lo) & (F.col("k") <= hi)).collect()
    )
    exp = sorted(
        (r["k"], r["v"], r["s"])
        for r in keyed_df.filter((F.col("k") >= lo) & (F.col("k") <= hi)).collect()
    )
    assert got == exp
    # selectivity: only blocks overlapping [lo, hi] were decoded
    decoded_parts = dec.select().count()  # rows decoded across kept parts
    kept = (
        blocks.filter(
            (F.col("column") == "k")
            & (F.col("stat_max") >= lo)
            & (F.col("stat_min") <= hi)
        ).count()
    )
    total = blocks.filter(F.col("column") == "k").count()
    assert kept < total  # pruning actually skipped blocks
    assert decoded_parts < 20_000  # and decode touched a strict subset of rows
    blocks.unpersist()


def test_roundtrip_filtered_end_to_end(spark, keyed_df):
    from parquet_python_spark.operators.generic_codec import roundtrip_filtered

    out = roundtrip_filtered(
        keyed_df, "k", {"k": "int", "v": "int", "s": "str"},
        "k", 100, 250, n_parts=16,
    )
    got = sorted((r["k"], r["v"], r["s"]) for r in out.collect())
    exp = sorted(
        (r["k"], r["v"], r["s"])
        for r in keyed_df.filter((F.col("k") >= 100) & (F.col("k") <= 250)).collect()
    )
    assert got == exp


def test_pruned_decode_rejects_non_numeric_pred(spark, keyed_df):
    # r5: str predicates are now SUPPORTED (truncated string zone maps) —
    # but only with str bounds; int bounds on a str column stay loud
    from parquet_python_spark.operators.generic_codec import roundtrip_filtered

    with pytest.raises(ValueError, match="str bounds"):
        roundtrip_filtered(
            keyed_df, "k", {"k": "int", "s": "str"}, "s", 0, 10, n_parts=4
        ).collect()


def test_range_partitioning_empty_input(spark, keyed_df):
    from parquet_python_spark.operators.generic_codec import encode_df

    empty = keyed_df.filter("k < 0")
    blocks = encode_df(
        empty, "k", {"k": "int", "v": "int"}, n_parts=4, partitioning="range"
    )
    assert blocks.count() == 0


# ------------------------------------------------ bloom equality pruning

def test_bloom_kernel_no_false_negatives_low_fp():
    import numpy as np

    from parquet_python_spark.operators.generic_codec import (
        bloom_build,
        bloom_might_contain,
    )

    rng = np.random.default_rng(17)
    vals = rng.integers(-(2**40), 2**40, 5000)
    blob = bloom_build(vals)
    assert blob is not None
    for v in vals[:500]:
        assert bloom_might_contain(blob, int(v))  # never a false negative
    absent = rng.integers(2**41, 2**42, 2000)
    fp = sum(bloom_might_contain(blob, int(v)) for v in absent)
    assert fp / len(absent) < 0.05, fp
    # cardinality cap: huge-card chunks return None (no index)
    assert bloom_build(np.arange(200_000)) is None


def test_bloom_pruned_equality_roundtrip(spark):
    """Point lookup through the bloom-pruned decode: exact rows, and the
    bloom+stats metadata actually prunes partitions for a rare key."""
    from pyspark.sql import functions as F

    from parquet_python_spark.operators.generic_codec import (
        bloom_might_contain,
        encode_df,
        roundtrip_filtered_eq,
    )

    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    kinds = {"l_orderkey": "int", "l_partkey": "int", "l_linenumber": "int"}
    # point lookup on the (hash-)partitioning key: the value lives in
    # exactly one partition, but min/max stats span everything under hash
    # layout — ONLY the bloom filter can prune here.  (A low-cardinality
    # column like l_partkey appears in every partition at this sf; the
    # filter correctly admits all of them — nothing to prune.)
    value = int(li.select("l_orderkey").first()["l_orderkey"])

    got = roundtrip_filtered_eq(li, "l_orderkey", kinds, "l_orderkey", value,
                                n_parts=8)
    exp = li.select(*kinds).filter(F.col("l_orderkey") == value)
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in exp.collect())
    assert a == b and len(a) >= 1

    # pruning evidence: the filters admit fewer partitions than exist
    # (exactness of `got` above already proves no false negatives)
    blocks = encode_df(li, "l_orderkey", kinds, n_parts=8)
    meta = blocks.filter(F.col("column") == "l_orderkey").select(
        "part_id", "bloom", "stat_min", "stat_max"
    ).collect()
    admitted = [
        r["part_id"]
        for r in meta
        if (r["stat_min"] is None or r["stat_min"] <= value <= r["stat_max"])
        and (r["bloom"] is None or bloom_might_contain(bytes(r["bloom"]), value))
    ]
    assert len(admitted) < len(meta), (len(admitted), len(meta))


def test_bloom_prune_is_executor_side():
    """The driver must never hold bloom bitsets: the membership test runs
    in a pandas UDF over the metadata rows, and the only driver-visible
    artifact is the broadcast part_id set.  Structural guard: no .collect(
    anywhere in decode_df_pruned_eq."""
    import inspect

    from parquet_python_spark.operators.generic_codec import (
        _bloom_keep_udf,
        _pred_keep,
        decode_df_pruned_eq,
        decode_df_pruned_multi,
    )

    src = (
        inspect.getsource(decode_df_pruned_eq)
        + inspect.getsource(decode_df_pruned_multi)
        + inspect.getsource(_pred_keep)
    )
    assert ".collect(" not in src
    # membership evaluated executor-side via the factory-bound pandas UDF
    assert "_bloom_keep_udf" in src
    assert "pandas_udf" in inspect.getsource(_bloom_keep_udf)


def test_bloom_build_flag_off_and_conservative_decode(spark):
    """encode_df(build_blooms=False): no bitsets are built, and the eq
    prune degrades conservatively (keeps partitions, exact rows)."""
    from pyspark.sql import functions as F

    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df_pruned_eq,
        encode_df,
    )

    df = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3 % 500).alias("v")
    )
    kinds = {"k": "int", "v": "int"}
    blocks = encode_df(df, "k", kinds, n_parts=4, build_blooms=False).cache()
    assert blocks.filter(F.col("bloom").isNotNull()).count() == 0
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    dec = decode_df_pruned_eq(blocks, "k", kinds, out_schema, "k", 1234)
    got = sorted(tuple(r) for r in dec.filter(F.col("k") == 1234).collect())
    exp = sorted(tuple(r) for r in df.filter(F.col("k") == 1234).collect())
    assert got == exp and len(got) == 1
    blocks.unpersist()


def test_bloom_build_shortcircuit_cases():
    """Over-cap chunks skip the full sort via the strided lower bound;
    low-cardinality chunks above the row threshold still build filters."""
    import numpy as np

    from parquet_python_spark.operators.generic_codec import (
        BLOOM_MAX_CARD,
        bloom_build,
        bloom_might_contain,
    )

    n = 2 * BLOOM_MAX_CARD + 50_000
    assert bloom_build(np.arange(n)) is None  # unique keys: over cap
    low = np.arange(n) % 1000  # big chunk, 1000 distinct: filter built
    blob = bloom_build(low)
    assert blob is not None
    assert bloom_might_contain(blob, 999)
    assert not bloom_might_contain(blob, 10**9 + 7)


def test_filtered_blocks_cache_union_consumes_both(spark):
    """Regression (round-3 ADVICE): a driver query that lazily unions a
    range round-trip and an eq round-trip must not have the second call
    evict the first's persisted blocks before the union is collected."""
    from pyspark.sql import functions as F

    from parquet_python_spark.operators.generic_codec import (
        roundtrip_filtered,
        roundtrip_filtered_eq,
    )

    df = spark.range(20_000).select(
        F.col("id").alias("k"), (F.col("id") % 700).alias("v")
    )
    kinds = {"k": "int", "v": "int"}
    rng_half = roundtrip_filtered(df, "k", kinds, "k", 100, 200, n_parts=8)
    eq_half = roundtrip_filtered_eq(df, "k", kinds, "k", 15_000, n_parts=8)
    got = sorted(tuple(r) for r in rng_half.unionAll(eq_half).collect())
    exp = sorted(
        tuple(r)
        for r in df.filter(
            ((F.col("k") >= 100) & (F.col("k") <= 200)) | (F.col("k") == 15_000)
        ).collect()
    )
    assert got == exp


# -------------------------------------------- page-level (sub-chunk) zone maps

def test_page_stats_subrange_skip_and_exactness(spark):
    """Chunks bigger than PAGE_ROWS carry per-page min/max, and the pruned
    decode skips intra-chunk sub-ranges: rows surfaced BEFORE the exact
    filter stay well under the surviving chunk's row count, while the
    filtered result is exact.  Covers both decode paths: `v` is forced to
    bitpack (payload-slice fast path) and `w` carries nulls (full decode +
    row slice fallback)."""
    from parquet_python_spark.operators.generic_codec import (
        PAGE_ROWS,
        _arrow_safe_schema,
        decode_df_pruned,
        encode_df,
    )

    df = spark.range(20_000).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 1000).alias("v"),
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("w"),
    )
    kinds = {"k": "int", "v": "int", "w": "int"}
    # 2 range parts -> ~10k-row chunks, ceil(10000/4096)=3 pages each
    blocks = encode_df(
        df, "k", kinds, n_parts=2, partitioning="range",
        forced_codecs={"v": "bitpack"},
    ).cache()
    krows = blocks.filter(F.col("column") == "k").collect()
    assert all(r["page_stats"] is not None for r in krows)
    # null-bearing columns keep page stats too (round 5): null row slots
    # carry sentinels, so bounds stay exact over present values
    wrows = blocks.filter(F.col("column") == "w").collect()
    assert all(r["page_stats"] is not None for r in wrows)

    lo, hi = 5_000, 6_000
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    dec = decode_df_pruned(blocks, "k", kinds, out_schema, "k", lo, hi).cache()
    pre_filter = dec.count()
    # chunk-level pruning alone surfaces the whole surviving 10k chunk;
    # page skip cuts that to the one intersecting page (+ boundary slack)
    assert pre_filter <= 2 * PAGE_ROWS, pre_filter
    assert pre_filter >= hi - lo + 1
    got = sorted(
        (r["k"], r["v"], r["w"])
        for r in dec.filter((F.col("k") >= lo) & (F.col("k") <= hi)).collect()
    )
    exp = sorted(
        (r["k"], r["v"], r["w"])
        for r in df.filter((F.col("k") >= lo) & (F.col("k") <= hi)).collect()
    )
    assert got == exp
    dec.unpersist()
    blocks.unpersist()


def test_page_stats_fast_path_matches_full_decode():
    """Payload-slice fast path (bitpack/FOR/plain) is value-identical to
    decode-everything-then-slice on the same ranges."""
    import json

    import numpy as np
    import pyarrow as pa

    from parquet_python_spark.codecs.registry import decode_column, encode_column
    from parquet_python_spark.operators.generic_codec import (
        _decode_values_ranges,
        _page_keep_ranges,
        _page_stats_blob,
    )

    rng = np.random.default_rng(11)
    n = 50_000
    for codec in ("bitpack", "for", "plain32", "plain64"):
        vals = np.sort(rng.integers(10, 2**20, n)).astype(
            np.int32 if codec == "plain32" else np.int64
        )
        c, params, payload, _ = encode_column(vals, "int", codec=codec)
        blob = _page_stats_blob(vals)
        lo, hi = int(vals[n // 3]), int(vals[n // 2])
        ranges = _page_keep_ranges(blob, n, lo, hi)
        assert ranges, codec  # narrow predicate must skip pages
        fast = _decode_values_ranges(
            payload, n, n, c, json.dumps(params), "int", ranges
        )
        assert fast is not None, codec
        full = np.asarray(decode_column(c, payload, n, dict(params), "int"))
        exp = np.concatenate([full[s:e] for s, e in ranges])
        assert (np.asarray(fast) == exp).all(), codec
        # skipped something: fast output strictly smaller than the chunk
        assert len(fast) < n, codec


def test_page_stats_all_pages_survive_is_noop():
    import numpy as np

    from parquet_python_spark.operators.generic_codec import (
        _page_keep_ranges,
        _page_stats_blob,
    )

    vals = np.arange(10_000, dtype=np.int64)
    blob = _page_stats_blob(vals)
    # predicate covering everything -> None (decode untouched, zero overhead)
    assert _page_keep_ranges(blob, 10_000, -5, 10**9) is None
    # single-page chunks carry no page stats at all
    assert _page_stats_blob(np.arange(100)) is None


# ------------------------------------------------ string (truncated) zone maps

def test_str_stats_truncation_semantics():
    """Truncated bounds must never tighten: lower is a prefix of the min,
    upper is the truncated max's SUCCESSOR (>= every chunk value)."""
    import pyarrow as pa

    from parquet_python_spark.operators.generic_codec import (
        STR_STAT_CHARS,
        _str_stats,
    )

    # short values: exact bounds
    assert _str_stats(pa.array(["b", "a", "c"])) == ("a", "c")
    # long max: 16-char prefix with last char incremented
    long_max = "m" * 20
    lo, hi = _str_stats(pa.array(["alpha", long_max]))
    assert lo == "alpha" and hi == "m" * 15 + "n"
    assert len(hi) == STR_STAT_CHARS and long_max <= hi
    # long min: plain prefix (sorts <= original)
    lo, hi = _str_stats(pa.array(["a" * 30, "zz"]))
    assert lo == "a" * 16 and lo <= "a" * 30 and hi == "zz"
    # successor would land in the surrogate gap: jumps to U+E000 (still an
    # upper bound, just looser)
    v = "x" * 15 + chr(0xD7FF) + "tail"
    lo, hi = _str_stats(pa.array(["a", v]))
    assert hi == "x" * 15 + chr(0xE000) and v <= hi
    # every char at the code-point ceiling: unbounded above
    v = chr(0x10FFFF) * 20
    lo, hi = _str_stats(pa.array(["a", v]))
    assert hi is None
    # all-null / empty chunks carry no bounds
    assert _str_stats(pa.array([], type=pa.string())) == (None, None)
    assert _str_stats(pa.array([None], type=pa.string())) == (None, None)


def test_string_zone_maps_prune_and_exact(spark):
    """decode_df_pruned on a str predicate: chunks whose truncated bounds
    miss the range are never decoded; the filtered result is exact."""
    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df_pruned,
        encode_df,
    )

    df = spark.range(8_000).select(
        F.col("id").alias("k"),
        F.concat(
            F.lit("key"), F.lpad(F.col("id").cast("string"), 8, "0")
        ).alias("s"),
    )
    kinds = {"k": "int", "s": "str"}
    blocks = encode_df(
        df, "k", kinds, n_parts=8, partitioning="range"
    ).cache()
    srows = blocks.filter(F.col("column") == "s").collect()
    assert all(
        r["stat_min_str"] is not None and r["stat_max_str"] is not None
        for r in srows
    )
    lo, hi = "key00002000", "key00002499"
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    dec = decode_df_pruned(blocks, "k", kinds, out_schema, "s", lo, hi).cache()
    pre = dec.count()
    # 8 range chunks of ~1000 rows: the [2000, 2499] key range lives in one
    # chunk (+1 of boundary slack) — far below the 8000-row table
    assert 500 <= pre <= 2_000, pre
    got = sorted(
        (r["k"], r["s"])
        for r in dec.filter((F.col("s") >= lo) & (F.col("s") <= hi)).collect()
    )
    exp = sorted(
        (r["k"], r["s"])
        for r in df.filter((F.col("s") >= lo) & (F.col("s") <= hi)).collect()
    )
    assert got == exp and len(got) == 500
    dec.unpersist()
    blocks.unpersist()


def test_string_zone_maps_shared_prefix_is_conservative(spark):
    """Keys sharing a >16-char prefix: truncated bounds collapse to the
    same (prefix, successor) window on every chunk — NOTHING prunes, and
    the result must still be exact (truncation never loses rows)."""
    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df_pruned,
        encode_df,
    )

    df = spark.range(2_000).select(
        F.col("id").alias("k"),
        F.concat(
            F.lit("p" * 20), F.lpad(F.col("id").cast("string"), 6, "0")
        ).alias("s"),
    )
    kinds = {"k": "int", "s": "str"}
    blocks = encode_df(df, "k", kinds, n_parts=4, partitioning="range")
    lo = "p" * 20 + "000100"
    hi = "p" * 20 + "000199"
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    dec = decode_df_pruned(blocks, "k", kinds, out_schema, "s", lo, hi)
    got = sorted(
        r["k"]
        for r in dec.filter((F.col("s") >= lo) & (F.col("s") <= hi)).collect()
    )
    assert got == list(range(100, 200))


def test_string_pruning_rejects_bad_kinds(spark):
    import pyarrow  # noqa: F401

    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df_pruned,
        encode_df,
    )

    df = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") % 2 == 0).alias("b"),
        F.col("id").cast("string").alias("s"),
    )
    kinds = {"k": "int", "b": "bool", "s": "str"}
    blocks = encode_df(df, "k", kinds, n_parts=2)
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    with pytest.raises(ValueError, match="min/max pruning"):
        decode_df_pruned(blocks, "k", kinds, out_schema, "b", 1, 5)
    with pytest.raises(ValueError, match="str bounds"):
        decode_df_pruned(blocks, "k", kinds, out_schema, "s", 1, 5)


# ------------------------------------------------ float (ordered-bits) zone maps

def test_float_ordered_bits_is_monotone():
    import numpy as np

    from parquet_python_spark.operators.generic_codec import (
        _float_ordered_bits,
    )

    vals = np.array(
        [-np.inf, -1e300, -1.5, -1e-300, -0.0, 0.0, 1e-300, 2.5, 1e300,
         np.inf, np.nan]
    )
    ob = _float_ordered_bits(vals)
    # strictly ordered except the -0.0/+0.0 pair (equal floats may map to
    # adjacent ints; ordering only needs monotonicity)
    assert (np.diff(ob) >= 0).all()
    assert ob[-1] > ob[-2]  # NaN sorts greatest (Spark semantics)
    assert ob[4] < ob[5]  # -0.0 below +0.0


def test_float_zone_maps_prune_and_exact(spark):
    """decode_df_pruned on a float64 predicate: chunk skip via the
    ordered-bits stats, page skip inside surviving chunks, exact result
    after the caller's filter."""
    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df_pruned,
        encode_df,
    )

    df = spark.range(20_000).select(
        F.col("id").alias("k"),
        (F.col("id").cast("double") / 100.0 - 50.0).alias("x"),
    )
    kinds = {"k": "int", "x": "float64"}
    blocks = encode_df(
        df, "k", kinds, n_parts=4, partitioning="range"
    ).cache()
    xrows = blocks.filter(F.col("column") == "x").collect()
    assert all(r["stat_min"] is not None for r in xrows)
    # chunks are 5k rows -> 2 pages each; x is monotone in k so both
    # levels of stats are selective
    assert all(r["page_stats"] is not None for r in xrows)
    lo, hi = -10.0, -5.0  # k in [4000, 4500]: one chunk, one page
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    dec = decode_df_pruned(blocks, "k", kinds, out_schema, "x", lo, hi).cache()
    pre = dec.count()
    assert pre <= 5_000, pre  # at most one surviving chunk's pages
    got = sorted(
        r["k"]
        for r in dec.filter((F.col("x") >= lo) & (F.col("x") <= hi)).collect()
    )
    exp = list(range(4_000, 4_501))
    assert got == exp
    dec.unpersist()
    blocks.unpersist()


def test_float_zone_maps_negative_zero_boundary(spark):
    """-0.0 sorts below +0.0 in the bits transform but equals it in
    IEEE/Spark comparison: a chunk whose max is -0.0 must SURVIVE a
    lo=0.0 prune (the bounds widen across the ±0 pair)."""
    import pandas as pd

    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        _float_ordered_scalar,
        decode_df_pruned,
        encode_df,
    )

    assert _float_ordered_scalar(-0.0) == -1 and _float_ordered_scalar(0.0) == 0

    pdf = pd.DataFrame(
        {"k": range(100), "x": [-0.0] * 50 + [5.0] * 50}
    )
    df = spark.createDataFrame(pdf)
    kinds = {"k": "int", "x": "float64"}
    blocks = encode_df(
        df, "k", kinds, n_parts=2, partitioning="range"
    ).cache()
    # the low chunk's stats really are the ±0 edge case
    xr = sorted(
        (r["stat_min"], r["stat_max"])
        for r in blocks.filter(F.col("column") == "x").collect()
    )
    assert xr[0][1] == -1  # max(-0.0) under the bits transform
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    dec = decode_df_pruned(blocks, "k", kinds, out_schema, "x", 0.0, 10.0)
    got = dec.filter((F.col("x") >= 0.0) & (F.col("x") <= 10.0)).count()
    assert got == 100  # -0.0 >= 0.0 is TRUE row-side: nothing may vanish
    blocks.unpersist()


# ------------------------------------------------ string bloom point lookups

def test_string_bloom_pruned_equality_roundtrip(spark):
    """Point lookup on a STRING column: blooms are built over JVM-side
    xxhash64 (no per-row Python over string bytes), the probe literal is
    hashed through the same Spark function, and the combination of
    truncated string stats + bloom admits fewer partitions than exist."""
    from parquet_python_spark.operators.generic_codec import (
        bloom_might_contain,
        encode_df,
        roundtrip_filtered_eq,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    kinds = {"doc_id": "int", "text": "str", "lang": "str"}
    value = docs.select("text").first()["text"]

    got = roundtrip_filtered_eq(docs, "doc_id", kinds, "text", value, n_parts=8)
    exp = docs.select(*kinds).filter(F.col("text") == value)
    a = sorted(tuple(r) for r in got.collect())
    b = sorted(tuple(r) for r in exp.collect())
    assert a == b and len(a) >= 1

    # pruning evidence, evaluated the same way the executor-side test does
    blocks = encode_df(docs, "doc_id", kinds, n_parts=8)
    meta = blocks.filter(F.col("column") == "text").select(
        "part_id", "bloom", "stat_min_str", "stat_max_str"
    ).collect()
    assert all(r["bloom"] is not None for r in meta)  # low-card text chunks
    probe = int(
        spark.range(1).select(F.xxhash64(F.lit(value)).alias("h")).first()["h"]
    )
    admitted = [
        r["part_id"]
        for r in meta
        if (
            r["stat_min_str"] is not None
            and r["stat_min_str"] <= value
            and (r["stat_max_str"] is None or r["stat_max_str"] >= value)
        )
        and bloom_might_contain(bytes(r["bloom"]), probe)
    ]
    assert len(admitted) < len(meta), (len(admitted), len(meta))


def test_string_bloom_eq_rejects_non_str_value(spark):
    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df_pruned_eq,
        encode_df,
    )

    df = spark.range(50).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("s")
    )
    kinds = {"k": "int", "s": "str"}
    blocks = encode_df(df, "k", kinds, n_parts=2)
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    with pytest.raises(ValueError, match="str value"):
        decode_df_pruned_eq(blocks, "k", kinds, out_schema, "s", 7)


# ------------------------------------------- null-count stats (IS NULL prune)


def test_null_count_stats_and_pruned_decode(spark):
    """Chunks carry exact null counts, and decode_df_pruned_null skips
    whole chunks for IS NULL / IS NOT NULL predicates — the
    Statistics.null_count consumption the reference never does.  Nulls
    are concentrated in the low key range so range partitioning makes
    the skip observable."""
    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df_pruned_null,
        encode_df,
    )

    df = spark.range(20_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 5_000, None).otherwise(F.col("id")).alias("w"),
        F.concat(F.lit("s"), F.col("id").cast("string")).alias("s"),
    )
    kinds = {"k": "int", "w": "int", "s": "str"}
    blocks = encode_df(
        df, "k", kinds, n_parts=4, partitioning="range"
    ).cache()
    # exact per-chunk null counts, and they sum to the injected total
    wrows = blocks.filter(F.col("column") == "w").collect()
    assert sum(r["n_nulls"] for r in wrows) == 5_000
    assert all(r["n_nulls"] == 0 for r in blocks.filter(F.col("column") == "k").collect())

    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    # IS NULL: only null-bearing chunks decode (nulls live in one part)
    dec_null = decode_df_pruned_null(
        blocks, "k", kinds, out_schema, "w", want_null=True
    ).cache()
    assert dec_null.count() < 20_000  # skipped the null-free chunks
    got = sorted(
        r["k"] for r in dec_null.filter(F.col("w").isNull()).collect()
    )
    assert got == list(range(5_000))
    dec_null.unpersist()
    # IS NOT NULL: the all-null chunk is skipped
    dec_nn = decode_df_pruned_null(
        blocks, "k", kinds, out_schema, "w", want_null=False
    ).cache()
    assert dec_nn.count() < 20_000
    got_nn = sorted(
        (r["k"], r["w"], r["s"])
        for r in dec_nn.filter(F.col("w").isNotNull()).collect()
    )
    exp_nn = sorted(
        (r["k"], r["w"], r["s"])
        for r in df.filter(F.col("w").isNotNull()).collect()
    )
    assert got_nn == exp_nn
    dec_nn.unpersist()
    blocks.unpersist()


def test_null_pruning_rejects_list_kind(spark):
    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df_pruned_null,
        encode_df,
    )

    df = spark.range(50).select(
        F.col("id").alias("k"),
        F.array(F.col("id").cast("int")).alias("a"),
    )
    kinds = {"k": "int", "a": "int_list"}
    blocks = encode_df(df, "k", kinds, n_parts=2)
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    with pytest.raises(ValueError, match="scalar column"):
        decode_df_pruned_null(blocks, "k", kinds, out_schema, "a", True)
    with pytest.raises(ValueError, match="scalar column"):
        decode_df_pruned_null(blocks, "k", kinds, out_schema, "zz", False)


def test_roundtrip_filtered_null_end_to_end(spark):
    from parquet_python_spark.operators.generic_codec import (
        roundtrip_filtered_null,
    )

    df = spark.range(8_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, None)
        .otherwise(F.concat(F.lit("v"), F.col("id").cast("string")))
        .alias("t"),
    )
    kinds = {"k": "int", "t": "str"}
    out = roundtrip_filtered_null(df, "k", kinds, "t", want_null=True, n_parts=4)
    got = sorted(r["k"] for r in out.collect())
    exp = sorted(r["k"] for r in df.filter(F.col("t").isNull()).collect())
    assert got == exp
    out2 = roundtrip_filtered_null(df, "k", kinds, "t", want_null=False, n_parts=4)
    got2 = sorted((r["k"], r["t"]) for r in out2.collect())
    exp2 = sorted(
        (r["k"], r["t"]) for r in df.filter(F.col("t").isNotNull()).collect()
    )
    assert got2 == exp2


# --------------------------------------------- string page-level zone maps


def test_str_page_stats_blob_semantics():
    """Kernel-level: per-page truncated bounds parse back and classify
    pages correctly, including the unbounded-upper page and the format
    tag that keeps int/str blobs from cross-parsing."""
    import pyarrow as pa

    from parquet_python_spark.operators.generic_codec import (
        PAGE_ROWS,
        STR_STAT_CHARS,
        _page_keep_ranges,
        _page_keep_ranges_str,
        _str_page_stats_blob,
    )

    n = 3 * PAGE_ROWS + 100
    vals = [f"k{i:08d}" for i in range(n)]  # sorted, < cap chars: exact bounds
    arr = pa.array(vals)
    blob = _str_page_stats_blob(arr)
    assert blob is not None
    # single-page chunk: no blob
    assert _str_page_stats_blob(pa.array(vals[:100])) is None
    # narrow range inside page 1 -> exactly that page survives
    lo, hi = f"k{PAGE_ROWS + 10:08d}", f"k{PAGE_ROWS + 20:08d}"
    assert _page_keep_ranges_str(blob, n, lo, hi) == [(PAGE_ROWS, 2 * PAGE_ROWS)]
    # range covering everything -> None (no-op)
    assert _page_keep_ranges_str(blob, n, "k", "l") is None
    # unbounded upper: a page whose truncated max can't increment keeps
    # every probe above its lower bound
    big = chr(0x10FFFF) * (STR_STAT_CHARS + 4)
    vals2 = [f"a{i:08d}" for i in range(PAGE_ROWS)] + [big] * PAGE_ROWS
    blob2 = _str_page_stats_blob(pa.array(vals2))
    r = _page_keep_ranges_str(blob2, 2 * PAGE_ROWS, big, big + "x")
    assert r == [(PAGE_ROWS, 2 * PAGE_ROWS)]
    # tag mismatch fails loudly in both directions
    with pytest.raises(ValueError, match="str parser"):
        _page_keep_ranges_str(
            int(PAGE_ROWS).to_bytes(4, "little") + b"\0" * 16, n, "a", "b"
        )
    with pytest.raises(ValueError, match="int parser"):
        _page_keep_ranges(blob, n, 0, 10)


def test_string_page_stats_prune_and_exact(spark):
    """Spark e2e: a >PAGE_ROWS string chunk skips intra-chunk pages on a
    narrow string range — rows surfaced before the exact filter stay under
    the surviving chunk's size — and the filtered result is exact."""
    from parquet_python_spark.operators.generic_codec import (
        PAGE_ROWS,
        _arrow_safe_schema,
        decode_df_pruned,
        encode_df,
    )

    df = spark.range(20_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit("d"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("s"),
    )
    kinds = {"k": "int", "s": "str"}
    # 2 range parts -> ~10k-row chunks, 3 pages each
    blocks = encode_df(
        df, "k", kinds, n_parts=2, partitioning="range"
    ).cache()
    srows = blocks.filter(F.col("column") == "s").collect()
    assert all(r["page_stats"] is not None for r in srows)
    lo, hi = "d00005000", "d00006000"
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    dec = decode_df_pruned(blocks, "k", kinds, out_schema, "s", lo, hi).cache()
    pre_filter = dec.count()
    assert pre_filter <= 2 * PAGE_ROWS, pre_filter
    assert pre_filter >= 1001
    got = sorted(
        (r["k"], r["s"])
        for r in dec.filter((F.col("s") >= lo) & (F.col("s") <= hi)).collect()
    )
    exp = sorted(
        (r["k"], r["s"])
        for r in df.filter((F.col("s") >= lo) & (F.col("s") <= hi)).collect()
    )
    assert got == exp
    dec.unpersist()
    blocks.unpersist()


def test_nullable_page_stats_prune_and_exact(spark):
    """Round 5: null-bearing chunks keep page-granularity pruning for all
    three stat kinds.  Null slots never widen page bounds (sentinel mask),
    a float NaN *data* value is still honored as greatest, and an all-null
    string page is skipped outright."""
    import math

    from parquet_python_spark.operators.generic_codec import (
        PAGE_ROWS,
        _arrow_safe_schema,
        decode_df_pruned,
        encode_df,
    )

    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        # int: every 5th row null, values track the key
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id")).alias("w"),
        # float: nulls scattered; a data NaN planted at a known key
        F.when(F.col("id") % 7 == 0, None)
        .when(F.col("id") == 778, F.lit(float("nan")))
        .otherwise(F.col("id").cast("double"))
        .alias("f"),
        # str: an entire aligned page range is all-null
        F.when(
            (F.col("id") >= PAGE_ROWS) & (F.col("id") < 2 * PAGE_ROWS), None
        )
        .otherwise(F.concat(F.lit("d"), F.lpad(F.col("id").cast("string"), 8, "0")))
        .alias("s"),
    )
    kinds = {"k": "int", "w": "int", "f": "float64", "s": "str"}
    # 2 range parts -> ~10k-row chunks, 3 pages each
    blocks = encode_df(df, "k", kinds, n_parts=2, partitioning="range").cache()
    for c in ("w", "f", "s"):
        rows = blocks.filter(F.col("column") == c).collect()
        assert all(r["page_stats"] is not None for r in rows), c

    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    # --- int nullable predicate: narrow range -> page skip + exact rows
    dec = decode_df_pruned(blocks, "k", kinds, out_schema, "w", 5_000, 6_000).cache()
    assert dec.count() <= 2 * PAGE_ROWS
    got = sorted(
        (r["k"], r["w"])
        for r in dec.filter((F.col("w") >= 5_000) & (F.col("w") <= 6_000)).collect()
    )
    exp = sorted(
        (r["k"], r["w"])
        for r in df.filter((F.col("w") >= 5_000) & (F.col("w") <= 6_000)).collect()
    )
    assert got == exp
    dec.unpersist()
    # --- float nullable predicate: exactness incl. null weave; the page
    # holding the NaN data value survives a top-end range (NaN greatest)
    dec_f = decode_df_pruned(
        blocks, "k", kinds, out_schema, "f", 5_000.0, 6_000.0
    ).cache()
    assert dec_f.count() <= 2 * PAGE_ROWS
    got_f = sorted(
        (r["k"], r["f"])
        for r in dec_f.filter((F.col("f") >= 5_000.0) & (F.col("f") <= 6_000.0)).collect()
    )
    exp_f = sorted(
        (r["k"], r["f"])
        for r in df.filter((F.col("f") >= 5_000.0) & (F.col("f") <= 6_000.0)).collect()
    )
    assert got_f == exp_f
    nan_page = decode_df_pruned(
        blocks, "k", kinds, out_schema, "f", float("nan"), float("nan")
    )
    assert any(
        r["k"] == 778 and math.isnan(r["f"])
        for r in nan_page.filter(F.isnan("f")).collect()
    )
    dec_f.unpersist()
    # --- str: the all-null page is skipped for a range that targets it
    lo_s = f"d{PAGE_ROWS + 10:08d}"
    hi_s = f"d{PAGE_ROWS + 500:08d}"
    dec_s = decode_df_pruned(blocks, "k", kinds, out_schema, "s", lo_s, hi_s).cache()
    # every row in [PAGE_ROWS, 2*PAGE_ROWS) is null in s, so the only
    # surviving rows come from boundary pages — and no matches exist
    assert dec_s.filter((F.col("s") >= lo_s) & (F.col("s") <= hi_s)).count() == 0
    assert dec_s.count() < n // 2  # skipped at least the all-null page
    dec_s.unpersist()
    blocks.unpersist()


def test_multi_predicate_prune_conjunction(spark):
    """Conjunctive pruning intersects keep sets and page ranges: a
    (range AND eq AND notnull) conjunction decodes no more rows than the
    tightest single predicate, and the exact filtered result matches."""
    from parquet_python_spark.operators.generic_codec import (
        PAGE_ROWS,
        _arrow_safe_schema,
        decode_df_pruned,
        decode_df_pruned_multi,
        encode_df,
    )

    n = 40_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),
        F.when(F.col("id") % 13 == 0, None)
        .otherwise(F.concat(F.lit("t"), F.lpad(F.col("id").cast("string"), 8, "0")))
        .alias("t"),
    )
    kinds = {"k": "int", "v": "int", "t": "str"}
    blocks = encode_df(df, "k", kinds, n_parts=4, partitioning="range").cache()
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)

    preds = [
        ("range", "k", 5_000, 6_000),
        ("eq", "v", 11),
        ("notnull", "t"),
    ]
    dec = decode_df_pruned_multi(blocks, "k", kinds, out_schema, preds).cache()
    pre = dec.count()
    single = decode_df_pruned(
        blocks, "k", kinds, out_schema, "k", 5_000, 6_000
    ).count()
    assert pre <= single <= 2 * PAGE_ROWS
    exact = (
        (F.col("k") >= 5_000) & (F.col("k") <= 6_000)
        & (F.col("v") == 11) & F.col("t").isNotNull()
    )
    got = sorted(tuple(r) for r in dec.filter(exact).collect())
    exp = sorted(tuple(r) for r in df.filter(exact).collect())
    assert got == exp and len(got) > 0
    dec.unpersist()

    # two DISJOINT range predicates on the same column: page-range
    # intersection goes empty -> zero rows decoded, still no error
    empty = decode_df_pruned_multi(
        blocks, "k", kinds, out_schema,
        [("range", "k", 100, 200), ("range", "k", 30_000, 30_100)],
    )
    assert empty.count() == 0

    # eq predicates bind their own probes (no late-binding across the
    # loop): two str eq preds, the second impossible -> empty
    vals = decode_df_pruned_multi(
        blocks, "k", kinds, out_schema,
        [("eq", "t", "t00005005"), ("eq", "t", "zzz-not-there")],
    )
    assert vals.count() == 0

    with pytest.raises(ValueError, match="non-empty"):
        decode_df_pruned_multi(blocks, "k", kinds, out_schema, [])
    with pytest.raises(ValueError, match="unknown predicate"):
        decode_df_pruned_multi(
            blocks, "k", kinds, out_schema, [("like", "t", "x%")]
        )
    blocks.unpersist()


def test_in_list_prune_union_and_exact(spark):
    """IN-list pruning: chunk keep is any-of (stats OR'd, Bloom any-probe),
    page skip is the UNION of each value's [v, v] range — two values in
    distant pages decode ~2 pages, not the chunk; empty IN decodes
    nothing; the union group intersects with other predicates."""
    from parquet_python_spark.operators.generic_codec import (
        PAGE_ROWS,
        _arrow_safe_schema,
        decode_df_pruned_multi,
        encode_df,
    )

    n = 40_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.concat(F.lit("t"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("t"),
    )
    kinds = {"k": "int", "t": "str"}
    # 2 range parts -> ~20k-row chunks, 5 pages each
    blocks = encode_df(df, "k", kinds, n_parts=2, partitioning="range").cache()
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)

    # two int values in the SAME chunk but distant pages
    vals = [100, 17_000]
    dec = decode_df_pruned_multi(
        blocks, "k", kinds, out_schema, [("in", "k", vals)]
    ).cache()
    assert dec.count() <= 2 * PAGE_ROWS  # union of two pages, not 20k rows
    got = sorted(r["k"] for r in dec.filter(F.col("k").isin(vals)).collect())
    assert got == vals
    dec.unpersist()

    # str IN-list: probes hashed JVM-side, same union semantics
    svals = ["t00000100", "t00017000", "zzz-not-there"]
    dec_s = decode_df_pruned_multi(
        blocks, "k", kinds, out_schema, [("in", "t", svals)]
    ).cache()
    assert dec_s.count() <= 2 * PAGE_ROWS
    got_s = sorted(r["t"] for r in dec_s.filter(F.col("t").isin(svals)).collect())
    assert got_s == ["t00000100", "t00017000"]
    dec_s.unpersist()

    # empty IN-list: vacuously false, zero rows, no error
    assert (
        decode_df_pruned_multi(
            blocks, "k", kinds, out_schema, [("in", "k", [])]
        ).count()
        == 0
    )

    # IN intersected with a range that excludes one value
    dec_i = decode_df_pruned_multi(
        blocks, "k", kinds, out_schema,
        [("in", "k", vals), ("range", "k", 0, 1_000)],
    ).cache()
    assert dec_i.count() <= PAGE_ROWS
    assert sorted(
        r["k"] for r in dec_i.filter(F.col("k").isin(vals)).collect()
    ) == [100]
    dec_i.unpersist()
    blocks.unpersist()


def test_union_ranges_kernel():
    from parquet_python_spark.operators.generic_codec import (
        _intersect_ranges,
        _union_ranges,
    )

    assert _union_ranges([(0, 5)], [(5, 10)]) == [(0, 10)]  # adjacent merge
    assert _union_ranges([(0, 3), (8, 10)], [(2, 4)]) == [(0, 4), (8, 10)]
    assert _union_ranges([], [(1, 2)]) == [(1, 2)]
    assert _intersect_ranges([(0, 10)], [(5, 15)]) == [(5, 10)]
    assert _intersect_ranges(None, [(1, 2)]) == [(1, 2)]
    assert _intersect_ranges([(0, 2)], [(5, 6)]) == []


def test_persisted_blocks_prune_pushes_to_scan(spark, tmp_path):
    """The deployment shape: blocks persisted as a parquet table, pruned
    decodes reading it back.  The chunk-level keep predicates must reach
    the blocks scan as PushedFilters (stats prune at STORAGE — payloads
    of skipped chunks are never read), and results stay exact through the
    parquet round-trip (n_nulls/page_stats/str bounds survive)."""
    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df_pruned,
        decode_df_pruned_multi,
        decode_df_pruned_null,
        encode_df,
    )

    df = spark.range(20_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 4_000, None).otherwise(F.col("id")).alias("w"),
    )
    kinds = {"k": "int", "w": "int"}
    path = str(tmp_path / "blocks_table")
    encode_df(df, "k", kinds, n_parts=4, partitioning="range").write.parquet(path)
    blocks = spark.read.parquet(path)
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)

    def plan(d):
        return d._sc._jvm.PythonSQLUtils.explainString(
            d._jdf.queryExecution(), "formatted"
        )

    # range prune: stat bounds and the column selector push to the scan
    dec = decode_df_pruned(blocks, "k", kinds, out_schema, "k", 5_000, 6_000)
    p = plan(dec)
    assert "PushedFilters" in p
    assert "GreaterThanOrEqual(stat_max,5000)" in p
    assert "LessThanOrEqual(stat_min,6000)" in p
    assert "EqualTo(column,k)" in p
    got = sorted(
        r["k"] for r in dec.filter((F.col("k") >= 5_000) & (F.col("k") <= 6_000)).collect()
    )
    assert got == list(range(5_000, 6_001))

    # null prune: the n_nulls predicate pushes too
    dec_n = decode_df_pruned_null(blocks, "k", kinds, out_schema, "w", True)
    p_n = plan(dec_n)
    assert "GreaterThan(n_nulls,0)" in p_n
    got_n = sorted(r["k"] for r in dec_n.filter(F.col("w").isNull()).collect())
    assert got_n == list(range(4_000))

    # conjunction over the persisted table stays exact
    dec_m = decode_df_pruned_multi(
        blocks, "k", kinds, out_schema,
        [("range", "k", 5_000, 6_000), ("notnull", "w")],
    )
    got_m = sorted(
        tuple(r)
        for r in dec_m.filter(
            (F.col("k") >= 5_000) & (F.col("k") <= 6_000) & F.col("w").isNotNull()
        ).collect()
    )
    assert got_m == [(i, i) for i in range(5_000, 6_001)]

    # metadata-first COUNT over the persisted table: exact, and the
    # containment bounds push to the blocks scan
    from parquet_python_spark.operators.generic_codec import (
        count_filtered_meta,
    )

    cnt_df = count_filtered_meta(blocks, kinds, "k", 2_500, 17_499)
    p_c = plan(cnt_df)
    assert "GreaterThanOrEqual(stat_min,2500)" in p_c
    assert "LessThanOrEqual(stat_max,17499)" in p_c
    assert cnt_df.first()["cnt"] == 15_000


def test_or_predicate_prune_union_and_exact(spark):
    """Disjunctive pruning: OR of two distant ranges decodes ~2 pages via
    the union group; an OR containing a null predicate disables page
    pruning but keeps chunk pruning; results are exact; generator IN
    values survive the prune + row-filter double read."""
    from parquet_python_spark.operators.generic_codec import (
        PAGE_ROWS,
        _arrow_safe_schema,
        decode_df_pruned_any,
        encode_df,
        roundtrip_filtered_any,
    )

    n = 40_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.when(F.col("id") < 2_000, None).otherwise(F.col("id")).alias("w"),
    )
    kinds = {"k": "int", "w": "int"}
    blocks = encode_df(df, "k", kinds, n_parts=4, partitioning="range").cache()
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)

    # OR of two distant narrow ranges on k: union of ~2 pages
    preds = [("range", "k", 100, 200), ("range", "k", 30_000, 30_100)]
    dec = decode_df_pruned_any(blocks, "k", kinds, out_schema, preds).cache()
    assert dec.count() <= 2 * PAGE_ROWS
    got = sorted(
        r["k"]
        for r in dec.filter(
            ((F.col("k") >= 100) & (F.col("k") <= 200))
            | ((F.col("k") >= 30_000) & (F.col("k") <= 30_100))
        ).collect()
    )
    assert got == list(range(100, 201)) + list(range(30_000, 30_101))
    dec.unpersist()

    # OR with isnull: page pruning off (the null member has no page
    # bound), chunk union still prunes — nulls live in the first part only
    preds2 = [("isnull", "w"), ("range", "k", 30_000, 30_100)]
    dec2 = decode_df_pruned_any(blocks, "k", kinds, out_schema, preds2).cache()
    pre2 = dec2.count()
    assert pre2 < n  # chunk-level union still skipped non-matching parts
    got2 = sorted(
        r["k"]
        for r in dec2.filter(
            F.col("w").isNull()
            | ((F.col("k") >= 30_000) & (F.col("k") <= 30_100))
        ).collect()
    )
    assert got2 == list(range(2_000)) + list(range(30_000, 30_101))
    dec2.unpersist()
    blocks.unpersist()

    # end-to-end wrapper with a GENERATOR In member: normalize-first means
    # the prune and the exact row filter see the same values
    out = roundtrip_filtered_any(
        df, "k", kinds,
        [("in", "k", (v for v in [5, 30_050])), ("eq", "k", 7)],
        n_parts=4,
    )
    assert sorted(r["k"] for r in out.collect()) == [5, 7, 30_050]


# ------------------------------------------- prune-algebra property tests


def test_prune_algebra_properties():
    """Hypothesis: the page-range algebra and the zone-map classifiers
    never produce a false negative (every matching row is inside the kept
    ranges) under random values, nulls, bounds and range lists."""
    import numpy as np
    import pyarrow as pa
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from parquet_python_spark.operators.generic_codec import (
        PAGE_ROWS,
        _intersect_ranges,
        _page_keep_ranges,
        _page_stats_blob,
        _str_page_stats_blob,
        _page_keep_ranges_str,
        _str_stats,
        _union_ranges,
    )

    SET = settings(max_examples=60, deadline=None)

    # --- sorted-disjoint range lists vs a set oracle
    def ranges_strategy():
        return st.lists(
            st.tuples(
                st.integers(0, 500), st.integers(1, 40)
            ),
            max_size=8,
        ).map(
            lambda raw: _canon([(s, s + ln) for s, ln in raw])
        )

    def _canon(rs):
        out = []
        for s, e in sorted(rs):
            if out and s <= out[-1][1]:
                out[-1] = (out[-1][0], max(out[-1][1], e))
            else:
                out.append((s, e))
        return out

    def to_set(rs):
        return set().union(*[set(range(s, e)) for s, e in rs]) if rs else set()

    @SET
    @given(ranges_strategy(), ranges_strategy())
    def check_algebra(a, b):
        assert to_set(_union_ranges(a, b)) == to_set(a) | to_set(b)
        assert to_set(_intersect_ranges(a, b)) == to_set(a) & to_set(b)

    check_algebra()

    # --- int page stats with nulls: kept ranges cover every matching row
    @SET
    @given(
        st.lists(
            st.tuples(st.integers(-1000, 1000), st.booleans()),
            min_size=1,
            max_size=3 * PAGE_ROWS,
        ),
        st.integers(-1000, 1000),
        st.integers(0, 400),
    )
    def check_int_pages(rows, lo, width):
        hi = lo + width
        vals = np.array([v for v, _ in rows], dtype=np.int64)
        valid = np.array([ok for _, ok in rows], dtype=bool)
        blob = _page_stats_blob(vals, valid if not valid.all() else None)
        if blob is None:
            return  # single page: chunk stats cover it
        kept = _page_keep_ranges(blob, len(vals), lo, hi)
        if kept is None:
            return  # everything kept
        kept_rows = to_set(kept)
        matches = np.flatnonzero(valid & (vals >= lo) & (vals <= hi))
        assert set(matches.tolist()) <= kept_rows

    check_int_pages()

    # --- str page stats: truncated bounds stay conservative
    text = st.text(
        alphabet=st.characters(min_codepoint=32, max_codepoint=0x2FF),
        max_size=24,
    )

    @SET
    @given(
        st.lists(st.one_of(st.none(), text), min_size=1, max_size=2 * PAGE_ROWS),
        text,
        text,
    )
    def check_str_pages(vals, b1, b2):
        lo, hi = min(b1, b2), max(b1, b2)
        arr = pa.array(vals, type=pa.string())
        blob = _str_page_stats_blob(arr)
        if blob is None:
            return
        kept = _page_keep_ranges_str(blob, len(vals), lo, hi)
        if kept is None:
            return
        kept_rows = to_set(kept)
        matches = {
            i for i, v in enumerate(vals) if v is not None and lo <= v <= hi
        }
        assert matches <= kept_rows
        # chunk-level bounds conservative too
        clo, chi = _str_stats(arr)
        if clo is not None and matches:
            assert clo <= max(v for v in vals if v is not None)
            if chi is not None:
                assert all(v <= chi for v in vals if v is not None)

    check_str_pages()


def test_count_filtered_meta_exact_and_metadata_only(spark):
    """Metadata-first COUNT: fully-contained chunks contribute n_rows
    without decoding (evidence: the contained classifier claims chunks),
    boundary chunks decode page-pruned; the total is exact for int, float
    and str predicates, with and without nulls."""
    from parquet_python_spark.operators.generic_codec import (
        count_filtered_meta,
        encode_df,
    )

    n = 40_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("f"),
        F.concat(F.lit("s"), F.lpad(F.col("id").cast("string"), 8, "0")).alias("t"),
        F.when(F.col("id") % 9 == 0, None).otherwise(F.col("id")).alias("w"),
    )
    kinds = {"k": "int", "f": "float64", "t": "str", "w": "int"}
    blocks = encode_df(df, "k", kinds, n_parts=8, partitioning="range").cache()

    # predicate spanning several whole chunks + two boundary halves
    lo, hi = 7_500, 32_499
    got = count_filtered_meta(blocks, kinds, "k", lo, hi).first()["cnt"]
    assert got == hi - lo + 1
    # metadata-only evidence: at least one chunk is fully contained
    contained = blocks.filter(
        (F.col("column") == "k")
        & (F.col("stat_min") >= lo) & (F.col("stat_max") <= hi)
        & (F.col("n_nulls") == 0)
    ).count()
    assert contained >= 1
    # float and str predicates agree with the row-level truth
    got_f = count_filtered_meta(blocks, kinds, "f", 7_500.0, 32_499.0).first()["cnt"]
    assert got_f == hi - lo + 1
    slo, shi = "s00007500", "s00032499"
    got_s = count_filtered_meta(blocks, kinds, "t", slo, shi).first()["cnt"]
    assert got_s == hi - lo + 1
    # nullable column: null-bearing chunks never claim containment, and
    # the count still matches the exact filter
    exp_w = df.filter((F.col("w") >= lo) & (F.col("w") <= hi)).count()
    got_w = count_filtered_meta(blocks, kinds, "w", lo, hi).first()["cnt"]
    assert got_w == exp_w
    # empty predicate: zero, not null
    assert count_filtered_meta(blocks, kinds, "k", -10, -5).first()["cnt"] == 0
    with pytest.raises(ValueError, match="min/max pruning"):
        count_filtered_meta(blocks, {"k": "bool"}, "k", 0, 1)
    # float-bound validation shared with the pruned decodes
    with pytest.raises(ValueError, match="numeric bounds"):
        count_filtered_meta(blocks, kinds, "f", True, 2.0)
    # a column that was never encoded fails loudly, not cnt=0
    with pytest.raises(ValueError, match="no chunks"):
        count_filtered_meta(blocks, {**kinds, "zz": "int"}, "zz", 0, 1)
    blocks.unpersist()


def test_count_null_meta_zero_decode(spark):
    """IS [NOT] NULL counting is pure metadata: exact at any selectivity,
    and structurally payload-free (no decode function in its source)."""
    import inspect

    from parquet_python_spark.operators.generic_codec import (
        count_null_meta,
        encode_df,
    )

    df = spark.range(10_000).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 4 == 0, None).otherwise(F.col("id")).alias("w"),
    )
    kinds = {"k": "int", "w": "int"}
    blocks = encode_df(df, "k", kinds, n_parts=4, partitioning="range").cache()
    assert count_null_meta(blocks, kinds, "w", True).first()["cnt"] == 2_500
    assert count_null_meta(blocks, kinds, "w", False).first()["cnt"] == 7_500
    assert count_null_meta(blocks, kinds, "k", True).first()["cnt"] == 0
    import ast

    # structurally payload-free: no decode call anywhere in the function
    # body (docstring text excluded)
    tree = ast.parse(inspect.getsource(count_null_meta))
    calls = {
        n.func.id if isinstance(n.func, ast.Name) else getattr(n.func, "attr", "")
        for n in ast.walk(tree)
        if isinstance(n, ast.Call)
    }
    assert not any("decode" in c or "payload" in c for c in calls), calls
    with pytest.raises(ValueError, match="scalar column"):
        count_null_meta(blocks, {"a": "int_list"}, "a", True)
    with pytest.raises(ValueError, match="no chunks"):
        count_null_meta(blocks, {"zz": "int"}, "zz", True)
    blocks.unpersist()


def test_minmax_filtered_meta_exact(spark):
    """Metadata-first MIN/MAX: candidates come from chunk stats without
    decoding; straddling chunks decode; results match the row-level truth
    across boundary shapes, nulls, and the empty predicate."""
    from parquet_python_spark.operators.generic_codec import (
        encode_df,
        minmax_filtered_meta,
    )

    n = 40_000
    df = spark.range(n).select(
        (F.col("id") * 3).alias("k"),  # stride-3 values: bounds often miss
        F.when(F.col("id") % 5 == 0, None).otherwise(F.col("id") * 3).alias("w"),
    )
    kinds = {"k": "int", "w": "int"}
    blocks = encode_df(df, "k", kinds, n_parts=8, partitioning="range").cache()

    for col in ("k", "w"):
        for lo, hi in [
            (7_501, 62_499),   # straddles two chunks, bounds off-stride
            (0, 10**9),        # contains everything (pure metadata)
            (29_999, 30_001),  # single matching value
            (-50, -10),        # empty
            (7_500, 7_500),    # point hit on a value
        ]:
            got = minmax_filtered_meta(blocks, kinds, col, lo, hi).first()
            exp = (
                df.filter((F.col(col) >= lo) & (F.col(col) <= hi))
                .agg(F.min(col).alias("mn"), F.max(col).alias("mx"))
                .first()
            )
            assert (got["mn"], got["mx"]) == (exp["mn"], exp["mx"]), (
                col, lo, hi, got, exp,
            )
    # metadata evidence: for the all-containing predicate the STRADDLE
    # set (the function's decode branch) is empty — the same classifier
    # the function uses, so a regression that decodes contained chunks
    # would surface here
    from parquet_python_spark.operators.generic_codec import _range_keep

    overlap, _, contained = _range_keep("int", "k", 0, 10**9)
    assert blocks.filter(overlap & ~contained).count() == 0
    with pytest.raises(ValueError, match="metadata min/max"):
        minmax_filtered_meta(blocks, {"k": "float64"}, "k", 0, 1)
    blocks.unpersist()


def test_topk_filtered_meta_exact_and_pruned(spark):
    """Zone-map top-k pushdown: exact value multisets both directions,
    under nulls, ties, k > table, and hash layout; and the keep set is a
    strict subset of chunks under range partitioning."""
    from parquet_python_spark.operators.generic_codec import (
        encode_df,
        topk_filtered_meta,
    )

    n = 40_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        # duplicates (ties), nulls, and values uncorrelated with the key
        F.when(F.col("id") % 7 == 0, None)
        .otherwise((F.col("id") * 37) % 5_000)
        .alias("v"),
    )
    kinds = {"k": "int", "v": "int"}
    for part_mode in ("range", "hash"):
        blocks = encode_df(
            df, "k", kinds, n_parts=8, partitioning=part_mode
        ).cache()
        for col in ("k", "v"):
            for asc in (True, False):
                for kk in (5, 1_000):
                    got = sorted(
                        r[col]
                        for r in topk_filtered_meta(
                            blocks, kinds, col, kk, ascending=asc
                        ).collect()
                    )
                    exp = sorted(
                        r[col]
                        for r in df.filter(F.col(col).isNotNull())
                        .orderBy(
                            F.col(col).asc() if asc else F.col(col).desc()
                        )
                        .limit(kk)
                        .collect()
                    )
                    assert got == exp, (part_mode, col, asc, kk)
        # k beyond the table: every present value, still exact
        got_all = sorted(
            r["k"]
            for r in topk_filtered_meta(blocks, kinds, "k", n + 5).collect()
        )
        assert got_all == list(range(n))
        blocks.unpersist()

    # prune evidence under range layout: top-5 on the key decodes a
    # strict subset of chunks (bound B lands in the first chunk)
    blocks = encode_df(df, "k", kinds, n_parts=8, partitioning="range").cache()
    meta = blocks.filter(F.col("column") == "k").collect()
    by_edge = sorted(meta, key=lambda r: r["stat_max"])
    b = by_edge[0]["stat_max"]  # first chunk already holds >= 5 values
    keep = [r["part_id"] for r in meta if r["stat_min"] <= b]
    assert len(keep) < len(meta)
    with pytest.raises(ValueError, match="metadata top-k"):
        topk_filtered_meta(blocks, {"k": "float64"}, "k", 5)
    with pytest.raises(ValueError, match="positive"):
        topk_filtered_meta(blocks, kinds, "k", 0)
    blocks.unpersist()


def test_pruned_decode_rejects_unencoded_and_str_bounds_on_int(spark):
    """The pruned decodes fail loudly on a predicate column with no chunk
    rows (an AND would return a definitive-looking empty result; an OR
    would silently drop that member's rows), and int columns reject
    non-numeric bounds (a str bound casts to NULL against bigint stats
    and would prune everything)."""
    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df_pruned,
        decode_df_pruned_any,
        encode_df,
    )

    df = spark.range(100).select(F.col("id").alias("k"))
    kinds = {"k": "int"}
    blocks = encode_df(df, "k", kinds, n_parts=2)
    out_schema = _arrow_safe_schema(df.select("k").schema, kinds)
    wide = {"k": "int", "zz": "int"}
    with pytest.raises(ValueError, match="no chunks"):
        decode_df_pruned(blocks, "k", wide, out_schema, "zz", 0, 10)
    with pytest.raises(ValueError, match="no chunks"):
        decode_df_pruned_any(
            blocks, "k", wide, out_schema,
            [("range", "zz", 0, 10), ("range", "k", 0, 10)],
        )
    with pytest.raises(ValueError, match="numeric bounds"):
        decode_df_pruned(blocks, "k", kinds, out_schema, "k", "a", "z")


def test_page_null_counts_prune_and_exact(spark):
    """Per-page null counts: IS NULL skips null-free pages of surviving
    chunks and IS NOT NULL skips all-null pages; results stay exact; the
    kernel classifies pages correctly including the partial last page."""
    import numpy as np

    from parquet_python_spark.operators.generic_codec import (
        PAGE_ROWS,
        _arrow_safe_schema,
        _page_keep_ranges_nulls,
        _page_nulls_blob,
        decode_df_pruned_null,
        encode_df,
    )

    # kernel: nulls only inside page 1; partial all-null last page
    n = 3 * PAGE_ROWS + 100
    valid = np.ones(n, dtype=bool)
    valid[PAGE_ROWS + 10 : PAGE_ROWS + 50] = False  # some nulls in page 1
    valid[3 * PAGE_ROWS :] = False                  # last page all-null
    blob = _page_nulls_blob(valid)
    assert _page_keep_ranges_nulls(blob, n, True) == [
        (PAGE_ROWS, 2 * PAGE_ROWS),
        (3 * PAGE_ROWS, n),
    ]
    assert _page_keep_ranges_nulls(blob, n, False) == [(0, 3 * PAGE_ROWS)]
    assert _page_nulls_blob(valid[:100]) is None  # single page: no blob

    # Spark e2e: one 20k-row chunk whose nulls live in a single page
    n2 = 20_000
    df = spark.range(n2).select(
        F.col("id").alias("k"),
        F.when(
            (F.col("id") >= PAGE_ROWS) & (F.col("id") < PAGE_ROWS + 200), None
        )
        .otherwise(F.col("id"))
        .alias("w"),
    )
    kinds = {"k": "int", "w": "int"}
    blocks = encode_df(df, "k", kinds, n_parts=1, partitioning="range").cache()
    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    dec = decode_df_pruned_null(
        blocks, "k", kinds, out_schema, "w", want_null=True
    ).cache()
    # only the null-bearing page survives, not the whole 20k chunk
    assert dec.count() <= PAGE_ROWS
    got = sorted(r["k"] for r in dec.filter(F.col("w").isNull()).collect())
    assert got == list(range(PAGE_ROWS, PAGE_ROWS + 200))
    dec.unpersist()
    # IS NOT NULL on the same chunk keeps everything (no all-null page)
    nn = decode_df_pruned_null(
        blocks, "k", kinds, out_schema, "w", want_null=False
    )
    assert nn.filter(F.col("w").isNotNull()).count() == n2 - 200
    blocks.unpersist()
