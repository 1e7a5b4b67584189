"""Generic column-codec operator tests: round-trips over driver tables,
null handling (D17), sinks (S5/S6), describe (S4), converted types (D21)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_python_spark.operators.generic_codec import roundtrip

SF = "/root/testdata/sf0.001"


def _t(spark, name):
    return spark.read.parquet(f"{SF}/{name}.parquet")


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_roundtrip_with_nulls(spark):
    """Definition-level null weave (reference __init__.py:295-317,336-338)."""
    li = _t(spark, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_linenumber") > 2, F.col("l_suppkey")).alias("maybe_supp"),
        F.when(F.col("l_linenumber") % 2 == 0, F.col("l_returnflag")).alias("maybe_flag"),
    )
    assert li.filter(F.col("maybe_supp").isNull()).count() > 0
    rt = roundtrip(
        li,
        "l_orderkey",
        {
            "l_orderkey": "int",
            "l_linenumber": "int",
            "maybe_supp": "int",
            "maybe_flag": "str",
        },
    )
    assert _sorted(rt.select(*li.columns)) == _sorted(li)


def test_roundtrip_all_null_column(spark):
    df = _t(spark, "nation").select(
        "n_nationkey", F.lit(None).cast("string").alias("nothing")
    )
    rt = roundtrip(df, "n_nationkey", {"n_nationkey": "int", "nothing": "str"})
    assert _sorted(rt.select("n_nationkey", "nothing")) == _sorted(df)


def test_sinks_roundtrip(spark, tmp_path):
    """S5 (tab CSV) and S6 (JSON lines) sinks reproduce the table."""
    from parquet_python_spark.sources.sinks import write_csv, write_jsonl

    nation = _t(spark, "nation")
    csv_path = str(tmp_path / "nation_csv")
    json_path = str(tmp_path / "nation_json")
    write_csv(nation, csv_path)
    write_jsonl(nation, json_path)
    csv_back = (
        spark.read.option("sep", "\t").option("header", True)
        .schema(nation.schema).csv(csv_path)
    )
    json_back = spark.read.schema(nation.schema).json(json_path)
    assert _sorted(csv_back) == _sorted(nation)
    assert _sorted(json_back) == _sorted(nation)


def test_describe_table(spark):
    from parquet_python_spark.sources.sinks import describe_table

    d = {r["column_name"]: r for r in describe_table(_t(spark, "nation")).collect()}
    assert d["n_nationkey"]["n_rows"] == 25
    assert d["n_nationkey"]["n_distinct"] == 25
    assert d["n_nationkey"]["n_nulls"] == 0
    assert d["n_regionkey"]["n_distinct"] == 5


def test_converted_types(spark):
    """D21 parity: decimal scaling, date-from-days, timestamp-millis, uints,
    json — checked against exact expected values."""
    from parquet_python_spark.functions import converted as C

    df = spark.createDataFrame(
        [(12345, 19000, 1_600_000_000_000, -1, '{"k": 7}')],
        "unscaled long, days int, millis long, b int, js string",
    )
    row = df.select(
        C.decimal_from_unscaled(F.col("unscaled"), 10, 2).alias("dec"),
        C.date_from_days(F.col("days")).alias("dt"),
        C.timestamp_from_millis(F.col("millis")).alias("ts"),
        C.uint8(F.col("b").cast("tinyint")).alias("u8"),
        C.uint32(F.col("b")).alias("u32"),
        C.json_field(F.col("js"), "$.k").alias("k"),
    ).collect()[0]
    assert str(row["dec"]) == "123.45"
    assert str(row["dt"]) == "2022-01-08"  # 19000 days after 1970-01-01
    assert row["ts"].year == 2020
    assert row["u8"] == 255
    assert row["u32"] == 2**32 - 1
    assert row["k"] == "7"


def test_embeddings_float_bit_exact(spark):
    emb = _t(spark, "embeddings")
    rt = roundtrip(emb, "vec_id", {"vec_id": "int", "embedding": "f32_list"})
    a = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float32) for r in rt.collect()}
    b = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float32) for r in emb.collect()}
    assert a.keys() == b.keys()
    for k in a:
        assert np.array_equal(a[k], b[k])  # bit-exact, not approx


def test_range_partitioning_wide_key_span(spark):
    """Hash-derived int64 keys spanning most of the int64 range: the exact
    integer bucketing formula would overflow (key-lo)*n_parts; the double
    fallback must keep part ids in [0, n_parts) and the round-trip exact."""
    from pyspark.sql import functions as F

    from parquet_python_spark.operators.generic_codec import encode_df, roundtrip

    df = spark.range(0, 500).select(
        (F.xxhash64(F.col("id").cast("string"))).alias("k"),
        F.col("id").alias("v"),
    )
    blocks = encode_df(
        df, "k", {"k": "int", "v": "int"}, n_parts=8, partitioning="range"
    )
    pids = [r["part_id"] for r in blocks.select("part_id").distinct().collect()]
    assert all(0 <= p < 8 for p in pids)
    rt = roundtrip(df, "k", {"k": "int", "v": "int"}, n_parts=8)
    got = sorted((r["k"], r["v"]) for r in rt.collect())
    exp = sorted((r["k"], r["v"]) for r in df.collect())
    assert got == exp


def test_roundtrip_fused_single_exchange(spark):
    """Round-6 optimization: roundtrip runs encode+decode in ONE fused
    python pass (MapInArrow) with no content-hash grouping — the unfused
    plan had two group-map nodes and two exchanges, shuffling every input
    row AND every encoded payload.  Rows must equal the unfused
    encode_df->decode_df composition bit-for-bit.  (The only exchange the
    fused plan may carry is the conditional round-robin parallelism bump
    for few-split scans — never a hash partitioning.)"""
    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df,
        encode_df,
    )

    li = _t(spark, "lineitem")
    kinds = {"l_orderkey": "int", "l_partkey": "int", "l_quantity": "float64"}
    fused = roundtrip(li, "l_orderkey", kinds)
    plan = fused._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInArrow" not in plan
    assert "MapInArrow" in plan
    assert "hashpartitioning" not in plan

    pinned = roundtrip(li, "l_orderkey", kinds, n_parts=4)
    pinned_plan = pinned._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInArrow" in pinned_plan  # pinned layout keeps groupBy
    assert _sorted(fused.select("l_orderkey", "l_partkey")) == _sorted(
        pinned.select("l_orderkey", "l_partkey")
    )

    in_schema = li.select(*list(kinds)).schema
    unfused = decode_df(
        encode_df(li, "l_orderkey", kinds),
        "l_orderkey",
        kinds,
        _arrow_safe_schema(in_schema, kinds),
    ).select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in in_schema.fields]
    )
    assert _sorted(fused) == _sorted(unfused)


def test_roundtrip_key_not_in_output_columns(spark):
    """Round-6 review fix: the zero-shuffle fused path must carry the sort
    key along even when the caller excludes it from col_kinds (the
    pre-round-6 path selected [key_col] + cols; the first fused version
    dropped it and crashed in the per-chunk sort)."""
    li = _t(spark, "lineitem")
    rt = roundtrip(li, "l_orderkey", {"l_partkey": "int", "l_suppkey": "int"})
    assert _sorted(rt) == _sorted(li.select("l_partkey", "l_suppkey"))
