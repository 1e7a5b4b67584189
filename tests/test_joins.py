"""as-of join and binned range join — verified against brute-force exact
joins computed in Spark (and driver-side DuckDB ASOF/BETWEEN oracles in
__spark_entry__)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def quotes_trades(spark):
    # deterministic synthetic tick data: trades (points) + quotes (state)
    quotes = spark.range(300).select(
        (F.col("id") % 7).alias("sym"),
        (F.col("id") * 13 % 997).alias("t"),
        (F.col("id") * 31 % 100).alias("px"),
        F.col("id").alias("qid"),
    )
    trades = spark.range(200).select(
        (F.col("id") % 7).alias("sym"),
        (F.col("id") * 17 % 997).alias("t"),
        F.col("id").alias("tid"),
    )
    return quotes, trades


def test_asof_join_vs_bruteforce(spark, quotes_trades):
    from parquet_python_spark.operators.joins import asof_join

    quotes, trades = quotes_trades
    got = {
        (r["tid"]): (r["r_qid"], r["r_px"])
        for r in asof_join(
            trades, quotes, by="sym", on="t", payload_cols=["qid", "px"]
        ).collect()
    }
    # brute force: for each trade, the max-(t, side-break) quote at t<=trade.t
    q = [(r["sym"], r["t"], r["px"], r["qid"]) for r in quotes.collect()]
    for r in trades.collect():
        cands = [
            (qt, qid, px) for (s, qt, px, qid) in q if s == r["sym"] and qt <= r["t"]
        ]
        exp = max(cands)[1:] if cands else (None, None)
        assert got[r["tid"]] == (exp[0], exp[1]), f"trade {r['tid']}"


def test_asof_join_inclusive_tie(spark):
    from parquet_python_spark.operators.joins import asof_join

    left = spark.createDataFrame([(1, 10, "L")], "k int, t int, tag string")
    right = spark.createDataFrame([(1, 10, 99)], "k int, t int, v int")
    out = asof_join(left, right, "k", "t", ["v"]).collect()
    assert out[0]["r_v"] == 99  # right.t == left.t matches (inclusive)


def test_range_join_binned_vs_bruteforce(spark):
    from parquet_python_spark.operators.joins import range_join_binned

    points = spark.range(500).select((F.col("id") * 7 % 330).alias("p"), "id")
    ranges = spark.range(40).select(
        (F.col("id") * 9).alias("lo"),
        (F.col("id") * 9 + 14).alias("hi"),
        F.col("id").alias("rid"),
    )
    got = sorted(
        (r["id"], r["rid"])
        for r in range_join_binned(points, ranges, "p", "lo", "hi", 16).collect()
    )
    exp = sorted(
        (r["id"], r["rid"])
        for r in points.join(
            ranges, (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
        ).collect()
    )
    assert got == exp and len(got) > 0


def test_range_join_plan_has_no_nested_loop(spark):
    from parquet_python_spark.operators.joins import range_join_binned

    points = spark.range(100).select((F.col("id") % 50).alias("p"), "id")
    ranges = spark.range(10).select(
        (F.col("id") * 5).alias("lo"), (F.col("id") * 5 + 7).alias("hi"),
        F.col("id").alias("rid"),
    )
    plan = range_join_binned(
        points, ranges, "p", "lo", "hi", 8
    )._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
