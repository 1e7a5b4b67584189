"""Structured Streaming windowed aggregation (watermark / late data) and
custom stateful operator (applyInPandasWithState) — new engine surface; the
reference is strictly batch (SURVEY.md §2.4)."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F


def _write_events(spark, path, rows):
    df = spark.createDataFrame(
        rows, "doc_id string, n_tok int, source string, ingest_ts timestamp"
    )
    df.coalesce(1).write.mode("append").parquet(path)


TS0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def test_windowed_token_rates_with_late_data(spark, tmp_path):
    from parquet_python_spark.streaming.stream_encode import windowed_token_rates

    inp = str(tmp_path / "stream_in")
    # batch 1: two sources across two 10-minute windows
    _write_events(
        spark,
        inp,
        [
            ("d1", 100, "a", TS0),
            ("d2", 50, "a", TS0 + dt.timedelta(minutes=2)),
            ("d3", 10, "b", TS0 + dt.timedelta(minutes=11)),
        ],
    )
    agg = windowed_token_rates(spark, inp, window="10 minutes", watermark="5 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("rates")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["source"]): (r["n_rows"], r["n_tokens"])
        for r in spark.sql("SELECT * FROM rates").collect()
    }
    assert got[(TS0, "a")] == (2, 150)
    assert got[(TS0 + dt.timedelta(minutes=10), "b")] == (1, 10)


def test_stateful_source_totals_accumulate(spark, tmp_path):
    """State accumulates ACROSS micro-batches within one query:
    maxFilesPerTrigger=1 forces each parquet file into its own batch, so
    source 'a' must pass through GroupState twice (memory sinks don't
    support cross-query checkpoint recovery, so the multi-batch evidence
    lives inside a single availableNow run)."""
    from parquet_python_spark.streaming.stream_encode import stateful_source_totals

    inp = str(tmp_path / "state_in")
    _write_events(
        spark,
        inp,
        [("d1", 7, "a", TS0), ("d2", 3, "a", TS0), ("d3", 5, "b", TS0)],
    )
    _write_events(spark, inp, [("d4", 20, "a", TS0 + dt.timedelta(minutes=1))])

    df = stateful_source_totals(spark, inp, max_files_per_trigger=1)
    q = (
        df.writeStream.format("memory")
        .queryName("totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM totals").collect()
    # per-batch snapshots: source 'a' appears twice (two micro-batches);
    # the running totals end at the cumulative values
    a_snaps = sorted(
        (r["total_rows"], r["total_tokens"]) for r in rows if r["source"] == "a"
    )
    assert len(a_snaps) == 2  # state crossed a micro-batch boundary
    assert a_snaps[-1] == (3, 30)
    b = [(r["total_rows"], r["total_tokens"]) for r in rows if r["source"] == "b"]
    assert b == [(1, 5)]


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Duplicate doc_ids inside one availableNow run are dropped; unique
    ids and all columns of the FIRST-seen row pass through."""
    from parquet_python_spark.streaming.stream_encode import streaming_dedup

    inp = str(tmp_path / "dedup_in")
    _write_events(
        spark,
        inp,
        [
            ("d1", 100, "a", TS0),
            ("d1", 100, "a", TS0 + dt.timedelta(minutes=1)),  # dup
            ("d2", 50, "a", TS0 + dt.timedelta(minutes=2)),
            ("d3", 10, "b", TS0 + dt.timedelta(minutes=3)),
            ("d3", 10, "b", TS0 + dt.timedelta(minutes=3)),   # exact dup
        ],
    )
    out = streaming_dedup(spark, inp, watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM dedup").collect()
    ids = sorted(r["doc_id"] for r in rows)
    assert ids == ["d1", "d2", "d3"]
    # state is keyed on doc_id only: the d1 duplicate with a later ts is
    # dropped, the survivor keeps its full original row
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id["d2"]["n_tok"] == 50 and by_id["d3"]["source"] == "b"
