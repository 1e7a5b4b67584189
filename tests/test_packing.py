"""Sequence packing: exact numpy oracle, window edges, partitioning
invariance, the distributed prefix sum."""

from __future__ import annotations

import numpy as np
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(
        [(d, list(map(int, t)), len(t)) for d, t in rows],
        "doc_id string, tokens array<int>, n_tok int",
    )


def _expected(rows, window):
    """Numpy re-derivation: concatenate in doc_id order, slice."""
    stream = np.concatenate(
        [np.asarray(t, dtype=np.int64) for _, t in sorted(rows)]
        or [np.array([], dtype=np.int64)]
    )
    return {
        w: stream[w * window : (w + 1) * window].tolist()
        for w in range((len(stream) + window - 1) // window)
    }


def _packed(df, window):
    from parquet_python_spark.operators.packing import pack_sequences

    return {
        r["window_id"]: list(r["tokens"])
        for r in pack_sequences(df, window=window).collect()
    }


def test_pack_exact(spark):
    rows = [
        ("a", [1, 2, 3]),
        ("b", [4, 5]),
        ("c", list(range(10, 31))),  # spans multiple windows
        ("d", [99]),
    ]
    got = _packed(_docs(spark, rows), 8)
    exp = _expected(rows, 8)
    assert got == exp
    # every window full except the last
    sizes = [len(v) for _, v in sorted(got.items())]
    assert all(s == 8 for s in sizes[:-1]) and 0 < sizes[-1] <= 8


def test_pack_doc_larger_than_window(spark):
    rows = [("x", list(range(100)))]
    got = _packed(_docs(spark, rows), 16)
    assert got == _expected(rows, 16)


def test_pack_empty_doc_and_order(spark):
    # "10" < "2" lexicographically — string collation drives the order
    rows = [("10", [7, 8]), ("2", [1]), ("3", [])]
    got = _packed(_docs(spark, rows), 4)
    assert got == {0: [7, 8, 1]}


def test_pack_partitioning_invariance(spark):
    rng = np.random.default_rng(3)
    rows = [
        (f"d{i:04d}", rng.integers(0, 1000, rng.integers(0, 40)).tolist())
        for i in range(200)
    ]
    df = _docs(spark, rows)
    exp = _expected(rows, 64)
    assert _packed(df, 64) == exp
    assert _packed(df.repartition(7), 64) == exp


def test_pack_empty_table(spark):
    assert _packed(_docs(spark, []), 8) == {}


# ------------------------------------------------------------ vocab remap

def test_remap_tokens(spark):
    from parquet_python_spark.operators.pipeline_ops import remap_tokens

    df = spark.createDataFrame(
        [("a", [0, 5, 9, 200], 4, "s1"), ("b", [], 0, "s1"),
         ("c", [5, 5, 1], 3, "s2")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = {r["doc_id"]: list(r["tokens"])
           for r in remap_tokens(df, {0: 100, 5: 105}).collect()}
    # 9 and 200 unmapped -> identity (200 is beyond the lut size)
    assert out == {"a": [100, 105, 9, 200], "b": [], "c": [105, 105, 1]}

    # default (UNK) replaces anything outside the table
    out2 = {r["doc_id"]: list(r["tokens"])
            for r in remap_tokens(df, {0: 100, 5: 105}, default=-1).collect()}
    assert out2 == {"a": [100, 105, -1, -1], "b": [], "c": [105, 105, -1]}


def test_remap_tokens_null_lists_and_bigint(spark):
    import pytest as _pytest

    from parquet_python_spark.operators.pipeline_ops import remap_tokens

    df = spark.createDataFrame(
        [("a", [0, 5], 2, "s"), ("b", None, 0, "s"), ("c", [1], 1, "s")],
        "doc_id string, tokens array<int>, n_tok int, source string",
    )
    out = {r["doc_id"]: (None if r["tokens"] is None else list(r["tokens"]))
           for r in remap_tokens(df, {0: 100}).collect()}
    assert out == {"a": [100, 5], "b": None, "c": [1]}

    # bigint element type carries 64-bit mapping targets
    dfl = spark.createDataFrame(
        [("a", [0, 5], 2, "s")],
        "doc_id string, tokens array<bigint>, n_tok int, source string",
    )
    big = 3_000_000_000
    out = list(remap_tokens(dfl, {5: big}).collect()[0]["tokens"])
    assert out == [0, big]

    # 64-bit target on an int32 column is a loud error, not wraparound
    with _pytest.raises(ValueError, match="does not fit"):
        remap_tokens(df, {5: big})


def test_pack_spans_consistency(spark):
    """Spans tile every window exactly and agree with the packed tokens."""
    from parquet_python_spark.operators.packing import pack_sequences, pack_spans

    rng = np.random.default_rng(11)
    rows = [
        (f"d{i:03d}", rng.integers(0, 999, rng.integers(1, 50)).tolist())
        for i in range(60)
    ]
    df = _docs(spark, rows)
    W = 32
    packed = {r["window_id"]: list(r["tokens"])
              for r in pack_sequences(df, window=W).collect()}
    spans = pack_spans(df, window=W).collect()

    by_w: dict[int, list] = {}
    for s in spans:
        by_w.setdefault(s["window_id"], []).append(s)
    assert set(by_w) == set(packed)
    doc_tokens = dict(rows)
    consumed = {d: 0 for d, _ in rows}
    for w, ss in by_w.items():
        ss = sorted(ss, key=lambda s: s["off"])
        # spans tile the window contiguously from 0
        pos = 0
        for s in ss:
            assert s["off"] == pos
            pos += s["len"]
        assert pos == len(packed[w])
        # and the tokens under each span are that document's next chunk
        for s in ss:
            d = s["doc_id"]
            expect = doc_tokens[d][consumed[d] : consumed[d] + s["len"]]
            got = packed[w][s["off"] : s["off"] + s["len"]]
            assert got == expect
            consumed[d] += s["len"]
    assert consumed == {d: len(t) for d, t in rows}
