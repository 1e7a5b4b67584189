"""Sequence packing: documents -> fixed-length training windows.

The canonical LLM-training preprocessing step over the tokens table
(BASELINE input shape): concatenate every document's tokens in a
deterministic global order (doc_id ascending) and slice the stream into
consecutive windows of ``window`` tokens (last partial window kept).

Scale design (the whole point — the reference has nothing like this, and a
naive global sort + collect would die at 10^12 sequences):

1. **Distributed prefix sum** for each doc's global start offset — never a
   single-partition window.  Docs are range-partitioned by doc_id and
   sorted within partitions; a stateful mapInArrow pass computes the
   within-partition running sum (batch iterator carries state across
   batches); per-partition totals aggregate map-side to the driver
   (n_partitions rows — metadata-sized at any scale), which cumsums them
   into per-partition base offsets broadcast back as a join.
2. **Piece emission, not token explosion**: a doc overlapping windows
   [first_w, last_w] emits one *array slice* per window (at most
   n_tok/window + 1 pieces) — rows stay document-scale, token data stays
   in arrays.
3. **One shuffle on window_id** regroups the pieces; each window flattens
   its pieces sorted by offset (array_sort + flatten — all JVM built-ins).

Total data movement: the offsets join shuffles the token arrays once, the
piece regroup shuffles them once more — the theoretical minimum for "order
globally, regroup by window" without assuming pre-sorted input.

The offsets stage is **localCheckpoint(eager=True)**-materialized: two
actions consume the range-partitioned lineage (the totals collect and the
final job), and the driver-side base offsets are only valid for the exact
partition-id assignment they were collected from.  A plain persist could
be evicted or unpersisted (e.g. by an interleaved second call) and the
recompute could re-sample range boundaries into different pids —
silently corrupting offsets.  Checkpointing cuts the lineage instead:
recomputation is impossible, and a lost executor surfaces as an error,
never a wrong answer.  (On a real cluster, a reliable checkpoint dir or a
blocks-table write would serve the same role.)
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["pack_sequences", "pack_spans"]


def _doc_offsets(tok: DataFrame, n_parts: int) -> DataFrame:
    """(doc_id, n_tok, start) — global start offset of each doc in the
    doc_id-ordered token stream, via the distributed prefix sum."""
    meta = tok.select("doc_id", "n_tok")
    parted = (
        meta.repartitionByRange(n_parts, "doc_id")
        .sortWithinPartitions("doc_id")
        .withColumn("pid", F.spark_partition_id())
    )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.StringType(), False),
            T.StructField("n_tok", T.LongType(), False),
            T.StructField("pid", T.IntegerType(), False),
            T.StructField("local_start", T.LongType(), False),
        ]
    )

    def running(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        # batches arrive in partition order; carry the running total across
        # them (vectorized cumsum inside each batch)
        import numpy as np

        acc = 0
        for b in batches:
            n = b.column("n_tok").to_numpy(zero_copy_only=False).astype("int64")
            starts = np.zeros(len(n), dtype="int64")
            np.cumsum(n[:-1], out=starts[1:])
            starts += acc
            acc += int(n.sum())
            yield pa.RecordBatch.from_arrays(
                [
                    b.column("doc_id"),
                    pa.array(n, type=pa.int64()),
                    b.column("pid"),
                    pa.array(starts, type=pa.int64()),
                ],
                names=["doc_id", "n_tok", "pid", "local_start"],
            )

    # lineage-cutting materialization: the per-pid base offsets collected
    # below are frozen against exactly this pid assignment (see module
    # docstring) — blocks are reference-counted and GC-cleaned, so
    # interleaved pack_sequences calls cannot invalidate each other
    local = parted.mapInArrow(running, schema=out_schema).localCheckpoint(
        eager=True
    )

    # per-partition totals -> driver cumsum -> broadcast base offsets.
    # n_parts rows: metadata-sized at any scale.
    totals = {
        r["pid"]: r["total"]
        for r in local.groupBy("pid")
        .agg(F.sum("n_tok").alias("total"))
        .collect()
    }
    bases, acc = [], 0
    for pid in sorted(totals):
        bases.append((pid, acc))
        acc += int(totals[pid])
    spark = tok.sparkSession
    base_df = spark.createDataFrame(bases or [(0, 0)], "pid int, base long")
    return (
        local.join(F.broadcast(base_df), "pid", "left")
        .select(
            "doc_id",
            "n_tok",
            (F.col("local_start") + F.coalesce("base", F.lit(0))).alias("start"),
        )
    )


def pack_spans(
    tok: DataFrame, window: int = 2048, n_parts: int | None = None
) -> DataFrame:
    """Document-boundary metadata of the packed stream: one row per
    (window, document) overlap — (window_id, doc_id, off, len), where
    ``off`` is the document piece's offset inside its window.  Trainers
    consume this for attention masking / loss-boundary handling.

    Same plan shape as pack_sequences up to the pieces stage, minus the
    token arrays: rows are piece-scale, payload-free — strictly cheaper
    than the packing itself."""
    if n_parts is None:
        n_parts = tok.sparkSession.sparkContext.defaultParallelism
    offs = _doc_offsets(tok, n_parts)
    docs = offs  # (doc_id, n_tok, start) — no token payload needed

    w = F.col("wid")
    lo = F.greatest(w * window - F.col("start"), F.lit(0))
    hi = F.least((w + 1) * window - F.col("start"), F.col("n_tok"))
    return (
        docs.filter(F.col("n_tok") > 0)
        .select(
            "doc_id",
            "start",
            "n_tok",
            F.explode(
                F.sequence(
                    F.expr(f"start DIV {int(window)}"),
                    F.expr(f"(start + n_tok - 1) DIV {int(window)}"),
                )
            ).alias("wid"),
        )
        .select(
            F.col("wid").alias("window_id"),
            "doc_id",
            (F.col("start") + lo - w * window).alias("off"),
            (hi - lo).alias("len"),
        )
    )


def pack_sequences(
    tok: DataFrame, window: int = 2048, n_parts: int | None = None
) -> DataFrame:
    """Pack the tokens table into fixed-length windows.

    Returns (window_id:long, tokens:array<int>, n_tok:int) — every window
    holds exactly ``window`` tokens except the last.  Deterministic at any
    parallelism: the stream order is doc_id ascending (binary string
    collation, identical in Spark and DuckDB)."""
    if n_parts is None:
        n_parts = tok.sparkSession.sparkContext.defaultParallelism
    offs = _doc_offsets(tok, n_parts)
    docs = tok.select("doc_id", "tokens").join(offs, "doc_id")

    # piece per overlapped window: slice bounds in doc-local coordinates
    w = F.col("wid")
    lo = F.greatest(w * window - F.col("start"), F.lit(0))
    hi = F.least((w + 1) * window - F.col("start"), F.col("n_tok"))
    pieces = (
        docs.filter(F.col("n_tok") > 0)
        .select(
            "doc_id",
            "tokens",
            "start",
            "n_tok",
            # integer DIV, not floor(double /): past 2^53 total tokens the
            # double quotient would round window ids
            F.explode(
                F.sequence(
                    F.expr(f"start DIV {int(window)}"),
                    F.expr(f"(start + n_tok - 1) DIV {int(window)}"),
                )
            ).alias("wid"),
        )
        .select(
            F.col("wid").alias("window_id"),
            # offset of the piece inside its window orders the reassembly
            (F.col("start") + lo - w * window).alias("win_off"),
            F.slice(F.col("tokens"), (lo + 1).cast("int"), (hi - lo).cast("int")).alias(
                "piece"
            ),
        )
    )
    return (
        pieces.groupBy("window_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("win_off", "piece"))),
                    lambda s: s["piece"],
                )
            ).alias("tokens")
        )
        .select(
            "window_id",
            "tokens",
            F.size("tokens").alias("n_tok"),
        )
    )
