"""Spark encode/decode pipeline: the distributed replacement for the
reference's single-threaded row-group walk (SURVEY.md §3).

Mapping (SURVEY.md §1.3):
    row group      -> DataFrame partition   (repartition on (source, salt))
    column chunk   -> one row of the blocks table
    page decode    -> vectorized numpy kernels inside applyInPandas
    row pivot      -> never (Arrow-columnar end to end)

Scale design notes (targets a 1000-executor cluster; local[32] here):
  * ONE shuffle total: the repartition onto (source, salt).  Encode is then
    embarrassingly parallel; no further exchange.
  * Skew: per-source token totals are tiny aggregates (one row per source);
    the salt count per source is sized so each (source, salt) bucket holds
    ~TARGET_TOKENS_PER_PART tokens.  The dominant source (60% of rows in the
    generator) fans out across the cluster instead of hot-spotting one task.
  * Checkpoint/resume: completed part_ids live in the metrics table; resume
    anti-joins them (broadcast — the completed list is one row per partition,
    i.e. metadata-sized even at 10^12 sequences with ~1e5 partitions).
  * Lineage: every block row carries (snapshot_id, part_id, codec, bytes,
    crc32 checksum); the metrics table is the per-partition rollup.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .codecs import (
    decode_column,
    encode_column,
    encode_dict,
    params_from_json,
    params_to_json,
)

TARGET_TOKENS_PER_PART = 4_000_000  # ~16 MB of raw int32 tokens per task

BLOCKS_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("column", T.StringType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("params", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("n_values", T.LongType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("raw_bytes", T.LongType(), False),
        T.StructField("enc_bytes", T.LongType(), False),
        T.StructField("ref_dict_bytes", T.LongType(), True),
        T.StructField("checksum", T.LongType(), False),
        T.StructField("snapshot_id", T.StringType(), False),
        T.StructField("encode_ms", T.DoubleType(), False),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("part_id", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("snapshot_id", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_tokens", T.LongType(), False),
        T.StructField("raw_bytes", T.LongType(), False),
        T.StructField("enc_bytes", T.LongType(), False),
        T.StructField("tokens_codec", T.StringType(), False),
        T.StructField("checksum", T.LongType(), False),
        T.StructField("encode_ms", T.DoubleType(), False),
    ]
)


# --------------------------------------------------------------- salting

def plan_salts(df: DataFrame, target_tokens: int = TARGET_TOKENS_PER_PART) -> dict:
    """Per-source salt counts from per-source token totals.

    One tiny aggregate (rows == #distinct sources); the result is broadcast
    into the salt expression.  This is the explicit skew-handling mandated
    by the north rule: an oversized source gets ceil(total/target) salts.
    """
    totals = df.groupBy("source").agg(F.sum("n_tok").alias("total")).collect()
    return {
        r["source"]: max(1, -(-int(r["total"]) // target_tokens)) for r in totals
    }


def with_partition_id(df: DataFrame, salt_map: dict) -> DataFrame:
    """Add deterministic (salt, part_id) from a broadcastable salt map.

    Salt = crc32(doc_id) % n_salts(source) — content-addressed, so the
    assignment is stable across reruns/parallelism (checkpoint-safe).
    """
    salt_expr = F.lit(1)
    for src, n in salt_map.items():
        salt_expr = F.when(F.col("source") == src, F.lit(n)).otherwise(salt_expr)
    df = df.withColumn("salt", F.pmod(F.crc32(F.col("doc_id")), salt_expr).cast("int"))
    return df.withColumn(
        "part_id", F.concat_ws("#", F.col("source"), F.col("salt").cast("string"))
    )


# --------------------------------------------------------------- encode

_COLUMNS = ("tokens", "n_tok", "doc_id", "source")


def _encode_partition_pdf(
    pdf: pd.DataFrame, snapshot_id: str, with_ref_baseline: bool
) -> pd.DataFrame:
    """Encode one (source, salt) bucket into one blocks row per column."""
    t0 = time.perf_counter()
    pdf = pdf.sort_values("doc_id", kind="mergesort").reset_index(drop=True)
    part_id = pdf["part_id"].iloc[0]
    source = pdf["source"].iloc[0]
    n_rows = len(pdf)

    tok_arrays = pdf["tokens"].to_numpy()
    flat = (
        np.concatenate([np.asarray(a, dtype=np.int64) for a in tok_arrays])
        if n_rows
        else np.empty(0, dtype=np.int64)
    )
    n_tok = pdf["n_tok"].to_numpy(dtype=np.int64)
    doc_ids = pdf["doc_id"].tolist()
    sources = pdf["source"].tolist()

    cols = {
        "tokens": (flat, "int", 4 * len(flat)),
        "n_tok": (n_tok, "int", 4 * len(n_tok)),
        "doc_id": (doc_ids, "str", sum(len(s) for s in doc_ids)),
        "source": (sources, "str", sum(len(s) for s in sources)),
    }
    rows = []
    for col, (vals, kind, raw_bytes) in cols.items():
        codec, params, payload, _stats = encode_column(vals, kind)
        ref_bytes = None
        if with_ref_baseline and col == "tokens":
            # honest <=-size gate: the reference's own RLE/dict wire format
            # on the same values (dict page + hybrid indices, SURVEY.md D15/D16)
            ref_bytes = len(encode_dict(np.asarray(vals, dtype=np.int32), "int32"))
        rows.append(
            {
                "part_id": part_id,
                "source": source,
                "column": col,
                "codec": codec,
                "params": params_to_json(params),
                "payload": payload,
                "n_values": len(vals),
                "n_rows": n_rows,
                "raw_bytes": raw_bytes,
                "enc_bytes": len(payload),
                "ref_dict_bytes": ref_bytes,
                "checksum": zlib.crc32(payload),
                "snapshot_id": snapshot_id,
                "encode_ms": (time.perf_counter() - t0) * 1000.0,
            }
        )
    return pd.DataFrame(rows)


def encode_table(
    df: DataFrame,
    snapshot_id: str = "",
    salt_map: dict | None = None,
    target_tokens: int = TARGET_TOKENS_PER_PART,
    with_ref_baseline: bool = False,
) -> DataFrame:
    """tokens DataFrame -> blocks DataFrame (one row per (partition, column)).

    Single shuffle: repartition on (source, salt); then applyInPandas runs
    the numpy encode kernels per bucket.
    """
    salt_map = salt_map or plan_salts(df, target_tokens)
    with_pid = with_partition_id(df, salt_map)

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_partition_pdf(pdf, snapshot_id, with_ref_baseline)

    # groupBy().applyInPandas hash-partitions on part_id — that IS the one
    # shuffle of the pipeline (an explicit repartition first would double it).
    return with_pid.groupBy("part_id").applyInPandas(enc, schema=BLOCKS_SCHEMA)


# --------------------------------------------------------------- decode

def decode_blocks(blocks: DataFrame) -> DataFrame:
    """blocks DataFrame -> original tokens DataFrame (bit-identical rows).

    Groups by part_id (the blocks of one partition reunite), decodes each
    column payload with the vectorized kernels, and re-splits the flat token
    vector on the n_tok offsets (Arrow list layout; the repetition-level
    concept the reference never implemented, SURVEY.md D18).
    """

    def dec(pdf: pd.DataFrame) -> pd.DataFrame:
        by_col = {r["column"]: r for _, r in pdf.iterrows()}
        n_rows = int(by_col["doc_id"]["n_rows"])
        out = {}
        for col in _COLUMNS:
            row = by_col[col]
            payload = bytes(row["payload"])
            if zlib.crc32(payload) != int(row["checksum"]):
                raise ValueError(f"checksum mismatch for {row['part_id']}/{col}")
            kind = "str" if col in ("doc_id", "source") else "int"
            out[col] = decode_column(
                row["codec"], payload, int(row["n_values"]),
                params_from_json(row["params"]), kind,
            )
        n_tok = np.asarray(out["n_tok"], dtype=np.int64)
        offsets = np.zeros(n_rows + 1, dtype=np.int64)
        np.cumsum(n_tok, out=offsets[1:])
        flat = np.asarray(out["tokens"], dtype=np.int32)
        tokens = [flat[offsets[i] : offsets[i + 1]] for i in range(n_rows)]
        return pd.DataFrame(
            {
                "doc_id": [b.decode() for b in out["doc_id"]],
                "tokens": tokens,
                "n_tok": n_tok.astype(np.int32),
                "source": [b.decode() for b in out["source"]],
            }
        )

    return blocks.groupBy("part_id").applyInPandas(dec, schema=DECODED_SCHEMA)


# ----------------------------------------------------- job with resume

def snapshot_of(path: str) -> str:
    """Content-ish snapshot id for lineage: path + file names + sizes."""
    h = hashlib.sha1(path.encode())
    try:
        for name in sorted(os.listdir(path)):
            st = os.stat(os.path.join(path, name))
            h.update(f"{name}:{st.st_size}".encode())
    except OSError:
        pass
    return h.hexdigest()[:16]


def encode_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    target_tokens: int = TARGET_TOKENS_PER_PART,
    with_ref_baseline: bool = False,
) -> dict:
    """Resumable encode job: skip partitions already in the metrics table.

    Layout under output_path:
        blocks/   parquet, appended per run
        metrics/  parquet, appended per run (completed part_ids live here)
    """
    blocks_path = os.path.join(output_path, "blocks")
    metrics_path = os.path.join(output_path, "metrics")
    snapshot_id = snapshot_of(input_path)

    df = spark.read.parquet(input_path)
    salt_map = plan_salts(df, target_tokens)
    with_pid = with_partition_id(df, salt_map)

    done: set[str] = set()
    if os.path.isdir(metrics_path):
        prev = spark.read.parquet(metrics_path)
        done = {
            r["part_id"]
            for r in prev.filter(F.col("snapshot_id") == snapshot_id)
            .select("part_id")
            .distinct()
            .collect()
        }
    if done:
        # anti-join against the completed set (broadcast; metadata-sized)
        done_df = spark.createDataFrame([(p,) for p in done], ["part_id"])
        with_pid = with_pid.join(F.broadcast(done_df), "part_id", "left_anti")

    def enc(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_partition_pdf(pdf, snapshot_id, with_ref_baseline)

    blocks = with_pid.groupBy("part_id").applyInPandas(enc, schema=BLOCKS_SCHEMA)
    blocks.write.mode("append").parquet(blocks_path)

    # Idempotent rollup: metrics := aggregate of everything in blocks/.
    # Parquet column pruning keeps the payload column unread here, so this
    # scans metadata-sized data even at 10^12-sequence scale.
    # dropDuplicates heals the crash window between a committed blocks write
    # and the metrics write: a rerun re-appends identical blocks (encode is
    # deterministic over sorted content), which must not double-count here.
    all_blocks = spark.read.parquet(blocks_path).select(
        "part_id", "source", "snapshot_id", "column", "codec",
        "n_values", "n_rows", "raw_bytes", "enc_bytes", "checksum", "encode_ms",
    ).dropDuplicates(["part_id", "column", "snapshot_id"])
    metrics = (
        all_blocks
        .groupBy("part_id", "source", "snapshot_id")
        .agg(
            F.max("n_rows").alias("n_rows"),
            F.max(F.when(F.col("column") == "tokens", F.col("n_values"))).alias(
                "n_tokens"
            ),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.max(F.when(F.col("column") == "tokens", F.col("codec"))).alias(
                "tokens_codec"
            ),
            F.max(F.when(F.col("column") == "tokens", F.col("checksum"))).alias(
                "checksum"
            ),
            F.max("encode_ms").alias("encode_ms"),
        )
    )
    tmp_metrics = metrics_path + "_tmp"
    metrics.write.mode("overwrite").parquet(tmp_metrics)
    # atomic-ish swap so a crash mid-write never corrupts the resume state
    if os.path.isdir(metrics_path):
        os.rename(metrics_path, metrics_path + "_old")
    os.rename(tmp_metrics, metrics_path)
    if os.path.isdir(metrics_path + "_old"):
        import shutil

        shutil.rmtree(metrics_path + "_old", ignore_errors=True)

    m = spark.read.parquet(metrics_path).filter(F.col("snapshot_id") == snapshot_id)
    agg = m.agg(
        F.count("*").alias("parts"),
        F.sum("n_rows").alias("rows"),
        F.sum("n_tokens").alias("tokens"),
        F.sum("raw_bytes").alias("raw"),
        F.sum("enc_bytes").alias("enc"),
    ).collect()[0]
    return {
        "snapshot_id": snapshot_id,
        "partitions": agg["parts"],
        "rows": int(agg["rows"] or 0),
        "tokens": int(agg["tokens"] or 0),
        "raw_bytes": int(agg["raw"] or 0),
        "enc_bytes": int(agg["enc"] or 0),
        "resumed_skipped": len(done),
        "salt_map": json.dumps(salt_map),
    }
