"""Deterministic, distributed synthetic tokens-table generator.

Produces the engine's authoritative input shape (BASELINE.json input_hint):

    doc_id : string       -- f"{source}-{i:012d}", unique
    tokens : array<int32> -- per-source profile, values in [0, 2**17)
    n_tok  : int32        -- len(tokens)
    source : string       -- profile name; row counts deliberately skewed

Per-source profiles stress one codec each (FIXTURES.md F1):
    lowcard -> dictionary, runny -> RLE, narrow -> FOR+bitpack,
    texty -> FSST, random -> bitpack/PLAIN.

Generation is seeded-counter-based (PCG64 seeded by (seed, row id)), so any
row can be generated independently on any executor: the table is built
distributed via mapInPandas over spark.range — no driver-side materialization
and no RNG state shared across partitions, which keeps output identical for
any partitioning/parallelism (required for checkpoint/resume tests).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TOKEN_RANGE = 1 << 17
MIN_LEN, MAX_LEN = 16, 2048

# (source, share of rows) — one source dominates to exercise salting.
SOURCE_MIX = [
    ("random", 0.60),
    ("runny", 0.15),
    ("lowcard", 0.10),
    ("texty", 0.10),
    ("narrow", 0.05),
]

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("tokens", T.ArrayType(T.IntegerType(), False), False),
        T.StructField("n_tok", T.IntegerType(), False),
        T.StructField("source", T.StringType(), False),
    ]
)


def _source_of(ids: np.ndarray) -> np.ndarray:
    """Deterministic source assignment by row id (skewed mix)."""
    bucket = ids % 100
    out = np.empty(len(ids), dtype=object)
    lo = 0
    for name, share in SOURCE_MIX:
        hi = lo + int(share * 100)
        out[(bucket >= lo) & (bucket < hi)] = name
        lo = hi
    out[bucket >= lo] = SOURCE_MIX[0][0]
    return out


def _zipfish_len(rng: np.random.Generator, min_len: int, max_len: int) -> int:
    """Zipf-ish length in [min_len, max_len]."""
    raw = int(rng.pareto(1.2) * (min_len * 4)) + min_len
    return min(raw, max_len)


def _gen_tokens(
    source: str, row_id: int, seed: int, min_len: int = MIN_LEN, max_len: int = MAX_LEN
) -> np.ndarray:
    rng = np.random.default_rng([seed, row_id])
    n = _zipfish_len(rng, min_len, max_len)
    if source == "lowcard":
        vocab = np.random.default_rng([seed, 0x10CA]).integers(0, TOKEN_RANGE, 64)
        return vocab[rng.integers(0, 64, n)].astype(np.int32)
    if source == "runny":
        n_runs = max(n // 32, 1)
        vals = rng.integers(0, 1024, n_runs)
        lens = rng.integers(16, 64, n_runs)
        return np.repeat(vals, lens)[:n].astype(np.int32)
    if source == "narrow":
        return rng.integers(100_000, 100_000 + 64, n).astype(np.int32)
    if source == "texty":
        motifs = np.random.default_rng([seed, 0x7E47]).integers(0, 4096, (32, 16))
        picks = rng.integers(0, 32, n // 16 + 1)
        return motifs[picks].ravel()[:n].astype(np.int32)
    return rng.integers(0, TOKEN_RANGE, n).astype(np.int32)


def _gen_batch(
    ids: np.ndarray, seed: int, min_len: int = MIN_LEN, max_len: int = MAX_LEN
) -> pd.DataFrame:
    sources = _source_of(ids)
    tokens = [
        _gen_tokens(s, int(i), seed, min_len, max_len)
        for s, i in zip(sources, ids)
    ]
    return pd.DataFrame(
        {
            "doc_id": [f"{s}-{i:012d}" for s, i in zip(sources, ids)],
            "tokens": tokens,
            "n_tok": np.array([len(t) for t in tokens], dtype=np.int32),
            "source": sources,
        }
    )


def generate_tokens_df(
    spark: SparkSession,
    n_rows: int,
    seed: int = 42,
    partitions: int | None = None,
    min_len: int = MIN_LEN,
    max_len: int = MAX_LEN,
) -> DataFrame:
    """Distributed deterministic tokens table (same content at any parallelism)."""
    partitions = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Slice to ~2k rows per emitted batch: at large max_len one Arrow
        # input batch (65k ids) would otherwise materialize ~1 GB of token
        # arrays in a single pandas frame and thrash the allocator.
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            for lo in range(0, len(ids), 2048):
                yield _gen_batch(ids[lo : lo + 2048], seed, min_len, max_len)

    return (
        spark.range(0, n_rows, numPartitions=partitions)
        .mapInPandas(gen, schema=SCHEMA)
    )


def write_tokens_table(
    spark: SparkSession,
    path: str,
    n_rows: int,
    seed: int = 42,
    min_len: int = MIN_LEN,
    max_len: int = MAX_LEN,
    partitions: int | None = None,
) -> None:
    generate_tokens_df(
        spark, n_rows, seed, partitions=partitions, min_len=min_len, max_len=max_len
    ).write.mode("overwrite").parquet(path)
