"""Training-data pipeline operators over the documents/embeddings tables.

All hot paths are JVM-side built-ins (pyspark.sql.functions) or Arrow-batched
pandas UDFs; no row-at-a-time Python.  These are first-class engine
operators (task brief: dedup, similarity search, text analysis) layered on
the same Spark-first design as the codec engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf


# ------------------------------------------------------------ exact dedup

def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact deduplication by content hash: one survivor (min doc_id) per
    distinct text, with the duplicate count.  Map-side partial aggregation
    makes this one shuffle on the hash key at any scale."""
    return (
        docs.groupBy("text")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.count("*").alias("n_dups"),
        )
        .select("doc_id", "text", "n_dups")
    )


# ------------------------------------------------------- minhash LSH dedup

def _shingle_hashes(text_series: pd.Series, k: int = 5) -> list[np.ndarray]:
    """Per doc: crc32-ish hashes of all k-char shingles, vectorized."""
    out = []
    for t in text_series:
        b = np.frombuffer((t or "").encode("utf-8", "ignore"), dtype=np.uint8)
        if len(b) < k:
            out.append(np.zeros(1, dtype=np.uint64))
            continue
        # rolling polynomial hash over a sliding window (vectorized)
        windows = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
        coeffs = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
        out.append((windows * coeffs).sum(axis=1))
    return out


def minhash_signatures(docs: DataFrame, n_hashes: int = 32, k: int = 5) -> DataFrame:
    """MinHash signatures over k-char shingles (Arrow-batched pandas UDF)."""
    # deterministic affine hash family h_i(x) = (a_i * x + b_i) mod 2^61-1
    rng = np.random.default_rng(42)
    A = rng.integers(1, 2**31, n_hashes).astype(np.uint64)
    B = rng.integers(0, 2**31, n_hashes).astype(np.uint64)
    MOD = np.uint64((1 << 61) - 1)

    @pandas_udf(T.ArrayType(T.LongType()))
    def sig(text: pd.Series) -> pd.Series:
        shingles = _shingle_hashes(text, k)
        sigs = []
        for sh in shingles:
            # (n_hashes, n_shingles) affine transforms, min over shingles
            vals = (A[:, None] * sh[None, :] + B[:, None]) % MOD
            sigs.append(vals.min(axis=1).astype(np.int64))
        return pd.Series(sigs)

    return docs.select("doc_id", sig(F.col("text")).alias("minhash"))


def dedup_minhash_candidates(
    docs: DataFrame, n_hashes: int = 32, bands: int = 8, k: int = 5
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become candidate
    near-dup pairs.  Scale path: one shuffle on (band_idx, band_hash) — no
    all-pairs comparison anywhere."""
    rows_per_band = n_hashes // bands
    sigs = minhash_signatures(docs, n_hashes, k)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.slice(
                    F.col("minhash"), b * rows_per_band + 1, rows_per_band
                ),
            )
        ).alias("band_idx", "band"),
    ).select("doc_id", "band_idx", F.hash("band").alias("band_hash"))
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=["band_idx", "band_hash"],
            how="inner",
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def dedup_simhash(docs: DataFrame, bits: int = 64) -> DataFrame:
    """SimHash fingerprints: sign-sum of hashed token vectors (pandas UDF)."""

    @pandas_udf(T.LongType())
    def simhash(text: pd.Series) -> pd.Series:
        out = np.empty(len(text), dtype=np.int64)
        for i, t in enumerate(text):
            words = (t or "").lower().split()
            if not words:
                out[i] = 0
                continue
            # crc32-derived 64-bit hashes: process-independent (python's
            # builtin hash() is salted by PYTHONHASHSEED — not reproducible)
            import zlib

            hs = np.array(
                [
                    (zlib.crc32(w.encode()) << 32) | zlib.crc32(w.encode()[::-1])
                    for w in words
                ],
                dtype=np.uint64,
            )
            bitmat = (hs[:, None] >> np.arange(bits, dtype=np.uint64)) & np.uint64(1)
            sums = bitmat.sum(axis=0)
            fp = ((sums * 2 > len(words)).astype(np.uint64) << np.arange(bits, dtype=np.uint64)).sum()
            out[i] = np.int64(fp.astype(np.uint64).view(np.int64))
        return pd.Series(out)

    return docs.select("doc_id", simhash(F.col("text")).alias("simhash"))


# -------------------------------------------------------------- text stats

def text_stats(docs: DataFrame) -> DataFrame:
    """Quality-scoring signals, all JVM-side built-ins (integer outputs so
    the DuckDB oracle matches exactly)."""
    return docs.select(
        "doc_id",
        F.length("text").alias("len_chars"),
        F.size(F.split(F.col("text"), " ")).alias("n_ws_tokens"),
        F.length(F.regexp_replace("text", r"[^a-zA-Z]", "")).alias("n_alpha"),
        F.length(F.regexp_replace("text", r"[^0-9]", "")).alias("n_digit"),
        F.length(F.regexp_replace("text", r"[^.!?,;:]", "")).alias("n_punct"),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Content fingerprint (md5 hex — portable to the SQL oracle)."""
    return docs.select("doc_id", F.md5(F.col("text")).alias("fp"))


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language id from stopword hits (JVM-side regexp counts).

    Not a model — a deterministic n-gram/stopword scorer suitable for
    coarse corpus splits; ties broken lexicographically."""
    probes = {
        "en": r"\b(the|and|of|to|in)\b",
        "de": r"\b(der|die|und|das|ist)\b",
        "fr": r"\b(le|la|et|les|des)\b",
        "es": r"\b(el|los|las|una|es)\b",
    }
    scored = docs.select(
        "doc_id",
        *[
            F.regexp_count(F.lower(F.col("text")), F.lit(rx)).alias(f"s_{lang}")
            for lang, rx in probes.items()
        ],
    )
    score_struct = F.array(
        *[
            F.struct(F.col(f"s_{lang}").alias("score"), F.lit(lang).alias("lang"))
            for lang in probes
        ]
    )
    return scored.select(
        "doc_id",
        F.array_max(score_struct).getField("lang").alias("lang_pred"),
    )


# ------------------------------------------------------- similarity search

def ann_brute_force_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k against one query vector.

    JVM-side: F.zip_with dot product + aggregate — no Python in the scan.
    At cluster scale this is a full scan + TakeOrdered (no shuffle of the
    vectors themselves, only k rows per partition reach the driver)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qnorm = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    dot = F.aggregate(
        F.zip_with("embedding", q, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return (
        emb.select(
            "vec_id", (dot / (norm * F.lit(qnorm))).alias("cosine")
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ann_lsh_bucketed_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, n_planes: int = 8
) -> DataFrame:
    """Scale path: random-hyperplane LSH bucketing, then brute force only
    inside the query's bucket (and its 1-bit-flip neighbors)."""
    dim = len(query_vec)
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((n_planes, dim))

    @pandas_udf(T.IntegerType())
    def bucket(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.to_numpy())
        signs = (mat @ planes.T) > 0
        return pd.Series(
            (signs.astype(np.int32) << np.arange(n_planes)).sum(axis=1)
        )

    q = np.asarray(query_vec, dtype=np.float64)
    q_bucket = int((((planes @ q) > 0).astype(np.int32) << np.arange(n_planes)).sum())
    neighbor_buckets = [q_bucket] + [q_bucket ^ (1 << i) for i in range(n_planes)]
    candidates = emb.withColumn("bucket", bucket(F.col("embedding"))).filter(
        F.col("bucket").isin(neighbor_buckets)
    )
    return ann_brute_force_topk(candidates, query_vec, k)
