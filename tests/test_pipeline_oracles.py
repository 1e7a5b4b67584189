"""Exact value oracles for the LSH-family operators.

These ops (MinHash+LSH banding, hyperplane-bucketed near-dup / ANN) are not
ANSI-SQL-expressible, so the driver only row-count-checks them.  Here each
gets an independent re-derivation — python-int / sequential-float arithmetic,
deliberately NOT the numpy formulation the operators use — asserting the
exact signatures, buckets, pairs, and top-k ids on the deterministic
sf0.001 tables.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
M64 = (1 << 64) - 1


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


# ------------------------------------------------------------- minhash sigs

def _minhash_rederived(text: str, n_hashes: int = 32, k: int = 9) -> list[int]:
    """Python-int re-derivation of minhash_signatures' exact arithmetic
    (pure modular ints — the round-3 family never wraps, by design: every
    intermediate < 2^62, which is what makes the DuckDB oracle possible)."""
    MOD = (1 << 31) - 1
    WMOD, BASE = 1073741789, 257
    rng = np.random.default_rng(42)
    A = [int(a) for a in rng.integers(1, MOD, n_hashes)]
    B = [int(b) for b in rng.integers(0, MOD, n_hashes)]
    b = (text or "").encode("utf-8", "ignore")
    if len(b) < k:
        shingles = [0]
    else:
        coeffs = [pow(BASE, j, WMOD) for j in range(k)]
        shingles = [
            sum(b[i + j] * coeffs[j] for j in range(k)) % WMOD
            for i in range(len(b) - k + 1)
        ]
    return [
        min((a * s + bb) % MOD for s in shingles) for a, bb in zip(A, B)
    ]


def test_minhash_signatures_rederived(spark, docs):
    from parquet_python_spark.operators.pipeline_ops import minhash_signatures

    sample = {r["doc_id"]: r["text"] for r in docs.limit(24).collect()}
    got = {
        r["doc_id"]: list(r["minhash"])
        for r in minhash_signatures(docs).filter(
            F.col("doc_id").isin(list(sample))
        ).collect()
    }
    for doc_id, text in sample.items():
        assert got[doc_id] == _minhash_rederived(text), f"doc {doc_id}"


# -------------------------------------------------------------- LSH banding

def test_lsh_banding_pairs_rederived(spark, docs):
    """Candidate pairs == docs sharing any identical band slice of the
    re-derived signatures (band membership by value, not by Spark's hash)."""
    from parquet_python_spark.operators.pipeline_ops import (
        dedup_minhash_candidates,
    )

    n_hashes, bands = 32, 8
    rows_per_band = n_hashes // bands
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    buckets: dict = {}
    for doc_id, text in texts.items():
        sig = _minhash_rederived(text, n_hashes)
        for b in range(bands):
            key = (b, tuple(sig[b * rows_per_band : (b + 1) * rows_per_band]))
            buckets.setdefault(key, []).append(doc_id)
    expected = set()
    for members in buckets.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                expected.add((ms[i], ms[j]))
    got = {
        (r["doc_a"], r["doc_b"]) for r in dedup_minhash_candidates(docs).collect()
    }
    assert got == expected


# --------------------------------------------------- hyperplane LSH near-dup

def _quantize(vec) -> list[int]:
    return [math.floor(float(x) * 1000) for x in vec]


def _cos_x10k(qa: list[int], qb: list[int]) -> int:
    dot = sum(x * y for x, y in zip(qa, qb))
    na = sum(x * x for x in qa)
    nb = sum(x * x for x in qb)
    return math.floor(dot / math.sqrt(float(na * nb)) * 10000)


def test_near_dup_lsh_rederived(spark, emb):
    from parquet_python_spark.operators.pipeline_ops import embedding_near_dup_lsh

    n_planes, min_cos = 4, 0.35
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    dim = len(next(iter(vecs.values())))
    # ternary (±1) planes over the QUANTIZED ints — exact integer bucket
    planes = np.random.default_rng(7).integers(
        0, 2, (n_planes, dim), dtype=np.int64
    ) * 2 - 1
    by_bucket: dict = {}
    for vid, v in vecs.items():
        qv = np.asarray(_quantize(v), dtype=np.int64)
        signs = (planes @ qv) >= 0
        bucket = int((signs.astype(np.int64) << np.arange(n_planes)).sum())
        by_bucket.setdefault(bucket, []).append(vid)
    expected = set()
    for members in by_bucket.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                a, b = ms[i], ms[j]
                c = _cos_x10k(_quantize(vecs[a]), _quantize(vecs[b]))
                if c >= int(min_cos * 10000):
                    expected.add((a, b, c))
    got = {
        (r["vec_a"], r["vec_b"], r["cosine_x10k"])
        for r in embedding_near_dup_lsh(emb, min_cosine=min_cos, n_planes=n_planes)
        .collect()
    }
    assert got == expected


# ------------------------------------------------------------- ANN IVF topk

def test_ann_ivf_topk_rederived(spark, emb):
    """IVF search re-derived independently: k-means recomputed from the
    same pinned sample, integer-grid assignment (python-int arithmetic) +
    probe filter + sequential fold cosine, exact top-k id list."""
    import numpy as np

    from parquet_python_spark.operators.pipeline_ops import (
        ann_ivf_topk,
        train_ivf_centroids,
    )

    n_clusters, n_probe, k = 8, 3, 10
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb.collect()}
    qvec = vecs[min(vecs)]

    # independent k-means re-derivation (same seed/protocol, scalar loops)
    sample_ids = sorted(vecs)[:2048]
    X = np.asarray([vecs[i] for i in sample_ids], dtype=np.float64)
    rng = np.random.default_rng(13)
    C = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(8):
        assign = np.array(
            [int(((C - x) ** 2).sum(axis=1).argmin()) for x in X]
        )
        for c in range(len(C)):
            m = X[assign == c]
            if len(m):
                C[c] = m.mean(axis=0)

    # integer-grid quantization (python ints, independent of the operator)
    CQ = [[math.floor(v * 1000) for v in c] for c in C]

    def assign_int(v) -> int:
        vq = [math.floor(x * 1000) for x in v]
        d2s = [
            sum((a - b) * (a - b) for a, b in zip(vq, c)) for c in CQ
        ]
        return d2s.index(min(d2s))

    qq = [math.floor(x * 1000) for x in qvec]
    qd2 = [sum((a - b) * (a - b) for a, b in zip(qq, c)) for c in CQ]
    probes = set(sorted(range(len(CQ)), key=lambda i: (qd2[i], i))[:n_probe])
    qnorm = math.sqrt(sum(x * x for x in qvec))
    scored = []
    for vid, v in vecs.items():
        if assign_int(v) not in probes:
            continue
        dot = 0.0
        for a, b in zip(v, qvec):
            dot += a * b
        nrm = 0.0
        for a in v:
            nrm += a * a
        scored.append((dot / (math.sqrt(nrm) * qnorm), vid))
    scored.sort(key=lambda t: (-t[0], t[1]))
    expected = [vid for _, vid in scored[:k]]

    cents = train_ivf_centroids(emb, n_clusters)
    np.testing.assert_allclose(cents, C, rtol=0, atol=0)  # bit-identical
    got = [
        r["vec_id"]
        for r in ann_ivf_topk(
            emb, qvec, k=k, n_clusters=n_clusters, n_probe=n_probe,
            centroids=cents,
        ).select("vec_id").collect()
    ]
    assert got == expected


# ------------------------------------------------------------- ANN LSH topk

def test_ann_lsh_topk_rederived(spark, emb):
    from parquet_python_spark.operators.pipeline_ops import ann_lsh_bucketed_topk

    n_planes, k = 8, 10
    vecs = {r["vec_id"]: list(r["embedding"]) for r in emb.collect()}
    qvec = [float(x) for x in vecs[min(vecs)]]
    dim = len(qvec)
    planes = np.random.default_rng(42).integers(
        0, 2, (n_planes, dim), dtype=np.int64
    ) * 2 - 1

    def bucket_of(v) -> int:
        qv = np.floor(np.asarray(v, dtype=np.float64) * 1000).astype(np.int64)
        signs = (planes @ qv) >= 0
        return int((signs.astype(np.int64) << np.arange(n_planes)).sum())

    q_bucket = bucket_of(qvec)
    wanted = {q_bucket} | {q_bucket ^ (1 << i) for i in range(n_planes)}
    qnorm = float(np.sqrt(np.sum(np.asarray(qvec, dtype=np.float64) ** 2)))
    scored = []
    for vid, v in vecs.items():
        if bucket_of(v) not in wanted:
            continue
        # sequential left-fold sums — matches F.aggregate's fold order
        dot = 0.0
        for a, b in zip(v, qvec):
            dot += float(a) * b
        nrm = 0.0
        for a in v:
            nrm += float(a) * float(a)
        scored.append((dot / (math.sqrt(nrm) * qnorm), vid))
    scored.sort(key=lambda t: (-t[0], t[1]))
    expected = [vid for _, vid in scored[:k]]
    got = [
        r["vec_id"]
        for r in ann_lsh_bucketed_topk(emb, qvec, k=k, n_planes=n_planes)
        .select("vec_id")
        .collect()
    ]
    assert got == expected
