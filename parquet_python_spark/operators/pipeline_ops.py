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


def _with_min_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition up to the cluster's default parallelism when
    the input yields FAR fewer splits (guide §2.5 input skew: one small or
    unsplittable file serializes CPU-heavy per-row work on a handful of
    tasks — measured ~2x on the single-file bench tables).  The threshold
    is a quarter of the core count, not "any shortfall": the repartition
    ships the full row payload, and the A/B measurement shows that cost
    already exceeds the extra-parallelism gain once the scan supplies a
    third of the cores (10-split input on 32 cores: +12% with the bump).
    Scale-safe by construction: at real data sizes splits >> cores and
    this is a no-op; the condition, not a constant, decides.

    Only exchange-free plans are probed: an input that already shuffled
    runs at the shuffle partition count (>= cores here), so the bump would
    buy nothing — and under AQE, touching df.rdd on such a plan would
    eagerly EXECUTE its shuffle stages at plan-build time just to read a
    partition count, doubling the upstream work (round-6 review)."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    try:
        plan = df._jdf.queryExecution().executedPlan().toString()
    except Exception:  # noqa: BLE001 - internal API drift: skip the bump
        return df
    if "Exchange" in plan:
        return df
    if df.rdd.getNumPartitions() * 4 <= target:
        return df.repartition(target)
    return df


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


# ---------------------------------------------- dedup connected components

def dedup_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iters: int = 25,
) -> DataFrame:
    """Connected components over a near-dup candidate-pair graph — the
    clustering stage between pair generation (MinHash/SimHash/Jaccard
    banding) and canonical-document selection: transitive closure turns
    "A~B, B~C" into one cluster so exactly one survivor is kept per
    near-dup GROUP, not per pair.

    Algorithm: iterative min-label propagation with POINTER JUMPING
    (comp(u) <- min over {comp(u)} ∪ {comp(v): v ~ u} ∪ {comp(comp(u))}).
    The pointer-jump halves the label-chain depth each round, so rounds =
    O(log n) even on path graphs (hash-to-min family, Rastogi et al.
    "Finding Connected Components in MapReduce", 2012 — public
    literature), instead of O(diameter) for plain propagation.  Each
    round is two equi-joins + one min-aggregate — all shuffles on node
    ids, no cartesian anywhere; localCheckpoint every round cuts the
    iterative plan's lineage (otherwise the DAG doubles per round and
    planning, not compute, becomes the bottleneck).  Convergence is
    detected with a metadata-sized changed-rows count; components are
    labeled by their MIN member id, so the output is deterministic.

    100 TB shape: candidate pairs out of banding are piece-scale (bounded
    per band-bucket), never all-pairs; each round's state is one
    (node, comp) row per distinct node.  Returns (doc_id, component_id).
    """
    # edges materialize ONCE: every round joins against them, and without
    # the checkpoint each round re-executes the whole pair-generation
    # subtree (MinHash UDF over the corpus included) — measured as the
    # dominant cost of the end-to-end dedup pipeline (round 6)
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    # lazy: the node-set distinct is a cheap derivation over the cached
    # edges — round 1's job materializes it; no dedicated upfront job
    labels = (
        edges.select(F.col("u").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("comp"))
        .localCheckpoint(eager=False)
    )
    # Convergence via the label-sum invariant: comp values only ever
    # DECREASE (both steps take minima over sets containing the old
    # value) and the node set is fixed, so sum(comp) strictly decreases
    # iff any label changed — one aggregate over the freshly checkpointed
    # state instead of the old full equi-join + count per round.
    # decimal(38,0) keeps the sum exact at any id magnitude / node count.
    # The sum only exists for INTEGRAL node ids; any other id type
    # (string doc ids, floats) keeps the old equi-join change-count —
    # under ANSI mode a decimal cast of a string id would throw, and with
    # ANSI off it would go NULL and silently certify a bogus fixed point
    # (round-6 review finding).
    # prev_sum starts unset (no job for the initial state): round 1 is
    # unconditionally treated as changed, and from round 2 on the sums
    # compare — at worst one extra (idempotent) round on an input that was
    # already at the fixed point, identical output either way.  The unset
    # sentinel is a private object, NOT None: sum() over an empty label
    # table IS None, and the two must not be confused (an empty graph
    # would then never certify convergence).
    _int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    # BOTH endpoint columns must be integral: the edges union coerces a
    # mixed pair of types, so checking src alone could still feed the
    # decimal cast a coerced string/float label
    sum_ok = isinstance(pairs.schema[src].dataType, _int_types) and isinstance(
        pairs.schema[dst].dataType, _int_types
    )
    comp_sum = F.sum(F.col("comp").cast("decimal(38,0)"))
    _unset = object()
    prev_sum = _unset
    changed = None  # None = the loop never ran (max_iters <= 0)
    for it in range(max_iters):
        # neighbor relax: comp(u) <- min(comp(u), min over comp(v), v~u)
        via_edges = (
            edges.join(labels, edges["v"] == labels["node"])
            .select(F.col("u").alias("node"), "comp")
        )
        relaxed = (
            labels.unionByName(via_edges)
            .groupBy("node")
            .agg(F.min("comp").alias("comp"))
        )
        # pointer jump: comp(u) <- min(comp(u), comp(comp(u)))
        hop = relaxed.select(
            F.col("node").alias("jnode"), F.col("comp").alias("jcomp")
        )
        # lazy checkpoint: the convergence aggregate right below is the
        # round's first action, so it materializes the checkpoint in the
        # SAME job — one Spark job per round instead of two (eager
        # checkpoint job + separate agg job)
        jumped = (
            relaxed.join(hop, relaxed["comp"] == hop["jnode"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("jcomp"), F.col("comp"))
                ).alias("comp"),
            )
            .localCheckpoint(eager=False)
        )
        def explicit_changed() -> int:
            return (
                jumped.join(labels.withColumnRenamed("comp", "old"), "node")
                .filter(F.col("comp") != F.col("old"))
                .count()
            )

        if sum_ok:
            new_sum = jumped.agg(comp_sum).collect()[0][0]
            if prev_sum is _unset and it == max_iters - 1:
                # the deferred first sum cannot certify on the FINAL
                # allowed round — fall back to the explicit change count
                # so max_iters=1 on an already-converged graph still
                # certifies instead of raising (round-6 review)
                changed = explicit_changed()
            else:
                changed = int(prev_sum is _unset or new_sum != prev_sum)
            prev_sum = new_sum
        else:
            changed = explicit_changed()
        labels = jumped
        if changed == 0:
            break
    else:
        # Convergence is only CERTIFIED by a round with changed == 0;
        # exhausting max_iters while the last round still changed labels
        # means the result MAY be partially merged — silently returning it
        # would let keep-canonical keep several "canonical" docs per true
        # cluster (under-dedup with no signal).  The raise can be
        # conservative (the final round may have just reached the fixed
        # point) but never silent; practically unreachable with pointer
        # jumping (max_iters rounds cover ~2^max_iters chain depth).
        detail = (
            "the loop never ran (max_iters <= 0)"
            if changed is None
            else "last round still changed labels"
        )
        raise RuntimeError(
            f"dedup_components: cannot certify convergence after "
            f"{max_iters} rounds ({detail}) — raise max_iters"
        )
    return labels.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component_id")
    )


def dedup_keep_canonical(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """End-to-end cluster dedup: component-label the candidate pairs, keep
    ONE canonical document (the min id) per component, and pass through
    every document that appears in no near-dup pair.  The components join
    is on the id key (near-dup nodes are a small fraction of the corpus,
    so the join's build side is piece-scale)."""
    comps = dedup_components(pairs)
    labeled = docs.join(
        comps.withColumnRenamed("doc_id", id_col), id_col, "left"
    ).withColumn(
        "component_id", F.coalesce(F.col("component_id"), F.col(id_col))
    )
    return labeled.withColumn(
        "keep", F.col(id_col) == F.col("component_id")
    )


# ------------------------------------------------------- minhash LSH dedup

# MinHash arithmetic constants, shared verbatim by the numpy kernel, the
# python-int re-derivation test, and the DuckDB oracle generator.  Every
# intermediate stays below 2^62: window hashes are taken mod a prime
# < 2^30 and the affine family works in Z_p with p = 2^31-1 (a, b < p), so
# a*x < 2^61 — plain BIGINT arithmetic on any engine, no wraparound
# anywhere (the round-2 formulation relied on uint64 wrap, which SQL can't
# replicate).  p MUST be small enough that a*x routinely exceeds it: the
# mod is what decorrelates the 32 hash functions — with a modulus above
# the product range the affine map is monotone in x and every signature
# component collapses to a function of the single minimum window hash
# (all bands perfectly correlated: LSH quality destroyed).
MINHASH_WMOD = 1073741789  # prime < 2^30 — window-hash modulus
MINHASH_BASE = 257  # polynomial base for the k-byte rolling window hash
MINHASH_P = (1 << 31) - 1  # affine-family modulus (Mersenne prime 2^31-1)


def _minhash_family(n_hashes: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(42)
    A = rng.integers(1, MINHASH_P, n_hashes).astype(np.uint64)
    B = rng.integers(0, MINHASH_P, n_hashes).astype(np.uint64)
    return A, B


def _minhash_sig_matrix(
    texts, A: np.ndarray, B: np.ndarray, k: int
) -> np.ndarray:
    """(n_docs, n_hashes) MinHash signature matrix, vectorized ACROSS the
    whole Arrow batch: one concatenated byte buffer, k shifted
    multiply-accumulate passes for the rolling polynomial window hashes, a
    diff-trick mask to drop windows crossing document boundaries, and
    np.minimum.reduceat for the per-doc minima.  The only per-row Python is
    the str->bytes encode.  Docs shorter than k shingle as {0} (signature
    b_i), and every step is non-overflowing int arithmetic (see constants
    above) so the DuckDB oracle reproduces each signature bit-for-bit."""
    MOD = np.uint64(MINHASH_P)
    WMOD = np.uint64(MINHASH_WMOD)
    enc = [(t or "").encode("utf-8", "ignore") for t in texts]
    n_docs = len(enc)
    n_hashes = len(A)
    sig = np.empty((n_docs, n_hashes), dtype=np.int64)
    if n_docs == 0:
        return sig
    lens = np.fromiter(map(len, enc), dtype=np.int64, count=n_docs)
    blob = np.frombuffer(b"".join(enc), dtype=np.uint8)
    total_w = max(len(blob) - k + 1, 0)
    n_win = np.maximum(lens - k + 1, 0) * (lens >= k)
    has = n_win > 0
    if total_w == 0 or not has.any():
        sig[:] = B.astype(np.int64)[None, :]  # shingle {0} -> (a*0+b)%P = b
        return sig
    starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    # rolling polynomial hash of every window: coeffs < 2^30, bytes < 2^8,
    # so the k-term sum < k * 2^38 — far from the uint64 edge
    coeffs = np.array(
        [pow(MINHASH_BASE, j, MINHASH_WMOD) for j in range(k)], dtype=np.uint64
    )
    h = np.zeros(total_w, dtype=np.uint64)
    for j in range(k):
        h += blob[j : j + total_w].astype(np.uint64) * coeffs[j]
    h %= WMOD
    # windows fully inside one doc (diff-trick membership mask)
    delta = np.zeros(total_w + 1, dtype=np.int64)
    np.add.at(delta, starts[has], 1)
    np.add.at(delta, starts[has] + n_win[has], -1)
    mask = np.cumsum(delta[:-1]) > 0
    valid_h = h[mask]
    offs = np.zeros(int(has.sum()), dtype=np.int64)
    np.cumsum(n_win[has][:-1], out=offs[1:])
    for i in range(n_hashes):
        vals = (A[i] * valid_h + B[i]) % MOD  # a*x+b < 2^61 + 2^31 in uint64
        sig[has, i] = np.minimum.reduceat(vals, offs).astype(np.int64)
        if not has.all():
            sig[~has, i] = np.int64(B[i])
    return sig


def minhash_signatures(docs: DataFrame, n_hashes: int = 32, k: int = 9) -> DataFrame:
    """MinHash signatures over k-byte shingles (Arrow-batched pandas UDF).

    k=9 default: shingles must span word boundaries to discriminate in
    templated corpora (the test corpus has only ~2k distinct 5-grams —
    5-byte shingles make every doc look alike and candidate pairs
    explode)."""
    # deterministic affine hash family h_i(x) = (a_i * x + b_i) mod 2^31-1
    A, B = _minhash_family(n_hashes)

    # NOTE (round 6): a file-direct variant of this stage (pyarrow reads
    # feeding _minhash_sig_matrix, as in generic_codec.roundtrip) was
    # built and A/B-measured alternating against this path: no win — the
    # band join + checkpoint dominate the candidates pipeline and the
    # signature stage's scan->Arrow cost is small at both bench scales
    # (50k docs: 1.43 vs 1.47 s; sf0.1: within noise).  Reverted per the
    # measure-first rule; this comment records the dead end.
    @pandas_udf(T.ArrayType(T.LongType()))
    def sig(text: pd.Series) -> pd.Series:
        m = _minhash_sig_matrix(text.tolist(), A, B, k)
        return pd.Series(list(m))

    # project to the two needed columns BEFORE the parallelism bump so the
    # repartition (when it fires at all) moves only (doc_id, text)
    docs = _with_min_parallelism(docs.select("doc_id", "text"))
    return docs.select("doc_id", sig(F.col("text")).alias("minhash"))


def dedup_minhash_candidates(
    docs: DataFrame, n_hashes: int = 32, bands: int = 8, k: int = 9
) -> DataFrame:
    """LSH banding: docs sharing any band of the signature become candidate
    near-dup pairs.  Scale path: one shuffle on (band_idx, band) — no
    all-pairs comparison anywhere.  The join key is the band VALUE slice
    (4 longs, ~32 bytes), not a 32-bit hash of it: exact on every engine
    (no cross-band hash collisions), which is what lets the DuckDB oracle
    check this operator pair-for-pair; at larger band widths a fixed-size
    digest of the slice would be the drop-in key.

    The banded table is localCheckpoint-materialized before the self-join:
    without it Catalyst evaluates the whole subtree — including the MinHash
    pandas UDF over every document — once per join side (2x the dominant
    cost).  The materialized table is narrow (doc_id + band slice per
    band), tiny next to the corpus."""
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
    )
    banded = banded.localCheckpoint(eager=True)
    pairs = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=["band_idx", "band"],
            how="inner",
        )
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return pairs


def minhash_oracle_sql(
    table: str = "documents", n_hashes: int = 32, bands: int = 8, k: int = 9
) -> str:
    """DuckDB SQL computing dedup_minhash_candidates' exact pairs: same
    non-overflowing window-hash + affine-min arithmetic (constants above),
    same band-value join.  ascii() == utf-8 byte for the ASCII test corpus
    (the same assumption the multimodal oracles already make)."""
    A, B = _minhash_family(n_hashes)
    rows_per_band = n_hashes // bands
    # explicit BIGINT casts: DuckDB would otherwise multiply INT32*INT32
    win = " + ".join(
        f"CAST(ascii(substr(text, i+{j + 1}, 1)) AS BIGINT) "
        f"* {pow(MINHASH_BASE, j, MINHASH_WMOD)}"
        for j in range(k)
    )
    sigs = ", ".join(
        f"list_min([(CAST({int(a)} AS BIGINT)*x + {int(b)}) % {MINHASH_P} "
        f"FOR x IN xs]) AS s{i}"
        for i, (a, b) in enumerate(zip(A, B))
    )
    sig_list = "[" + ", ".join(f"s{i}" for i in range(n_hashes)) + "]"
    return (
        f"WITH win AS (SELECT doc_id, "
        f"CASE WHEN length(text) >= {k} THEN "
        f"[({win}) % {MINHASH_WMOD} FOR i IN range(0, length(text) - {k - 1})] "
        f"ELSE [0] END AS xs FROM {table}), "
        f"sig AS (SELECT doc_id, {sigs} FROM win), "
        f"banded AS (SELECT doc_id, b AS band_idx, "
        f"({sig_list})[b*{rows_per_band}+1 : b*{rows_per_band}+{rows_per_band}] "
        f"AS band FROM sig, range({bands}) AS r(b)) "
        f"SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
        f"FROM banded a JOIN banded b USING (band_idx, band) "
        f"WHERE a.doc_id < b.doc_id"
    )


SIMHASH_BITS = 60  # 15 md5 hex nibbles — keeps the fingerprint a positive BIGINT
_HEX = "0123456789abcdef"


def dedup_simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """SimHash fingerprints, fully JVM-side (no Python in the hot path).

    Word hash = md5 hex (cross-engine deterministic); bit j of a word is bit
    (3 - j%4) of hex nibble j//4.  The per-bit sums are a single wide
    aggregation (one shuffle on doc_id, map-side partial agg), and the
    fingerprint sets bit j when the majority of words have it set — the
    standard SimHash majority vote (Charikar 2002).  60 bits so the result
    stays a positive int64 on every engine (DuckDB oracle included)."""
    w = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("word"),
    ).filter(F.col("word") != "")
    w = w.select("doc_id", F.md5("word").alias("h"))
    # project each of the 15 hex nibbles ONCE, then derive 4 bits from each
    # — round 2 recomputed instr(substring(...)) inside all 60 aggregate
    # expressions (~4x the codegen for identical semantics)
    n_nibs = (bits + 3) // 4
    w = w.select(
        "doc_id",
        *[
            (F.instr(F.lit(_HEX), F.substring("h", i + 1, 1)) - 1).alias(f"nib{i}")
            for i in range(n_nibs)
        ],
    )
    aggs = [F.count("*").alias("n_words")]
    for j in range(bits):
        bit = F.shiftright(F.col(f"nib{j // 4}"), 3 - j % 4).bitwiseAND(F.lit(1))
        aggs.append(F.sum(bit).alias(f"b{j}"))
    agg = w.groupBy("doc_id").agg(*aggs)
    fp = F.lit(0).cast("long")
    for j in range(bits):
        fp = fp + F.when(
            F.col(f"b{j}") * 2 > F.col("n_words"), F.lit(1 << j).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    fps = agg.select("doc_id", fp.alias("simhash"))
    # docs with no words (empty text) fingerprint to 0, keeping row parity
    return (
        docs.select("doc_id")
        .join(fps, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


def dedup_simhash_pairs(
    docs: DataFrame, bits: int = SIMHASH_BITS, bands: int = 4, max_hamming: int = 8
) -> DataFrame:
    """SimHash near-dup candidate pairs via band bucketing.

    Split each fingerprint into ``bands`` equal bit-slices; docs sharing
    any slice become candidates, then the exact Hamming distance filters
    to <= max_hamming.  RECALL CONTRACT: pairs within Hamming distance
    bands-1 are found with certainty (pigeonhole: fewer flips than bands
    leaves some band identical); pairs between bands and max_hamming are
    found only if their flips happen to spare one band — standard LSH
    candidate semantics, NOT an exhaustive <=max_hamming join (that would
    be all-pairs).  Raise ``bands`` for more recall at more shuffle
    volume.  One shuffle on (band_idx, band_val); bit_count is a JVM
    built-in, so the op is SQL-oracle-expressible (the oracle replicates
    the same candidate semantics)."""
    width = bits // bands
    fps = dedup_simhash(docs, bits)
    banded = fps.select(
        "doc_id",
        "simhash",
        # bands is a build-time constant, so the slices are literal-shift
        # expressions (shiftrightunsigned takes an int, not a Column)
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", j * width).bitwiseAND(
                        F.lit((1 << width) - 1)
                    )
                    for j in range(bands)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    # no checkpoint here (unlike dedup_minhash_candidates): the fingerprint
    # aggregation ends in an Exchange that Spark reuses across both
    # self-join sides (ReusedExchange), so materializing only adds
    # overhead — measured 3.1s vs 4.8s at sf0.1
    ham = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        banded.alias("a")
        .join(banded.alias("b"), on=["band_idx", "band_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def simhash_pairs_oracle_sql(
    table: str = "documents", bits: int = SIMHASH_BITS,
    bands: int = 4, max_hamming: int = 8,
) -> str:
    """DuckDB SQL computing the identical candidate pairs."""
    width = bits // bands
    fp_sql = simhash_oracle_sql(table, bits)
    return (
        f"WITH fp AS ({fp_sql}), "
        f"banded AS (SELECT doc_id, simhash, b AS band_idx, "
        f"(simhash >> (b * {width})) & {(1 << width) - 1} AS band_val "
        f"FROM fp, range({bands}) AS r(b)) "
        f"SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        f"CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming "
        f"FROM banded a JOIN banded b USING (band_idx, band_val) "
        f"WHERE a.doc_id < b.doc_id "
        f"AND bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}"
    )


def simhash_oracle_sql(table: str = "documents", bits: int = SIMHASH_BITS) -> str:
    """DuckDB SQL computing the identical fingerprint (shared formula)."""
    sums = ", ".join(
        f"sum(((instr('{_HEX}', substr(h, {j // 4 + 1}, 1)) - 1) "
        f">> {3 - j % 4}) & 1) AS b{j}"
        for j in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN 2 * b{j} > n_words THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )
    return (
        f"WITH w AS (SELECT doc_id, md5(word) AS h FROM ("
        f"SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS word "
        f"FROM {table}) WHERE word <> ''), "
        f"a AS (SELECT doc_id, count(*) AS n_words, {sums} FROM w GROUP BY doc_id) "
        f"SELECT d.doc_id, COALESCE(CAST({fp} AS BIGINT), 0) AS simhash "
        f"FROM {table} d LEFT JOIN a ON d.doc_id = a.doc_id"
    )


_PII_PATTERNS = [
    # order matters: emails before bare domains-ish words, IPs before numbers
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\b\+?[0-9][0-9()\-. ]{7,}[0-9]\b", "<PHONE>"),
]


def scrub_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for training text: emails, IPv4s and phone-shaped
    number runs replaced with typed placeholder tokens, plus per-doc hit
    counts for corpus auditing.  A chain of JVM regexp_replace/regexp_count
    — narrow map, no Python, no shuffle; the same regexes run verbatim in
    the DuckDB oracle."""
    # NOTE (round 6): staging this as one projection per pattern (so the
    # chained replaces are materialized rather than re-embedded in each
    # count) was A/B-measured alternating: a wash (0.40 vs 0.42 s at the
    # 10x scale) — no HOFs here, so whole-stage codegen's subexpression
    # elimination already evaluates each replace once.  Kept in the
    # original single-projection form.
    scrubbed = F.col(text_col)
    counts = []
    for name, rx, repl in _PII_PATTERNS:
        counts.append(
            F.regexp_count(scrubbed, F.lit(rx)).cast("long").alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, rx, repl)
    return docs.select("doc_id", *counts, scrubbed.alias("text_clean"))


def scrub_pii_oracle_sql(table: str = "documents") -> str:
    """DuckDB SQL computing the identical scrub (shared patterns)."""
    expr = "text"
    counts = []
    for name, rx, repl in _PII_PATTERNS:
        rx_sql = rx.replace("'", "''")
        counts.append(
            f"CAST(len(regexp_extract_all({expr}, '{rx_sql}')) AS BIGINT) "
            f"AS n_{name}"
        )
        expr = f"regexp_replace({expr}, '{rx_sql}', '{repl}', 'g')"
    return (
        f"SELECT doc_id, {', '.join(counts)}, {expr} AS text_clean "
        f"FROM {table}"
    )


# -------------------------------------------------------------- text stats

# Character-class counters via translate() instead of regexp_replace:
# deleting exactly the class's code points and subtracting lengths counts
# the SAME characters the ASCII-only regex classes matched (identical value
# on any input, unicode included), at ~3x the throughput — translate is a
# char-map pass, regexp_replace walks the NFA per char (guide §1.2 step 2:
# per-task work; measured 0.81s -> 0.26s for the three counters at the 10x
# bench scale).
_ALPHA_CHARS = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
_DIGIT_CHARS = "0123456789"
_PUNCT_CHARS = ".!?,;:"


def _n_of_class(chars: str):
    return (
        F.length("text") - F.length(F.translate(F.col("text"), chars, ""))
    ).cast("long")


def _text_stats_cols() -> list:
    return [
        F.length("text").cast("long").alias("len_chars"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_ws_tokens"),
        _n_of_class(_ALPHA_CHARS).alias("n_alpha"),
        _n_of_class(_DIGIT_CHARS).alias("n_digit"),
        _n_of_class(_PUNCT_CHARS).alias("n_punct"),
    ]


def text_stats(docs: DataFrame) -> DataFrame:
    """Quality-scoring signals, all JVM-side built-ins (integer outputs so
    the DuckDB oracle matches exactly)."""
    return docs.select("doc_id", *_text_stats_cols())


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Content fingerprint (md5 hex — portable to the SQL oracle)."""
    return docs.select("doc_id", F.md5(F.col("text")).alias("fp"))


LANG_PROBES = {
    "en": r"\b(the|and|of|to|in)\b",
    "de": r"\b(der|die|und|das|ist)\b",
    "fr": r"\b(le|la|et|les|des)\b",
    "es": r"\b(el|los|las|una|es)\b",
}


def _lang_pred_col():
    """argmax over (stopword-hit score, lang) structs — a single Column, so
    lang-id composes into one-pass projections (text_metrics)."""
    score_struct = F.array(
        *[
            F.struct(
                F.regexp_count(F.lower(F.col("text")), F.lit(rx)).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, rx in LANG_PROBES.items()
        ]
    )
    return F.array_max(score_struct).getField("lang")


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language id from stopword hits (JVM-side regexp counts).

    Not a model — a deterministic n-gram/stopword scorer suitable for
    coarse corpus splits; ties broken lexicographically."""
    return docs.select("doc_id", _lang_pred_col().alias("lang_pred"))


BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def token_count(docs: DataFrame) -> DataFrame:
    """BPE-ish token counting: alpha runs, digit runs, and punctuation runs
    each count as one token (JVM-side regexp, no Python)."""
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_ISH_PATTERN))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.size(F.split(F.col("text"), r"\s+")).cast("long").alias("n_ws_tokens"),
    )


def _quality_cols() -> list:
    n_words = F.size(F.split(F.col("text"), " "))
    stop_hits = F.regexp_count(
        F.lower(F.col("text")), F.lit(r"\b(the|a|and|of|to|in|is)\b")
    )
    n_alpha = _n_of_class(_ALPHA_CHARS)
    n_punct = _n_of_class(_PUNCT_CHARS)
    len_chars = F.length("text")
    permille = lambda num, den: F.floor(  # noqa: E731
        F.lit(1000) * num / F.greatest(den, F.lit(1))
    ).cast("long")
    return [
        permille(stop_hits, n_words).alias("stop_permille"),
        permille(n_alpha, len_chars).alias("alpha_permille"),
        permille(n_punct, len_chars).alias("punct_permille"),
        permille(len_chars - n_words + 1, n_words).alias("mean_word_len_x1000"),
    ]


def quality_score(docs: DataFrame) -> DataFrame:
    """Quality-scoring signals as exact integers (permille), so the result is
    bit-stable across engines (floats would hash-differ vs the SQL oracle).

    Signals: stopword density, mean word length, punctuation density — the
    standard cheap corpus-quality heuristics; `floor` (not round/cast) because
    its semantics agree across Spark and DuckDB."""
    return docs.select("doc_id", *_quality_cols())


def text_metrics(docs: DataFrame) -> DataFrame:
    """Every per-document text-analysis signal in ONE narrow projection:
    stats + BPE-ish token count + quality permilles + language id +
    content fingerprint.  This is the shape a production pipeline runs —
    one pass over the scan computes all signals (five separate queries
    would scan the corpus five times); the individual operators above stay
    as the composable single-signal views of the same column builders.

    NOTE (round 6): materializing shared intermediates (lower(text),
    split/translate counters) in a first projection was A/B-measured
    ALTERNATING against this form: a wash (0.86 vs 0.87 s at the 10x
    scale) — this projection contains no higher-order functions, so it
    whole-stage-codegens and codegen's subexpression elimination already
    computes each shared piece once.  Contrast gopher_quality below,
    whose HOF-bearing projections are interpreted (no CSE) and where the
    same materializations measured 35% — the rule is per-projection:
    HOFs force interpretation, interpretation re-evaluates."""
    docs = _with_min_parallelism(docs)
    return docs.select(
        "doc_id",
        *_text_stats_cols(),
        F.regexp_count(F.col("text"), F.lit(BPE_ISH_PATTERN))
        .cast("long")
        .alias("n_bpe_tokens"),
        *_quality_cols(),
        _lang_pred_col().alias("lang_pred"),
        F.md5(F.col("text")).alias("fp"),
    )


def gopher_quality(
    docs: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher/C4-style repetition + quality filters (word-level).

    The document-quality stage a training-data pipeline runs after dedup
    (public heuristics from the Gopher paper, Rae et al. 2021 §A1.1, and
    C4, Raffel et al. 2020): documents dominated by a repeated 2-gram,
    heavy word repetition, or symbol noise are cut before training.
    Line-level variants are intentionally absent — this corpus's `text`
    has no newlines, so they would be degenerate.

    Signals (exact integers — permille via floor — so the DuckDB oracle
    hashes bit-identically; same convention as quality_score):

    * ``dup_2gram_permille`` — chars covered by the most frequent word
      2-gram (count x gram length) per 1000 chars; ties on count break to
      the lexicographically LARGEST gram, so the answer is engine-unique.
    * ``word_rep_permille`` — duplicated-word fraction,
      1000 * (n_words - n_distinct_words) / n_words.
    * ``sym_word_permille`` — symbol noise, 1000 * (#'#' + #'...') / n_words.
    * ``mean_word_len_x1000`` and ``n_words`` — Gopher's length gates.
    * ``gopher_pass`` — the composite keep/cut verdict.

    100 TB shape: ZERO shuffle — the top-2-gram scan is a run-length pass
    over the per-row sorted gram array (array_sort + run starts +
    array_max), entirely
    inside whole-stage codegen, not an explode + groupBy (which would
    shuffle every 2-gram of every document).  One narrow projection over
    one scan, same as text_metrics.
    """
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    docs = _with_min_parallelism(docs)
    base = docs.select("doc_id", "text", words.alias("w")).select(
        "doc_id",
        "text",
        "w",
        F.size("w").alias("nw"),
        F.size(F.array_distinct("w")).alias("ndw"),
    )
    grams = F.when(
        F.col("nw") >= 2,
        F.expr("transform(sequence(0, nw - 2), i -> concat(w[i], ' ', w[i+1]))"),
    ).otherwise(F.expr("cast(array() as array<string>)"))
    # run-length scan over the SORTED gram list: longest run == highest
    # count.  Round 6: the stateful aggregate() fold (4-field struct
    # rebuilt per element) is replaced by run-start positions + one
    # array_max — struct comparison orders by (run, gram), so the max IS
    # "ORDER BY cnt DESC, gram DESC" (equal counts keep the larger gram),
    # exactly the old fold's tie rule; verified value-identical across the
    # corpus, and the full operator measures 1.24 -> 0.81 s (alternating
    # A/B, 10x scale — interpreted HOF steps carry only an int filter
    # predicate, not a string-holding accumulator).  The sorted
    # array and the run starts are materialized as real columns first:
    # element_at() on a non-column expression re-evaluates the whole
    # expression per element (measured 67x WORSE) — the projection
    # boundaries below are load-bearing, not style.
    with_sg = base.select(
        "doc_id", "text", "nw", "ndw", F.array_sort(grams).alias("sg")
    )
    sg = F.col("sg")
    run_starts = F.filter(
        F.sequence(F.lit(1), F.size(sg)),
        # greatest(i-1, 1): element_at is 1-based and ANSI-throws on 0; at
        # i=1 the disjunct already keeps the position
        lambda i: (i == 1)
        | (F.element_at(sg, i) != F.element_at(sg, F.greatest(i - 1, F.lit(1)))),
    )
    # guard BEFORE evaluation: sequence(1, 0) on a gram-less doc (under 2
    # words) is the DESCENDING [1, 0] and element_at(sg, 0) ANSI-throws;
    # CaseWhen evaluates only the taken branch, so empty docs never run
    # the filter at all
    run_starts = F.when(F.size(sg) >= 1, run_starts).otherwise(
        F.expr("cast(array() as array<int>)")
    )
    with_starts = with_sg.select(
        "doc_id", "text", "nw", "ndw", "sg", run_starts.alias("starts")
    )
    st = F.col("starts")
    run_ends = F.concat(
        F.slice(st, 2, F.greatest(F.size(st) - 1, F.lit(0))),
        F.array(F.size(sg) + 1),
    )
    runs = F.zip_with(
        st,
        run_ends,
        lambda s, e: F.struct(
            (e - s).cast("long").alias("run"), F.element_at(sg, s).alias("gram")
        ),
    )
    top = F.when(F.size(sg) >= 1, F.array_max(runs)).otherwise(
        F.struct(F.lit(0).cast("long").alias("run"), F.lit("").alias("gram"))
    )
    # materialize the winning struct ONCE before reading its fields:
    # interpreted projections do not share subexpressions, so reading
    # top["run"] and top["gram"] directly would evaluate the whole
    # zip_with + array_max per field (measured 2.5x slower)
    with_top = with_starts.select("doc_id", "text", "nw", "ndw", top.alias("bt"))
    scanned = with_top.select(
        "doc_id",
        "text",
        "nw",
        "ndw",
        F.col("bt.run").alias("top_gram_n"),
        F.col("bt.gram").alias("top_gram"),
    )
    len_chars = F.length("text")
    n_hash = len_chars - F.length(F.replace(F.col("text"), F.lit("#"), F.lit("")))
    n_ell = F.floor(
        (len_chars - F.length(F.replace(F.col("text"), F.lit("..."), F.lit("")))) / 3
    ).cast("long")
    nonspace = F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
    permille = lambda num, den: F.floor(  # noqa: E731 - quality_score idiom
        F.lit(1000) * num / F.greatest(den, F.lit(1))
    ).cast("long")
    dup_pm = permille(F.col("top_gram_n") * F.length("top_gram"), len_chars)
    rep_pm = permille(F.col("nw") - F.col("ndw"), F.col("nw"))
    sym_pm = permille(n_hash + n_ell, F.col("nw"))
    mwl = permille(nonspace, F.col("nw"))
    # permilles materialized before gopher_pass reads them; the whole
    # rewritten operator (HOF run-scan + these projections) measures
    # 1.24 -> 0.81 s against the round-start form, alternating A/B at
    # the 10x scale
    with_pm = scanned.select(
        "doc_id",
        F.col("nw").cast("long").alias("n_words"),
        F.col("ndw").cast("long").alias("n_distinct_words"),
        "top_gram",
        "top_gram_n",
        dup_pm.alias("dup_2gram_permille"),
        rep_pm.alias("word_rep_permille"),
        sym_pm.alias("sym_word_permille"),
        mwl.alias("mean_word_len_x1000"),
    )
    return with_pm.select(
        "*",
        (
            F.col("n_words").between(min_words, max_words)
            & F.col("mean_word_len_x1000").between(3000, 10_000)
            & (F.col("sym_word_permille") < 100)
            & (F.col("dup_2gram_permille") < 200)
            & (F.col("word_rep_permille") < 300)
        ).alias("gopher_pass"),
    )


def stratified_sample(
    docs: DataFrame,
    rates_permille: dict[str, int],
    default_permille: int = 100,
    strata_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-stratum subsampling — the corpus-mixing primitive
    of a training-data pipeline (e.g. downweight crawl, upweight code).

    A row survives iff md5-bucket(key) % 1000 < permille(stratum).  The
    bucket is the first 5 nibbles of md5(key) (content-addressed: the same
    row is kept or dropped at any parallelism, any partitioning, any rerun
    — re-sampling a grown corpus keeps the previously kept rows, so
    downstream caches stay valid).  The per-stratum rates join in via a
    BROADCAST map (same pattern as engine.with_partition_id): plan size is
    O(1) in stratum cardinality, and the filter is a narrow map — no
    shuffle anywhere.  All JVM built-ins (md5/instr/substring), so the
    DuckDB oracle reproduces it bit-for-bit."""
    spark = docs.sparkSession
    rate_df = spark.createDataFrame(
        [(str(s), int(p)) for s, p in rates_permille.items()],
        f"{strata_col} string, __permille int",
    )
    # NULL keys hash as '' (md5(NULL) would propagate NULL through the
    # bucket and the filter would silently drop the row even at rate 1000)
    h = F.md5(F.coalesce(F.col(key_col).cast("string"), F.lit("")))
    nib = lambda i: F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1  # noqa: E731
    bucket = sum((nib(i + 1) * (16**i) for i in range(5)), F.lit(0))
    return (
        docs.join(F.broadcast(rate_df), strata_col, "left")
        .filter(
            bucket % 1000
            < F.coalesce("__permille", F.lit(int(default_permille)))
        )
        .drop("__permille")
    )


def stratified_sample_oracle_sql(
    table: str,
    rates_permille: dict[str, int],
    default_permille: int = 100,
    strata_col: str = "lang",
    key_col: str = "doc_id",
    select: str = "*",
) -> str:
    """DuckDB SQL computing the identical sample (shared md5-nibble bucket)."""
    bucket = " + ".join(
        f"(instr('{_HEX}', substr(md5(COALESCE(CAST({key_col} AS VARCHAR), "
        f"'')), {i + 1}, 1)) - 1) * {16**i}"
        for i in range(5)
    )
    cases = " ".join(
        f"WHEN '{s}' THEN {int(p)}" for s, p in rates_permille.items()
    )
    return (
        f"SELECT {select} FROM {table} WHERE ({bucket}) % 1000 < "
        f"(CASE {strata_col} {cases} ELSE {int(default_permille)} END)"
    )


def remap_tokens(
    tok: DataFrame, mapping: dict[int, int], default: int | None = None
) -> DataFrame:
    """Vocabulary remap over the tokens column (tokenizer migration /
    special-token renumbering).  Unmapped ids keep identity unless
    ``default`` is given (e.g. an UNK id).

    Scale shape: a numpy lookup-table gather inside mapInArrow — one narrow
    pass, no shuffle, no join, vocab size bounded only by executor memory
    (a 1M-entry table is 8 MB).  The kernel gathers straight through the
    Arrow list buffers: values are remapped in one vectorized shot and the
    offsets are reused untouched (list structure never rebuilt per row).
    A broadcast-join alternative would shuffle every token; a map-literal
    expression would blow up the plan at real vocab sizes."""
    import pyarrow as pa
    from pyspark.sql import types as T

    # element dtype follows the input schema (array<int> vs array<bigint>);
    # a mapping target past int32 with an int32 column is a loud error, not
    # a silent wraparound
    tok_field = next(f for f in tok.schema.fields if f.name == "tokens")
    elem_spark = tok_field.dataType.elementType
    wide = isinstance(elem_spark, T.LongType)
    np_t = np.int64 if wide else np.int32
    pa_t = pa.int64() if wide else pa.int32()
    lo_t, hi_t = (-(2**63), 2**63 - 1) if wide else (-(2**31), 2**31 - 1)
    for v in list(mapping.values()) + ([default] if default is not None else []):
        if not lo_t <= int(v) <= hi_t:
            raise ValueError(
                f"mapping value {v} does not fit the tokens element type "
                f"{elem_spark.simpleString()}"
            )

    size = max(mapping, default=0) + 1
    # default=None: unmapped ids keep identity; default set: every id not
    # in the mapping becomes the default (UNK semantics)
    lut = (
        np.arange(size, dtype=np_t)
        if default is None
        else np.full(size, default, dtype=np_t)
    )
    for old, new in mapping.items():
        lut[old] = new

    fields = [
        (f.name, f.dataType) for f in tok.schema.fields
    ]
    out_schema = T.StructType(
        [T.StructField(n, d, True) for n, d in fields]
    )
    default_np = None if default is None else np_t(default)

    def gather(batches):
        import pyarrow.compute as pc

        for b in batches:
            cols = {n: b.column(i) for i, (n, _) in enumerate(fields)}
            arr = cols["tokens"]
            # flatten()/list_value_length respect slicing; rebuilding the
            # offsets from lengths keeps the kernel correct for any batch
            # layout (unlike reusing .offsets, which is absolute-indexed)
            flat = arr.flatten().to_numpy(zero_copy_only=False).astype(
                np_t, copy=False
            )
            lens_arr = pc.list_value_length(arr)
            # null lists: length comes back null — treat as 0 for the
            # offsets and re-attach validity so NULL rows stay NULL
            # (instead of cumsum-ing NaN into negative offsets)
            null_mask = None
            if arr.null_count:
                null_mask = pc.is_null(arr).to_numpy(zero_copy_only=False)
                lens_arr = pc.fill_null(lens_arr, 0)
            lens = lens_arr.to_numpy(zero_copy_only=False)
            offsets = np.zeros(len(lens) + 1, dtype=np.int64)
            np.cumsum(lens, out=offsets[1:])
            if offsets[-1] >= 2**31:
                # the int32 Arrow offsets below would wrap silently into
                # corrupt lists — same loud guard as the engine decoders
                raise ValueError(
                    "token batch exceeds int32 list-offset range; "
                    "lower spark.sql.execution.arrow.maxRecordsPerBatch"
                )
            in_table = (flat >= 0) & (flat < size)
            fallback = flat if default_np is None else default_np
            out = np.where(
                in_table, lut[np.clip(flat, 0, size - 1)], fallback
            )
            cols["tokens"] = pa.ListArray.from_arrays(
                pa.array(offsets.astype(np.int32), type=pa.int32()),
                pa.array(out, type=pa_t),
                mask=(
                    pa.array(null_mask) if null_mask is not None else None
                ),
            )
            yield pa.RecordBatch.from_arrays(
                [cols[n] for n, _ in fields], names=[n for n, _ in fields]
            )

    return tok.mapInArrow(gather, schema=out_schema)


def ngram_jaccard_pairs(
    docs: DataFrame, n: int = 3, min_permille: int = 200, max_df: int = 200
) -> DataFrame:
    """Exact word-n-gram Jaccard near-dup pairs.

    Scale shape: explode distinct n-grams, drop stop-grams with document
    frequency > max_df (they only produce candidate pairs that full Jaccard
    would reject anyway, and at 100 TB they are the quadratic blowup), then
    one shuffle on the gram key; intersection counts come from the gram
    self-join, never an all-pairs comparison.  Jaccard reported as an exact
    integer permille (floor), matching the SQL oracle bit-for-bit."""
    words = F.split(F.col("text"), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, n)),
        )
    )
    g = docs.select("doc_id", F.explode(grams).alias("gram")).filter(
        F.length("gram") > 0
    )
    # materialize the exploded gram table once: it feeds the df-cap
    # aggregate AND both self-join sides AND the per-doc sizes — without
    # this Catalyst re-runs the text shingling for every consumer
    g = g.localCheckpoint(eager=True)
    g = g.join(
        g.groupBy("gram").agg(F.count("*").alias("df")).filter(F.col("df") <= max_df),
        "gram",
    ).select("doc_id", "gram")
    g = g.localCheckpoint(eager=True)
    sizes = g.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    inter = (
        g.alias("a")
        .join(g.alias("b"), "gram")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("nb"))
    jac = F.floor(
        F.lit(1000) * F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter"))
    ).cast("long")
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard_permille"))
        .filter(F.col("jaccard_permille") >= min_permille)
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


def _quantize_expr():
    """THE quantization formula (floor(x*1000) exact ints) as a Column —
    single owner shared by the exact near-dup baseline, both LSH ops, the
    Python query-vector twin below, and _QUANT_SQL in the oracles; all
    five must stay bit-identical for the oracle checks to hold."""
    return F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("long")
    )


def _quantize_np(vec) -> np.ndarray:
    """Python twin of _quantize_expr for driver-side query vectors."""
    return np.floor(np.asarray(vec, dtype=np.float64) * 1000).astype(np.int64)


def _quantized_with_norm(emb: DataFrame, *extra_cols):
    """Embedding quantized to exact integers (floor(x*1000)) + its integer
    self-dot.  Exact-integer cosine makes the result bit-stable across
    engines: dot and norms are exact bigints (well under 2^52), and
    dot/sqrt(na*nb) is then the same IEEE double everywhere.

    ``extra_cols``: additional Column expressions projected in the SAME
    single pass (e.g. an LSH bucket) — this helper is the one owner of the
    quantization formula the exact/LSH near-dup pair must share."""
    q = _quantize_expr()
    selfdot = F.aggregate(
        F.transform(q, lambda v: v * v), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return emb.select("vec_id", q.alias("q"), selfdot.alias("nq"), *extra_cols)


def embedding_near_dup(emb: DataFrame, min_cosine: float = 0.8) -> DataFrame:
    """Exact embedding-cosine near-dup pairs (correctness baseline).

    All-pairs over quantized integer vectors; suitable as the verification
    baseline at test scale.  The scale path is embedding_near_dup_lsh below —
    same quantized cosine, but candidates come from LSH buckets instead of
    the quadratic self-join."""
    qa = _quantized_with_norm(emb).alias("a")
    qb = _quantized_with_norm(emb).alias("b")
    dot = F.aggregate(
        F.zip_with("a.q", "b.q", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cos = dot / F.sqrt((F.col("a.nq") * F.col("b.nq")).cast("double"))
    return (
        qa.join(qb, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.floor(cos * 10000).cast("long").alias("cosine_x10k"),
        )
        .filter(F.col("cosine_x10k") >= int(min_cosine * 10000))
    )


def _rademacher_planes(n_planes: int, dim: int, seed: int) -> np.ndarray:
    """Deterministic ±1 (Rademacher) hyperplanes.  Sign-random-projection
    LSH with ternary planes keeps the bucket computation in EXACT integer
    arithmetic over the quantized vectors — same bucket on every engine,
    which is what makes the LSH ops below SQL-oracle-checkable (a Gaussian
    plane would put an FP dot-product sign on the bucket boundary)."""
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2, (n_planes, dim), dtype=np.int64) * 2 - 1


def _bucket_expr(qcol, planes: np.ndarray):
    """JVM-side LSH bucket over a quantized int vector column: bit j is
    sign(dot(q, plane_j)) — built-ins only, no Python in the pass."""
    b = F.lit(0)
    for j, row in enumerate(planes):
        lit = F.array(*[F.lit(int(v)) for v in row])
        dot = F.aggregate(
            F.zip_with(qcol, lit, lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        b = b + F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return b.cast("int")


def _bucket_sql(qexpr: str, planes: np.ndarray) -> str:
    """DuckDB twin of _bucket_expr (identical integer arithmetic)."""
    terms = []
    for j, row in enumerate(planes):
        arr = "[" + ", ".join(str(int(v)) for v in row) + "]"
        terms.append(
            f"(CASE WHEN list_dot_product({qexpr}, {arr}) >= 0 "
            f"THEN {1 << j} ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


_QUANT_SQL = "[CAST(floor(CAST(x AS DOUBLE)*1000) AS BIGINT) FOR x IN embedding]"


def embedding_near_dup_lsh(
    emb: DataFrame, min_cosine: float = 0.8, n_planes: int = 8
) -> DataFrame:
    """Scale path for near-dup: sign-random-projection LSH buckets the
    vectors (one shuffle on the bucket key), all-pairs only within
    buckets.  Ternary (±1) planes over the quantized ints keep the bucket
    exact-integer — fully JVM-side AND reproducible in SQL, so this scale
    path is oracle-checked pair-for-pair (recall vs the exact baseline
    remains probabilistic, as LSH inherently is)."""
    first = emb.select(F.size("embedding").alias("d")).first()
    dim = int(first["d"]) if first else 0
    planes = _rademacher_planes(n_planes, dim, seed=7)

    # bucket + quantized vector + self-dot in ONE projection — no join to
    # re-attach buckets (one narrow pass over the scan, then the bucket
    # self-join is the only shuffle); quantization shared with the exact
    # baseline via _quantized_with_norm
    q = _quantize_expr()
    qa = _quantized_with_norm(
        emb, _bucket_expr(q, planes).alias("bucket")
    ).alias("a")
    qb = qa.alias("b")
    dot = F.aggregate(
        F.zip_with("a.q", "b.q", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    cos = dot / F.sqrt((F.col("a.nq") * F.col("b.nq")).cast("double"))
    return (
        qa.join(
            qb,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.floor(cos * 10000).cast("long").alias("cosine_x10k"),
        )
        .filter(F.col("cosine_x10k") >= int(min_cosine * 10000))
    )


def near_dup_lsh_oracle_sql(
    table: str = "embeddings",
    min_cosine: float = 0.8,
    n_planes: int = 8,
    dim: int = 64,
) -> str:
    """DuckDB SQL computing embedding_near_dup_lsh's exact result (shared
    planes, shared quantization, shared integer bucket)."""
    planes = _rademacher_planes(n_planes, dim, seed=7)
    thresh = int(min_cosine * 10000)
    return (
        f"WITH q AS (SELECT vec_id, {_QUANT_SQL} AS q FROM {table}), "
        f"n AS (SELECT vec_id, q, CAST(list_dot_product(q, q) AS BIGINT) AS nq, "
        f"{_bucket_sql('q', planes)} AS bucket FROM q) "
        f"SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
        f"floor(10000 * list_dot_product(a.q, b.q) "
        f"/ sqrt(CAST(a.nq * b.nq AS DOUBLE)))::BIGINT AS cosine_x10k "
        f"FROM n a JOIN n b ON a.bucket = b.bucket AND a.vec_id < b.vec_id "
        f"WHERE floor(10000 * list_dot_product(a.q, b.q) "
        f"/ sqrt(CAST(a.nq * b.nq AS DOUBLE))) >= {thresh}"
    )


def ann_lsh_oracle_sql(
    table: str = "embeddings", k: int = 10, n_planes: int = 8, dim: int = 64
) -> str:
    """DuckDB SQL computing ann_lsh_bucketed_topk's exact result for the
    deterministic ORDER-BY-vec_id-LIMIT-1 query vector: same quantized
    integer buckets, same Hamming<=1 probe set, same cosine top-k order
    as the ann_cosine_topk oracle."""
    planes = _rademacher_planes(n_planes, dim, seed=42)
    return (
        f"WITH qv AS (SELECT embedding AS v, {_QUANT_SQL} AS q "
        f"FROM {table} ORDER BY vec_id LIMIT 1), "
        f"b AS (SELECT vec_id, embedding, "
        f"{_bucket_sql(_QUANT_SQL, planes)} AS bucket FROM {table}), "
        f"qb AS (SELECT {_bucket_sql('q', planes)} AS bucket FROM qv) "
        f"SELECT b.vec_id FROM b, qb, qv "
        f"WHERE bit_count(xor(b.bucket::BIGINT, qb.bucket::BIGINT)) <= 1 "
        f"ORDER BY list_cosine_similarity(b.embedding, qv.v) DESC, b.vec_id "
        f"LIMIT {k}"
    )


def kmeans_matrix(
    X: np.ndarray, n_clusters: int = 16, iters: int = 8
) -> np.ndarray:
    """Deterministic numpy Lloyd k-means (seeded init, fixed iterations) —
    shared by the Spark trainer and the oracle generator so both derive the
    exact same centroids from the same sample matrix."""
    rng = np.random.default_rng(13)
    centroids = X[rng.choice(len(X), size=min(n_clusters, len(X)), replace=False)]
    for _ in range(iters):
        d2 = ((X[:, None, :] - centroids[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(centroids)):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
    return centroids


def train_ivf_centroids(
    emb: DataFrame, n_clusters: int = 16, sample: int = 2048, iters: int = 8
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: numpy Lloyd k-means on a pinned
    sample (first `sample` vectors by vec_id).

    The sample is metadata-sized at any table scale (2k vectors, not 2k per
    partition), so the driver-side collect is constant-cost at 100 TB; the
    expensive parts — assignment and search — stay distributed.  Seeded
    init + fixed iteration count => bit-reproducible centroids, which is
    what makes the operator testable against an independent re-derivation."""
    rows = emb.orderBy("vec_id").limit(sample).select("embedding").collect()
    X = np.asarray([list(r["embedding"]) for r in rows], dtype=np.float64)
    return kmeans_matrix(X, n_clusters, iters)


def quantize_centroids(centroids: np.ndarray) -> np.ndarray:
    """Centroids on the same floor(x*1000) integer grid as the vectors
    (_quantize_expr).  Assignment then happens in EXACT int64 arithmetic —
    the same cluster id on every engine, every BLAS, every summation order
    — which is what makes the IVF operator SQL-oracle-checkable (float
    distance argmins flip on near-ties between engines)."""
    return np.floor(centroids * 1000).astype(np.int64)


def _ivf_assign_udf(cq: np.ndarray):
    """Arrow-batched assignment against integer-grid centroids ``cq``."""

    @pandas_udf(T.IntegerType())
    def assign(embs: pd.Series) -> pd.Series:
        mat = np.stack(embs.to_numpy()).astype(np.float64)
        xq = np.floor(mat * 1000).astype(np.int64)
        out = np.empty(len(xq), dtype=np.int32)
        # exact integer (x - c)^2, chunked for bounded temp memory;
        # argmin ties break to the lowest cluster id (numpy first-hit)
        step = 4096
        for s in range(0, len(xq), step):
            d2 = ((xq[s : s + step, None, :] - cq[None, :, :]) ** 2).sum(axis=2)
            out[s : s + step] = d2.argmin(axis=1)
        return pd.Series(out)

    return assign


def ivf_probes(cq: np.ndarray, query_vec: list[float], n_probe: int) -> list[int]:
    """The n_probe clusters nearest the query on the integer grid (exact
    int64 distances, stable order) — shared with the oracle generator."""
    qint = _quantize_np(query_vec)
    d2 = ((cq - qint[None, :]) ** 2).sum(axis=1)
    return [int(c) for c in np.argsort(d2, kind="stable")[:n_probe]]


def ann_ivf_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF ANN: coarse-quantize vectors to their nearest centroid, search
    only the `n_probe` clusters nearest the query (the inverted-file
    pattern of FAISS-style IVF indexes, public literature: Jegou et al.,
    "Product Quantization for Nearest Neighbor Search", 2011 — here with
    exact residual scoring instead of PQ codes).  Assignment runs on the
    floor(x*1000) integer grid (see quantize_centroids) so the cluster ids
    are engine-independent exact values.

    Scale shape: assignment is a narrow Arrow-batched pass over the scan
    (no shuffle); the probe filter prunes ~(1 - n_probe/n_clusters) of all
    rows BEFORE the exact cosine scoring; final top-k is TakeOrdered.  At
    a real deployment the assignment is precomputed once per table into a
    `cluster` column — pass centroids in to reuse a trained quantizer."""
    if centroids is None:
        centroids = train_ivf_centroids(emb, n_clusters)
    cq = quantize_centroids(np.asarray(centroids, dtype=np.float64))
    probes = ivf_probes(cq, query_vec, n_probe)
    assign = _ivf_assign_udf(cq)
    candidates = emb.withColumn("cluster", assign(F.col("embedding"))).filter(
        F.col("cluster").isin(probes)
    )
    return ann_brute_force_topk(candidates, query_vec, k)


def ann_ivf_oracle_sql(
    parquet_path: str,
    table: str = "embeddings",
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    sample: int = 2048,
) -> str:
    """DuckDB SQL computing ann_ivf_topk's exact result for the
    deterministic ORDER-BY-vec_id-LIMIT-1 query vector.

    The seeded k-means centroids are re-derived here from the same pinned
    sample (read via pyarrow from ``parquet_path`` — the exact float32
    values Spark collects), quantized to the integer grid, and inlined as
    literals; per-row assignment is then argmin over exact integer
    distances d2_c = <xq,xq> - 2<xq,c> + <c,c> (every term an integer well
    below 2^52, so DOUBLE list_dot_product is exact)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=["vec_id", "embedding"])
    tbl = tbl.sort_by("vec_id")
    rows = tbl.column("embedding").slice(0, sample).to_pylist()
    X = np.asarray(rows, dtype=np.float64)
    cq = quantize_centroids(kmeans_matrix(X, n_clusters))
    qvec = [float(x) for x in tbl.column("embedding")[0].as_py()]
    probes = ivf_probes(cq, qvec, n_probe)
    d2s = ", ".join(
        f"nq - 2*list_dot_product(xq, {list(map(int, c))}) + {int(c @ c)}"
        for c in cq
    )
    probe_list = ", ".join(str(p) for p in probes)
    return (
        f"WITH q AS (SELECT vec_id, embedding, {_QUANT_SQL} AS xq "
        f"FROM {table}), "
        f"n AS (SELECT vec_id, embedding, xq, "
        f"CAST(list_dot_product(xq, xq) AS BIGINT) AS nq FROM q), "
        f"a AS (SELECT vec_id, embedding, "
        f"list_indexof([{d2s}], list_min([{d2s}])) - 1 AS cluster FROM n), "
        f"qv AS (SELECT embedding AS v FROM {table} ORDER BY vec_id LIMIT 1) "
        f"SELECT a.vec_id FROM a, qv WHERE a.cluster IN ({probe_list}) "
        f"ORDER BY list_cosine_similarity(a.embedding, qv.v) DESC, a.vec_id "
        f"LIMIT {k}"
    )


def ann_index_write(
    emb: DataFrame, path: str, n_planes: int = 8
) -> None:
    """Materialize the LSH index: one pass computes each vector's bucket
    (exact-integer ternary planes, seed 42 — the same family
    ann_lsh_bucketed_topk uses) and writes the table PARTITIONED BY bucket.

    This is the persisted-index half of the ANN story: the one-shot
    operators recompute buckets per query (full-scan assignment pass);
    repeated queries against a stored index skip that entirely — the
    bucket partition column turns the probe set into PartitionFilters, so
    non-probed buckets are never even listed, let alone read (asserted on
    the physical plan in tests/test_pipeline_extras.py).
    ann_ivf_index_write below is the same pattern for the IVF family."""
    first = emb.select(F.size("embedding").alias("d")).first()
    dim = int(first["d"]) if first else 0
    planes = _rademacher_planes(n_planes, dim, seed=42)
    q = _quantize_expr()
    emb.withColumn("bucket", _bucket_expr(q, planes)).write.mode(
        "overwrite"
    ).partitionBy("bucket").parquet(path)


def ann_ivf_index_write(
    emb: DataFrame,
    path: str,
    n_clusters: int = 16,
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Materialize the IVF index (the twin ann_index_write's docstring
    promises): assign every vector to its integer-grid cluster ONCE and
    write the table PARTITIONED BY cluster.  Returns the (quantized)
    centroid matrix — the query-time half needs only this tiny array, not
    the table.  Repeated queries then prune to the probed clusters via
    PartitionFilters: non-probed clusters are never listed, let alone
    scanned or assigned."""
    if centroids is None:
        centroids = train_ivf_centroids(emb, n_clusters)
    cq = quantize_centroids(np.asarray(centroids, dtype=np.float64))
    assign = _ivf_assign_udf(cq)
    emb.withColumn("cluster", assign(F.col("embedding"))).write.mode(
        "overwrite"
    ).partitionBy("cluster").parquet(path)
    return cq


def ann_ivf_topk_indexed(
    spark,
    path: str,
    cq: np.ndarray,
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k against a persisted ann_ivf_index_write index: the probe set
    comes from the centroid matrix alone (driver-side, exact int64), and
    the scan prunes to those cluster partitions — no assignment UDF over
    the table, no full scan, zero Python in the plan."""
    probes = ivf_probes(cq, query_vec, n_probe)
    idx = spark.read.parquet(path)
    candidates = idx.filter(F.col("cluster").isin(probes)).drop("cluster")
    return ann_brute_force_topk(candidates, query_vec, k)


def ann_lsh_topk_indexed(
    spark, path: str, query_vec: list[float], k: int = 10, n_planes: int = 8
) -> DataFrame:
    """Top-k against a persisted ann_index_write index: the probe set
    (query bucket + Hamming<=1 neighbors) is computed driver-side from the
    query vector alone, and the scan prunes to those partitions — no
    bucket UDF/expression over the table, no full scan."""
    planes = _rademacher_planes(n_planes, len(query_vec), seed=42)
    qint = _quantize_np(query_vec)
    q_bucket = int(
        (((planes @ qint) >= 0).astype(np.int64) << np.arange(n_planes)).sum()
    )
    wanted = [q_bucket] + [q_bucket ^ (1 << i) for i in range(n_planes)]
    idx = spark.read.parquet(path)
    candidates = idx.filter(F.col("bucket").isin(wanted)).drop("bucket")
    return ann_brute_force_topk(candidates, query_vec, k)


def ann_lsh_bucketed_topk(
    emb: DataFrame, query_vec: list[float], k: int = 10, n_planes: int = 8
) -> DataFrame:
    """Scale path: sign-random-projection LSH bucketing (exact-integer
    ternary planes over the quantized vectors — fully JVM-side), then
    brute force only inside the query's bucket and its 1-bit-flip
    neighbors (Hamming <= 1 on the bucket id)."""
    dim = len(query_vec)
    planes = _rademacher_planes(n_planes, dim, seed=42)

    # quantize the query EXACTLY like the rows (floor(x*1000) ints) so its
    # bucket is computed in the same integer arithmetic
    qint = _quantize_np(query_vec)
    q_bucket = int(
        (((planes @ qint) >= 0).astype(np.int64) << np.arange(n_planes)).sum()
    )
    qcol = _quantize_expr()
    candidates = emb.withColumn("bucket", _bucket_expr(qcol, planes)).filter(
        F.bit_count(
            F.col("bucket").cast("long").bitwiseXOR(F.lit(q_bucket).cast("long"))
        )
        <= 1
    )
    return ann_brute_force_topk(candidates.drop("bucket"), query_vec, k)
