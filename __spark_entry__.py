"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` — flagship: encode the documents table through the codec
engine (auto-selected per-column codecs) and decode it back; returns the
bit-identical round-tripped table.

`queries()` — one entry per implemented operator (SURVEY.md §2 + pipeline
ops); `oracle_sql()` — DuckDB-equivalent SQL for the driver's correctness
cross-check.  Aliases match on both sides (driver hashes columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


_SESSION_TMPDIRS: list[str] = []


def _session_tmpdir(prefix: str) -> str:
    """Temp dir that lives until process exit (cleaned by atexit), so a
    returned lazy DataFrame can keep reading its files when the driver
    collects later.  This replaces round-2's
    spark.createDataFrame(df.collect(), ...) wrappers — at a larger sf the
    driver-side materialization, not the operator, became the bottleneck."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    if not _SESSION_TMPDIRS:
        atexit.register(
            lambda: [shutil.rmtree(p, ignore_errors=True) for p in _SESSION_TMPDIRS]
        )
    _SESSION_TMPDIRS.append(d)
    return d


# --------------------------------------------------------------- flagship

def entry(spark: SparkSession) -> DataFrame:
    """Encode + decode the sf0.001 documents table through the engine."""
    return _rt_documents_auto(spark, "/root/testdata/sf0.001")


# ----------------------------------------------------- engine round-trips

def _rt_documents_auto(spark, sf_dir):
    from parquet_python_spark.operators.generic_codec import roundtrip

    docs = _t(spark, sf_dir, "documents")
    return roundtrip(
        docs,
        "doc_id",
        {"doc_id": "int", "text": "str", "lang": "str", "source": "str", "n_chars": "int"},
    )


def _rt_documents_fsst(spark, sf_dir):
    from parquet_python_spark.operators.generic_codec import roundtrip

    docs = _t(spark, sf_dir, "documents")
    return roundtrip(
        docs, "doc_id", {"doc_id": "int", "text": "str"},
        forced_codecs={"text": "str_fsst"},
    )


def _rt_lineitem_ints(spark, sf_dir):
    from parquet_python_spark.operators.generic_codec import roundtrip

    li = _t(spark, sf_dir, "lineitem")
    return roundtrip(
        li,
        "l_orderkey",
        {
            "l_orderkey": "int",
            "l_partkey": "int",
            "l_suppkey": "int",
            "l_linenumber": "int",
        },
    )


def _rt_orders_multi(spark, sf_dir):
    """One round-trip covering the orders-table codec family (merged from
    round-2's rt_orders_dict + rt_orders_bool + rt_orders_int96, to fit the
    driver's 50-query budget without losing any operator's oracle row):
    D15/D16 dictionary (o_orderstatus/o_orderpriority, forced), D1 PLAIN
    boolean (is_big), D17 null weave over a boolean (is_huge_n), and D4
    PLAIN int96 Impala-layout timestamps (ts_millis)."""
    from parquet_python_spark.operators.generic_codec import roundtrip

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        "o_orderpriority",
        (F.col("o_totalprice") > 150000).alias("is_big"),
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(None))
        .otherwise(F.col("o_totalprice") > 200000)
        .alias("is_huge_n"),
        (
            F.unix_date(F.col("o_orderdate").cast("date")).cast("long") * 86400000
            + F.col("o_orderkey") % 86400000
        ).alias("ts_millis"),
    )
    return roundtrip(
        orders,
        "o_orderkey",
        {
            "o_orderkey": "int",
            "o_orderstatus": "str",
            "o_orderpriority": "str",
            "is_big": "bool",
            "is_huge_n": "bool",
            "ts_millis": "int96_ts",
        },
        forced_codecs={"o_orderstatus": "dict", "o_orderpriority": "dict"},
    )


def _rt_part_codecs(spark, sf_dir):
    """One round-trip covering the part-table codec family (merged from
    round-2's rt_part_for + rt_part_flba): frame-of-reference on the int
    columns (forced), D7 FIXED_LEN_BYTE_ARRAY on a 16-byte md5 digest
    column, DELTA_LENGTH_BYTE_ARRAY (Parquet string wire: lengths as
    DELTA_BINARY_PACKED + concatenated bytes) forced on p_brand, and —
    round 4 — DELTA_BYTE_ARRAY (prefix-compressed string wire, codecs/
    dba.py) forced on p_type; digest returned as hex so the driver
    canonicalizer hashes strings."""
    from parquet_python_spark.operators.generic_codec import roundtrip

    part = _t(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        "p_brand",
        "p_type",
        F.unhex(F.md5(F.col("p_partkey").cast("string"))).alias("digest"),
    )
    rt = roundtrip(
        part,
        "p_partkey",
        {
            "p_partkey": "int",
            "p_size": "int",
            "p_brand": "str",
            "p_type": "str",
            "digest": "flba",
        },
        forced_codecs={
            "p_partkey": "for",
            "p_size": "for",
            "p_brand": "str_dlba",
            "p_type": "str_dba",
        },
    )
    return rt.select(
        "p_partkey", "p_size", "p_brand", "p_type",
        F.lower(F.hex("digest")).alias("digest_hex"),
    )


def _rt_delta_sorted(spark, sf_dir):
    """DELTA_BINARY_PACKED wire codec (Parquet format enum
    parquet.thrift:297-300 — implemented by neither the reference nor
    round 2) on a per-partition-monotone key: encode_df sorts each
    partition by the key, so o_orderkey deltas are narrow and delta_bp is
    the natural winner (the selector picks it unforced on monotone chunks
    — asserted in tests/test_new_codecs.py; forced here so the oracle row
    pins THIS codec, not the selector's choice)."""
    from parquet_python_spark.operators.generic_codec import roundtrip

    orders = _t(spark, sf_dir, "orders")
    return roundtrip(
        orders,
        "o_orderkey",
        {"o_orderkey": "int", "o_custkey": "int"},
        forced_codecs={"o_orderkey": "delta_bp"},
    )


def _rt_events_dict(spark, sf_dir):
    from parquet_python_spark.operators.generic_codec import roundtrip

    ev = _t(spark, sf_dir, "events")
    return roundtrip(
        ev,
        "event_id",
        {"event_id": "int", "user_id": "int", "event_type": "str"},
        forced_codecs={"event_type": "dict"},
    )


def _rt_embeddings_plain(spark, sf_dir):
    # f32-list round-trip (D18 repetition levels / Arrow list offsets).
    # Output is exploded to scalar rows — the driver's canonicalizer can't
    # hash array columns; every decoded element is still compared.
    from parquet_python_spark.operators.generic_codec import roundtrip

    emb = _t(spark, sf_dir, "embeddings")
    rt = roundtrip(
        emb, "vec_id", {"vec_id": "int", "embedding": "f32_list", "label": "int"}
    )
    return rt.select(
        "vec_id", "label", F.posexplode("embedding").alias("idx", "val")
    ).select(
        "vec_id",
        "label",
        F.col("idx").cast("long").alias("idx"),
        F.col("val").cast("double").alias("val"),
    )


def _rt_customer_doubles(spark, sf_dir):
    """D5 PLAIN doubles + BYTE_STREAM_SPLIT (Parquet's float encoding,
    format Encodings.md BYTE_STREAM_SPLIT; neither the reference nor
    round 2 wire it): c_acctbal forced through bss so the driver row pins
    the byte-k-stream transpose round-trip bit-identically."""
    from parquet_python_spark.operators.generic_codec import roundtrip

    cust = _t(spark, sf_dir, "customer")
    return roundtrip(
        cust, "c_custkey", {"c_custkey": "int", "c_acctbal": "float64"},
        forced_codecs={"c_acctbal": "bss"},
    )


def _rt_region_nation_supplier(spark, sf_dir):
    # remaining fixture tables, unioned: full 10-table round-trip coverage
    from parquet_python_spark.operators.generic_codec import roundtrip

    region = roundtrip(
        _t(spark, sf_dir, "region"), "r_regionkey",
        {"r_regionkey": "int", "r_name": "str"},
    ).select(F.col("r_regionkey").alias("k"), F.col("r_name").alias("name"),
             F.lit("region").alias("tbl"))
    nation = roundtrip(
        _t(spark, sf_dir, "nation"), "n_nationkey",
        {"n_nationkey": "int", "n_name": "str"},
    ).select(F.col("n_nationkey").alias("k"), F.col("n_name").alias("name"),
             F.lit("nation").alias("tbl"))
    supplier = roundtrip(
        _t(spark, sf_dir, "supplier"), "s_suppkey",
        {"s_suppkey": "int", "s_name": "str"},
    ).select(F.col("s_suppkey").alias("k"), F.col("s_name").alias("name"),
             F.lit("supplier").alias("tbl"))
    return region.unionAll(nation).unionAll(supplier)


def _rt_documents_nulls(spark, sf_dir):
    # definition-level null weave (reference __init__.py:295-317,336-338):
    # inject a deterministic null pattern, round-trip it bit-identically.
    # mode='all' forces DATA_PAGE_V2 framing + LZ4_RAW page compression
    # (both beyond the reference, which reads V1 pages only and raises on
    # lz4, __init__.py:234-236,273-378): levels stay uncompressed ahead of
    # the data section with num_rows/num_nulls in the page header.
    # mode='notnull'/'null' (round 5) exercise null-count chunk skipping:
    # per-chunk Statistics.null_count (parsed by the reference at
    # parquet.thrift:198-206, never consumed) prunes IS [NOT] NULL
    # predicates before any payload is read or decoded.
    from parquet_python_spark.operators.generic_codec import (
        roundtrip,
        roundtrip_filtered_null_modes,
    )

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit(None)).otherwise(F.col("lang")).alias("lang_n"),
        F.when(F.col("doc_id") % 11 == 0, F.lit(None)).otherwise(F.col("n_chars")).alias("chars_n"),
    )
    kinds = {"doc_id": "int", "lang_n": "str", "chars_n": "int"}
    full = roundtrip(docs, "doc_id", kinds, page="v2", outer="lz4_raw").select(
        F.lit("all").alias("mode"), "*"
    )
    # both null modes share ONE encode (blocks persisted once, pruned
    # twice with opposite null predicates)
    nul, nn = roundtrip_filtered_null_modes(docs, "doc_id", kinds, "lang_n")
    nn = nn.select(F.lit("notnull").alias("mode"), "*")
    nul = nul.select(F.lit("null").alias("mode"), "*")
    return full.unionAll(nn).unionAll(nul)


def _rt_lineitem_pruned(spark, sf_dir):
    # predicate-pruned decode, both prune paths in one driver row:
    # mode='range' — per-block min/max stats (the Statistics the reference
    # parses but never uses, parquet.thrift:198-206) skip blocks outside
    # [lo, hi] before any payload is read or decoded (range partitioning
    # makes the stats selective); mode='eq' — per-chunk Bloom filters
    # (parquet BloomFilter.md) prune a point lookup where min/max cannot.
    from parquet_python_spark.operators.generic_codec import (
        roundtrip_filtered,
        roundtrip_filtered_any,
        roundtrip_filtered_eq,
        roundtrip_filtered_multi,
    )

    li = _t(spark, sf_dir, "lineitem")
    kinds = {"l_orderkey": "int", "l_partkey": "int", "l_quantity": "float64"}
    rng = roundtrip_filtered(
        li, "l_orderkey", kinds, "l_orderkey", 1000, 3000
    ).select(F.lit("range").alias("mode"), "*")
    eq = roundtrip_filtered_eq(
        li, "l_orderkey", kinds, "l_orderkey", 1234
    ).select(F.lit("eq").alias("mode"), "*")
    # mode='multi' (round 5): conjunctive pruning — keep sets intersect
    # across predicates (chained broadcast semi joins), page ranges
    # intersect inside surviving chunks; selectivities multiply
    multi = roundtrip_filtered_multi(
        li, "l_orderkey", kinds,
        [
            ("range", "l_orderkey", 1000, 3000),
            ("range", "l_quantity", 10.0, 20.0),
            ("notnull", "l_partkey"),
        ],
    ).select(F.lit("multi").alias("mode"), "*")
    # mode='any' (round 5): disjunctive pruning — keep sets UNION (one
    # semi join), page ranges union; IN-list rides as per-value [v, v]
    any_ = roundtrip_filtered_any(
        li, "l_orderkey", kinds,
        [
            ("range", "l_orderkey", 100, 200),
            ("in", "l_orderkey", [1234, 4321]),
        ],
    ).select(F.lit("any").alias("mode"), "*")
    return rng.unionAll(eq).unionAll(multi).unionAll(any_)


def _rt_fixture_nation(spark, sf_dir):
    # the reference's own binary fixture (test-data/nation.plain.parquet,
    # the executable golden of test_read_support.py:109-204) through the
    # engine's encode->decode; oracle is nation.csv inlined as VALUES.
    from parquet_python_spark.operators.generic_codec import roundtrip

    raw = spark.read.parquet("/root/reference/test-data/nation.plain.parquet")
    k, nm, rk, cm = raw.columns  # fixture names: nation_key/name/...
    df = raw.select(
        F.col(k).alias("n_nationkey"),
        F.col(nm).cast("string").alias("n_name"),
        F.col(rk).alias("n_regionkey"),
        F.col(cm).cast("string").alias("n_comment"),
    )
    return roundtrip(
        df,
        "n_nationkey",
        {
            "n_nationkey": "int",
            "n_name": "str",
            "n_regionkey": "int",
            "n_comment": "str",
        },
        n_parts=4,
    )


_last_tokens_blocks = None


def _derived_tokens(spark, sf_dir):
    """tokens table (BASELINE input shape) derived deterministically from
    `documents` so DuckDB can reproduce every row."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.col("doc_id").cast("string").alias("doc_id"),
            (F.col("n_chars") % 240 + 16).cast("int").alias("n_tok"),
            F.col("lang").alias("source"),
            F.col("doc_id").cast("long").alias("did"),
        )
        .withColumn(
            "tokens",
            F.transform(
                F.sequence(F.lit(0), F.col("n_tok") - 1),
                lambda i: ((F.col("did") * 31 + i * 7) % 65536).cast("int"),
            ),
        )
        .select("doc_id", "tokens", "n_tok", "source")
    )


def _explode_tokens(dec):
    return dec.select(
        "doc_id",
        F.posexplode("tokens").alias("pos", "token"),
        "n_tok",
        "source",
    ).select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "token", "n_tok", "source"
    )


def _rt_tokens_pruned(spark, sf_dir):
    """Engine-path zone-map-pruned decode: a tokens table (BASELINE input
    shape, derived deterministically from `documents` so DuckDB can
    reproduce it) is range-clustered by n_tok, encoded zero-shuffle, then
    decoded through decode_blocks_pruned — blocks whose n_tok [min,max]
    stats miss [64,128] are never decoded.  Output exploded to scalar rows
    (driver canonicalizer can't hash arrays)."""
    global _last_tokens_blocks
    from pyspark import StorageLevel

    from parquet_python_spark.engine import decode_blocks_pruned, encode_table_narrow

    # clustered layout -> selective stats
    tok = _derived_tokens(spark, sf_dir).repartitionByRange(8, "n_tok")
    blocks = encode_table_narrow(tok, snapshot_id="drv").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    if _last_tokens_blocks is not None:
        try:
            _last_tokens_blocks.unpersist(blocking=False)
        except Exception:  # noqa: BLE001 - session may already be gone
            pass
    _last_tokens_blocks = blocks
    return _explode_tokens(decode_blocks_pruned(blocks, "n_tok", 64, 128))


def _rt_tokens_compacted(spark, sf_dir):
    """Engine files-mode pipeline with small-files compaction in the middle:
    tokens -> many block files -> compact_blocks bin-packs them -> shuffle-
    free decode must still see every row exactly once (a part never spans
    files, whole files concatenate).  Fresh session-lifetime temp dirs per
    run; oracle is the same derived tokens table.  The decoded result is
    written to a parquet the driver reads back lazily — executor-side I/O,
    no driver materialization (round-2's collect() wrapper would become
    the bottleneck before the operator does at a larger sf)."""
    from parquet_python_spark.engine import (
        compact_blocks,
        decode_blocks_files,
        encode_table_files,
        list_input_files,
    )

    work = _session_tmpdir("pps_cmp_")
    inp = f"{work}/inp"
    _derived_tokens(spark, sf_dir).repartition(6).write.parquet(inp)
    bdir = f"{work}/blocks"
    encode_table_files(spark, inp, snapshot_id="drv").write.parquet(bdir)
    n_before = len(list_input_files(bdir))
    compact_blocks(spark, bdir, target_bytes=1 << 30)
    assert len(list_input_files(bdir)) < n_before
    out = f"{work}/decoded"
    _explode_tokens(decode_blocks_files(spark, bdir)).write.parquet(out)
    return spark.read.parquet(out)


def _pack_windows(spark, sf_dir):
    """Sequence packing (LLM training windows): tokens concatenated in
    deterministic doc_id order, sliced into 512-token windows.  Distributed
    prefix sum for offsets, piece-level (not token-level) shuffle — see
    operators/packing.py.  Output exploded to scalar rows for the driver's
    canonicalizer."""
    from parquet_python_spark.operators.packing import pack_sequences

    packed = pack_sequences(_derived_tokens(spark, sf_dir), window=512)
    return packed.select(
        "window_id", F.posexplode("tokens").alias("pos", "token")
    ).select("window_id", F.col("pos").cast("long").alias("pos"), "token")


def _pack_spans(spark, sf_dir):
    """Document-boundary spans of the packed stream (attention-mask /
    loss-boundary metadata): (window_id, doc_id, off, len) per
    window-document overlap."""
    from parquet_python_spark.operators.packing import pack_spans

    return pack_spans(_derived_tokens(spark, sf_dir), window=512).select(
        "window_id",
        "doc_id",
        F.col("off").cast("long").alias("off"),
        F.col("len").cast("long").alias("len"),
    )


def _remap_vocab(spark, sf_dir):
    """Tokenizer-migration remap over the tokens column: numpy lookup-table
    gather through the Arrow list buffers (mapInArrow, no shuffle/join).
    Output exploded to scalar rows."""
    from parquet_python_spark.operators.pipeline_ops import remap_tokens

    tok = _derived_tokens(spark, sf_dir)
    out = remap_tokens(tok, {0: 70000, 7: 70007, 1234: 71234})
    return out.select(
        "doc_id", F.posexplode("tokens").alias("pos", "token")
    ).select("doc_id", F.col("pos").cast("long").alias("pos"), "token")


def _sink_roundtrips(spark, sf_dir):
    """S5/S6 sinks under the oracle: nation through the CSV (tab-delimited,
    reference __init__.py:510-515) and JSON-lines (__init__.py:483-496)
    sinks and back; both read-backs must reproduce the table exactly.
    Session-lifetime temp dirs, so the returned DataFrame stays lazy (no
    driver-side materialization)."""
    from parquet_python_spark.sources.sinks import write_csv, write_jsonl

    nation = _t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    work = _session_tmpdir("pps_sink_")
    write_csv(nation, f"{work}/csv")
    write_jsonl(nation, f"{work}/jsonl")
    schema = "n_nationkey int, n_name string, n_regionkey int"
    csv_back = (
        spark.read.option("sep", "\t").option("header", True)
        .schema(schema).csv(f"{work}/csv")
        .select(F.lit("csv").alias("sink"), "*")
    )
    json_back = (
        spark.read.schema(schema).json(f"{work}/jsonl")
        .select(F.lit("jsonl").alias("sink"), "*")
    )
    return csv_back.unionAll(json_back)


def _describe_nation(spark, sf_dir):
    # S4 metadata dump re-expressed as a queryable table
    from parquet_python_spark.sources.sinks import describe_table

    return describe_table(_t(spark, sf_dir, "nation"))


def _converted_all(spark, sf_dir):
    """D21 converted/logical types in one projection (merged from round-2's
    converted_types + converted_micros, and — round 4 — round-3's
    converted_bson and converted_date, for the driver's 50-query budget):
    the types the reference handles (converted_types.py:47-87 — DECIMAL,
    DATE, TIMESTAMP_MILLIS, UINT, BSON via converted_types.py:85-86:
    JSON -> BSON bytes -> parsed back) plus the ones it leaves UNHANDLED
    (converted_types.py:88-90 — TIMESTAMP_MICROS, INT_8/16, INTERVAL; the
    interval round-trips through its 12-byte FLBA wire image).

    Timestamps are returned as epoch millis/micros BIGINT (a timezone-proof
    canonical form both engines hash identically); the decimal is returned
    as DOUBLE (pandas renders Spark decimals as Decimal objects but DuckDB
    decimals as float64 — same values, hash-differing representations)."""
    from parquet_python_spark.functions.converted import (
        bson_from_json,
        bson_to_json,
        date_from_days,
        decimal_from_unscaled,
        int_8,
        int_16,
        interval_from_flba,
        interval_to_flba,
        timestamp_from_micros,
        timestamp_from_millis,
        uint32,
    )

    part = _t(spark, sf_dir, "part")
    signed = (F.col("p_partkey") % 100000 - 50000).cast("int")
    iv = interval_from_flba(
        interval_to_flba(
            F.col("p_partkey") % 120,
            F.col("p_partkey") % 31,
            F.col("p_partkey") % 86400000,
        )
    )
    return part.select(
        "p_partkey",
        decimal_from_unscaled(F.col("p_partkey"), 18, 2)
        .cast("double")
        .alias("dec_val"),
        date_from_days(F.col("p_size")).alias("date_val"),
        F.unix_millis(timestamp_from_millis(F.col("p_partkey") * 86400000)).alias(
            "ts_val"
        ),
        uint32(signed).alias("uint_val"),
        F.unix_micros(
            timestamp_from_micros(F.col("p_partkey") * 86400000000)
        ).alias("ts_us"),
        int_8(F.col("p_partkey")).cast("long").alias("i8_val"),
        int_16(F.col("p_partkey") * 7).cast("long").alias("i16_val"),
        iv["months"].alias("iv_months"),
        iv["days"].alias("iv_days"),
        iv["millis"].alias("iv_millis"),
        bson_to_json(
            bson_from_json(
                F.to_json(
                    F.struct(
                        F.col("p_partkey").alias("k"), F.col("p_size").alias("s")
                    )
                )
            )
        ).alias("bson_json"),
    )


# ------------------------------------------------------------ pipeline ops

def _dedup_exact(spark, sf_dir):
    from parquet_python_spark.operators.pipeline_ops import dedup_exact

    return dedup_exact(_t(spark, sf_dir, "documents"))


def _text_metrics(spark, sf_dir):
    """Every text-analysis signal in ONE narrow pass (merged from round-2's
    text_stats + token_count + quality_score + lang_id + doc_fingerprint
    for the driver's 50-query budget — the underlying single-signal
    operators remain in pipeline_ops with their own pytest coverage)."""
    from parquet_python_spark.operators.pipeline_ops import text_metrics

    return text_metrics(_t(spark, sf_dir, "documents"))


def _stream_rates(spark, sf_dir):
    """Structured Streaming windowed aggregation under the driver oracle:
    a deterministic event feed derived from `documents` (ingest_ts =
    2024-01-01 + (doc_id % 120) minutes) is replayed as a bounded file
    stream through windowed_token_rates (10-minute event-time windows,
    5-minute watermark), trigger=availableNow into a memory sink; the
    DuckDB oracle is the batch twin of the same aggregation.  Complete
    output mode so every window is emitted deterministically regardless of
    where the replay's watermark ends up."""
    from parquet_python_spark.streaming.stream_encode import windowed_token_rates

    global _STREAM_RATES_SEQ
    _STREAM_RATES_SEQ += 1
    name = f"stream_rates_{_STREAM_RATES_SEQ}"
    work = _session_tmpdir("pps_stream_")
    inp = f"{work}/feed"
    docs = _t(spark, sf_dir, "documents")
    feed = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        (F.col("n_chars") % 240 + 16).cast("int").alias("n_tok"),
        F.col("lang").alias("source"),
        # timestamp built from an absolute epoch (1704067200 =
        # 2024-01-01T00:00:00Z): timestamp_seconds/unix_seconds are
        # timezone-independent instants, so the oracle's arithmetic holds
        # under ANY session timezone (a TZ-local literal would not)
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("doc_id") % 120) * 60
        ).alias("ingest_ts"),
    )
    feed.repartition(4).write.parquet(inp)
    q = (
        windowed_token_rates(spark, inp)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name).select(
        F.unix_seconds("window_start").alias("win_start_s"),
        "source",
        "n_rows",
        "n_tokens",
    )


_STREAM_RATES_SEQ = 0
_STREAM_REPLAY_SEQ = 0


def _stream_feed(spark, sf_dir, duplicate: bool = False):
    """Deterministic bounded event feed derived from `documents` (same
    construction as _stream_rates: ingest_ts = 2024-01-01 + (doc_id % 120)
    minutes, absolute-epoch timestamps so any session TZ agrees with the
    oracle).  duplicate=True unions the feed with itself — byte-identical
    twin rows — to give the streaming dedup something to drop."""
    work = _session_tmpdir("pps_stream_")
    inp = f"{work}/feed"
    docs = _t(spark, sf_dir, "documents")
    feed = docs.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        (F.col("n_chars") % 240 + 16).cast("int").alias("n_tok"),
        F.col("lang").alias("source"),
        F.timestamp_seconds(
            F.lit(1704067200) + (F.col("doc_id") % 120) * 60
        ).alias("ingest_ts"),
    )
    if duplicate:
        feed = feed.unionAll(feed)
    feed.repartition(4).write.parquet(inp)
    return inp


def _replay_available_now(stream_df, output_mode: str):
    """Run a streaming DataFrame to completion on its bounded input
    (trigger=availableNow) into a memory sink; returns the result table."""
    global _STREAM_REPLAY_SEQ
    _STREAM_REPLAY_SEQ += 1
    name = f"stream_replay_{_STREAM_REPLAY_SEQ}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


def _stream_totals(spark, sf_dir):
    """Custom stateful streaming operator under the driver oracle:
    applyInPandasWithState cumulative per-source totals
    (streaming/stream_encode.py:stateful_source_totals) replayed
    availableNow.  Update mode emits one snapshot per source per
    micro-batch; totals are cumulative (monotone), so max() over the
    snapshots is the final state regardless of how the replay batches —
    the DuckDB twin is the plain batch aggregate."""
    from parquet_python_spark.streaming.stream_encode import stateful_source_totals

    inp = _stream_feed(spark, sf_dir)
    out = _replay_available_now(stateful_source_totals(spark, inp), "update")
    return out.groupBy("source").agg(
        F.max("total_rows").alias("total_rows"),
        F.max("total_tokens").alias("total_tokens"),
    )


def _stream_dedup(spark, sf_dir):
    """Streaming exact dedup with bounded state under the driver oracle:
    dropDuplicatesWithinWatermark (streaming/stream_encode.py:
    streaming_dedup) over a feed whose every row arrives twice
    (byte-identical twins), replayed availableNow.  Exactly one of each
    twin survives; the DuckDB twin is DISTINCT over the singled feed."""
    from parquet_python_spark.streaming.stream_encode import streaming_dedup

    inp = _stream_feed(spark, sf_dir, duplicate=True)
    out = _replay_available_now(streaming_dedup(spark, inp), "append")
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("n_tok").cast("long").alias("n_tok"),
        "source",
        F.unix_seconds("ingest_ts").alias("ts_s"),
    )


def _quality_filters(spark, sf_dir):
    """Gopher/C4-style repetition + quality filters (word-level) — see
    pipeline_ops.gopher_quality.  min_words lowered to this corpus's word
    range so the pass flag actually splits the table."""
    from parquet_python_spark.operators.pipeline_ops import gopher_quality

    return gopher_quality(_t(spark, sf_dir, "documents"), min_words=20)


def _scrub_pii(spark, sf_dir):
    from parquet_python_spark.operators.pipeline_ops import scrub_pii

    return scrub_pii(_t(spark, sf_dir, "documents"))


def _ann_cosine_topk(spark, sf_dir):
    from parquet_python_spark.operators.pipeline_ops import ann_brute_force_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    return ann_brute_force_topk(emb, list(qvec), k=10).select("vec_id")


def _dedup_minhash(spark, sf_dir):
    from parquet_python_spark.operators.pipeline_ops import dedup_minhash_candidates

    return dedup_minhash_candidates(_t(spark, sf_dir, "documents"))


def _dedup_simhash(spark, sf_dir):
    """SimHash fingerprints AND band-bucketed near-dup candidate pairs in
    one driver row (merged r5 to free a slot at the 50-query cap):
    mode='sig' rows carry (doc_id, simhash), mode='pair' rows carry
    (doc_a, doc_b, hamming)."""
    from parquet_python_spark.operators.pipeline_ops import (
        dedup_simhash,
        dedup_simhash_pairs,
    )

    docs = _t(spark, sf_dir, "documents")
    sigs = dedup_simhash(docs).select(
        F.col("doc_id").alias("id_a"),
        F.col("simhash").alias("id_b"),
        F.lit(None).cast("int").alias("hamming"),
        F.lit("sig").alias("mode"),
    )
    pairs = dedup_simhash_pairs(docs, max_hamming=20).select(
        F.col("doc_a").alias("id_a"),
        F.col("doc_b").alias("id_b"),
        F.col("hamming").cast("int").alias("hamming"),
        F.lit("pair").alias("mode"),
    )
    return sigs.unionByName(pairs)


def _stratified_sample(spark, sf_dir):
    # deterministic corpus-mixing subsample: content-addressed md5 bucket,
    # per-stratum permille rates via broadcast map — no shuffle, rerun-stable
    from parquet_python_spark.operators.pipeline_ops import stratified_sample

    return stratified_sample(
        _t(spark, sf_dir, "documents"),
        {"en": 700, "de": 400},
        default_permille=150,
    ).select("doc_id", "lang")


def _ngram_jaccard(spark, sf_dir):
    from parquet_python_spark.operators.pipeline_ops import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"))


def _near_dup_embeddings(spark, sf_dir):
    """Embedding-cosine near-dup pairs, BOTH paths in one driver row
    (merged r5 to free a slot at the 50-query cap): method='exact' is the
    all-pairs correctness baseline, method='lsh' the bucketed scale path
    (same quantized cosine; candidates from sign-random-projection
    buckets)."""
    from parquet_python_spark.operators.pipeline_ops import (
        embedding_near_dup,
        embedding_near_dup_lsh,
    )

    emb = _t(spark, sf_dir, "embeddings")
    exact = embedding_near_dup(emb, min_cosine=0.35).withColumn(
        "method", F.lit("exact")
    )
    lsh = embedding_near_dup_lsh(emb, min_cosine=0.35, n_planes=4).withColumn(
        "method", F.lit("lsh")
    )
    return exact.unionByName(lsh)


def _dedup_components(spark, sf_dir):
    """Connected-components cluster dedup + canonical survivor selection
    over the REAL MinHash candidate graph: pairs -> transitive closure
    (iterative min-label propagation with pointer jumping,
    pipeline_ops.dedup_components) -> keep bit (min id per cluster,
    pass-through for unpaired docs).  The DuckDB twin computes the same
    closure with a recursive CTE, so the iterative operator is fully
    hash-oracle-checked (round-4 verdict gap #3 closed)."""
    from parquet_python_spark.operators.pipeline_ops import (
        dedup_keep_canonical,
        dedup_minhash_candidates,
    )

    docs = _t(spark, sf_dir, "documents")
    out = dedup_keep_canonical(docs, dedup_minhash_candidates(docs))
    return out.select("doc_id", "component_id", "keep")


def _stream_encode_rt(spark, sf_dir):
    """Streaming ENCODE path under the driver oracle (round-4 verdict #7):
    the derived tokens table replayed availableNow through the
    foreachBatch encode job (streaming/stream_encode.py:
    start_stream_encode; maxFilesPerTrigger=2 forces multiple
    micro-batches so the append + exactly-once path is exercised), then
    the appended blocks decode through the batch files-mode reader.  The
    decoded round-trip must be row-identical to the input — the oracle is
    the same derived-tokens SQL as rt_tokens_compacted.  Decoded result
    lands in a parquet the driver reads back lazily (executor-side I/O,
    no driver materialization)."""
    from parquet_python_spark.engine import decode_blocks_files
    from parquet_python_spark.streaming.stream_encode import start_stream_encode

    work = _session_tmpdir("pps_senc_")
    inp = f"{work}/inp"
    _derived_tokens(spark, sf_dir).repartition(6).write.parquet(inp)
    out = f"{work}/enc"
    q = start_stream_encode(
        spark, inp, out, trigger_once=True, max_files_per_trigger=2
    )
    q.awaitTermination()
    dec = f"{work}/decoded"
    _explode_tokens(decode_blocks_files(spark, f"{out}/blocks")).write.parquet(
        dec
    )
    return spark.read.parquet(dec)


def _ann_lsh_topk(spark, sf_dir):
    from parquet_python_spark.operators.pipeline_ops import ann_lsh_bucketed_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    return ann_lsh_bucketed_topk(emb, list(qvec), k=10).select("vec_id")


def _ann_ivf_topk(spark, sf_dir):
    # IVF scale path: deterministic k-means coarse quantizer, narrow
    # assignment pass, n_probe-cluster search (exact pytest oracle in
    # tests/test_pipeline_oracles.py; centroids aren't SQL-expressible)
    from parquet_python_spark.operators.pipeline_ops import ann_ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    qvec = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    return ann_ivf_topk(emb, list(qvec), k=10).select("vec_id")


def _multimodal_meta(spark, sf_dir):
    from parquet_python_spark.operators.multimodal import media_meta, with_media_column

    return media_meta(with_media_column(_t(spark, sf_dir, "documents")))


def _multimodal_features(spark, sf_dir):
    # exploded to (doc_id, bucket_idx, value) scalar rows for the driver's
    # canonicalizer; the deterministic fake extractor (byte histogram over
    # the payload) is reproduced by the DuckDB oracle in SQL.
    from parquet_python_spark.operators.multimodal import (
        extract_features,
        with_media_column,
    )

    feats = extract_features(with_media_column(_t(spark, sf_dir, "documents")))
    return feats.select(
        "doc_id", F.posexplode("features").alias("bucket_idx", "value")
    ).select("doc_id", F.col("bucket_idx").cast("long").alias("bucket_idx"), "value")


# --------------------------------------------------- relational coverage

def _multimodal_frames(spark, sf_dir):
    # frame sampling over opaque blobs (fixed-stride byte windows); frames
    # decoded back to strings for the canonicalizer (documents text is
    # ASCII, so utf-8 slices at any offset are valid strings)
    from parquet_python_spark.operators.multimodal import (
        frame_sample,
        with_media_column,
    )

    frames = frame_sample(with_media_column(_t(spark, sf_dir, "documents")))
    return frames.select(
        "doc_id",
        F.col("frame_idx").cast("long").alias("frame_idx"),
        F.decode("frame_bytes", "utf-8").alias("frame_str"),
    )


def _scan_project_limit(spark, sf_dir):
    """SURVEY.md P1 + P2 in one row (merged in round 4 for the 50-query
    budget): column-pruning pushdown — Catalyst prunes the orders scan to
    the three referenced columns (plan-audited ReadSchema in
    BENCH/PLANS.md) — plus the row limit, made deterministic via total
    ordering (TakeOrderedAndProject, also plan-audited)."""
    return (
        _t(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_custkey")
    )


def _agg_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "n_rows", "sum_qty")
    )


def _agg_rollup_pricing(spark, sf_dir):
    # grouping sets / rollup (absent in the reference, SURVEY.md §2.4):
    # subtotals per (returnflag, linestatus), per returnflag, and grand
    # total in one pass.  NULL grouping slots are coalesced to 'ALL' on
    # both sides (the driver's canonicalizer can't sort None against str).
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "n_rows",
            "sum_qty",
        )
    )


def _join_customer_nation(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    nation = _t(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_customers"))
        .select(F.col("n_name").alias("nation"), "n_customers")
    )


def _join_semi_anti(spark, sf_dir):
    # semi + anti joins (SURVEY §2.4 join family): customers with at least
    # one order vs customers with none, in one labeled result.  Both sides
    # broadcast the build set; no row duplication (semi/anti never
    # multiply rows, unlike inner-join-then-distinct).
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    orders = _t(spark, sf_dir, "orders").select("o_custkey")
    with_orders = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", F.lit("has_orders").alias("status"))
    without = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", F.lit("no_orders").alias("status"))
    return with_orders.unionAll(without)


def _window_top_orders(spark, sf_dir):
    # window functions (absent in the reference, SURVEY.md §2.4): top-2
    # orders per customer by price, deterministic tie-break on key
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", F.col("rn").cast("long").alias("rn"))
    )


def _setop_active_buyers(spark, sf_dir):
    # set operations (absent in the reference): users with purchase events
    # INTERSECT users with click events, minus users with error events
    ev = _t(spark, sf_dir, "events")

    def users(etype):
        return ev.filter(F.col("event_type") == etype).select("user_id")

    kinds = [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    kinds = sorted(kinds)
    a, b = kinds[0], kinds[-1]
    return (
        users(a).intersect(users(b)).sort("user_id").select("user_id")
    )


def _asof_click_view(spark, sf_dir):
    # as-of join (operator Spark lacks; task brief custom-op list): each
    # click attributed to the user's most recent preceding view, inclusive
    # — DuckDB's native ASOF LEFT JOIN is the oracle
    from parquet_python_spark.operators.joins import asof_join

    ev = _t(spark, sf_dir, "events")
    # events.ts is TIMESTAMP_NTZ; the container/session run UTC, so the
    # cast to TIMESTAMP preserves the instant and unix_millis matches
    # DuckDB's epoch_ms on the naive value
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", ms.alias("ts_ms")
    )
    # dedupe views per (user, instant): among equal-ts ties Spark and
    # DuckDB ASOF could legitimately pick different rows — collapsing to
    # max(event_id) makes the answer unique on both sides
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("event_id"))
        .select("user_id", "ts", "event_id", ms.alias("ts_ms"))
    )
    out = asof_join(clicks, views, by="user_id", on="ts", payload_cols=["event_id", "ts_ms"])
    return out.select("event_id", "user_id", "ts_ms", "r_event_id", "r_ts_ms")


def _range_join_sizes(spark, sf_dir):
    # range join via interval binning (no nested-loop/cartesian anywhere):
    # parts joined to overlapping size bands
    from parquet_python_spark.operators.joins import range_join_binned

    part = _t(spark, sf_dir, "part").select("p_partkey", "p_size")
    bands = spark.range(0, 6).select(
        (F.col("id") * 10).alias("lo"),
        (F.col("id") * 10 + 14).alias("hi"),
        F.col("id").alias("band_id"),
    )
    return range_join_binned(part, bands, "p_size", "lo", "hi", 10).select(
        "p_partkey", "p_size", "band_id"
    )


# ----------------------------------------------------------------- export

def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Exactly 50 queries — the driver checks at most 50 (CORRECTNESS_r02
    covered the first 50 of round-2's 56, leaving six formally untested).
    Rounds 3-4 merge same-table codec/text/relational queries
    (rt_orders_multi, rt_part_codecs, converted_all, text_metrics,
    scan_project_limit — each docstring names the operators it carries) so
    every operator family keeps a hash-green driver row; round 4 spends
    the freed slots on the streaming stateful + dedup replays
    (stream_totals, stream_dedup) and the Gopher/C4 quality filters
    (quality_filters); round 5 merges dedup_simhash+dedup_simhash_pairs
    (mode column) and near_dup_embeddings+near_dup_embeddings_lsh (method
    column) to spend the freed slots on dedup_components (recursive-CTE
    oracle for the iterative connected-components dedup) and
    stream_encode_rt (availableNow replay through the streaming encode
    job, decoded round-trip)."""
    return {
        "rt_documents_auto": _rt_documents_auto,
        "rt_documents_fsst": _rt_documents_fsst,
        "rt_lineitem_ints": _rt_lineitem_ints,
        "rt_orders_multi": _rt_orders_multi,
        "rt_part_codecs": _rt_part_codecs,
        "rt_delta_sorted": _rt_delta_sorted,
        "rt_events_dict": _rt_events_dict,
        "rt_embeddings_plain": _rt_embeddings_plain,
        "rt_customer_doubles": _rt_customer_doubles,
        "rt_documents_nulls": _rt_documents_nulls,
        "rt_region_nation_supplier": _rt_region_nation_supplier,
        "rt_lineitem_pruned": _rt_lineitem_pruned,
        "rt_fixture_nation": _rt_fixture_nation,
        "rt_tokens_pruned": _rt_tokens_pruned,
        "rt_tokens_compacted": _rt_tokens_compacted,
        "pack_windows": _pack_windows,
        "pack_spans": _pack_spans,
        "remap_vocab": _remap_vocab,
        "converted_all": _converted_all,
        "sink_roundtrips": _sink_roundtrips,
        "describe_nation": _describe_nation,
        "stream_rates": _stream_rates,
        "stream_totals": _stream_totals,
        "stream_dedup": _stream_dedup,
        "quality_filters": _quality_filters,
        "scan_project_limit": _scan_project_limit,
        "agg_pricing_summary": _agg_pricing_summary,
        "agg_rollup_pricing": _agg_rollup_pricing,
        "join_customer_nation": _join_customer_nation,
        "join_semi_anti": _join_semi_anti,
        "window_top_orders": _window_top_orders,
        "setop_active_buyers": _setop_active_buyers,
        "asof_click_view": _asof_click_view,
        "range_join_sizes": _range_join_sizes,
        "dedup_exact": _dedup_exact,
        "text_metrics": _text_metrics,
        "scrub_pii": _scrub_pii,
        "stratified_sample": _stratified_sample,
        "dedup_minhash": _dedup_minhash,
        "dedup_simhash": _dedup_simhash,
        "dedup_components": _dedup_components,
        "ngram_jaccard": _ngram_jaccard,
        "near_dup_embeddings": _near_dup_embeddings,
        "stream_encode_rt": _stream_encode_rt,
        "ann_cosine_topk": _ann_cosine_topk,
        "ann_lsh_topk": _ann_lsh_topk,
        "ann_ivf_topk": _ann_ivf_topk,
        "multimodal_meta": _multimodal_meta,
        "multimodal_features": _multimodal_features,
        "multimodal_frames": _multimodal_frames,
    }


# exploded derived-tokens table (DuckDB twin of _derived_tokens +
# _explode_tokens) — shared by rt_tokens_compacted and stream_encode_rt
_TOKENS_FULL_SQL = (
    "WITH tok AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
    "CAST(n_chars % 240 + 16 AS INT) AS n_tok, lang AS source, "
    "CAST(doc_id AS BIGINT) AS did FROM documents) "
    "SELECT doc_id, "
    "CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos, "
    "CAST(unnest(toks) AS INT) AS token, n_tok, source FROM ("
    "SELECT doc_id, n_tok, source, "
    "list_transform(range(0, n_tok), "
    "i -> CAST((did*31 + i*7) % 65536 AS INT)) AS toks FROM tok)"
)


def _components_oracle() -> str:
    """DuckDB twin of _dedup_components: the MinHash candidate pairs
    (identical modular arithmetic, minhash_oracle_sql) fed through a
    recursive-CTE transitive closure; component = min id reachable from a
    node, keep = (doc_id == component), unpaired docs keep themselves."""
    from parquet_python_spark.operators.pipeline_ops import minhash_oracle_sql

    return (
        "WITH RECURSIVE pairs AS (" + minhash_oracle_sql("documents") + "), "
        "edges AS (SELECT doc_a AS u, doc_b AS v FROM pairs "
        "UNION SELECT doc_b AS u, doc_a AS v FROM pairs), "
        "reach(u, v) AS (SELECT u, v FROM edges "
        "UNION SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u), "
        "comp AS (SELECT u AS doc_id, least(u, min(v)) AS component_id "
        "FROM reach GROUP BY u) "
        "SELECT d.doc_id, "
        "COALESCE(c.component_id, d.doc_id) AS component_id, "
        "d.doc_id = COALESCE(c.component_id, d.doc_id) AS keep "
        "FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id"
    )


def oracle_sql() -> dict[str, str]:
    return {
        "rt_documents_auto": (
            "SELECT doc_id, text, lang, source, n_chars FROM documents"
        ),
        "rt_documents_fsst": "SELECT doc_id, text FROM documents",
        "rt_lineitem_ints": (
            "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber FROM lineitem"
        ),
        "rt_orders_multi": (
            "SELECT o_orderkey, o_orderstatus, o_orderpriority, "
            "o_totalprice > 150000 AS is_big, "
            "CASE WHEN o_orderkey % 5 = 0 THEN NULL "
            "ELSE o_totalprice > 200000 END AS is_huge_n, "
            "CAST((CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS BIGINT) "
            "* 86400000 + o_orderkey % 86400000 AS ts_millis FROM orders"
        ),
        "rt_part_codecs": (
            "SELECT p_partkey, p_size, p_brand, p_type, "
            "md5(CAST(p_partkey AS VARCHAR)) AS digest_hex FROM part"
        ),
        "rt_delta_sorted": "SELECT o_orderkey, o_custkey FROM orders",
        "rt_events_dict": "SELECT event_id, user_id, event_type FROM events",
        "rt_embeddings_plain": (
            "SELECT vec_id, label, "
            "generate_subscripts(embedding, 1) - 1 AS idx, "
            "CAST(unnest(embedding) AS DOUBLE) AS val FROM embeddings"
        ),
        "rt_customer_doubles": "SELECT c_custkey, c_acctbal FROM customer",
        "rt_tokens_pruned": (
            "WITH tok AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "CAST(n_chars % 240 + 16 AS INT) AS n_tok, lang AS source, "
            "CAST(doc_id AS BIGINT) AS did FROM documents) "
            "SELECT doc_id, "
            "CAST(generate_subscripts(toks, 1) - 1 AS BIGINT) AS pos, "
            "CAST(unnest(toks) AS INT) AS token, n_tok, source FROM ("
            "SELECT doc_id, n_tok, source, "
            "list_transform(range(0, n_tok), "
            "i -> CAST((did*31 + i*7) % 65536 AS INT)) AS toks "
            "FROM tok WHERE n_tok BETWEEN 64 AND 128)"
        ),
        "rt_tokens_compacted": _TOKENS_FULL_SQL,
        # streaming encode replay decodes to the SAME derived tokens table
        "stream_encode_rt": _TOKENS_FULL_SQL,
        "pack_spans": (
            "WITH tok AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "CAST(n_chars % 240 + 16 AS INT) AS n_tok, "
            "CAST(doc_id AS BIGINT) AS did FROM documents), "
            "g AS (SELECT doc_id, list_transform(range(0, n_tok), "
            "i -> CAST((did*31 + i*7) % 65536 AS INT)) AS toks FROM tok), "
            "flat AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS p "
            "FROM g), "
            "o AS (SELECT doc_id, "
            "row_number() OVER (ORDER BY doc_id, p) - 1 AS gpos FROM flat) "
            "SELECT w AS window_id, doc_id, "
            "CAST(min(gpos) - w * 512 AS BIGINT) AS off, "
            "CAST(count(*) AS BIGINT) AS len FROM ("
            "SELECT doc_id, gpos, CAST(gpos // 512 AS BIGINT) AS w FROM o) "
            "GROUP BY w, doc_id"
        ),
        "remap_vocab": (
            "WITH tok AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "CAST(n_chars % 240 + 16 AS INT) AS n_tok, "
            "CAST(doc_id AS BIGINT) AS did FROM documents), "
            "g AS (SELECT doc_id, list_transform(range(0, n_tok), "
            "i -> CAST((did*31 + i*7) % 65536 AS INT)) AS toks FROM tok), "
            "flat AS (SELECT doc_id, "
            "generate_subscripts(toks, 1) - 1 AS p, unnest(toks) AS t FROM g) "
            "SELECT doc_id, CAST(p AS BIGINT) AS pos, "
            "CAST(CASE t WHEN 0 THEN 70000 WHEN 7 THEN 70007 "
            "WHEN 1234 THEN 71234 ELSE t END AS INT) AS token FROM flat"
        ),
        "pack_windows": (
            "WITH tok AS (SELECT CAST(doc_id AS VARCHAR) AS doc_id, "
            "CAST(n_chars % 240 + 16 AS INT) AS n_tok, "
            "CAST(doc_id AS BIGINT) AS did FROM documents), "
            "g AS (SELECT doc_id, list_transform(range(0, n_tok), "
            "i -> CAST((did*31 + i*7) % 65536 AS INT)) AS toks FROM tok), "
            "flat AS (SELECT doc_id, generate_subscripts(toks, 1) - 1 AS p, "
            "unnest(toks) AS token FROM g), "
            "o AS (SELECT row_number() OVER (ORDER BY doc_id, p) - 1 AS gpos, "
            "token FROM flat) "
            "SELECT CAST(gpos // 512 AS BIGINT) AS window_id, "
            "CAST(gpos % 512 AS BIGINT) AS pos, token FROM o"
        ),
        "rt_region_nation_supplier": (
            "SELECT r_regionkey AS k, r_name AS name, 'region' AS tbl FROM region "
            "UNION ALL "
            "SELECT n_nationkey, n_name, 'nation' FROM nation "
            "UNION ALL "
            "SELECT s_suppkey, s_name, 'supplier' FROM supplier"
        ),
        "rt_documents_nulls": (
            "WITH base AS (SELECT doc_id, "
            "CASE WHEN doc_id % 7 = 0 THEN NULL ELSE lang END AS lang_n, "
            "CASE WHEN doc_id % 11 = 0 THEN NULL ELSE n_chars END AS chars_n "
            "FROM documents) "
            "SELECT 'all' AS mode, * FROM base "
            "UNION ALL SELECT 'notnull' AS mode, * FROM base WHERE lang_n IS NOT NULL "
            "UNION ALL SELECT 'null' AS mode, * FROM base WHERE lang_n IS NULL"
        ),
        "rt_lineitem_pruned": (
            "SELECT 'range' AS mode, l_orderkey, l_partkey, l_quantity "
            "FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000 "
            "UNION ALL "
            "SELECT 'eq' AS mode, l_orderkey, l_partkey, l_quantity "
            "FROM lineitem WHERE l_orderkey = 1234 "
            "UNION ALL "
            "SELECT 'multi' AS mode, l_orderkey, l_partkey, l_quantity "
            "FROM lineitem WHERE l_orderkey BETWEEN 1000 AND 3000 "
            "AND l_quantity BETWEEN 10.0 AND 20.0 "
            "AND l_partkey IS NOT NULL "
            "UNION ALL "
            "SELECT 'any' AS mode, l_orderkey, l_partkey, l_quantity "
            "FROM lineitem WHERE l_orderkey BETWEEN 100 AND 200 "
            "OR l_orderkey IN (1234, 4321)"
        ),
        "rt_fixture_nation": _nation_fixture_oracle(),
        "sink_roundtrips": (
            "SELECT 'csv' AS sink, n_nationkey, n_name, n_regionkey FROM nation "
            "UNION ALL "
            "SELECT 'jsonl', n_nationkey, n_name, n_regionkey FROM nation"
        ),
        "describe_nation": (
            "SELECT col AS column_name, dtype, "
            "(SELECT count(*) FROM nation) AS n_rows, n_nulls, n_distinct FROM ("
            "SELECT 'n_nationkey' AS col, 'int' AS dtype, "
            "count(*) FILTER (WHERE n_nationkey IS NULL) AS n_nulls, "
            "count(DISTINCT n_nationkey) AS n_distinct FROM nation "
            "UNION ALL SELECT 'n_name', 'string', "
            "count(*) FILTER (WHERE n_name IS NULL), "
            "count(DISTINCT n_name) FROM nation "
            "UNION ALL SELECT 'n_regionkey', 'int', "
            "count(*) FILTER (WHERE n_regionkey IS NULL), "
            "count(DISTINCT n_regionkey) FROM nation)"
        ),
        "converted_all": (
            "SELECT p_partkey, "
            "CAST(CAST(CAST(p_partkey AS DECIMAL(18,2)) / 100 AS DECIMAL(18,2)) "
            "AS DOUBLE) AS dec_val, "
            "DATE '1970-01-01' + p_size AS date_val, "
            "CAST(p_partkey * 86400000 AS BIGINT) AS ts_val, "
            "CASE WHEN (p_partkey % 100000 - 50000) < 0 "
            "THEN (p_partkey % 100000 - 50000) + 4294967296 "
            "ELSE (p_partkey % 100000 - 50000) END AS uint_val, "
            "CAST(p_partkey * 86400000000 AS BIGINT) AS ts_us, "
            "CAST(CASE WHEN p_partkey % 256 >= 128 "
            "THEN p_partkey % 256 - 256 ELSE p_partkey % 256 END AS BIGINT) "
            "AS i8_val, "
            "CAST(CASE WHEN (p_partkey * 7) % 65536 >= 32768 "
            "THEN (p_partkey * 7) % 65536 - 65536 "
            "ELSE (p_partkey * 7) % 65536 END AS BIGINT) AS i16_val, "
            "CAST(p_partkey % 120 AS BIGINT) AS iv_months, "
            "CAST(p_partkey % 31 AS BIGINT) AS iv_days, "
            "CAST(p_partkey % 86400000 AS BIGINT) AS iv_millis, "
            "'{\"k\":' || p_partkey || ',\"s\":' || p_size || '}' AS bson_json "
            "FROM part"
        ),
        "stream_rates": (
            # batch twin of the streaming windowed aggregation: 10-minute
            # epoch-aligned windows over ingest_ts = 2024-01-01 +
            # (doc_id % 120) minutes (epoch 1704067200 is 600-aligned)
            "SELECT CAST(1704067200 + (doc_id % 120) // 10 * 600 AS BIGINT) "
            "AS win_start_s, lang AS source, count(*) AS n_rows, "
            "CAST(sum(n_chars % 240 + 16) AS BIGINT) AS n_tokens "
            "FROM documents GROUP BY 1, 2"
        ),
        "dedup_exact": (
            "SELECT min(doc_id) AS doc_id, text, count(*) AS n_dups "
            "FROM documents GROUP BY text"
        ),
        "text_metrics": (
            # one-pass merge of round-2's text_stats + token_count +
            # quality_score + lang_id + doc_fingerprint oracles
            r"SELECT doc_id, length(text) AS len_chars, "
            r"len(string_split(text, ' ')) AS n_ws_tokens, "
            r"length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha, "
            r"length(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit, "
            r"length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS n_punct, "
            r"len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+')) "
            r"AS n_bpe_tokens, "
            r"floor(1000 * len(regexp_extract_all(lower(text), "
            r"'\b(the|a|and|of|to|in|is)\b')) "
            r"/ greatest(len(string_split(text,' ')),1))::BIGINT AS stop_permille, "
            r"floor(1000 * length(regexp_replace(text,'[^a-zA-Z]','','g')) "
            r"/ greatest(length(text),1))::BIGINT AS alpha_permille, "
            r"floor(1000 * length(regexp_replace(text,'[^.!?,;:]','','g')) "
            r"/ greatest(length(text),1))::BIGINT AS punct_permille, "
            r"floor(1000 * (length(text) - len(string_split(text,' ')) + 1) "
            r"/ greatest(len(string_split(text,' ')),1))::BIGINT "
            r"AS mean_word_len_x1000, "
            r"CASE WHEN s_fr >= s_es AND s_fr >= s_en AND s_fr >= s_de THEN 'fr' "
            r"WHEN s_es >= s_en AND s_es >= s_de THEN 'es' "
            r"WHEN s_en >= s_de THEN 'en' ELSE 'de' END AS lang_pred, "
            r"md5(text) AS fp FROM ("
            r"SELECT doc_id, text, "
            r"len(regexp_extract_all(lower(text), '\b(the|and|of|to|in)\b')) AS s_en, "
            r"len(regexp_extract_all(lower(text), '\b(der|die|und|das|ist)\b')) AS s_de, "
            r"len(regexp_extract_all(lower(text), '\b(le|la|et|les|des)\b')) AS s_fr, "
            r"len(regexp_extract_all(lower(text), '\b(el|los|las|una|es)\b')) AS s_es "
            r"FROM documents)"
        ),
        "scrub_pii": _scrub_pii_oracle(),
        "stratified_sample": _stratified_sample_oracle(),
        "ngram_jaccard": (
            "WITH w AS (SELECT doc_id, string_split(text,' ') AS w FROM documents), "
            "g0 AS (SELECT doc_id, "
            "unnest(list_distinct([array_to_string(w[i+1:i+3],' ') "
            "FOR i IN range(0, greatest(len(w)-3,0)+1)])) AS gram FROM w), "
            "g AS (SELECT doc_id, gram FROM g0 WHERE len(gram)>0 AND gram IN "
            "(SELECT gram FROM g0 GROUP BY gram HAVING count(*)<=200)), "
            "s AS (SELECT doc_id, count(*) AS n_grams FROM g GROUP BY doc_id), "
            "i AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter "
            "FROM g a JOIN g b USING(gram) WHERE a.doc_id < b.doc_id GROUP BY 1,2) "
            "SELECT doc_a, doc_b, "
            "floor(1000 * n_inter / (sa.n_grams + sb.n_grams - n_inter))::BIGINT "
            "AS jaccard_permille "
            "FROM i JOIN s sa ON i.doc_a = sa.doc_id "
            "JOIN s sb ON i.doc_b = sb.doc_id "
            "WHERE floor(1000 * n_inter / (sa.n_grams + sb.n_grams - n_inter)) >= 200"
        ),
        "near_dup_embeddings": (
            # merged r5: exact baseline UNION ALL the LSH scale path,
            # tagged by method (one slot at the 50-query cap)
            "SELECT vec_a, vec_b, cosine_x10k, 'exact' AS method FROM ("
            "WITH q AS (SELECT vec_id, "
            "[floor(CAST(x AS DOUBLE)*1000)::BIGINT FOR x IN embedding] AS q "
            "FROM embeddings), "
            "n AS (SELECT vec_id, q, CAST(list_dot_product(q,q) AS BIGINT) AS nq "
            "FROM q) "
            "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
            "floor(10000 * list_dot_product(a.q,b.q) "
            "/ sqrt(CAST(a.nq*b.nq AS DOUBLE)))::BIGINT AS cosine_x10k "
            "FROM n a JOIN n b ON a.vec_id < b.vec_id "
            "WHERE floor(10000 * list_dot_product(a.q,b.q) "
            "/ sqrt(CAST(a.nq*b.nq AS DOUBLE))) >= 3500) "
            "UNION ALL SELECT vec_a, vec_b, cosine_x10k, 'lsh' AS method "
            "FROM (" + _near_dup_lsh_oracle() + ")"
        ),
        "multimodal_meta": (
            # md5(VARCHAR) hashes the string's utf-8 bytes — exactly the
            # blob Spark hashes (this duckdb has no md5(BLOB) overload)
            "SELECT doc_id, 'image' AS media_type, "
            "octet_length(encode(text)) AS n_bytes, "
            "md5(text) AS content_md5 FROM documents"
        ),
        "ann_cosine_topk": (
            "WITH q AS (SELECT embedding AS qv FROM embeddings ORDER BY vec_id LIMIT 1) "
            "SELECT e.vec_id FROM embeddings e, q "
            "ORDER BY list_cosine_similarity(e.embedding, q.qv) DESC, e.vec_id ASC "
            "LIMIT 10"
        ),
        "stream_totals": (
            # batch twin of the stateful streaming totals (cumulative
            # per-source counts over the bounded replay)
            "SELECT lang AS source, CAST(count(*) AS BIGINT) AS total_rows, "
            "CAST(sum(n_chars % 240 + 16) AS BIGINT) AS total_tokens "
            "FROM documents GROUP BY lang"
        ),
        "stream_dedup": (
            # the duplicated feed collapses back to one row per doc_id
            "SELECT doc_id, CAST(n_chars % 240 + 16 AS BIGINT) AS n_tok, "
            "lang AS source, "
            "CAST(1704067200 + (doc_id % 120) * 60 AS BIGINT) AS ts_s "
            "FROM documents"
        ),
        "quality_filters": _quality_filters_oracle(),
        "scan_project_limit": (
            "SELECT o_orderkey, o_custkey FROM orders "
            "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10"
        ),
        "agg_pricing_summary": (
            # outer CAST: DuckDB widens sum(BIGINT) to HUGEINT, which would
            # hash-differ from Spark's BIGINT even with identical values
            "SELECT l_returnflag, l_linestatus, count(*) AS n_rows, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus"
        ),
        "agg_rollup_pricing": (
            "SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag, "
            "COALESCE(l_linestatus, 'ALL') AS l_linestatus, "
            "count(*) AS n_rows, "
            "CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty "
            "FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)"
        ),
        "join_customer_nation": (
            "SELECT n.n_name AS nation, count(*) AS n_customers "
            "FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey "
            "GROUP BY n.n_name"
        ),
        "join_semi_anti": (
            "SELECT c_custkey, 'has_orders' AS status FROM customer "
            "WHERE c_custkey IN (SELECT o_custkey FROM orders) "
            "UNION ALL "
            "SELECT c_custkey, 'no_orders' FROM customer "
            "WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)"
        ),
        "asof_click_view": (
            "WITH l AS (SELECT event_id, user_id, ts, epoch_ms(ts) AS ts_ms "
            "FROM events WHERE event_type = 'click'), "
            "r AS (SELECT max(event_id) AS event_id, user_id, ts, "
            "epoch_ms(ts) AS ts_ms FROM events WHERE event_type = 'view' "
            "GROUP BY user_id, ts) "
            "SELECT l.event_id, l.user_id, l.ts_ms, "
            "r.event_id AS r_event_id, r.ts_ms AS r_ts_ms "
            "FROM l ASOF LEFT JOIN r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"
        ),
        "range_join_sizes": (
            "SELECT p.p_partkey, p.p_size, b.band_id FROM part p JOIN "
            "(SELECT i * 10 AS lo, i * 10 + 14 AS hi, i AS band_id "
            "FROM range(0, 6) AS t(i)) b "
            "ON p.p_size BETWEEN b.lo AND b.hi"
        ),
        "window_top_orders": (
            "SELECT o_custkey, o_orderkey, rn FROM ("
            "SELECT o_custkey, o_orderkey, CAST(row_number() OVER ("
            "PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC"
            ") AS BIGINT) AS rn FROM orders) WHERE rn <= 2"
        ),
        "setop_active_buyers": (
            # INTERSECT (distinct semantics on both engines); the two event
            # types are picked data-dependently the same way on both sides
            "SELECT user_id FROM events "
            "WHERE event_type = (SELECT min(event_type) FROM events) "
            "INTERSECT "
            "SELECT user_id FROM events "
            "WHERE event_type = (SELECT max(event_type) FROM events)"
        ),
        "multimodal_features": (
            # reproduces the deterministic fake extractor (byte-histogram
            # folded to 16 buckets, normalized): documents text is ASCII in
            # the test tables, so ascii(char) == utf-8 byte value
            "WITH b AS (SELECT doc_id, "
            "ascii(unnest(string_split(text, ''))) % 16 AS bkt FROM documents), "
            "h AS (SELECT doc_id, bkt, count(*) AS c FROM b GROUP BY doc_id, bkt), "
            "t AS (SELECT doc_id, count(*) AS tot FROM b GROUP BY doc_id), "
            "grid AS (SELECT doc_id, CAST(i AS BIGINT) AS bucket_idx "
            "FROM documents, range(16) AS r(i)) "
            "SELECT g.doc_id, g.bucket_idx, "
            "CASE WHEN t.tot IS NULL OR t.tot = 0 THEN 0.0 "
            "ELSE CAST(COALESCE(h.c, 0) AS DOUBLE) / t.tot END AS value "
            "FROM grid g LEFT JOIN t ON g.doc_id = t.doc_id "
            "LEFT JOIN h ON h.doc_id = g.doc_id AND h.bkt = g.bucket_idx"
        ),
        "multimodal_frames": (
            # fixed-stride windows: frame k covers bytes [64k, 64k+16)
            "SELECT d.doc_id, CAST(i AS BIGINT) AS frame_idx, "
            "substr(d.text, CAST(i * 64 + 1 AS INTEGER), 16) AS frame_str "
            "FROM documents d, range(0, 256) AS r(i) "
            "WHERE i * 64 < length(d.text)"
        ),
        # merged r5 (one slot): fingerprints UNION ALL candidate pairs
        "dedup_simhash": (
            "SELECT doc_id AS id_a, simhash AS id_b, "
            "CAST(NULL AS INT) AS hamming, 'sig' AS mode FROM ("
            + _simhash_oracle()
            + ") UNION ALL SELECT doc_a AS id_a, doc_b AS id_b, hamming, "
            "'pair' AS mode FROM (" + _simhash_pairs_oracle() + ")"
        ),
        # r5: recursive-CTE transitive closure over the same MinHash
        # candidate pairs — the DuckDB twin of the iterative
        # pointer-jumping connected-components operator + keep bit
        "dedup_components": _components_oracle(),
        "ann_lsh_topk": _ann_lsh_oracle(),
        # round 3: the last two formerly rows-only ops are now fully
        # SQL-oracle-checkable — MinHash moved to non-overflowing modular
        # arithmetic (every intermediate < 2^62, plain BIGINT), and IVF
        # assignment moved to the exact floor(x*1000) integer grid with
        # the seeded centroids re-derived and inlined as literals.
        "dedup_minhash": _minhash_oracle(),
        "ann_ivf_topk": _ann_ivf_oracle(),
    }


def _quality_filters_oracle() -> str:
    """DuckDB twin of pipeline_ops.gopher_quality (min_words=20): the
    top-2-gram is picked by ORDER BY cnt DESC, gram DESC — the same
    tie-break as the Spark run-length scan's `newrun >= best` update over
    the ascending-sorted gram list."""
    return (
        "WITH base AS (SELECT doc_id, text, "
        "list_filter(string_split(text, ' '), x -> x <> '') AS w "
        "FROM documents), "
        "b2 AS (SELECT doc_id, text, len(w) AS nw, "
        "len(list_distinct(w)) AS ndw, length(text) AS len_chars, "
        "length(replace(text, ' ', '')) AS nonspace, "
        "length(text) - length(replace(text, '#', '')) AS n_hash, "
        "CAST(floor((length(text) - length(replace(text, '...', ''))) / 3) "
        "AS BIGINT) AS n_ell FROM base), "
        "g AS (SELECT doc_id, "
        "unnest(list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])) "
        "AS gram FROM base WHERE len(w) >= 2), "
        "gc AS (SELECT doc_id, gram, count(*) AS cnt, "
        "row_number() OVER (PARTITION BY doc_id "
        "ORDER BY count(*) DESC, gram DESC) AS rn "
        "FROM g GROUP BY doc_id, gram), "
        "top AS (SELECT doc_id, gram AS top_gram, cnt AS top_gram_n "
        "FROM gc WHERE rn = 1) "
        "SELECT b2.doc_id, CAST(nw AS BIGINT) AS n_words, "
        "CAST(ndw AS BIGINT) AS n_distinct_words, "
        "COALESCE(top_gram, '') AS top_gram, "
        "CAST(COALESCE(top_gram_n, 0) AS BIGINT) AS top_gram_n, "
        "floor(1000 * COALESCE(top_gram_n, 0) "
        "* length(COALESCE(top_gram, '')) "
        "/ greatest(len_chars, 1))::BIGINT AS dup_2gram_permille, "
        "floor(1000 * (nw - ndw) / greatest(nw, 1))::BIGINT "
        "AS word_rep_permille, "
        "floor(1000 * (n_hash + n_ell) / greatest(nw, 1))::BIGINT "
        "AS sym_word_permille, "
        "floor(1000 * nonspace / greatest(nw, 1))::BIGINT "
        "AS mean_word_len_x1000, "
        "(nw BETWEEN 20 AND 100000 "
        "AND floor(1000 * nonspace / greatest(nw, 1)) BETWEEN 3000 AND 10000 "
        "AND floor(1000 * (n_hash + n_ell) / greatest(nw, 1)) < 100 "
        "AND floor(1000 * COALESCE(top_gram_n, 0) "
        "* length(COALESCE(top_gram, '')) / greatest(len_chars, 1)) < 200 "
        "AND floor(1000 * (nw - ndw) / greatest(nw, 1)) < 300) "
        "AS gopher_pass "
        "FROM b2 LEFT JOIN top ON b2.doc_id = top.doc_id"
    )


def _stratified_sample_oracle() -> str:
    from parquet_python_spark.operators.pipeline_ops import (
        stratified_sample_oracle_sql,
    )

    return stratified_sample_oracle_sql(
        "documents", {"en": 700, "de": 400}, default_permille=150,
        select="doc_id, lang",
    )


def _simhash_oracle() -> str:
    from parquet_python_spark.operators.pipeline_ops import simhash_oracle_sql

    return simhash_oracle_sql("documents")


def _scrub_pii_oracle() -> str:
    from parquet_python_spark.operators.pipeline_ops import scrub_pii_oracle_sql

    return scrub_pii_oracle_sql("documents")


def _simhash_pairs_oracle() -> str:
    from parquet_python_spark.operators.pipeline_ops import (
        simhash_pairs_oracle_sql,
    )

    return simhash_pairs_oracle_sql("documents", max_hamming=20)


def _near_dup_lsh_oracle() -> str:
    from parquet_python_spark.operators.pipeline_ops import near_dup_lsh_oracle_sql

    return near_dup_lsh_oracle_sql(
        "embeddings", min_cosine=0.35, n_planes=4, dim=64
    )


def _ann_lsh_oracle() -> str:
    from parquet_python_spark.operators.pipeline_ops import ann_lsh_oracle_sql

    return ann_lsh_oracle_sql("embeddings", k=10, n_planes=8, dim=64)


def _minhash_oracle() -> str:
    from parquet_python_spark.operators.pipeline_ops import minhash_oracle_sql

    return minhash_oracle_sql("documents")


def _ann_ivf_oracle() -> str:
    # the driver's correctness check runs at sf0.01 (SF_DIR override for
    # tools/check_oracle.py); the seeded centroids are re-derived from the
    # same pinned sample of that table and inlined as SQL literals
    import os

    from parquet_python_spark.operators.pipeline_ops import ann_ivf_oracle_sql

    sf_dir = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
    return ann_ivf_oracle_sql(f"{sf_dir}/embeddings.parquet")


def _nation_fixture_oracle() -> str:
    """nation.csv (the reference's golden, test-data/nation.csv) inlined as
    VALUES — self-contained, no filesystem access needed in the oracle."""
    import csv

    with open("/root/reference/test-data/nation.csv") as f:
        rows = list(csv.reader(f, delimiter="|"))
    vals = ", ".join(
        f"({int(r[0])}, '{r[1]}', {int(r[2])}, '{r[3]}')" for r in rows
    )
    return (
        f"SELECT CAST(n_nationkey AS INTEGER) AS n_nationkey, n_name, "
        f"CAST(n_regionkey AS INTEGER) AS n_regionkey, n_comment FROM "
        f"(VALUES {vals}) AS t(n_nationkey, n_name, n_regionkey, n_comment)"
    )
