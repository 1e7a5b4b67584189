"""Spark encode/decode pipeline: the distributed replacement for the
reference's single-threaded row-group walk (SURVEY.md §3).

Mapping (SURVEY.md §1.3):
    row group      -> DataFrame partition   (repartition on (source, salt))
    column chunk   -> one row of the blocks table
    page decode    -> vectorized numpy kernels inside applyInPandas
    row pivot      -> never (Arrow-columnar end to end)

Scale design notes (targets a 1000-executor cluster; local[32] here):
  * Default "files" mode is ZERO-shuffle end to end: one task per input
    file / row-group range, workers read parquet via pyarrow and write their
    own block files — token payloads never cross the JVM<->python Arrow IPC
    boundary or an exchange.  decode_blocks_files mirrors it on the way back.
  * "grouped" mode (salted shuffle) exists for source-pure chunk layouts:
    per-source token totals are tiny aggregates; the salt count per source
    is sized so each (source, salt) bucket holds ~TARGET_TOKENS_PER_PART
    tokens — the dominant source (60% of rows in the generator) fans out
    across the cluster instead of hot-spotting one task.  In files mode the
    same skew is bounded by row-group-range task splitting instead.
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
        # per-block min/max of the column's values (int columns only; the
        # Statistics the reference parses but never uses,
        # /root/reference/parquet/parquet.thrift:198-206) — drive the
        # zone-map prune in decode_blocks_pruned / decode_blocks_files_pruned
        T.StructField("stat_min", T.LongType(), True),
        T.StructField("stat_max", T.LongType(), True),
    ]
)

import pyarrow as pa  # noqa: E402  (workers import lazily via kernels)

_BLOCKS_ARROW_SCHEMA = pa.schema(
    [
        ("part_id", pa.string()),
        ("source", pa.string()),
        ("column", pa.string()),
        ("codec", pa.string()),
        ("params", pa.string()),
        ("payload", pa.binary()),
        ("n_values", pa.int64()),
        ("n_rows", pa.int64()),
        ("raw_bytes", pa.int64()),
        ("enc_bytes", pa.int64()),
        ("ref_dict_bytes", pa.int64()),
        ("checksum", pa.int64()),
        ("snapshot_id", pa.string()),
        ("encode_ms", pa.float64()),
        ("stat_min", pa.int64()),
        ("stat_max", pa.int64()),
    ]
)

# blk/cmp parquet compression: payload is already entropy-coded by the
# column codecs (snappy on top is pure CPU), every other column keeps
# snappy.  The dict must name EVERY column: pyarrow leaves unlisted
# columns uncompressed rather than applying the default codec.
_BLK_COMPRESSION = {
    f.name: ("none" if f.name == "payload" else "snappy")
    for f in _BLOCKS_ARROW_SCHEMA
}

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

    The salt counts join in via a BROADCAST map join, not a chained
    per-source F.when expression: a when-chain is an expression tree that
    grows with source cardinality (at 10^4 sources, a plan bomb); the
    broadcast hash join is O(1) plan size at any cardinality.
    """
    spark = df.sparkSession
    salt_df = spark.createDataFrame(
        [(str(s), int(n)) for s, n in salt_map.items()],
        "source string, n_salts int",
    )
    df = df.join(F.broadcast(salt_df), "source", "left")
    df = df.withColumn(
        "salt",
        F.pmod(F.crc32(F.col("doc_id")), F.coalesce("n_salts", F.lit(1))).cast("int"),
    ).drop("n_salts")
    return df.withColumn(
        "part_id", F.concat_ws("#", F.col("source"), F.col("salt").cast("string"))
    )


# --------------------------------------------------------------- encode

_COLUMNS = ("tokens", "n_tok", "doc_id", "source")


def _encode_partition_table(
    tbl: "pa.Table",
    snapshot_id: str,
    with_ref_baseline: bool,
    part_id: str | None = None,
    presorted: bool = False,
) -> "pa.Table":
    """Encode one (source, salt) bucket into one blocks row per column.

    Arrow-native: the tokens list column's values buffer IS the flattened
    token vector (zero-copy via arrow_io.list_column_flat); strings encode
    from their (offsets, data) buffers.  No per-row Python anywhere.

    The doc_id sort canonicalizes row order so the encoded payload is
    deterministic regardless of upstream arrival order (shuffle in grouped
    mode) — required for idempotent resume.  Callers that already sorted
    pass presorted=True (the narrow path sorts once per split, not per
    source chunk).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .codecs.arrow_io import encode_str_column, list_column_flat

    t0 = time.perf_counter()
    if not presorted:
        order = pc.sort_indices(tbl.column("doc_id"))
        tbl = tbl.take(order)
    part_id = part_id or tbl.column("part_id")[0].as_py()
    source = tbl.column("source")[0].as_py()
    n_rows = tbl.num_rows

    tokens_col = tbl.column("tokens").combine_chunks()
    flat, _lens = list_column_flat(tokens_col)  # int32, zero-copy
    n_tok = tbl.column("n_tok").to_numpy(zero_copy_only=False)

    rows = []

    def add(
        col, codec, params, payload, n_values, raw_bytes,
        ref_bytes=None, stats=(None, None),
    ):
        rows.append(
            {
                "part_id": part_id,
                "source": source,
                "column": col,
                "codec": codec,
                "params": params_to_json(params),
                "payload": payload,
                "n_values": n_values,
                "n_rows": n_rows,
                "raw_bytes": raw_bytes,
                "enc_bytes": len(payload),
                "ref_dict_bytes": ref_bytes,
                "checksum": zlib.crc32(payload),
                "snapshot_id": snapshot_id,
                "encode_ms": (time.perf_counter() - t0) * 1000.0,
                "stat_min": stats[0],
                "stat_max": stats[1],
            }
        )

    for col, vals in (("tokens", flat), ("n_tok", n_tok)):
        codec, params, payload, _stats = encode_column(vals, "int")
        ref_bytes = None
        if with_ref_baseline and col == "tokens":
            # honest <=-size gate: the reference's own RLE/dict wire format
            # on the same values (dict page + hybrid indices, SURVEY.md D15/D16)
            ref_bytes = len(encode_dict(np.asarray(vals, dtype=np.int32), "int32"))
        # zone-map stats: one vectorized min/max pass (~0.5% of encode cost)
        stats = (
            (int(vals.min()), int(vals.max())) if len(vals) else (None, None)
        )
        add(col, codec, params, payload, len(vals), 4 * len(vals), ref_bytes, stats)

    for col in ("doc_id", "source"):
        arr = tbl.column(col).combine_chunks()
        codec, params, payload = encode_str_column(arr)
        raw = int(pc.sum(pc.binary_length(arr)).as_py() or 0)
        add(col, codec, params, payload, len(arr), raw)

    return pa.Table.from_pylist(rows, schema=_BLOCKS_ARROW_SCHEMA)


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

    def enc(tbl):
        return _encode_partition_table(tbl, snapshot_id, with_ref_baseline)

    # groupBy().applyInArrow hash-partitions on part_id — that IS the one
    # shuffle of the pipeline (an explicit repartition first would double it).
    return with_pid.groupBy("part_id").applyInArrow(enc, schema=BLOCKS_SCHEMA)


def encode_table_narrow(
    df: DataFrame,
    snapshot_id: str = "",
    with_ref_baseline: bool = False,
    skip_parts: frozenset | None = None,
    part_prefix: str = "",
) -> DataFrame:
    """Zero-shuffle encode: mapInArrow over the scan, one chunk per
    (source, input split).

    The scale path.  Encoding is source-local work, so shuffling every
    token byte to co-locate sources (encode_table) buys nothing that
    splitting each scan batch by source doesn't — and at 100 TB the saved
    shuffle IS the job.  Skew needs no salting here: input splits are
    size-bounded by spark.sql.files.maxPartitionBytes, so a dominant
    source simply spans more splits.  part_id = f"{source}#{split_id}" is
    deterministic for a fixed input layout + reader config, which keeps
    checkpoint/resume stable across reruns.
    """

    def enc(batches):
        import pyarrow as pa
        from pyspark import TaskContext

        split_id = TaskContext.get().partitionId()
        batch_list = list(batches)
        if not batch_list:
            return
        # ONE canonical sort per split, then zero-copy source slices —
        # replaces the old per-source filter passes (5 full scans) and
        # per-chunk doc_id sorts.
        tbl = pa.Table.from_batches(batch_list)
        yield from _encode_split_by_source(
            tbl, split_id, snapshot_id, with_ref_baseline, skip_parts, part_prefix
        )

    return df.mapInArrow(enc, schema=BLOCKS_SCHEMA)


def file_key(path: str) -> str:
    """Content-addressed file id (64-bit hash of name:size:mtime_ns) —
    stable across snapshots and listing order; keys incremental encode +
    resume in files mode.  mtime_ns is folded in so a file rewritten IN
    PLACE with unchanged name+size gets a new key and re-encodes (Iceberg
    data files are immutable, but the bare-parquet-dir fallback makes no
    such promise).  64 bits, not crc32: at ~10^5 files a 32-bit key has
    ~birthday-odds of a collision, which would silently skip a file."""
    st = os.stat(path)
    h = hashlib.sha1(
        f"{os.path.basename(path)}:{st.st_size}:{st.st_mtime_ns}".encode()
    )
    return f"f{h.hexdigest()[:16]}"


def list_input_files(input_path: str) -> list[str]:
    """Deterministic file list (sorted names) — part_id stability for resume."""
    return sorted(
        os.path.join(input_path, f)
        for f in os.listdir(input_path)
        if f.endswith(".parquet")
    )


def resolve_input_files(input_path: str) -> list[str]:
    """Snapshot-pinned file set for iceberg-lite tables (files added after
    the snapshot are invisible until re-snapshot); sorted listing otherwise."""
    from .sources.iceberg_lite import current_snapshot_id, snapshot_files

    if current_snapshot_id(input_path) is not None:
        return snapshot_files(input_path)
    return list_input_files(input_path)


def _read_task_table(path: str, rg_start: int, rg_end: int):
    """Read one planned task's data (whole file or a row-group range).

    use_threads=False: each of N concurrent workers would otherwise spawn a
    full-width Arrow thread pool (N*cores runnable threads -> scheduler
    collapse at local[32])."""
    import pyarrow.parquet as pq

    if rg_start < 0:
        return pq.read_table(path, use_threads=False)
    return pq.ParquetFile(path).read_row_groups(
        list(range(rg_start, rg_end)), use_threads=False
    )


def encode_table_files(
    spark: SparkSession,
    input_path: str,
    snapshot_id: str = "",
    with_ref_baseline: bool = False,
    skip_parts: frozenset | None = None,
    part_prefix: str = "",
    files: list[str] | None = None,
    max_task_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """Fastest scale path: one task per input file, workers read parquet via
    pyarrow directly.

    Rationale: the encode job is UDF-dominated — with mapInArrow over a JVM
    scan every token is decoded by the JVM parquet reader, serialized to
    Arrow IPC, and deserialized in the python worker before the kernels even
    start.  Reading the file in the worker (the standard python-native-scan
    pattern for UDF-heavy Spark pipelines) eliminates both extra passes; at
    32 workers on one box that traffic is the scaling bottleneck.  Spark
    still owns scheduling/retries; files on shared storage make this
    cluster-valid.  part_id = f"{source}#{file_key(path)}" (sha1 of
    name:size:mtime_ns) — content-addressed per FILE, so resume keys
    survive re-snapshots: when an Iceberg-lite table gains files and is
    re-snapshotted, only the new files encode (incremental processing),
    and an in-place rewrite changes the key and re-encodes.
    """
    files = files if files is not None else resolve_input_files(input_path)
    tasks = _plan_file_tasks(files, max_task_bytes)
    # JVM-native range dispatch, one partition per task; tasks resolve
    # from the closure list (same rationale + sizing note as
    # _decode_files_df: no exchange, no python-RDD hop)
    tasks_local = list(tasks)
    paths_df = spark.range(
        len(tasks_local), numPartitions=max(len(tasks_local), 1)
    )

    def enc(batches):
        for batch in batches:
            for i in batch.column("id").to_pylist():
                tkey, path, rg_start, rg_end = tasks_local[int(i)]
                tbl = _read_task_table(path, rg_start, rg_end)
                yield from _encode_split_by_source(
                    tbl, tkey, snapshot_id, with_ref_baseline,
                    skip_parts, part_prefix,
                )

    return paths_df.mapInArrow(enc, schema=BLOCKS_SCHEMA)


def encode_table_files_native(
    spark: SparkSession,
    input_path: str,
    blocks_dir: str,
    snapshot_id: str = "",
    with_ref_baseline: bool = False,
    skip_parts: frozenset | None = None,
    part_prefix: str = "",
    files: list[str] | None = None,
    max_task_bytes: int = 256 * 1024 * 1024,
) -> DataFrame:
    """files-mode encode with WORKER-NATIVE block writes.

    Each task writes its own parquet block file (pyarrow) under blocks_dir —
    the encoded payloads never cross the python->JVM Arrow IPC boundary nor
    the JVM parquet writer (measured here: that write-back path is both the
    wide-core bottleneck and the dominant variance source).  Commit protocol:
    deterministic per-task file names (blk-<task_key>.parquet) written to a
    temp name and atomically renamed, so retries/re-runs are idempotent; the
    caller snapshots blocks_dir (iceberg_lite.write_snapshot) to commit.

    Returns the blocks *metadata* DataFrame (all columns except payload) —
    consuming it drives the job.
    """
    files = files if files is not None else resolve_input_files(input_path)
    os.makedirs(blocks_dir, exist_ok=True)
    tasks = _plan_file_tasks(files, max_task_bytes)
    _remove_stale_generations(blocks_dir, tasks)
    # JVM-native range dispatch, one partition per task; tasks resolve
    # from the closure list (same rationale + sizing note as
    # _decode_files_df: no exchange, no python-RDD hop)
    tasks_local = list(tasks)
    paths_df = spark.range(
        len(tasks_local), numPartitions=max(len(tasks_local), 1)
    )

    def enc(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        for batch in batches:
            for i in batch.column("id").to_pylist():
                tkey, path, rg_start, rg_end = tasks_local[int(i)]
                tbl = _read_task_table(path, rg_start, rg_end)
                out_batches = list(
                    _encode_split_by_source(
                        tbl, tkey, snapshot_id, with_ref_baseline,
                        skip_parts, part_prefix,
                    )
                )
                if not out_batches:
                    continue
                out = pa.Table.from_batches(out_batches, schema=_BLOCKS_ARROW_SCHEMA)
                fname = os.path.join(blocks_dir, f"blk-{tkey}.parquet")
                # attempt-unique temp name: concurrent attempts (speculation,
                # zombie retries) must never interleave writes on one inode;
                # dot prefix keeps Spark's file index and list_input_files
                # from ever seeing an in-progress or abandoned temp.
                ctx = TaskContext.get()
                attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
                tmp = os.path.join(
                    blocks_dir, f".blk-{tkey}.parquet.inprogress-{attempt}"
                )
                # payload bytes are already entropy-coded by the column
                # codecs — parquet-level snappy on top is pure CPU (guide
                # §2.3: compressing high-entropy payloads), measured ~35%
                # of this write+read path for a ~4% size increase.  Every
                # OTHER column is listed explicitly with snappy: pyarrow
                # treats columns absent from a compression dict as
                # UNCOMPRESSED, not as the default codec.
                pq.write_table(out, tmp, compression=_BLK_COMPRESSION)
                os.rename(tmp, fname)
                yield from out.drop_columns(["payload"]).to_batches()

    meta_schema = T.StructType(
        [f for f in BLOCKS_SCHEMA.fields if f.name != "payload"]
    )
    return paths_df.mapInArrow(enc, schema=meta_schema)


def _remove_stale_generations(blocks_dir: str, tasks: list[tuple]) -> None:
    """Drop block files from an older task-boundary generation.

    Task keys embed max_task_bytes-dependent row-group boundaries
    (fk vs fk.rgN); re-running encode with a different max_task_bytes
    re-encodes under new keys while the old blk-<fk>*.parquet files remain,
    and current_blocks' file-key-prefix filter would double-count those
    rows.  Driver-side (race-free: before any task runs): for every file
    key in the CURRENT plan, delete blk files whose task key is not in the
    plan.  Blocks of files no longer in the input are untouched (history)."""
    planned = {t[0] for t in tasks}
    fks = {k.split(".")[0] for k in planned}
    for name in os.listdir(blocks_dir):
        if not name.endswith(".parquet"):
            continue
        if name.startswith("blk-"):
            key = name[len("blk-") : -len(".parquet")]
            if key.split(".")[0] in fks and key not in planned:
                try:
                    os.remove(os.path.join(blocks_dir, name))
                except OSError:
                    pass
        elif name.startswith("cmp-"):
            # compacted files hold many task keys: rewrite in place without
            # the stale generation's rows (maintenance-path cost, driver-side)
            _rewrite_compacted_without_stale(
                os.path.join(blocks_dir, name), fks, planned
            )


def _rewrite_compacted_without_stale(
    path: str, fks: set[str], planned: set[str]
) -> None:
    import pyarrow.parquet as pq

    try:
        pids = pq.read_table(path, columns=["part_id"], use_threads=False)
    except OSError:
        return
    keys = [p.rsplit("#", 1)[-1] for p in pids.column("part_id").to_pylist()]
    stale = np.array(
        [k.split(".")[0] in fks and k not in planned for k in keys]
    )
    if not stale.any():
        return
    tbl = pq.read_table(path, use_threads=False)
    kept = tbl.filter(pa.array(~stale))
    if kept.num_rows == 0:
        os.remove(path)
        return
    tmp = path + ".rewrite"
    pq.write_table(kept, tmp)
    os.rename(tmp, path)


def _plan_file_tasks(files: list[str], max_task_bytes: int) -> list[tuple]:
    """One task per file; oversized files (skewed upstream writers) split
    into row-group ranges of <= max_task_bytes each — bounded task size
    without any shuffle.  (rg_start, rg_end) = (-1, -1) means whole file.
    Task keys stay content-addressed: f"{file_key}.rg{start}"."""
    tasks: list[tuple] = []
    for f in files:
        fk = file_key(f)
        size = os.stat(f).st_size
        if size <= max_task_bytes:
            tasks.append((fk, f, -1, -1))
            continue
        import pyarrow.parquet as pq

        meta = pq.ParquetFile(f).metadata
        n_rg = meta.num_row_groups
        if n_rg <= 1:
            tasks.append((fk, f, -1, -1))
            continue
        group: list[int] = []
        acc = 0
        for rg in range(n_rg):
            rg_meta = meta.row_group(rg)
            rg_bytes = sum(
                rg_meta.column(j).total_compressed_size
                for j in range(rg_meta.num_columns)
            )
            if group and acc + rg_bytes > max_task_bytes:
                tasks.append((f"{fk}.rg{group[0]}", f, group[0], group[-1] + 1))
                group, acc = [], 0
            group.append(rg)
            acc += rg_bytes
        if group:
            tasks.append((f"{fk}.rg{group[0]}", f, group[0], group[-1] + 1))
    return tasks


def _encode_split_by_source(
    tbl, split_id, snapshot_id, with_ref_baseline, skip_parts, part_prefix
):
    """Sort one split's table by (source, doc_id) and encode each source run
    as one partition chunk (shared by the narrow and files paths)."""
    import numpy as np
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return  # Spark routinely writes 0-row part files; nothing to encode
    tbl = tbl.combine_chunks()
    order = pc.sort_indices(
        tbl, sort_keys=[("source", "ascending"), ("doc_id", "ascending")]
    )
    tbl = tbl.take(order)
    src_codes = tbl.column("source").combine_chunks().dictionary_encode()
    idx = src_codes.indices.to_numpy(zero_copy_only=False)
    names = src_codes.dictionary.to_pylist()
    bounds = np.concatenate(([0], np.flatnonzero(np.diff(idx)) + 1, [len(idx)]))
    for s, e in zip(bounds[:-1], bounds[1:]):
        src = names[idx[s]]
        pid = f"{part_prefix}{src}#{split_id}"
        if skip_parts and pid in skip_parts:
            continue  # checkpoint/resume: this chunk is already encoded
        out = _encode_partition_table(
            tbl.slice(s, e - s), snapshot_id, with_ref_baseline,
            part_id=pid, presorted=True,
        )
        yield from out.to_batches()


# --------------------------------------------------------------- decode

def _decode_part_table(tbl) -> "pa.Table":
    """Decode one partition's block rows back to token rows (bit-identical).

    Decodes each column payload with the vectorized kernels and re-splits
    the flat token vector on the n_tok offsets (Arrow list layout; the
    repetition-level concept the reference never implemented, SURVEY.md D18).
    """
    import pyarrow as pa

    from .codecs.arrow_io import decode_str_column

    rows = tbl.to_pylist()  # 4 small rows (payload bytes ride along)
    by_col = {r["column"]: r for r in rows}
    n_rows = int(by_col["doc_id"]["n_rows"])
    for col in _COLUMNS:
        row = by_col[col]
        if zlib.crc32(row["payload"]) != int(row["checksum"]):
            raise ValueError(f"checksum mismatch for {row['part_id']}/{col}")

    def _int(col, prefer32=False):
        r = by_col[col]
        return decode_column(
            r["codec"], r["payload"], int(r["n_values"]),
            params_from_json(r["params"]), "int", prefer32=prefer32,
        )

    def _str(col):
        r = by_col[col]
        return decode_str_column(
            r["codec"], r["payload"], int(r["n_values"]),
            params_from_json(r["params"]),
        )

    n_tok = _int("n_tok")
    # prefer32: the kernels emit int32 directly (tokens ARE int32) — no
    # widen-to-int64-then-astype double pass; asarray is a no-op then
    flat = np.asarray(_int("tokens", prefer32=True), dtype=np.int32)
    total_tok = int(np.asarray(n_tok, dtype=np.int64).sum())
    if total_tok >= 2**31:
        # int32 list offsets would wrap silently past 2^31 tokens in one
        # part; task planning bounds part size well below this, so reaching
        # here means a pathological input — fail loudly, never corrupt
        raise ValueError(
            f"partition holds {total_tok} tokens (>= 2^31); "
            "re-encode with a smaller max_task_bytes"
        )
    offsets = np.zeros(n_rows + 1, dtype=np.int32)
    np.cumsum(n_tok, out=offsets[1:])
    tokens = pa.ListArray.from_arrays(
        pa.array(offsets, type=pa.int32()), pa.array(flat, type=pa.int32())
    ).cast(pa.list_(pa.field("element", pa.int32(), nullable=False)))
    return pa.table(
        {
            "doc_id": _str("doc_id"),
            "tokens": tokens,
            "n_tok": pa.array(n_tok.astype(np.int32), type=pa.int32()),
            "source": _str("source"),
        }
    )


def _engine_block_files_of_scan(blocks: DataFrame) -> list[str] | None:
    """Local file list when ``blocks`` is a bare, unfiltered scan of
    engine-written block files — else None.

    The zero-shuffle decode below is only sound when every partition's
    rows form exactly one contiguous run in exactly one file.  blk-*
    files guarantee that by construction (one encode task's output,
    content-addressed name, atomic rename — re-runs overwrite, never
    duplicate).  cmp-* files are EXCLUDED even though compact_blocks
    preserves run contiguity: compaction concatenates whatever .parquet
    files a directory holds, and a directory that ever saw the JVM-append
    encode modes (part-* files) can carry crash-window duplicate part
    rows — folded into cmp files, the same part then appears as multiple
    runs, which the grouped path collapses (by_col last-wins) but a
    per-run decode would double (round-6 review finding, reproduced).
    Anything else — a filtered/joined/cached blocks DataFrame, part-*
    files, non-local storage, a mid-compaction directory (sidecar/tmp
    present) — also falls back to the general shuffle path, which assumes
    nothing about layout."""
    try:
        plan = blocks._jdf.queryExecution().optimizedPlan()
        if plan.getClass().getSimpleName() != "LogicalRelation":
            return None
        files = list(blocks.inputFiles())
    except Exception:  # noqa: BLE001 - internal API drift: use the safe path
        return None
    if not files:
        return None
    if set(blocks.columns) != {f.name for f in BLOCKS_SCHEMA.fields}:
        return None
    out: list[str] = []
    dirs: set[str] = set()
    for f in files:
        if f.startswith("file:"):
            f = "/" + f.split(":", 1)[1].lstrip("/")
        elif "://" in f:
            return None  # non-local filesystem: keep the generic path
        name = os.path.basename(f)
        if not (name.endswith(".parquet") and name.startswith("blk-")):
            return None
        out.append(f)
        dirs.add(os.path.dirname(f))
    for d in dirs:
        try:
            names = os.listdir(d)
        except OSError:
            return None
        if any(
            n.endswith(".srcs.json") or n.endswith(".inprogress") for n in names
        ):
            return None  # interrupted compaction: the generic path is safe
    return sorted(out)


def _decode_files_df(spark: SparkSession, files: list[str]) -> DataFrame:
    """mapInArrow decode over an explicit block-file list (one task per
    file; a part never spans files) — the shared body of
    decode_blocks_files and decode_blocks' fast path.

    Task dispatch is a JVM-native spark.range with one partition per file;
    each task resolves its file from the list shipped in the function
    closure.  Versus createDataFrame(+repartition) this removes both an
    exchange/stage and a pickled-python-RDD deserialization hop per task
    (measured ~0.3s of fixed overhead at the bench scale).  The closure
    grows with the file count (~100 B/file) — metadata-sized up to ~1e6
    files, the same regime every other driver-side file plan here assumes."""
    files_local = list(files)
    idx_df = spark.range(
        len(files_local), numPartitions=max(len(files_local), 1)
    )

    def dec(batches):
        import pyarrow.parquet as pq

        for batch in batches:
            for i in batch.column("id").to_pylist():
                tbl = pq.read_table(files_local[int(i)], use_threads=False)
                if tbl.num_rows == 0:
                    continue
                pids = tbl.column("part_id").to_pylist()
                start = 0
                for j in range(1, len(pids) + 1):
                    if j == len(pids) or pids[j] != pids[start]:
                        yield from _decode_part_table(
                            tbl.slice(start, j - start)
                        ).to_batches()
                        start = j

    return idx_df.mapInArrow(dec, schema=DECODED_SCHEMA)


def decode_blocks(blocks: DataFrame) -> DataFrame:
    """blocks DataFrame -> original tokens DataFrame (bit-identical rows).

    Fast path (round 6): when ``blocks`` is a bare scan of engine-written
    block files (see _engine_block_files_of_scan), decode runs shuffle-free
    with one task per file — the encoded payloads never cross an exchange
    (measured ~2x at the 10x bench scale; at 100 TB the saved payload
    shuffle is the job).  General path: groups by part_id (the blocks of
    one partition reunite) and decodes via _decode_part_table — works on
    any blocks DataFrame at the cost of shuffling payloads.
    """
    fast_files = _engine_block_files_of_scan(blocks)
    if fast_files is not None:
        return _decode_files_df(blocks.sparkSession, fast_files)

    def dec(tbl):
        # (wrapper without annotations: applyInArrow's eval-type inference
        # cannot resolve _decode_part_table's string return annotation)
        return _decode_part_table(tbl)

    return blocks.groupBy("part_id").applyInArrow(dec, schema=DECODED_SCHEMA)


def _pruned_residual(decoded: DataFrame, column: str, lo: int, hi: int) -> DataFrame:
    """Exact row-level predicate re-applied after the block-level prune
    (block stats give a superset; this makes the result exact)."""
    if column == "n_tok":
        return decoded.filter(F.col("n_tok").between(lo, hi))
    if column == "tokens":
        # block semantics: skip blocks with no token in [lo, hi]; row
        # semantics: keep rows containing at least one such token
        return decoded.filter(
            F.exists("tokens", lambda t: (t >= lo) & (t <= hi))
        )
    raise ValueError(f"no block stats for column {column!r}")


def decode_blocks_pruned(
    blocks: DataFrame, column: str, lo: int, hi: int
) -> DataFrame:
    """Zone-map-pruned decode: only partitions whose `column` stats range
    intersects [lo, hi] are shuffled + decoded; the exact predicate is
    re-applied on the decoded rows.  Blocks written before stats existed
    (stat_min null) are never pruned — correctness over savings."""
    if "stat_min" not in blocks.columns:
        # a blocks table written entirely before stats existed has no
        # stat columns at all (not just null values): the docstring's
        # never-prune promise means decode everything
        return _pruned_residual(decode_blocks(blocks), column, lo, hi)
    with_stats = blocks.filter(
        (F.col("column") == column) & F.col("stat_min").isNotNull()
    ).select("part_id", "stat_min", "stat_max")
    keep = with_stats.filter(
        (F.col("stat_max") >= lo) & (F.col("stat_min") <= hi)
    ).select("part_id")
    # parts lacking stats rows entirely (legacy blocks) must survive
    no_stats = blocks.select("part_id").distinct().join(
        with_stats.select("part_id"), "part_id", "left_anti"
    )
    surviving = blocks.join(
        F.broadcast(keep.union(no_stats)), "part_id", "left_semi"
    )
    return _pruned_residual(decode_blocks(surviving), column, lo, hi)


def decode_blocks_files_pruned(
    spark: SparkSession, blocks_path: str, column: str, lo: int, hi: int
) -> DataFrame:
    """Shuffle-free zone-map-pruned decode of a blocks directory.

    Two-pass per file: (1) read only the stats columns — parquet columnar
    layout means the payload bytes are never touched for this pass; (2) for
    surviving part_ids, read + decode the payload rows.  Files where no part
    survives cost one footer + three tiny columns; at 100 TB with a
    range-clustered layout that is the difference between scanning the
    table and scanning the matching slice.
    """
    _repair_compaction(blocks_path, conservative=True)
    files = list_input_files(blocks_path)
    files_local = list(files)
    paths_df = spark.range(
        len(files_local), numPartitions=max(len(files_local), 1)
    )

    def dec(batches):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for batch in batches:
            for path in (
                files_local[int(i)] for i in batch.column("id").to_pylist()
            ):
                meta = pq.read_table(
                    path,
                    columns=["part_id", "column", "stat_min", "stat_max"],
                    use_threads=False,
                )
                if meta.num_rows == 0:
                    continue
                is_col = pc.equal(meta.column("column"), column)
                has_stats = pc.is_valid(meta.column("stat_min"))
                hit = pc.and_(
                    pc.and_(is_col, has_stats),
                    pc.and_(
                        pc.greater_equal(meta.column("stat_max"), lo),
                        pc.less_equal(meta.column("stat_min"), hi),
                    ),
                )
                keep = set(
                    pc.filter(meta.column("part_id"), hit).to_pylist()
                )
                # legacy parts with no stats row for `column`: keep
                stats_parts = set(
                    pc.filter(
                        meta.column("part_id"), pc.and_(is_col, has_stats)
                    ).to_pylist()
                )
                keep |= set(meta.column("part_id").to_pylist()) - stats_parts
                if not keep:
                    continue  # payload never read
                tbl = pq.read_table(path, use_threads=False)
                pids = tbl.column("part_id").to_pylist()
                start = 0
                for i in range(1, len(pids) + 1):
                    if i == len(pids) or pids[i] != pids[start]:
                        if pids[start] in keep:
                            yield from _decode_part_table(
                                tbl.slice(start, i - start)
                            ).to_batches()
                        start = i

    decoded = paths_df.mapInArrow(dec, schema=DECODED_SCHEMA)
    return _pruned_residual(decoded, column, lo, hi)


def current_blocks(
    spark: SparkSession, input_path: str, blocks_path: str, mode: str = "files"
) -> DataFrame:
    """Blocks rows belonging to the input's CURRENT state.

    blocks/ accumulates history (incremental encodes, old snapshots of
    since-removed files); consumers that must mirror the input exactly —
    e.g. the encode job's --verify round-trip — filter through this.
    """
    _repair_compaction(blocks_path, conservative=True)
    blocks = spark.read.parquet(blocks_path)
    if mode in ("files", "narrow-ipc"):
        keys = [file_key(f) for f in resolve_input_files(input_path)]
        return blocks.filter(
            F.substring_index(
                F.substring_index(F.col("part_id"), "#", -1), ".", 1
            ).isin(keys)
        )
    return blocks.filter(F.col("snapshot_id") == snapshot_of(input_path))


def decode_blocks_files(spark: SparkSession, blocks_path: str) -> DataFrame:
    """Shuffle-free decode of a blocks directory.

    Every encode task writes all column rows of its partitions contiguously
    into one parquet file, so a part never spans files: one decode task per
    file reads it with pyarrow and decodes part-by-part — the payload bytes
    never cross an exchange (decode_blocks' groupBy shuffles the full
    compressed payload; at 100 TB that shuffle IS the decode job's cost).

    Every directory-reading entry point repairs interrupted compactions
    first: a crash between a bin's rename and its source deletes would
    otherwise serve that bin's rows TWICE until the next compact_blocks
    run (the sidecar protocol makes the repair exact — see
    _repair_compaction).
    """
    _repair_compaction(blocks_path, conservative=True)
    return _decode_files_df(spark, list_input_files(blocks_path))


def compact_blocks(
    spark: SparkSession,
    blocks_path: str,
    target_bytes: int = 256 * 1024 * 1024,
) -> dict:
    """Small-files maintenance: bin-pack a blocks directory into
    ~``target_bytes`` parquet files (the Iceberg "rewrite data files"
    compaction analog; incremental encode_job runs produce one file per
    task, and at 10^5 input files the blocks dir inherits the small-files
    problem wholesale).

    Zero shuffle and zero decode: bins are planned driver-side from file
    sizes (metadata only); each bin task concatenates its source files
    whole with pyarrow and writes one ``cmp-<id>.parquet``.  Because whole
    files concatenate in order, decode_blocks_files' invariant — a part
    never spans files, its rows stay contiguous — is preserved, and the
    stat_min/stat_max zone maps ride along so pruned decode keeps working.
    current_blocks / resume are unaffected: both key on part_id VALUES,
    never on file names.

    Crash safety: each bin writes a ``.srcs.json`` sidecar listing its
    source files before renaming the compacted file visible, then deletes
    sources, then the sidecar.  A crash between rename and source deletion
    would duplicate rows; ``_repair_compaction`` (run at the start of every
    compact_blocks) finishes the deletes from the sidecar instead.
    """
    _repair_compaction(blocks_path)
    files = [
        (f, os.stat(f).st_size)
        for f in list_input_files(blocks_path)
    ]
    # greedy consecutive bin-packing over the sorted listing; only bins
    # that actually merge >=2 files become tasks
    bins: list[list[str]] = []
    cur: list[str] = []
    acc = 0
    for f, sz in files:
        if cur and acc + sz > target_bytes:
            bins.append(cur)
            cur, acc = [], 0
        cur.append(f)
        acc += sz
    if cur:
        bins.append(cur)
    bins = [b for b in bins if len(b) >= 2]
    if not bins:
        return {"bins": 0, "files_removed": 0}

    bins_local = [json.dumps(b) for b in bins]
    bins_df = spark.range(len(bins_local), numPartitions=len(bins_local))

    def run(batches):
        import pyarrow as pa
        import pyarrow.parquet as pq

        for batch in batches:
            for srcs_json in (
                bins_local[int(i)] for i in batch.column("id").to_pylist()
            ):
                srcs = json.loads(srcs_json)
                tables = [pq.read_table(p, use_threads=False) for p in srcs]
                out = pa.concat_tables(tables, promote_options="permissive")
                cid = hashlib.sha1(
                    "".join(
                        f"{os.path.basename(p)}:{os.path.getsize(p)}"
                        for p in srcs
                    ).encode()
                ).hexdigest()[:16]
                final = os.path.join(blocks_path, f"cmp-{cid}.parquet")
                sidecar = final + ".srcs.json"
                tmp = final + ".inprogress"
                # same payload-uncompressed policy as the blk writer
                pq.write_table(out, tmp, compression=_BLK_COMPRESSION)
                with open(sidecar, "w") as f:
                    json.dump([os.path.basename(p) for p in srcs], f)
                os.rename(tmp, final)
                for p in srcs:
                    os.remove(p)
                os.remove(sidecar)
                yield pa.record_batch(
                    {"n_files": pa.array([len(srcs)], type=pa.int64())}
                )

    rows = bins_df.mapInArrow(run, schema="n_files long").collect()
    return {
        "bins": len(rows),
        "files_removed": int(sum(r["n_files"] for r in rows)),
    }


def _repair_compaction(blocks_path: str, conservative: bool = False) -> None:
    """Finish or roll back interrupted compaction bins (see compact_blocks).

    Sidecar present + compacted file present -> the rename happened: the
    compacted file is authoritative, delete any surviving sources.
    Sidecar present + no compacted file -> the bin never went visible:
    sources are authoritative, drop the sidecar (and any orphan tmp).

    ``conservative=True`` (the READ-path mode): only the forward half runs
    — finishing deletes for bins whose rename already happened (safe to
    race: once `final` exists its content is authoritative and the
    compactor would delete the same sources).  The rollback half (removing
    .inprogress tmps and dangling sidecars) is skipped, because against a
    LIVE compactor those are in-flight state, and deleting them would
    re-open the exact duplicate-rows window this protocol closes (tmp
    deleted under the compactor -> rename fails; sidecar deleted ->
    a later rename+crash leaves duplicates with no record to repair
    from).  compact_blocks itself runs the full repair under its
    single-maintenance-writer assumption."""
    try:
        names = os.listdir(blocks_path)
    except OSError:
        return
    for name in names:
        if name.endswith(".inprogress") and not conservative:
            try:
                os.remove(os.path.join(blocks_path, name))
            except OSError:
                pass
        if not name.endswith(".srcs.json"):
            continue
        sidecar = os.path.join(blocks_path, name)
        final = sidecar[: -len(".srcs.json")]
        if os.path.exists(final):
            try:
                with open(sidecar) as f:
                    for src in json.load(f):
                        p = os.path.join(blocks_path, src)
                        if os.path.exists(p):
                            os.remove(p)
            except (OSError, json.JSONDecodeError):
                continue
        elif conservative:
            continue  # in-flight bin: not ours to roll back
        try:
            os.remove(sidecar)
        except OSError:
            pass


def _task_keys_in_compacted(blocks_path: str) -> set[str]:
    """Task keys whose block rows live inside cmp-*.parquet files (one
    part_id-column read per compacted file; compaction keeps file counts
    small by construction, so this stays metadata-cheap)."""
    keys: set[str] = set()
    try:
        names = os.listdir(blocks_path)
    except OSError:
        return keys
    import pyarrow.parquet as pq

    for name in names:
        if not (name.startswith("cmp-") and name.endswith(".parquet")):
            continue
        try:
            pids = pq.read_table(
                os.path.join(blocks_path, name),
                columns=["part_id"],
                use_threads=False,
            )
        except OSError:
            continue
        keys.update(
            p.rsplit("#", 1)[-1]
            for p in set(pids.column("part_id").to_pylist())
        )
    return keys


# ----------------------------------------------------- job with resume

def snapshot_of(path: str) -> str:
    """Snapshot id for lineage.

    Iceberg-lite tables (sources/iceberg_lite.py) use their manifest's
    current snapshot id — reads and resume are then pinned to the exact
    committed file set; bare parquet dirs fall back to a content hash of
    the listing (names + sizes).
    """
    from .sources.iceberg_lite import current_snapshot_id

    snap = current_snapshot_id(path)
    if snap is not None:
        return snap
    h = hashlib.sha1(path.encode())
    try:
        for name in sorted(os.listdir(path)):
            if not name.endswith(".parquet"):
                continue
            st = os.stat(os.path.join(path, name))
            h.update(f"{name}:{st.st_size}:{st.st_mtime_ns}".encode())
    except OSError:
        pass
    return h.hexdigest()[:16]


def encode_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    target_tokens: int = TARGET_TOKENS_PER_PART,
    with_ref_baseline: bool = False,
    mode: str = "files",
) -> dict:
    """Resumable encode job: skip partitions already in the metrics table.

    mode="files" (default): zero-shuffle, python-native scan — one task per
    input file, workers read parquet via pyarrow (no JVM decode / Arrow IPC
    double pass) — the fastest scale path.
    mode="narrow": zero-shuffle mapInArrow over the JVM scan, one chunk per
    (source, input split).
    mode="grouped": salted-shuffle encode (one chunk per (source, salt)) for
    source-pure chunk layouts sized independently of the input split plan.

    Layout under output_path:
        blocks/   parquet, appended per run
        metrics/  parquet, rebuilt per run (completed part_ids live here)
    """
    blocks_path = os.path.join(output_path, "blocks")
    metrics_path = os.path.join(output_path, "metrics")
    snapshot_id = snapshot_of(input_path)

    cur_keys: set[str] | None = None
    if mode in ("files", "narrow-ipc"):
        cur_files = resolve_input_files(input_path)
        cur_keys = {file_key(f) for f in cur_files}
    else:
        df = spark.read.parquet(input_path)

    done: set[str] = set()
    if os.path.isdir(metrics_path):
        prev = spark.read.parquet(metrics_path)
        if mode in ("files", "narrow-ipc"):
            # files-mode part_ids are content-addressed per file, so any
            # previously encoded partition stays done across snapshots
            # (incremental encode: only new files run)
            prev_f = prev
        else:
            prev_f = prev.filter(F.col("snapshot_id") == snapshot_id)
        done = {
            r["part_id"]
            for r in prev_f.select("part_id").distinct().collect()
        }
        if mode == "files":
            # a metrics row is only trustworthy if its backing rows still
            # exist: either the task's own blk file, or — after
            # compact_blocks folded it away — a cmp file holding its task
            # key.  A crash between stale-generation cleanup and re-encode
            # would otherwise let a later run skip the partition and commit
            # a snapshot with those rows missing; conversely, re-encoding a
            # compacted partition would DOUBLE its rows.
            cmp_keys = _task_keys_in_compacted(blocks_path)
            done = {
                p
                for p in done
                if os.path.exists(
                    os.path.join(
                        blocks_path, f"blk-{p.split('#')[-1]}.parquet"
                    )
                )
                or p.split("#")[-1] in cmp_keys
            }

    if mode == "grouped":
        salt_map = plan_salts(df, target_tokens)
        with_pid = with_partition_id(df, salt_map)
        if done:
            # anti-join against the completed set (broadcast; metadata-sized)
            done_df = spark.createDataFrame([(p,) for p in done], ["part_id"])
            with_pid = with_pid.join(F.broadcast(done_df), "part_id", "left_anti")

        def enc(tbl):
            return _encode_partition_table(tbl, snapshot_id, with_ref_baseline)

        blocks = with_pid.groupBy("part_id").applyInArrow(enc, schema=BLOCKS_SCHEMA)
        blocks.write.mode("append").parquet(blocks_path)
    elif mode == "narrow":
        blocks = encode_table_narrow(
            df, snapshot_id, with_ref_baseline,
            skip_parts=frozenset(done) if done else None,
        )
        blocks.write.mode("append").parquet(blocks_path)
    elif mode == "narrow-ipc":
        # files-mode encode that returns payloads through the JVM writer
        # (kept for DataFrame-API composition; the default files mode below
        # writes blocks worker-natively, which measures faster and steadier)
        blocks = encode_table_files(
            spark, input_path, snapshot_id, with_ref_baseline,
            skip_parts=frozenset(done) if done else None,
            files=cur_files,
        )
        blocks.write.mode("append").parquet(blocks_path)
    else:
        meta = encode_table_files_native(
            spark, input_path, blocks_path, snapshot_id, with_ref_baseline,
            skip_parts=frozenset(done) if done else None,
            files=cur_files,
        )
        meta.count()  # execute: workers write blk-*.parquet themselves
        from .sources.iceberg_lite import write_snapshot

        write_snapshot(blocks_path)  # commit the blocks dir as a snapshot

    # Idempotent rollup: metrics := aggregate of everything in blocks/.
    # Parquet column pruning keeps the payload column unread here, so this
    # scans metadata-sized data even at 10^12-sequence scale.
    # The per-chunk groupBy-max heals the crash window between a committed
    # blocks write and the metrics write: a rerun re-appends identical
    # blocks (encode is deterministic over sorted content), and max over
    # byte-identical duplicate rows collapses them exactly as the former
    # dropDuplicates pass did — without carrying every column through a
    # dedicated deduplication exchange first.
    all_blocks = spark.read.parquet(blocks_path).select(
        "part_id", "source", "snapshot_id", "column", "codec",
        "n_values", "n_rows", "raw_bytes", "enc_bytes", "checksum", "encode_ms",
    )
    per_chunk = all_blocks.groupBy(
        "part_id", "source", "snapshot_id", "column"
    ).agg(
        F.max("n_values").alias("n_values"),
        F.max("n_rows").alias("n_rows"),
        F.max("raw_bytes").alias("raw_bytes"),
        F.max("enc_bytes").alias("enc_bytes"),
        F.max("codec").alias("codec"),
        F.max("checksum").alias("checksum"),
        F.max("encode_ms").alias("encode_ms"),
    )
    metrics = (
        per_chunk
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
    # persist before the write so the final report aggregates the cached
    # rows instead of re-reading the parquet it just wrote (one fewer
    # scan+job per encode run; content is identical by construction)
    from pyspark import StorageLevel

    metrics = metrics.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        tmp_metrics = metrics_path + "_tmp"
        metrics.write.mode("overwrite").parquet(tmp_metrics)
        # atomic-ish swap: a crash mid-write never corrupts the resume state
        if os.path.isdir(metrics_path):
            os.rename(metrics_path, metrics_path + "_old")
        os.rename(tmp_metrics, metrics_path)
        if os.path.isdir(metrics_path + "_old"):
            import shutil

            shutil.rmtree(metrics_path + "_old", ignore_errors=True)

        m = metrics  # cached; byte-equal to what metrics_path now holds
        if mode in ("files", "narrow-ipc"):
            # report over the CURRENT snapshot's file set: partitions
            # encoded under earlier snapshots count if their file is still
            # in the table; partitions of removed files do not
            m = m.filter(
                F.substring_index(
                    F.substring_index(F.col("part_id"), "#", -1), ".", 1
                ).isin(list(cur_keys))
            )
        else:
            m = m.filter(F.col("snapshot_id") == snapshot_id)
        agg = m.agg(
            F.count("*").alias("parts"),
            F.sum("n_rows").alias("rows"),
            F.sum("n_tokens").alias("tokens"),
            F.sum("raw_bytes").alias("raw"),
            F.sum("enc_bytes").alias("enc"),
        ).collect()[0]
    finally:
        # a failed write/swap/report must not pin the cache for the
        # session's lifetime
        metrics.unpersist(blocking=False)
    return {
        "snapshot_id": snapshot_id,
        "partitions": agg["parts"],
        "rows": int(agg["rows"] or 0),
        "tokens": int(agg["tokens"] or 0),
        "raw_bytes": int(agg["raw"] or 0),
        "enc_bytes": int(agg["enc"] or 0),
        "resumed_skipped": (
            len({p for p in done if p.split("#")[-1].split(".")[0] in cur_keys})
            if mode in ("files", "narrow-ipc")
            else len(done)
        ),
        "mode": mode,
        "salt_map": json.dumps(salt_map) if mode == "grouped" else None,
    }
