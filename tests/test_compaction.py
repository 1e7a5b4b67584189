"""Blocks-directory compaction (the Iceberg "rewrite data files" analog):
bin-packing, decode equivalence, zone-map preservation, crash repair, and
stale-generation rewrite inside compacted files."""

import json
import os

import pytest
from pyspark.sql import functions as F

from parquet_python_spark.engine import (
    compact_blocks,
    decode_blocks_files,
    decode_blocks_files_pruned,
    encode_table_files,
    list_input_files,
)
from parquet_python_spark.tokengen import generate_tokens_df

N_ROWS = 600
SEED = 9


def _rows(df):
    rows = df.select("doc_id", "tokens", "n_tok", "source").collect()
    return sorted(
        ((r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"]) for r in rows)
    )


@pytest.fixture()
def blocks_dir(spark, tmp_path):
    df = generate_tokens_df(spark, N_ROWS, SEED)
    inp = str(tmp_path / "inp")
    df.repartition(8).write.parquet(inp)
    bdir = str(tmp_path / "blocks")
    encode_table_files(spark, inp, snapshot_id="t").write.parquet(bdir)
    return inp, bdir


def test_compact_reduces_files_and_preserves_decode(spark, blocks_dir):
    inp, bdir = blocks_dir
    want = _rows(decode_blocks_files(spark, bdir))
    n_before = len(list_input_files(bdir))
    stats = compact_blocks(spark, bdir, target_bytes=1 << 30)
    n_after = len(list_input_files(bdir))
    assert stats["bins"] >= 1 and stats["files_removed"] >= 2
    assert n_after < n_before
    assert _rows(decode_blocks_files(spark, bdir)) == want


def test_compact_preserves_zone_map_pruning(spark, tmp_path):
    df = generate_tokens_df(spark, N_ROWS, SEED)
    inp = str(tmp_path / "inp")
    df.repartitionByRange(6, "n_tok").write.parquet(inp)
    bdir = str(tmp_path / "blocks")
    encode_table_files(spark, inp, snapshot_id="t").write.parquet(bdir)
    want = _rows(df.filter(F.col("n_tok").between(16, 32)))
    compact_blocks(spark, bdir, target_bytes=1 << 30)
    got = _rows(decode_blocks_files_pruned(spark, bdir, "n_tok", 16, 32))
    assert got == want and len(want) > 0


def test_compact_respects_target_bytes(spark, blocks_dir):
    _inp, bdir = blocks_dir
    sizes = [os.path.getsize(f) for f in list_input_files(bdir)]
    # a target just above the largest file forces multiple bins
    target = max(sizes) + 1
    compact_blocks(spark, bdir, target_bytes=target)
    assert len(list_input_files(bdir)) > 1


def test_repair_finishes_interrupted_bin(spark, blocks_dir):
    """cmp file renamed visible but sources not yet deleted -> repair
    deletes the sources instead of double-counting their rows."""
    inp, bdir = blocks_dir
    want = _rows(decode_blocks_files(spark, bdir))
    compact_blocks(spark, bdir, target_bytes=1 << 30)
    cmp_files = [
        f for f in list_input_files(bdir) if os.path.basename(f).startswith("cmp-")
    ]
    assert cmp_files
    # simulate the crash window: re-create a sidecar claiming a source that
    # still exists (copy one cmp file back out as a fake leftover source)
    leftover = os.path.join(bdir, "blk-leftover.parquet")
    import shutil

    shutil.copy(cmp_files[0], leftover)
    with open(cmp_files[0] + ".srcs.json", "w") as f:
        json.dump([os.path.basename(leftover)], f)
    # next compaction repairs first: leftover source removed, rows not doubled
    compact_blocks(spark, bdir, target_bytes=1 << 30)
    assert not os.path.exists(leftover)
    assert _rows(decode_blocks_files(spark, bdir)) == want


def test_repair_rolls_back_invisible_bin(spark, blocks_dir):
    """Sidecar without a visible cmp file -> sources stay authoritative."""
    inp, bdir = blocks_dir
    want = _rows(decode_blocks_files(spark, bdir))
    srcs = [os.path.basename(f) for f in list_input_files(bdir)[:2]]
    ghost = os.path.join(bdir, "cmp-deadbeef.parquet")
    with open(ghost + ".srcs.json", "w") as f:
        json.dump(srcs, f)
    with open(ghost + ".inprogress", "w") as f:
        f.write("junk")
    compact_blocks(spark, bdir, target_bytes=1 << 30)
    assert not os.path.exists(ghost + ".srcs.json")
    assert not os.path.exists(ghost + ".inprogress")
    assert _rows(decode_blocks_files(spark, bdir)) == want


def test_stale_generation_rewritten_inside_compacted(spark, tmp_path):
    """After compaction, re-encoding a changed input file must not
    double-count: the stale rows inside cmp files are rewritten away."""
    import time as _time

    from parquet_python_spark.engine import current_blocks, encode_job

    df = generate_tokens_df(spark, N_ROWS, SEED)
    inp = str(tmp_path / "inp")
    df.repartition(4).write.parquet(inp)
    out = str(tmp_path / "enc")
    encode_job(spark, inp, out, mode="files")
    bdir = os.path.join(out, "blocks")
    compact_blocks(spark, bdir, target_bytes=1 << 30)

    # rewrite one input file in place (same name, new mtime -> new file key)
    victim = sorted(
        f for f in os.listdir(inp) if f.endswith(".parquet")
    )[0]
    vpath = os.path.join(inp, victim)
    _time.sleep(0.01)
    os.utime(vpath)

    encode_job(spark, inp, out, mode="files")
    # the rewritten file's old generation is history (new file key); the
    # CURRENT view must hold exactly one generation of every row, including
    # rows that now live inside cmp files
    from parquet_python_spark.engine import decode_blocks

    cur = current_blocks(spark, inp, bdir, mode="files")
    assert _rows(decode_blocks(cur)) == _rows(df)
    n_rows_cur = cur.filter(F.col("column") == "doc_id").agg(
        F.sum("n_rows")
    ).collect()[0][0]
    assert int(n_rows_cur) == N_ROWS


def test_resume_after_compaction_skips_everything(spark, tmp_path):
    """Compaction must not invalidate the resume checkpoint: a re-run over
    the unchanged input encodes zero new partitions (keys found in cmp)."""
    from parquet_python_spark.engine import encode_job

    df = generate_tokens_df(spark, N_ROWS, SEED)
    inp = str(tmp_path / "inp")
    df.repartition(4).write.parquet(inp)
    out = str(tmp_path / "enc")
    m1 = encode_job(spark, inp, out, mode="files")
    bdir = os.path.join(out, "blocks")
    compact_blocks(spark, bdir, target_bytes=1 << 30)
    m2 = encode_job(spark, inp, out, mode="files")
    assert m2["resumed_skipped"] == m1["partitions"]
    assert _rows(decode_blocks_files(spark, bdir)) == _rows(df)


def test_read_path_repair_is_conservative(spark, blocks_dir):
    """Readers finish completed bins (dedup) but never touch in-flight
    state: a live compactor's .inprogress tmp and dangling sidecar must
    survive a concurrent read, while a completed bin's leftover sources
    are removed before rows are served twice."""
    import shutil

    inp, bdir = blocks_dir
    want = _rows(decode_blocks_files(spark, bdir))
    compact_blocks(spark, bdir, target_bytes=1 << 30)
    cmp_files = [
        f for f in list_input_files(bdir)
        if os.path.basename(f).startswith("cmp-")
    ]
    assert cmp_files

    # simulate a LIVE compactor mid-bin: tmp + sidecar, no final yet
    ghost = os.path.join(bdir, "cmp-feedface.parquet")
    with open(ghost + ".srcs.json", "w") as f:
        json.dump([os.path.basename(list_input_files(bdir)[0])], f)
    with open(ghost + ".inprogress", "w") as f:
        f.write("live")

    # and a completed bin whose source deletes were interrupted
    leftover = os.path.join(bdir, "blk-leftover2.parquet")
    shutil.copy(cmp_files[0], leftover)
    with open(cmp_files[0] + ".srcs.json", "w") as f:
        json.dump([os.path.basename(leftover)], f)

    got = _rows(decode_blocks_files(spark, bdir))
    # completed bin healed on the read path: no double rows
    assert got == want
    assert not os.path.exists(leftover)
    # in-flight bin untouched by the read path
    assert os.path.exists(ghost + ".inprogress")
    assert os.path.exists(ghost + ".srcs.json")
    # the maintenance path (full repair) then rolls it back
    compact_blocks(spark, bdir, target_bytes=1 << 30)
    assert not os.path.exists(ghost + ".inprogress")
    assert not os.path.exists(ghost + ".srcs.json")


def test_compact_preserves_chunk_stats_and_bloom(spark, tmp_path):
    """Round-4: per-chunk metadata survives compaction byte-for-byte —
    both the stat_min/stat_max zone maps and the generic-codec bloom
    bitsets — and both prune paths still return exact rows at the same
    selectivity on the compacted table."""
    from parquet_python_spark.operators.generic_codec import (
        _arrow_safe_schema,
        decode_df_pruned,
        decode_df_pruned_eq,
        encode_df,
    )

    df = spark.range(20_000).select(
        F.col("id").alias("k"), (F.col("id") % 911).alias("v")
    )
    kinds = {"k": "int", "v": "int"}
    bdir = str(tmp_path / "gc_blocks")
    # repartition by part_id so the write lands as several files (AQE
    # otherwise coalesces this tiny blocks table into one file and
    # compaction has nothing to merge); generic blocks decode groups by
    # part_id values, so file layout is free to choose
    encode_df(df, "k", kinds, n_parts=8, partitioning="range").repartition(
        4, "part_id"
    ).write.parquet(bdir)

    def meta_map(blocks):
        return {
            (r["part_id"], r["column"]): (
                r["stat_min"],
                r["stat_max"],
                None if r["bloom"] is None else bytes(r["bloom"]),
            )
            for r in blocks.select(
                "part_id", "column", "stat_min", "stat_max", "bloom"
            ).collect()
        }

    before = meta_map(spark.read.parquet(bdir))
    n_files_before = len(list_input_files(bdir))
    stats = compact_blocks(spark, bdir, target_bytes=1 << 30)
    assert stats["files_removed"] >= 2
    assert len(list_input_files(bdir)) < n_files_before
    blocks = spark.read.parquet(bdir)
    assert meta_map(blocks) == before  # stats AND bitsets byte-identical

    out_schema = _arrow_safe_schema(df.select(*kinds).schema, kinds)
    # range prune on the compacted table: exact rows
    dec = decode_df_pruned(blocks, "k", kinds, out_schema, "k", 500, 900)
    got = sorted(
        tuple(r) for r in dec.filter(F.col("k").between(500, 900)).collect()
    )
    exp = sorted(tuple(r) for r in df.filter(F.col("k").between(500, 900)).collect())
    assert got == exp
    # same selectivity as pre-compaction (stats rows intact per part)
    kept = blocks.filter(
        (F.col("column") == "k") & (F.col("stat_max") >= 500) & (F.col("stat_min") <= 900)
    ).count()
    assert kept < blocks.filter(F.col("column") == "k").count()
    # bloom point lookup on the compacted table: exact rows
    dec_eq = decode_df_pruned_eq(blocks, "k", kinds, out_schema, "k", 12_345)
    got_eq = sorted(tuple(r) for r in dec_eq.filter(F.col("k") == 12_345).collect())
    exp_eq = sorted(tuple(r) for r in df.filter(F.col("k") == 12_345).collect())
    assert got_eq == exp_eq and len(got_eq) == 1
