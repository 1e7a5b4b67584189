"""End-to-end Spark engine tests: encode -> blocks -> decode bit-identity,
skew salting, checkpoint/resume, size gate (north-rule correctness gates)."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from parquet_python_spark.engine import (
    decode_blocks,
    encode_job,
    encode_table,
    plan_salts,
    with_partition_id,
)
from parquet_python_spark.tokengen import generate_tokens_df

N_ROWS = 800
SEED = 42


@pytest.fixture(scope="module")
def tokens_df(spark):
    df = generate_tokens_df(spark, N_ROWS, SEED).cache()
    df.count()
    return df


def _as_sorted_rows(df):
    rows = df.select("doc_id", "tokens", "n_tok", "source").collect()
    return sorted(
        ((r["doc_id"], tuple(r["tokens"]), r["n_tok"], r["source"]) for r in rows)
    )


def test_tokengen_deterministic_across_parallelism(spark):
    a = generate_tokens_df(spark, 200, SEED, partitions=2)
    b = generate_tokens_df(spark, 200, SEED, partitions=7)
    assert _as_sorted_rows(a) == _as_sorted_rows(b)


def test_tokengen_invariants(tokens_df):
    bad = tokens_df.filter(F.size("tokens") != F.col("n_tok")).count()
    assert bad == 0
    sources = {r["source"] for r in tokens_df.select("source").distinct().collect()}
    assert sources == {"lowcard", "runny", "narrow", "texty", "random"}


def test_encode_decode_bit_identity(spark, tokens_df):
    """North-rule gate: engine encode -> decode reproduces every token array
    bit-identically."""
    blocks = encode_table(tokens_df, snapshot_id="t", with_ref_baseline=True)
    blocks = blocks.cache()
    decoded = decode_blocks(blocks)
    assert _as_sorted_rows(decoded) == _as_sorted_rows(tokens_df)


def test_size_gate_vs_reference_dict(spark, tokens_df):
    """Compressed tokens size <= the reference's RLE/dict output on every
    partition (ref_dict_bytes is the reference wire format size computed on
    the identical values)."""
    blocks = encode_table(tokens_df, snapshot_id="t", with_ref_baseline=True)
    rows = blocks.filter(F.col("column") == "tokens").select(
        "part_id", "codec", "enc_bytes", "ref_dict_bytes"
    ).collect()
    assert rows
    for r in rows:
        assert r["enc_bytes"] <= r["ref_dict_bytes"], (
            r["part_id"], r["codec"], r["enc_bytes"], r["ref_dict_bytes"],
        )


def test_selector_matches_profiles(spark, tokens_df):
    """Codec auto-selection per source matches FIXTURES.md expectations."""
    blocks = encode_table(
        tokens_df, snapshot_id="t", target_tokens=10_000_000
    )
    picks = {
        r["source"]: r["codec"]
        for r in blocks.filter(F.col("column") == "tokens")
        .select("source", "codec")
        .collect()
    }
    assert picks["runny"] == "rle"
    assert picks["narrow"] == "for"
    assert picks["lowcard"] == "dict"
    assert picks["random"] in ("bitpack", "for")
    assert picks["texty"] in ("fsst", "dict")


def test_salting_splits_skewed_source(spark, tokens_df):
    salt_map = plan_salts(tokens_df, target_tokens=20_000)
    # 'random' holds ~60% of rows -> must fan out over multiple salts
    assert salt_map["random"] > 1
    pid = with_partition_id(tokens_df, salt_map)
    per_part = (
        pid.filter(F.col("source") == "random")
        .groupBy("part_id")
        .agg(F.sum("n_tok").alias("t"))
        .collect()
    )
    assert len(per_part) == salt_map["random"]
    # no empty buckets and rough balance (within 4x of each other)
    totals = [r["t"] for r in per_part]
    assert min(totals) > 0 and max(totals) / min(totals) < 4


def test_encode_narrow_bit_identity(spark, tokens_df):
    """Zero-shuffle narrow mode must round-trip bit-identically too."""
    from parquet_python_spark.engine import encode_table_narrow

    blocks = encode_table_narrow(tokens_df, snapshot_id="t")
    decoded = decode_blocks(blocks)
    assert _as_sorted_rows(decoded) == _as_sorted_rows(tokens_df)


def test_encode_files_and_decode_files_bit_identity(spark, tokens_df, tmp_path):
    """files mode (python-native scan) + shuffle-free decode round-trip."""
    from parquet_python_spark.engine import decode_blocks_files, encode_table_files

    inp = str(tmp_path / "ftokens")
    tokens_df.repartition(5).write.parquet(inp)
    blocks_dir = str(tmp_path / "fblocks")
    encode_table_files(spark, inp, snapshot_id="t").write.parquet(blocks_dir)

    # general (shuffling) decode and the shuffle-free file decode agree
    decoded_g = decode_blocks(spark.read.parquet(blocks_dir))
    decoded_f = decode_blocks_files(spark, blocks_dir)
    want = _as_sorted_rows(spark.read.parquet(inp))
    assert _as_sorted_rows(decoded_f) == want
    assert _as_sorted_rows(decoded_g) == want


@pytest.mark.parametrize("mode", ["files", "narrow", "grouped"])
def test_encode_job_resume(spark, tokens_df, tmp_path, mode):
    """Checkpoint/resume: a second run over the same snapshot encodes zero
    new partitions; blocks stay complete and decodable."""
    inp = str(tmp_path / "input")
    out = str(tmp_path / "encoded")
    tokens_df.write.parquet(inp)

    m1 = encode_job(spark, inp, out, target_tokens=50_000, mode=mode)
    assert m1["resumed_skipped"] == 0
    assert m1["rows"] == N_ROWS

    m2 = encode_job(spark, inp, out, target_tokens=50_000, mode=mode)
    assert m2["resumed_skipped"] == m1["partitions"]
    assert m2["rows"] == N_ROWS  # no duplicates from the rerun

    blocks = spark.read.parquet(os.path.join(out, "blocks"))
    decoded = decode_blocks(blocks)
    src = spark.read.parquet(inp)
    assert _as_sorted_rows(decoded) == _as_sorted_rows(src)


def test_metrics_lineage_columns(spark, tokens_df, tmp_path):
    inp = str(tmp_path / "input")
    out = str(tmp_path / "encoded")
    tokens_df.write.parquet(inp)
    encode_job(spark, inp, out)
    m = spark.read.parquet(os.path.join(out, "metrics"))
    cols = set(m.columns)
    assert {
        "part_id", "source", "snapshot_id", "n_rows", "n_tokens",
        "raw_bytes", "enc_bytes", "tokens_codec", "checksum", "encode_ms",
    } <= cols
    assert m.filter(F.col("snapshot_id") == "").count() == 0


def test_decode_detects_corruption(spark, tokens_df):
    blocks = encode_table(tokens_df, snapshot_id="t")
    tampered = blocks.withColumn(
        "payload",
        F.when(F.col("column") == "tokens", F.concat(F.col("payload"), F.lit(b"x")))
        .otherwise(F.col("payload")),
    )
    with pytest.raises(Exception):
        decode_blocks(tampered).collect()
def test_files_mode_splits_large_files_by_row_group(spark, tmp_path):
    """Skew defense: a file bigger than max_task_bytes becomes several
    row-group-range tasks with content-addressed sub-keys."""
    from parquet_python_spark.engine import (
        _plan_file_tasks,
        decode_blocks,
        encode_table_files,
        list_input_files,
    )
    from parquet_python_spark.tokengen import generate_tokens_df

    inp = str(tmp_path / "big")
    # one file, several small row groups
    (generate_tokens_df(spark, 600, 11, partitions=1)
        .coalesce(1).write.option("parquet.block.size", 64 * 1024).parquet(inp))
    files = list_input_files(inp)
    assert len(files) == 1
    tasks = _plan_file_tasks(files, max_task_bytes=96 * 1024)
    assert len(tasks) > 1
    assert all(t[0].count(".rg") == 1 for t in tasks)

    blocks = encode_table_files(
        spark, inp, snapshot_id="t", max_task_bytes=96 * 1024
    )
    decoded = decode_blocks(blocks)
    src = spark.read.parquet(inp)
    assert _as_sorted_rows(decoded) == _as_sorted_rows(src)



# ------------------------------------------------- zone-map pruned decode

def test_block_stats_present(spark, tokens_df):
    """Every int-column block row carries min/max zone-map stats."""
    blocks = encode_table(tokens_df, snapshot_id="t")
    rows = blocks.filter(F.col("column").isin("tokens", "n_tok")).select(
        "column", "stat_min", "stat_max"
    ).collect()
    assert rows
    for r in rows:
        assert r["stat_min"] is not None and r["stat_min"] <= r["stat_max"]
    # string columns carry no int stats
    s = blocks.filter(F.col("column") == "doc_id").select("stat_min").collect()
    assert all(r["stat_min"] is None for r in s)


@pytest.fixture(scope="module")
def clustered_blocks(spark, tokens_df, tmp_path_factory):
    """tokens table range-clustered by n_tok -> selective zone maps."""
    base = tmp_path_factory.mktemp("pruned")
    inp = str(base / "inp")
    tokens_df.repartitionByRange(6, "n_tok").write.parquet(inp)
    from parquet_python_spark.engine import encode_table_files

    blocks_dir = str(base / "blocks")
    encode_table_files(spark, inp, snapshot_id="t").write.parquet(blocks_dir)
    return inp, blocks_dir


def test_decode_pruned_ntok_exact_and_selective(spark, tokens_df, clustered_blocks):
    from parquet_python_spark.engine import decode_blocks_pruned

    _inp, blocks_dir = clustered_blocks
    blocks = spark.read.parquet(blocks_dir)
    lo, hi = 16, 32
    want = _as_sorted_rows(tokens_df.filter(F.col("n_tok").between(lo, hi)))
    got = _as_sorted_rows(decode_blocks_pruned(blocks, "n_tok", lo, hi))
    assert got == want and len(want) > 0

    # the zone maps actually prune: surviving parts < total parts
    stats = blocks.filter(F.col("column") == "n_tok")
    total = stats.select("part_id").distinct().count()
    surviving = stats.filter(
        (F.col("stat_max") >= lo) & (F.col("stat_min") <= lo + 16)
    ).select("part_id").distinct().count()
    assert surviving < total


def test_decode_files_pruned_matches_shuffled(spark, tokens_df, clustered_blocks):
    from parquet_python_spark.engine import decode_blocks_files_pruned

    _inp, blocks_dir = clustered_blocks
    lo, hi = 16, 32
    want = _as_sorted_rows(tokens_df.filter(F.col("n_tok").between(lo, hi)))
    got = _as_sorted_rows(
        decode_blocks_files_pruned(spark, blocks_dir, "n_tok", lo, hi)
    )
    assert got == want


def test_decode_pruned_token_value_range(spark, tokens_df, clustered_blocks):
    """Pruning on token VALUES: keep rows containing a token in [lo, hi];
    blocks whose token range misses it are skipped wholesale."""
    from parquet_python_spark.engine import decode_blocks_pruned

    _inp, blocks_dir = clustered_blocks
    blocks = spark.read.parquet(blocks_dir)
    lo, hi = 0, 3
    want = _as_sorted_rows(
        tokens_df.filter(F.exists("tokens", lambda t: (t >= lo) & (t <= hi)))
    )
    got = _as_sorted_rows(decode_blocks_pruned(blocks, "tokens", lo, hi))
    assert got == want


def test_decode_pruned_empty_range(spark, clustered_blocks):
    from parquet_python_spark.engine import (
        decode_blocks_files_pruned,
        decode_blocks_pruned,
    )

    _inp, blocks_dir = clustered_blocks
    blocks = spark.read.parquet(blocks_dir)
    assert decode_blocks_pruned(blocks, "n_tok", -10, -5).count() == 0
    assert (
        decode_blocks_files_pruned(spark, blocks_dir, "n_tok", -10, -5).count()
        == 0
    )


def test_decode_blocks_fast_path_zero_payload_shuffle(spark, tokens_df, tmp_path):
    """Round-6 optimization: decode_blocks over a bare scan of engine-written
    blk files must take the shuffle-free per-file path (no
    FlatMapGroupsInArrow / no payload exchange), produce rows identical to
    the generic grouped path, and fall back to the grouped path for any
    non-bare-scan input."""
    inp = str(tmp_path / "tok")
    out = str(tmp_path / "enc")
    tokens_df.write.parquet(inp)
    encode_job(spark, inp, out)
    blocks = spark.read.parquet(os.path.join(out, "blocks"))

    fast = decode_blocks(blocks)
    fast_plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInArrow" not in fast_plan  # shuffle-free path taken
    assert "MapInArrow" in fast_plan

    generic = decode_blocks(blocks.filter(F.col("n_rows") >= 0))  # not bare
    generic_plan = generic._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInArrow" in generic_plan  # fallback engaged

    assert _as_sorted_rows(fast) == _as_sorted_rows(generic)
