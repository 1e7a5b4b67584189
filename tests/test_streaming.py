"""Structured Streaming encode: files arriving over time are encoded into
the same blocks layout, decodable bit-identically, exactly once."""

import os

from pyspark.sql import functions as F

from parquet_python_spark.engine import decode_blocks
from parquet_python_spark.streaming.stream_encode import start_stream_encode
from parquet_python_spark.tokengen import generate_tokens_df


def test_stream_encode_two_batches(spark, tmp_path):
    inp = str(tmp_path / "arriving")
    out = str(tmp_path / "stream_out")
    os.makedirs(inp)

    # batch 1 lands
    df1 = generate_tokens_df(spark, 200, seed=42, partitions=2)
    df1.write.mode("append").parquet(inp)
    q = start_stream_encode(spark, inp, out, trigger_once=True)
    q.awaitTermination(120)

    # batch 2 lands later; availableNow picks up only the new files
    df2 = generate_tokens_df(spark, 150, seed=43, partitions=2)
    df2.write.mode("append").parquet(inp)
    q = start_stream_encode(spark, inp, out, trigger_once=True)
    q.awaitTermination(120)

    blocks = spark.read.parquet(os.path.join(out, "blocks"))
    decoded = decode_blocks(blocks)
    src = spark.read.parquet(inp)
    assert decoded.count() == src.count() == 350
    assert decoded.exceptAll(src).count() == 0
    assert src.exceptAll(decoded).count() == 0
    # two distinct micro-batch snapshots recorded in lineage
    snaps = {r["snapshot_id"] for r in blocks.select("snapshot_id").distinct().collect()}
    assert snaps == {"stream-0", "stream-1"}
    # exactly-once: every (part_id, column) appears once
    assert (
        blocks.count()
        == blocks.select("part_id", "column").distinct().count()
    )
