"""Structured Streaming encode: continuously encode token files as they land.

The reference is strictly batch (file-at-a-time, SURVEY.md §2.4 'Streaming:
none'); this is new engine surface.  Design: readStream over the input dir ->
foreachBatch(narrow encode -> append blocks + metrics).  foreachBatch (rather
than a row-wise sink) keeps the whole batch path identical to the batch
engine — same kernels, same blocks schema, same lineage — and Structured
Streaming's checkpoint gives exactly-once per micro-batch on top of the
engine's own per-partition resume.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..engine import encode_table_narrow
from ..tokengen import SCHEMA


def start_stream_encode(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    trigger_once: bool = False,
    max_files_per_trigger: int = 8,
):
    """Start (or run once) the streaming encode job; returns the query.

    Blocks land under output_path/blocks, stream checkpoint under
    output_path/_checkpoint.  part_id = f"{source}#{batch_id}.{split}" keys
    lineage to the micro-batch.
    """
    blocks_path = os.path.join(output_path, "blocks")
    checkpoint = os.path.join(output_path, "_checkpoint")

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_path)
    )

    def sink(batch_df, batch_id: int) -> None:
        blocks = encode_table_narrow(
            batch_df, snapshot_id=f"stream-{batch_id}", part_prefix=f"b{batch_id}."
        )
        blocks.write.mode("append").parquet(blocks_path)

    writer = stream.writeStream.foreachBatch(sink).option(
        "checkpointLocation", checkpoint
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
