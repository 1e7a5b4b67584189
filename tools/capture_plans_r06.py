"""Capture .explain('formatted') for every round-6-touched query.

Usage: python tools/capture_plans_r06.py <out_dir> <suffix>
Run once from the round-5 tree (suffix 'before') and once from HEAD
(suffix 'after'); the driver checks plan claims against these files.
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402


def fmt(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    sf = "/root/testdata/sf0.01"
    os.environ["SF_DIR"] = sf

    from parquet_python_spark.engine import decode_blocks, encode_job
    from parquet_python_spark.operators.pipeline_ops import (
        dedup_keep_canonical,
        dedup_minhash_candidates,
    )
    from parquet_python_spark.session import get_spark
    from parquet_python_spark.tokengen import write_tokens_table

    import __spark_entry__ as e

    spark = get_spark("plans_r06")
    spark.sparkContext.setLogLevel("ERROR")
    qs = e.queries()

    plans: dict[str, str] = {}
    for name in [
        "rt_lineitem_ints",
        "rt_documents_auto",
        "rt_events_dict",
        "text_metrics",
        "quality_filters",
        "dedup_minhash",
    ]:
        plans[name] = fmt(qs[name](spark, sf))

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    plans["dedup_pipeline"] = fmt(
        dedup_keep_canonical(docs, dedup_minhash_candidates(docs)).select(
            "doc_id", "component_id", "keep"
        )
    )

    work = tempfile.mkdtemp(prefix="pps_plans_")
    write_tokens_table(spark, f"{work}/tok", 4000, seed=7)
    encode_job(spark, f"{work}/tok", f"{work}/enc")
    plans["decode_tokens"] = fmt(
        decode_blocks(spark.read.parquet(f"{work}/enc/blocks")).agg(
            F.sum("n_tok")
        )
    )

    for name, text in plans.items():
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(text)
        print(f"wrote {name}_{suffix}.txt "
              f"(Exchange={text.count('Exchange')}, "
              f"GroupMapArrow={text.count('FlatMapGroupsInArrow')}, "
              f"MapInArrow={text.count('MapInArrow')})")
    spark.stop()


if __name__ == "__main__":
    main()
