"""SparkSession factory with engine defaults (local-mode stand-in for a
multi-executor cluster; parallelism via SPARK_GRAFT_CPUS)."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "parquet-python-spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or max(cpus, 32)
    # Keep freed heap mapped in python workers (they inherit this env via the
    # JVM): the kernels allocate/free multi-MB numpy buffers per chunk, and
    # glibc's default mmap/munmap churn makes every reuse re-fault pages —
    # measured as a multi-x slowdown under 32 concurrent workers here.
    os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", "536870912")
    os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", "536870912")
    # Route pyarrow through the (retention-tuned) glibc allocator: jemalloc's
    # aggressive page purging re-faults hot buffers; measured 2x encode
    # throughput at 32 workers on this host.
    os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # same allocator policy on real (non-local) executors
        .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_", "536870912")
        .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_", "536870912")
        .config("spark.executorEnv.ARROW_DEFAULT_MEMORY_POOL", "system")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
