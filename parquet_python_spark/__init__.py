"""parquet_python_spark — a from-scratch PySpark-native per-column
lightweight-compression engine superseding jcrobak/parquet-python's codec
suite (see SURVEY.md).  Pure-numpy kernels live in `codecs/`; the Spark
pipeline (encode/decode/applyInPandas, salting, checkpoint/resume, lineage)
lives in `engine.py`."""

__version__ = "0.1.0"
