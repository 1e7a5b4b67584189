import pytest


@pytest.fixture(scope="session")
def spark():
    from parquet_python_spark.session import get_spark

    s = get_spark("pps-tests", cpus=8, shuffle_partitions=8)
    yield s
    s.stop()
