from __future__ import annotations

import os

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
    from etl_stream_spark.session import get_spark

    spark = get_spark(app_name="etl_stream_spark_tests", shuffle_partitions=4)
    yield spark
