from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")


@pytest.fixture(scope="session")
def spark():
    from streaming_data_pipeline_spark.session import get_spark

    s = get_spark(app_name="sdp-tests", shuffle_partitions=8)
    yield s
