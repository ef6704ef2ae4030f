from __future__ import annotations

import pytest

from influxdb_iox_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="iox-spark-tests",
        master="local[4]",
        shuffle_partitions=2,
        extra_conf={"spark.default.parallelism": "4"},
    )
    yield s
    s.stop()
