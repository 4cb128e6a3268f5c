from __future__ import annotations

import pytest

from hadoop_0_20_2_ljx_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_T2 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="ljx-tests", shuffle_partitions=8)
    yield s
    s.stop()
