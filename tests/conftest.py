from __future__ import annotations

import pytest

from crawlee_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("crawlee_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
