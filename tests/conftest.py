from __future__ import annotations

import pytest

from storm_focused_crawler_spark.sources.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="sfc-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    import os

    return os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
