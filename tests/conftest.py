from __future__ import annotations

import pytest

from storm_focused_crawler_spark.sources.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="sfc-tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
