from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from crawspark.session import get_spark
    s = get_spark(master="local[4]", app="crawspark-tests",
                  shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
