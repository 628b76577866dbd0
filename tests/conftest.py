from __future__ import annotations

import pytest

from hielo_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="hielo_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def spark_prop(spark):
    """Session alias for hypothesis tests (function-scoped @given bodies
    can't take a session fixture named the same as the module-scoped one
    used elsewhere with different lifetimes)."""
    return spark
