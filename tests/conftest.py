from __future__ import annotations

import pytest

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from spark_ml_helper_spark.session import get_spark

    s = get_spark(cpus=8)
    yield s


@pytest.fixture(scope="session")
def duck():
    from spark_ml_helper_spark.check import duckdb_connect

    return duckdb_connect(SF_ORACLE)
