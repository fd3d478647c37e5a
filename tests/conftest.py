from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from dopams_etl_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


# session-scoped alias for hypothesis-driven tests (@given can't take a
# function-scoped fixture)
@pytest.fixture(scope="session")
def spark_global(spark):
    return spark
