from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from dopams_etl_spark.session import get_spark

    s = get_spark("tests", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
