from __future__ import annotations

import pytest

from mongo2mysql_spark.session import build_session

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="mongo2mysql_spark-tests",
        master="local[8]",
        shuffle_partitions=8,
    )
    yield s
    s.stop()
