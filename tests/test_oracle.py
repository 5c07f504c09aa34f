"""Every registered query with an oracle must hash-match DuckDB.

This replays the driver's t2 gate locally at sf0.001 (the driver runs
sf0.01; same data generator, ×10 rows).
"""

from __future__ import annotations

import pytest

from mongo2mysql_spark.queries import load_all
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duck_connection

REGISTRY = load_all()


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    if q.oracle is None:
        # rows-only check, mirroring the driver's weaker gate
        assert df.count() >= 0
        return
    problems = compare(df, duck, q.oracle)
    assert not problems, f"{name}: " + " | ".join(problems)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
