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


# the heaviest sf0.001 replays (>20 s each) carry the slow marker: the
# driver's own sf0.01 correctness gate covers every slot anyway, and
# the full suite (including slow) is run and recorded at each round
# close — see pytest.ini
_SLOW_SLOTS = {
    "etl_pipeline_e2e", "semdedup_planted", "dedup_connected_components",
    "agg_approx_sketches",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_SLOTS else n
        for n in sorted(REGISTRY)
    ],
)
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


# Oracles allowed to mention ln()/exp(): their transcendental output
# feeds ONLY a banded verdict with huge margins, never a hashed value
# (drift_psi: psi → stable/moderate/shifted bands at 0.1/0.25).
_TRANSCENDENTAL_ALLOWLIST = {"drift_psi"}


def test_no_transcendental_in_hashed_oracle_columns():
    """The round-4 regression's standing guard: no oracle may compute a
    hashed column from ln()/exp()/pow() — quantized transcendentals are
    reproducible within one engine build but NOT portable across libm
    builds, so they must enter the hash contract only as exact integer
    precursors plus TRUE-asserted verdicts (see operators/dsir.py,
    operators/lm.py, operators/resample.py docstrings).  New oracles
    that genuinely need a banded transcendental verdict must be added
    to the allowlist with the same margin argument as drift_psi."""
    import re

    offenders = {}
    for name, q in REGISTRY.items():
        if q.oracle is None or name in _TRANSCENDENTAL_ALLOWLIST:
            continue
        hits = re.findall(r"\b(ln|exp|pow|log|log2|log10)\s*\(", q.oracle)
        if hits:
            offenders[name] = sorted(set(hits))
    assert not offenders, (
        "transcendental calls in oracle SQL (hash-contract risk): "
        f"{offenders}"
    )


def test_no_wide_decimal_in_served_oracle_schemas(duck):
    """The round-5 regression's standing guard: no oracle may SERVE a
    DECIMAL column wider than 18 digits.  The only two r5 driver
    hash-fails were exactly the only two slots with DECIMAL(38,0) in
    their served schema — wide decimals are exact in both engines but
    their hashed rendering is not portable (hugeint-backed DuckDB
    decimals vs java BigDecimal).  Wide exact integers must be served
    as VARCHAR (digit-exact for scale-0) or hi/lo BIGINT pairs; values
    that provably fit int64 as BIGINT.  Intermediate CTE math may use
    any width — this inspects only the final SELECT's schema."""
    import re

    offenders = {}
    for name, q in REGISTRY.items():
        if q.oracle is None:
            continue
        desc = duck.execute(f"DESCRIBE ({q.oracle})").fetchall()
        bad = [
            f"{row[0]}: {row[1]}"
            for row in desc
            if (m := re.match(r"DECIMAL\((\d+)", row[1])) and int(m.group(1)) > 18
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"DECIMAL wider than 18 digits in served oracle schema: {offenders}"
    )
