"""Run every declared catalog query against its DuckDB oracle at
sf0.001 — the local mirror of the driver's correctness gate."""

from __future__ import annotations

import pytest

from omfietser_etl_spark.catalog import all_specs
from omfietser_etl_spark.parity import compare, duck_connect

from .conftest import SF_SMOKE

SPECS = [s for s in all_specs() if s.oracle is not None]
ROWS_ONLY = [s for s in all_specs() if s.oracle is None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connect(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_oracle_parity(spark, spec, duck):
    res = compare(spec.name, spec.build(spark, SF_SMOKE), spec.oracle, duck)
    assert res.ok, f"{spec.name}: {res.detail} (spark={res.rows_spark}, oracle={res.rows_oracle})"


def test_catalog_fully_oracle_bearing():
    """Since round 5 (x8's exact-integer oracle) every catalog query
    carries a DuckDB oracle — pin it so a rows-only entry can't sneak
    back in unnoticed."""
    assert ROWS_ONLY == [], [s.name for s in ROWS_ONLY]


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    q, o = e.queries(), e.oracle_sql()
    assert set(o) <= set(q)
