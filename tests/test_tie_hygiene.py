"""Guard against the round-1 correctness bug class: a
`round(sum|avg(double), scale>0)` output under the gate ties on .xx5
boundaries where Spark's and DuckDB's accumulation orders differ.
The conventions (functions/exact.py, catalog/__init__.py) are
integer cents / floor basis points; this test fails on any oracle
that regresses to rounded double aggregates.
"""

from __future__ import annotations

import re

from omfietser_etl_spark.catalog import all_specs

# round(sum|avg(...), s) with s > 0 — scan nested one level deep.
_BAD = re.compile(
    r"round\s*\(\s*(?:sum|avg)\s*\([^()]*(?:\([^()]*\)[^()]*)*\)\s*,\s*([1-9])",
    re.IGNORECASE,
)

# scale-0 rounding then integer cast is the sanctioned pattern; also
# allow round over already-exact integer sums (CAST ... AS BIGINT).
_EXEMPT = re.compile(r"CAST\s*\(\s*round", re.IGNORECASE)


def test_no_hugeint_oracle_outputs():
    """The round-1/round-2 gate-red class: DuckDB types integer `sum()`
    (including sum(CASE WHEN ... THEN 1 ELSE 0 END)) as HUGEINT, which
    pandas surfaces as float64 while Spark emits int64 — the driver's
    dtype-strict hash then sees 1460.0 vs 1460. DESCRIBE plans the
    oracle without executing it, so this checks ALL output column types
    across the whole catalog. Fix = wrap in CAST(... AS BIGINT)."""
    from omfietser_etl_spark.parity import duck_connect

    con = duck_connect("/root/testdata/sf0.001")
    offenders = []
    for spec in all_specs():
        if spec.oracle is None:
            continue
        for col_name, col_type, *_ in con.execute(
            f"DESCRIBE {spec.oracle}"
        ).fetchall():
            if "HUGEINT" in col_type.upper():
                offenders.append(f"{spec.name}.{col_name}: {col_type}")
    assert not offenders, (
        "HUGEINT oracle output (pandas renders it float64, hash-fails "
        "vs Spark int64 — wrap in CAST(... AS BIGINT)):\n"
        + "\n".join(offenders)
    )


def test_no_rounded_double_aggregates_in_oracles():
    offenders = []
    for spec in all_specs():
        if spec.oracle is None:
            continue
        for m in _BAD.finditer(spec.oracle):
            frag = spec.oracle[max(0, m.start() - 30) : m.end() + 10]
            offenders.append(f"{spec.name}: ...{frag}...")
    assert not offenders, (
        "rounded double aggregate under the gate (use integer cents / "
        "floor basis points per functions/exact.py):\n" + "\n".join(offenders)
    )
