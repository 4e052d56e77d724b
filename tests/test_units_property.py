"""Property-based test of unit normalization + quantity
standardization (SURVEY §7.7 risk 1 — D3's ordered partial-containment
must keep the config table's first-match-wins order).

Independent Python model over the same config tables; hypothesis
generates unit strings from aliases, casing, 'per ' prefixes,
punctuation, multipacks, pack-sizes, and junk.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from omfietser_etl_spark.config.units import (
    BASE_TO_STANDARD_DIVISOR,
    CONVERSION_FACTORS,
    REFERENCE_UNITS,
    STANDARD_UNITS,
    UNIT_ALIASES,
    UNIT_TO_CATEGORY,
)
from omfietser_etl_spark.functions.quantities import standardize_quantity

_ALIAS = dict(UNIT_ALIASES)
_TO_BASE = {u: f for fs in CONVERSION_FACTORS.values() for u, f in fs.items()}
_MULTIPACK = re.compile(r"(\d+)\s*x\s*(\d+(?:\.\d+)?)\s*([a-z]+)")
_PACKSIZE = re.compile(r"(\d+)[\s-]*(pack|stuks|pieces|items)")


def model_normalize(unit: str) -> str:
    if unit is None or unit == "":
        return "stuk"
    c = unit.lower().strip()
    c = re.sub(r"^per\s+", "", c)
    c = re.sub(r"[.,;:()]", "", c)
    c = re.sub(r"\s+", " ", c)
    m = _MULTIPACK.search(c)
    if m and m.group(3) in _ALIAS:
        return _ALIAS[m.group(3)]
    if c in _ALIAS:
        return _ALIAS[c]
    for k, v in UNIT_ALIASES:  # ordered containment
        if k in c:
            return v
    if _PACKSIZE.search(c):
        return "stuk"
    if c in STANDARD_UNITS:
        return c
    return "stuk"


def model_standardize(amount: float, unit: str) -> tuple[float, str, float]:
    if amount is None or amount <= 0 or unit is None or unit == "":
        return (1.0, "stuk", 1.0)
    nu = model_normalize(unit)
    cat = UNIT_TO_CATEGORY.get(nu, "piece")
    if cat == "piece":
        conv = max(amount, 1.0)
    else:
        to_base = _TO_BASE.get(nu, 1.0)
        conv = max(amount * to_base / BASE_TO_STANDARD_DIVISOR[cat], 0.001)
    return (conv, REFERENCE_UNITS[cat], conv)


_alias_keys = st.sampled_from([k for k, _ in UNIT_ALIASES])
_junk = st.sampled_from(["blik", "zak", "xyz", "", "per", "stuks", "pak"])


@st.composite
def units(draw) -> str:
    kind = draw(st.integers(0, 5))
    a = draw(_alias_keys)
    if kind == 0:
        s = a
    elif kind == 1:
        s = f"per {a}"
    elif kind == 2:
        s = f"{a}."
    elif kind == 3:
        s = f"{draw(st.integers(2, 12))} x {draw(st.integers(1, 500))} {a}"
    elif kind == 4:
        s = f"{draw(st.integers(2, 24))}-{draw(st.sampled_from(['pack', 'stuks', 'pieces']))}"
    else:
        s = f"{draw(_junk)} {draw(_junk)}".strip()
    if draw(st.booleans()):
        s = s.upper()
    return s


@settings(max_examples=6, deadline=None)
@given(st.lists(units(), min_size=40, max_size=40), st.data())
def test_standardize_matches_model(spark, us, data):
    """All THREE evaluation forms — inline expression, staged-column
    cascade, and distinct-then-join — must agree with the independent
    Python model on the same rows (the perf variants are plan
    rewrites, never semantic ones)."""
    from omfietser_etl_spark.functions.quantities import (
        with_standardized_quantity,
        with_standardized_quantity_staged,
    )

    quarters = data.draw(
        st.lists(st.integers(0, 2000), min_size=len(us), max_size=len(us))
    )
    rows = [(u, q / 4.0) for u, q in zip(us, quarters)]
    df = spark.createDataFrame(rows, "unit string, amount double")
    variants = {
        "inline": df.withColumn(
            "s", standardize_quantity(F.col("amount"), F.col("unit"))
        ),
        "staged": with_standardized_quantity_staged(
            df, F.col("amount"), F.col("unit"), "s"
        ),
        "join": with_standardized_quantity(
            df, F.col("amount"), F.col("unit"), "s"
        ),
    }
    for name, frame in variants.items():
        out = frame.select("unit", "amount", "s.*").collect()
        for r in out:
            want = model_standardize(r["amount"], r["unit"])
            have = (r["normalized_amount"], r["normalized_unit"], r["conversion_factor"])
            assert have[1] == want[1], (name, r["unit"], r["amount"], have, want)
            assert abs(have[0] - want[0]) < 1e-9, (name, r["unit"], r["amount"], have, want)
            assert abs(have[2] - want[2]) < 1e-9, (name, r["unit"], r["amount"], have, want)
