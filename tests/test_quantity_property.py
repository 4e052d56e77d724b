"""Property-based test of unit normalization + quantity
standardization (D2/D3): an independent pure-Python model implements
the reference semantics (calculate-fields.ts:232-403) straight from
the same config tables, and the Spark expression must agree on every
generated input — including the ordered partial-containment
fallback, multipack/pack-size parses, and the invalid-input default.
"""

from __future__ import annotations

import math
import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

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
_TO_BASE = {u: f for factors in CONVERSION_FACTORS.values() for u, f in factors.items()}
_MULTIPACK = re.compile(r"(\d+)\s*x\s*(\d+(?:\.\d+)?)\s*([a-z]+)")
_PACKSIZE = re.compile(r"(\d+)[\s-]*(pack|stuks|pieces|items)")


def _clean(u: str) -> str:
    c = u.lower().strip()
    c = re.sub(r"^per\s+", "", c)
    c = re.sub(r"[.,;:()]", "", c)
    return re.sub(r"\s+", " ", c)


def _norm_unit(u: str | None) -> str:
    if u is None or u == "":
        return "stuk"
    c = _clean(u)
    m = _MULTIPACK.search(c)
    if m and m.group(3) in _ALIAS:
        return _ALIAS[m.group(3)]
    if c in _ALIAS:
        return _ALIAS[c]
    for k, v in UNIT_ALIASES:
        if k in c:
            return v
    if _PACKSIZE.search(c):
        return "stuk"
    if c in STANDARD_UNITS:
        return c
    return "stuk"


def _model(amount: float | None, unit: str | None) -> tuple[float, str, float]:
    if (
        amount is None
        or math.isnan(amount)
        or amount <= 0
        or unit is None
        or unit == ""
    ):
        return (1.0, "stuk", 1.0)
    nu = _norm_unit(unit)
    cat = UNIT_TO_CATEGORY.get(nu, "piece")
    to_base = _TO_BASE.get(nu, 1.0)
    divisor = BASE_TO_STANDARD_DIVISOR[cat]
    if cat == "piece":
        conv = max(amount, 1.0)
    else:
        conv = max(amount * to_base / divisor, 0.001)
    return (conv, REFERENCE_UNITS[cat], conv)


_alias_keys = [k for k, _ in UNIT_ALIASES]
_unit_strings = st.one_of(
    st.sampled_from(_alias_keys),
    st.sampled_from(STANDARD_UNITS),
    st.sampled_from(_alias_keys).map(lambda u: f"Per {u.upper()}."),
    st.builds(
        lambda n, m, u: f"{n} x {m} {u}",
        st.integers(1, 9),
        st.integers(1, 500),
        st.sampled_from(_alias_keys),
    ),
    st.builds(lambda n: f"{n}-pack", st.integers(1, 24)),
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789 .,;:()x-",
        max_size=16,
    ),
    st.none(),
)
_amounts = st.one_of(
    st.floats(min_value=-5.0, max_value=5000.0, allow_nan=False),
    st.just(float("nan")),
    st.none(),
    st.sampled_from([0.0, 0.001, 1.0, 250.0]),
)


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(_amounts, _unit_strings), min_size=1, max_size=50))
def test_standardize_matches_model(spark, batch):
    df = spark.createDataFrame(
        [(i, a, u) for i, (a, u) in enumerate(batch)],
        T.StructType(
            [
                T.StructField("i", T.IntegerType()),
                T.StructField("amount", T.DoubleType()),
                T.StructField("unit", T.StringType()),
            ]
        ),
    )
    out = {
        r.i: r.s
        for r in df.select(
            "i", standardize_quantity(F.col("amount"), F.col("unit")).alias("s")
        ).collect()
    }
    for i, (a, u) in enumerate(batch):
        want = _model(a, u)
        got = out[i]
        assert (
            got.normalized_amount,
            got.normalized_unit,
            got.conversion_factor,
        ) == want, f"amount={a!r} unit={u!r}: spark={tuple(got)} model={want}"
