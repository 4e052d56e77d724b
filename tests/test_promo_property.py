"""Property-based test of the promotion parser (SURVEY §7.7 risk 1:
first-match-wins precedence must survive compilation to an ordered
`when` chain).

An independent pure-Python model implements the same ordered-pattern
semantics straight from the config table; hypothesis generates
adversarial mechanism strings (pattern instances, noise, multi-
segment, overlap-triggering tokens) and the Spark expression must
agree on every output field.

Rounding model: Spark's round(double, 2) is
BigDecimal.valueOf(d).setScale(2, HALF_UP), i.e. HALF_UP over the
SHORTEST decimal representation — matched with
Decimal(repr(x)).quantize(ROUND_HALF_UP).
"""

from __future__ import annotations

import re
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from omfietser_etl_spark.config.promotions import PROMOTION_PATTERNS
from omfietser_etl_spark.functions.promotions import parse_promotion_mechanism

_PAT = {pid: re.compile(rx) for pid, _, rx in PROMOTION_PATTERNS}
_TYPE = {pid: t for pid, t, _ in PROMOTION_PATTERNS}


def _r2(x: float) -> float:
    return float(Decimal(repr(x)).quantize(Decimal("0.01"), ROUND_HALF_UP))


def _num(s: str | None) -> float | None:
    if not s:
        return None
    try:
        return float(s.replace(",", "."))
    except ValueError:
        return None


def model(mech: str, orig: float, cur: float) -> tuple:
    """(promo_type, eff, req, total, multi) per the reference
    semantics (calculate-fields.ts:128-227; promotions.ts order)."""
    normalized = re.sub(r"\s+", " ", mech.lower()).strip()
    segments = re.split(r"[;,]", normalized)
    if len(segments) > 1:
        return ("MULTI_PROMO", cur, 1.0, cur, False)
    seg = segments[0].strip()

    def g(pid: str, idx: int) -> str | None:
        m = _PAT[pid].search(seg)
        return m.group(idx) if m else None

    for pid, _t, _rx in PROMOTION_PATTERNS:
        if not _PAT[pid].search(seg):
            continue
        t = _TYPE[pid]
        if pid == "fixed_price":
            return (t, _r2(_num(g(pid, 1))), 1.0, cur, False)
        if pid == "x_for_y":
            q = int(g(pid, 1))
            total = _num(g(pid, 2))
            eff = total / q if q > 0 else orig
            return (t, _r2(eff), float(q), _r2(total), True)
        if pid == "x_plus_y_free":
            b, f = int(g(pid, 1)), int(g(pid, 2))
            eff = orig * b / (b + f) if (b > 0 and f > 0) else orig
            return (t, _r2(eff), float(b + f), _r2(orig * b), True)
        if pid == "percentage_discount":
            m = _PAT[pid].search(seg)
            pct_s = m.group(1) or m.group(2)
            pct = int(pct_s) if pct_s else None
            eff = orig * (1 - pct / 100.0) if pct and 0 < pct <= 100 else orig
            return (t, _r2(eff), 1.0, cur, False)
        if pid == "second_half_price":
            return (t, _r2(orig * 0.75), 2.0, _r2(orig * 1.5), True)
        if pid == "second_free":
            return (t, _r2(orig * 0.5), 2.0, _r2(orig * 1.0), True)
        if pid == "fixed_discount":
            d = _num(g(pid, 1))
            return (t, _r2(max(0.0, orig - d)), 1.0, cur, False)
        if pid == "pack_discount":
            p = int(g(pid, 1))
            eff = orig * (1 - p / 100.0) if 0 < p < 100 else orig
            return (t, _r2(eff), 1.0, cur, False)
        if pid == "volume_discount":
            p = int(g(pid, 1))
            eff = orig * (1 - p / 100.0) if 0 < p < 100 else orig
            return (t, _r2(eff), 1.0, cur, False)
        if pid == "conditional_buy":
            return (t, _r2(orig), 1.0, cur, True)
        # conditional_spend / delivery_promo / kies_mix: price-neutral
        return (t, _r2(orig), 1.0, cur, False)
    return ("UNKNOWN", cur, 1.0, cur, False)


_num_s = st.one_of(
    st.integers(0, 300).map(str),
    st.integers(1, 9999).map(lambda n: f"{n // 100},{n % 100:02d}"),
    st.integers(1, 9999).map(lambda n: f"{n // 100}.{n % 100:02d}"),
)
_noise = st.sampled_from(
    ["", "nu", "alleen", "2e", "gratis", "korting", "voor", "op=op", "%", "actie"]
)


def _instance(draw) -> str:
    kind = draw(st.integers(0, 13))
    a = draw(_num_s)
    b = draw(_num_s)
    sp = draw(st.sampled_from(["", " ", "  "]))
    forms = [
        f"fixed price €{a}",
        f"{draw(st.integers(1, 9))}{sp}voor{sp or ' '}€{a}",
        f"{draw(st.integers(1, 5))}+{draw(st.integers(1, 5))}{sp or ' '}gratis",
        f"{draw(st.integers(1, 150))}%{sp}korting",
        f"-{draw(st.integers(1, 150))}%",
        "2e halve prijs",
        "2e gratis",
        f"-€{a}",
        f"{draw(st.integers(1, 99))}% pakketkorting",
        f"{draw(st.integers(1, 99))}% volume voordeel",
        f"bij elke {draw(st.integers(1, 9))} stuks",
        f"vanaf €{b}",
        draw(st.sampled_from(["gratis bezorging", "bezorgkorting"])),
        "kies & mix",
    ]
    return forms[kind]


@st.composite
def mechanisms(draw) -> str:
    parts = [_instance(draw) for _ in range(draw(st.integers(1, 2)))]
    pre = draw(_noise)
    post = draw(_noise)
    body = draw(st.sampled_from([";", ","])).join(parts)
    s = f"{pre} {body} {post}".strip()
    if draw(st.booleans()):
        s = s.upper()
    return s or "x"


@settings(max_examples=8, deadline=None)
@given(st.lists(mechanisms(), min_size=40, max_size=40), st.data())
def test_parser_matches_model(spark, mechs, data):
    quarters = data.draw(
        st.lists(st.integers(1, 200), min_size=len(mechs), max_size=len(mechs))
    )
    rows = [
        (m, q / 4.0, q / 4.0 - 0.25) for m, q in zip(mechs, quarters)
    ]
    df = spark.createDataFrame(rows, "mech string, orig double, cur double")
    parsed = parse_promotion_mechanism(F.col("mech"), F.col("orig"), F.col("cur"))
    got = (
        df.withColumn("p", parsed)
        .select("mech", "orig", "cur", "p.*")
        .collect()
    )
    for r in got:
        want = model(r["mech"], r["orig"], r["cur"])
        have = (
            r["promo_type"],
            r["effective_unit_price"],
            r["required_quantity"],
            r["total_price"],
            r["is_multi_purchase_required"],
        )
        assert have[0] == want[0], (r["mech"], have, want)
        for h, w in zip(have[1:4], want[1:4]):
            assert (h is None) == (w is None) and (
                h is None or abs(h - w) < 1e-9
            ), (r["mech"], have, want)
        assert have[4] == want[4], (r["mech"], have, want)
