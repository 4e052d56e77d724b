"""Unit tests for the D1–D5 enrichment expressions against
reference-derived expected values (fixtures follow FIXTURES.md §8/§9
and the cited reference semantics)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omfietser_etl_spark.functions.prices import discount_metrics, price_per_unit
from omfietser_etl_spark.functions.promotions import parse_promotion_mechanism
from omfietser_etl_spark.functions.quantities import normalize_unit, standardize_quantity

# (mechanism, type, eff, req, total, multi) with orig=10.0 cur=8.0
# expectations hand-derived from promotions.ts:16-164,:194-303 +
# calculate-fields.ts:50-66 defaults
PROMO_CASES = [
    ("Fixed price €0.99", "FIXED_PRICE", 0.99, 1.0, 8.0, False),
    ("2 voor 3.00", "X_FOR_Y", 1.5, 2.0, 3.0, True),
    # comma decimals split on the [;,] segment separator in the
    # reference too (calculate-fields.ts:155) → MULTI_PROMO quirk
    ("2 VOOR €3,00", "MULTI_PROMO", 8.0, 1.0, 8.0, False),
    ("2 VOOR €3.00", "X_FOR_Y", 1.5, 2.0, 3.0, True),
    ("1+1 gratis", "X_PLUS_Y_FREE", 5.0, 2.0, 10.0, True),
    ("2+1 gratis", "X_PLUS_Y_FREE", 6.67, 3.0, 20.0, True),
    ("25% korting", "PERCENTAGE_DISCOUNT", 7.5, 1.0, 8.0, False),
    ("-25%", "PERCENTAGE_DISCOUNT", 7.5, 1.0, 8.0, False),
    ("2e halve prijs", "SECOND_HALF_PRICE", 7.5, 2.0, 15.0, True),
    ("2e gratis", "SECOND_FREE", 5.0, 2.0, 10.0, True),
    ("-€2", "FIXED_DISCOUNT", 8.0, 1.0, 8.0, False),
    ("10% pakketkorting", "PACK_DISCOUNT", 9.0, 1.0, 8.0, False),
    ("5% volume voordeel", "VOLUME_DISCOUNT", 9.5, 1.0, 8.0, False),
    ("bij elke 3 stuks", "CONDITIONAL_BUY", 10.0, 1.0, 8.0, True),
    ("vanaf €10", "CONDITIONAL_SPEND", 10.0, 1.0, 8.0, False),
    ("gratis bezorging", "DELIVERY_PROMO", 10.0, 1.0, 8.0, False),
    ("kies & mix", "KIES_MIX", 10.0, 1.0, 8.0, False),
    ("2 voor 3.00, 3 voor 4.50", "MULTI_PROMO", 8.0, 1.0, 8.0, False),
    ("onbekende actie", "UNKNOWN", 8.0, 1.0, 8.0, False),
]


def test_promotion_parser(spark):
    df = spark.createDataFrame([(m,) for m, *_ in PROMO_CASES], ["mech"])
    out = df.select(
        "mech",
        parse_promotion_mechanism(F.col("mech"), F.lit(10.0), F.lit(8.0)).alias("p"),
    ).collect()
    got = {r["mech"]: r["p"] for r in out}
    for mech, ptype, eff, req, total, multi in PROMO_CASES:
        p = got[mech]
        assert p["promo_type"] == ptype, f"{mech}: {p['promo_type']} != {ptype}"
        assert p["effective_unit_price"] == pytest.approx(eff, abs=0.005), mech
        assert p["required_quantity"] == pytest.approx(req), mech
        assert p["total_price"] == pytest.approx(total, abs=0.005), mech
        assert p["is_multi_purchase_required"] == multi, mech


# (amount, unit) → (norm_amount, norm_unit, conversion_factor)
# from calculate-fields.ts:232-332 + units.ts tables
QTY_CASES = [
    (500.0, "g", 0.5, "kg", 0.5),
    (1.0, "kg", 1.0, "kg", 1.0),
    (750.0, "ml", 0.75, "l", 0.75),
    (2.0, "liter", 2.0, "l", 2.0),
    (6.0, "stuks", 6.0, "stuk", 6.0),
    (2.0, "rol", 2.0, "stuk", 2.0),
    (20.0, "wasbeurten", 20.0, "stuk", 20.0),
    (50.0, "m2", 50.0, "m2", 50.0),
    (3.0, "meter", 3.0, "m", 3.0),
    # containment pass is greedy for single-letter aliases, exactly
    # like the reference's includes() loop: 'totallyunknown' ∋ 'l' → l
    (1.0, "totallyunknown", 1.0, "l", 1.0),
    (1.0, "xyz", 1.0, "stuk", 1.0),  # truly unmatched → stuk default
    (0.0, "g", 1.0, "stuk", 1.0),          # invalid amount
    (None, "kg", 1.0, "stuk", 1.0),        # null amount
    (5.0, "", 1.0, "stuk", 1.0),           # empty unit
    (1.0, "per kg", 1.0, "kg", 1.0),       # 'per ' prefix stripped
    (900.0, "6 x 150g", 0.9, "kg", 0.9),   # multipack → item unit
    (2.0, "12-pack", 2.0, "stuk", 2.0),    # pack-size → stuk
    (100.0, "gram.", 0.1, "kg", 0.1),      # punctuation stripped
    (1.0, "oz", 0.02835, "kg", 0.02835),
]


def test_standardize_quantity(spark):
    df = spark.createDataFrame(
        [(float(a) if a is not None else None, u) for a, u, *_ in QTY_CASES],
        "amount double, unit string",
    )
    out = df.select(
        "amount", "unit", standardize_quantity(F.col("amount"), F.col("unit")).alias("q")
    ).collect()
    for (a, u, amt, unit, conv), r in zip(QTY_CASES, out):
        q = r["q"]
        assert q["normalized_unit"] == unit, f"{a} {u!r}: {q}"
        assert q["normalized_amount"] == pytest.approx(amt, rel=1e-6), f"{a} {u!r}"
        assert q["conversion_factor"] == pytest.approx(conv, rel=1e-6), f"{a} {u!r}"


def test_normalize_unit_containment_order(spark):
    # 'unknownunit' resolves via the ordered containment pass to
    # 'unit' → stuk; 'literfles' hits 'liter' before 'fles'
    df = spark.createDataFrame([("unknownunit",), ("literfles",)], ["u"])
    out = [r[0] for r in df.select(normalize_unit(F.col("u"))).collect()]
    assert out == ["stuk", "l"]


def test_price_per_unit(spark):
    cases = [
        (1.99, 0.25, 7.96),
        (10.0, 0.0, 10000.0),   # cf floored to 0.001 → 10000 cap
        (0.0, 1.0, 0.0),        # invalid price
        (None, 1.0, 0.0),
        (5.0, 2.0, 2.5),
        (2.0, None, 2000.0),    # null cf → 0.001 floor
    ]
    df = spark.createDataFrame(cases, "price double, cf double, expected double")
    out = df.select(
        "expected", price_per_unit(F.col("price"), F.col("cf")).alias("got")
    ).collect()
    for r in out:
        assert r["got"] == pytest.approx(r["expected"], abs=0.005)


def test_discount_metrics(spark):
    cases = [
        (10.0, 7.5, 2.5, 25.0),
        (10.0, 10.0, 0.0, 0.0),   # no discount
        (10.0, 12.0, 0.0, 0.0),   # data error: discounted > original
        (0.0, 5.0, 0.0, 0.0),     # invalid original
        (3.0, 2.0, 1.0, 33.3),    # 1dp percentage
    ]
    df = spark.createDataFrame(cases, "orig double, disc double, ea double, ep double")
    out = df.select(
        "ea", "ep", discount_metrics(F.col("orig"), F.col("disc")).alias("m")
    ).collect()
    for r in out:
        assert r["m"]["amount"] == pytest.approx(r["ea"], abs=0.005)
        assert r["m"]["percentage"] == pytest.approx(r["ep"], abs=0.05)
