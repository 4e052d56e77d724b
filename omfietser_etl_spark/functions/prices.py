"""Price-derived columns: price-per-standard-unit (D4) and discount
metrics (D5) as Column expressions.

Ref: projects/processor/src/utils/calculate-fields.ts:412-447
(calculatePricePerUnit: guards, 0.001 conversion floor, 10000 cap,
2dp) and :452-475 (calculateDiscountMetrics: zeros on invalid input
or non-discount, 2dp amount / 1dp percentage).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def price_per_unit(price: Column, conversion_factor: Column) -> Column:
    """round(price / max(cf, 0.001), 2) capped at 10000; 0 on invalid
    price."""
    cf = F.when(
        conversion_factor.isNull()
        | F.isnan(conversion_factor)
        | (conversion_factor <= 0),
        F.lit(0.001),
    ).otherwise(conversion_factor)
    raw = price / cf
    capped = F.when(raw > 10000, F.lit(10000.0)).otherwise(F.round(raw, 2))
    valid_price = price.isNotNull() & ~F.isnan(price) & (price > 0)
    result = F.when(valid_price, capped).otherwise(F.lit(0.0))
    # mirror the "result must be positive finite" guard
    return F.when(result.isNull() | F.isnan(result) | (result <= 0), F.lit(0.0)).otherwise(
        result
    )


def discount_metrics(original: Column, discounted: Column) -> Column:
    """struct(amount 2dp, percentage 1dp); zeros unless both prices
    valid and discounted < original."""
    invalid = (
        original.isNull()
        | F.isnan(original)
        | (original <= 0)
        | discounted.isNull()
        | F.isnan(discounted)
        | (discounted <= 0)
        | (discounted >= original)
    )
    amount = F.round(original - discounted, 2)
    pct = F.round((original - discounted) / original * 100.0, 1)
    return F.when(
        invalid,
        F.struct(F.lit(0.0).alias("amount"), F.lit(0.0).alias("percentage")),
    ).otherwise(F.struct(amount.alias("amount"), pct.alias("percentage")))
