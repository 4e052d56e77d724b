"""Validation rule engine (SURVEY X3, A9): named boolean rules over
unified rows, exploded into an issue channel, aggregated per rule and
per shop×rule.

Ref: utils/validation/product-validator.ts:5-10 (rule shape), :51-189
(the 10 rules incl. the ±10% unit-price consistency tolerance at
:155-188), :258-305 (summary aggregation).

The UDTF-shaped "1 row → N issues" explode is
``array(struct(...)) → filter → explode`` — all built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config.categories import FINAL_CATEGORIES


def _nonempty(c: Column) -> Column:
    return c.isNotNull() & (c.cast("string") != "")


# (rule_name, severity), ordered as the reference registers them.
# Plain data — importable with no SparkContext (oracle SQL generation
# happens before the session exists).
RULE_META: list[tuple[str, str]] = [
    ("required_id", "error"),
    ("required_title", "error"),
    ("required_shop_type", "error"),
    ("valid_price", "error"),
    ("price_consistency", "warning"),
    ("promotion_consistency", "warning"),
    ("promotion_dates", "info"),
    ("valid_quantity", "warning"),
    ("valid_category", "info"),
    ("unit_price_consistency", "warning"),
]


def rules() -> list[tuple[str, str, Column]]:
    """(rule_name, severity, PASS-condition) — ordered as the
    reference registers them."""
    up_ratio = F.col("unit_price") / (
        F.col("price_before_bonus") / F.col("conversion_factor")
    )
    return [
        ("required_id", "error", _nonempty(F.col("unified_id"))),
        ("required_title", "error", _nonempty(F.col("title"))),
        ("required_shop_type", "error", _nonempty(F.col("shop_type"))),
        ("valid_price", "error", F.coalesce(F.col("current_price"), F.lit(0.0)) > 0),
        (
            "price_consistency",
            "warning",
            (F.col("price_before_bonus") <= 0)
            | (F.col("current_price") <= F.col("price_before_bonus"))
            | F.coalesce(F.col("is_promotion"), F.lit(False)),
        ),
        (
            "promotion_consistency",
            "warning",
            ~F.coalesce(F.col("is_promotion"), F.lit(False))
            | (_nonempty(F.col("promotion_mechanism"))
               & (F.col("promotion_mechanism") != "none")),
        ),
        (
            "promotion_dates",
            "info",
            F.col("promotion_start_date").isNull()
            | F.col("promotion_end_date").isNull()
            | (F.col("promotion_start_date") <= F.col("promotion_end_date")),
        ),
        ("valid_quantity", "warning", F.coalesce(F.col("quantity_amount"), F.lit(0.0)) > 0),
        (
            "valid_category",
            "info",
            F.col("main_category").isNull()
            | F.col("main_category").isin(*FINAL_CATEGORIES),
        ),
        (
            "unit_price_consistency",
            "warning",
            F.col("unit_price").isNull()
            | (F.col("conversion_factor") <= 0)
            | (F.col("price_before_bonus") <= 0)
            | ((up_ratio >= 0.9) & (up_ratio <= 1.1)),
        ),
    ]


def issues(df: DataFrame) -> DataFrame:
    """Explode failed rules: one output row per (product, violated
    rule). 1→N UDTF shape via array/filter/explode."""
    structs = [
        F.struct(
            F.lit(name).alias("rule"),
            F.lit(sev).alias("severity"),
            (~F.coalesce(cond, F.lit(False))).alias("violated"),
        )
        for name, sev, cond in rules()
    ]
    arr = F.filter(F.array(*structs), lambda s: s["violated"])
    return (
        df.withColumn("_issues", arr)
        .filter(F.size("_issues") > 0)
        .select(
            "unified_id",
            "shop_type",
            F.explode("_issues").alias("i"),
        )
        .select("unified_id", "shop_type", "i.rule", "i.severity")
    )


def validation_summary(df: DataFrame) -> DataFrame:
    """A9: violation counts per rule (zeros included), plus severity."""
    iss = issues(df)
    counts = iss.groupBy("rule").agg(F.count("*").alias("n_violations"))
    all_rules = df.sparkSession.createDataFrame(RULE_META, ["rule", "severity"])
    return (
        all_rules.join(counts, "rule", "left")
        .withColumn("n_violations", F.coalesce(F.col("n_violations"), F.lit(0)))
        .select("rule", "severity", "n_violations")
    )


def issue_severity_escalation(iss: DataFrame) -> DataFrame:
    """A11: frequency-based severity escalation (5/20/50 thresholds,
    ref: issue-tracker.ts:263-273; thresholds src/index.ts:212-216)."""
    return (
        iss.groupBy("rule")
        .agg(F.count("*").alias("n"))
        .withColumn(
            "escalated_severity",
            F.when(F.col("n") >= 50, "critical")
            .when(F.col("n") >= 20, "high")
            .when(F.col("n") >= 5, "medium")
            .otherwise("low"),
        )
    )
