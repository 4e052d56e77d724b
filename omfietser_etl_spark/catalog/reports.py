"""Reporting / dedup / scan operator queries closing out the SURVEY §2
inventory rows that had no direct catalog entry yet: A5 promotion
analysis, A6 job statistics, A11 issue escalation, A12 mapping-method
stats, DD2 near-dup grouping, DD3 fuzzy best-match, U3 distinct-set
collection, S3 multi-predicate scan.

Percentage outputs use exact basis-point integers
(``floor(n * 10000.0 / total)``) instead of round(pct, 2): both
engines compute the same IEEE double quotient, and a floor of a
quotient of bounded integers can only straddle an integer boundary
when the true quotient IS that integer — in which case IEEE division
returns it exactly. No cross-engine rounding ties, ever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from omfietser_etl_spark.operators.category import normalize_categories
from omfietser_etl_spark.operators.validation import issue_severity_escalation
from omfietser_etl_spark.session import load

from . import QuerySpec


def _bp(num, den):
    """Exact basis-point percentage as BIGINT (see module docstring)."""
    return F.floor(num * 10000.0 / den).cast("long")


# ---------------------------------------------------------------- #
# a5 — promotion analysis per shop (ref: visualize-data.ts:165-197)
# ---------------------------------------------------------------- #

def a5_promo_analysis(spark: SparkSession, sf: str) -> DataFrame:
    """Per shop: product count, promo count, promo share; per
    (shop, promotion_type): promo count. One row per promo type with
    the shop totals repeated (the reference emits both levels)."""
    o = load(spark, sf, "orders")
    base = o.select(
        F.col("o_orderstatus").alias("shop_type"),
        F.col("o_orderpriority").alias("promotion_type"),
        (F.col("o_orderkey") % 3 == 0).alias("is_promotion"),
    )
    shop_w = Window.partitionBy("shop_type")
    per_type = (
        base.filter("is_promotion")
        .groupBy("shop_type", "promotion_type")
        .agg(F.count("*").alias("n_type"))
    )
    totals = base.groupBy("shop_type").agg(
        F.count("*").alias("n_products"),
        F.sum(F.when(F.col("is_promotion"), 1).otherwise(0)).alias("n_promo"),
    )
    return (
        per_type.join(F.broadcast(totals), "shop_type")
        .select(
            "shop_type",
            "promotion_type",
            "n_type",
            "n_products",
            "n_promo",
            _bp(F.col("n_promo"), F.col("n_products")).alias("promo_bp"),
        )
    )


A5_ORACLE = """
WITH base AS (
  SELECT o_orderstatus AS shop_type, o_orderpriority AS promotion_type,
         o_orderkey % 3 = 0 AS is_promotion
  FROM orders),
totals AS (
  SELECT shop_type, count(*) AS n_products,
         count(*) FILTER (WHERE is_promotion) AS n_promo
  FROM base GROUP BY shop_type)
SELECT b.shop_type, b.promotion_type, count(*) AS n_type,
       any_value(t.n_products) AS n_products,
       any_value(t.n_promo) AS n_promo,
       CAST(floor(any_value(t.n_promo) * 10000.0 / any_value(t.n_products)) AS BIGINT) AS promo_bp
FROM base b JOIN totals t USING (shop_type)
WHERE b.is_promotion
GROUP BY b.shop_type, b.promotion_type
"""


# ---------------------------------------------------------------- #
# a6 — job statistics with guarded success rate
#      (ref: postgres-adapter.ts:936-972)
# ---------------------------------------------------------------- #

def a6_job_stats(spark: SparkSession, sf: str) -> DataFrame:
    ev = load(spark, sf, "events")
    return (
        ev.groupBy(F.col("event_type").alias("job_type"))
        .agg(
            F.count("*").alias("n_total"),
            F.sum(F.when(F.col("value") > 1.0, 1).otherwise(0)).alias("n_success"),
        )
        .select(
            "job_type",
            "n_total",
            "n_success",
            # CASE guard mirrors ROUND(success/total*100, 2) with total>0
            F.when(F.col("n_total") > 0, _bp(F.col("n_success"), F.col("n_total")))
            .otherwise(F.lit(0))
            .alias("success_bp"),
        )
    )


A6_ORACLE = """
SELECT event_type AS job_type, count(*) AS n_total,
       count(*) FILTER (WHERE value > 1.0) AS n_success,
       CASE WHEN count(*) > 0 THEN CAST(floor(
           count(*) FILTER (WHERE value > 1.0) * 10000.0 / count(*)) AS BIGINT)
         ELSE 0 END AS success_bp
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------- #
# a11 — issue frequency + severity escalation
#       (ref: issue-tracker.ts:263-273; thresholds src/index.ts:212-216)
# ---------------------------------------------------------------- #

def a11_issue_escalation(spark: SparkSession, sf: str) -> DataFrame:
    """Synthesize an issue stream with rare/occasional/common rules so
    all threshold bands (5/20/50) appear, then escalate."""
    li = load(spark, sf, "lineitem")
    issues = li.select(
        F.when(F.col("l_orderkey") % 2000 == 7, "rare_schema_drift")
        .when(F.col("l_orderkey") % 211 == 3, "occasional_bad_unit")
        .otherwise(F.concat_ws("_", "l_returnflag", "l_linestatus"))
        .alias("rule")
    )
    return issue_severity_escalation(issues)


A11_ORACLE = """
SELECT rule, count(*) AS n,
    CASE WHEN count(*) >= 50 THEN 'critical'
         WHEN count(*) >= 20 THEN 'high'
         WHEN count(*) >= 5 THEN 'medium'
         ELSE 'low' END AS escalated_severity
FROM (SELECT CASE WHEN l_orderkey % 2000 = 7 THEN 'rare_schema_drift'
                  WHEN l_orderkey % 211 = 3 THEN 'occasional_bad_unit'
                  ELSE l_returnflag || '_' || l_linestatus END AS rule
      FROM lineitem)
GROUP BY rule
"""


# ---------------------------------------------------------------- #
# a12 — category mapping-method stats
#       (ref: normalizer.ts:577-580,55-63)
# ---------------------------------------------------------------- #

def a12_mapping_methods(spark: SparkSession, sf: str) -> DataFrame:
    """Synthesized categories hit each cascade branch: v0 exact final,
    v1 case/space-normalized final, v2 garbage → fuzzy, v3 empty →
    default, v4 ALDI trots-special without ML → special_default."""
    part = load(spark, sf, "part", fanout=True)
    v = F.col("p_partkey") % 5
    df = part.select(
        "p_partkey",
        F.col("p_name").alias("title"),
        F.when(v == 4, "ALDI").otherwise("JUMBO").alias("shop_type"),
        F.when(v == 0, "Aardappel, groente, fruit")
        .when(v == 1, "AARDAPPEL  groente FRUIT")
        .when(v == 2, "qzx qzx")
        .when(v == 3, "")
        .otherwise("trots van aldi")
        .alias("main_category"),
    )
    out = normalize_categories(df, method_col="method")
    return out.groupBy("method").agg(F.count("*").alias("n"))


A12_ORACLE = """
SELECT CASE p_partkey % 5
         WHEN 0 THEN 'static' WHEN 1 THEN 'static'
         WHEN 2 THEN 'fuzzy' WHEN 3 THEN 'default'
         ELSE 'special_default' END AS method,
       count(*) AS n
FROM part GROUP BY 1
"""


# ---------------------------------------------------------------- #
# dd2 — near-dup grouping on a normalized blocking key
#       (ref: dedupe.ts:100-124)
# ---------------------------------------------------------------- #

def dd2_neardup_groups(spark: SparkSession, sf: str) -> DataFrame:
    """Group by (shop, alnum-lowered title), keep groups of ≥2 — the
    reference's near-duplicate blocking key, which is also the LSH
    blocking function of the scale path (SURVEY §7.6)."""
    part = load(spark, sf, "part")
    key = F.regexp_replace(F.lower(F.col("p_name")), "[^a-z0-9]", "")
    return (
        part.groupBy(
            F.col("p_type").alias("shop_type"), key.alias("norm_title")
        )
        .agg(F.count("*").alias("n_dupes"))
        .filter(F.col("n_dupes") >= 2)
    )


DD2_ORACLE = """
SELECT p_type AS shop_type,
       regexp_replace(lower(p_name), '[^a-z0-9]', '', 'g') AS norm_title,
       count(*) AS n_dupes
FROM part GROUP BY 1, 2 HAVING count(*) >= 2
"""


# ---------------------------------------------------------------- #
# dd3 — fuzzy best-match vs a candidate list, threshold 0.6
#       (ref: utils/categorization.ts:16-40)
# ---------------------------------------------------------------- #

DD3_CANDIDATES = [
    "smal ring",
    "red wdget",
    "blue gizmo",
    "grean gadget",
    "yellow thing",
]
DD3_THRESHOLD = 0.6


def dd3_fuzzy_best_match(spark: SparkSession, sf: str) -> DataFrame:
    """Argmax Levenshtein similarity over a candidate list per DISTINCT
    input string (distinct-then-match keeps the theta join
    dimension-sized at any fact scale), threshold 0.6."""
    part = load(spark, sf, "part")
    names = part.select(F.col("p_name").alias("name")).distinct()
    cands = spark.createDataFrame(
        [(c,) for c in DD3_CANDIDATES], ["candidate"]
    )
    sim_bp = _bp(
        F.greatest(F.length("name"), F.length("candidate"))
        - F.levenshtein("name", "candidate"),
        F.greatest(F.length("name"), F.length("candidate")),
    )
    scored = names.crossJoin(F.broadcast(cands)).withColumn("sim_bp", sim_bp)
    w = Window.partitionBy("name").orderBy(
        F.desc("sim_bp"), F.asc("candidate")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") == 1) & (F.col("sim_bp") >= DD3_THRESHOLD * 10000))
        .select("name", F.col("candidate").alias("best_match"), "sim_bp")
    )


def _dd3_oracle() -> str:
    vals = ", ".join(f"('{c}')" for c in DD3_CANDIDATES)
    return f"""
WITH names AS (SELECT DISTINCT p_name AS name FROM part),
cands(candidate) AS (VALUES {vals}),
scored AS (
  SELECT name, candidate,
    CAST(floor((greatest(length(name), length(candidate))
                - levenshtein(name, candidate)) * 10000.0
               / greatest(length(name), length(candidate))) AS BIGINT) AS sim_bp
  FROM names CROSS JOIN cands),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY name
      ORDER BY sim_bp DESC, candidate ASC) AS rk
  FROM scored)
SELECT name, candidate AS best_match, sim_bp
FROM ranked WHERE rk = 1 AND sim_bp >= {int(DD3_THRESHOLD * 10000)}
"""


# ---------------------------------------------------------------- #
# u3 — distinct observed values per group (ref: normalizer.ts:582-589)
# ---------------------------------------------------------------- #

def u3_distinct_per_group(spark: SparkSession, sf: str) -> DataFrame:
    part = load(spark, sf, "part")
    return part.groupBy(F.col("p_type").alias("shop_type")).agg(
        F.array_join(F.sort_array(F.collect_set("p_brand")), ";").alias("brands"),
        F.count_distinct("p_brand").alias("n_brands"),
    )


U3_ORACLE = """
SELECT p_type AS shop_type,
       string_agg(DISTINCT p_brand, ';' ORDER BY p_brand) AS brands,
       count(DISTINCT p_brand) AS n_brands
FROM part GROUP BY 1
"""


# ---------------------------------------------------------------- #
# s3 — multi-predicate scan + deterministic pagination
#      (ref: postgres-adapter.ts:431-500)
# ---------------------------------------------------------------- #

def s3_multi_filter_scan(spark: SparkSession, sf: str) -> DataFrame:
    """Equality + IN + range predicates all pushed to the parquet scan
    (PushedFilters in .explain), then ORDER BY DESC + LIMIT/OFFSET via
    row_number with a unique tiebreak."""
    o = load(spark, sf, "orders")
    filtered = o.filter(
        (F.col("o_orderstatus") == "O")
        & F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & (F.col("o_totalprice") > 50000.0)
        & (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    # top-k first (TakeOrderedAndProject — distributed, no global
    # sort); the offset window then sees page_end rows only
    order = [F.desc("o_orderdate"), F.desc("o_orderkey")]
    top = filtered.orderBy(*order).limit(250)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 50) & (F.col("rn") <= 250))
        .select(
            "rn",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round("o_totalprice", 2).alias("total_price"),
        )
    )


S3_ORACLE = """
WITH filtered AS (
  SELECT * FROM orders
  WHERE o_orderstatus = 'O'
    AND o_orderpriority IN ('1-URGENT', '2-HIGH')
    AND o_totalprice > 50000.0
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1999-01-01'),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM filtered)
SELECT rn, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date,
       round(o_totalprice, 2) AS total_price
FROM ranked WHERE rn > 50 AND rn <= 250
"""


SPECS = [
    QuerySpec("a5_promo_analysis", a5_promo_analysis, A5_ORACLE,
              "A5 promotion analysis per shop"),
    QuerySpec("a6_job_stats", a6_job_stats, A6_ORACLE,
              "A6 job statistics, guarded success rate"),
    QuerySpec("a11_issue_escalation", a11_issue_escalation, A11_ORACLE,
              "A11 issue frequency severity escalation"),
    QuerySpec("a12_mapping_methods", a12_mapping_methods, A12_ORACLE,
              "A12 category mapping-method stats"),
    QuerySpec("dd2_neardup_groups", dd2_neardup_groups, DD2_ORACLE,
              "DD2 near-dup grouping on normalized key"),
    QuerySpec("dd3_fuzzy_best_match", dd3_fuzzy_best_match, _dd3_oracle(),
              "DD3 fuzzy best-match vs candidates"),
    QuerySpec("u3_distinct_per_group", u3_distinct_per_group, U3_ORACLE,
              "U3 distinct value sets per group"),
    QuerySpec("s3_multi_filter_scan", s3_multi_filter_scan, S3_ORACLE,
              "S3 multi-predicate scan + pagination"),
]
