"""Relational operator queries (SURVEY §2.1, §2.3, §2.4, §2.8–§2.12).

Each query re-expresses one reference operator shape on the driver's
TPC-H-ish tables. Reference citations live in each spec's doc string
(file:line relative to /root/reference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import exact
from ..session import load
from . import QuerySpec


# --------------------------------------------------------------------------
# Scans / filters / projections
# --------------------------------------------------------------------------

def s1_scan_pushdown(spark: SparkSession, sf: str) -> DataFrame:
    """Filtered+projected scan; predicate and column pruning must reach
    the parquet reader (ref: postgres-adapter.ts:47-97 filter pushdown)."""
    li = load(spark, sf, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-06-01"))
            & (F.col("l_discount") > F.lit(0.05))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


S1_ORACLE = """
SELECT l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-06-01' AND l_discount > 0.05
"""


def s5_point_lookup(spark: SparkSession, sf: str) -> DataFrame:
    """Point lookup by key (ref: postgres-adapter.ts:99-108)."""
    o = load(spark, sf, "orders")
    return o.filter(F.col("o_orderkey") == 777).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("total"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("odate"),
    )


S5_ORACLE = """
SELECT o_orderkey, o_custkey, o_orderstatus,
       round(o_totalprice, 2) AS total,
       strftime(o_orderdate, '%Y-%m-%d') AS odate
FROM orders WHERE o_orderkey = 777
"""


def f6_validity_split(spark: SparkSession, sf: str) -> DataFrame:
    """Business-rule row classification: valid rows vs dead-letter
    channel (ref: processors/base.ts:478-503 price validity rules)."""
    li = load(spark, sf, "lineitem")
    flag = (
        F.when((F.col("l_discount") > 0) & (F.col("l_extendedprice") <= 0), "invalid_promo")
        .when(F.col("l_extendedprice") <= 0, "invalid_price")
        .when((F.col("l_discount") < 0) | (F.col("l_discount") > 0.08), "suspect_discount")
        .otherwise("valid")
    )
    return (
        li.select(flag.alias("validity"))
        .groupBy("validity")
        .agg(F.count("*").alias("cnt"))
    )


F6_ORACLE = """
SELECT CASE
         WHEN l_discount > 0 AND l_extendedprice <= 0 THEN 'invalid_promo'
         WHEN l_extendedprice <= 0 THEN 'invalid_price'
         WHEN l_discount < 0 OR l_discount > 0.08 THEN 'suspect_discount'
         ELSE 'valid' END AS validity,
       count(*) AS cnt
FROM lineitem GROUP BY 1
"""


def p5_coalesce_projection(spark: SparkSession, sf: str) -> DataFrame:
    """Wide projection with fallback semantics: brand defaults to first
    name token when empty — JS `||` semantics, not COALESCE (ref:
    processors/jumbo.ts:169; adapters/database-processor-adapter.ts:485-537);
    cents→euros division (ref: processors/jumbo.ts:145)."""
    p = load(spark, sf, "part")
    return p.select(
        "p_partkey",
        F.when(
            F.col("p_brand").isNull() | (F.col("p_brand") == ""),
            F.split(F.col("p_name"), " ").getItem(0),
        )
        .otherwise(F.col("p_brand"))
        .alias("brand_resolved"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.round(F.round(F.col("p_retailprice") * 100, 0) / 100.0, 2).alias("price_eur"),
    )


P5_ORACLE = """
SELECT p_partkey,
       CASE WHEN p_brand IS NULL OR p_brand = ''
            THEN string_split(p_name, ' ')[1] ELSE p_brand END AS brand_resolved,
       string_split(p_type, ' ')[1] AS type_head,
       round(round(p_retailprice * 100, 0) / 100.0, 2) AS price_eur
FROM part
"""


# --------------------------------------------------------------------------
# Dedupe / latest-state (SURVEY §2.8, ST3)
# --------------------------------------------------------------------------

def dd1_latest_per_key(spark: SparkSession, sf: str) -> DataFrame:
    """Keep-one-per-key dedupe with explicit deterministic tiebreak
    (ref: src/utils/dedupe.ts:23-52; upsert latest-wins
    postgres-adapter.ts:685-720)."""
    ev = load(spark, sf, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", F.round("value", 2).alias("val"))
    )


DD1_ORACLE = """
SELECT user_id, event_type, event_id, round(value, 2) AS val
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Joins (SURVEY §2.9)
# --------------------------------------------------------------------------

def j1_broadcast_enrich(spark: SparkSession, sf: str) -> DataFrame:
    """Fact⋈small-dim lookup joins, explicitly broadcast (ref:
    category/prediction.ts:74-87 hash-map lookup → broadcast hash join)."""
    li = load(spark, sf, "lineitem")
    part = load(spark, sf, "part")
    supp = load(spark, sf, "supplier")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_brand")
        .agg(
            # 2dp price × 2dp (1-discount) has ≤4 decimals → exact in
            # basis points; long sum is order-independent (see exact.py).
            exact.sum_bp(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_bp"
            ),
            F.count("*").alias("cnt"),
            F.countDistinct("s_suppkey").alias("n_suppliers"),
        )
    )


J1_ORACLE = """
SELECT p_brand,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_bp,
       count(*) AS cnt,
       count(DISTINCT s_suppkey) AS n_suppliers
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand
"""


def j5_multiway_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Multiway equi-join star query (ref: FK joins J5/J6,
    init-processor-schema.sql:71): revenue per region/nation."""
    r = load(spark, sf, "region")
    n = load(spark, sf, "nation")
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    li = load(spark, sf, "lineitem")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            exact.sum_bp(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue_bp"
            ),
            F.count("*").alias("n_items"),
        )
    )


def j9_salted_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """Skew-safe SALTED shuffle join (operators/joins.py::salted_join)
    gated under the plain-join oracle: lineitem's supplier key is the
    hot key x7 diagnoses, the big side scatters each key over 16
    deterministic salts and the small side replicates — output is
    provably identical to the unsalted join (the oracle IS the plain
    SQL join), which is exactly the property a salting rewrite must
    preserve. Revenue follows the j5 exact-basis-points convention."""
    from omfietser_etl_spark.operators.joins import salted_join

    li = load(spark, sf, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        "l_extendedprice", "l_discount",
    )
    supp = load(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    j = salted_join(li, supp, ["l_suppkey"])
    return j.groupBy("s_nationkey").agg(
        exact.sum_bp(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue_bp"),
        F.count("*").alias("n_items"),
    )


J9_ORACLE = """
SELECT s_nationkey,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_bp,
       count(*) AS n_items
FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
GROUP BY s_nationkey
"""


J5_ORACLE = """
SELECT r_name, n_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 10000, 0) AS BIGINT)) AS BIGINT) AS revenue_bp,
       count(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""

# Mangled canon for the fuzzy theta-join — forces non-exact matches.
_FUZZY_CANON = [
    "UNTED STATS",
    "GERMANI",
    "FRANC",
    "CHNIA",
    "BRAZL",
    "JAPN",
    "INDNESIA",
    "ROMANIJA",
]


def j3_fuzzy_theta(spark: SparkSession, sf: str) -> DataFrame:
    """Fuzzy best-match theta join: levenshtein argmax of each nation
    name against a small canon (ref: normalizer.ts:530-546 fuzzy
    category matching; utils/categorization.ts:16-40). Runs the cross
    join on DISTINCT keys — the scale posture for fuzzy matching."""
    n = load(spark, sf, "nation").select("n_name").distinct()
    canon = spark.createDataFrame([(c,) for c in _FUZZY_CANON], ["cand"])
    scored = n.crossJoin(F.broadcast(canon)).withColumn(
        "dist", F.levenshtein(F.col("n_name"), F.col("cand"))
    )
    w = Window.partitionBy("n_name").orderBy(F.col("dist"), F.col("cand"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("n_name", F.col("cand").alias("best_match"), "dist")
    )


_CANON_SQL = ", ".join(f"('{c}')" for c in _FUZZY_CANON)
J3_ORACLE = f"""
SELECT n_name, cand AS best_match, dist FROM (
  SELECT n_name, cand, levenshtein(n_name, cand) AS dist,
         row_number() OVER (PARTITION BY n_name
                            ORDER BY levenshtein(n_name, cand), cand) AS rn
  FROM (SELECT DISTINCT n_name FROM nation)
  CROSS JOIN (SELECT * FROM (VALUES {_CANON_SQL}) t(cand))
) WHERE rn = 1
"""


def u4_anti_join_missing(spark: SparkSession, sf: str) -> DataFrame:
    """Left-anti join: keys absent from the other side (ref: `is_new`
    detection, init-processor-schema.sql:37-39 — new/disappeared
    products between jobs)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


U4_ORACLE = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL)
"""


def semi_join_active(spark: SparkSession, sf: str) -> DataFrame:
    """Left-semi join + rollup count per nation (ref: U4 intersect
    semantics; validation split F6)."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    n = load(spark, sf, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(F.count("*").alias("active_customers"))
    )


SEMI_ORACLE = """
SELECT n_name, count(*) AS active_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey IN (SELECT o_custkey FROM orders)
GROUP BY n_name
"""


# --------------------------------------------------------------------------
# Aggregations (SURVEY §2.10)
# --------------------------------------------------------------------------

def a1_status_counters(spark: SparkSession, sf: str) -> DataFrame:
    """Per-group processing counters with share-of-total (ref:
    processors/base.ts:35-48 success/failed/skipped tallies;
    job stats postgres-adapter.ts:936-972)."""
    o = load(spark, sf, "orders")
    agg = o.groupBy("o_orderstatus").agg(
        F.count("*").alias("cnt"),
        exact.sum_cents("o_totalprice").alias("total_cents"),
    )
    # share-of-total via a broadcast one-row totals frame, not a
    # partition-less window: the window shape funnels the group frame
    # through one task (WindowExec warns exactly this), while the
    # broadcast keeps every group row where it already lives.
    totals = agg.agg(F.sum("cnt").alias("_total"))
    return agg.crossJoin(F.broadcast(totals)).select(
        "o_orderstatus",
        "cnt",
        "total_cents",
        exact.floor_ratio(F.col("cnt"), F.col("_total")).alias("pct_bp"),
    )


A1_ORACLE = """
SELECT o_orderstatus, count(*) AS cnt,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(floor(count(*) * 10000.0 / sum(count(*)) OVER ()) AS BIGINT) AS pct_bp
FROM orders GROUP BY o_orderstatus
"""


def a4_price_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-segment price stats: avg, exact median, bucket counts (ref:
    visualize-data.ts:123-161 price comparison incl. sort-based median
    :213-224 and buckets). Median uses an explicit rank formula —
    avg of the middle one/two values — because Spark `percentile` and
    DuckDB `quantile_cont` interpolate differently in the last ulp."""
    c = load(spark, sf, "customer")
    o = load(spark, sf, "orders")
    j = o.join(c, F.col("o_custkey") == F.col("c_custkey"))
    stats = j.groupBy("c_mktsegment").agg(
        # avg over an order-dependent double sum rounds apart across
        # engines at .xx5 ties — derive from the exact cents sum instead.
        exact.floor_ratio(exact.sum_cents("o_totalprice"), F.count("*"), 1).alias(
            "avg_price_cents"
        ),
        F.sum(F.when(F.col("o_totalprice") < 50000, 1).otherwise(0)).alias("bucket_low"),
        F.sum(
            F.when(
                (F.col("o_totalprice") >= 50000) & (F.col("o_totalprice") < 150000), 1
            ).otherwise(0)
        ).alias("bucket_mid"),
        F.sum(F.when(F.col("o_totalprice") >= 150000, 1).otherwise(0)).alias("bucket_high"),
    )
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    wc = Window.partitionBy("c_mktsegment")
    median = (
        j.select("c_mktsegment", "o_totalprice", "o_orderkey")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wc))
        .filter(
            (F.col("rn") == F.expr("(n + 1) div 2")) | (F.col("rn") == F.expr("(n + 2) div 2"))
        )
        .groupBy("c_mktsegment")
        # median of two 2dp values lands exactly on a .xx5 boundary, where
        # Spark and DuckDB round(scale=2) disagree — emit integer cents
        # (scale-0 rounding is consistent across engines).
        .agg(F.round(F.avg(F.col("o_totalprice") * 100), 0).cast("long").alias("median_cents"))
    )
    return stats.join(median, "c_mktsegment")


A4_ORACLE = """
WITH j AS (
  SELECT c_mktsegment, o_totalprice, o_orderkey
  FROM orders JOIN customer ON o_custkey = c_custkey
), ranked AS (
  SELECT c_mktsegment, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice, o_orderkey) AS rn,
         count(*) OVER (PARTITION BY c_mktsegment) AS n
  FROM j
), med AS (
  SELECT c_mktsegment, CAST(round(avg(o_totalprice * 100), 0) AS BIGINT) AS median_cents
  FROM ranked WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY c_mktsegment
)
SELECT j.c_mktsegment,
       CAST(floor(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) * 1.0
                  / count(*)) AS BIGINT) AS avg_price_cents,
       CAST(sum(CASE WHEN o_totalprice < 50000 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_low,
       CAST(sum(CASE WHEN o_totalprice >= 50000 AND o_totalprice < 150000 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_mid,
       CAST(sum(CASE WHEN o_totalprice >= 150000 THEN 1 ELSE 0 END) AS BIGINT) AS bucket_high,
       any_value(med.median_cents) AS median_cents
FROM j JOIN med ON j.c_mktsegment = med.c_mktsegment
GROUP BY j.c_mktsegment
"""


def a3_type_distribution(spark: SparkSession, sf: str) -> DataFrame:
    """Category distribution with percentage (ref:
    visualize-data.ts:100-118; categorization.ts:150-163)."""
    p = load(spark, sf, "part")
    agg = p.groupBy("p_type").agg(F.count("*").alias("cnt"))
    # broadcast totals, not a partition-less window (see a1).
    totals = agg.agg(F.sum("cnt").alias("_total"))
    return agg.crossJoin(F.broadcast(totals)).select(
        "p_type",
        "cnt",
        exact.floor_ratio(F.col("cnt"), F.col("_total")).alias("pct_bp"),
    )


A3_ORACLE = """
SELECT p_type, count(*) AS cnt,
       CAST(floor(count(*) * 10000.0 / sum(count(*)) OVER ()) AS BIGINT) AS pct_bp
FROM part GROUP BY p_type
"""


def a7_event_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Error-summary-style conditional aggregation (ref:
    postgres-adapter.ts:974-1002: COUNT FILTER per severity,
    COUNT(DISTINCT ...))."""
    ev = load(spark, sf, "events")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("total"),
        F.countDistinct("user_id").alias("n_users"),
        F.sum(F.when(F.col("value") > 100, 1).otherwise(0)).alias("n_high"),
        F.sum(F.when(F.col("value") <= 100, 1).otherwise(0)).alias("n_low"),
        exact.sum_cents("value").alias("sum_value_cents"),
    )


A7_ORACLE = """
SELECT event_type, count(*) AS total, count(DISTINCT user_id) AS n_users,
       CAST(sum(CASE WHEN value > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       CAST(sum(CASE WHEN value <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events GROUP BY event_type
"""


def a8_version_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Two-column groupBy with count + max (ref:
    postgres-adapter.ts:1004-1023 schema-version stats)."""
    o = load(spark, sf, "orders")
    return o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count("*").alias("cnt"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd").alias("last_date"),
    )


A8_ORACLE = """
SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
       strftime(max(o_orderdate), '%Y-%m-%d') AS last_date
FROM orders GROUP BY o_orderstatus, o_orderpriority
"""


def rollup_region_nation(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical rollup report across shops→overall analog (ref:
    src/index.ts:366-373 per-shop rollup to combined summary)."""
    c = load(spark, sf, "customer")
    n = load(spark, sf, "nation")
    r = load(spark, sf, "region")
    j = (
        c.join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(exact.sum_cents("c_acctbal").alias("total_bal_cents"), F.count("*").alias("cnt"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_g"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_g"),
            "total_bal_cents",
            "cnt",
        )
    )


ROLLUP_ORACLE = """
SELECT coalesce(r_name, 'ALL') AS region_g, coalesce(n_name, 'ALL') AS nation_g,
       CAST(sum(CAST(round(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT) AS total_bal_cents, count(*) AS cnt
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""



def cube_status_priority(spark: SparkSession, sf: str) -> DataFrame:
    """CUBE over (status, priority): every grouping-set combination of
    the per-shop × overall report in one pass (SURVEY §2.10 tail —
    per-shop and combined rollups as grouping sets)."""
    o = load(spark, sf, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("cnt"),
             exact.sum_cents("o_totalprice").alias("total_cents"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status_g"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority_g"),
            "cnt",
            "total_cents",
        )
    )


CUBE_ORACLE = """
SELECT coalesce(o_orderstatus, 'ALL') AS status_g,
       coalesce(o_orderpriority, 'ALL') AS priority_g,
       count(*) AS cnt,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def j7_first_last_seen(spark: SparkSession, sf: str) -> DataFrame:
    """Price-history bookkeeping: first_seen / last_updated per key
    plus observation count (ref: init-processor-schema.sql:36-38 —
    the columns a MERGE maintains; one hash aggregate here)."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy(F.col("l_partkey").alias("part_key"))
        .agg(
            F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_seen"),
            F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("last_updated"),
            F.count("*").alias("n_obs"),
            F.round(F.min("l_extendedprice"), 2).alias("min_price"),
            F.round(F.max("l_extendedprice"), 2).alias("max_price"),
        )
    )


J7B_ORACLE = """
SELECT l_partkey AS part_key,
       strftime(min(l_shipdate), '%Y-%m-%d') AS first_seen,
       strftime(max(l_shipdate), '%Y-%m-%d') AS last_updated,
       count(*) AS n_obs,
       round(min(l_extendedprice), 2) AS min_price,
       round(max(l_extendedprice), 2) AS max_price
FROM lineitem GROUP BY l_partkey
"""


def a13_distinct_parts(spark: SparkSession, sf: str) -> DataFrame:
    """Exact distinct-count per group (ref: uniqueProducts,
    types/product.ts:110-115). The approximate variant is
    `a13_approx_distinct` (rows-only check)."""
    li = load(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
    )


A13_ORACLE = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts,
       count(DISTINCT l_suppkey) AS n_supps
FROM lineitem GROUP BY l_returnflag
"""


#: a13 approx tolerance: HLL++ at rsd=0.02 is within ~2-4% in
#: practice; 5×rsd is a deterministic-for-fixed-data bound with wide
#: margin (Spark's estimate is a pure function of the input set).
A13_RSD = 0.02
A13_TOL = 5 * A13_RSD


def a13_approx_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """HLL approximate distinct (scale path for A13), self-certifying:
    the exact distinct rides the same groupBy and the hash-gated
    output asserts |approx − exact| ≤ 5·rsd·exact. The engine-specific
    estimate itself stays out of the gated columns (DuckDB's HLL
    differs by design); what the oracle certifies is that Spark's
    estimate honors its own error contract against the exact count —
    a within_rsd=false on either side is a hash mismatch → red row."""
    li = load(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", A13_RSD).alias("_approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= F.lit(A13_TOL) * F.col("exact_parts")
            ).alias("within_rsd"),
        )
    )


A13_APPROX_ORACLE = """
SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts,
       TRUE AS within_rsd
FROM lineitem GROUP BY l_returnflag
"""


#: a21 rank tolerance: percentile_approx at accuracy 1000 bounds rank
#: error to ~0.1%; the ±2% quantile band asserted below is 20× that.
A21_PS = (0.5, 0.9, 0.99)
A21_EPS = 0.02


def a21_approx_percentile(spark: SparkSession, sf: str) -> DataFrame:
    """Approximate percentiles (the KLL/GK-sketch scale path for A15's
    exact bands — one pass, mergeable, no sort), self-certifying like
    a13: each estimate must land inside the ±2% exact quantile band
    computed in the same aggregate. The estimates themselves are
    engine-specific (DuckDB's sketch differs), so the hash-gated
    columns are the group key, the exact row count, and the
    per-percentile booleans — a sketch that violates its rank-error
    contract turns the row red."""
    li = load(spark, sf, "lineitem")
    los = ", ".join(f"{max(0.0, p - A21_EPS)}D" for p in A21_PS)
    his = ", ".join(f"{min(1.0, p + A21_EPS)}D" for p in A21_PS)
    ps = ", ".join(f"{p}D" for p in A21_PS)
    g = li.groupBy("l_returnflag").agg(
        F.expr(f"percentile_approx(l_extendedprice, array({ps}), 1000)").alias("_ap"),
        F.expr(f"percentile(l_extendedprice, array({los}))").alias("_lo"),
        F.expr(f"percentile(l_extendedprice, array({his}))").alias("_hi"),
        F.count("*").alias("n_rows"),
    )
    checks = [
        (
            (F.col("_ap")[i] >= F.col("_lo")[i])
            & (F.col("_ap")[i] <= F.col("_hi")[i])
        ).alias(f"p{int(p * 100)}_ok")
        for i, p in enumerate(A21_PS)
    ]
    return g.select("l_returnflag", "n_rows", *checks)


A21_ORACLE = """
SELECT l_returnflag, count(*) AS n_rows,
       TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# Sorts / top-k / pagination (SURVEY §2.11)
# --------------------------------------------------------------------------

def o1_pagination(spark: SparkSession, sf: str) -> DataFrame:
    """ORDER BY ... LIMIT/OFFSET pagination with deterministic tiebreak
    (ref: postgres-adapter.ts:72-81).

    Scale shape: orderBy().limit(page_end) FIRST — Spark plans it as
    TakeOrderedAndProject (per-partition top-k + driver merge, no
    global sort, no single-partition window). The row_number window
    then runs over page_end rows only."""
    o = load(spark, sf, "orders")
    order = [F.col("o_totalprice").desc(), F.col("o_orderkey")]
    top = o.orderBy(*order).limit(25)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 10) & (F.col("rn") <= 25))
        .select("rn", "o_orderkey", F.round("o_totalprice", 2).alias("total"))
    )


O1_ORACLE = """
SELECT rn, o_orderkey, round(o_totalprice, 2) AS total FROM (
  SELECT *, row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn > 10 AND rn <= 25
"""


#: o9 cursor: the (o_totalprice, o_orderkey) of a known row — pages
#: after it are fetched by tuple comparison, never by OFFSET.
O9_CURSOR_PRICE = 100_000.0
O9_PAGE = 15


def o9_keyset_pagination(spark: SparkSession, sf: str) -> DataFrame:
    """Keyset (cursor) pagination — the scale-correct replacement for
    o1's OFFSET shape (ref: postgres-adapter.ts:72-81 pages with
    LIMIT/OFFSET; at 100 TB OFFSET k scans-and-discards k rows while
    a keyset predicate prunes straight to the page).

    The cursor is the (sort_key, unique_id) tuple of the last row of
    the previous page; `(price, key) < cursor` (descending order) is
    a pushable predicate, and the page itself is one
    TakeOrderedAndProject — cost is O(page), independent of how deep
    the user has paged."""
    o = load(spark, sf, "orders")
    after = (F.col("o_totalprice") < O9_CURSOR_PRICE) | (
        (F.col("o_totalprice") == O9_CURSOR_PRICE)
        & (F.col("o_orderkey") > 0)
    )
    page = (
        o.filter(after)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(O9_PAGE)
    )
    return page.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
    )


O9_ORACLE = f"""
SELECT o_orderkey,
       CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
FROM orders
WHERE o_totalprice < {O9_CURSOR_PRICE}
   OR (o_totalprice = {O9_CURSOR_PRICE} AND o_orderkey > 0)
ORDER BY o_totalprice DESC, o_orderkey
LIMIT {O9_PAGE}
"""


def u5_intersect_except(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT / EXCEPT set ops (completes the u-family: union u1,
    distinct u2/u3, anti u4): customers in BOTH predicate sets, and
    in the first but not the second, tagged and unioned.

    Spark-first shape: when both set-op inputs are predicates over
    the SAME source, DataFrame ``intersect``/``exceptAll`` compile to
    one join PER set op, and each operand frame re-executes per
    reference — the round-10 audit measured customer scanned 4× here
    (AQE does not canonicalize the duplicated filter subtrees; the
    td28 class). The single-pass form computes both memberships as
    flags in ONE scan and reduces per key (max of each flag), so
    INTERSECT ≡ in_a ∧ in_b and EXCEPT-DISTINCT ≡ in_a ∧ ¬in_b fall
    out of one hash agg: 1 scan + 1 shuffle replaces 4 scans + 2
    joins, identical output for any input multiset."""
    c = load(spark, sf, "customer")
    in_a = F.col("c_mktsegment") == "BUILDING"
    in_b = F.col("c_acctbal") > 5000
    flags = (
        c.filter(in_a | in_b)
        .groupBy("c_custkey")
        .agg(
            F.max(in_a.cast("int")).alias("in_a"),
            F.max(in_b.cast("int")).alias("in_b"),
        )
        .filter(F.col("in_a") == 1)
    )
    return flags.select(
        "c_custkey",
        F.when(F.col("in_b") == 1, "both").otherwise("only_building").alias("tag"),
    )


U5_ORACLE = """
SELECT c_custkey, 'both' AS tag FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  INTERSECT
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
UNION ALL
SELECT c_custkey, 'only_building' AS tag FROM (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
  EXCEPT
  SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
"""


def j10_full_outer_reconcile(spark: SparkSession, sf: str) -> DataFrame:
    """FULL OUTER join as a reconciliation report (the two-snapshot
    compare u4/st4 approximate with anti-joins; full outer shows
    matched / left-only / right-only in ONE pass over both sides —
    one shuffle each on the join key)."""
    c = load(spark, sf, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", F.col("c_acctbal").alias("bal_a")
    )
    b = c.filter(F.col("c_acctbal") > 5000).select(
        "c_custkey", F.col("c_acctbal").alias("bal_b")
    )
    j = a.join(b, "c_custkey", "full_outer")
    return j.select(
        "c_custkey",
        F.when(F.col("bal_a").isNotNull() & F.col("bal_b").isNotNull(), "both")
        .when(F.col("bal_a").isNotNull(), "left_only")
        .otherwise("right_only")
        .alias("presence"),
        F.round(F.coalesce("bal_a", "bal_b") * 100, 0).cast("long").alias("bal_cents"),
    )


J10_ORACLE = """
WITH a AS (SELECT c_custkey, c_acctbal AS bal_a FROM customer
           WHERE c_mktsegment = 'BUILDING'),
b AS (SELECT c_custkey, c_acctbal AS bal_b FROM customer
      WHERE c_acctbal > 5000)
SELECT coalesce(a.c_custkey, b.c_custkey) AS c_custkey,
       CASE WHEN bal_a IS NOT NULL AND bal_b IS NOT NULL THEN 'both'
            WHEN bal_a IS NOT NULL THEN 'left_only'
            ELSE 'right_only' END AS presence,
       CAST(round(coalesce(bal_a, bal_b) * 100, 0) AS BIGINT) AS bal_cents
FROM a FULL OUTER JOIN b ON a.c_custkey = b.c_custkey
"""


def a18_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Arbitrary GROUPING SETS (the general form rollup/cube
    specialize): per-status totals, per-priority totals, and the
    grand total in one pass — Spark expands the sets in a single
    Expand + hash agg, not three scans. grouping() flags disambiguate
    the aggregation NULLs from data NULLs."""
    load(spark, sf, "orders").createOrReplaceTempView("a18_orders")
    return spark.sql(
        """
        SELECT coalesce(o_orderstatus, '') AS status_key,
               coalesce(o_orderpriority, '') AS priority_key,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               count(*) AS cnt,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                   AS BIGINT) AS cents
        FROM a18_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


A18_ORACLE = """
SELECT coalesce(o_orderstatus, '') AS status_key,
       coalesce(o_orderpriority, '') AS priority_key,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       count(*) AS cnt,
       CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""


def o7_topk_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Top-k per group (ref: processors/base.ts:642-646 first-5
    examples per error type)."""
    li = load(spark, sf, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "l_returnflag", "rn", "l_orderkey", "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


O7_ORACLE = """
SELECT l_returnflag, rn, l_orderkey, l_linenumber, round(l_extendedprice, 2) AS price
FROM (
  SELECT *, row_number() OVER (PARTITION BY l_returnflag
            ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
  FROM lineitem
) WHERE rn <= 3
"""


def o4_argmax_per_group(spark: SparkSession, sf: str) -> DataFrame:
    """Argmax within group — widest-image pick analog (ref:
    processors/ah.ts:176-179 argmax over images by width)."""
    c = load(spark, sf, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", F.col("c_name").alias("richest"),
                F.round("c_acctbal", 2).alias("bal"))
    )


O4_ORACLE = """
SELECT c_nationkey, c_name AS richest, round(c_acctbal, 2) AS bal FROM (
  SELECT *, row_number() OVER (PARTITION BY c_nationkey
            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.12)
# --------------------------------------------------------------------------

def u1_union_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Union of per-source outputs + distinct (ref:
    visualize-data.ts:27-39 union of 4 shop files; prediction.ts:102-104
    distinct keys)."""
    c = load(spark, sf, "customer")
    a = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    return a.unionByName(b).distinct()


U1_ORACLE = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
UNION
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
"""


# --------------------------------------------------------------------------
# J8 — range/interval join (bin-blocked; operators/joins.py)
# --------------------------------------------------------------------------

#: one day in microseconds — the bin width for j8's blocking join.
DAY_US = 86_400_000_000


def j8_range_join(spark: SparkSession, sf: str) -> DataFrame:
    """Events joined to overlapping validity windows via the
    bin-blocked interval join (operators/joins.py::interval_join).

    The range dimension is synthesized from ``nation``: 25 overlapping
    windows tiling the event time span (start = lo + k·(span div 32),
    width = 3·(span div 32)) — the promotion-window shape the
    reference stores as promotion_start/end dates
    (types/product.ts:32-33). Here the join itself is the point: the
    interval predicate runs as an equi-join on day bins, never a
    nested loop, so BOTH sides scale. Event time is truncated to
    epoch-µs first (Spark reads the parquet nanos raw, DuckDB at µs —
    see st7); all arithmetic is exact integers after that.
    """
    ev = load(spark, sf, "events").withColumn("tus", F.expr("ts div 1000"))
    bounds = ev.agg(F.min("tus").alias("lo"), F.max("tus").alias("hi"))
    ranges = (
        load(spark, sf, "nation")
        .crossJoin(F.broadcast(bounds))
        .select(
            "n_nationkey",
            F.expr("lo + n_nationkey * ((hi - lo) div 32)").alias("start_us"),
            F.expr("lo + n_nationkey * ((hi - lo) div 32) + 3 * ((hi - lo) div 32)")
            .alias("end_us"),
        )
    )
    from omfietser_etl_spark.operators.joins import interval_join

    joined = interval_join(ev, ranges, "tus", "start_us", "end_us", DAY_US)
    return joined.groupBy("n_nationkey").agg(
        F.count("*").alias("n_events"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("sum_value_cents"),
    )


J8_ORACLE = """
WITH b AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
r AS (SELECT n_nationkey,
             lo + n_nationkey * ((hi - lo) // 32) AS start_us,
             lo + n_nationkey * ((hi - lo) // 32) + 3 * ((hi - lo) // 32) AS end_us
      FROM nation, b)
SELECT r.n_nationkey, count(*) AS n_events,
       CAST(sum(CAST(round(e.value * 100, 0) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM r JOIN events e
  ON epoch_us(e.ts) >= r.start_us AND epoch_us(e.ts) < r.end_us
GROUP BY 1
"""


def a14_pivot(spark: SparkSession, sf: str) -> DataFrame:
    """Pivot (crosstab) report: status counts as columns per priority
    (ref: visualize-data.ts:100-118 renders the same distribution
    matrix; the reference computes it client-side row by row).

    Spark's `pivot(col, values)` with EXPLICIT values is the scale
    shape: without them, pivot runs an extra distinct JOB over the
    whole input just to discover the column domain before it can even
    plan. With them it compiles to two map-side-partial hash
    aggregates (per (priority,status), then per priority with the
    CASE branches) — both shuffles carry only group keys + counters."""
    o = load(spark, sf, "orders")
    p = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("cnt_f"),
        F.coalesce("O", F.lit(0)).alias("cnt_o"),
        F.coalesce("P", F.lit(0)).alias("cnt_p"),
    )


A14_ORACLE = """
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_f,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_o,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_p
FROM orders GROUP BY o_orderpriority
"""


def a15_percentile_bands(spark: SparkSession, sf: str) -> DataFrame:
    """Exact p25/p50/p75/p90 per group by nearest-rank (generalizes
    a4's median; ref: visualize-data.ts:213-224 sorts to index the
    median the same way).

    Scale shape: ONE sort-shuffle on the group key computes every
    percentile — rank + count ride the same window partitioning, and
    the four extractions are conditional aggregates over that single
    pass. Nearest-rank (rn == ceil(p·n/100), exact integer
    arithmetic) picks a real data value — no interpolation, so no
    cross-engine float ties. Compare `percentile_approx` for the
    sketch-based scale path (approximate, mergeable)."""
    li = load(spark, sf, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    wc = Window.partitionBy("l_returnflag")
    ranked = (
        li.select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count("*").over(wc))
    )
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    return ranked.groupBy("l_returnflag").agg(
        *[
            F.max(
                F.when(F.col("rn") == F.expr(f"({p} * n + 99) div 100"), cents)
            ).alias(f"p{p}_cents")
            for p in (25, 50, 75, 90)
        ]
    )


A15_ORACLE = """
WITH ranked AS (
  SELECT l_returnflag, l_extendedprice,
         row_number() OVER (PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM lineitem)
SELECT l_returnflag,
       max(CASE WHEN rn = (25 * n + 99) // 100
                THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT) END) AS p25_cents,
       max(CASE WHEN rn = (50 * n + 99) // 100
                THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT) END) AS p50_cents,
       max(CASE WHEN rn = (75 * n + 99) // 100
                THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT) END) AS p75_cents,
       max(CASE WHEN rn = (90 * n + 99) // 100
                THEN CAST(round(l_extendedprice * 100, 0) AS BIGINT) END) AS p90_cents
FROM ranked GROUP BY l_returnflag
"""


def a16_profile(spark: SparkSession, sf: str) -> DataFrame:
    """One-pass column profiler (ANALYZE-style data quality summary):
    null count, exact distinct, min/max per column — the
    deequ/profiling surface the reference approximates with ad-hoc
    completeness tallies (product-quality-service.ts:90-158,
    processors/base.ts:626-716).

    Scale shape: a single global aggregate; the multiple exact
    COUNT(DISTINCT) columns compile to one Expand + hash aggregate
    (data duplicated once per distinct column — the documented cost
    of exactness; swap in approx_count_distinct per column at the
    100 TB tier). Min/max for doubles are emitted in integer cents so
    the unpivoted string column is engine-stable."""
    o = load(spark, sf, "orders")
    cents = lambda c: F.round(F.col(c) * 100, 0).cast("long")  # noqa: E731
    agg = o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        # o_orderstatus
        F.sum(F.col("o_orderstatus").isNull().cast("long")).alias("s_nulls"),
        F.countDistinct("o_orderstatus").alias("s_nd"),
        F.min("o_orderstatus").alias("s_min"),
        F.max("o_orderstatus").alias("s_max"),
        # o_custkey
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("c_nulls"),
        F.countDistinct("o_custkey").alias("c_nd"),
        F.min("o_custkey").cast("string").alias("c_min"),
        F.max("o_custkey").cast("string").alias("c_max"),
        # o_totalprice
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("t_nulls"),
        F.countDistinct("o_totalprice").alias("t_nd"),
        F.min(cents("o_totalprice")).cast("string").alias("t_min"),
        F.max(cents("o_totalprice")).cast("string").alias("t_max"),
    )
    return agg.select(
        "n_rows",
        F.expr(
            "stack(3, "
            "'o_orderstatus', s_nulls, s_nd, s_min, s_max, "
            "'o_custkey', c_nulls, c_nd, c_min, c_max, "
            "'o_totalprice', t_nulls, t_nd, t_min, t_max) "
            "AS (col_name, n_nulls, n_distinct, min_s, max_s)"
        ),
    )


A16_ORACLE = """
WITH base AS (SELECT count(*) AS n_rows FROM orders)
SELECT n_rows, 'o_orderstatus' AS col_name,
       (SELECT CAST(count(*) - count(o_orderstatus) AS BIGINT) FROM orders) AS n_nulls,
       (SELECT CAST(count(DISTINCT o_orderstatus) AS BIGINT) FROM orders) AS n_distinct,
       (SELECT min(o_orderstatus) FROM orders) AS min_s,
       (SELECT max(o_orderstatus) FROM orders) AS max_s
FROM base
UNION ALL
SELECT n_rows, 'o_custkey',
       (SELECT CAST(count(*) - count(o_custkey) AS BIGINT) FROM orders),
       (SELECT CAST(count(DISTINCT o_custkey) AS BIGINT) FROM orders),
       (SELECT CAST(min(o_custkey) AS VARCHAR) FROM orders),
       (SELECT CAST(max(o_custkey) AS VARCHAR) FROM orders)
FROM base
UNION ALL
SELECT n_rows, 'o_totalprice',
       (SELECT CAST(count(*) - count(o_totalprice) AS BIGINT) FROM orders),
       (SELECT CAST(count(DISTINCT o_totalprice) AS BIGINT) FROM orders),
       (SELECT CAST(CAST(min(round(o_totalprice * 100, 0)) AS BIGINT) AS VARCHAR) FROM orders),
       (SELECT CAST(CAST(max(round(o_totalprice * 100, 0)) AS BIGINT) AS VARCHAR) FROM orders)
FROM base
"""


def a19_unpivot(spark: SparkSession, sf: str) -> DataFrame:
    """UNPIVOT (melt): the a14 crosstab back to long form — the
    inverse reshaping a report consumer needs before re-aggregating.
    Spark's native `unpivot` compiles to one Expand node over the
    tiny pivoted frame (no shuffle beyond a14's own aggregation)."""
    p = a14_pivot(spark, sf)
    return p.unpivot(
        ["o_orderpriority"], ["cnt_f", "cnt_o", "cnt_p"], "status_col", "cnt"
    )


A19_ORACLE = f"""
WITH p AS ({A14_ORACLE})
SELECT o_orderpriority, status_col, cnt
FROM p UNPIVOT (cnt FOR status_col IN (cnt_f, cnt_o, cnt_p))
"""


def a20_window_suite(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking/distribution/offset window functions in one pass:
    ntile quartiles, percent_rank, cume_dist, lag/lead neighbors and
    delta — all over ONE window specification, so Catalyst plans a
    single sort-shuffle on (status) and evaluates every function in
    the same Window operator (one pass over each partition).

    Cross-engine hash safety: the order key is exact integer cents
    with a unique tiebreak, and percent_rank/cume_dist are ratios of
    exact small integers — IEEE double division is correctly rounded
    in both engines, so raw doubles hash identically."""
    o = load(spark, sf, "orders")
    b = o.select(
        "o_orderkey",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
    )
    w = Window.partitionBy("o_orderstatus").orderBy("price_cents", "o_orderkey")
    return b.select(
        "o_orderkey",
        "o_orderstatus",
        "price_cents",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.lag("price_cents").over(w).alias("prev_cents"),
        F.lead("price_cents").over(w).alias("next_cents"),
        (F.col("price_cents") - F.lag("price_cents").over(w)).alias("delta_cents"),
    )


A20_ORACLE = """
WITH b AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS price_cents
  FROM orders)
SELECT o_orderkey, o_orderstatus, price_cents,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd,
       lag(price_cents) OVER w AS prev_cents,
       lead(price_cents) OVER w AS next_cents,
       price_cents - lag(price_cents) OVER w AS delta_cents
FROM b WINDOW w AS (PARTITION BY o_orderstatus ORDER BY price_cents, o_orderkey)
"""


SPECS = [
    QuerySpec("s1_scan_pushdown", s1_scan_pushdown, S1_ORACLE, "S1/S3 filtered scan"),
    QuerySpec("s5_point_lookup", s5_point_lookup, S5_ORACLE, "S5 point lookup"),
    QuerySpec("f6_validity_split", f6_validity_split, F6_ORACLE, "F6 validity rules"),
    QuerySpec("p5_coalesce_projection", p5_coalesce_projection, P5_ORACLE, "P5 projection"),
    QuerySpec("dd1_latest_per_key", dd1_latest_per_key, DD1_ORACLE, "DD1/ST3 dedupe"),
    QuerySpec("j1_broadcast_enrich", j1_broadcast_enrich, J1_ORACLE, "J1/J2 broadcast join"),
    QuerySpec("j5_multiway_revenue", j5_multiway_revenue, J5_ORACLE, "J5/J6 multiway join"),
    QuerySpec("j9_salted_revenue", j9_salted_revenue, J9_ORACLE,
              "skew-salted shuffle join == plain join (oracle-gated)"),
    QuerySpec("j3_fuzzy_theta", j3_fuzzy_theta, J3_ORACLE, "J3/DD3 fuzzy theta join"),
    QuerySpec("u4_anti_join_missing", u4_anti_join_missing, U4_ORACLE, "U4 anti join"),
    QuerySpec("semi_join_active", semi_join_active, SEMI_ORACLE, "semi join"),
    QuerySpec("a1_status_counters", a1_status_counters, A1_ORACLE, "A1/A6 counters"),
    QuerySpec("a4_price_stats", a4_price_stats, A4_ORACLE, "A4 price stats + median"),
    QuerySpec("a3_type_distribution", a3_type_distribution, A3_ORACLE, "A3 distribution"),
    QuerySpec("a7_event_summary", a7_event_summary, A7_ORACLE, "A7 conditional agg"),
    QuerySpec("a8_version_stats", a8_version_stats, A8_ORACLE, "A8 groupBy2 stats"),
    QuerySpec("rollup_region_nation", rollup_region_nation, ROLLUP_ORACLE, "rollup report"),
    QuerySpec("cube_status_priority", cube_status_priority, CUBE_ORACLE,
              "cube grouping-sets report"),
    QuerySpec("j7_first_last_seen", j7_first_last_seen, J7B_ORACLE,
              "price-history first/last seen"),
    QuerySpec("a13_distinct_parts", a13_distinct_parts, A13_ORACLE, "A13 exact distinct"),
    QuerySpec("a13_approx_distinct", a13_approx_distinct, A13_APPROX_ORACLE,
              "A13 approx distinct, self-certified within 5×rsd of exact"),
    QuerySpec("a21_approx_percentile", a21_approx_percentile, A21_ORACLE,
              "approx percentile sketch, self-certified inside ±2% rank bands"),
    QuerySpec("o1_pagination", o1_pagination, O1_ORACLE, "O1 pagination"),
    QuerySpec("o7_topk_per_group", o7_topk_per_group, O7_ORACLE, "O7 top-k per group"),
    QuerySpec("o4_argmax_per_group", o4_argmax_per_group, O4_ORACLE, "O4 argmax"),
    QuerySpec("u1_union_distinct", u1_union_distinct, U1_ORACLE, "U1/U2 union distinct"),
    QuerySpec("o9_keyset_pagination", o9_keyset_pagination, O9_ORACLE,
              "keyset pagination (cursor, O(page) cost)"),
    QuerySpec("u5_intersect_except", u5_intersect_except, U5_ORACLE,
              "INTERSECT / EXCEPT set operations"),
    QuerySpec("j10_full_outer_reconcile", j10_full_outer_reconcile, J10_ORACLE,
              "FULL OUTER reconciliation report"),
    QuerySpec("a18_grouping_sets", a18_grouping_sets, A18_ORACLE,
              "arbitrary GROUPING SETS in one Expand pass"),
    QuerySpec("j8_range_join", j8_range_join, J8_ORACLE,
              "bin-blocked interval join (big×big range join)"),
    QuerySpec("a14_pivot", a14_pivot, A14_ORACLE,
              "pivot/crosstab with explicit value domain"),
    QuerySpec("a19_unpivot", a19_unpivot, A19_ORACLE,
              "UNPIVOT/melt wide crosstab to long form"),
    QuerySpec("a20_window_suite", a20_window_suite, A20_ORACLE,
              "ntile/percent_rank/cume_dist/lag/lead in one window pass"),
    QuerySpec("a15_percentile_bands", a15_percentile_bands, A15_ORACLE,
              "exact nearest-rank percentiles, one sort-shuffle"),
    QuerySpec("a16_profile", a16_profile, A16_ORACLE,
              "one-pass column profiler (nulls/distinct/min/max)"),
]
