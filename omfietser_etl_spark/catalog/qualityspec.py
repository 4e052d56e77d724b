"""Quality-score + validation-rule queries (A2/X3/A9) under the
correctness gate, driven by the synthesized jumbo pipeline variants
(whose unified outputs are fully determined — see
catalog/pipelines.py), with controlled mutations to make specific
rules fire.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omfietser_etl_spark.operators.quality import quality_report
from omfietser_etl_spark.operators.validation import RULE_META, validation_summary

from . import QuerySpec
from .pipelines import _jumbo_raw, p2_jumbo_pipeline
from omfietser_etl_spark.pipelines import jumbo


_UNIFIED_MEMO: dict[tuple[int, str], DataFrame] = {}


def _jumbo_unified(spark: SparkSession, sf: str) -> DataFrame:
    """Shared input for q2/x3: build and persist the jumbo unified
    frame once per (session, sf) — the second consumer reuses the
    materialized batch instead of re-running the whole cascade.

    LIVENESS RE-CHECK (round 13 — the x3 pollution diagnosis): the
    memo used to lean on split_errors' persist, which registers under
    the SHARED "pipelines.split_errors" scope — any later pipeline
    query (p1/p3/p4/p6, f5…) rolls that scope over and unpersists the
    jumbo batch out from under the memo. x3 then re-ran the whole
    uncached cascade on EVERY action: 1.3 s clean vs 2.9–14.4 s in
    full-catalog windows (the round-11/12 verdicts' open item). Now
    the memo owns its own persist under a dedicated scope AND checks
    ``storageLevel`` on every access — a frame whose cache was
    dropped (another pipeline's rollover, a harness release_all())
    is rebuilt and re-persisted instead of silently degrading.
    Stale entries (other session / other sf) still unpersist on
    rollover, so a session sweeping scale factors holds one batch."""
    from omfietser_etl_spark.cacheutil import persist_replannable

    key = (id(spark), sf)
    df = _UNIFIED_MEMO.get(key)
    if df is not None:
        try:
            if df.storageLevel.useMemory or df.storageLevel.useDisk:
                return df
        except Exception:  # noqa: BLE001 — stale session already gone
            pass
    for old_key in [k for k in _UNIFIED_MEMO if k != key]:
        try:
            _UNIFIED_MEMO.pop(old_key).unpersist()
        except Exception:  # noqa: BLE001 — stale session already gone
            pass
    unified, _ = jumbo.pipeline(_jumbo_raw(spark, sf))
    unified = persist_replannable("qualityspec.jumbo_unified", unified)
    _UNIFIED_MEMO[key] = unified
    return unified


# Scores per variant (additive, base 50): v0 has no image/no promo →
# 50+5+5+5+10+5 = 80; v1/v2 add promo(10) → 90.

def q2_quality_report(spark: SparkSession, sf: str) -> DataFrame:
    return quality_report(_jumbo_unified(spark, sf))


Q2_ORACLE = """
WITH n AS (SELECT
    count(*) FILTER (WHERE p_partkey % 4 = 0) AS n0,
    count(*) FILTER (WHERE p_partkey % 4 IN (1, 2)) AS n12
  FROM part)
SELECT 'JUMBO' AS shop_type,
    n0 + n12 AS n_products,
    CAST(floor((80 * n0 + 90 * n12) * 100.0 / (n0 + n12)) AS BIGINT) AS avg_score_x100,
    n12 AS "n_90-100",
    n0 AS "n_80-89",
    0 AS "n_70-79", 0 AS "n_60-69", 0 AS "n_50-59", 0 AS "n_<50"
FROM n
"""


def x3_validation_summary(spark: SparkSession, sf: str) -> DataFrame:
    """Mutate one field per variant class so three rules fire with
    known counts: v0 → empty title, v1 → zero price, v2 → promo with
    mechanism 'none'."""
    u = _jumbo_unified(spark, sf)
    v = F.regexp_replace("unified_id", "^J", "").cast("long") % 4
    mutated = (
        u.withColumn("title", F.when(v == 0, "").otherwise(F.col("title")))
        .withColumn("current_price", F.when(v == 1, 0.0).otherwise(F.col("current_price")))
        .withColumn(
            "promotion_mechanism",
            F.when(v == 2, "none").otherwise(F.col("promotion_mechanism")),
        )
    )
    return validation_summary(mutated)


def _x3_oracle() -> str:
    sev = dict(RULE_META)
    counts = {
        "required_title": "(SELECT count(*) FROM part WHERE p_partkey % 4 = 0)",
        "valid_price": "(SELECT count(*) FROM part WHERE p_partkey % 4 = 1)",
        "promotion_consistency": "(SELECT count(*) FROM part WHERE p_partkey % 4 = 2)",
    }
    selects = [
        f"SELECT '{name}' AS rule, '{sev[name]}' AS severity, "
        f"{counts.get(name, '0')} AS n_violations"
        for name in sev
    ]
    return " UNION ALL ".join(selects)


SPECS = [
    QuerySpec("q2_quality_report", q2_quality_report, Q2_ORACLE,
              "A2 quality score histogram"),
    QuerySpec("x3_validation_summary", x3_validation_summary, _x3_oracle(),
              "X3/A9 validation rule summary"),
]
