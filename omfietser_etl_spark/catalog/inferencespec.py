"""X2 online model-inference query under the correctness gate.

The model itself is the deterministic stand-in from
``operators.inference`` (polynomial title hash → label + confidence
basis points) so the DuckDB oracle can replicate it exactly — what
the gate then proves is the *operator*: Arrow-batched mapInPandas
inference with schema passthrough and the confidence-threshold
consumption step (ref: src/scripts/ml/batch_categorize.py:27-41
producer; category/prediction.ts:74-87 consumer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omfietser_etl_spark.config.categories import FINAL_CATEGORIES
from omfietser_etl_spark.operators.inference import (
    CONF_THRESHOLD_BP,
    infer_categories,
    infer_categories_nb,
)
from omfietser_etl_spark.session import load
from omfietser_etl_spark.textops.constants import CHAR_SEED, MOD

from . import QuerySpec


def x2_online_inference(spark: SparkSession, sf: str) -> DataFrame:
    parts = load(spark, sf, "part").select(
        F.col("p_partkey").alias("pid"), F.col("p_name").alias("title")
    )
    return infer_categories(parts)


def _x2_oracle() -> str:
    labels = ", ".join(f"'{c}'" for c in FINAL_CATEGORIES)
    return f"""
WITH h AS (
  SELECT p_partkey AS pid, p_name AS title,
         list_reduce(list_prepend(CAST({CHAR_SEED} AS BIGINT),
           list_transform(string_split_regex(p_name, ''),
                          c -> CAST(ascii(c) AS BIGINT))),
           (a, b) -> (a * 31 + b) % {MOD}) AS h
  FROM part)
SELECT pid, title,
       ([{labels}])[h % {len(FINAL_CATEGORIES)} + 1] AS pred_label,
       h % 10000 AS conf_bp,
       h % 10000 >= {CONF_THRESHOLD_BP} AS accepted
FROM h
"""


def x8_nb_inference(spark: SparkSession, sf: str) -> DataFrame:
    """X2 with the REAL trained artifact (multinomial NB over hashed
    char-3-grams, tools/train_category_model.py): genuinely non-SQL
    model scoring, so this rides the rows-only check by design — the
    exact gate on the operator plumbing is x2_online_inference, and
    the model's own fit/determinism is pytest-covered
    (tests/test_inference.py)."""
    parts = load(spark, sf, "part").select(
        F.col("p_partkey").alias("pid"), F.col("p_name").alias("title")
    )
    return infer_categories_nb(parts)


#: x9 bound: the committed artifact fits 164/165 training aliases
#: (9939 bp — one 'Tussendoortjes' alias collides); 9500 bp leaves
#: margin while still catching a corrupted/regressed artifact.
X9_FIT_MIN_BP = 9500


def x9_nb_train_fit(spark: SparkSession, sf: str) -> DataFrame:
    """Self-certifying fit gate for the REAL NB artifact: score the
    public alias table the model was trained on (a repo constant, so
    both engines know it) and emit a hash-gated boolean asserting
    training fit ≥ 95%. Model scoring itself stays non-SQL (x8 rides
    rows-only for the open-set inference); what the oracle certifies
    here is that the committed artifact honors its fit contract — a
    corrupted or regressed artifact flips fit_ok and the row goes red.
    ``sf`` is unused: the eval set is the alias constant."""
    from omfietser_etl_spark.operators.category import CATEGORY_ALIAS_PATTERNS

    aliases = spark.createDataFrame(
        list(CATEGORY_ALIAS_PATTERNS), "title string, true_cat string"
    )
    pred = infer_categories_nb(aliases)
    return pred.agg(
        F.count("*").cast("long").alias("n_aliases"),
        (
            F.sum(F.when(F.col("pred_label") == F.col("true_cat"), 1).otherwise(0))
            * 10000
            >= F.lit(X9_FIT_MIN_BP) * F.count("*")
        ).alias("fit_ok"),
    )


def _x9_oracle() -> str:
    from omfietser_etl_spark.operators.category import CATEGORY_ALIAS_PATTERNS

    return (
        f"SELECT CAST({len(CATEGORY_ALIAS_PATTERNS)} AS BIGINT) AS n_aliases, "
        "TRUE AS fit_ok"
    )


SPECS = [
    QuerySpec(
        "x2_online_inference",
        x2_online_inference,
        _x2_oracle(),
        "X2 model-inference column + confidence threshold",
    ),
    QuerySpec(
        "x8_nb_inference",
        x8_nb_inference,
        None,  # real model scoring is not SQL-expressible
        "X2 with the real trained NB category model",
    ),
    QuerySpec(
        "x9_nb_train_fit",
        x9_nb_train_fit,
        _x9_oracle(),
        "NB artifact self-certifies its training-alias fit bound",
    ),
]
