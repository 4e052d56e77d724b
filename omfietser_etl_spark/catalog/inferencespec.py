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
    char-3-grams, tools/train_category_model.py) on the exact-integer
    scoring path: log-probs quantized to int64 micrologits
    (operators/inference.py NB_SCALE), so the DuckDB oracle replays
    the full argmax bit-for-bit from the sparse delta-weight table —
    the catalog's last rows-only query is now fully value-hash gated
    (round-4 verdict item 3). The float/softmax API path stays in
    `infer_categories_nb` (pytest-covered)."""
    from omfietser_etl_spark.operators.inference import infer_categories_nb_exact

    parts = load(spark, sf, "part").select(
        F.col("p_partkey").alias("pid"), F.col("p_name").alias("title")
    )
    return infer_categories_nb_exact(parts)


def _x8_oracle() -> str:
    """Replay the quantized NB argmax in DuckDB.

    Decomposition keeping the literal small: for class c,
    Wq[c,d] == baseq[c] (the unseen-cell value, the per-row minimum)
    everywhere except the ~1.2k (class, bucket) cells the training set
    touched, so score(c) = n_grams*baseq[c] + priorq[c] +
    Σ_seen X[bucket]*delta[c,bucket]. All int64; ties broken by class
    index exactly like numpy argmax's first-max rule."""
    from omfietser_etl_spark.operators.inference import nb_quantized_weights

    Wq, priorq, labels, dim, seed, mod = nb_quantized_weights()
    base = Wq.min(axis=1)
    cls_rows = ", ".join(
        f"({c}, '{labels[c]}', {int(base[c])}, {int(priorq[c])})"
        for c in range(len(labels))
    )
    nz = (Wq != base[:, None]).nonzero()
    delta_rows = ", ".join(
        f"({int(c)}, {int(d)}, {int(Wq[c, d] - base[c])})"
        for c, d in zip(nz[0], nz[1])
    )
    return f"""
WITH cls(cid, label, baseq, priorq) AS (VALUES {cls_rows}),
w(cid, bucket, delta) AS (VALUES {delta_rows}),
doc AS (
  SELECT p_partkey AS pid, p_name AS title,
         ' ' || lower(p_name) || ' ' AS s
  FROM part),
pos AS (
  SELECT pid, s, unnest(generate_series(1, length(s) - 2)) AS i FROM doc),
grams AS (
  SELECT pid,
    (((((CAST({seed} AS BIGINT) * 31 + ascii(substr(s, i, 1))) % {mod}) * 31
        + ascii(substr(s, i + 1, 1))) % {mod}) * 31
        + ascii(substr(s, i + 2, 1))) % {mod} % {dim} AS bucket
  FROM pos),
feats AS (
  SELECT pid, bucket, count(*) AS n FROM grams GROUP BY 1, 2),
contrib AS (
  SELECT f.pid, w.cid, SUM(f.n * w.delta) AS dsum
  FROM feats f JOIN w ON f.bucket = w.bucket
  GROUP BY 1, 2),
scores AS (
  SELECT d.pid, c.cid, c.label,
         (length(d.s) - 2) * CAST(c.baseq AS BIGINT) + c.priorq
           + COALESCE(ct.dsum, 0) AS score
  FROM doc d CROSS JOIN cls c
  LEFT JOIN contrib ct ON ct.pid = d.pid AND ct.cid = c.cid),
ranked AS (
  SELECT pid, label, score,
         row_number() OVER (PARTITION BY pid ORDER BY score DESC, cid ASC) AS rn
  FROM scores)
SELECT d.pid, d.title,
       r1.label AS pred_label,
       CAST(r1.score AS BIGINT) AS score_q,
       CAST(r1.score - r2.score AS BIGINT) AS margin_q
FROM doc d
JOIN ranked r1 ON r1.pid = d.pid AND r1.rn = 1
JOIN ranked r2 ON r2.pid = d.pid AND r2.rn = 2
"""


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


def x11_ols_normal_eq(spark: SparkSession, sf: str) -> DataFrame:
    """3-parameter OLS (extendedprice ~ 1 + quantity + discount, all
    ×100 exact BIGINT fixed-point) via the normal equations — one
    map-side-combined aggregate over the fact table + an in-plan
    Cramer solve (operators/regression.py::ols3_fit). The plan's only
    exchange carries 9 longs per map task; zero collect, zero driver
    actions — the pattern that replaces per-epoch gradient passes for
    small-k linear fits at 100 TB."""
    from omfietser_etl_spark.operators.regression import ols3_fit, scaled_long

    li = load(spark, sf, "lineitem").select(
        scaled_long(F.col("l_quantity")).alias("x1"),
        scaled_long(F.col("l_discount")).alias("x2"),
        scaled_long(F.col("l_extendedprice")).alias("y"),
    )
    return ols3_fit(li, "x1", "x2", "y")


def _x11_oracle() -> str:
    from omfietser_etl_spark.operators.regression import OLS_SCALE, ols3_oracle_sql

    s = OLS_SCALE
    return ols3_oracle_sql(
        f"SELECT CAST(round(l_quantity * {s}) AS BIGINT) AS x1, "
        f"CAST(round(l_discount * {s}) AS BIGINT) AS x2, "
        f"CAST(round(l_extendedprice * {s}) AS BIGINT) AS y FROM lineitem"
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
        _x8_oracle(),
        "X2 real trained NB model, exact-integer scoring, full oracle",
    ),
    QuerySpec(
        "x9_nb_train_fit",
        x9_nb_train_fit,
        _x9_oracle(),
        "NB artifact self-certifies its training-alias fit bound",
    ),
    QuerySpec(
        "x11_ols_normal_eq",
        x11_ols_normal_eq,
        _x11_oracle(),
        "distributed OLS: one 9-sum aggregate + in-plan Cramer solve",
    ),
]
