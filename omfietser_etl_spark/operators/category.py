"""Category normalization cascade (SURVEY §2.7).

Re-expresses the reference's 7-step normalizer
(ref: projects/processor/src/core/services/category/normalizer.ts:384-496
cascade order; :530-552 fuzzy argmax; :498-528 ML-prediction mapping)
Spark-first:

- the string-only steps (exact / normalized / alias / containment /
  fuzzy) are resolved ONCE per DISTINCT (category, shop) key — the
  distinct key set is dimension-sized (the reference holds the same
  tables as in-memory singleton maps, normalizer.ts:57-92), so the
  cascade runs driver-side in Python and the result broadcast-joins
  back to the fact rows.  This keeps the per-row plan free of
  500-node literal expressions and is the 100 TB posture: fuzzy
  matching cost is O(distinct keys × 191 patterns), never O(rows);
- the ML step is an exact-title broadcast lookup against a
  predictions table (the reference precomputes title→prediction JSON,
  X2), mapped onto the canon on the small side.
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config.categories import (
    CATEGORY_ALIAS_PATTERNS,
    CATEGORY_STOPWORDS,
    DEFAULT_CATEGORY,
    FINAL_CATEGORIES,
)

ML_CONFIDENCE = 0.65
ML_CONFIDENCE_SPECIAL = 0.4  # Aldi trots/aldi special case

_STOP_RX = re.compile(r"\b(" + "|".join(CATEGORY_STOPWORDS) + r")\b")


def _norm(s: str) -> str:
    """Category string normalizer (ref: normalizer.ts:94-103)."""
    out = s.lower().strip()
    out = re.sub(r"[,\-_/\\()&]", " ", out)
    out = _STOP_RX.sub("", out)
    return re.sub(r"\s+", " ", out).strip()


_EXACT = {c.lower(): c for c in FINAL_CATEGORIES}
_NORMALIZED: dict[str, str] = {}
for _c in FINAL_CATEGORIES:
    _n = _norm(_c)
    _NORMALIZED.setdefault(_n, _c)
    _NORMALIZED.setdefault(_n.replace(" ", ""), _c)
_COMMON = dict(CATEGORY_ALIAS_PATTERNS)
_FINALS_NORM = [(c, _norm(c)) for c in FINAL_CATEGORIES]


def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        curr = [i]
        for j, cb in enumerate(b, 1):
            curr.append(min(prev[j] + 1, curr[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = curr
    return prev[-1]


def _fuzzy_best(norm_input: str) -> str:
    """Similarity argmax over the finals; strict > keeps the earlier
    final on ties (ref: normalizer.ts:530-552)."""
    best, best_score = DEFAULT_CATEGORY, 0.0
    for final, norm_final in _FINALS_NORM:
        if not norm_input or not norm_final:
            continue
        dist = _levenshtein(norm_input, norm_final)
        score = 1.0 - dist / max(len(norm_input), len(norm_final))
        if score > best_score:
            best, best_score = final, score
    return best


def _static_match(cat: str) -> str | None:
    """Steps 1–4: exact → normalized → alias exact → containment
    either direction, first alias wins (ref: normalizer.ts:402-430)."""
    hit = _EXACT.get(cat.lower())
    if hit:
        return hit
    norm = _norm(cat)
    hit = _NORMALIZED.get(norm) or _COMMON.get(norm)
    if hit:
        return hit
    for pattern, target in CATEGORY_ALIAS_PATTERNS:
        if pattern in norm or norm in pattern:
            return target
    return None


@lru_cache(maxsize=65536)
def resolve_static(cat: str, shop: str) -> tuple[str | None, bool, str, bool]:
    """(static_result, is_aldi_special, fuzzy_result, is_empty) for
    one distinct key."""
    if not cat or not cat.strip():
        return None, False, DEFAULT_CATEGORY, True
    norm = _norm(cat)
    special = shop == "ALDI" and ("trots" in norm or "aldi" in norm)
    return _static_match(cat), special, _fuzzy_best(norm), False


def to_final_category(cat: str) -> str:
    """Map an arbitrary (e.g. ML-predicted) label onto the canon
    (ref: normalizer.ts:498-528)."""
    if cat in FINAL_CATEGORIES:
        return cat
    norm = _norm(cat)
    hit = _NORMALIZED.get(norm) or _COMMON.get(norm)
    if hit:
        return hit
    for pattern, target in CATEGORY_ALIAS_PATTERNS:
        if pattern in norm or norm in pattern:
            return target
    return _fuzzy_best(norm)


def normalize_category(title: str | None, cat: str | None, shop: str,
                       prediction: tuple[str, float] | None = None) -> str:
    """Full per-value cascade (driver-side use / tests)."""
    static, special, fuzzy, empty = resolve_static(cat or "", shop)
    pred_final, conf = (None, 0.0)
    if prediction:
        pred_final, conf = to_final_category(prediction[0]), prediction[1]
    if empty:
        if title and pred_final and conf >= ML_CONFIDENCE:
            return pred_final
        return DEFAULT_CATEGORY
    if static:
        return static
    if special:
        if title and pred_final and conf >= ML_CONFIDENCE_SPECIAL:
            return pred_final
        return DEFAULT_CATEGORY
    if title and pred_final and conf >= ML_CONFIDENCE:
        return pred_final
    return fuzzy


def normalize_categories(
    df: DataFrame,
    category_col: str = "main_category",
    title_col: str = "title",
    shop_col: str = "shop_type",
    predictions: DataFrame | None = None,
    output_col: str | None = None,
    method_col: str | None = None,
    broadcast_predictions: bool = True,
    materialize_input: bool = True,
) -> DataFrame:
    """Attach the normalized category column (default: overwrite
    `category_col`).

    Collects the DISTINCT (category, shop) keys (dimension-sized),
    resolves the cascade in Python, and broadcast-joins the mapping
    back — the fact side never shuffles.

    The distinct-key collect is an EAGER action over ``df``; without
    ``materialize_input`` the upstream plan (for the shop pipelines:
    from_json + the whole transform cascade) would execute twice —
    once here, once when the result is consumed. The default persist
    (MEMORY_AND_DISK, batch-slice-sized — the reference processes
    bounded job slices too) makes the collect the single
    materialization pass. Pass ``False`` for inputs that are already
    cached or trivially cheap to recompute.

    ``method_col`` additionally emits which cascade step resolved each
    row — static/ml/special/fuzzy/default — mirroring the reference's
    mapping-method stats (A12, ref: normalizer.ts:577-580,55-63).
    """
    from pyspark import StorageLevel

    spark = df.sparkSession
    output_col = output_col or category_col
    if materialize_input:
        df = df.persist(StorageLevel.MEMORY_AND_DISK)

    keys = [
        (r[0] or "", r[1])
        for r in df.select(
            F.coalesce(F.col(category_col), F.lit("")), F.col(shop_col)
        ).distinct().collect()
    ]
    resolved_rows = []
    for cat, shop in keys:
        static, special, fuzzy, empty = resolve_static(cat, shop)
        resolved_rows.append((cat, shop, static, special, fuzzy, empty))
    resolved = spark.createDataFrame(
        resolved_rows,
        "_cat_key string, _shop_key string, _static string, _special boolean, "
        "_fuzzy string, _empty boolean",
    )

    left = df.withColumns(
        {
            "_cat_key": F.coalesce(F.col(category_col), F.lit("")),
            "_shop_key": F.col(shop_col),
        }
    )
    out = left.join(
        F.broadcast(resolved), on=["_cat_key", "_shop_key"], how="left"
    )

    if predictions is not None:
        # The title-keyed predictions table stays DISTRIBUTED (it is
        # row-scaled — millions at 100 TB). Only its DISTINCT label
        # set (bounded by the model's label space) is collected to
        # resolve label→canon in Python; that tiny map broadcast-joins
        # onto predictions. The reference instead loads the whole
        # title→prediction JSON in memory (prediction.ts:30-35) —
        # fine single-node, wrong shape at scale.
        labels = [
            r[0] or ""
            for r in predictions.select(F.col("category")).distinct().collect()
        ]
        canon = spark.createDataFrame(
            [(lbl, to_final_category(lbl)) for lbl in labels],
            "_pred_cat string, _pred_final string",
        )
        preds = (
            predictions.select(
                F.col("title").alias("_pred_title"),
                F.coalesce(F.col("category"), F.lit("")).alias("_pred_cat"),
                F.col("confidence").cast("double").alias("_pred_conf"),
            )
            .join(F.broadcast(canon), "_pred_cat")
            .drop("_pred_cat")
        )
        # Broadcast the prediction side only when the caller says it
        # fits (default: reference-sized dim table). At scale, leave
        # it to AQE / a bucketed shuffle join on title.
        side = F.broadcast(preds) if broadcast_predictions else preds
        out = out.join(side, out[title_col] == F.col("_pred_title"), "left")
        ml_65 = F.when(F.col("_pred_conf") >= ML_CONFIDENCE, F.col("_pred_final"))
        ml_40 = F.when(F.col("_pred_conf") >= ML_CONFIDENCE_SPECIAL, F.col("_pred_final"))
    else:
        ml_65 = F.lit(None).cast("string")
        ml_40 = F.lit(None).cast("string")

    final = F.when(F.col("_empty"), F.coalesce(ml_65, F.lit(DEFAULT_CATEGORY))).otherwise(
        F.coalesce(
            F.col("_static"),
            F.when(F.col("_special"), F.coalesce(ml_40, F.lit(DEFAULT_CATEGORY))),
            ml_65,
            F.col("_fuzzy"),
        )
    )
    out = out.withColumn(output_col, final)
    if method_col is not None:
        ml65_hit = ml_65.isNotNull()
        ml40_hit = ml_40.isNotNull()
        out = out.withColumn(
            method_col,
            F.when(F.col("_empty"), F.when(ml65_hit, "ml").otherwise("default"))
            .when(F.col("_static").isNotNull(), "static")
            .when(F.col("_special"), F.when(ml40_hit, "ml").otherwise("special_default"))
            .when(ml65_hit, "ml")
            .otherwise("fuzzy"),
        )
    drop = ["_cat_key", "_shop_key", "_static", "_special", "_fuzzy", "_empty"]
    if predictions is not None:
        drop += ["_pred_title", "_pred_final", "_pred_conf"]
    return out.drop(*drop)
