"""Multimodal media queries under the correctness gate (project-brief
extension ⊕): binary media columns synthesized deterministically from
``documents``, then feature-extraction shape, resize geometry, and
frame-sampling — the Spark-side plumbing the brief asks to make real
(the codec itself stays stubbed; see multimodal/media.py).

Oracles cover everything deterministic and engine-neutral: byte
lengths (UTF-8 payloads), media-kind routing, resize arithmetic, and
frame timestamps. The sha256-seeded fake feature VALUES are checked by
unit tests (float32 vectors don't hash stably across engines), but the
feature-vector SHAPE (size) is oracled here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from omfietser_etl_spark.multimodal.media import (
    N_FEATURES,
    extract_features,
    frame_sample_plan,
    resize_plan,
    synthesize_media,
)
from omfietser_etl_spark.session import load

from . import QuerySpec


def _media(spark: SparkSession, sf: str) -> DataFrame:
    return synthesize_media(load(spark, sf, "documents"), "doc_id", "text")


def mm1_feature_extract(spark: SparkSession, sf: str) -> DataFrame:
    """mapInPandas feature extraction: id/kind routing, payload byte
    count, and feature-vector arity (values unit-tested)."""
    feats = extract_features(_media(spark, sf))
    return feats.select(
        "media_id", "kind", "n_bytes", F.size("features").alias("n_features")
    )


MM1_ORACLE = f"""
SELECT doc_id AS media_id,
  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  octet_length(encode(text)) AS n_bytes,
  {N_FEATURES} AS n_features
FROM documents
"""


def mm2_resize_plan(spark: SparkSession, sf: str) -> DataFrame:
    return resize_plan(_media(spark, sf), max_side=256)


MM2_ORACLE = """
WITH m AS (
  SELECT doc_id AS media_id,
    CAST((doc_id % 8 + 1) * 64 AS INT) AS width,
    CAST((doc_id % 4 + 1) * 64 AS INT) AS height
  FROM documents WHERE doc_id % 3 = 0),
s AS (
  SELECT *, least(1.0, 256 / CAST(greatest(width, height) AS DOUBLE)) AS raw_scale
  FROM m)
SELECT media_id, width, height, round(raw_scale, 4) AS scale,
       CAST(ceil(width * raw_scale) AS INT) AS out_width,
       CAST(ceil(height * raw_scale) AS INT) AS out_height
FROM s
"""


def mm3_frame_sample(spark: SparkSession, sf: str) -> DataFrame:
    return frame_sample_plan(_media(spark, sf), n_frames=4)


MM3_ORACLE = """
SELECT doc_id AS media_id,
       CAST((doc_id % 10 + 1) * 1000 AS BIGINT) AS duration_ms,
       CAST(i * ((doc_id % 10 + 1) * 1000) / 4 AS BIGINT) AS frame_ts_ms
FROM documents, generate_series(0, 3) AS t(i)
WHERE doc_id % 3 = 2
"""


SPECS = [
    QuerySpec("mm1_feature_extract", mm1_feature_extract, MM1_ORACLE,
              "multimodal mapInPandas feature extraction shape"),
    QuerySpec("mm2_resize_plan", mm2_resize_plan, MM2_ORACLE,
              "multimodal resize geometry"),
    QuerySpec("mm3_frame_sample", mm3_frame_sample, MM3_ORACLE,
              "multimodal video frame sampling"),
]
