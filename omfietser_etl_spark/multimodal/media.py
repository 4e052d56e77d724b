"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas``.

Per the project brief, the decode step is STUBBED (image/audio codec
libraries are not in this container): ``decode_image`` raises
``NotImplementedError`` unless a deterministic fake decoder is
requested. Everything Spark-side — schemas, batch iteration, UDF
signatures, partition behavior, output shapes — is real and tested.

Scale notes:
- media bytes stay in the executors end-to-end (no collect); Arrow
  moves them to Python in columnar batches, sized by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` — tune down for
  large blobs so a batch fits in worker memory.
- feature extraction is embarrassingly parallel; repartition by a
  key (not by blob size) before ``mapInPandas`` if the source files
  skew.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("data", T.BinaryType(), True),
    ]
)

N_FEATURES = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)


def synthesize_media(df: DataFrame, id_col: str, payload_col: str) -> DataFrame:
    """Build a deterministic media table from any string column —
    stands in for real image bytes so the plumbing is testable."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.when(F.col(id_col) % 3 == 0, "image")
        .when(F.col(id_col) % 3 == 1, "audio")
        .otherwise("video")
        .alias("kind"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4")
        .alias("mime"),
        ((F.col(id_col) % 8 + 1) * 64).cast("int").alias("width"),
        ((F.col(id_col) % 4 + 1) * 64).cast("int").alias("height"),
        ((F.col(id_col) % 10 + 1) * 1000).cast("long").alias("duration_ms"),
        F.encode(F.col(payload_col), "UTF-8").alias("data"),
    )


def _fake_features(data: bytes, n: int = N_FEATURES) -> list[float]:
    """Deterministic bytes → fixed-size float vector (sha256-seeded).
    Placeholder for a real encoder (CLIP/wav2vec/...) — swap the body,
    keep the signature."""
    h = hashlib.sha256(data or b"").digest()
    return [int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32 for i in range(n)]


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column.

    ``mapInPandas`` so one Python worker handles a whole Arrow batch
    (not a row) — the only viable shape for 100 TB of blobs.

    The closure is self-contained (no module-level references): Python
    workers must not need this package importable on their own path —
    the driver may run from any directory.
    """
    n_features = N_FEATURES

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hashlib

        def fake(data):
            h = _hashlib.sha256(data or b"").digest()
            return [
                int.from_bytes(h[4 * i : 4 * i + 4], "big") / 2**32
                for i in range(n_features)
            ]

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["data"].map(lambda b: len(b) if b is not None else 0),
                    "features": pdf["data"].map(fake),
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image bytes to (width, height, mode).

    STUB: real decoding needs PIL/libvips, absent from this
    container. ``fake=True`` returns the metadata columns as the
    "decoded" dims (deterministic); ``fake=False`` raises."""
    if not fake:
        raise NotImplementedError(
            "image decode requires PIL/libvips (not installed); "
            "call with fake=True for the deterministic stub"
        )
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        F.col("width").alias("decoded_width"),
        F.col("height").alias("decoded_height"),
        F.lit("RGB").alias("mode"),
    )


def resize_plan(media: DataFrame, max_side: int) -> DataFrame:
    """Resize geometry (pure arithmetic — real). The pixel resample
    itself would live in the same mapInPandas as decode_image."""
    scale = F.least(
        F.lit(1.0),
        max_side / F.greatest(F.col("width"), F.col("height")).cast("double"),
    )
    return media.filter(F.col("kind") == "image").select(
        "media_id",
        "width",
        "height",
        F.round(scale, 4).alias("scale"),
        F.ceil(F.col("width") * scale).cast("int").alias("out_width"),
        F.ceil(F.col("height") * scale).cast("int").alias("out_height"),
    )


def frame_sample_plan(media: DataFrame, n_frames: int) -> DataFrame:
    """Evenly-spaced frame-sample timestamps from video duration
    metadata (one row per frame; the actual frame grab is the stubbed
    decode step)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            "duration_ms",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {n_frames - 1}), "
                    f"i -> CAST(i * duration_ms / {n_frames} AS BIGINT))"
                )
            ).alias("frame_ts_ms"),
        )
    )
