"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed with Arrow-batched ``mapInPandas``.

The image decode path is REAL for the library-free formats — binary
PPM (P6) and uncompressed 24-bit BMP — via the pure-numpy codecs in
``multimodal/codecs.py`` (header parse, pixel reshape, per-channel
stats, nearest-neighbor resample, PPM re-encode). Compressed formats
(PNG/JPEG) and audio/video codecs need PIL/libvips/ffmpeg, absent
from this container: those payloads come back mode='unsupported';
swapping in PIL later only changes the decoder closure body.
Everything Spark-side — schemas, batch iteration, UDF signatures,
partition behavior, output shapes — is real and tested either way.

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


DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("decoded_width", T.IntegerType(), True),
        T.StructField("decoded_height", T.IntegerType(), True),
        T.StructField("mode", T.StringType(), False),
        T.StructField("mean_r", T.DoubleType(), True),
        T.StructField("mean_g", T.DoubleType(), True),
        T.StructField("mean_b", T.DoubleType(), True),
    ]
)


def decode_image(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image bytes to (dims, mode, per-channel means).

    REAL for the library-free formats — binary PPM (P6) and
    uncompressed 24-bit BMP — via the pure-numpy codecs
    (multimodal/codecs.py); anything else (PNG/JPEG need PIL/libvips,
    absent from this container) comes back mode='unsupported' with
    null dims. ``fake=True`` keeps the old metadata-echo stub.

    Arrow-batched mapInPandas; the decoder closures come from a
    runtime factory so they pickle by value (workers never import
    this package).
    """
    if fake:
        return media.filter(F.col("kind") == "image").select(
            "media_id",
            F.col("width").alias("decoded_width"),
            F.col("height").alias("decoded_height"),
            F.lit("RGB").alias("mode"),
        )
    from .codecs import make_image_tools

    decode, _to_array, _resize, _enc = make_image_tools()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": [], "decoded_width": [], "decoded_height": [],
                "mode": [], "mean_r": [], "mean_g": [], "mean_b": [],
            }
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                d = decode(data)
                out["media_id"].append(mid)
                if d is None:
                    out["decoded_width"].append(None)
                    out["decoded_height"].append(None)
                    out["mode"].append("unsupported")
                    out["mean_r"].append(None)
                    out["mean_g"].append(None)
                    out["mean_b"].append(None)
                else:
                    out["decoded_width"].append(d["width"])
                    out["decoded_height"].append(d["height"])
                    out["mode"].append(d["mode"])
                    out["mean_r"].append(d["mean_r"])
                    out["mean_g"].append(d["mean_g"])
                    out["mean_b"].append(d["mean_b"])
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").select(
        "media_id", "data"
    ).mapInPandas(run, DECODED_SCHEMA)


AUDIO_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("codec", T.StringType(), False),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sum_sq", T.LongType(), True),
        T.StructField("peak", T.LongType(), True),
    ]
)


def decode_audio(media: DataFrame) -> DataFrame:
    """REAL audio decode for RIFF/WAVE PCM-16 (pure numpy, chunk walk
    + int16 reinterpret): channels, rate, sample count, duration, and
    exact integer energy/peak stats. Compressed audio (MP3/AAC/FLAC)
    needs codec libs → codec='unsupported' with null stats. Same
    by-value-closure mapInPandas discipline as decode_image."""
    from .codecs import make_audio_tools

    decode_wav, _enc = make_audio_tools()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in AUDIO_SCHEMA.fields]
        for pdf in batches:
            rows = {c: [] for c in cols}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                d = decode_wav(data)
                rows["media_id"].append(mid)
                rows["codec"].append("pcm16" if d else "unsupported")
                for k in ("n_channels", "sample_rate", "n_samples",
                          "duration_ms", "sum_sq", "peak"):
                    rows[k].append(d[k] if d else None)
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "data"
    ).mapInPandas(run, AUDIO_SCHEMA)


VIDEO_PROBE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("container", T.StringType(), False),
        T.StructField("n_streams", T.IntegerType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("us_per_frame", T.LongType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


def probe_video(media: DataFrame) -> DataFrame:
    """REAL video container probe for RIFF/AVI (nested LIST walk to
    the avih main header): stream count, dims, frame count, frame
    interval, duration. Frame pixel decode needs real codecs →
    non-AVI payloads report container='unsupported'."""
    from .codecs import make_video_tools

    probe_avi, _enc = make_video_tools()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in VIDEO_PROBE_SCHEMA.fields]
        for pdf in batches:
            rows = {c: [] for c in cols}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                d = probe_avi(data)
                rows["media_id"].append(mid)
                rows["container"].append("avi" if d else "unsupported")
                for k in ("n_streams", "width", "height", "n_frames",
                          "us_per_frame", "duration_ms"):
                    rows[k].append(d[k] if d else None)
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").select(
        "media_id", "data"
    ).mapInPandas(run, VIDEO_PROBE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("out_width", T.IntegerType(), True),
        T.StructField("out_height", T.IntegerType(), True),
        T.StructField("out_bytes", T.LongType(), True),
        T.StructField("data", T.BinaryType(), True),
    ]
)


def decode_and_resize(media: DataFrame, max_side: int) -> DataFrame:
    """Real decode → nearest-neighbor downscale → re-encode (PPM):
    the full pixel path, not just geometry. Images that exceed
    ``max_side`` on either dimension are scaled to fit (aspect
    preserved, floor, min 1); smaller images pass through untouched.
    Unsupported payloads yield null output columns."""
    from .codecs import make_image_tools

    _decode, to_array, resize, encode_ppm = make_image_tools()
    cap = max_side

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "out_width": [], "out_height": [],
                "out_bytes": [], "data": [],
            }
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                rows["media_id"].append(mid)
                arr = to_array(data)
                if arr is None:
                    rows["out_width"].append(None)
                    rows["out_height"].append(None)
                    rows["out_bytes"].append(None)
                    rows["data"].append(None)
                    continue
                h, w = arr.shape[:2]
                scale = min(1.0, cap / max(w, h))
                ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
                out = resize(arr, ow, oh)
                enc = encode_ppm(out)
                rows["out_width"].append(ow)
                rows["out_height"].append(oh)
                rows["out_bytes"].append(len(enc))
                rows["data"].append(enc)
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "image").select(
        "media_id", "data"
    ).mapInPandas(run, RESIZED_SCHEMA)


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


SCENE_CUT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_frames", T.LongType(), True),
        T.StructField("n_cuts", T.LongType(), True),
        T.StructField("cuts_csv", T.StringType(), True),
    ]
)


def scene_cuts(media: DataFrame, luma_threshold: int) -> DataFrame:
    """Scene-cut detection over AVIs carrying uncompressed frames:
    REAL container walk + frame parse (codecs.make_video_frame_tools)
    computes each frame's exact integer mean luma; a cut is any
    frame-to-frame jump with |Δluma| > luma_threshold — the shot-
    boundary primitive a video pipeline runs before keyframe sampling
    (pick one frame per scene, not per fixed stride). Non-AVI /
    frameless payloads report n_frames = 0.

    Arrow-batched mapInPandas, closures pickled by value; one
    map-side pass, no shuffle.
    """
    from .codecs import make_video_frame_tools

    decode_avi_frames, _pref = make_video_frame_tools()
    thr = int(luma_threshold)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_id": [], "n_frames": [], "n_cuts": [], "cuts_csv": []}
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                lum = decode_avi_frames(data)
                cuts = (
                    [k for k in range(1, len(lum)) if abs(lum[k] - lum[k - 1]) > thr]
                    if lum
                    else []
                )
                rows["media_id"].append(mid)
                rows["n_frames"].append(len(lum) if lum else 0)
                rows["n_cuts"].append(len(cuts))
                rows["cuts_csv"].append(",".join(str(k) for k in cuts))
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").select(
        "media_id", "data"
    ).mapInPandas(run, SCENE_CUT_SCHEMA)
