"""Multimodal plumbing: binary media table, Arrow-batched feature
extraction, stubbed decode, resize/frame-sample plans."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from omfietser_etl_spark.multimodal.media import (
    MEDIA_SCHEMA,
    N_FEATURES,
    decode_image,
    extract_features,
    frame_sample_plan,
    resize_plan,
    synthesize_media,
)
from omfietser_etl_spark.session import load


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    m = synthesize_media(docs, "doc_id", "text")
    assert [(f.name, f.dataType) for f in m.schema.fields] == [
        (f.name, f.dataType) for f in MEDIA_SCHEMA.fields
    ]
    return m.cache()


def test_media_schema_and_kinds(media):
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}
    row = media.filter(F.col("kind") == "image").first()
    assert isinstance(row.data, (bytes, bytearray))
    assert row.mime == "image/png"


def test_extract_features_deterministic_and_batched(media):
    out = extract_features(media)
    rows = {r.media_id: r for r in out.collect()}
    again = {r.media_id: r for r in extract_features(media).collect()}
    assert len(rows) == media.count()
    some = next(iter(rows.values()))
    assert len(some.features) == N_FEATURES
    assert all(0.0 <= f <= 1.0 for f in some.features)
    # deterministic across runs and partitionings
    assert rows[some.media_id].features == again[some.media_id].features
    repart = {
        r.media_id: r.features
        for r in extract_features(media.repartition(7)).collect()
    }
    assert repart[some.media_id] == list(some.features)
    # n_bytes reflects payload length
    assert some.n_bytes > 0


def test_decode_flags_unsupported_payloads(media):
    # synthesized media carries UTF-8 text, not image bytes: the real
    # decoder must classify it unsupported, never crash or echo
    out = decode_image(media).collect()
    assert len(out) > 0
    assert all(r.mode == "unsupported" and r.decoded_width is None for r in out)
    fake = decode_image(media, fake=True)
    r = fake.first()
    assert r.mode == "RGB" and r.decoded_width % 64 == 0


def test_resize_plan_geometry(media):
    out = {r.media_id: r for r in resize_plan(media, 128).collect()}
    for r in out.values():
        assert max(r.out_width, r.out_height) <= 128 or r.scale == 1.0
        if r.scale < 1.0:
            assert max(r.out_width, r.out_height) == 128


def test_frame_sample_plan(media):
    n_videos = media.filter(F.col("kind") == "video").count()
    out = frame_sample_plan(media, 4)
    assert out.count() == 4 * n_videos
    one = out.groupBy("media_id").agg(
        F.collect_list("frame_ts_ms").alias("ts"), F.first("duration_ms").alias("d")
    ).first()
    assert sorted(one.ts)[0] == 0
    assert max(one.ts) < one.d
