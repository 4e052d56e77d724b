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


def test_dhash_matches_numpy_and_perturbation_is_local(spark):
    """dHash bands recomputed in numpy from the same pixel grid;
    a single-pixel R perturbation flips ≤2 bits (the locality that
    makes dHash a NEAR-dup hash, unlike cryptographic avalanche)."""
    import numpy as np

    from omfietser_etl_spark.multimodal.codecs import make_image_tools
    from omfietser_etl_spark.multimodal.phash import dhash_images

    _, _, _, encode_ppm = make_image_tools()
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, size=(8, 9, 3), dtype=np.uint8)
    arr2 = arr.copy()
    arr2[4, 5, 0] = 255 - int(arr2[4, 5, 0])  # one R byte

    media = spark.createDataFrame(
        [(1, "image", bytearray(encode_ppm(arr))),
         (2, "image", bytearray(encode_ppm(arr2))),
         (3, "image", bytearray(b"not an image"))],
        "media_id long, kind string, data binary",
    )
    got = {r.media_id: (r.b0, r.b1, r.b2, r.b3)
           for r in dhash_images(media).collect()}

    def np_bands(a):
        g = a[:, :, 0].astype(np.int64)
        bits = (g[:, :-1] > g[:, 1:]).astype(int).ravel()
        return tuple(sum(int(bits[16 * k + j]) << j for j in range(16))
                     for k in range(4))

    assert got[1] == np_bands(arr)
    assert got[2] == np_bands(arr2)
    assert got[3] == (None, None, None, None)  # undecodable kept as NULLs
    ham = sum(bin(a ^ b).count("1") for a, b in zip(got[1], got[2]))
    assert ham <= 2


def test_phash_banded_pairs_equal_brute_force(spark):
    """At max_hamming ≤ bands−1 the banded join must equal literal
    all-pairs hamming filtering (pigeonhole recall) — verified against
    a brute-force recomputation over the collected hashes."""
    import numpy as np

    from omfietser_etl_spark.multimodal.codecs import make_image_tools
    from omfietser_etl_spark.multimodal.phash import (
        dhash_images,
        phash_neardup_pairs,
    )

    _, _, _, encode_ppm = make_image_tools()
    rng = np.random.default_rng(11)
    rows = []
    base = rng.integers(0, 256, size=(10, 8, 9, 3), dtype=np.uint8)
    for i in range(10):
        rows.append((i, "image", bytearray(encode_ppm(base[i]))))
        tw = base[i].copy()
        tw[0, 0, 0] ^= 0xFF
        rows.append((100 + i, "image", bytearray(encode_ppm(tw))))
    media = spark.createDataFrame(
        rows, "media_id long, kind string, data binary")
    hashes = dhash_images(media)
    hs = {r.media_id: (r.b0, r.b1, r.b2, r.b3) for r in hashes.collect()}
    brute = set()
    ids = sorted(hs)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            h = sum(bin(x ^ y).count("1") for x, y in zip(hs[a], hs[b]))
            if h <= 3:
                brute.add((a, b, h))
    got = {(r.id_lo, r.id_hi, r.hamming)
           for r in phash_neardup_pairs(hashes, 3).collect()}
    assert got == brute
    # every planted twin pair is present
    assert all(any(p[:2] == (i, 100 + i) for p in got) for i in range(10))


def test_audio_fingerprint_matches_numpy_and_is_local(spark):
    """Energy-delta fingerprint recomputed in numpy from the same
    PCM; a single corrupted sample flips ≤2 bits; undecodable and
    too-short streams yield NULL bands."""
    import numpy as np

    from omfietser_etl_spark.multimodal.audiofp import audio_fingerprint
    from omfietser_etl_spark.multimodal.codecs import make_audio_tools

    _, encode_wav = make_audio_tools()
    rng = np.random.default_rng(3)
    s = rng.integers(-32768, 32768, size=130, dtype=np.int64)
    s2 = s.copy()
    s2[60] = 32767  # one sample → one frame energy → ≤2 bits

    media = spark.createDataFrame(
        [(1, "audio", bytearray(encode_wav(s.tolist(), 8000))),
         (2, "audio", bytearray(encode_wav(s2.tolist(), 8000))),
         (3, "audio", bytearray(b"RIFFgarbage")),
         (4, "audio", bytearray(encode_wav([5] * 10, 8000)))],
        "media_id long, kind string, data binary",
    )
    got = {r.media_id: (r.b0, r.b1, r.b2, r.b3)
           for r in audio_fingerprint(media).collect()}

    def np_bands(x):
        e = (x.reshape(65, 2) ** 2).sum(axis=1)
        flags = (e[:-1] > e[1:]).astype(int)
        return tuple(sum(int(flags[16 * k + j]) << j for j in range(16))
                     for k in range(4))

    assert got[1] == np_bands(s)
    assert got[2] == np_bands(s2)
    assert got[3] == (None, None, None, None)
    assert got[4] == (None, None, None, None)  # shorter than 130 samples
    ham = sum(bin(a ^ b).count("1") for a, b in zip(got[1], got[2]))
    assert ham <= 2


def test_avi_frame_decode_roundtrip_and_scene_cuts(spark):
    """The frame-carrying AVI tools really round-trip: encoded
    constant-luma frames come back exactly; probe_avi reads the same
    header; scene_cuts flags exactly the planted jumps."""
    from omfietser_etl_spark.multimodal.codecs import (
        make_video_frame_tools,
        make_video_tools,
    )
    from omfietser_etl_spark.multimodal.media import scene_cuts

    decode_frames, prefix = make_video_frame_tools()
    probe, _enc = make_video_tools()
    lumas = [10, 12, 200, 199, 40]
    fb = 4 * 3 * 3
    data = prefix(4, 3, len(lumas), fb) + b"".join(
        b"00db" + fb.to_bytes(4, "little") + bytes([v]) * fb for v in lumas
    )
    assert decode_frames(data) == lumas
    hdr = probe(data)
    assert (hdr["width"], hdr["height"], hdr["n_frames"]) == (4, 3, 5)

    media = spark.createDataFrame(
        [(1, "video", bytearray(data)), (2, "video", bytearray(b"junk"))],
        "media_id long, kind string, data binary",
    )
    out = {r.media_id: r for r in scene_cuts(media, 48).collect()}
    assert out[1].n_frames == 5
    assert out[1].cuts_csv == "2,4"  # 12->200 and 199->40
    assert out[2].n_frames == 0 and out[2].cuts_csv == ""


def test_scene_cuts_zero_cut_video_empty_csv(spark, tmp_path):
    """A decodable video whose luma never jumps must report
    n_cuts=0 / cuts_csv='' on BOTH sides of the mm9 contract. The
    engine has always emitted '' — but DuckDB's array_to_string of an
    EMPTY list is NULL (not ''), and the first zero-cut document only
    EXISTS at the 10x corpus (2 of 600k; none at sf<=0.1) — the
    round-10 sf1-equivalent sweep caught the oracle divergence. The
    oracle now coalesces; this pins both sides on an engineered
    zero-cut input."""
    import duckdb

    from omfietser_etl_spark.multimodal.codecs import make_video_frame_tools
    from omfietser_etl_spark.multimodal.media import scene_cuts

    _decode, prefix = make_video_frame_tools()
    lumas = [100, 120, 140, 120, 100]  # every |delta| = 20 <= 48
    fb = 4 * 3 * 3
    data = prefix(4, 3, len(lumas), fb) + b"".join(
        b"00db" + fb.to_bytes(4, "little") + bytes([v]) * fb for v in lumas
    )
    media = spark.createDataFrame(
        [(7, "video", bytearray(data))], "media_id long, kind string, data binary"
    )
    row = scene_cuts(media, 48).collect()[0]
    assert (row.n_cuts, row.cuts_csv) == (0, "")
    # the oracle-side idiom, exactly as _mm9_oracle emits it
    got = duckdb.sql(
        "SELECT coalesce(array_to_string(list_filter([1,2], x -> x > 9), ',')"
        ", '') AS csv"
    ).fetchone()[0]
    assert got == ""
