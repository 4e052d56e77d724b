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


def mm4_decode_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """REAL image decode under the gate: valid binary-PPM payloads are
    synthesized in pure SQL (dims from doc_id, pixel bytes from sha256
    hex), decoded by the numpy codec inside mapInPandas, and the
    DuckDB oracle recomputes dims AND per-channel byte sums from the
    same hex string with independent arithmetic — so a decoder that
    misparses the header, misorders channels, or drops pixels fails
    the hash."""
    from omfietser_etl_spark.multimodal.media import decode_image

    docs = load(spark, sf, "documents").select("doc_id", "text")
    w = (F.col("doc_id") % 4 + 2).cast("int")
    h = (F.col("doc_id") % 3 + 2).cast("int")
    hdr = F.encode(
        F.concat(
            F.lit("P6\n"), w.cast("string"), F.lit(" "),
            h.cast("string"), F.lit("\n255\n"),
        ),
        "UTF-8",
    )
    pix = F.unhex(F.expr(
        "substring(concat(sha2(text, 256), sha2(concat(text, 'x'), 256)), "
        "1, CAST((doc_id % 4 + 2) * (doc_id % 3 + 2) * 6 AS INT))"
    ))
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(hdr, pix).alias("data"),
    )
    out = decode_image(media)
    n = (F.col("decoded_width") * F.col("decoded_height")).cast("double")
    return out.select(
        "media_id",
        "decoded_width",
        "decoded_height",
        "mode",
        F.round(F.col("mean_r") * n, 0).cast("long").alias("sum_r"),
        F.round(F.col("mean_g") * n, 0).cast("long").alias("sum_g"),
        F.round(F.col("mean_b") * n, 0).cast("long").alias("sum_b"),
    )


_HEXVAL = "(strpos('0123456789abcdef', substr(hx, {i}, 1)) - 1)"

MM4_ORACLE = f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CAST(doc_id % 4 + 2 AS INT) AS w,
         CAST(doc_id % 3 + 2 AS INT) AS h,
         sha256(text) || sha256(text || 'x') AS hx
  FROM documents),
v AS (
  SELECT media_id, w, h,
         list_transform(range(0, w * h * 3),
             k -> 16 * {_HEXVAL.format(i='2*k + 1')} + {_HEXVAL.format(i='2*k + 2')}
         ) AS b
  FROM m)
SELECT media_id, w AS decoded_width, h AS decoded_height, 'RGB' AS mode,
  CAST(list_sum(list_transform(range(0, w * h), p -> b[3*p + 1])) AS BIGINT) AS sum_r,
  CAST(list_sum(list_transform(range(0, w * h), p -> b[3*p + 2])) AS BIGINT) AS sum_g,
  CAST(list_sum(list_transform(range(0, w * h), p -> b[3*p + 3])) AS BIGINT) AS sum_b
FROM v
"""


#: constant header of a mono/8 kHz/16-bit WAV with exactly 16 samples
#: (32 PCM bytes) — everything variable lives in the sha256-derived
#: PCM payload, so the header is one literal. Built from the same
#: encoder the tests round-trip (multimodal/codecs.py::encode_wav).
MM5_RATE = 8000
MM5_N_SAMPLES = 16


def _mm5_header_hex() -> str:
    from omfietser_etl_spark.multimodal.codecs import make_audio_tools

    _, encode_wav = make_audio_tools()
    return encode_wav([0] * MM5_N_SAMPLES, MM5_RATE)[:44].hex()


def mm5_audio_roundtrip(spark: SparkSession, sf: str) -> DataFrame:
    """REAL WAV decode under the gate: PCM-16 payloads synthesized in
    SQL (constant header + sha256-hex samples), decoded by the numpy
    RIFF walker in mapInPandas; the oracle recomputes the signed-int16
    energy/peak stats from the same hex with independent arithmetic."""
    from omfietser_etl_spark.multimodal.media import decode_audio

    docs = load(spark, sf, "documents").select("doc_id", "text")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.concat(
            F.unhex(F.lit(_mm5_header_hex())),
            F.unhex(F.sha2(F.col("text"), 256)),
        ).alias("data"),
    )
    return decode_audio(media)


_B = "(strpos('0123456789abcdef', substr(hx, {i}, 1)) - 1)"

MM5_ORACLE = f"""
WITH m AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents),
s AS (
  SELECT media_id,
         list_transform(range(0, {MM5_N_SAMPLES}), k ->
           CASE WHEN (16 * {_B.format(i='4*k + 3')} + {_B.format(i='4*k + 4')}) >= 128
                THEN (16 * {_B.format(i='4*k + 1')} + {_B.format(i='4*k + 2')})
                     + 256 * (16 * {_B.format(i='4*k + 3')} + {_B.format(i='4*k + 4')})
                     - 65536
                ELSE (16 * {_B.format(i='4*k + 1')} + {_B.format(i='4*k + 2')})
                     + 256 * (16 * {_B.format(i='4*k + 3')} + {_B.format(i='4*k + 4')})
           END) AS v
  FROM m)
SELECT media_id, 'pcm16' AS codec,
       CAST(1 AS INT) AS n_channels,
       CAST({MM5_RATE} AS INT) AS sample_rate,
       CAST({MM5_N_SAMPLES} AS BIGINT) AS n_samples,
       CAST({MM5_N_SAMPLES * 1000 // MM5_RATE} AS BIGINT) AS duration_ms,
       CAST(list_sum(list_transform(v, x -> x * x)) AS BIGINT) AS sum_sq,
       CAST(list_max(list_transform(v, x -> abs(x))) AS BIGINT) AS peak
FROM s
"""


MM6_USPF = 40_000  # 25 fps


def _mm6_template() -> tuple[str, str, str, str]:
    """Hex template of the header-only AVI with zeroed w/h/frames and
    the hex split points around those fields' LOW bytes (values stay
    < 256 so the other three little-endian bytes are the template's
    zeros). Layout fixed by codecs.encode_avi: avih body at byte 32 →
    frames@48, width@64, height@68."""
    from omfietser_etl_spark.multimodal.codecs import make_video_tools

    _, encode_avi = make_video_tools()
    tpl = encode_avi(0, 0, 0, MM6_USPF).hex()
    return tpl[: 2 * 48], tpl[2 * 49 : 2 * 64], tpl[2 * 65 : 2 * 68], tpl[2 * 69 :]


def mm6_video_probe(spark: SparkSession, sf: str) -> DataFrame:
    """REAL AVI container probe under the gate: header-only AVI bytes
    are assembled in SQL (constant hex template + per-doc dims/frames
    patched in), the RIFF walker probes them in mapInPandas, and the
    oracle predicts every field with independent arithmetic."""
    from omfietser_etl_spark.multimodal.media import probe_video

    seg0, seg1, seg2, seg3 = _mm6_template()
    docs = load(spark, sf, "documents").select("doc_id")

    def b(expr: str):  # low-byte hex of a value < 256
        return F.lpad(F.lower(F.hex(F.expr(expr))), 2, "0")

    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("video").alias("kind"),
        F.unhex(
            F.concat(
                F.lit(seg0), b("CAST(doc_id % 30 + 1 AS INT)"),
                F.lit(seg1), b("CAST(16 * (doc_id % 8 + 1) AS INT)"),
                F.lit(seg2), b("CAST(16 * (doc_id % 6 + 1) AS INT)"),
                F.lit(seg3),
            )
        ).alias("data"),
    )
    return probe_video(media)


MM6_ORACLE = f"""
SELECT doc_id AS media_id, 'avi' AS container,
       CAST(1 AS INT) AS n_streams,
       CAST(16 * (doc_id % 8 + 1) AS INT) AS width,
       CAST(16 * (doc_id % 6 + 1) AS INT) AS height,
       CAST(doc_id % 30 + 1 AS BIGINT) AS n_frames,
       CAST({MM6_USPF} AS BIGINT) AS us_per_frame,
       CAST((doc_id % 30 + 1) * {MM6_USPF} // 1000 AS BIGINT) AS duration_ms
FROM documents
"""


#: Twin media ids are -(doc_id) - 1: negative, so they can never
#: alias a real doc_id on ANY corpus (an additive offset collides the
#: moment doc_id reaches it — e.g. the 10x stress corpus reuses
#: id + k*10_000_000).
MM7_MAX_HAMMING = 3  # ≤ bands−1 → banded recall is EXACT (pigeonhole)


def mm7_phash_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Perceptual-hash image near-dup (multimodal/phash.py): valid
    9×8 binary-PPM payloads synthesized in SQL (pixels from sha256
    hex — the mm4 convention) plus a PERTURBED twin per image (two
    pixel R-bytes overwritten → ≤3 dHash bits flip), REAL-decoded
    and dHashed in mapInPandas, paired by the banded hamming join.
    The oracle recomputes every dHash band from the same hex with
    independent arithmetic and takes literal all-pairs hamming ≤ 3 —
    equivalent to the banded join exactly because max_hamming <
    bands (pigeonhole), so the blocking plan itself is under test."""
    from omfietser_etl_spark.multimodal.phash import (
        dhash_images,
        phash_neardup_pairs,
    )

    docs = load(spark, sf, "documents").select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )
    shas = ", ".join(
        "sha2(text, 256)" if i == 0 else f"sha2(concat(text, '{i}'), 256)"
        for i in range(7)
    )
    hx = F.expr(f"substring(concat({shas}), 1, 432)")
    docs = docs.withColumn("hx", hx).withColumn(
        "hxp",
        F.concat(
            F.lit("00"), F.expr("substring(hx, 3, 244)"),
            F.lit("ff"), F.expr("substring(hx, 249, 184)"),
        ),
    )
    hdr = F.unhex(F.lit(b"P6\n9 8\n255\n".hex()))
    orig = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(hdr, F.unhex("hx")).alias("data"),
    )
    twin = docs.select(
        (-F.col("doc_id") - 1).alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(hdr, F.unhex("hxp")).alias("data"),
    )
    return phash_neardup_pairs(
        dhash_images(orig.unionByName(twin)), MM7_MAX_HAMMING
    )


def _mm7_oracle() -> str:
    hv = "(strpos('0123456789abcdef', substr(hx, {i}, 1)) - 1)"
    shas = " || ".join(
        "sha256(text)" if i == 0 else f"sha256(text || '{i}')"
        for i in range(7)
    )
    bands = ",\n      ".join(
        f"CAST(list_sum(list_transform(range(0, 16), j -> CASE WHEN "
        f"gray[((16*{k}+j)//8)*9 + ((16*{k}+j)%8) + 1] > "
        f"gray[((16*{k}+j)//8)*9 + ((16*{k}+j)%8) + 2] "
        f"THEN (1::BIGINT << j) ELSE 0 END)) AS INT) AS b{k}"
        for k in range(4)
    )
    ham = " + ".join(
        f"bit_count(xor(a.b{k}::BIGINT, b.b{k}::BIGINT))" for k in range(4)
    )
    return f"""
WITH d0 AS (SELECT doc_id, substr({shas}, 1, 432) AS hx
            FROM documents WHERE text IS NOT NULL),
base AS (
  SELECT doc_id AS media_id, hx FROM d0
  UNION ALL
  SELECT -doc_id - 1,
         '00' || substr(hx, 3, 244) || 'ff' || substr(hx, 249, 184)
  FROM d0),
g AS (SELECT media_id,
        list_transform(range(0, 72),
            p -> 16 * {hv.format(i="6*p + 1")} + {hv.format(i="6*p + 2")})
          AS gray
      FROM base),
bb AS (SELECT media_id,
      {bands}
       FROM g),
pr AS (SELECT a.media_id AS id_lo, b.media_id AS id_hi,
              CAST({ham} AS INT) AS hamming
       FROM bb a JOIN bb b ON a.media_id < b.media_id)
SELECT id_lo, id_hi, hamming FROM pr WHERE hamming <= {MM7_MAX_HAMMING}
"""


MM8_N_SAMPLES = 130  # (64 bits + 1) frames × 2 samples
MM8_HEX = 4 * MM8_N_SAMPLES  # 520 hex chars of PCM payload


def _mm8_header_hex() -> str:
    from omfietser_etl_spark.multimodal.codecs import make_audio_tools

    _, encode_wav = make_audio_tools()
    return encode_wav([0] * MM8_N_SAMPLES, MM5_RATE)[:44].hex()


def mm8_audio_fp_neardup(spark: SparkSession, sf: str) -> DataFrame:
    """Audio fingerprint near-dup (multimodal/audiofp.py): PCM-16
    payloads synthesized in SQL (mm5's convention, 130 samples from
    sha256 hex) plus a perturbed twin per stream (ONE sample forced
    to 0x7fff → one frame energy moves → ≤2 fingerprint bits flip),
    REAL-decoded and fingerprinted in mapInPandas, then paired by the
    SAME banded hamming join mm7 uses. The oracle replays the signed
    int16 samples, the exact frame energies, and every band from the
    same hex — literal all-pairs hamming ≤ 3 ≡ the banded join
    (pigeonhole)."""
    from omfietser_etl_spark.multimodal.audiofp import audio_fingerprint
    from omfietser_etl_spark.multimodal.phash import phash_neardup_pairs

    docs = load(spark, sf, "documents").select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )
    shas = ", ".join(
        "sha2(text, 256)" if i == 0 else f"sha2(concat(text, '{i}'), 256)"
        for i in range(9)
    )
    docs = docs.withColumn(
        "hx", F.expr(f"substring(concat({shas}), 1, {MM8_HEX})")
    ).withColumn(
        "hxp",
        F.concat(
            F.expr("substring(hx, 1, 240)"), F.lit("ff7f"),
            F.expr(f"substring(hx, 245, {MM8_HEX - 244})"),
        ),
    )
    hdr = F.unhex(F.lit(_mm8_header_hex()))
    orig = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.concat(hdr, F.unhex("hx")).alias("data"),
    )
    twin = docs.select(
        (-F.col("doc_id") - 1).alias("media_id"),
        F.lit("audio").alias("kind"),
        F.concat(hdr, F.unhex("hxp")).alias("data"),
    )
    return phash_neardup_pairs(
        audio_fingerprint(orig.unionByName(twin)), MM7_MAX_HAMMING
    )


def _mm8_oracle() -> str:
    shas = " || ".join(
        "sha256(text)" if i == 0 else f"sha256(text || '{i}')"
        for i in range(9)
    )
    s16 = (
        "CASE WHEN (16 * {h3} + {h4}) >= 128 "
        "THEN (16 * {h1} + {h2}) + 256 * (16 * {h3} + {h4}) - 65536 "
        "ELSE (16 * {h1} + {h2}) + 256 * (16 * {h3} + {h4}) END"
    ).format(
        h1=_B.format(i="4*k + 1"), h2=_B.format(i="4*k + 2"),
        h3=_B.format(i="4*k + 3"), h4=_B.format(i="4*k + 4"),
    )
    bands = ",\n      ".join(
        f"CAST(list_sum(list_transform(range(0, 16), j -> CASE WHEN "
        f"e[16*{k}+j + 1] > e[16*{k}+j + 2] "
        f"THEN (1::BIGINT << j) ELSE 0 END)) AS INT) AS b{k}"
        for k in range(4)
    )
    ham = " + ".join(
        f"bit_count(xor(a.b{k}::BIGINT, b.b{k}::BIGINT))" for k in range(4)
    )
    return f"""
WITH d0 AS (SELECT doc_id, substr({shas}, 1, {MM8_HEX}) AS hx
            FROM documents WHERE text IS NOT NULL),
base AS (
  SELECT doc_id AS media_id, hx FROM d0
  UNION ALL
  SELECT -doc_id - 1,
         substr(hx, 1, 240) || 'ff7f' || substr(hx, 245, {MM8_HEX - 244})
  FROM d0),
v AS (SELECT media_id,
        list_transform(range(0, {MM8_N_SAMPLES}), k -> {s16}) AS s
      FROM base),
en AS (SELECT media_id,
        list_transform(range(0, 65),
            i -> s[2*i + 1] * s[2*i + 1] + s[2*i + 2] * s[2*i + 2]) AS e
       FROM v),
bb AS (SELECT media_id,
      {bands}
       FROM en),
pr AS (SELECT a.media_id AS id_lo, b.media_id AS id_hi,
              CAST({ham} AS INT) AS hamming
       FROM bb a JOIN bb b ON a.media_id < b.media_id)
SELECT id_lo, id_hi, hamming FROM pr WHERE hamming <= {MM7_MAX_HAMMING}
"""


# ---------------------------------------------------------------- #
# mm9 — scene-cut detection over AVIs with REAL uncompressed frame
# chunks: 12 constant-luma 4×3 DIB frames per doc, luma bytes from
# sha256 hex (both engines derive them), container assembled Spark-
# side, frames REALLY walked+parsed in mapInPandas; the oracle
# computes the same lumas arithmetically from the hex.
# ---------------------------------------------------------------- #

MM9_W, MM9_H = 4, 3
MM9_N_FRAMES = 12
MM9_FRAME_BYTES = MM9_W * MM9_H * 3
MM9_LUMA_THR = 48


def _mm9_prefix_hex() -> str:
    from omfietser_etl_spark.multimodal.codecs import make_video_frame_tools

    _dec, prefix = make_video_frame_tools()
    return prefix(MM9_W, MM9_H, MM9_N_FRAMES, MM9_FRAME_BYTES).hex()


def mm9_scene_cuts(spark: SparkSession, sf: str) -> DataFrame:
    """Shot-boundary detection (multimodal/media.py::scene_cuts):
    every document gets a 12-frame uncompressed AVI whose frame k is
    a constant-luma 4×3 DIB with luma = sha256 byte k — the decoder
    REALLY walks RIFF→movi→'00db' and averages the 36 frame bytes
    exactly; a cut is |Δluma| > 48. The oracle never parses a byte:
    it recomputes each luma from the same hex arithmetic and replays
    the cut positions."""
    from omfietser_etl_spark.multimodal.media import scene_cuts

    docs = load(spark, sf, "documents").select("doc_id", "text").filter(
        F.col("text").isNotNull()
    )
    chunk_hdr = b"00db".hex() + int(MM9_FRAME_BYTES).to_bytes(4, "little").hex()
    chunks = [
        f"concat('{chunk_hdr}', repeat(substring(hx, {2 * k + 1}, 2), "
        f"{MM9_FRAME_BYTES}))"
        for k in range(MM9_N_FRAMES)
    ]
    media = (
        docs.withColumn("hx", F.expr("sha2(text, 256)"))
        .select(
            F.col("doc_id").alias("media_id"),
            F.lit("video").alias("kind"),
            F.unhex(
                F.concat(F.lit(_mm9_prefix_hex()), *[F.expr(c) for c in chunks])
            ).alias("data"),
        )
    )
    return scene_cuts(media, MM9_LUMA_THR)


def _mm9_oracle() -> str:
    b_hi = _B.format(i="2*k + 1")
    b_lo = _B.format(i="2*k + 2")
    return f"""
WITH m AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents
           WHERE text IS NOT NULL),
v AS (SELECT media_id,
             list_transform(range(0, {MM9_N_FRAMES}),
                            k -> 16 * {b_hi} + {b_lo}) AS lum
      FROM m),
c AS (SELECT media_id, lum,
             list_filter(range(1, {MM9_N_FRAMES}),
                         k -> abs(lum[k + 1] - lum[k]) > {MM9_LUMA_THR}) AS cuts
      FROM v)
SELECT media_id,
       CAST({MM9_N_FRAMES} AS BIGINT) AS n_frames,
       CAST(len(cuts) AS BIGINT) AS n_cuts,
       coalesce(array_to_string(cuts, ','), '') AS cuts_csv
FROM c
"""
# ^ coalesce is load-bearing: DuckDB's array_to_string([]) is NULL
# while Spark's array_join(empty) is '' — a zero-cut video (all 11
# luma deltas <= thr, P ~ 1e-5 per doc) first EXISTS at the 10x
# corpus (2 of 600k docs; none at sf<=0.1). Found by the round-10
# sf1-equivalent sweep.


SPECS = [
    QuerySpec("mm1_feature_extract", mm1_feature_extract, MM1_ORACLE,
              "multimodal mapInPandas feature extraction shape"),
    QuerySpec("mm2_resize_plan", mm2_resize_plan, MM2_ORACLE,
              "multimodal resize geometry"),
    QuerySpec("mm3_frame_sample", mm3_frame_sample, MM3_ORACLE,
              "multimodal video frame sampling"),
    QuerySpec("mm4_decode_roundtrip", mm4_decode_roundtrip, MM4_ORACLE,
              "REAL PPM decode vs independent hex-arithmetic oracle"),
    QuerySpec("mm5_audio_roundtrip", mm5_audio_roundtrip, MM5_ORACLE,
              "REAL WAV PCM-16 decode vs independent oracle"),
    QuerySpec("mm6_video_probe", mm6_video_probe, MM6_ORACLE,
              "REAL AVI container probe vs arithmetic oracle"),
    QuerySpec("mm7_phash_neardup", mm7_phash_neardup, _mm7_oracle(),
              "dHash image near-dup via banded hamming join"),
    QuerySpec("mm8_audio_fp_neardup", mm8_audio_fp_neardup, _mm8_oracle(),
              "audio energy-delta fingerprint near-dup (shared band join)"),
    QuerySpec("mm9_scene_cuts", mm9_scene_cuts, _mm9_oracle(),
              "REAL AVI frame-chunk decode + scene-cut detection"),
]
