"""Real image decode path (multimodal/codecs.py + decode_image /
decode_and_resize): PPM and BMP fixtures built byte-by-byte, decoded
through Spark mapInPandas, checked against numpy ground truth."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from omfietser_etl_spark.multimodal.codecs import make_image_tools
from omfietser_etl_spark.multimodal.media import decode_and_resize, decode_image

decode, to_array, resize, encode_ppm = make_image_tools()


def _gradient(w: int, h: int) -> np.ndarray:
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [(x * 7) % 256, (y * 11) % 256, (x + y) % 256], axis=-1
    ).astype(np.uint8)


def _bmp_bytes(arr: np.ndarray) -> bytes:
    """Minimal 24-bit BI_RGB bottom-up BMP encoder (test fixture)."""
    h, w = arr.shape[:2]
    row = (w * 3 + 3) // 4 * 4
    body = bytearray()
    for r in arr[::-1]:  # bottom-up
        line = r[:, ::-1].tobytes()  # RGB → BGR
        body += line + b"\x00" * (row - len(line))
    offset = 14 + 40
    size = offset + len(body)
    header = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + offset.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return header + bytes(body)


def test_ppm_and_bmp_roundtrip_pixel_exact():
    arr = _gradient(5, 3)
    assert np.array_equal(to_array(encode_ppm(arr)), arr)
    assert np.array_equal(to_array(_bmp_bytes(arr)), arr)
    d = decode(encode_ppm(arr))
    assert (d["width"], d["height"], d["mode"]) == (5, 3, "RGB")
    assert d["mean_r"] == arr[:, :, 0].mean()


def test_corrupt_and_foreign_bytes_rejected():
    assert decode(b"") is None
    assert decode(b"P6\n5 3\n255\n\x00\x01") is None  # truncated pixels
    assert decode(b"\x89PNG\r\n\x1a\n....") is None  # compressed format
    assert decode(b"BM" + b"\x00" * 20) is None


def test_nearest_resize_matches_numpy_reference():
    arr = _gradient(10, 6)
    out = resize(arr, 5, 3)
    ys = (np.arange(3) * 6) // 3
    xs = (np.arange(5) * 10) // 5
    assert np.array_equal(out, arr[ys][:, xs])


def _media_df(spark, payloads):
    rows = [(i, "image", bytearray(p)) for i, p in enumerate(payloads)]
    return spark.createDataFrame(
        rows,
        T.StructType(
            [
                T.StructField("media_id", T.LongType()),
                T.StructField("kind", T.StringType()),
                T.StructField("data", T.BinaryType()),
            ]
        ),
    )


def test_spark_decode_real_images(spark):
    arr = _gradient(6, 4)
    df = _media_df(spark, [encode_ppm(arr), _bmp_bytes(arr), b"not an image"])
    out = {r.media_id: r for r in decode_image(df).collect()}
    for mid in (0, 1):
        r = out[mid]
        assert (r.decoded_width, r.decoded_height, r.mode) == (6, 4, "RGB")
        assert r.mean_r == arr[:, :, 0].mean()
        assert r.mean_b == arr[:, :, 2].mean()
    assert out[2].mode == "unsupported" and out[2].decoded_width is None


def test_spark_decode_and_resize_caps_long_side(spark):
    arr = _gradient(16, 8)
    df = _media_df(spark, [encode_ppm(arr)])
    r = decode_and_resize(df, max_side=8).first()
    assert (r.out_width, r.out_height) == (8, 4)
    got = to_array(bytes(r.data))
    ys = (np.arange(4) * 8) // 4
    xs = (np.arange(8) * 16) // 8
    assert np.array_equal(got, arr[ys][:, xs])
    # small images pass through untouched
    r2 = decode_and_resize(df, max_side=64).first()
    assert (r2.out_width, r2.out_height) == (16, 8)
    assert np.array_equal(to_array(bytes(r2.data)), arr)


def test_wav_roundtrip_exact_stats(spark):
    from omfietser_etl_spark.multimodal.codecs import make_audio_tools
    from omfietser_etl_spark.multimodal.media import decode_audio

    decode_wav, encode_wav = make_audio_tools()
    samples = [0, 1, -1, 32767, -32768, 1000, -999, 5]
    wav = encode_wav(samples, 8000)
    d = decode_wav(wav)
    assert d["n_channels"] == 1 and d["sample_rate"] == 8000
    assert d["n_samples"] == len(samples)
    assert d["sum_sq"] == sum(s * s for s in samples)
    assert d["peak"] == 32768
    assert decode_wav(b"ID3\x04mp3 payload") is None
    assert decode_wav(b"RIFF\x00\x00\x00\x00WAVE") is None

    df = _media_df(spark, [wav, b"not audio"]).withColumn(
        "kind", F.lit("audio")
    )
    out = {r.media_id: r for r in decode_audio(df).collect()}
    assert out[0].codec == "pcm16" and out[0].sum_sq == d["sum_sq"]
    assert out[1].codec == "unsupported" and out[1].sum_sq is None


def test_strip_markup_matches_python_re_model(spark):
    """The ordered regex chain must behave identically when compiled
    by Java (Spark) and replayed by an independent engine — model it
    with Python re over adversarial inputs."""
    import re as _re

    from pyspark.sql import types as T

    from omfietser_etl_spark.textops.analysis import MARKUP_STRIP_STEPS, strip_markup

    def model(s: str) -> str:
        for pat, rep in MARKUP_STRIP_STEPS:
            s = _re.sub(pat, rep, s)
        return s.strip()

    cases = [
        "<p>plain</p>",
        "<script>while(1){'<p>'}</script>keep",
        "<style>a{}</style><STYLE>upper not matched</STYLE>",
        "a &amp;&amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;&nbsp;f",
        "<!-- <p>commented</p> -->after",
        "un<closed tag",
        "<div\nmultiline='y'\n>x</div>",
        "< not a tag >",
        "nested <b><i>tags</i></b> here",
        "",
    ]
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)],
        T.StructType(
            [T.StructField("i", T.IntegerType()), T.StructField("s", T.StringType())]
        ),
    )
    got = {r.i: r.out for r in df.select("i", strip_markup("s").alias("out")).collect()}
    for i, c in enumerate(cases):
        assert got[i] == model(c), f"case {i}: {c!r}: {got[i]!r} != {model(c)!r}"


def test_avi_probe_roundtrip(spark):
    from omfietser_etl_spark.multimodal.codecs import make_video_tools
    from omfietser_etl_spark.multimodal.media import probe_video

    probe_avi, encode_avi = make_video_tools()
    avi = encode_avi(320, 240, 75, 40_000)
    d = probe_avi(avi)
    assert (d["width"], d["height"], d["n_frames"]) == (320, 240, 75)
    assert d["n_streams"] == 1 and d["duration_ms"] == 3000
    assert probe_avi(b"RIFF\x04\x00\x00\x00WAVE") is None
    assert probe_avi(b"\x00\x00\x00\x18ftypmp42") is None  # mp4 → unsupported

    df = _media_df(spark, [avi, b"not video"]).withColumn("kind", F.lit("video"))
    out = {r.media_id: r for r in probe_video(df).collect()}
    assert out[0].container == "avi" and out[0].n_frames == 75
    assert out[1].container == "unsupported" and out[1].width is None
