"""Perceptual-hash (dHash) image near-duplicate detection — the
image-side counterpart of the text dedup family (td2/td3/td4): a
64-bit difference hash is robust to small pixel perturbations and
re-encodes, so hamming-close hashes ≡ visually-identical images
(Krawetz's dHash, public: hackerfactor "Kind of Like That", 2013;
same family as pHash/aHash used by every image-dedup pipeline).

Shape:
- ``dhash_images`` — REAL decode (the pure-numpy PPM/BMP codecs in
  multimodal/codecs.py), nearest-neighbor resample of the R channel
  to a (grid+1)×grid luminance grid, then per-row adjacent
  comparisons: bit p (p = r·grid + c) is 1 iff gray(r,c) > gray(r,c+1).
  The 64 bits are emitted as FOUR unsigned 16-bit band ints
  (b0..b3, band k carrying bits p = 16k..16k+15) — never packed into
  one int64, so no sign-bit/shift-semantics hazards cross engines,
  and the bands are exactly the LSH blocking keys.
- ``phash_neardup_pairs`` — banded hamming join: images sharing any
  identical 16-bit band are candidates (equi-join on (band, key) —
  the td3 MinHash-band plan shape, never all-pairs), then the exact
  hamming distance (Σ bit_count(xor) over bands) filters to
  ``max_hamming``. With 4 bands, pigeonhole makes recall EXACT for
  max_hamming ≤ 3: ≤3 flipped bits cannot touch all 4 bands.

Scale: hashing is one Arrow-batched map pass (closures pickled by
value — workers never import this package); the join is the standard
bounded-bucket blocking equi-join; candidates grow with bucket
occupancy, not N² (the td3/td19 stress argument applies verbatim).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: dHash grid: 8 rows × 8 comparisons per row over a 9-wide resample.
DHASH_GRID = 8
#: gate-geometry band count (64 bits / 16).
DHASH_BANDS = 4


def band_schema(n_bands: int) -> T.StructType:
    """(media_id, b0..b{n-1}) — the fingerprint frame shared by the
    image and audio hashers and the banded pair join."""
    return T.StructType(
        [T.StructField("media_id", T.LongType(), False)]
        + [T.StructField(f"b{k}", T.IntegerType(), True) for k in range(n_bands)]
    )


DHASH_SCHEMA = band_schema(DHASH_BANDS)


def dhash_images(media: DataFrame, grid: int = DHASH_GRID) -> DataFrame:
    """(media_id, b0..b{n-1}): the grid²-bit dHash of every decodable
    image as 16-bit bands; undecodable payloads yield NULL bands
    (kept, the td18 NULL-key discipline — a filter drops them
    explicitly)."""
    from .codecs import make_image_tools

    if (grid * grid) % 16 != 0:
        raise ValueError(f"dhash_images: grid²={grid * grid} not 16-divisible")
    _decode, to_array, resize, _enc = make_image_tools()
    n_bands = (grid * grid) // 16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"media_id": []}
            for k in range(n_bands):
                out[f"b{k}"] = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                out["media_id"].append(mid)
                arr = to_array(bytes(data) if data is not None else None)
                if arr is None:
                    for k in range(n_bands):
                        out[f"b{k}"].append(None)
                    continue
                g = resize(arr, grid + 1, grid)[:, :, 0].astype("int64")
                bits = (g[:, :-1] > g[:, 1:]).astype("int64").ravel()
                for k in range(n_bands):
                    band = 0
                    for j in range(16):
                        band |= int(bits[16 * k + j]) << j
                    out[f"b{k}"].append(band)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "image").select(
        "media_id", "data"
    ).mapInPandas(run, band_schema(n_bands))


def phash_neardup_pairs(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """(id_lo, id_hi, hamming): unordered pairs with fingerprint
    hamming distance ≤ ``max_hamming``, found via the banded equi-join
    (exact recall for max_hamming ≤ n_bands − 1 by pigeonhole). Band
    columns are inferred from the input frame, so any band_schema
    geometry works."""
    import re

    from ..cacheutil import persist_replannable

    band_cols = sorted(
        (c for c in hashes.columns if re.fullmatch(r"b\d+", c)),
        key=lambda c: int(c[1:]),
    )
    n_bands = len(band_cols)
    # h feeds the banded self-join (both aliases) AND both sides of
    # the verify join — four references, and AQE does not canonicalize
    # the duplicated upstream subtree (the td28 class): the round-10
    # audit measured the decode mapInPandas executing 3x (documents
    # scanned 6x in mm7/mm8). The hash table is id + n_bands ints —
    # persisting it makes the REAL media decode (the expensive stage
    # at 100 TB) structurally once-per-run.
    h = persist_replannable("phash.pairs", hashes.na.drop(subset=band_cols))
    stacked = h.select(
        F.col("media_id").alias("id"),
        F.expr(
            "stack({n}, {args}) AS (band, key)".format(
                n=n_bands,
                args=", ".join(f"{k}, {c}" for k, c in enumerate(band_cols)),
            )
        ),
    )
    cand = (
        stacked.alias("a")
        .join(
            stacked.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_lo"), F.col("b.id").alias("id_hi"))
        .distinct()
    )
    ha = h.select(
        F.col("media_id").alias("id_lo"),
        *[F.col(c).alias(f"xa{k}") for k, c in enumerate(band_cols)],
    )
    hb = h.select(
        F.col("media_id").alias("id_hi"),
        *[F.col(c).alias(f"xb{k}") for k, c in enumerate(band_cols)],
    )
    dist = " + ".join(
        f"bit_count(xa{k} ^ xb{k})" for k in range(n_bands)
    )
    return (
        cand.join(ha, "id_lo")
        .join(hb, "id_hi")
        .withColumn("hamming", F.expr(dist).cast("int"))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_lo", "id_hi", "hamming")
    )
