"""Audio fingerprint near-duplicate detection — the audio-side
counterpart of mm7's image dHash: a 64-bit energy-delta fingerprint
(the sign-of-difference construction from Haitsma & Kalker, "A Highly
Robust Audio Fingerprinting System", ISMIR 2002, simplified to
frame-energy deltas along time — no FFT, so the DuckDB oracle can
replay every bit from the synthesized PCM hex with independent
integer arithmetic).

Construction: REAL RIFF/WAVE PCM-16 decode (multimodal/codecs.py),
frame the stream into ``bits+1`` windows of ``frame`` samples, exact
integer frame energies e_i = Σ s², and bit p = e[p] > e[p+1]. A
single corrupted sample moves ONE frame energy and flips ≤2 bits —
the locality that makes this a NEAR-dup hash (a cryptographic hash
would avalanche). Bits are emitted as mm7's 4×16-bit bands, so the
banded hamming join (`phash.phash_neardup_pairs`) is shared verbatim
— one blocking plan for both modalities.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .phash import band_schema

#: frame size (samples) and bit count of the fingerprint.
AFP_FRAME = 2
AFP_BITS = 64


def audio_fingerprint(
    media: DataFrame, frame: int = AFP_FRAME, bits: int = AFP_BITS
) -> DataFrame:
    """(media_id, b0..b3): the 64-bit energy-delta fingerprint of
    every decodable PCM-16 payload as four 16-bit bands; undecodable
    or too-short streams yield NULL bands (kept — a filter drops them
    explicitly, the mm7/td18 NULL discipline). Multi-channel streams
    fingerprint channel 0."""
    from .codecs import make_audio_tools

    if bits % 16 != 0:
        raise ValueError(f"audio_fingerprint: bits={bits} not 16-divisible")
    decode_wav, _enc = make_audio_tools()
    need = (bits + 1) * frame
    n_bands = bits // 16

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out: dict[str, list] = {"media_id": []}
            for k in range(n_bands):
                out[f"b{k}"] = []
            for mid, data in zip(pdf["media_id"], pdf["data"]):
                out["media_id"].append(mid)
                d = decode_wav(bytes(data) if data is not None else None)
                s = d["samples"][:: d["n_channels"]] if d else None
                if s is None or len(s) < need:
                    for k in range(n_bands):
                        out[f"b{k}"].append(None)
                    continue
                e = (s[:need].reshape(bits + 1, frame) ** 2).sum(axis=1)
                flags = (e[:-1] > e[1:]).astype(np.int64)
                for k in range(n_bands):
                    band = 0
                    for j in range(16):
                        band |= int(flags[16 * k + j]) << j
                    out[f"b{k}"].append(band)
            yield pd.DataFrame(out)

    return media.filter(F.col("kind") == "audio").select(
        "media_id", "data"
    ).mapInPandas(run, band_schema(n_bands))
