"""Shared constants for text dedup / analysis operators.

Both the Spark builders and the generated DuckDB oracle SQL derive
from these values, so the two engines compute identical integers.

The reference's dedup surface is key/fuzzy only
(`src/utils/dedupe.ts:23-52,100-124`, `utils/categorization.ts:16-40`);
MinHash/SimHash/LSH generalize it to web scale per the project brief.
"""

from __future__ import annotations

import random

# Modulus for the polynomial rolling char hash. Fits 64-bit signed
# arithmetic in both engines: acc < MOD, so acc*31 + 255 < 2^35.
MOD = 1_000_000_007
CHAR_SEED = 7

# MinHash: N_HASHES affine maps h_i(x) = (a_i * x + b_i) % MOD, split
# into BANDS bands of ROWS rows for LSH banding. a_i*x < MOD^2 < 2^60.
#
# No corpus-sizing helper on purpose (round-8 constant sweep): unlike
# RH-LSH keys (truncated BIT strings whose 2^rows space saturates as N
# grows — rh_params_for exists for exactly that), a MinHash band key
# is a tuple of ROWS values from the full 10^9 hash space, so random
# collisions stay negligible at any corpus size; the geometry sets the
# RECALL curve P(candidate) = 1-(1-J^ROWS)^BANDS at the target τ,
# which is scale-free (4×4 ⇒ ~0.96 at τ=0.8). Candidate growth is
# governed by true near-dup density, measured linear in SCALING.md
# ("minhash-band" rows).
N_HASHES = 16
BANDS = 4
ROWS = 4
_rng = random.Random(42)
MINHASH_A = [_rng.randrange(1, MOD) for _ in range(N_HASHES)]
MINHASH_B = [_rng.randrange(0, MOD) for _ in range(N_HASHES)]

# SimHash: one affine re-mix into 32-bit space, then per-bit majority
# vote over the document's distinct tokens.
SIMHASH_BITS = 32
SIMHASH_A = _rng.randrange(1, MOD)
SIMHASH_B = _rng.randrange(0, MOD)
SIMHASH_SPACE = 1 << 32

# Word-shingle size for n-gram Jaccard / MinHash.
SHINGLE_N = 3
# Near-duplicate Jaccard threshold (the sf* documents tables have a
# planted cluster at >= 0.9 and background noise <= 0.07).
JACCARD_THRESHOLD = 0.8

# Language-ID stopword lists (tiny, deterministic; precedence order =
# dict order for argmax ties).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein"],
    "es": ["el", "la", "que", "los", "una", "por", "con"],
    "fr": ["le", "les", "des", "est", "une", "dans", "pour"],
    "zh": [],  # detected via CJK codepoint regex instead
}
CJK_PATTERN = "[\\u4e00-\\u9fff]"

# Quality-score thresholds (additive, integer bonuses — mirrors the
# reference's additive quality scorer shape,
# `core/services/quality/product-quality-service.ts:90-158`).
QUALITY_BASE = 50
