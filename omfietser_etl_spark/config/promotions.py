"""Ordered promotion-mechanism pattern table (config-as-data).

Semantics mirror the reference's promotion configuration
(ref: projects/processor/src/config/promotions.ts:16-164 pattern
order + regexes; :194-303 per-type detail extraction). Patterns are
Java regexes applied to a lowercased, whitespace-normalized segment;
ORDER IS SEMANTIC — the first matching pattern wins.

Each entry: (id, type, java_regex). The effective-price / quantity
arithmetic per id lives in functions/promotions.py (it is expression
logic, not data).
"""

# NOTE: inputs are pre-lowercased, so the regexes are lowercase-only.
PROMOTION_PATTERNS = [
    ("fixed_price", "FIXED_PRICE", r"fixed price €?(\d+[.,]?\d*)"),
    ("x_for_y", "X_FOR_Y", r"(\d+)\s*voor\s*€?(\d+[.,]?\d*)"),
    ("x_plus_y_free", "X_PLUS_Y_FREE", r"(\d+)\s*\+\s*(\d+)\s*gratis"),
    ("percentage_discount", "PERCENTAGE_DISCOUNT", r"(\d+)\s*%\s*korting|-\s*(\d+)%"),
    ("second_half_price", "SECOND_HALF_PRICE", r"2e\s+halve\s+prijs"),
    ("second_free", "SECOND_FREE", r"2e\s+gratis"),
    ("fixed_discount", "FIXED_DISCOUNT", r"-\s*€?(\d+[.,]?\d*)"),
    ("pack_discount", "PACK_DISCOUNT", r"(\d+)%\s*pakketkorting"),
    ("volume_discount", "VOLUME_DISCOUNT", r"(\d+)%\s*volume\s*voordeel"),
    ("conditional_buy", "CONDITIONAL_BUY", r"bij\s+elke\s+(\d+)\s+stuks"),
    ("conditional_spend", "CONDITIONAL_SPEND", r"vanaf\s*€?(\d+[.,]?\d*)"),
    ("delivery_promo", "DELIVERY_PROMO", r"gratis\s+bezorging|bezorgkorting"),
    ("kies_mix", "KIES_MIX", r"kies\s*&?\s*mix"),
]

PROMOTION_TYPES = [t for _, t, _ in PROMOTION_PATTERNS] + [
    "UNKNOWN",
    "MULTI_PROMO",
    "STRUCTURED_DISCOUNT",
]
