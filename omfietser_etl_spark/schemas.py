"""Schemas: per-shop raw input StructTypes + the 32-column unified row.

Raw schemas follow the reference's TS interfaces / FIXTURES.md:
- AH:    projects/processor/src/processors/ah.ts:10-42
- Jumbo: processors/jumbo.ts:12-49 (wrapped in `product`)
- Aldi:  processors/aldi.ts:9-37
- Plus:  processors/plus.ts:10-49 (wrapped in `PLP_Str`)
Unified: src/core/structure/unified-product-template.ts:11-115.
"""

from __future__ import annotations

from pyspark.sql import types as T

AH_SCHEMA = T.StructType(
    [
        T.StructField("webshopId", T.LongType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("salesUnitSize", T.StringType(), True),
        T.StructField("unitPriceDescription", T.StringType(), True),
        T.StructField(
            "images",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("url", T.StringType(), True),
                        T.StructField("width", T.IntegerType(), True),
                    ]
                )
            ),
            True,
        ),
        T.StructField("mainCategory", T.StringType(), True),
        T.StructField("subCategory", T.StringType(), True),
        T.StructField("brand", T.StringType(), True),
        T.StructField("shopType", T.StringType(), True),
        T.StructField("priceBeforeBonus", T.DoubleType(), True),
        T.StructField("currentPrice", T.DoubleType(), True),
        T.StructField("bonusStartDate", T.StringType(), True),
        T.StructField("bonusEndDate", T.StringType(), True),
        T.StructField("promotionType", T.StringType(), True),
        T.StructField("bonusMechanism", T.StringType(), True),
        T.StructField("isBonus", T.BooleanType(), True),
        T.StructField("isVirtualBundle", T.BooleanType(), True),
        T.StructField("orderAvailabilityStatus", T.StringType(), True),
        T.StructField(
            "discountLabels",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("code", T.StringType(), True),
                        T.StructField("defaultDescription", T.StringType(), True),
                        T.StructField("count", T.IntegerType(), True),
                        T.StructField("price", T.DoubleType(), True),
                        T.StructField("freeCount", T.IntegerType(), True),
                        T.StructField("percentage", T.DoubleType(), True),
                        T.StructField("precisePercentage", T.DoubleType(), True),
                        T.StructField("amount", T.DoubleType(), True),
                        T.StructField("unit", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

JUMBO_SCHEMA = T.StructType(
    [
        T.StructField(
            "product",
            T.StructType(
                [
                    T.StructField("id", T.StringType(), False),
                    T.StructField("title", T.StringType(), True),
                    T.StructField("brand", T.StringType(), True),
                    T.StructField("category", T.StringType(), True),
                    T.StructField("subtitle", T.StringType(), True),
                    T.StructField("quantity", T.StringType(), True),
                    T.StructField(
                        "quantityDetails",
                        T.StructType(
                            [
                                T.StructField("maxAmount", T.DoubleType(), True),
                                T.StructField("minAmount", T.DoubleType(), True),
                                T.StructField("stepAmount", T.DoubleType(), True),
                                T.StructField("defaultAmount", T.DoubleType(), True),
                            ]
                        ),
                        True,
                    ),
                    T.StructField("image", T.StringType(), True),
                    T.StructField("inAssortment", T.BooleanType(), True),
                    T.StructField(
                        "availability",
                        T.StructType(
                            [
                                T.StructField("availability", T.StringType(), True),
                                T.StructField("isAvailable", T.BooleanType(), True),
                            ]
                        ),
                        True,
                    ),
                    T.StructField(
                        "prices",
                        T.StructType(
                            [
                                T.StructField("price", T.LongType(), True),
                                T.StructField("promoPrice", T.LongType(), True),
                                T.StructField(
                                    "pricePerUnit",
                                    T.StructType(
                                        [
                                            T.StructField("price", T.LongType(), True),
                                            T.StructField("unit", T.StringType(), True),
                                        ]
                                    ),
                                    True,
                                ),
                            ]
                        ),
                        True,
                    ),
                    T.StructField(
                        "promotions",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField(
                                        "tags",
                                        T.ArrayType(
                                            T.StructType(
                                                [T.StructField("text", T.StringType(), True)]
                                            )
                                        ),
                                        True,
                                    ),
                                    T.StructField("start", T.StringType(), True),
                                    T.StructField("end", T.StringType(), True),
                                ]
                            )
                        ),
                        True,
                    ),
                ]
            ),
            True,
        )
    ]
)

ALDI_SCHEMA = T.StructType(
    [
        T.StructField("articleNumber", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("brandName", T.StringType(), True),
        T.StructField("salesUnit", T.StringType(), True),
        T.StructField("price", T.StringType(), True),
        T.StructField("priceFormatted", T.StringType(), True),
        T.StructField("oldPrice", T.StringType(), True),
        T.StructField("oldPriceFormatted", T.StringType(), True),
        T.StructField("priceInfo", T.StringType(), True),
        T.StructField("priceReduction", T.StringType(), True),
        T.StructField("basePriceFormatted", T.StringType(), True),
        T.StructField("basePriceValue", T.DoubleType(), True),
        T.StructField(
            "primaryImage",
            T.StructType(
                [
                    T.StructField("baseUrl", T.StringType(), True),
                    T.StructField("alt", T.StringType(), True),
                ]
            ),
            True,
        ),
        T.StructField("articleId", T.StringType(), True),
        T.StructField("isNotAvailable", T.BooleanType(), True),
        T.StructField("isSoldOut", T.BooleanType(), True),
        T.StructField("shortDescription", T.StringType(), True),
        T.StructField("mainCategory", T.StringType(), True),
        T.StructField(
            "promotionDetails",
            T.StructType(
                [
                    T.StructField("promotionDate", T.StringType(), True),
                    T.StructField("dateFormat", T.StringType(), True),
                    T.StructField("iterationPath", T.StringType(), True),
                    T.StructField("promotionPath", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

PLUS_SCHEMA = T.StructType(
    [
        T.StructField(
            "PLP_Str",
            T.StructType(
                [
                    T.StructField("SKU", T.StringType(), True),
                    T.StructField("Name", T.StringType(), True),
                    T.StructField("Brand", T.StringType(), True),
                    T.StructField("Product_Subtitle", T.StringType(), True),
                    T.StructField("Slug", T.StringType(), True),
                    T.StructField("ImageURL", T.StringType(), True),
                    T.StructField("OriginalPrice", T.StringType(), True),
                    T.StructField("NewPrice", T.StringType(), True),
                    T.StructField("Packging", T.StringType(), True),
                    T.StructField("IsAvailable", T.BooleanType(), True),
                    T.StructField("PromotionLabel", T.StringType(), True),
                    T.StructField("PromotionStartDate", T.StringType(), True),
                    T.StructField("PromotionEndDate", T.StringType(), True),
                    T.StructField(
                        "Categories",
                        T.StructType(
                            [
                                T.StructField(
                                    "List",
                                    T.ArrayType(
                                        T.StructType(
                                            [T.StructField("Name", T.StringType(), True)]
                                        )
                                    ),
                                    True,
                                )
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        )
    ]
)

# The 32 unified columns in template order
# (ref: unified-product-template.ts:11-21 names, :29-115 types)
UNIFIED_COLUMNS = [
    ("unified_id", T.StringType(), False),
    ("shop_type", T.StringType(), False),
    ("title", T.StringType(), False),
    ("main_category", T.StringType(), True),
    ("brand", T.StringType(), False),
    ("image_url", T.StringType(), False),
    ("sales_unit_size", T.StringType(), False),
    ("quantity_amount", T.DoubleType(), False),
    ("quantity_unit", T.StringType(), False),
    ("default_quantity_amount", T.DoubleType(), True),
    ("default_quantity_unit", T.StringType(), True),
    ("price_before_bonus", T.DoubleType(), False),
    ("current_price", T.DoubleType(), False),
    ("unit_price", T.DoubleType(), True),
    ("unit_price_unit", T.StringType(), True),
    ("is_promotion", T.BooleanType(), False),
    ("promotion_type", T.StringType(), False),
    ("promotion_mechanism", T.StringType(), False),
    ("promotion_start_date", T.StringType(), True),
    ("promotion_end_date", T.StringType(), True),
    ("parsed_promotion_effective_unit_price", T.DoubleType(), True),
    ("parsed_promotion_required_quantity", T.DoubleType(), True),
    ("parsed_promotion_total_price", T.DoubleType(), True),
    ("parsed_promotion_is_multi_purchase_required", T.BooleanType(), True),
    ("normalized_quantity_amount", T.DoubleType(), True),
    ("normalized_quantity_unit", T.StringType(), True),
    ("conversion_factor", T.DoubleType(), True),
    ("price_per_standard_unit", T.DoubleType(), True),
    ("current_price_per_standard_unit", T.DoubleType(), True),
    ("discount_absolute", T.DoubleType(), True),
    ("discount_percentage", T.DoubleType(), True),
    ("is_active", T.BooleanType(), False),
]

UNIFIED_SCHEMA = T.StructType(
    [T.StructField(n, t, nullable) for n, t, nullable in UNIFIED_COLUMNS]
)

UNIFIED_COLUMN_NAMES = [n for n, _, _ in UNIFIED_COLUMNS]

# error/dead-letter channel (ref: processing_errors,
# database/init-processor-schema.sql:69-82)
ERROR_SCHEMA = T.StructType(
    [
        T.StructField("raw_product_id", T.StringType(), True),
        T.StructField("shop_type", T.StringType(), False),
        T.StructField("error_type", T.StringType(), False),
        T.StructField("severity", T.StringType(), False),
        T.StructField("error_message", T.StringType(), False),
    ]
)
