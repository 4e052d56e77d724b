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

#: name -> LATEST round whose CORRECTNESS artifact has a green row for
#: it. Drives the staleness rotation in :func:`all_specs` (certified
#: tail ordered oldest-green-first). Regenerated alongside
#: _DRIVER_CERTIFIED by tools/update_certified.py.
_CERTIFIED_ROUND: dict[str, int] = {
    "a10_drift_report": 4,
    "a11_issue_escalation": 4,
    "a12_mapping_methods": 4,
    "a13_approx_distinct": 5,
    "a13_distinct_parts": 5,
    "a14_pivot": 3,
    "a15_percentile_bands": 3,
    "a16_profile": 3,
    "a17_incremental_rollup": 5,
    "a18_grouping_sets": 5,
    "a19_unpivot": 3,
    "a1_status_counters": 5,
    "a20_window_suite": 3,
    "a21_approx_percentile": 5,
    "a3_type_distribution": 5,
    "a4_price_stats": 5,
    "a5_promo_analysis": 4,
    "a6_job_stats": 4,
    "a7_event_summary": 5,
    "a8_version_stats": 5,
    "ca1_corpus_report": 4,
    "cube_status_priority": 5,
    "d1_promo_parse": 3,
    "d2_quantity_standardize": 3,
    "d4_price_per_unit": 3,
    "d5_discount_metrics": 3,
    "dd1_latest_per_key": 5,
    "dd2_neardup_groups": 4,
    "dd3_fuzzy_best_match": 4,
    "dd4_neardup_components": 4,
    "ev1_funnel": 4,
    "ev2_retention": 4,
    "ev3_moving_sum": 4,
    "f6_validity_split": 5,
    "h1_scd2_history": 4,
    "h2_gapfill": 4,
    "j10_full_outer_reconcile": 5,
    "j1_broadcast_enrich": 5,
    "j3_fuzzy_theta": 5,
    "j5_multiway_revenue": 5,
    "j7_asof_lag_delta": 1,
    "j7_first_last_seen": 5,
    "j8_range_join": 5,
    "mm1_feature_extract": 4,
    "mm2_resize_plan": 4,
    "mm3_frame_sample": 4,
    "mm4_decode_roundtrip": 4,
    "mm5_audio_roundtrip": 4,
    "mm6_video_probe": 4,
    "o1_pagination": 5,
    "o4_argmax_per_group": 5,
    "o7_topk_per_group": 5,
    "o9_keyset_pagination": 5,
    "p1_ah_pipeline": 3,
    "p2_jumbo_pipeline": 3,
    "p3_aldi_pipeline": 3,
    "p4_plus_pipeline": 3,
    "p5_coalesce_projection": 5,
    "p6_generic_kruidvat": 3,
    "q2_quality_report": 3,
    "rollup_region_nation": 5,
    "s10_variant_extract": 4,
    "s1_scan_pushdown": 5,
    "s3_multi_filter_scan": 4,
    "s5_point_lookup": 5,
    "semi_join_active": 5,
    "st4_changed_rows": 1,
    "st6_window_counts": 1,
    "st7_sessionize": 4,
    "t_scalar_text": 3,
    "ta10_char_entropy": 5,
    "ta2_quality_score": 1,
    "ta3_lang_id": 1,
    "ta4_fingerprint": 1,
    "ta5_repetition": 4,
    "ta6_strip_markup": 4,
    "ta7_relative_length_filter": 4,
    "ta8_bigram_fluency": 4,
    "ta9_gopher_rules": 5,
    "tc1_doc_chunking": 4,
    "tc2_pii_scrub": 4,
    "td10_quantize": 4,
    "td11_line_dedup": 4,
    "td12_jaccard_guarded": 3,
    "td13_semantic_dedup": 4,
    "td14_substring_dedup": 4,
    "td15_fuzzy_dedup_e2e": 4,
    "td16_rh_lsh_pairs": 4,
    "td17_incremental_dedup": 4,
    "td18_bloom_decontam": 4,
    "td19_winnowing_pairs": 5,
    "td1_exact_dedup": 3,
    "td2_ngram_jaccard": 3,
    "td2h_jaccard_hashed": 5,
    "td3_minhash_lsh": 3,
    "td4_simhash": 2,
    "td5_embed_neardup": 2,
    "td6_ann_topk": 2,
    "td7_ivf_ann": 1,
    "td8_kmeans_assign": 4,
    "td9_contamination": 4,
    "tp1_prepare_corpus": 5,
    "ts10_unimax_budget": 5,
    "ts11_unimax_realized": 5,
    "ts12_token_unimax_realized": 5,
    "ts13_token_balanced_shards": 5,
    "ts14_leakage_free_split": 5,
    "ts15_dsir_select": 5,
    "ts1_hash_sample": 4,
    "ts2_mixture_split": 4,
    "ts3_sequence_pack": 4,
    "ts4_stratified_sample": 5,
    "ts5_shuffle_order": 5,
    "ts6_tokenize": 5,
    "ts7_weighted_sample": 5,
    "ts8_temperature_rebalance": 5,
    "ts9_fixed_size_sample": 5,
    "tv1_top_terms": 4,
    "tv2_tfidf_terms": 4,
    "tv3_cms_heavy_hitters": 4,
    "u1_union_distinct": 5,
    "u3_distinct_per_group": 4,
    "u4_anti_join_missing": 5,
    "u4_new_disappeared": 4,
    "u5_intersect_except": 5,
    "x2_online_inference": 4,
    "x3_validation_summary": 3,
    "x7_skew_report": 5,
    "x8_nb_inference": 5,
    "x9_nb_train_fit": 4,
}


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
    # Staleness rotation: with (nearly) the whole catalog certified, the
    # gate would otherwise re-sample the same first 50 forever and the
    # other rows would age indefinitely. Order the certified tail by
    # OLDEST green driver round first (name tiebreak) so the 50-wide
    # window re-verifies the full catalog every ~3 rounds.
    seen = [s for s in specs if s.name in _DRIVER_CERTIFIED]
    seen.sort(key=lambda s: (_CERTIFIED_ROUND.get(s.name, 0), s.name))
    return fresh + seen
