"""Round-4 driver window + cumulative r1-3 greens + initial reorder.

Split from the monolithic catalog.py (round 6); registration
order is preserved by the package __init__ import sequence.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Dict

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from knime_core_columnar_spark.schema import ROW_KEY
from knime_core_columnar_spark.table import ColumnarTable, RowIdPolicy

from knime_core_columnar_spark.catalog._registry import (  # noqa: F401
    ORACLES,
    QUERIES,
)

# ---------------------------------------------------------------------------
# Driver-window ordering.
#
# The driver's correctness gate checks the FIRST 50 entries of ``queries()``
# (registration order).  Cumulative driver-green after rounds 1-3: 98
# distinct queries (CORRECTNESS_r01 ∪ r02 ∪ r03).  Round 4 rotates the
# window onto 50 of the 55 queries that have never received a driver
# CORRECTNESS row; the remaining 5 (struct_roundtrip, map_ops,
# explode_words, array_set_ops, pct_of_total) head the round-5 window.
# Every query still runs in tools/check.py locally regardless of order.
#
# Layout after reorder:
#   slots 1-50   : _DRIVER_WINDOW_R4 (never driver-checked; round-3
#                  analytics family first, then round-2 leftovers)
#   slots 51-55  : the 5 remaining never-driver-checked queries
#   slots 56+    : the 98 cumulative driver-green queries
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_R4 = [
    "kmeans_clusters", "impute_timeseries", "segment_dedup",
    "unigram_lm_quality", "q21_waiting_suppliers", "knn_classify",
    "entity_resolution", "token_shards", "correlation_matrix",
    "ann_topk_ivf", "window_rank_stats", "string_agg_sorted",
    "window_first_last", "window_ntile", "topk_ties",
    "conditional_agg", "unpivot_metrics", "date_spine",
    "json_typed_extract", "table_diff", "scd2_intervals",
    "gaps_islands", "regexp_extract_numbers", "contamination_check",
    "boilerplate_ngrams", "pii_redact", "corpus_shuffle",
    "sequence_packing", "referential_audit", "percentile_grid",
    "column_profile", "user_lifetime_stats", "rfm_segments",
    "label_coherence", "tokenize_to_ids", "audio_stats",
    "quality_monitor_batch", "anomaly_hours", "incremental_agg_merge",
    "equal_freq_binning", "mad_outliers", "weighted_sample",
    "vocab_build", "minmax_normalize", "ols_simple_regression",
    "equal_width_binning", "spearman_corr", "crosstab_chi2",
    "source_quality_rollup", "mixture_by_lang",
]

# Queries driver-verified green in CORRECTNESS_r01/r02/r03 (cumulative).
_DRIVER_GREEN_R123 = [
    "json_extract", "q12_priority_class", "concat_uniquify",
    "q4_order_priority", "q6_forecast_revenue", "q7_nation_volume",
    "q8_market_share", "q10_returned_items", "q13_custdist",
    "q14_promo_revenue", "q15_top_supplier", "q17_small_qty_revenue",
    "q18_large_orders", "q19_disjunctive", "q22_idle_balance",
    "asof_join_events", "asof_forward_events", "range_join_events",
    "moment_stats", "corr_stats", "ann_topk_lsh",
    "embedding_neardup_lsh", "hash_split_stats", "stratified_sample_stats",
    "zscore_normalize", "iqr_outliers", "salted_join_skew",
    "bucketed_join", "upsert_orders", "events_dedup_latest",
    "argmax_per_group", "fuzzy_match_names", "tfidf_top_terms",
    "chunk_documents", "doc_repetition", "quality_filter_flags",
    "multimodal_meta", "video_frame_sample", "session_windows_batch",
    "sliding_windows_batch", "funnel_analysis", "cohort_retention",
    "window_range_frame", "approx_aggregates", "registry_functions",
    "rearrange_cellfactory", "pivot_returns", "component_stats",
    "simple_linear_workflow", "partition_pruned_scan", "q1_pricing_summary",
    "select_project_map", "filter_rows", "slice_rows",
    "multi_slice", "concatenate_union", "append_hstack",
    "row_index", "cast_spec", "missing_value_columns",
    "join_customer_orders", "sort_topk", "distinct_rows",
    "window_topk_per_group", "join_semi", "join_anti",
    "join_left_outer", "q3_shipping_priority", "q5_local_supplier",
    "rollup_returns", "cube_orders", "grouping_sets",
    "set_intersect", "set_except", "union_distinct",
    "window_running_sum", "window_lag_lead", "window_moving_avg",
    "count_distinct_agg", "percentile_stats", "collect_sorted",
    "string_funcs", "date_funcs", "math_funcs",
    "case_when_buckets", "events_hourly", "domain_stats",
    "concat_regenerate", "text_stats", "text_quality_lang",
    "dedup_exact", "dedup_minhash_lsh", "dedup_simhash",
    "ngram_jaccard", "neardup_pipeline", "neardup_clusters",
    "embedding_neardup", "ann_topk",
]


def _apply_driver_window() -> None:
    """Reorder QUERIES/ORACLES: window first, unchecked next, greens last."""
    assert len(_DRIVER_WINDOW_R4) == 50, len(_DRIVER_WINDOW_R4)
    missing = [n for n in _DRIVER_WINDOW_R4 if n not in QUERIES]
    assert not missing, f"driver window names not registered: {missing}"
    window = set(_DRIVER_WINDOW_R4)
    greens = set(_DRIVER_GREEN_R123)
    rest_unchecked = [n for n in QUERIES if n not in window and n not in greens]
    rest_green = [n for n in QUERIES if n in greens and n not in window]
    order = _DRIVER_WINDOW_R4 + rest_unchecked + rest_green
    assert len(order) == len(QUERIES)
    # in-place reorder — see _reorder_for_window (layout_r5.py) for why
    # rebinding would break the post-split shared-dict aliasing
    q = {n: QUERIES[n] for n in order}
    o = {n: ORACLES[n] for n in order if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(q)
    ORACLES.clear()
    ORACLES.update(o)


_apply_driver_window()


# ---------------------------------------------------------------------------
# ROUND-5 PLAYBOOK — EXECUTED (round 5, after CORRECTNESS_r04 landed
# 50/50 green): `apply_round5_layout()` now runs at import time (bottom
# of this module). It registers the staged r5+r6 batches and rotates the
# driver window onto _DRIVER_WINDOW_R5 (50 slots: 5 never-driver-checked
# leftovers + 5 round-4 registrations + 10 freshly staged r5/r6 names +
# 30 rotation greens — see the list itself, which is the source of
# truth). _DRIVER_WINDOW_R4 is treated as green (folded into the greens
# set inside apply_round5_layout).
# Burn-down schedule (committed in README §Staging): R7+R8 flip in
# round 6, R9 in round 7 — zero `_R*_STAGED` dicts left by round 7.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Round-5 STAGED registrations — implemented, tested, and oracle-gated in
# pytest THIS round, but kept OUT of QUERIES to honor the driver-coverage
# freeze (VERDICT r3 next-round #2: ≤5 new registered queries per round
# until cumulative driver coverage catches up; round 4's five were
# avro_roundtrip, event_transitions, neardup_pagerank, pq_topk_adc,
# zorder_layout). Round 5: call register_r5_queries(force=True) at import
# time (replace the guarded call at the bottom) and fold these names into
# the round-5 driver window.
