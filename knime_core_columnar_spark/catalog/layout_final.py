"""Round-6/7 windows and layout flips (apply_round6_layout runs at import).

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

from knime_core_columnar_spark.catalog.layout_r4 import (  # noqa: F401
    _DRIVER_GREEN_R123,
    _DRIVER_WINDOW_R4,
)
from knime_core_columnar_spark.catalog.staged_r5 import (  # noqa: F401
    register_r5_queries,
)
from knime_core_columnar_spark.catalog.staged_r6 import (  # noqa: F401
    register_r6_queries,
)
from knime_core_columnar_spark.catalog.staged_r7 import (  # noqa: F401
    register_r7_queries,
)
from knime_core_columnar_spark.catalog.staged_r8 import (  # noqa: F401
    register_r8_queries,
)
from knime_core_columnar_spark.catalog.layout_r5 import (  # noqa: F401
    _DRIVER_WINDOW_R5,
    _reorder_for_window,
)
from knime_core_columnar_spark.catalog.staged_r9 import (  # noqa: F401
    register_r9_queries,
)

# ---------------------------------------------------------------------------
# ROUND-7 PRE-STAGING — dormant until the round-7 flip (after
# CORRECTNESS_r06 lands green): replace the `apply_round6_layout()`
# call at the bottom of this module with `apply_round7_layout()`. That
# registers the R9 batch (all earlier batches re-applied first) and
# rotates the window onto the 20 R9 names + the 12 round-6 in-round
# additions (all 32 getting their FIRST driver check) + 18 rotation
# greens drawn from rows NOT in the r5/r6 windows — after this flip,
# zero `_R*_STAGED` dicts remain and every implemented operator is
# driver-registered.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_R7 = [
    # the staged r9 batch, registered by apply_round7_layout()
    'benford_audit', 'calibration_report', 'cdc_apply_changelog',
    'concentration_profile', 'containment_quotes', 'curriculum_order',
    'diverse_sample', 'drift_monitor_batch', 'dup_span_apply',
    'dup_span_extract', 'fix_mojibake', 'k_anonymity_audit',
    'leakage_safe_split', 'mojibake_audit', 'normalize_text',
    'numeric_drift_report', 'resample_ffill', 'resample_interp',
    'token_budget_plan', 'token_fertility',
    # 12 round-6 in-round additions (catalog/round6_ext.py): registered
    # after the round-6 flip, so round 7 is their FIRST driver check —
    # they take the twelve newest rotation-green slots (pii_redact,
    # corpus_shuffle, sequence_packing, referential_audit,
    # regexp_extract_numbers, contamination_check, boilerplate_ngrams,
    # gaps_islands, scd2_intervals, table_diff, json_typed_extract,
    # date_spine move to the round-8 rotation pool)
    'bm25_topk', 'embedding_covariance', 'collocations_pmi',
    'cross_source_duplication', 'vocab_growth_stats',
    'temporal_split_embargo', 'phash_near_dup', 'retrieval_rbo',
    'rm3_expanded_search', 'contrastive_pairs', 'image_header_meta',
    'bitext_mining',
    # 18 rotation greens: driver-green rows absent from the r5 AND r6
    # windows (longest-unchecked first by catalog order)
    'kmeans_clusters', 'impute_timeseries', 'segment_dedup',
    'unigram_lm_quality', 'q21_waiting_suppliers', 'knn_classify',
    'entity_resolution', 'token_shards', 'correlation_matrix',
    'ann_topk_ivf', 'window_rank_stats', 'string_agg_sorted',
    'window_first_last', 'window_ntile', 'topk_ties', 'conditional_agg',
    'unpivot_metrics',
    # doc_repetition's rotation slot moved here from the r6 window
    # (displaced by bpe_encode); percentile_grid keeps its r0x green row
    'doc_repetition',
]


def apply_round7_layout() -> None:
    """Round-7 flip: register every staged batch and rotate the driver
    window onto _DRIVER_WINDOW_R7 (50 slots: 20 R9 + 12 round-6
    in-round first-time checks + 18 rotation greens). Greens =
    everything driver-checked through round 6."""
    register_r5_queries(force=True)
    register_r6_queries(force=True)
    register_r7_queries(force=True)
    register_r8_queries(force=True)
    register_r9_queries(force=True)
    assert len(_DRIVER_WINDOW_R7) == 50, len(_DRIVER_WINDOW_R7)
    _reorder_for_window(
        _DRIVER_WINDOW_R7,
        set(_DRIVER_GREEN_R123)
        | set(_DRIVER_WINDOW_R4)
        | set(_DRIVER_WINDOW_R5)
        | set(_DRIVER_WINDOW_R6),
    )

# Round-6 flip (executed per the ROUND-6 PLAYBOOK below): register the
# staged R7+R8 batches and rotate the driver window onto
# _DRIVER_WINDOW_R6. Runs at import time so the driver's `queries()`
# sees the rotated 50-name head. NOTE: apply_round6_layout() is defined
# below; the call is deferred to the bottom of the module.


# ---------------------------------------------------------------------------
# ROUND-6 PLAYBOOK (for the next session, once CORRECTNESS_r05 lands
# green): one-line flip — replace the `apply_round5_layout()` call above
# with `apply_round6_layout()`. That registers the staged R7+R8 batches
# (atop R5+R6, which apply_round6_layout re-applies first) and rotates
# the window onto _DRIVER_WINDOW_R6: the 15 R7+R8 names (first driver
# check; includes round-5's gopher_rules + c4_line_filter + dsir_select
# + url_host_stats + incremental_dedup_admit additions)
# + 35 rotation greens whose driver evidence is oldest (r02-era,
# not already re-checked by the round-5 rotation). After round 5 every
# registered name has a driver row, so there are no never-checked
# leftovers. Round 7 then registers R9 (register_r9_queries(force=True))
# and the staging program is complete — see README §Staging.
# test_round6_layout_prestaged pins the mechanics.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_R6 = [
    # the staged r7+r8 batches, registered by apply_round6_layout()
    'cms_frequency', 'gopher_rules', 'c4_line_filter',
    'set_similarity_join', 'golden_record',
    'source_quota_sample', 'cluster_consensus_lang', 'join_explosion_profile',
    'source_similarity', 'length_bucketed_batches', 'novelty_scores',
    'stream_quota_admission', 'dsir_select', 'url_host_stats',
    'incremental_dedup_admit',
    # 16th first-time check, added in-round per VERDICT r5 #4: the
    # hash-checkable encode companion to the oracle-less bpe_merges
    'bpe_encode',
    # 34 rotation greens, oldest driver evidence first (r02-era rows
    # that were not part of the round-5 rotation). doc_repetition's
    # re-check moved to the round-7 window to make room for bpe_encode.
    'json_extract', 'q12_priority_class',
    'concat_uniquify', 'q4_order_priority', 'q6_forecast_revenue',
    'q7_nation_volume', 'q8_market_share', 'q10_returned_items',
    'q13_custdist', 'q14_promo_revenue', 'q15_top_supplier',
    'q17_small_qty_revenue', 'q18_large_orders', 'q19_disjunctive',
    'q22_idle_balance', 'asof_join_events', 'asof_forward_events',
    'range_join_events', 'moment_stats', 'corr_stats',
    'ann_topk_lsh', 'embedding_neardup_lsh', 'hash_split_stats',
    'stratified_sample_stats', 'zscore_normalize', 'iqr_outliers',
    'salted_join_skew', 'bucketed_join', 'upsert_orders',
    'events_dedup_latest', 'argmax_per_group', 'fuzzy_match_names',
    'tfidf_top_terms', 'chunk_documents',
]


def apply_round6_layout() -> None:
    """Round-6 flip: register the staged r7+r8 batches (r5+r6 first, for
    call-order independence) and rotate the driver window onto
    _DRIVER_WINDOW_R6 (50 slots: 15 freshly staged + 35 rotation
    greens). Greens = everything driver-checked through round 5."""
    register_r5_queries(force=True)
    register_r6_queries(force=True)
    register_r7_queries(force=True)
    register_r8_queries(force=True)
    assert len(_DRIVER_WINDOW_R6) == 50, len(_DRIVER_WINDOW_R6)
    _reorder_for_window(
        _DRIVER_WINDOW_R6,
        set(_DRIVER_GREEN_R123)
        | set(_DRIVER_WINDOW_R4)
        | set(_DRIVER_WINDOW_R5),
    )


# Round-7 flip (executed round 7, per the pre-staged playbook above):
# register ALL staged batches (R5..R9) and rotate the driver window onto
# _DRIVER_WINDOW_R7. Runs at import time so the driver's `queries()`
# sees the rotated 50-name head. After this flip every implemented
# query is registered; the staging program is complete.
apply_round7_layout()
