"""Round-5 window + the shared _reorder_for_window + apply_round5_layout.

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

# ---------------------------------------------------------------------------
# ROUND-5 WINDOW — ACTIVE since round 5 (CORRECTNESS_r04 landed 50/50
# green, so _DRIVER_WINDOW_R4 is folded into the greens set here).
# `apply_round5_layout()` is invoked at the bottom of this module.
# ---------------------------------------------------------------------------

_DRIVER_WINDOW_R5 = [
    # the 5 never-driver-checked leftovers (head of the round-5 window)
    "struct_roundtrip", "map_ops", "explode_words", "array_set_ops",
    "pct_of_total",
    # the round-4 registrations (driver-checkable for the first time)
    "avro_roundtrip", "event_transitions", "neardup_pagerank",
    "pq_topk_adc", "zorder_layout",
    # the staged r5+r6 batches, folded in by apply_round5_layout()
    "semantic_dedup", "bigram_lm_quality", "decontaminate_bloom",
    "stream_stream_join_batch", "bpe_merges",
    "heavy_hitter_tokens", "table_checksums", "copurchase_triangles",
    "duplicate_span_profile", "hybrid_search_rrf",
    # 30 rotation greens (oldest driver evidence first: r01-era queries
    # whose CORRECTNESS rows predate two rounds of refactoring)
    "q1_pricing_summary", "select_project_map", "filter_rows",
    "slice_rows", "multi_slice", "concatenate_union", "append_hstack",
    "row_index", "cast_spec", "missing_value_columns",
    "join_customer_orders", "sort_topk", "distinct_rows",
    "window_topk_per_group", "join_semi", "join_anti",
    "join_left_outer", "q3_shipping_priority", "q5_local_supplier",
    "rollup_returns", "cube_orders", "grouping_sets",
    "set_intersect", "set_except", "union_distinct",
    "window_running_sum", "window_lag_lead", "window_moving_avg",
    "count_distinct_agg", "percentile_stats",
]


def _reorder_for_window(window_names: list[str], greens: set[str]) -> None:
    """Reorder QUERIES/ORACLES: window first, then never-checked, then
    greens — the same layout contract as _apply_driver_window."""
    missing = [n for n in window_names if n not in QUERIES]
    assert not missing, f"driver window names not registered: {missing}"
    window = set(window_names)
    rest_unchecked = [
        n for n in QUERIES if n not in window and n not in greens
    ]
    rest_green = [n for n in QUERIES if n in greens and n not in window]
    order = window_names + rest_unchecked + rest_green
    assert len(order) == len(QUERIES)
    # reorder IN PLACE (clear+update re-inserts in the new order): since
    # the round-6 package split every section module and the package
    # namespace alias the same dict objects, so rebinding here would
    # leave stale references everywhere else
    q = {n: QUERIES[n] for n in order}
    o = {n: ORACLES[n] for n in order if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(q)
    ORACLES.clear()
    ORACLES.update(o)


def apply_round5_layout() -> None:
    """Round-5 flip: fold the staged r5+r6 batches into the catalog and
    rotate the driver window onto _DRIVER_WINDOW_R5 (50 slots: 5
    leftovers + 5 round-4 registrations + 10 freshly staged + 30
    rotation greens)."""
    register_r5_queries(force=True)
    register_r6_queries(force=True)
    assert len(_DRIVER_WINDOW_R5) == 50, len(_DRIVER_WINDOW_R5)
    _reorder_for_window(
        _DRIVER_WINDOW_R5,
        set(_DRIVER_GREEN_R123) | set(_DRIVER_WINDOW_R4),
    )


