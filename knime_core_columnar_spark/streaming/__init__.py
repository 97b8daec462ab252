"""Structured Streaming surface (SURVEY.md §2.7 / Phase 6).

The reference has no streaming abstractions (its closest analogue is the
partial-file-read-while-writing path, OffHeapArrowPartialFileBatchReadable
— a reader observing a growing table). Per the north star, this module
supplies the streaming capability Spark-natively: file/rate sources,
watermarked tumbling/sliding/session windows, streaming dedup, and a
custom stateful operator via applyInPandasWithState. Each transformation
is written against a plain DataFrame so the SAME code runs in batch mode
(the catalog's batch twins are the correctness oracle) and in streaming
mode via readStream."""

from knime_core_columnar_spark.streaming.ops import (
    build_neardup_index,
    corpus_quality_monitor,
    hourly_counts,
    session_windows,
    sliding_window_agg,
    stream_from_directory,
    streaming_dedup,
    streaming_drift_monitor,
    streaming_neardup,
    stateful_running_totals,
    stream_stream_interval_join,
    streaming_asof_enrich,
    tumbling_window_agg,
    trending_tokens,
    windowed_token_counts,
)

__all__ = [
    "stream_from_directory",
    "windowed_token_counts",
    "trending_tokens",
    "corpus_quality_monitor",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_windows",
    "streaming_dedup",
    "streaming_drift_monitor",
    "streaming_neardup",
    "build_neardup_index",
    "stateful_running_totals",
    "stream_stream_interval_join",
    "streaming_asof_enrich",
    "hourly_counts",
]
