"""Missing-value imputation over ordered series — the KNIME "Missing
Value" node's strategy set (previous/next value, linear interpolation,
fixed value, column mean; org.knime.base missing-value handlers run ON
the columnar backend, reference parity at the capability level),
re-expressed as Spark window/aggregate expressions.

Every strategy is a pure Catalyst expression over two frame-bounded
windows per partition key — one forward, one backward — so the whole
family runs in a single window stage (one shuffle on the partition key,
sorted once; Spark fuses same-spec windows). No UDFs, no iteration.

Determinism: forward/backward fills move existing values (no float
arithmetic at all); linear interpolation and mean do closed-form double
math from exact anchors (positions are ints, the mean divides a
decimal-exact sum), so results are bit-stable at any parallelism and
oracle-checkable in SQL (IGNORE NULLS window functions exist in both
engines).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["impute"]

_STRATEGIES = ("previous", "next", "linear", "mean", "fixed")


def impute(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_cols: Sequence[str] = (),
    strategy: str = "previous",
    output_col: str | None = None,
    fill_value: float | None = None,
) -> DataFrame:
    """Append ``output_col`` (default ``{value_col}_imputed``) with NULLs
    replaced per ``strategy``:

    - ``previous``: last non-null earlier in the series (forward fill);
      leading NULLs stay NULL.
    - ``next``: first non-null later in the series (backward fill);
      trailing NULLs stay NULL.
    - ``linear``: interpolate between the nearest non-null anchors using
      ``order_col`` as the x-axis; before the first / after the last
      anchor falls back to the nearest anchor value.
    - ``mean``: partition mean of the non-null values (decimal-exact
      sum, so the same value at any partitioning).
    - ``fixed``: ``fill_value``.

    Series are ordered by ``order_col`` within ``partition_cols`` (empty
    = one global series: fine for `previous`/`next`/`linear` only when
    the data legitimately fits one sorted run; prefer a partition key at
    scale so the window shuffles instead of single-tasking).
    """
    if strategy not in _STRATEGIES:
        raise ValueError(f"strategy must be one of {_STRATEGIES}, got {strategy!r}")
    out = output_col or f"{value_col}_imputed"
    v = F.col(value_col)
    parts = [F.col(c) for c in partition_cols]

    if strategy == "fixed":
        if fill_value is None:
            raise ValueError("strategy='fixed' requires fill_value")
        return df.withColumn(out, F.coalesce(v, F.lit(fill_value)))

    if strategy == "mean":
        w_all = Window.partitionBy(*parts)
        mean = F.sum(v.cast("decimal(28,6)")).over(w_all).cast("double") / F.count(
            v
        ).over(w_all)
        return df.withColumn(out, F.coalesce(v, F.round(mean, 6)))

    wf = (
        Window.partitionBy(*parts)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wb = (
        Window.partitionBy(*parts)
        .orderBy(F.col(order_col))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(wf)
    next_v = F.first(v, ignorenulls=True).over(wb)
    if strategy == "previous":
        return df.withColumn(out, F.coalesce(v, prev_v))
    if strategy == "next":
        return df.withColumn(out, F.coalesce(v, next_v))

    # linear: anchor positions ride the same two windows as the values
    x = F.col(order_col).cast("double")
    prev_x = F.last(F.when(v.isNotNull(), x), ignorenulls=True).over(wf)
    next_x = F.first(F.when(v.isNotNull(), x), ignorenulls=True).over(wb)
    interp = prev_v + (next_v - prev_v) * (x - prev_x) / (next_x - prev_x)
    filled = (
        F.when(v.isNotNull(), v)
        .when(prev_v.isNull(), next_v)  # before first anchor
        .when(next_v.isNull(), prev_v)  # after last anchor
        .otherwise(F.round(interp, 6))
    )
    return df.withColumn(out, filled)
