"""Declarative data-validation suite — the KNIME Table Validator /
deequ-style constraint checks a production table pipeline runs before
publishing data (and that a 100 TB ingest runs BEFORE burning a training
epoch on malformed rows).

Checks are declared as small specs and compiled into as few jobs as the
check mix allows:

- all ROW-LEVEL checks (not_null, in_range, matches_regex,
  accepted_values, row_count) fuse into ONE partially-aggregated scan —
  one violation-sum per check, unpivoted from the single aggregate row;
- each ``unique`` check is one hash aggregation on its key columns
  (violations = rows beyond the first per duplicate key);
- each ``fk_exists`` check is one anti-join against the parent keys
  (broadcast when the parent is small — Catalyst/AQE decides).

The report is a normal lazy DataFrame — union it across tables, store it
next to the data, alert on it with the streaming monitors.

Reference analogue: the reference enforces exactly two invariants at
write time (RowID uniqueness via DuplicateCheckWritable and domain
bounds via DomainWritable — org.knime.core.data.columnar.table's write
pipeline); this generalizes the idea to user-declared constraints.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "not_null", "unique", "in_range", "matches_regex", "accepted_values",
    "row_count_between", "fk_exists", "validate",
]


@dataclass(frozen=True)
class _Check:
    name: str
    kind: str
    cols: tuple = ()
    lo: float | None = None
    hi: float | None = None
    pattern: str | None = None
    values: tuple = ()
    parent: DataFrame | None = field(default=None, compare=False)
    parent_cols: tuple = ()


def not_null(*cols: str) -> _Check:
    return _Check(f"not_null({','.join(cols)})", "not_null", tuple(cols))


def unique(*cols: str) -> _Check:
    return _Check(f"unique({','.join(cols)})", "unique", tuple(cols))


def in_range(col: str, lo=None, hi=None) -> _Check:
    return _Check(f"in_range({col},{lo},{hi})", "in_range", (col,), lo, hi)


def matches_regex(col: str, pattern: str) -> _Check:
    return _Check(f"matches_regex({col})", "regex", (col,), pattern=pattern)


def accepted_values(col: str, values: Sequence) -> _Check:
    return _Check(
        f"accepted_values({col})", "accepted", (col,), values=tuple(values)
    )


def row_count_between(lo: int, hi: int | None = None) -> _Check:
    return _Check(f"row_count_between({lo},{hi})", "row_count", lo=lo, hi=hi)


def fk_exists(cols: Sequence[str], parent: DataFrame, parent_cols: Sequence[str]) -> _Check:
    return _Check(
        f"fk_exists({','.join(cols)})", "fk", tuple(cols),
        parent=parent, parent_cols=tuple(parent_cols),
    )


def _violation_expr(c: _Check) -> Column:
    """Row-level violation predicate (NULL-safe: a NULL never *passes* a
    value constraint silently — except in_range/regex/accepted treat
    NULL as 'not checked' so not_null stays a separate, explicit check)."""
    if c.kind == "not_null":
        v = None
        for col in c.cols:
            e = F.col(col).isNull()
            v = e if v is None else v | e
        return v
    col = F.col(c.cols[0])
    if c.kind == "in_range":
        v = F.lit(False)
        if c.lo is not None:
            v = v | (col < F.lit(c.lo))
        if c.hi is not None:
            v = v | (col > F.lit(c.hi))
        return col.isNotNull() & v
    if c.kind == "regex":
        return col.isNotNull() & ~col.cast("string").rlike(c.pattern)
    if c.kind == "accepted":
        return col.isNotNull() & ~col.isin(list(c.values))
    raise AssertionError(c.kind)


def validate(df: DataFrame, checks: Sequence[_Check]) -> DataFrame:
    """Run the check suite; returns one row per check:
    (check, status 'pass'|'fail', n_violations, n_rows)."""
    row_level = [c for c in checks if c.kind in
                 ("not_null", "in_range", "regex", "accepted", "row_count")]
    aggs = [F.count(F.lit(1)).cast("long").alias("__n")]
    names = []
    for i, c in enumerate(row_level):
        if c.kind == "row_count":
            continue
        aggs.append(
            F.sum(_violation_expr(c).cast("long")).cast("long").alias(f"__v{i}")
        )
        names.append((i, c.name))
    one = df.agg(*aggs)

    pairs = []
    for i, name in names:
        pairs += [f"'{name}'", f"coalesce(__v{i}, 0)"]
    for c in row_level:
        if c.kind == "row_count":
            hi = "9223372036854775807" if c.hi is None else str(int(c.hi))
            viol = (
                f"CAST(CASE WHEN __n BETWEEN {int(c.lo)} AND {hi} "
                f"THEN 0 ELSE 1 END AS BIGINT)"
            )
            pairs += [f"'{c.name}'", viol]
    frames = []
    if pairs:
        k = len(pairs) // 2
        frames.append(
            one.selectExpr(
                "__n",
                f"stack({k}, {', '.join(pairs)}) AS (check, n_violations)",
            ).select(
                "check",
                F.col("n_violations").cast("long").alias("n_violations"),
                F.col("__n").alias("n_rows"),
            )
        )

    n_rows = F.broadcast(df.agg(F.count(F.lit(1)).alias("n_rows")))
    for c in checks:
        if c.kind == "unique":
            dups = (
                df.groupBy(*c.cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .filter(F.col("__c") > 1)
            )
            v = dups.agg(
                F.coalesce(F.sum(F.col("__c") - 1), F.lit(0))
                .cast("long")
                .alias("n_violations")
            )
            frames.append(
                v.withColumn("check", F.lit(c.name)).crossJoin(n_rows).select(
                    "check", "n_violations", "n_rows"
                )
            )
        elif c.kind == "fk":
            child = df.select(
                *[F.col(a).alias(b) for a, b in zip(c.cols, c.parent_cols)]
            ).na.drop()
            orphans = child.join(
                c.parent.select(*c.parent_cols).distinct(),
                list(c.parent_cols),
                "left_anti",
            )
            v = orphans.agg(
                F.count(F.lit(1)).cast("long").alias("n_violations")
            )
            frames.append(
                v.withColumn("check", F.lit(c.name)).crossJoin(n_rows).select(
                    "check", "n_violations", "n_rows"
                )
            )

    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionByName(f_)
    return out.select(
        "check",
        F.when(F.col("n_violations") == 0, "pass").otherwise("fail").alias(
            "status"
        ),
        "n_violations",
        "n_rows",
    )


def benford_digit_audit(
    df: DataFrame, cols: Sequence[str], scale: int = 1_000_000
) -> DataFrame:
    """First-significant-digit audit against Benford's law — the
    fabricated/synthetic-amount forensic: naturally occurring amounts
    follow P(d) = log10(1 + 1/d); invented ones rarely do.

    Exactness discipline: values are taken through DECIMAL(18,2) (an
    exact representation, no float-to-string drift), the first digit is
    the first character of the integer-cents string, and the expected
    counts are n × log10(1+1/d) with the log10 constants inlined as
    compile-time double literals — both engines multiply the identical
    pair of doubles, so floor(micro-units) is engine-exact (the same
    IEEE argument as quota_sample's sqrt).

    One pass per audited column over a stacked projection (no joins),
    partial-aggregated. Returns (column, digit, n_observed,
    expected_micro) with expected_micro = floor(n_col × P(d) × scale).
    """
    import math

    stacked = None
    for c in cols:
        cents = F.abs(
            (F.col(c).cast("decimal(18,2)") * 100).cast("decimal(20,0)")
        )
        part = df.select(
            F.lit(c).alias("column"),
            F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"),
        ).filter(F.col("digit") >= 1)
        stacked = part if stacked is None else stacked.unionByName(part)
    obs = stacked.groupBy("column", "digit").agg(
        F.count(F.lit(1)).alias("n_observed")
    )
    totals = obs.groupBy("column").agg(F.sum("n_observed").alias("__n"))
    probs = F.create_map(
        *[
            x
            for d in range(1, 10)
            for x in (F.lit(d), F.lit(math.log10(1.0 + 1.0 / d)))
        ]
    )
    return (
        obs.join(totals, "column")
        .select(
            "column",
            "digit",
            F.col("n_observed").cast("long").alias("n_observed"),
            F.floor(
                F.col("__n").cast("double")
                * probs[F.col("digit")]
                * F.lit(float(scale))
            ).cast("long").alias("expected_micro"),
        )
    )


def k_anonymity_audit(
    df: DataFrame, quasi_cols: Sequence[str], k: int = 5
) -> DataFrame:
    """k-anonymity audit over quasi-identifier combinations — the
    privacy gate for releasing or training on tabular data: any
    combination of quasi-identifiers shared by fewer than ``k`` rows
    re-identifies those rows. One hash aggregation on the
    quasi-identifier tuple (the same shape as the duplicate check);
    nothing row-level leaves the executors.

    Returns a one-row report: (n_rows, n_groups, k_min, n_violating_groups,
    n_rows_at_risk) — n_rows_at_risk is the count of rows living in
    sub-k groups, the number a release would expose."""
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("__n")
    )
    return groups.agg(
        F.sum("__n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.min("__n").cast("long").alias("k_min"),
        F.sum((F.col("__n") < k).cast("long")).cast("long")
        .alias("n_violating_groups"),
        F.sum(F.when(F.col("__n") < k, F.col("__n")).otherwise(0))
        .cast("long").alias("n_rows_at_risk"),
    )


def concentration_profile(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column value-concentration profile in EXACT integers — the
    skew/imbalance audit (is one label/status/category dominating?)
    without entropy's cross-engine ln() hazard: report n, distinct
    count, Σ count², and the top count; Gini impurity
    1 − Σ(nᵢ/N)² = (N² − Σnᵢ²)/N² and top-share are exact rationals a
    consumer derives from these integers.

    One hash aggregation per audited column (each reuses the scan via
    Spark's shared-scan scheduling when actions align); no windows, no
    collect. Returns (column, n_rows, n_distinct, sum_sq_counts,
    top_count). ``sum_sq_counts`` is accumulated in decimal(38,0) and
    emitted as its exact decimal STRING: a single category holding
    > ~3e9 rows (realistic for a 100 TB status column) makes count²
    exceed int64, so the squares are widened to decimal BEFORE
    multiplication — the same overflow discipline as table_fingerprint —
    and the string rendering keeps the value exact (and engine-portable:
    pandas coerces wide decimals to lossy float64) past 2⁶³."""
    out = None
    for c in cols:
        counts = (
            df.filter(F.col(c).isNotNull())
            .groupBy(F.col(c))
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        n_dec = F.col("__n").cast("decimal(19,0)")
        prof = counts.agg(
            F.sum("__n").cast("long").alias("n_rows"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.sum(n_dec * n_dec).cast("decimal(38,0)").cast("string")
            .alias("sum_sq_counts"),
            F.max("__n").cast("long").alias("top_count"),
        ).select(F.lit(c).alias("column"), "n_rows", "n_distinct",
                 "sum_sq_counts", "top_count")
        out = prof if out is None else out.unionByName(prof)
    return out


def drift_bin(v: Column, lo: float, hi: float, n_bins: int) -> Column:
    """The shared fixed-edge bin id (int64): -1 = underflow, ``n_bins``
    = overflow, 0..n_bins-1 equal-width in [lo, hi). The in-range floor
    is clamped to n_bins-1: width = (hi-lo)/n is inexact for most
    ranges, so a value just below hi could floor to n — the dedicated
    overflow id — without the clamp (same guard as
    calibration_report). One definition so the batch report and the
    streaming monitor can never bin differently."""
    width = (hi - lo) / n_bins
    return (
        F.when(v < lo, F.lit(-1))
        .when(v >= hi, F.lit(n_bins))
        .otherwise(
            F.least(
                F.lit(n_bins - 1),
                F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"),
            )
        )
    ).cast("long")


def bin_shares(
    df: DataFrame, col: str, lo: float, hi: float, n_bins: int
) -> DataFrame:
    """(bin, ref_pct): the fixed-edge share distribution of a numeric
    column — the reference frame every ``streaming_drift_monitor``
    caller needs. One definition (next to ``drift_bin``) so the
    reference and the monitored stream can never bin or round
    differently."""
    v = F.col(col).cast("double")
    rb = (
        df.filter(v.isNotNull())
        .groupBy(drift_bin(v, lo, hi, n_bins).alias("bin"))
        .agg(F.count(F.lit(1)).alias("__n"))
    )
    rt = rb.agg(F.sum("__n").alias("__t"))
    return rb.crossJoin(F.broadcast(rt)).select(
        "bin", F.round(F.col("__n") / F.col("__t"), 6).alias("ref_pct")
    )


def numeric_drift_report(
    old: DataFrame,
    new: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Distribution-drift audit between two snapshots of a numeric
    column — the per-bin table behind PSI / KL drift monitors. Values
    bucket into ``n_bins`` equal-width bins over the FIXED range
    [lo, hi) plus underflow (-1) and overflow (``n_bins``) bins; fixed
    edges, not quantiles, so the binning is deterministic and
    engine-portable (approx-quantile edges differ per engine and per
    run — they would unpin the oracle AND make two monitoring runs
    incomparable, which defeats drift monitoring).

    Returns one row per non-empty bin: (bin, n_old, n_new, pct_old,
    pct_new, pct_diff) with exact int64 counts and single-IEEE-division
    percentages. PSI = Σ (pct_new − pct_old)·ln(pct_new/pct_old) is
    left to the consumer (ln() on smoothed ratios is policy — smoothing
    epsilon and zero-bin handling vary by shop — while the counts are
    facts).

    Scale shape: one partially-aggregated groupBy per snapshot
    (n_bins+2 rows each), full-outer merged on the bin id — no windows,
    no corpus joins. NULLs are excluded (they are a missingness metric,
    not a distribution value; ``not_null`` audits them)."""
    def binned(df: DataFrame, out: str) -> DataFrame:
        v = F.col(col).cast("double")
        return (
            df.filter(v.isNotNull())
            .groupBy(drift_bin(v, lo, hi, n_bins).alias("bin"))
            .agg(F.count(F.lit(1)).alias(out))
        )
    o = binned(old, "n_old")
    n = binned(new, "n_new")
    merged = o.join(n, "bin", "full_outer").select(
        "bin",
        F.coalesce("n_old", F.lit(0)).alias("n_old"),
        F.coalesce("n_new", F.lit(0)).alias("n_new"),
    )
    tot = merged.agg(
        F.sum("n_old").alias("__to"), F.sum("n_new").alias("__tn")
    )
    return merged.crossJoin(F.broadcast(tot)).select(
        "bin",
        "n_old",
        "n_new",
        F.round(F.col("n_old") / F.col("__to"), 6).alias("pct_old"),
        F.round(F.col("n_new") / F.col("__tn"), 6).alias("pct_new"),
        F.round(
            F.col("n_new") / F.col("__tn") - F.col("n_old") / F.col("__to"), 6
        ).alias("pct_diff"),
    )
