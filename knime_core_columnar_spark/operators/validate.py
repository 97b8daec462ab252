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
