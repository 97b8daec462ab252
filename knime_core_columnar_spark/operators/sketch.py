"""Mergeable summary sketches for corpus-scale frequency questions.

Complements ``sampling.hll_shard_sketches`` (distinct counts) with the
frequency side: Misra-Gries heavy hitters with an exact-recount second
pass, so the FINAL answer is exact (oracle-comparable) while the scan
that finds candidates keeps only O(capacity) state per partition.

The reference engine has no sketch surface (its statistics are the
exact per-column domains of ``DomainWritable``,
``org.knime.core.data.columnar.domain``); these exist for the
training-data workloads the engine targets — top-token audits,
vocabulary pruning, boilerplate screens — where a full GROUP BY over a
100 TB token explosion is the thing to avoid.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mg_partition(
    batches: Iterator[pd.DataFrame], capacity: int
) -> Iterator[pd.DataFrame]:
    """Misra-Gries over one partition's key stream: at most ``capacity``
    (key, undercount) survivors. Classic guarantee: any key with local
    frequency > n_p/(capacity+1) is present in the summary."""
    counters: dict = {}
    for pdf in batches:
        for k in pdf["__key"]:
            if k in counters:
                counters[k] += 1
            elif len(counters) < capacity:
                counters[k] = 1
            else:
                dead = [c for c, v in counters.items() if v == 1]
                for c in counters:
                    counters[c] -= 1
                for c in dead:
                    del counters[c]
    yield pd.DataFrame(
        {"__key": list(counters.keys()), "__undercount": list(counters.values())}
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    min_count: int,
    capacity: int = 256,
    total_count: int | None = None,
) -> DataFrame:
    """EXACT frequent-items query answered with sketch-bounded state:
    every ``key_col`` value occurring at least ``min_count`` times, with
    its exact count.

    Two passes over the keys, neither of which builds the full GROUP BY:

    1. Per-partition Misra-Gries (``mapInPandas``, ≤ ``capacity`` rows
       of state and output per partition). Summing the partial summaries
       keeps the pigeonhole guarantee: a key with global frequency
       f > n/(capacity+1) exceeds the local threshold in at least one
       partition, so it is in some summary. The candidate union is at
       most ``capacity × partitions`` rows — kilobytes, not the corpus.
    2. Exact recount of candidates only: broadcast semi-join of the key
       stream against the candidate set, then a GROUP BY whose input is
       just the candidate occurrences.

    Exactness precondition (checked): ``min_count`` must exceed
    n/(capacity+1), else a qualifying key could evade every local
    summary. Pass ``total_count`` when the key-stream size is known
    (e.g. tokens ≈ rows × mean length from profile stats) to keep the
    plan one-pass; otherwise the check spends one count of the key
    stream. The candidate SET may vary with partitioning, but it is
    always a superset of the true answer, and the exact recount makes
    the OUTPUT partitioning-invariant.

    Returns (key_col, n_occurrences) — exactly
    ``SELECT key, COUNT(*) .. GROUP BY key HAVING COUNT(*) >= min_count``.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    keys = df.select(F.col(key_col).cast("string").alias("__key"))
    n = keys.count() if total_count is None else total_count
    if n > 0 and min_count * (capacity + 1) <= n:
        raise ValueError(
            f"min_count={min_count} is below the Misra-Gries exactness "
            f"floor n/(capacity+1)={n/(capacity+1):.1f}; raise capacity "
            f"to > {n // min_count} or raise min_count"
        )
    summaries = keys.mapInPandas(
        lambda it: _mg_partition(it, capacity),
        schema="__key string, __undercount long",
    )
    candidates = (
        summaries.groupBy("__key")
        .agg(F.sum("__undercount").alias("__lb"))
        .select("__key")
    )
    exact = (
        keys.join(F.broadcast(candidates), "__key")
        .groupBy("__key")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )
    return exact.select(F.col("__key").alias(key_col), "n_occurrences")


def top_tokens_exact(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 50,
    capacity: int = 1024,
) -> DataFrame:
    """Heavy-hitter TOKENS of a document corpus — the vocabulary-head
    audit (which boilerplate tokens dominate the corpus?) without a full
    token GROUP BY. Whitespace tokenization matches ``text.tokens``."""
    toks = df.select(
        F.explode(
            F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                     lambda x: x != "")
        ).alias("token")
    )
    return heavy_hitters(toks, "token", min_count=min_count, capacity=capacity)


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    shard_col: str | None = None,
    bins: int = 64,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Mergeable equi-width histogram — the quantile companion to
    ``sampling.hll_shard_sketches``: per shard, a fixed ``bins``-row
    (bin, n) table whose union IS the merge operation (bin counts are
    associative sums), so incremental quantile maintenance over a 100 TB
    history is re-aggregation of kilobyte-sized partials, never a
    history re-scan.

    ``lo``/``hi`` fix the bin edges; when omitted they come from one
    exact min/max aggregate over the input (one extra 1-row-per-shard
    pass — pass them explicitly in incremental settings, where the
    domain must be pinned anyway for partials to stay mergeable).
    Values at ``hi`` land in the last bin (closed top edge, like
    equal-width binning); NULLs are dropped.

    Returns (shard, bin, bin_lo, bin_hi, n) — ``shard`` is '' when
    ``shard_col`` is None. Only non-empty bins are emitted.
    """
    v = F.col(value_col).cast("double")
    shard = (
        F.col(shard_col).cast("string") if shard_col else F.lit("")
    ).alias("shard")
    if lo is None or hi is None:
        row = df.agg(
            F.min(v).alias("lo"), F.max(v).alias("hi")
        ).head()
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
    if lo is None:  # empty input
        return df.sparkSession.createDataFrame(
            [], "shard string, bin int, bin_lo double, bin_hi double, n long"
        )
    width = (float(hi) - float(lo)) / bins if hi > lo else 1.0
    bin_ = F.least(
        F.lit(bins - 1),
        F.greatest(
            F.lit(0), F.floor((v - F.lit(float(lo))) / F.lit(width)).cast("int")
        ),
    )
    return (
        df.filter(v.isNotNull())
        .select(shard, bin_.alias("bin"))
        .groupBy("shard", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "shard",
            "bin",
            (F.lit(float(lo)) + F.col("bin") * F.lit(width)).alias("bin_lo"),
            (F.lit(float(lo)) + (F.col("bin") + 1) * F.lit(width)).alias("bin_hi"),
            "n",
        )
    )


def quantiles_from_histogram(
    hist: DataFrame, probs: Sequence[float]
) -> DataFrame:
    """Quantile estimates from a (merged) histogram sketch: linear
    interpolation within the containing bin — max error one bin width.
    Accepts the output of ``histogram_sketch`` (any number of shards —
    they are merged here by summing bin counts, which is the whole
    point of the sketch). Returns (prob, estimate)."""
    merged = (
        hist.groupBy("bin", "bin_lo", "bin_hi")
        .agg(F.sum("n").alias("n"))
        .orderBy("bin")
        .collect()  # ≤ bins rows — sketch-sized, never data-sized
    )
    total = sum(r["n"] for r in merged)
    out = []
    for p in probs:
        if total == 0:
            out.append((float(p), None))
            continue
        target = p * total
        acc = 0
        est = merged[-1]["bin_hi"]
        for r in merged:
            if acc + r["n"] >= target:
                frac = (target - acc) / r["n"] if r["n"] else 0.0
                est = r["bin_lo"] + frac * (r["bin_hi"] - r["bin_lo"])
                break
            acc += r["n"]
        out.append((float(p), float(est)))
    spark = hist.sparkSession
    return spark.createDataFrame(out, "prob double, estimate double")


def skew_profile(
    df: DataFrame,
    key_cols: Sequence[str],
    capacity: int = 256,
    target_rows_per_task: int = 4_000_000,
    total_count: int | None = None,
) -> DataFrame:
    """Shuffle-key skew diagnosis — the planning tool behind
    ``relational.salted_join``'s salt factor: find the heavy join/group
    keys BEFORE running the expensive shuffle, with Misra-Gries-bounded
    state (never a full key GROUP BY).

    Reports every key holding more than n/(capacity+1) of the rows
    (exact counts via the heavy-hitter recount) with its row share and
    the salt factor — ceil(count / target_rows_per_task) — that would
    split it into target-sized reducer tasks. An empty result certifies
    no key exceeds the 1/(capacity+1) share: at capacity 256, no
    reducer gets more than ~0.4% of the table, i.e. the shuffle is safe
    without salting.

    Returns (key, n_rows, row_share, salt_factor) ordered nowhere —
    sort at display time; the frame is at most ``capacity × partitions``
    rows.
    """
    keyed = df.select(
        F.concat_ws("\x1f", *[F.col(c).cast("string") for c in key_cols]).alias(
            "__key"
        )
    )
    n = keyed.count() if total_count is None else total_count
    if n == 0:
        return df.sparkSession.createDataFrame(
            [], "key string, n_rows long, row_share double, salt_factor int"
        )
    floor = n // (capacity + 1) + 1
    hh = heavy_hitters(keyed, "__key", min_count=floor, capacity=capacity,
                       total_count=n)
    return hh.select(
        F.col("__key").alias("key"),
        F.col("n_occurrences").alias("n_rows"),
        (F.col("n_occurrences") / F.lit(float(n))).alias("row_share"),
        F.ceil(F.col("n_occurrences") / F.lit(target_rows_per_task))
        .cast("int")
        .alias("salt_factor"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch
# ---------------------------------------------------------------------------

def _cms_bucket(key: "F.Column", row: int, width: int) -> "F.Column":
    """Bucket of ``key`` in sketch row ``row`` — 60-bit md5 prefix mod
    width, cross-engine: DuckDB
    ``('0x' || substring(md5(r || '|' || key), 1, 15))::BIGINT % width``."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}|"), key)), 1, 15), 16, 10
        ).cast("long")
        % width
    )


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    shard_cols: Sequence[str] = (),
) -> DataFrame:
    """Count-min sketch of the ``key_col`` stream as a SPARSE count table
    (``*shard_cols``, row, bucket, n) — at most ``depth × width`` rows
    per shard regardless of corpus size.

    The frequency companion to ``sampling.hll_shard_sketches``: keep one
    tiny sketch per ingest shard (day, source, batch) and answer "roughly
    how often does token X occur corpus-wide?" without ever re-scanning
    — merging is just summing bucket counts (``cms_merge``), so an
    incremental pipeline folds a new shard's sketch into the running
    corpus sketch in O(depth × width).

    Estimates (``cms_estimate``) are classic CMS: never under the true
    count, over by at most ~2n/width with probability 1 − 2^-depth.
    Everything is md5-derived and integer — the sketch is bit-identical
    on any engine and any partitioning.

    Scale shape: one explode of ``depth`` (row, bucket) pairs per key
    occurrence, one partial-aggregated groupBy — the same cost as a
    word-count, with output bounded by the sketch size, not the
    vocabulary.
    """
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    key = F.col(key_col).cast("string")
    cells = df.select(
        *shard_cols,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(key, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("__cell"),
    )
    return cells.groupBy(
        *shard_cols, F.col("__cell.row").alias("row"),
        F.col("__cell.bucket").alias("bucket")
    ).agg(F.count(F.lit(1)).alias("n"))


def cms_merge(sketch: DataFrame) -> DataFrame:
    """Fold per-shard CMS sketches into one: bucket counts are
    associative sums, so the merge is a groupBy — the whole point of
    keeping sketches instead of raw token streams."""
    return sketch.groupBy("row", "bucket").agg(F.sum("n").alias("n"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for every key in ``keys`` against a
    merged sketch: min over the ``depth`` rows of the key's bucket
    count. The sketch (≤ depth × width rows) is broadcast; the probe
    side never shuffles.

    Returns (key_col, est_count). est_count ≥ the true count always;
    a key absent from the stream can still estimate > 0 (collisions) —
    CMS semantics."""
    key = F.col(key_col).cast("string")
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_bucket(key, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("__cell"),
    ).select(key_col, F.col("__cell.row").alias("row"),
             F.col("__cell.bucket").alias("bucket"))
    joined = probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        joined.groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("n"), F.lit(0))).alias("est_count"))
    )


def hll_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """Pre-aggregated distinct-count SKETCH TABLE: one Apache
    DataSketches HLL binary per group (Spark's built-in
    ``hll_sketch_agg`` — JVM-side, mergeable). This is the pattern that
    makes distinct-count dashboards affordable at 100 TB: aggregate the
    corpus ONCE into a group-grained sketch table (persist it as
    parquet — the sketch column is plain binary), then answer distinct
    counts over ANY coarser slice by unioning sketches
    (``hll_rollup``) without ever rescanning the corpus.

    Registers are max-merged, so rollups are associative and
    order/partitioning-independent, and a union of sub-sketches
    estimates within the HLL bound of the direct sketch (DataSketches'
    sparse→dense mode promotion can shift a few registers at small
    cardinalities, so the two are near- but not bit-identical). Error
    is the HLL bound (rsd ≈ 1.04/√2^lg_k ≈ 1.6% at the default
    lg_k=12).

    Returns ``group_cols`` + ``hll_sketch`` (binary) + ``n_rows``.
    """
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("hll_sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_rollup(
    sketches: DataFrame,
    rollup_cols: list[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Distinct-count estimates over a coarser slice of a
    ``hll_sketch_table``: union the group sketches per rollup key and
    estimate. Input is the (tiny) sketch table, never the corpus — a
    group-cardinality-sized aggregation whatever the original data
    volume.

    Returns ``rollup_cols`` + ``approx_distinct`` (long) + ``n_rows``.
    """
    return sketches.groupBy(*rollup_cols).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col(sketch_col), F.lit(True))
        ).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )


def hll_sketch_merge_tables(
    a: DataFrame,
    b: DataFrame,
    group_cols: list[str],
    sketch_col: str = "hll_sketch",
) -> DataFrame:
    """Incremental maintenance of a ``hll_sketch_table`` STORE: merge
    yesterday's persisted sketch table with a new delta's sketch table
    into an updated store — sketch-table-sized work (group cardinality,
    never corpus), so a daily ingest updates global distinct counts
    without rescanning history. Same schema in, same schema out: the
    store stays append-merge-able forever."""
    return a.unionByName(b).groupBy(*group_cols).agg(
        F.hll_union_agg(F.col(sketch_col), F.lit(True)).alias(sketch_col),
        F.sum("n_rows").alias("n_rows"),
    )
