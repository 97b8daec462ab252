"""Deterministic logistic regression (fixed-iteration batch gradient
descent) — the KNIME Logistic Regression Learner's capability expressed
Spark-first, built so the ENTIRE training loop is differentially
testable against a SQL oracle, the same engineering as
clustering.kmeans_lite:

- features are prepended with a constant 1.0 (bias as dimension 0);
- weights start at exact zeros, so iteration 1 is reproducible from
  nothing;
- per-row score ``w·x`` accumulates in element order (bit-identical to
  DuckDB's list_dot_product); ``sigmoid`` is one ``exp`` on identical
  doubles (the documented 1-ulp cross-engine risk class shared with
  unigram_logprob's ``ln`` — accepted, data-dependent, never
  parallelism-dependent);
- the gradient aggregation is EXACT integer math: each per-row
  contribution ``(p − y)·x_j`` is rounded to 6 decimals and scaled to
  int64 BEFORE summing, so gradients — and therefore the learned
  weights — are identical at any parallelism and in any engine;
- the learning rate defaults to 0.25 (a power of two: the weight
  update multiply is exact in binary floating point).

Scale shape per iteration: one broadcast of the (1+D)-element weight
vector to a narrow scoring scan (no shuffle of the features), then a
(dim, int64) gradient aggregation — 1+D groups regardless of corpus
size. Fixed iteration count: no convergence-check collect in the plan;
the whole run is one lazy DAG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.clustering import _sq_norm  # noqa: F401
from knime_core_columnar_spark.operators.similarity import dot

__all__ = ["logreg_lite", "naive_bayes_classify"]


def logreg_lite(
    df: DataFrame,
    label_expr: Column,
    vec_col: str = "embedding",
    iters: int = 2,
    lr: float = 0.25,
) -> DataFrame:
    """Train ``iters`` full-batch GD steps of binary logistic regression
    on ``vec_col`` against ``label_expr`` (boolean → {0,1}). Returns one
    row per model dimension: ``dim`` (0 = bias) and ``weight`` (the
    final weights, rounded to 6 decimals).

    Gradient: ``g_j = Σ_rows (σ(w·x) − y)·x_j / n``, per-row terms
    scaled to int64 micro-units before the sum (exact aggregation);
    update: ``w_j ← w_j − lr·round(g_j, 6)``."""
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    x = df.select(
        F.concat(
            F.array(F.lit(1.0)),
            F.transform(F.col(vec_col), lambda v: v.cast("double")),
        ).alias("__x"),
        label_expr.cast("int").cast("double").alias("__y"),
    )
    n = F.count(F.lit(1))
    # weights live in a single-row frame (like kmeans centroids): zeros
    # sized from one sample row — no driver collect anywhere
    w = x.limit(1).select(
        F.transform(F.col("__x"), lambda _: F.lit(0.0)).alias("__w")
    )
    for _ in range(iters):
        scored = x.crossJoin(F.broadcast(w)).select(
            "__x",
            "__y",
            "__w",
            (
                F.lit(1.0)
                / (F.lit(1.0) + F.exp(-dot(F.col("__w"), F.col("__x"))))
            ).alias("__p"),
        )
        contrib = scored.select(
            "__w",
            F.posexplode(
                F.transform(
                    F.col("__x"),
                    lambda xj: F.round(
                        F.round((F.col("__p") - F.col("__y")) * xj, 6) * 1_000_000,
                        0,
                    ).cast("long"),
                )
            ).alias("__j", "__g6"),
        )
        grad = contrib.groupBy("__j").agg(
            F.round(F.sum("__g6").cast("double") / (n * F.lit(1_000_000.0)), 6).alias(
                "__g"
            ),
            F.first("__w").alias("__w"),
        )
        w = grad.groupBy().agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("__j"),
                            (
                                F.element_at(F.col("__w"), F.col("__j") + 1)
                                - F.lit(lr) * F.col("__g")
                            ).alias("__wj"),
                        )
                    )
                ),
                lambda s: s["__wj"],
            ).alias("__w")
        )
    return w.select(F.posexplode("__w").alias("dim", "__wv")).select(
        "dim", F.round(F.col("__wv"), 6).alias("weight")
    )


def naive_bayes_classify(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    class_col: str = "lang",
    alpha: float = 1.0,
) -> DataFrame:
    """Multinomial Naive Bayes, self-train + self-score (the KNIME
    Naive Bayes Learner+Predictor pair, Spark-first): learn
    ``P(class)`` and Laplace-smoothed ``P(token|class)`` from the
    corpus, then classify every document by summed log-likelihood —
    the classic cheap language-ID / topical-routing model.

    Determinism: the same scaled-int discipline as logreg_lite /
    unigram_logprob — every per-token class log-prob and every class
    prior is rounded to 6 decimals and scaled to int64; the per-doc
    per-class accumulation is exact integer math, and the argmax is a
    min-struct with a class-name tie-break (no float comparisons
    cross-engine, no windows).

    Scale shape: one token explode → (token, class) count aggregation
    (vocab × |classes| — the model, ≪ corpus); the smoothed model is
    densified by a vocab × classes cross join so unseen (token, class)
    cells score ``α / (n_c + α·V)``; scoring joins token rows to the
    model on the token (|classes|-fold fan-out, classes are few) and
    min-structs per doc. Priors ride a broadcast |classes|-row frame.

    Output: ``id_col``, ``class_col`` (actual), ``pred`` (argmax
    class), ``match`` (actual == pred).
    """
    from knime_core_columnar_spark.operators.text import tokens

    tok = df.select(
        id_col, F.col(class_col), F.explode(tokens(text_col)).alias("__w")
    )
    cw = tok.groupBy("__w", class_col).agg(F.count(F.lit(1)).alias("__cwc"))
    ctot = tok.groupBy(class_col).agg(F.count(F.lit(1)).alias("__nc"))
    vocab = cw.select("__w").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).cast("double").alias("__V"))
    model = (
        vocab.crossJoin(ctot)
        .join(cw, ["__w", class_col], "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "__w",
            F.col(class_col).alias("__c"),
            F.round(
                F.round(
                    F.log(
                        (F.coalesce(F.col("__cwc"), F.lit(0)).cast("double") + F.lit(alpha))
                        / (F.col("__nc").cast("double") + F.lit(alpha) * F.col("__V"))
                    ),
                    6,
                )
                * 1_000_000,
                0,
            )
            .cast("long")
            .alias("__lp6"),
        )
    )
    ndocs = df.agg(F.count(F.lit(1)).cast("double").alias("__nd"))
    prior = (
        df.groupBy(class_col)
        .agg(F.count(F.lit(1)).alias("__dc"))
        .crossJoin(F.broadcast(ndocs))
        .select(
            F.col(class_col).alias("__c"),
            F.round(
                F.round(F.log(F.col("__dc").cast("double") / F.col("__nd")), 6)
                * 1_000_000,
                0,
            )
            .cast("long")
            .alias("__prior6"),
        )
    )
    scores = (
        tok.join(model, "__w")
        .groupBy(id_col, "__c")
        .agg(F.sum("__lp6").alias("__ll6"))
        .join(F.broadcast(prior), "__c")
        .select(
            id_col, "__c", (F.col("__ll6") + F.col("__prior6")).alias("__s6")
        )
    )
    pred = scores.groupBy(id_col).agg(
        F.min(F.struct((-F.col("__s6")).alias("n"), F.col("__c").alias("c"))).alias(
            "__best"
        )
    )
    return (
        df.select(id_col, class_col)
        .join(pred, id_col)
        .select(
            id_col,
            class_col,
            F.col("__best.c").alias("pred"),
            (F.col(class_col) == F.col("__best.c")).alias("match"),
        )
    )
