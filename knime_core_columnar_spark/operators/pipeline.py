"""End-to-end corpus curation pipeline — the C4/RefinedWeb-style
composition of the repo's individual gates into ONE lazy DAG:

    quality gate → exact dedup → near-dup dedup → PII redaction → stats

Each stage reuses the exact operator the catalog verifies in isolation
(text.quality_score / lang_id, the md5 winner rule of dedup.exact_dedup,
dedup.minhash_lsh_candidates + ngram_jaccard_pairs +
connected_components, text.redact), so the pipeline's correctness
reduces to the already-oracle-checked parts plus the sequencing
semantics tested here: a document dropped at stage k does not
participate in any later stage's winner election (a near-dup cluster
whose canonical copy failed the quality gate elects a NEW canonical
among survivors — the subtle bug class this operator exists to
encapsulate).

Output is per-INPUT-document (nothing silently vanishes): the kept flag,
the first stage that dropped the document (NULL if kept), the redacted
text for kept docs, and token counts — plus a one-aggregation attrition
report. At 100 TB the plan is the union of its parts' documented scale
shapes: codegen quality expressions, one 16-byte-hash shuffle for exact
dedup, the banded LSH candidate path (never all-pairs), BSP connected
components over candidate pairs only, and a chained regexp projection
for redaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.dedup import (
    connected_components,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)
from knime_core_columnar_spark.operators.text import (
    PII_RULES,
    lang_id,
    quality_score,
    redact,
    repetition_ratio,
    token_count,
)

__all__ = ["curate_corpus", "curation_report"]


def curate_corpus(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.5,
    max_repetition: float = 0.2,
    keep_langs: tuple[str, ...] | None = None,
    jaccard_threshold: float = 0.5,
    num_perm: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Run the full curation pipeline; returns one row per input doc:
    (id_col, kept, drop_stage, final_text, n_tokens).

    drop_stage ∈ {'quality', 'repetition', 'lang', 'exact_dup',
    'near_dup'} for dropped docs (first failing stage wins), NULL for
    kept docs. final_text is the PII-redacted text for kept docs, NULL
    otherwise. The repetition gate is the Gopher-style top-bigram share
    (``text.repetition_ratio``) — the quality score alone cannot see a
    document that is one phrase repeated.
    """
    base = df.select(
        F.col(id_col),
        F.coalesce(F.col(text_col), F.lit("")).alias("__t"),
    )

    rep = repetition_ratio(
        base.select(id_col, F.col("__t").alias(text_col)), id_col, text_col
    )
    q = (
        base.withColumn("__q", quality_score("__t"))
        .withColumn("__lang", lang_id("__t"))
        .join(rep, id_col)
    )
    lang_ok = (
        F.col("__lang").isin(list(keep_langs)) if keep_langs else F.lit(True)
    )
    staged = q.withColumn(
        "__stage1",
        F.when(F.col("__q") < min_quality, "quality")
        .when(F.col("rep_ratio") > max_repetition, "repetition")
        .when(~lang_ok, "lang"),
    )

    # exact dedup among stage-1 survivors only: winner = min id per hash
    s1 = staged.filter(F.col("__stage1").isNull())
    h = s1.select(id_col, F.md5("__t").alias("__h"))
    winners = h.groupBy("__h").agg(F.min(id_col).alias("__win"))
    exact_losers = (
        h.join(winners, "__h")
        .filter(F.col(id_col) != F.col("__win"))
        .select(id_col, F.lit("exact_dup").alias("__stage2"))
    )

    # near-dup among exact-dedup survivors: LSH candidates -> verified
    # pairs -> connected components -> canonical = min id in component
    s2 = s1.join(exact_losers, id_col, "left_anti").select(
        id_col, F.col("__t").alias(text_col)
    )
    cand = minhash_lsh_candidates(
        s2, id_col, text_col, num_perm=num_perm, bands=bands
    )
    pairs = ngram_jaccard_pairs(
        s2, id_col, text_col, threshold=jaccard_threshold, candidates=cand
    ).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    near_losers = comp.filter(F.col("node") != F.col("label")).select(
        F.col("node").alias(id_col), F.lit("near_dup").alias("__stage3")
    )

    flags = (
        staged.select(id_col, "__t", "__stage1")
        .join(exact_losers, id_col, "left")
        .join(near_losers, id_col, "left")
        .select(
            id_col,
            "__t",
            F.coalesce("__stage1", "__stage2", "__stage3").alias("drop_stage"),
        )
    )
    kept = F.col("drop_stage").isNull()
    final_text = F.when(kept, redact(F.col("__t"), rules=PII_RULES))
    return flags.select(
        id_col,
        kept.alias("kept"),
        "drop_stage",
        final_text.alias("final_text"),
        F.when(kept, token_count(F.col("__t"))).alias("n_tokens"),
    )


def curation_report(curated: DataFrame) -> DataFrame:
    """Attrition report from a ``curate_corpus`` frame: one row per
    outcome — ('kept' or the drop stage) with doc count and surviving
    token total. One aggregation; report size = number of stages."""
    return (
        curated.groupBy(
            F.coalesce("drop_stage", F.lit("kept")).alias("outcome")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce("n_tokens", F.lit(0))).alias("total_tokens"),
        )
    )
