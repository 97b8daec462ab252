"""Round-9 in-round extensions: tokenizer-sizing coverage curve and
T5-style span-corruption training targets — both pure-expression,
zero-exchange-or-one-shuffle shapes with exact DuckDB twins (registry
determinism rules per _registry.py: every computed column aliased
identically on both sides; fractions are single IEEE divisions of
exact integers; hashes are the shared md5-60 arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from knime_core_columnar_spark.catalog._registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    _t,
    query,
)

# ---------------------------------------------------------------------------
# vocab_coverage_curve — frequency-threshold coverage audit (tokenizer
# vocab sizing). Count table -> count-of-counts -> cumulative window
# over the tiny count-of-counts table only.
# ---------------------------------------------------------------------------

_VOCAB_COVERAGE_ORACLE = """
    WITH tk AS (
      SELECT unnest(list_filter(
               string_split_regex(lower(trim(text)), '\\W+'),
               x -> x <> '')) AS t
      FROM documents
    ), c AS (
      SELECT t, COUNT(*) AS c FROM tk GROUP BY t
    ), coc AS (
      SELECT c, COUNT(*) AS n_types, c * COUNT(*) AS n_toks
      FROM c GROUP BY c
    ), tot AS (
      SELECT SUM(n_toks) AS total FROM coc
    )
    SELECT CAST(c AS BIGINT) AS min_count,
           CAST(SUM(n_types) OVER w AS BIGINT) AS n_types_cum,
           CAST(SUM(n_toks) OVER w AS BIGINT) AS n_tokens_cum,
           CAST(SUM(n_toks) OVER w AS DOUBLE) / CAST(total AS DOUBLE)
             AS coverage
    FROM coc, tot
    WINDOW w AS (ORDER BY c DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


@query("vocab_coverage_curve", _VOCAB_COVERAGE_ORACLE)
def _r9x_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-sizing coverage curve
    (operators.text.vocab_coverage_curve): per frequency threshold,
    cumulative type count and fraction of token occurrences covered.
    The cumulative window runs over the count-of-counts table
    (O(√N_tokens) rows), never the vocab or the corpus."""
    from knime_core_columnar_spark.operators.text import (
        vocab_coverage_curve,
    )

    return vocab_coverage_curve(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# span_corruption_masks — deterministic T5 denoising targets. The
# oracle replays the identical md5-60 seed arithmetic and island
# algebra in DuckDB list lambdas.
# ---------------------------------------------------------------------------

_SPAN_CORRUPTION_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(coalesce(text, '')),
                                            '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ), m AS (
      SELECT doc_id, w, len(w) AS n,
             list_transform(range(1, len(w) + 1), i ->
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':'
                                      || CAST(i AS VARCHAR)), 1, 15))::BIGINT
                 % 20 = 0) AS seed
      FROM t
    ), mm AS (
      SELECT doc_id, w, n, seed,
             list_transform(range(1, n + 1), i ->
               len(list_filter(range(greatest(1, i - 2), i + 1),
                               j -> seed[CAST(j AS INT)])) > 0) AS msk
      FROM m
    ), ss AS (
      SELECT doc_id, w, n, msk,
             list_transform(range(1, n + 1), i ->
               msk[CAST(i AS INT)] AND
               (i = 1 OR NOT msk[CAST(i - 1 AS INT)])) AS s
      FROM mm
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(len(list_filter(msk, b -> b)) AS BIGINT) AS n_masked,
           coalesce(array_to_string(list_filter(
             list_transform(range(1, n + 1), i ->
               CASE
                 WHEN NOT msk[CAST(i AS INT)] THEN w[CAST(i AS INT)]
                 WHEN s[CAST(i AS INT)] THEN '<extra_id_' ||
                   CAST(len(list_filter(range(1, i + 1),
                                        j -> s[CAST(j AS INT)])) - 1
                        AS VARCHAR) || '>'
                 ELSE ''
               END),
             p -> p <> ''), ' '), '') AS inputs,
           coalesce(array_to_string(list_filter(
             list_transform(range(1, n + 1), i ->
               CASE
                 WHEN NOT msk[CAST(i AS INT)] THEN ''
                 WHEN s[CAST(i AS INT)] THEN '<extra_id_' ||
                   CAST(len(list_filter(range(1, i + 1),
                                        j -> s[CAST(j AS INT)])) - 1
                        AS VARCHAR) || '> ' || w[CAST(i AS INT)]
                 ELSE w[CAST(i AS INT)]
               END),
             p -> p <> ''), ' '), '') AS targets
    FROM ss
"""


@query("span_corruption_masks", _SPAN_CORRUPTION_ORACLE)
def _r9x_span_corruption_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic T5 span-corruption pairs
    (operators.text.span_corruption_masks, defaults span_len=3
    seed_every=20 = the paper's 15% density): hash-seeded masks,
    merged islands, numbered sentinels, inputs/targets strings.
    Zero-exchange row-local array algebra."""
    from knime_core_columnar_spark.operators.text import (
        span_corruption_masks,
    )

    return span_corruption_masks(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# temperature_mixture_plan — alpha-smoothed multilingual mixture
# allocation (XLM/mT5 alpha-sampling), integer-exact largest-remainder
# split. alpha=0.5 (sqrt) because IEEE requires sqrt to be correctly
# rounded — pow() is not cross-engine deterministic.
# ---------------------------------------------------------------------------

_TEMPERATURE_MIXTURE_ORACLE = """
    WITH c AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(list_filter(
               string_split_regex(trim(coalesce(text, '')), '\\s+'),
               x -> x <> ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), w AS (
      SELECT c.*,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1e6) AS BIGINT)
               AS smoothed_weight
      FROM c
    ), t AS (
      SELECT SUM(CAST(smoothed_weight AS HUGEINT)) AS tot FROM w
    ), a AS (
      SELECT w.*,
             CASE WHEN tot > 0
               THEN CAST((CAST(100000 AS HUGEINT) * smoothed_weight)
                         // tot AS BIGINT) ELSE 0 END AS alloc0,
             CASE WHEN tot > 0
               THEN CAST((CAST(100000 AS HUGEINT) * smoothed_weight)
                         % tot AS BIGINT) ELSE 0 END AS rem,
             tot > 0 AS has_w
      FROM w, t
    ), r AS (
      SELECT 100000 - SUM(alloc0) AS resid FROM a
    ), f AS (
      SELECT a.*,
             CAST(alloc0 + CASE WHEN has_w AND
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) <= resid
               THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
      FROM a, r
    )
    SELECT source, n_docs, n_tokens, smoothed_weight, alloc_tokens,
           CAST(alloc_tokens AS DOUBLE) / 100000.0 AS share
    FROM f
"""


@query("temperature_mixture_plan", _TEMPERATURE_MIXTURE_ORACLE)
def _r9x_temperature_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha-smoothed mixture allocation
    (operators.sampling.temperature_mixture_plan, alpha=0.5, budget
    100k tokens over the documents sources): floor(sqrt(n)·1e6)
    integer weights, exact decimal largest-remainder split — Σalloc ==
    budget exactly. One corpus scan; everything downstream is
    source-table-sized."""
    from knime_core_columnar_spark.operators.sampling import (
        temperature_mixture_plan,
    )

    return temperature_mixture_plan(
        _t(spark, sf_dir, "documents"), source_col="source",
        budget=100_000, alpha=0.5,
    )


# ---------------------------------------------------------------------------
# fim_transform — fill-in-the-middle training transform (Bavarian et
# al. 2022): hash-gated 50% FIM rate, hash-drawn cut points, PSM
# output ordering. Deterministic, so the oracle replays it exactly.
# ---------------------------------------------------------------------------

_FIM_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(coalesce(text, '')),
                                            '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ), h AS (
      SELECT doc_id, w, len(w) AS n,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':fim'),
                                1, 15))::BIGINT % 2 = 0 AS a,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                         || ':cut1'), 1, 15))::BIGINT
                  % (len(w) + 1) AS INT) AS u,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                         || ':cut2'), 1, 15))::BIGINT
                  % (len(w) + 1) AS INT) AS v
      FROM t
    ), c AS (
      SELECT doc_id, w, n, a,
             least(u, v) AS c1, greatest(u, v) AS c2
      FROM h
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           a AS fim_applied,
           CASE WHEN a THEN c1 END AS c1,
           CASE WHEN a THEN c2 END AS c2,
           CASE WHEN a THEN
             array_to_string(list_filter(
               ['<fim_prefix>'] || w[1:c1] || ['<fim_suffix>']
                 || w[CAST(c2 + 1 AS INT):CAST(n AS INT)]
                 || ['<fim_middle>']
                 || w[CAST(c1 + 1 AS INT):CAST(c2 AS INT)],
               x -> x <> ''), ' ')
           ELSE coalesce(array_to_string(w, ' '), '') END AS output
    FROM c
"""


@query("fim_transform", _FIM_ORACLE)
def _r9x_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-in-the-middle training pairs (operators.text.fim_transform,
    defaults = the paper's 50% FIM rate, PSM ordering). Two hashes +
    three slices per doc, zero exchanges."""
    from knime_core_columnar_spark.operators.text import fim_transform

    return fim_transform(_t(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# language_mix_audit — paragraph-level language ID + code-switch
# fraction (CCNet-style paragraph splitting). Vote rule identical to
# text_quality_lang so the two audits agree on one-paragraph docs.
# ---------------------------------------------------------------------------

_LANGUAGE_MIX_ORACLE = """
    WITH t AS (
      SELECT doc_id,
             list_filter(list_transform(
               string_split(coalesce(text, ''), chr(10)), p -> trim(p)),
               p -> p <> '') AS paras
      FROM documents
    ), tok AS (
      SELECT doc_id,
             list_transform(paras, p ->
               list_filter(string_split_regex(lower(p), '\\s+'),
                           x -> x <> '')) AS tp
      FROM t
    ), vp AS (
      SELECT doc_id,
             list_transform(tp, t -> [
               len(list_filter(t, x -> list_contains(
                 ['the','and','of','to','is'], x))),
               len(list_filter(t, x -> list_contains(
                 ['der','die','und','nicht','ist'], x))),
               len(list_filter(t, x -> list_contains(
                 ['le','la','et','les','est'], x))),
               len(list_filter(t, x -> list_contains(
                 ['el','los','que','y','es'], x)))
             ]) AS votes
      FROM tok
    ), pr AS (
      SELECT doc_id,
             list_transform(votes, v ->
               CASE WHEN greatest(v[1], v[2], v[3], v[4]) = 0 THEN 'und'
                    WHEN v[1] = greatest(v[1], v[2], v[3], v[4]) THEN 'en'
                    WHEN v[2] = greatest(v[1], v[2], v[3], v[4]) THEN 'de'
                    WHEN v[3] = greatest(v[1], v[2], v[3], v[4]) THEN 'fr'
                    ELSE 'es' END) AS preds
      FROM vp
    ), agg AS (
      SELECT doc_id, preds,
             len(preds) AS n_paras,
             len(list_filter(preds, p -> p <> 'und')) AS n_lang,
             len(list_filter(preds, p -> p = 'en')) AS c_en,
             len(list_filter(preds, p -> p = 'de')) AS c_de,
             len(list_filter(preds, p -> p = 'fr')) AS c_fr,
             len(list_filter(preds, p -> p = 'es')) AS c_es
      FROM pr
    )
    SELECT doc_id,
           CAST(n_paras AS BIGINT) AS n_paras,
           CAST(n_lang AS BIGINT) AS n_lang_paras,
           CASE WHEN n_lang > 0 THEN
             CASE WHEN c_en = greatest(c_en, c_de, c_fr, c_es) THEN 'en'
                  WHEN c_de = greatest(c_en, c_de, c_fr, c_es) THEN 'de'
                  WHEN c_fr = greatest(c_en, c_de, c_fr, c_es) THEN 'fr'
                  ELSE 'es' END
           END AS majority_lang,
           CAST(CASE WHEN n_lang > 0
                THEN n_lang - greatest(c_en, c_de, c_fr, c_es)
                ELSE 0 END AS BIGINT) AS n_switch,
           CAST(CASE WHEN n_lang > 0
                THEN n_lang - greatest(c_en, c_de, c_fr, c_es)
                ELSE 0 END AS DOUBLE)
             / greatest(n_lang, 1) AS switch_frac
    FROM agg
"""


@query("language_mix_audit", _LANGUAGE_MIX_ORACLE)
def _r9x_language_mix_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-switching audit (operators.text.language_mix_audit):
    paragraph-level stopword-vote language ID, document majority, and
    the disagreeing-paragraph fraction. Zero-exchange nested array
    algebra."""
    from knime_core_columnar_spark.operators.text import (
        language_mix_audit,
    )

    return language_mix_audit(_t(spark, sf_dir, "documents"))
