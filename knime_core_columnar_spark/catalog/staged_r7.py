"""Round-7 staged queries.

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
    _t,
    _tw,
)
from knime_core_columnar_spark.catalog.formats_graph import (  # noqa: F401
    _NEARDUP_EDGE_CTE,
)

# ---------------------------------------------------------------------------
# Round-7 query section (driver-registered since the round-6 flip; the
# staging gates were removed in the round-7 flat-registry refactor).
# ---------------------------------------------------------------------------

CMS_FREQUENCY_ORACLE = """
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS token
      FROM documents
    ),
    tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM toks GROUP BY token),
    probes AS (
      SELECT DISTINCT unnest(list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '')) AS token
      FROM documents WHERE doc_id < 20
    ),
    cells AS (
      SELECT t.r,
             ('0x' || substring(md5(CAST(t.r AS VARCHAR) || '|' || tc.token), 1, 15))::BIGINT
               % 64 AS bucket,
             CAST(SUM(tc.n) AS BIGINT) AS cnt
      FROM tc CROSS JOIN range(4) t(r)
      GROUP BY 1, 2
    ),
    pb AS (
      SELECT pr.token, t.r,
             ('0x' || substring(md5(CAST(t.r AS VARCHAR) || '|' || pr.token), 1, 15))::BIGINT
               % 64 AS bucket
      FROM probes pr CROSS JOIN range(4) t(r)
    ),
    est AS (
      SELECT pb.token, MIN(COALESCE(cells.cnt, 0)) AS est_count
      FROM pb LEFT JOIN cells ON cells.r = pb.r AND cells.bucket = pb.bucket
      GROUP BY pb.token
    )
    SELECT est.token, CAST(est.est_count AS BIGINT) AS est_count,
           CAST(COALESCE(tc.n, 0) AS BIGINT) AS exact_count,
           CAST(est.est_count - COALESCE(tc.n, 0) AS BIGINT) AS overcount
    FROM est LEFT JOIN tc ON tc.token = est.token
"""


def _r7_cms_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch frequency estimation (operators.sketch.cms_*):
    per-source shard sketches are built and MERGED (proving the
    incremental-maintenance contract: merge = bucket-count sum), then
    probed for the vocabulary of the first 20 docs; exact recounts of
    the probe set expose the guaranteed-nonnegative overcount. Width 64
    deliberately forces collisions so the min-over-rows estimate does
    real work. All md5/integer — bit-identical on any engine; the
    oracle replays the identical sketch in SQL from full token counts
    (equivalent because bucket counts are sums over colliding tokens)."""
    from knime_core_columnar_spark.operators.sketch import (
        cms_estimate,
        cms_merge,
        cms_sketch,
    )

    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "source",
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    sketch = cms_merge(
        cms_sketch(tok, "token", depth=4, width=64, shard_cols=["source"])
    )
    probes = (
        d.filter(F.col("doc_id") < 20)
        .select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("token"))
        .filter(F.col("token") != "")
        .distinct()
    )
    est = cms_estimate(sketch, probes, "token", depth=4, width=64)
    exact = (
        tok.join(F.broadcast(probes), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )
    return (
        est.join(exact, "token", "left")
        .select(
            "token",
            F.col("est_count").cast("long").alias("est_count"),
            F.coalesce("exact_count", F.lit(0)).cast("long").alias("exact_count"),
            (F.col("est_count") - F.coalesce("exact_count", F.lit(0)))
            .cast("long")
            .alias("overcount"),
        )
    )


SET_SIMILARITY_JOIN_ORACLE = """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
               i -> ('0x' || substring(md5(array_to_string(t[i:i+2], ' ')), 1, 15))::BIGINT)) AS s
      FROM toks
    ), nz AS (SELECT doc_id, s FROM sh WHERE len(s) > 0),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             len(list_intersect(a.s, b.s)) AS n_overlap,
             len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS n_union
      FROM nz a JOIN nz b ON a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST(n_overlap AS BIGINT) AS n_overlap,
           CAST(n_union AS BIGINT) AS n_union
    FROM pairs WHERE 5 * n_overlap >= 3 * n_union
"""


def _r7_set_similarity_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard ≥ 3/5 self-join via PPJoin-style prefix filtering
    (operators.dedup.prefix_filter_jaccard_pairs) — zero false
    negatives, unlike the MinHash tier. The oracle is a brute-force
    all-pairs list_intersect in DuckDB over the same 60-bit shingle
    hashes: feasible at sf0.01, and precisely the quadratic scan the
    prefix filter provably reproduces without running it."""
    from knime_core_columnar_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    return prefix_filter_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold_num=3, threshold_den=5
    )


GOLDEN_RECORD_ORACLE = """
    WITH RECURSIVE p AS (
      SELECT p_partkey, p_name, p_brand, p_type, p_size,
             string_split(p_name, ' ')[-1] AS block FROM part
    ), prs AS (
      SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
      FROM p a JOIN p b ON a.block = b.block AND a.p_partkey < b.p_partkey
      WHERE levenshtein(a.p_name, b.p_name) <= 2
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM prs
      UNION ALL
      SELECT id_b, id_a FROM prs
    ), reach AS (
      SELECT a AS node, a AS label FROM e
      UNION
      SELECT e.a, reach.label FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, MIN(label) AS entity FROM reach GROUP BY node
    ), assign AS (
      SELECT p.*, COALESCE(comp.entity, p.p_partkey) AS entity_id
      FROM p LEFT JOIN comp ON comp.node = p.p_partkey
    ), multi AS (
      SELECT entity_id FROM assign GROUP BY entity_id HAVING COUNT(*) > 1
    ), m AS (
      SELECT assign.* FROM assign JOIN multi USING (entity_id)
    ), bm AS (
      SELECT entity_id, p_brand,
             ROW_NUMBER() OVER (PARTITION BY entity_id
                                ORDER BY COUNT(*) DESC, p_brand) AS rk
      FROM m GROUP BY entity_id, p_brand
    ), tm AS (
      SELECT entity_id, p_type,
             ROW_NUMBER() OVER (PARTITION BY entity_id
                                ORDER BY COUNT(*) DESC, p_type) AS rk
      FROM m GROUP BY entity_id, p_type
    )
    SELECT m.entity_id,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           MIN(m.p_partkey) AS canonical_id,
           MAX(m.p_size) AS max_size,
           MIN(bm.p_brand) AS brand_mode,
           MIN(tm.p_type) AS type_mode
    FROM m
    JOIN bm ON bm.entity_id = m.entity_id AND bm.rk = 1
    JOIN tm ON tm.entity_id = m.entity_id AND tm.rk = 1
    GROUP BY m.entity_id
"""


def _r7_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship merge after entity resolution
    (operators.relational.golden_records): the same blocking + edit
    distance + connected components as the entity_resolution query,
    then each multi-record entity collapses to one golden record —
    mode-with-deterministic-tie-break for categoricals (brand, type),
    max for p_size, min p_partkey as the canonical id. The oracle
    replays survivorship with window functions over the recursive-CTE
    closure. Oracle practicality note: the DuckDB recursive closure is
    quadratic in component size and impractical at sf0.1 (an inherited
    property of the entity_resolution oracle, whose Spark side runs
    sf0.1 in ~35 s); driver comparisons run at sf0.01 where both sides
    are seconds."""
    from knime_core_columnar_spark.operators.dedup import connected_components
    from knime_core_columnar_spark.operators.relational import golden_records

    p = _t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size",
        F.element_at(F.split("p_name", " "), -1).alias("block"),
    )
    # two-tier edge derivation (see entity_resolution): exact-name
    # collapse to min-id representatives, then blocked + length-gap +
    # thresholded-Levenshtein verification over DISTINCT names only —
    # clique contraction preserves components and min-id labels exactly
    names = p.groupBy("p_name", "block").agg(
        F.min("p_partkey").alias("rep")
    )
    a = names.select(F.col("rep").alias("id_a"),
                     F.col("p_name").alias("name_a"), "block")
    b = names.select(F.col("rep").alias("id_b"),
                     F.col("p_name").alias("name_b"), "block")
    pairs = (
        a.join(b, ["block"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.abs(F.length("name_a") - F.length("name_b")) <= 2)
        .filter(F.levenshtein("name_a", "name_b", 2) >= 0)
        .select("id_a", "id_b")
    )
    comp = connected_components(pairs, "id_a", "id_b")
    name_entity = names.join(comp, names["rep"] == comp["node"], "left").select(
        "p_name", F.coalesce(F.col("label"), F.col("rep")).alias("entity_id")
    )
    assign = p.join(name_entity, "p_name").select(p["*"], "entity_id")
    multi = (
        assign.groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .select("entity_id")
    )
    members = assign.join(multi, "entity_id")
    g = golden_records(
        members, "entity_id", "p_partkey",
        mode_cols=["p_brand", "p_type"], max_cols=["p_size"],
    )
    return g.select(
        "entity_id",
        F.col("n_records").cast("long").alias("n_records"),
        F.col("canonical_id"),
        F.col("p_size_max").alias("max_size"),
        F.col("p_brand_mode").alias("brand_mode"),
        F.col("p_type_mode").alias("type_mode"),
    )


SOURCE_QUOTA_SAMPLE_ORACLE = """
    WITH r AS (
      SELECT source, doc_id, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR) || '|quota'), doc_id) AS rk,
             COUNT(*) OVER (PARTITION BY source) AS n
      FROM documents
    ), q AS (
      SELECT *, least(n, CAST(floor(10 * sqrt(n)) AS BIGINT)) AS quota FROM r
    )
    SELECT source,
           CAST(MAX(n) AS BIGINT) AS n_docs,
           CAST(MAX(quota) AS BIGINT) AS quota,
           CAST(SUM(CASE WHEN rk <= quota THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rk <= quota THEN n_chars ELSE 0 END) AS BIGINT)
             AS chars_kept
    FROM q GROUP BY source
"""


def _r7_source_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping with sqrt temperature
    (operators.sampling.quota_sample): each source keeps at most
    10·sqrt(n) docs, chosen by a deterministic md5 order — the
    domain-rebalancing step of web-corpus curation. chars_kept makes
    the check sensitive to WHICH rows survive, not just how many."""
    from knime_core_columnar_spark.operators.sampling import quota_sample

    d = _t(spark, sf_dir, "documents")
    kept = quota_sample(d, "source", "doc_id", scale=10, salt="quota")
    return kept.groupBy("source").agg(
        F.max("__n_group").cast("long").alias("n_docs"),
        F.max("__quota").cast("long").alias("quota"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("chars_kept"),
    )


CLUSTER_CONSENSUS_LANG_ORACLE = (
    _NEARDUP_EDGE_CTE
    + """
    , reach AS (
      SELECT a AS node, a AS label FROM e
      UNION
      SELECT e.a, reach.label FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node
    ), m AS (
      SELECT comp.cluster_id, d.doc_id, d.lang
      FROM comp JOIN documents d ON d.doc_id = comp.node
    ), lc AS (
      SELECT cluster_id, lang, COUNT(*) AS n,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY COUNT(*) DESC, lang) AS rk
      FROM m GROUP BY cluster_id, lang
    ), agg AS (
      SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
      FROM m GROUP BY cluster_id
    )
    SELECT agg.cluster_id, lc.lang AS consensus_lang, agg.n_docs,
           agg.n_langs, CAST(agg.n_docs - lc.n AS BIGINT) AS n_minority
    FROM agg JOIN lc ON lc.cluster_id = agg.cluster_id AND lc.rk = 1
    WHERE agg.n_docs > 1
    """
)


def _r7_cluster_consensus_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language consensus over near-duplicate clusters: the lang-ID
    repair step of corpus curation (near-identical docs should agree on
    language; a minority label inside a dup cluster is usually a
    misclassification). Reuses the full near-dup machinery — MinHash
    LSH candidates → exact-Jaccard verify → connected components — then
    a per-cluster majority vote with a deterministic tie-break
    (max count, then smallest lang), plus the minority count a repair
    pass would flip. Only multi-doc clusters are reported."""
    from knime_core_columnar_spark.operators.dedup import (
        connected_components,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(d, "doc_id", "text", num_perm=16, bands=4)
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.5, candidates=cand
    ).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    m = comp.join(
        d.select("doc_id", "lang"), comp["node"] == F.col("doc_id")
    ).select(F.col("label").alias("cluster_id"), "doc_id", "lang")
    lc = m.groupBy("cluster_id", "lang").agg(F.count(F.lit(1)).alias("__n"))
    winner = lc.groupBy("cluster_id").agg(
        F.min(
            F.struct((-F.col("__n")).alias("__neg"), F.col("lang").alias("__v"),
                     F.col("__n").alias("__cnt"))
        ).alias("__w")
    ).select(
        "cluster_id", F.col("__w.__v").alias("consensus_lang"),
        F.col("__w.__cnt").alias("__win_n"),
    )
    agg = m.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
    )
    return (
        agg.join(winner, "cluster_id")
        .filter(F.col("n_docs") > 1)
        .select(
            "cluster_id", "consensus_lang",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_langs").cast("long").alias("n_langs"),
            (F.col("n_docs") - F.col("__win_n")).cast("long").alias("n_minority"),
        )
    )


GOPHER_RULES_ORACLE = """
    WITH s AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\\s+'),
                         x -> x <> '') AS toks
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(toks) AS n_words,
             CAST(coalesce(list_sum(list_transform(toks, x -> len(x))), 0)
                  AS DOUBLE) / greatest(len(toks), 1) AS mean_wl,
             CAST(len(list_filter(toks, x -> contains(x, '#')
                                        OR contains(x, '...')
                                        OR contains(x, '…'))) AS DOUBLE)
               / greatest(len(toks), 1) AS symbol_ratio,
             CAST(len(list_filter(toks, x -> regexp_matches(x, '[A-Za-z]')))
                  AS DOUBLE) / greatest(len(toks), 1) AS alpha_ratio,
             len(list_filter(toks, x -> list_contains(
                 ['the','be','to','of','and','that','have','with'],
                 lower(x)))) AS n_stop
      FROM s
    ), r AS (
      SELECT doc_id, n_words, mean_wl, symbol_ratio, alpha_ratio, n_stop,
             list_filter([
               CASE WHEN n_words < 20 THEN 'too_few_words' END,
               CASE WHEN n_words > 80 THEN 'too_many_words' END,
               CASE WHEN mean_wl < 3.2 THEN 'mean_word_len_low' END,
               CASE WHEN mean_wl > 4.2 THEN 'mean_word_len_high' END,
               CASE WHEN symbol_ratio > 0.1 THEN 'symbol_ratio_high' END,
               CASE WHEN alpha_ratio < 0.8 THEN 'alpha_ratio_low' END,
               CASE WHEN n_stop < 1 THEN 'too_few_stopwords' END
             ], x -> x IS NOT NULL) AS reasons
      FROM m
    )
    SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
           round(mean_wl, 6) AS mean_word_len,
           round(symbol_ratio, 6) AS symbol_ratio,
           round(alpha_ratio, 6) AS alpha_ratio,
           CAST(n_stop AS BIGINT) AS n_stopwords,
           len(reasons) = 0 AS keep,
           coalesce(array_to_string(reasons, ','), '') AS fail_reasons
    FROM r
"""


def _r7_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery (operators.text.gopher_rules) with thresholds
    fitted to the synthetic corpus (20-80 words, mean word length
    3.2-4.2, >=1 stopword) so keeps and every fail reason both occur.
    One scan, zero shuffles: all seven rules are array expressions over
    the token split, and the fail_reasons audit column is built from
    the same conditions — no second pass, no Python."""
    from knime_core_columnar_spark.operators.text import gopher_rules

    d = _tw(spark, sf_dir, "documents")
    return gopher_rules(
        d, min_words=20, max_words=80, min_mean_word_len=3.2,
        max_mean_word_len=4.2, max_symbol_ratio=0.1,
        min_alpha_ratio=0.8, min_stopwords=1,
    )


C4_LINE_FILTER_ORACLE = """
    WITH t AS (
      SELECT doc_id, replace(text, ' table ', '.' || chr(10)) AS text2
      FROM documents
    ), s AS (
      SELECT doc_id, text2,
             list_filter(list_transform(string_split(text2, chr(10)),
                                        x -> trim(x)),
                         x -> x <> '') AS lines
      FROM t
    ), k AS (
      SELECT doc_id, text2, lines,
             list_filter(lines, x ->
                 len(list_filter(string_split_regex(x, '\\s+'),
                                 w -> w <> '')) >= 4
                 AND regexp_matches(x, '[.!?"'']$')
                 AND NOT contains(lower(x), 'javascript')
                 AND NOT contains(lower(x), '{')) AS kept
      FROM s
    )
    SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept_lines,
           coalesce(array_to_string(kept, chr(10)), '') AS clean_text,
           (len(kept) >= 2
            AND NOT contains(lower(text2), 'lorem ipsum')) AS keep
    FROM k
"""


def _r7_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-level cleaner (operators.text.c4_line_filter). The
    synthetic corpus has no natural newlines, so the query first
    synthesizes line structure deterministically — every literal
    ' table ' becomes '.' + newline (identical left-to-right
    non-overlapping replace in both engines) — then applies the real
    operator: terminal-punctuation + min-4-words + blocklist line
    rules, document dropped under 2 surviving lines. Pure Catalyst
    (split / filter / array_join), no explode, no shuffle."""
    from knime_core_columnar_spark.operators.text import c4_line_filter

    d = _t(spark, sf_dir, "documents")
    d2 = d.withColumn(
        "text", F.replace(F.col("text"), F.lit(" table "), F.lit(".\n"))
    )
    return c4_line_filter(
        d2, min_words_per_line=4, require_terminal_punct=True,
        min_kept_lines=2,
    )


# Direct registration (round-7 refactor: the staged-batch dicts and
# register_rX_queries() gating are gone — every section registers at
# import, and catalog/rotation.py orders the driver window).
QUERIES["cms_frequency"] = _r7_cms_frequency
ORACLES["cms_frequency"] = CMS_FREQUENCY_ORACLE
QUERIES["gopher_rules"] = _r7_gopher_rules
ORACLES["gopher_rules"] = GOPHER_RULES_ORACLE
QUERIES["c4_line_filter"] = _r7_c4_line_filter
ORACLES["c4_line_filter"] = C4_LINE_FILTER_ORACLE
QUERIES["set_similarity_join"] = _r7_set_similarity_join
ORACLES["set_similarity_join"] = SET_SIMILARITY_JOIN_ORACLE
QUERIES["golden_record"] = _r7_golden_record
ORACLES["golden_record"] = GOLDEN_RECORD_ORACLE
QUERIES["source_quota_sample"] = _r7_source_quota_sample
ORACLES["source_quota_sample"] = SOURCE_QUOTA_SAMPLE_ORACLE
QUERIES["cluster_consensus_lang"] = _r7_cluster_consensus_lang
ORACLES["cluster_consensus_lang"] = CLUSTER_CONSENSUS_LANG_ORACLE
