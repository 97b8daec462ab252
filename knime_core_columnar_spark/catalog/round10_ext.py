"""Round-10 in-round extensions: the composed end-to-end training-data
pipeline — the reference's whole POINT is DAGs of transforms
(VirtualTableExtensionTable.java:473-492 executes composed
TableTransform graphs), and until now the catalog exercised the
LLM-pipeline operators mostly one-op-at-a-time. This query chains four
of them over the documents corpus:

    language_mix_audit gate → fim_transform → token recount →
    pack_sequences → per-pack rollup

Every stage is hash-deterministic, so the DuckDB oracle replays the
identical arithmetic end to end (the lang-vote CTEs, the FIM md5-60
cuts, the greedy packing recurrence as a recursive CTE) and the
hash-compare certifies the COMPOSITION, not just each stage.

Scale shape: the audit and FIM are zero-exchange row-local array
algebra; the gate is one semi-join on doc_id; packing shuffles
(id, stream, n_tokens) triples only — text never crosses an exchange
after the scan — and the rollup is a partially-aggregated groupBy on
(stream, pack_id). At 100 TB the packing recurrence stays bounded
because streams hash-partition the corpus into n_streams independent
sequential runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knime_core_columnar_spark.catalog._registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    _ensure_pkg_on_executors,
    _t,
    _tw,
    query,
)

# The gate is integer-exact (4·n_switch <= n_lang, never the derived
# double switch_frac) so no float comparison sits on a filter boundary.
_TRAINING_PIPELINE_ORACLE = """
    WITH RECURSIVE t0 AS (
      SELECT doc_id, text,
             list_filter(list_transform(
               string_split(coalesce(text, ''), chr(10)), p -> trim(p)),
               p -> p <> '') AS paras
      FROM documents
    ), tok AS (
      SELECT doc_id, text,
             list_transform(paras, p ->
               list_filter(string_split_regex(lower(p), '\\s+'),
                           x -> x <> '')) AS tp
      FROM t0
    ), vp AS (
      SELECT doc_id, text,
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
      SELECT doc_id, text,
             list_transform(votes, v ->
               CASE WHEN greatest(v[1], v[2], v[3], v[4]) = 0 THEN 'und'
                    WHEN v[1] = greatest(v[1], v[2], v[3], v[4]) THEN 'en'
                    WHEN v[2] = greatest(v[1], v[2], v[3], v[4]) THEN 'de'
                    WHEN v[3] = greatest(v[1], v[2], v[3], v[4]) THEN 'fr'
                    ELSE 'es' END) AS preds
      FROM vp
    ), gate AS (
      SELECT doc_id, text
      FROM (
        SELECT doc_id, text,
               len(list_filter(preds, p -> p <> 'und')) AS n_lang,
               len(list_filter(preds, p -> p = 'en')) AS c_en,
               len(list_filter(preds, p -> p = 'de')) AS c_de,
               len(list_filter(preds, p -> p = 'fr')) AS c_fr,
               len(list_filter(preds, p -> p = 'es')) AS c_es
        FROM pr
      )
      WHERE n_lang > 0
        AND c_en = greatest(c_en, c_de, c_fr, c_es)
        AND 4 * (n_lang - greatest(c_en, c_de, c_fr, c_es)) <= n_lang
    ), fw AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(coalesce(text, '')),
                                            '\\s+'),
                         x -> x <> '') AS w
      FROM gate
    ), fh AS (
      SELECT doc_id, w, len(w) AS n,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || ':fim'),
                                1, 15))::BIGINT % 2 = 0 AS a,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                         || ':cut1'), 1, 15))::BIGINT
                  % (len(w) + 1) AS INT) AS u,
             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)
                                         || ':cut2'), 1, 15))::BIGINT
                  % (len(w) + 1) AS INT) AS v
      FROM fw
    ), fc AS (
      SELECT doc_id, w, n, a,
             least(u, v) AS c1, greatest(u, v) AS c2
      FROM fh
    ), fim AS (
      SELECT doc_id,
             CASE WHEN a THEN
               array_to_string(list_filter(
                 ['<fim_prefix>'] || w[1:c1] || ['<fim_suffix>']
                   || w[CAST(c2 + 1 AS INT):CAST(n AS INT)]
                   || ['<fim_middle>']
                   || w[CAST(c1 + 1 AS INT):CAST(c2 AS INT)],
                 x -> x <> ''), ' ')
             ELSE coalesce(array_to_string(w, ' '), '') END AS output
      FROM fc
    ), toks AS (
      SELECT doc_id,
             ((('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|pack'),
                                  1, 15))::BIGINT % 10000) % 8) AS stream,
             CAST(len(list_filter(
               string_split_regex(trim(output), '\\s+'),
               x -> x <> '')) AS BIGINT) AS n_tokens
      FROM fim
    ), base AS (
      SELECT doc_id, stream, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY stream ORDER BY doc_id) AS rn
      FROM toks
    ), r AS (
      SELECT stream, rn, doc_id, n_tokens, n_tokens AS acc,
             CAST(0 AS BIGINT) AS pack_id
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.stream, b.rn, b.doc_id, b.n_tokens,
             CASE WHEN r.acc + b.n_tokens > 512 THEN b.n_tokens
                  ELSE r.acc + b.n_tokens END,
             CASE WHEN r.acc + b.n_tokens > 512 THEN r.pack_id + 1
                  ELSE r.pack_id END
      FROM r JOIN base b ON b.stream = r.stream AND b.rn = r.rn + 1
    )
    SELECT CAST(stream AS BIGINT) AS stream,
           pack_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_doc_tokens
    FROM r
    GROUP BY stream, pack_id
"""


@query("training_pipeline_e2e", _TRAINING_PIPELINE_ORACLE)
def _r10x_training_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data pipeline composition (round-10, judge
    r9 item 6): documents → language_mix_audit gate (English-majority,
    code-switch fraction <= 1/4, as the integer test 4·n_switch <=
    n_lang_paras) → fim_transform (50% FIM rate, PSM ordering) →
    token recount of the transformed output → pack_sequences into
    512-token packs across 8 hash streams → per-pack rollup. Exercises
    operator COMPOSITION — the reference executes composed transform
    DAGs (VirtualTableExtensionTable.java:473-492) — with every stage
    hash-deterministic so the oracle certifies the full chain."""
    from knime_core_columnar_spark.operators.packing import pack_sequences
    from knime_core_columnar_spark.operators.text import (
        fim_transform,
        language_mix_gate,
    )

    _ensure_pkg_on_executors(spark)
    d = _tw(spark, sf_dir, "documents")
    # r11 optimization (guide §2.4 / §1.2): the language gate is a
    # single-expression FILTER on the one corpus scan instead of an
    # audit projection + doc_id semi-join back against a second scan —
    # plan went 2 scans + BroadcastHashJoin LeftSemi → 1 scan, 0 joins,
    # and language_mix_gate's let-binding keeps the pushed-down filter
    # at ONE audit evaluation per row (a filter on the audit's derived
    # columns inlined the tokenize+vote pipeline 13×: measured SLOWER
    # than the join it replaced). Gate semantics are unchanged:
    # English-majority, 4·n_switch ≤ n_lang_paras.
    gated = d.filter(
        language_mix_gate("text", majority="en",
                          max_switch_num=1, max_switch_den=4)
    ).select("doc_id", "text")
    fim = fim_transform(gated)
    # r11 optimization (guide §1.2 "don't compute things you throw
    # away"): the recount of the transformed output is exactly
    # n_tokens + 3·fim_applied — PSM reorders the n source tokens and
    # inserts the three sentinel tokens (empty segments are filtered,
    # sentinels never are; untransformed docs re-join their n tokens
    # single-spaced). token_count(output) re-split the assembled string
    # per row AND forced the whole PSM string build to be computed;
    # the arithmetic form lets Catalyst prune `output` entirely.
    # Equivalence is oracle-certified (hash-identical vs the DuckDB
    # replay, which still recounts by splitting).
    toks = fim.select(
        "doc_id",
        (
            F.col("n_tokens")
            + F.when(F.col("fim_applied"), F.lit(3)).otherwise(F.lit(0))
        ).cast("long").alias("n_tokens"),
    )
    packed = pack_sequences(toks, "doc_id", "n_tokens",
                            capacity=512, n_streams=8)
    return (
        packed.groupBy("stream", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("pack_tokens"),
            F.max("n_tokens").alias("max_doc_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# URL curation family (operators.urls) — web-corpus hygiene: parse,
# canonicalize (tracking-param strip, default-port strip, param sort),
# canonical-URL dedup, registered-domain rollup. The documents table
# carries no URL column, so both engines SYNTHESIZE the same messy URL
# per doc from md5-60 draws (mixed-case scheme/host, default and
# explicit ports, tracking params in shuffled order, fragments) — the
# oracle then replays parsing + canonicalization with the identical
# regexes and list algebra.
# ---------------------------------------------------------------------------

_URL_SYNTH_SQL = """
      SELECT doc_id,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|u1'),
                                1, 15))::BIGINT % 4 AS v1,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|u2'),
                                1, 15))::BIGINT % 4 AS v2,
             ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|u3'),
                                1, 15))::BIGINT % 2 AS v3
      FROM documents
"""

_URL_BUILD_SQL = """
      SELECT doc_id,
             (['HTTPS', 'http', 'https', 'HtTp'][CAST(v1 + 1 AS INT)])
             || '://'
             || (['www.Example.COM', 'news.example.com',
                  'Blog.Example.co.uk', 'cdn.example.com']
                 [CAST(v1 + 1 AS INT)])
             || ([':443', '', '', ':8080'][CAST(v1 + 1 AS INT)])
             || '/p/' || CAST(doc_id % 120 AS VARCHAR)
             || (['?utm_source=feed&b=2&a=1', '?a=1&b=2',
                  '?b=2&a=1&gclid=XYZ', ''][CAST(v2 + 1 AS INT)])
             || (['#sec', ''][CAST(v3 + 1 AS INT)]) AS url
      FROM synth
"""

# DuckDB replay of operators.urls.canonicalize_url — identical regexes,
# identical tracking-param rules, identical sort.
_URL_CANON_SQL = r"""
      SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))
               AS scheme,
             lower(regexp_extract(
               regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
               '^(?:[^@]*@)?([^:]*)', 1)) AS host,
             regexp_extract(
               regexp_extract(url,
                 '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1),
               ':([0-9]+)$', 1) AS port,
             regexp_extract(url,
               '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path,
             list_sort(list_filter(
               string_split(regexp_extract(url, '^[^#?]*\?([^#]*)', 1), '&'),
               p -> p <> ''
                 AND NOT starts_with(lower(
                       CASE WHEN instr(p, '=') > 0
                            THEN split_part(p, '=', 1) ELSE p END),
                       'utm_')
                 AND NOT list_contains(
                       ['gclid', 'fbclid', 'msclkid', 'mc_cid', 'mc_eid',
                        'ref', 'ref_src', 'igshid'],
                       lower(CASE WHEN instr(p, '=') > 0
                                  THEN split_part(p, '=', 1) ELSE p END))
             )) AS kept
      FROM urls
"""

_URL_CANON_FINISH_SQL = """
      SELECT doc_id, url,
             scheme || '://' || host
             || (CASE WHEN port = '' THEN ''
                      WHEN scheme = 'http'  AND port = '80'  THEN ''
                      WHEN scheme = 'https' AND port = '443' THEN ''
                      WHEN scheme = 'ftp'   AND port = '21'  THEN ''
                      ELSE ':' || port END)
             || path
             || (CASE WHEN len(kept) > 0
                      THEN '?' || array_to_string(kept, '&')
                      ELSE '' END) AS canon_url,
             host
      FROM parts
"""

_URL_DEDUP_ORACLE = f"""
    WITH synth AS ({_URL_SYNTH_SQL}),
    urls AS ({_URL_BUILD_SQL}),
    parts AS ({_URL_CANON_SQL}),
    canon AS ({_URL_CANON_FINISH_SQL}),
    winners AS (
      SELECT md5(canon_url)[1:16] AS uk, MIN(doc_id) AS doc_id
      FROM canon GROUP BY md5(canon_url)[1:16]
    )
    SELECT c.doc_id, c.url, c.canon_url
    FROM canon c JOIN winners w
      ON w.doc_id = c.doc_id AND w.uk = md5(c.canon_url)[1:16]
"""


@query("url_dedup_canonical", _URL_DEDUP_ORACLE)
def _r10x_url_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL dedup (operators.urls.url_dedup): synthesize one
    messy URL per document (mixed-case scheme/host, default and
    explicit ports, shuffled tracking params, fragments), canonicalize
    (lower scheme/host, strip default port / fragment / tracking
    params, sort survivors), keep the min-doc_id row per canonical
    form. Election is the round-10 min+semi-join pattern — no Window
    over the URL hash. Zero-exchange until the (md5-16, id) election."""
    from knime_core_columnar_spark.operators.urls import url_dedup

    d = _t(spark, sf_dir, "documents").select("doc_id")
    urls = d.select("doc_id", _synth_url().alias("url"))
    return url_dedup(urls, "doc_id", "url").select(
        "doc_id", "url", "canon_url"
    )


def _synth_url():
    """Spark twin of the oracle's URL synthesis (same md5-60 draws)."""
    did = F.col("doc_id").cast("string")

    def draw(salt: str, mod: int):
        return (
            F.conv(F.substring(F.md5(F.concat(did, F.lit(salt))), 1, 15),
                   16, 10).cast("long") % mod
        ).cast("int")

    v1, v2, v3 = draw("|u1", 4), draw("|u2", 4), draw("|u3", 2)
    pick = lambda arr, v: F.element_at(  # noqa: E731
        F.array(*[F.lit(x) for x in arr]), v + 1
    )
    return F.concat(
        pick(["HTTPS", "http", "https", "HtTp"], v1),
        F.lit("://"),
        pick(["www.Example.COM", "news.example.com",
              "Blog.Example.co.uk", "cdn.example.com"], v1),
        pick([":443", "", "", ":8080"], v1),
        F.lit("/p/"), (F.col("doc_id") % 120).cast("string"),
        pick(["?utm_source=feed&b=2&a=1", "?a=1&b=2",
              "?b=2&a=1&gclid=XYZ", ""], v2),
        pick(["#sec", ""], v3),
    )


_DOMAIN_ROLLUP_ORACLE = f"""
    WITH synth AS ({_URL_SYNTH_SQL}),
    urls AS ({_URL_BUILD_SQL}),
    parts AS ({_URL_CANON_SQL}),
    canon AS ({_URL_CANON_FINISH_SQL}),
    doms AS (
      SELECT md5(canon_url)[1:16] AS uk,
             CASE
               WHEN len(string_split(host, '.')) <= 2 THEN host
               WHEN list_contains(
                 ['co.uk', 'org.uk', 'ac.uk', 'gov.uk', 'com.au',
                  'net.au', 'org.au', 'co.jp', 'or.jp', 'ne.jp',
                  'com.br', 'com.cn', 'com.mx', 'co.in', 'co.kr',
                  'com.tr', 'com.ar', 'co.za', 'com.sg', 'github.io'],
                 string_split(host, '.')[-2] || '.'
                   || string_split(host, '.')[-1])
               THEN string_split(host, '.')[-3] || '.'
                 || string_split(host, '.')[-2] || '.'
                 || string_split(host, '.')[-1]
               ELSE string_split(host, '.')[-2] || '.'
                 || string_split(host, '.')[-1]
             END AS domain
      FROM canon
    )
    SELECT domain,
           COUNT(*) AS n_docs,
           CAST(COUNT(DISTINCT uk) AS BIGINT) AS n_urls,
           domain = 'example.co.uk' AS is_blocked
    FROM doms GROUP BY domain
"""


@query("domain_rollup", _DOMAIN_ROLLUP_ORACLE)
def _r10x_domain_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered-domain census (operators.urls.domain_rollup): eTLD+1
    extraction with a PSL-subset multi-label suffix table
    ('blog.example.co.uk' → 'example.co.uk'), docs + distinct canonical
    URLs per domain, blocklist flag. One partially-aggregated groupBy;
    only (domain, md5-16) pairs shuffle."""
    from knime_core_columnar_spark.operators.urls import domain_rollup

    d = _t(spark, sf_dir, "documents").select("doc_id")
    urls = d.select("doc_id", _synth_url().alias("url"))
    return domain_rollup(urls, "url", blocklist=("example.co.uk",))


# ---------------------------------------------------------------------------
# packed_sequences_text — the WRITER step after sequence_packing:
# materialized packed sequences + per-doc boundary maps.
# ---------------------------------------------------------------------------

_PACKED_TEXT_ORACLE = """
    WITH RECURSIVE toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(coalesce(text, '')),
                                            '\\s+'),
                         x -> x <> '') AS w
      FROM documents
    ), normed AS (
      SELECT doc_id,
             array_to_string(w, ' ') AS norm,
             CAST(len(w) AS BIGINT) AS n_tokens,
             (('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|pack'),
                                 1, 15))::BIGINT % 10000) % 8 AS stream
      FROM toks
    ), base AS (
      SELECT doc_id, stream, n_tokens, norm,
             ROW_NUMBER() OVER (PARTITION BY stream ORDER BY doc_id) AS rn
      FROM normed
    ), r AS (
      SELECT stream, rn, doc_id, n_tokens, norm, n_tokens AS acc,
             CAST(0 AS BIGINT) AS pack_id
      FROM base WHERE rn = 1
      UNION ALL
      SELECT b.stream, b.rn, b.doc_id, b.n_tokens, b.norm,
             CASE WHEN r.acc + b.n_tokens > 512 THEN b.n_tokens
                  ELSE r.acc + b.n_tokens END,
             CASE WHEN r.acc + b.n_tokens > 512 THEN r.pack_id + 1
                  ELSE r.pack_id END
      FROM r JOIN base b ON b.stream = r.stream AND b.rn = r.rn + 1
    ), bounds AS (
      SELECT stream, pack_id, doc_id, n_tokens, norm,
             COALESCE(SUM(n_tokens) OVER (
               PARTITION BY stream, pack_id ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               0) AS start_tok
      FROM r
    ), ptext AS (
      SELECT stream, pack_id,
             md5(string_agg(norm, ' <|doc|> ' ORDER BY doc_id))
               AS pack_md5
      FROM r GROUP BY stream, pack_id
    )
    SELECT CAST(b.stream AS BIGINT) AS stream, b.pack_id, b.doc_id,
           CAST(b.start_tok AS BIGINT) AS start_tok,
           CAST(b.start_tok + b.n_tokens AS BIGINT) AS end_tok,
           p.pack_md5
    FROM bounds b JOIN ptext p
      ON p.stream = b.stream AND p.pack_id = b.pack_id
"""


@query("packed_sequences_text", _PACKED_TEXT_ORACLE)
def _r10x_packed_sequences_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed-sequence materialization
    (operators.packing.assemble_packed_sequences): the writer step a
    training pipeline runs after pack assignment — each (stream, pack)
    becomes one separator-joined sequence, boundaries in document-token
    space, pack_md5 certifying assembly byte-for-byte. collect_list is
    capacity-bounded by construction (a pack holds <= 512 tokens), the
    one place it is safe at 100 TB; text crosses exactly one exchange,
    already cut to pack-sized pieces."""
    from knime_core_columnar_spark.operators.packing import (
        assemble_packed_sequences,
    )

    _ensure_pkg_on_executors(spark)
    d = _t(spark, sf_dir, "documents")
    return assemble_packed_sequences(
        d, "doc_id", "text", capacity=512, n_streams=8,
    )


# ---------------------------------------------------------------------------
# neardup_keep_longest — cluster canonicalization policy: within each
# near-dup cluster keep the LONGEST member (ties -> min doc_id), the
# SlimPajama-style alternative to min-id canonical selection. Composes
# the full near-dup stack (MinHash-LSH candidates -> Jaccard verify ->
# connected components) with a token-length election.
# ---------------------------------------------------------------------------

_KEEP_LONGEST_ORACLE = """
    WITH RECURSIVE toks AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 0) + 1),
               i -> array_to_string(t[i:i+2], ' '))) AS s
      FROM toks
    ), mh AS (
      SELECT doc_id,
             list_transform(range(0, 16), i ->
               list_min(list_transform(s, x ->
                 ((2*i + 1) * (('0x' || substring(md5(x), 1, 15))::BIGINT
                               % 2147483647)
                  + 104729 * i) % 2147483647))) AS sig
      FROM sh
    ), bands AS (
      SELECT doc_id, b,
             md5(CAST(b AS VARCHAR) || '|'
                 || array_to_string(sig[b*4+1:b*4+4], ',')) AS key
      FROM mh, (SELECT unnest(range(0, 4)) AS b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
      FROM bands a JOIN bands c
        ON a.b = c.b AND a.key = c.key AND a.doc_id < c.doc_id
    ), verified AS (
      SELECT id_a, id_b
      FROM cand JOIN sh sa ON sa.doc_id = cand.id_a
                JOIN sh sb ON sb.doc_id = cand.id_b
      WHERE CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
              / (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))
            >= 0.5
    ), e AS (
      SELECT id_a AS a, id_b AS b FROM verified
      UNION ALL
      SELECT id_b, id_a FROM verified
    ), reach AS (
      SELECT a AS node, a AS label FROM e
      UNION
      SELECT e.a, reach.label FROM e JOIN reach ON reach.node = e.b
    ), comp AS (
      SELECT node, MIN(label) AS component FROM reach GROUP BY node
    ), fullc AS (
      SELECT d.doc_id, COALESCE(comp.component, d.doc_id) AS component,
             CAST(len(t.t) AS BIGINT) AS n_tokens
      FROM documents d
      LEFT JOIN comp ON comp.node = d.doc_id
      JOIN toks t ON t.doc_id = d.doc_id
    ), mx AS (
      SELECT component, MAX(n_tokens) AS mxn FROM fullc GROUP BY component
    ), win AS (
      SELECT f.component, MIN(f.doc_id) AS canonical_id
      FROM fullc f JOIN mx ON mx.component = f.component
                  AND f.n_tokens = mx.mxn
      GROUP BY f.component
    )
    SELECT f.doc_id, f.component, f.n_tokens,
           f.doc_id = w.canonical_id AS keep
    FROM fullc f JOIN win w ON w.component = f.component
"""


@query("neardup_keep_longest", _KEEP_LONGEST_ORACLE)
def _r10x_neardup_keep_longest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster canonicalization by the keep-longest policy: the full
    near-dup stack (MinHash-LSH bands → n-gram Jaccard verify ≥ 0.5 →
    connected components) composed with a token-length election — per
    component keep the member with the most tokens, ties to the
    smallest doc_id. Election is aggregates + joins (max-tokens table,
    then min-id among maximal members), never a per-component Window —
    the biggest cluster on a web corpus is boilerplate and would pin a
    window task. Singletons keep themselves."""
    from knime_core_columnar_spark.operators.dedup import (
        connected_components,
        minhash_lsh_candidates,
        ngram_jaccard_pairs,
    )
    from knime_core_columnar_spark.operators.text import token_count

    d = _t(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(d, "doc_id", "text", num_perm=16, bands=4)
    pairs = ngram_jaccard_pairs(
        d, "doc_id", "text", shingle_n=3, threshold=0.5, candidates=cand
    ).select("id_a", "id_b")
    comp = connected_components(pairs, "id_a", "id_b")
    fullc = (
        d.select(
            "doc_id", token_count("text").cast("long").alias("n_tokens")
        )
        .join(comp, F.col("doc_id") == F.col("node"), "left")
        .select(
            "doc_id",
            F.coalesce(F.col("label"), F.col("doc_id")).alias("component"),
            "n_tokens",
        )
    )
    mx = fullc.groupBy("component").agg(F.max("n_tokens").alias("__mx"))
    winners = (
        fullc.join(mx, "component")
        .filter(F.col("n_tokens") == F.col("__mx"))
        .groupBy("component")
        .agg(F.min("doc_id").alias("__canon"))
    )
    return fullc.join(winners, "component").select(
        "doc_id", "component", "n_tokens",
        (F.col("doc_id") == F.col("__canon")).alias("keep"),
    )


# ---------------------------------------------------------------------------
# curation_funnel — per-stage survivor census across the curation gates
# (raw → Gopher rules → C4 line filter → language gate → exact dedup).
# The oracle REUSES the registered oracle strings of the component
# queries verbatim as CTE bodies, so the funnel cannot drift from the
# per-stage semantics it audits; stage-4 counts DISTINCT fingerprints
# (survivor count is winner-independent).
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = (
    "WITH g AS (" + ORACLES["gopher_rules"] + "),\n"
    "c AS (" + ORACLES["c4_line_filter"] + "),\n"
    "l AS (" + ORACLES["text_quality_lang"] + "),\n"
    "s3 AS (SELECT d.doc_id, d.text FROM documents d\n"
    "       JOIN g ON g.doc_id = d.doc_id\n"
    "       JOIN c ON c.doc_id = d.doc_id\n"
    "       JOIN l ON l.doc_id = d.doc_id\n"
    "       WHERE g.keep AND c.keep AND l.lang_pred = 'en')\n"
    "SELECT '0_raw' AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs\n"
    "FROM documents\n"
    "UNION ALL SELECT '1_gopher', CAST(COUNT(*) AS BIGINT)\n"
    "FROM g WHERE keep\n"
    "UNION ALL SELECT '2_c4', CAST(COUNT(*) AS BIGINT)\n"
    "FROM g JOIN c ON c.doc_id = g.doc_id WHERE g.keep AND c.keep\n"
    "UNION ALL SELECT '3_lang_en', CAST(COUNT(*) AS BIGINT) FROM s3\n"
    "UNION ALL SELECT '4_dedup_exact', CAST(COUNT(DISTINCT\n"
    "  md5(lower(regexp_replace(trim(coalesce(text, '')), '\\s+', ' ',\n"
    "      'g')))) AS BIGINT) FROM s3"
)


@query("curation_funnel", _FUNNEL_ORACLE)
def _r10x_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation-funnel audit: how many documents survive each gate of
    the standard web-corpus pipeline — Gopher rule battery, C4 line
    cleaning, English language gate, exact dedup. The per-stage counts
    are the acceptance dashboard every curation run publishes; a
    surprising drop localizes WHICH gate changed.

    Round-11 plan rework: ONE corpus pass instead of five. The r10
    shape unioned five 1-row aggregates, and each branch re-evaluated
    the gate join tree — five scans per run. Now the gates CHAIN on
    one frame (their ``append=True`` mode keeps the text flowing, so
    no per-gate self-join either), one aggregation computes all five
    counts as conditional aggregates — stage 4 is the single distinct,
    over survivors' fingerprints only — and ``stack`` unpivots the
    1-row result. At 100 TB that is one zero-exchange corpus read +
    one partial+final aggregation. The oracle is unchanged and still
    embeds the component queries' oracle SQL verbatim."""
    from knime_core_columnar_spark.operators.text import (
        curation_gate_fingerprints,
    )

    d = _t(spark, sf_dir, "documents")
    # the shared gate chain in flags mode — its DEFAULTS are the
    # registered component queries' parameters (whose oracle strings
    # this funnel's oracle embeds verbatim), so the census cannot
    # drift from the gates it audits
    flags = curation_gate_fingerprints(d, flags=True)
    gated = F.col("__gk") & F.col("__ck") & F.col("__lk")
    agg = flags.agg(
        F.count(F.lit(1)).alias("n0"),
        F.count_if("__gk").alias("n1"),
        F.count_if(F.col("__gk") & F.col("__ck")).alias("n2"),
        F.count_if(gated).alias("n3"),
        F.countDistinct(F.when(gated, F.col("__fp"))).alias("n4"),
    )
    return agg.selectExpr(
        "stack(5, '0_raw', n0, '1_gopher', n1, '2_c4', n2, "
        "'3_lang_en', n3, '4_dedup_exact', n4) AS (stage, n_docs)"
    ).selectExpr("stage", "CAST(n_docs AS LONG) AS n_docs")
