"""Round-8 in-round extensions: PSL-backed registered domains (closing
the documented last-two-labels heuristic at operators/web.py) and real
Common-Crawl WARC response parsing (nested HTTP block split — the
round-7 verdict's top two web-crawl-fidelity items).

Every entry follows the registry determinism rules (_registry.py
docstring): every computed column aliased identically on both sides;
the PSL oracle SQL is GENERATED from the same rule data the engine
compiles (operators/psl.registered_domain_sql), so engine and oracle
cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from knime_core_columnar_spark.catalog._registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    _t,
    query,
)
from knime_core_columnar_spark.operators.psl import registered_domain_sql

# ---------------------------------------------------------------------------
# psl_registered_domain — every PSL rule tier exercised from synthesized
# hosts over the documents corpus: 2-label ccSLD (co.uk/com.au), the US
# k12 3-label hierarchy, a US-state 2-label, a *.np wildcard, the
# !www.ck exception (both exact and as a parent), a plain .com, and a
# bare-suffix fallback.
# ---------------------------------------------------------------------------

_HOST_CASE_SPARK = """
    CASE CAST(doc_id % 8 AS INT)
      WHEN 0 THEN concat('shop', CAST(doc_id % 5 AS STRING), '.co.uk')
      WHEN 1 THEN concat('news', CAST(doc_id % 5 AS STRING), '.com.au')
      WHEN 2 THEN concat('district', CAST(doc_id % 5 AS STRING),
                         '.k12.ma.us')
      WHEN 3 THEN concat('city', CAST(doc_id % 5 AS STRING), '.ma.us')
      WHEN 4 THEN concat('site', CAST(doc_id % 5 AS STRING),
                         '.example', CAST(doc_id % 3 AS STRING), '.np')
      WHEN 5 THEN concat(CASE WHEN doc_id % 16 = 5 THEN 'sub.' ELSE '' END,
                         'www.ck')
      WHEN 6 THEN concat('blog', CAST(doc_id % 5 AS STRING),
                         '.example.com')
      ELSE 'co.uk'
    END
"""

_HOST_CASE_DUCK = """
    CASE CAST(doc_id % 8 AS INT)
      WHEN 0 THEN 'shop' || CAST(doc_id % 5 AS VARCHAR) || '.co.uk'
      WHEN 1 THEN 'news' || CAST(doc_id % 5 AS VARCHAR) || '.com.au'
      WHEN 2 THEN 'district' || CAST(doc_id % 5 AS VARCHAR) || '.k12.ma.us'
      WHEN 3 THEN 'city' || CAST(doc_id % 5 AS VARCHAR) || '.ma.us'
      WHEN 4 THEN 'site' || CAST(doc_id % 5 AS VARCHAR)
                  || '.example' || CAST(doc_id % 3 AS VARCHAR) || '.np'
      WHEN 5 THEN (CASE WHEN doc_id % 16 = 5 THEN 'sub.' ELSE '' END)
                  || 'www.ck'
      WHEN 6 THEN 'blog' || CAST(doc_id % 5 AS VARCHAR) || '.example.com'
      ELSE 'co.uk'
    END
"""


@query(
    "psl_registered_domain",
    f"""
    WITH h AS (
      SELECT doc_id, {_HOST_CASE_DUCK} AS host FROM documents
    )
    SELECT host,
           {registered_domain_sql("host")} AS registered_domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM h GROUP BY host
    """,
)
def _r8x_psl_registered_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSL-backed registrable domains (operators.psl.registered_domain
    — the publicsuffix.org algorithm over the embedded ICANN-section
    subset, as a pure-Catalyst tiered CASE with literal IN-sets): hosts
    synthesized over the documents corpus exercise every rule tier —
    co.uk/com.au ccSLDs, the k12.ma.us 3-label hierarchy, a ma.us
    state suffix, the *.np wildcard, the !www.ck exception (exact and
    under a subdomain), plain .com, and the bare-suffix fallback. The
    oracle's CASE expression is GENERATED from the same rule tuples
    (psl.registered_domain_sql). Zero exchanges before the final
    host-keyed rollup."""
    from knime_core_columnar_spark.operators.psl import registered_domain

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_HOST_CASE_SPARK).alias("host")
    )
    return (
        d.withColumn("registered_domain", registered_domain("host"))
        .groupBy("host", "registered_domain")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# ---------------------------------------------------------------------------
# warc_http_parse — the real-Common-Crawl record shape: response records
# whose WARC body nests a full HTTP message. write_warc(http_wrap=True)
# emits it; read_warc splits status / content-type / payload. The
# byte-level burden is carried by tests/test_r8_round8.py (hand-built CC
# record, independent of the writer), per the round-7 verdict's
# TRUE-oracle pairing rule.
# ---------------------------------------------------------------------------


@query(
    "warc_http_parse",
    """
    SELECT CAST(('0x' || substring(md5('https://example.test/doc/'
                                       || CAST(doc_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 8 AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_records,
           TRUE AS all_match,
           TRUE AS all_http_ok
    FROM documents
    GROUP BY 1
    """,
)
def _r8x_warc_http_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-Crawl-shaped WARC round-trip (sources.warc with
    ``http_wrap=True``): every record's WARC body nests an HTTP
    response message; ``read_warc`` must split it so ``payload``
    round-trips the source text byte-exactly (``all_match``) and the
    HTTP status/content-type parse out (``all_http_ok``) — both
    engine-side invariants asserted TRUE by the oracle alongside the
    exactly-replayed per-file record counts. Shares the roundtrip
    harness with ``warc_roundtrip`` (round7_ext._warc_roundtrip_frame)."""
    from knime_core_columnar_spark.catalog.round7_ext import (
        _warc_roundtrip_frame,
    )

    return _warc_roundtrip_frame(
        spark, sf_dir, "kccs_warc_http", http_wrap=True,
        payload_col="payload",
        extra_aggs=[
            F.min(
                (F.col("http_status") == 200)
                & (F.col("http_content_type")
                   == "text/plain; charset=utf-8")
            ).alias("all_http_ok")
        ],
    )
