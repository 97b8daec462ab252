"""Round-8 in-round extensions.

First half (the round-7 verdict's top web-crawl-fidelity items):
PSL-backed registered domains (closing the documented last-two-labels
heuristic at operators/web.py), real Common-Crawl WARC response
parsing (nested HTTP block split), and audio/video container header
parsing. Second half: MOSS-style winnowing overlap, corpus-wide
paragraph dedup with reassembly, the full Gopher repetition battery,
EXIF metadata extraction + byte-exact PII strip, Unicode NFC
normalization against DuckDB's independent utf8proc implementation,
and rule-based sentence segmentation.

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
    _tw,
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


# ---------------------------------------------------------------------------
# media_header_meta — audio/video container header parsing
# (operators.multimodal.extract_media_meta). The query synthesizes
# valid WAV and FLAC headers whose fields are pure integer functions of
# (doc_id, n_chars), plus MP3/OGG detection negatives, and parses them
# back; the ORACLE never touches bytes — it computes the same fields in
# CLOSED FORM, so the check is "byte construction → header parse must
# invert the synthesis" with two genuinely independent evaluation
# strategies. (MP4 box-walk durations, non-canonical WAV chunk orders
# and bit-boundary FLAC geometry are pytest-pinned with hand-built
# fixtures — tests/test_media_meta.py.)
# ---------------------------------------------------------------------------

_RATE = ("CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 8000 WHEN 1 THEN 16000 "
         "WHEN 2 THEN 22050 ELSE 44100 END")
_CH = "CAST((doc_id div 4) % 2 + 1 AS INT)"
_BITS = "CAST(8 * ((doc_id div 8) % 2 + 1) AS INT)"
_DSIZE = "CAST((n_chars % 4096) + 1 AS BIGINT)"       # WAV data bytes
_TOTAL = "CAST((n_chars % 100000) + 1 AS BIGINT)"     # FLAC samples
# DuckDB twins (div -> //)
_CH_D = "CAST((doc_id // 4) % 2 + 1 AS INT)"
_BITS_D = "CAST(8 * ((doc_id // 8) % 2 + 1) AS INT)"


def _le_sql(expr: str, n: int) -> str:
    """Spark-SQL little-endian byte rendering of an integer expression."""
    return "concat(" + ", ".join(
        f"unhex(lpad(hex(CAST(({expr}) div {256 ** k} AS BIGINT) % 256), 2, '0'))"
        for k in range(n)
    ) + ")"


def _media_payload_sql() -> str:
    # canonical PCM WAV: RIFF header, 16-byte fmt chunk, data chunk id +
    # size (header-only payload: the parser reads offsets, not samples)
    wav = (
        "concat(unhex('52494646'), "
        + _le_sql(f"36 + ({_DSIZE})", 4)
        + ", unhex('57415645'), unhex('666D7420'), "
        + _le_sql("16", 4) + ", " + _le_sql("1", 2) + ", "
        + _le_sql(_CH, 2) + ", " + _le_sql(_RATE, 4) + ", "
        + _le_sql(f"({_RATE}) * ({_CH}) * ({_BITS}) div 8", 4) + ", "
        + _le_sql(f"({_CH}) * ({_BITS}) div 8", 2) + ", "
        + _le_sql(_BITS, 2)
        + ", unhex('64617461'), " + _le_sql(_DSIZE, 4) + ")"
    )
    # FLAC: magic + last-block STREAMINFO header (length 34) + block/frame
    # size constants + the 64-bit field pack (rate 20 | ch-1 3 | bps-1 5 |
    # total 36, big-endian) + zero md5
    packed = (f"CAST({_RATE} AS BIGINT) * 17592186044416 "      # << 44
              f"+ CAST(({_CH}) - 1 AS BIGINT) * 2199023255552 "  # << 41
              f"+ CAST(({_BITS}) - 1 AS BIGINT) * 68719476736 "  # << 36
              f"+ ({_TOTAL})")
    flac = (
        "concat(unhex('664C61438000002203E803E8000000000000'), "
        f"unhex(lpad(hex({packed}), 16, '0')), "
        "unhex(repeat('00', 16)))"
    )
    return f"""
      CASE CAST(doc_id % 3 AS INT)
        WHEN 0 THEN {wav}
        WHEN 1 THEN {flac}
        ELSE IF(doc_id % 2 = 0,
                unhex(concat('494433', repeat('00', 10))),
                unhex(concat('4F676753', repeat('00', 10))))
      END
    """


_MEDIA_ORACLE = f"""
    SELECT doc_id,
           CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN 'wav' WHEN 1 THEN 'flac'
             ELSE CASE WHEN doc_id % 2 = 0 THEN 'mp3' ELSE 'ogg' END
           END AS media_format,
           CASE WHEN doc_id % 3 IN (0, 1) THEN CAST({_RATE} AS INT)
           END AS sample_rate,
           CASE WHEN doc_id % 3 IN (0, 1) THEN {_CH_D} END AS channels,
           CASE WHEN doc_id % 3 IN (0, 1) THEN {_BITS_D}
           END AS bits_per_sample,
           CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN CAST((8000 * ((n_chars % 4096) + 1))
                              // (({_RATE}) * {_CH_D} * {_BITS_D})
                              AS BIGINT)
             WHEN 1 THEN CAST((((n_chars % 100000) + 1) * 1000)
                              // ({_RATE}) AS BIGINT)
           END AS duration_ms
    FROM documents
"""


# ---------------------------------------------------------------------------
# dedup_paragraphs — corpus-wide exact paragraph dedup with document
# reassembly (C4 §2.2 / RefinedWeb §3.3 sub-document tier). Paragraph
# structure is synthesized with the same engine-identical left-to-right
# replace idiom as c4_line_filter (the corpus has no natural newlines);
# the oracle replays split -> trim -> first-occurrence election ->
# ordered reassembly relationally.
# ---------------------------------------------------------------------------


@query(
    "dedup_paragraphs",
    """
    WITH t AS (
      SELECT doc_id, replace(text, ' table ', chr(10)) AS text2
      FROM documents
    ), p AS (
      SELECT doc_id,
             unnest(range(1, len(paras) + 1)) AS pos,
             trim(unnest(paras)) AS para
      FROM (SELECT doc_id, string_split(text2, chr(10)) AS paras FROM t)
    ), k AS (
      SELECT doc_id, pos, para,
             row_number() OVER (PARTITION BY md5(para)
                                ORDER BY doc_id, pos) AS rn
      FROM p WHERE para <> ''
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_paras,
           CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           coalesce(string_agg(CASE WHEN rn = 1 THEN para END, chr(10)
                               ORDER BY pos), '') AS clean_text
    FROM k GROUP BY doc_id
    """,
)
def _r8x_dedup_paragraphs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact paragraph dedup keeping the global first
    occurrence, documents reassembled from survivors
    (operators.dedup.dedup_paragraphs — the C4/RefinedWeb sub-document
    dedup stage whole-document dedup cannot express: repeated
    boilerplate paragraphs vanish everywhere but their first sighting).
    Paragraph structure is synthesized deterministically (every literal
    ' table ' becomes a newline, identical left-to-right non-overlapping
    replace in both engines — the proven c4_line_filter idiom); the
    operator then runs unmodified: posexplode, one hash-keyed
    first-occurrence window, one id-keyed reassembly aggregation."""
    from knime_core_columnar_spark.operators.dedup import dedup_paragraphs

    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.replace(F.col("text"), F.lit(" table "), F.lit("\n"))
    )
    return dedup_paragraphs(d, "doc_id", "text", sep="\n")


# ---------------------------------------------------------------------------
# normalize_nfc — Unicode NFC normalization. The corpus is ASCII, so
# the query plants decomposed sequences deterministically (every 'a'
# gains U+0301, every literal ' value ' becomes the ligature ﬁ + a
# full-width digit — the latter exercises that NFC must NOT touch
# compatibility characters); the oracle is DuckDB's utf8proc
# nfc_normalize — an entirely independent Unicode implementation
# against Python's unicodedata.
# ---------------------------------------------------------------------------


@query(
    "normalize_nfc",
    """
    WITH t AS (
      SELECT doc_id,
             replace(replace(text, ' value ', ' ﬁ１ '),
                     'a', 'a' || chr(769)) AS text2
      FROM documents
    )
    SELECT doc_id,
           nfc_normalize(text2) AS norm_text,
           nfc_normalize(text2) <> text2 AS changed
    FROM t
    """,
)
def _r8x_normalize_nfc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization (operators.text.normalize_unicode,
    Arrow-batched unicodedata): decomposed a+COMBINING-ACUTE sequences
    are planted on every 'a' (NFC composes them to á) and ﬁ/full-width
    １ on every ' value ' (compatibility characters NFC must PRESERVE —
    the NFKC-vs-NFC distinction), then engine and DuckDB's utf8proc
    normalizer must agree byte-for-byte, including the per-row
    ``changed`` audit flag."""
    from knime_core_columnar_spark.operators.text import normalize_unicode

    d = _t(spark, sf_dir, "documents").withColumn(
        "text",
        F.replace(
            # ligature plant FIRST: decomposing 'a' afterwards must not
            # rewrite the ' value ' needle (review finding — the old
            # inner-first order turned 'value' into 'va\u0301lue' and
            # made the compat-char coverage dead in BOTH engines)
            F.replace(F.col("text"), F.lit(" value "), F.lit(" ﬁ１ ")),
            F.lit("a"),
            F.lit("a\u0301"),  # decomposed: a + COMBINING ACUTE
        ),
    )
    return normalize_unicode(d, "doc_id", "text", form="NFC")


# ---------------------------------------------------------------------------
# split_sentences — rule-based sentence segmentation (the 1->N
# primitive under sentence-level contamination / span dedup). Sentence
# punctuation synthesized with the proven replace idiom; oracle replays
# the identical marker-rewrite + split relationally.
# ---------------------------------------------------------------------------


@query(
    "split_sentences",
    """
    WITH t AS (
      SELECT doc_id,
             regexp_replace(replace(text, ' table ', '. '),
                            '([.!?]) +', '\\1' || chr(1), 'g') AS marked
      FROM documents
    ), s AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(marked, chr(1)),
                                        x -> trim(x)),
                         x -> x <> '') AS sents
      FROM t
    )
    SELECT doc_id,
           CAST(unnest(range(0, len(sents))) AS INT) AS sent_idx,
           unnest(sents) AS sentence
    FROM s
    """,
)
def _r8x_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence segmentation (operators.text.split_sentences): terminal
    punctuation + whitespace boundaries via a lookahead-free marker
    rewrite, replayed with the identical two steps in DuckDB (RE2 has
    no lookahead — the design constraint IS the portability proof).
    Sentence punctuation is synthesized with the ' table ' -> '. '
    replace idiom. Zero exchanges before the consumer."""
    from knime_core_columnar_spark.operators.text import split_sentences

    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.replace(F.col("text"), F.lit(" table "), F.lit(". "))
    )
    return split_sentences(d, "doc_id", "text")


# ---------------------------------------------------------------------------
# dedup_sentence_spans — the literal C4 §2.2 three-sentence-span dedup
# (operators.text.dedup_sentence_spans), completing the sub-document
# family at sentence granularity. Sentence punctuation synthesized with
# the ' table ' -> '. ' idiom; the oracle replays segmentation ->
# span election -> coverage removal -> reassembly relationally.
# ---------------------------------------------------------------------------


@query(
    "dedup_sentence_spans",
    """
    WITH t AS (
      SELECT doc_id, replace(text, ' table ', '. ') AS text2
      FROM documents
    ), m AS (
      SELECT doc_id,
             regexp_replace(text2, '([.!?]) +', '\\1' || chr(1), 'g')
               AS marked
      FROM t
    ), s AS (
      SELECT doc_id,
             list_filter(list_transform(string_split(marked, chr(1)),
                                        x -> trim(x)),
                         x -> x <> '') AS sents
      FROM m
    ), sp AS (
      SELECT doc_id,
             unnest(range(1, greatest(len(sents) - 2, 0) + 1)) AS pos,
             unnest(list_transform(
               range(1, greatest(len(sents) - 2, 0) + 1),
               i -> md5(array_to_string(sents[i:i+2], chr(1))))) AS h
      FROM s
    ), rn AS (
      SELECT doc_id, pos, h,
             row_number() OVER (PARTITION BY h ORDER BY doc_id, pos)
               AS rn
      FROM sp
    ), cuts AS (
      SELECT DISTINCT doc_id, cut
      FROM rn, UNNEST(generate_series(pos, pos + 2)) u(cut)
      WHERE rn > 1
    ), agg AS (
      SELECT doc_id, count(*) AS n_cut, list(cut) AS cl
      FROM cuts GROUP BY doc_id
    )
    SELECT s.doc_id,
           CAST(len(s.sents) AS BIGINT) AS n_sentences,
           CAST(COALESCE(agg.n_cut, 0) AS BIGINT) AS n_removed,
           array_to_string(
             list_filter(
               list_transform(range(1, len(s.sents) + 1),
                 i -> CASE WHEN NOT COALESCE(list_contains(agg.cl, i),
                                             FALSE)
                           THEN s.sents[i] END),
               x -> x IS NOT NULL),
             ' ') AS clean_text
    FROM s LEFT JOIN agg USING (doc_id)
    """,
)
def _r8x_dedup_sentence_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide three-sentence-span dedup — the LITERAL C4 §2.2
    rule ("we removed all but one of any three-sentence span occurring
    more than once"), at sentence granularity on the synthesized
    sentence structure. Globally-first occurrence survives; every
    other occurrence's sentences are deleted and documents reassembled
    from survivors. The oracle replays segmentation, span election,
    coverage removal, and ordered reassembly relationally."""
    from knime_core_columnar_spark.operators.text import (
        dedup_sentence_spans,
    )

    d = _t(spark, sf_dir, "documents").withColumn(
        "text", F.replace(F.col("text"), F.lit(" table "), F.lit(". "))
    )
    return dedup_sentence_spans(d, "doc_id", "text", span_sentences=3)


# ---------------------------------------------------------------------------
# exif_meta — EXIF extraction + PII strip (operators.multimodal.
# extract_exif_meta / strip_exif_jpeg). The query synthesizes valid
# EXIF JPEGs byte-by-byte from doc_id (big-endian TIFF, two fixed
# layouts: with and without a GPSInfo IFD), parses them back, strips
# the APP1, and re-parses; the oracle computes every field in CLOSED
# FORM without touching bytes — construction, parse, and strip must be
# exact inverses for the hash to match (the media_header_meta design).
# Byte-level adversarial cases (truncation, fill bytes, little-endian,
# inline ASCII, multi-APP1) are pytest-pinned per the TRUE-oracle
# pairing rule.
# ---------------------------------------------------------------------------

# Layout A (gps): IFD0 n=3 @8 (42 B) -> ExifIFD @50 (18 B) ->
# datetime @68 (20 B) -> GPS IFD @88 (6 B); TIFF 94 B, APP1 len 0x66,
# file 108 B. Layout B (no gps): n=2, ExifIFD @38, datetime @56;
# TIFF 76 B, APP1 len 0x54, file 90 B.
_EXIF_PRE_A = ("FFD8FFE10066457869660000" "4D4D002A00000008" "0003"
               "0112000300000001")
_EXIF_MID_A = ("0000" "876900040000000100000032"
               "882500040000000100000058" "00000000" "0001"
               "900300020000001400000044" "00000000")
_EXIF_TAIL_A = "00" "000000000000" "FFD9"      # NUL + empty GPS IFD + EOI
_EXIF_PRE_B = ("FFD8FFE10054457869660000" "4D4D002A00000008" "0002"
               "0112000300000001")
_EXIF_MID_B = ("0000" "876900040000000100000026" "00000000" "0001"
               "900300020000001400000038" "00000000")
_EXIF_TAIL_B = "00" "FFD9"

_EXIF_DT_SPARK = (
    "concat(CAST(2020 + doc_id % 5 AS STRING), ':', "
    "lpad(CAST(1 + doc_id % 12 AS STRING), 2, '0'), ':', "
    "lpad(CAST(1 + doc_id % 28 AS STRING), 2, '0'), ' ', "
    "lpad(CAST(doc_id % 24 AS STRING), 2, '0'), ':', "
    "lpad(CAST(doc_id % 60 AS STRING), 2, '0'), ':', "
    "lpad(CAST((doc_id * 7) % 60 AS STRING), 2, '0'))"
)
_EXIF_DT_DUCK = (
    "CAST(2020 + doc_id % 5 AS VARCHAR) || ':' || "
    "lpad(CAST(1 + doc_id % 12 AS VARCHAR), 2, '0') || ':' || "
    "lpad(CAST(1 + doc_id % 28 AS VARCHAR), 2, '0') || ' ' || "
    "lpad(CAST(doc_id % 24 AS VARCHAR), 2, '0') || ':' || "
    "lpad(CAST(doc_id % 60 AS VARCHAR), 2, '0') || ':' || "
    "lpad(CAST((doc_id * 7) % 60 AS VARCHAR), 2, '0')"
)

_EXIF_PAYLOAD_SPARK = f"""
    CASE CAST(doc_id % 3 AS INT)
      WHEN 0 THEN concat(unhex('{_EXIF_PRE_A}'),
                         unhex(lpad(hex(1 + doc_id % 8), 4, '0')),
                         unhex('{_EXIF_MID_A}'),
                         cast({_EXIF_DT_SPARK} as binary),
                         unhex('{_EXIF_TAIL_A}'))
      WHEN 1 THEN concat(unhex('{_EXIF_PRE_B}'),
                         unhex(lpad(hex(1 + doc_id % 8), 4, '0')),
                         unhex('{_EXIF_MID_B}'),
                         cast({_EXIF_DT_SPARK} as binary),
                         unhex('{_EXIF_TAIL_B}'))
      ELSE cast(coalesce(text, '') as binary)
    END
"""


@query(
    "exif_meta",
    f"""
    SELECT doc_id,
           doc_id % 3 IN (0, 1) AS exif_present,
           CASE WHEN doc_id % 3 IN (0, 1)
                THEN CAST(1 + doc_id % 8 AS INT) END AS orientation,
           CASE WHEN doc_id % 3 IN (0, 1)
                THEN {_EXIF_DT_DUCK} END AS datetime_original,
           CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN TRUE WHEN 1 THEN FALSE END AS has_gps,
           CAST(CASE CAST(doc_id % 3 AS INT)
             WHEN 0 THEN 104 WHEN 1 THEN 86 ELSE 0
           END AS BIGINT) AS n_stripped_bytes,
           CAST(CASE WHEN doc_id % 3 IN (0, 1) THEN 4
                ELSE octet_length(encode(coalesce(text, '')))
           END AS BIGINT) AS stripped_len,
           TRUE AS exif_gone
    FROM documents
    """,
)
def _r8x_exif_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXIF metadata extraction + PII strip round-trip
    (operators.multimodal.extract_exif_meta / strip_exif_jpeg):
    orientation, DateTimeOriginal and the GPS-presence privacy flag
    parsed from synthesized EXIF JPEGs whose every byte is a closed
    function of doc_id; the APP1 scrub's removed-byte count and
    post-strip length are exactly predicted by the oracle, and
    re-extraction on the stripped bytes must find no EXIF
    (``exif_gone`` — engine invariant, byte-level burden carried by
    tests/test_r8_round8.py's adversarial fixtures)."""
    from knime_core_columnar_spark.operators.multimodal import (
        extract_exif_meta,
        strip_exif_jpeg,
    )

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_EXIF_PAYLOAD_SPARK).alias("payload")
    )
    meta = extract_exif_meta(d, "doc_id", "payload")
    stripped = strip_exif_jpeg(d, "doc_id", "payload")
    after = extract_exif_meta(stripped, "doc_id", "payload").select(
        "doc_id", F.col("exif_present").alias("__after")
    )
    return (
        meta.join(
            stripped.select(
                "doc_id",
                F.length("payload").cast("long").alias("stripped_len"),
                F.col("n_stripped_bytes"),
            ),
            "doc_id",
        )
        .join(after, "doc_id")
        .select(
            "doc_id", "exif_present", "orientation", "datetime_original",
            "has_gps", "n_stripped_bytes", "stripped_len",
            (~F.col("__after")).alias("exif_gone"),
        )
    )


# ---------------------------------------------------------------------------
# gopher_repetition — the full within-document repetition battery
# (Rae et al. §A.1.2). The engine computes it as ZERO-exchange
# row-local sorted-run index algebra; the oracle replays every metric
# RELATIONALLY (unnest + group-by) — two genuinely independent
# evaluation strategies for the same integer-exact definitions.
# ---------------------------------------------------------------------------

_GR_TOP_NS = (2, 3, 4)
_GR_DUP_NS = (5, 6, 7, 8, 9, 10)


def _gr_oracle() -> str:
    gram_ctes, sels, joins = [], [], []
    for n in sorted(set(_GR_TOP_NS) | set(_GR_DUP_NS)):
        gram_ctes.append(f"""
    g{n} AS (
      SELECT doc_id,
             unnest(CASE WHEN len(w) >= {n}
                    THEN list_transform(range(1, len(w) - {n - 1} + 1),
                                        i -> array_to_string(w[i:i+{n - 1}], ' '))
                    ELSE [] END) AS g
      FROM toks
    ), g{n}c AS (
      SELECT doc_id, g, COUNT(*) AS c FROM g{n} GROUP BY 1, 2
    ), s{n} AS (
      SELECT doc_id, MAX(c * len(g)) AS top_chars,
             SUM((c - 1) * len(g)) AS dup_chars
      FROM g{n}c GROUP BY 1
    )""")
        joins.append(f"LEFT JOIN s{n} ON s{n}.doc_id = d.doc_id")
    sel_sep = ",\n           "
    for n in _GR_TOP_NS:
        sels.append(
            f"CAST(COALESCE(s{n}.top_chars, 0) AS DOUBLE) / norm.L"
            f" AS top_{n}gram_char_frac"
        )
    for n in _GR_DUP_NS:
        sels.append(
            f"CAST(COALESCE(s{n}.dup_chars, 0) AS DOUBLE) / norm.L"
            f" AS dup_{n}gram_char_frac"
        )
    return f"""
    WITH t AS (
      SELECT doc_id, replace(text, ' table ', chr(10)) AS text2
      FROM documents
    ), toks AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text2), '\\s+'), x -> x <> '') AS w FROM t
    ), norm AS (
      SELECT doc_id,
             CAST(greatest(length(array_to_string(w, ' ')), 1) AS DOUBLE)
               AS L
      FROM toks
    ), lines AS (
      SELECT doc_id, trim(unnest(string_split(text2, chr(10)))) AS line
      FROM t
    ), lg AS (
      SELECT doc_id, line, COUNT(*) AS c
      FROM lines WHERE line <> '' GROUP BY 1, 2
    ), lstat AS (
      SELECT doc_id, SUM(c) AS n, SUM(c * len(line)) AS chars,
             SUM(c - 1) AS dup_cnt,
             SUM((c - 1) * len(line)) AS dup_chars
      FROM lg GROUP BY 1
    ),{",".join(gram_ctes)}
    SELECT d.doc_id,
           CAST(COALESCE(lstat.dup_cnt, 0) AS DOUBLE)
             / CAST(greatest(COALESCE(lstat.n, 0), 1) AS DOUBLE)
             AS dup_line_frac,
           CAST(COALESCE(lstat.dup_chars, 0) AS DOUBLE)
             / CAST(greatest(COALESCE(lstat.chars, 0), 1) AS DOUBLE)
             AS dup_line_char_frac,
           {sel_sep.join(sels)}
    FROM documents d
    LEFT JOIN lstat ON lstat.doc_id = d.doc_id
    LEFT JOIN norm ON norm.doc_id = d.doc_id
    {" ".join(joins)}
    """


@query("gopher_repetition", _gr_oracle())
def _r8x_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Gopher repetition battery (operators.text.gopher_repetition
    — Rae et al. 2021 §A.1.2): duplicate-line fraction and char
    fraction, top-{2,3,4}-gram char coverage, duplicate-{5..10}-gram
    char fraction, per document. Line structure synthesized with the
    proven ' table ' → newline replace idiom. The engine side is
    zero-exchange sorted-run index algebra fused into the scan; the
    oracle recomputes every metric relationally — construction and
    replay share only the metric definitions."""
    from knime_core_columnar_spark.operators.text import gopher_repetition

    d = _tw(spark, sf_dir, "documents").withColumn(
        "text", F.replace(F.col("text"), F.lit(" table "), F.lit("\n"))
    )
    return gopher_repetition(
        d, "doc_id", "text", top_ns=_GR_TOP_NS, dup_ns=_GR_DUP_NS
    )


# ---------------------------------------------------------------------------
# winnow_overlap — MOSS-style winnowing fingerprint overlap (the
# position-robust third dedup tier; operators/dedup.py:winnow_*). The
# oracle replays the EXACT algorithm in DuckDB list comprehensions:
# word 5-grams -> md5-60 hashes -> window-of-4 minima -> distinct ->
# inverted-index pair counts. Same md5 arithmetic as the green
# ngram_jaccard / neardup_pipeline oracles, so engine and oracle share
# only the hash definition, not code.
# ---------------------------------------------------------------------------


@query(
    "winnow_overlap",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS t FROM documents
    ), kg AS (
      SELECT doc_id,
             CASE WHEN len(t) >= 5
                  THEN list_transform(range(1, len(t) - 4 + 1),
                                      i -> array_to_string(t[i:i+4], ' '))
                  ELSE [] END AS g
      FROM toks
    ), hs AS (
      SELECT doc_id,
             list_transform(g, x ->
               ('0x' || substring(md5(x), 1, 15))::BIGINT) AS h
      FROM kg WHERE len(g) >= 1
    ), fp AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(0, greatest(len(h) - 4, 0) + 1),
               i -> list_min(h[i+1:i+4]))) AS fps
      FROM hs
    ), ex AS (
      SELECT doc_id, len(fps) AS n, unnest(fps) AS fp FROM fp
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n AS na, b.n AS nb,
             CAST(COUNT(*) AS BIGINT) AS shared
      FROM ex a JOIN ex b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT id_a, id_b, shared,
           CAST(shared AS DOUBLE) / least(na, nb) AS containment
    FROM pairs WHERE shared >= 2
    """,
)
def _r8x_winnow_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (Schleimer/Wilkerson/Aiken SIGMOD'03) partial-overlap
    pairs over the documents corpus: window-of-4 minima over word
    5-gram md5-60 hashes, distinct per doc, inverted-index join,
    containment = shared / min(|fps|). Guaranteed to surface any
    shared run of >= 8 tokens while posting only ~2/(w+1) of the
    k-gram hashes — the partial-overlap detector MinHash (whole-doc
    similarity) and dup_span (exact positions, full index cost) are
    not. The oracle replays the identical algorithm in DuckDB list
    comprehensions. max_df=None here (exactness contract); at corpus
    scale pass max_df to cull boilerplate postings (MOSS's own
    common-fingerprint drop)."""
    from knime_core_columnar_spark.operators.dedup import (
        winnow_overlap_pairs,
    )

    d = _t(spark, sf_dir, "documents")
    return winnow_overlap_pairs(
        d, "doc_id", "text", k=5, w=4, min_shared=2
    )


@query("media_header_meta", _MEDIA_ORACLE)
def _r8x_media_header_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio/video container header parsing (operators.multimodal.
    extract_media_meta): WAV PCM fmt fields + data-chunk duration and
    FLAC STREAMINFO bit-unpack (20-bit rate / 3-bit channels / 5-bit
    bps / 36-bit samples) from header bytes — pure Catalyst hex
    arithmetic, no codec library — plus MP3/OGG magic detection. The
    query synthesizes the containers from (doc_id, n_chars) and parses
    them back; the oracle computes the same fields in closed form
    without ever constructing bytes, so construction and parse must be
    exact inverses for the hash to match."""
    from knime_core_columnar_spark.operators.multimodal import (
        extract_media_meta,
    )

    d = _t(spark, sf_dir, "documents").withColumn(
        "payload", F.expr(_media_payload_sql())
    )
    return extract_media_meta(d, "doc_id", "payload")
