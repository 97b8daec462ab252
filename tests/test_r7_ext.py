"""Round-7 in-round extensions: HTML main-text extraction and
interpolated Kneser-Ney bigram LM scoring. Both catalog oracles are
SQL replays, so each operator carries independent hand-computed cases
here (the replay-oracle discipline from the round-6 verdict)."""

import math
import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# HTML main-text extraction
# ---------------------------------------------------------------------------

def _extract(spark, html, **kw):
    from knime_core_columnar_spark.operators.web import extract_main_text

    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return extract_main_text(df, **kw).collect()[0]


def test_html_extract_drops_nav_footer_keeps_body(spark):
    r = _extract(
        spark,
        '<html><head><style>p{x:1}</style>'
        '<script>var s = "</p>"; if (1<2) {}</script></head><body>'
        '<nav><a href="/">Home</a> | <a href="/a">About</a></nav>'
        "<p>The quick brown fox jumps over the lazy dog.</p>"
        "<div>Another real paragraph with plenty of words.</div>"
        '<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>'
        "</body></html>",
    )
    assert r["main_text"] == (
        "The quick brown fox jumps over the lazy dog.\n"
        "Another real paragraph with plenty of words."
    )
    assert r["main_n_kept"] == 2
    # nav + 2 paragraphs + footer are the non-empty blocks
    assert r["main_n_blocks"] == 4


def test_html_extract_entities_and_comments(spark):
    r = _extract(
        spark,
        "<body><!-- hidden <p>comment</p> -->"
        "<p>Tom &amp; Jerry say &quot;5 &lt; 7&gt;3&quot; &#39;ok&#39;&nbsp;now</p>"
        "<p>entity &amp;lt; decodes one level only here</p></body>",
    )
    lines = r["main_text"].split("\n")
    assert lines[0] == "Tom & Jerry say \"5 < 7>3\" 'ok' now"
    # &amp;lt; -> &lt; (one decode level), never <
    assert lines[1] == "entity &lt; decodes one level only here"
    assert r["main_n_kept"] == 2


def test_html_extract_link_density_integer_boundary(spark):
    # block text "aaaa bbbb cc" (12 chars) with 4 anchor chars: density
    # 4000/12000 < 400/1000? 4*1000 = 4000 <= 400*12 = 4800 -> KEPT;
    # 6 anchor chars: 6000 > 4800 -> dropped. Exact integer arithmetic.
    kept = _extract(
        spark, "<p><a href='/x'>aaaa</a> bbbb cc</p>", min_words=3
    )
    assert kept["main_n_kept"] == 1
    dropped = _extract(
        spark, "<p><a href='/x'>aaaa bb</a>bb cc</p>", min_words=3
    )
    # text "aaaa bbbb cc" 12 chars, link chars "aaaa bb" -> 7 -> 7000 > 4800
    assert dropped["main_n_kept"] == 0


def test_html_extract_min_words(spark):
    r = _extract(spark, "<p>just two</p><p>now three words</p>", min_words=3)
    assert r["main_text"] == "now three words"
    assert r["main_n_blocks"] == 2 and r["main_n_kept"] == 1


def test_html_extract_nested_anchor_markup(spark):
    # anchor content with nested tags: link length counts the PLAIN text
    r = _extract(
        spark,
        "<p><a href='/'><b>Big</b> link</a> plus much more plain filler text"
        " here</p>",
    )
    assert r["main_n_kept"] == 1
    assert r["main_text"].startswith("Big link plus")


@pytest.mark.skipif(not os.path.isdir(SF), reason="testdata not present")
def test_html_extract_roundtrips_documents(spark):
    """The catalog query's synthesized page must round-trip the corpus
    text exactly (the corpus is single-spaced [a-z ] text)."""
    from knime_core_columnar_spark import catalog

    out = catalog.QUERIES["html_extract_main"](spark, SF)
    src = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.trim(F.regexp_replace("text", r"\s+", " ")).alias("want")
    )
    j = out.join(src, "doc_id").select(
        (F.col("main_text") == F.col("want")).alias("ok"), "n_kept"
    )
    rows = j.collect()
    assert all(r["ok"] for r in rows)
    assert all(r["n_kept"] == 1 for r in rows)  # nav, footer, teaser dropped


def test_html_extract_partition_invariance(spark):
    from knime_core_columnar_spark.operators.web import extract_main_text

    rows = [(i, f"<p>block number {i} with several words</p>"
                f"<nav><a href='/'>L{i}</a></nav>") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, html string")
    r1 = sorted(tuple(r) for r in extract_main_text(df).collect())
    r2 = sorted(
        tuple(r) for r in extract_main_text(df.repartition(9)).collect()
    )
    assert r1 == r2


# ---------------------------------------------------------------------------
# Kneser-Ney bigram LM
# ---------------------------------------------------------------------------

def _kn_ref(docs, d=0.75):
    """Independent plain-python KN replica (dict arithmetic, same
    rounding discipline)."""
    bigrams = {}
    doc_bis = {}
    for i, txt in docs:
        ws = txt.split()
        bs = list(zip(ws, ws[1:]))
        doc_bis[i] = bs
        for b in bs:
            bigrams[b] = bigrams.get(b, 0) + 1
    c1, n1p, n1l = {}, {}, {}
    for (w1, w2), c in bigrams.items():
        c1[w1] = c1.get(w1, 0) + c
        n1p[w1] = n1p.get(w1, 0) + 1
        n1l[w2] = n1l.get(w2, 0) + 1
    nb = float(len(bigrams))
    lp6 = {}
    for (w1, w2), c in bigrams.items():
        p = max(c - d, 0.0) / c1[w1] + (d * n1p[w1] / c1[w1]) * (n1l[w2] / nb)
        lp6[(w1, w2)] = int(round(round(math.log(p), 6) * 1_000_000))
    out = {}
    for i, bs in doc_bis.items():
        if bs:
            s = sum(lp6[b] for b in bs)
            out[i] = (len(bs), round(s / (len(bs) * 1_000_000.0), 6))
    return out


def test_kn_bigram_hand_case(spark):
    from knime_core_columnar_spark.operators.text import kn_bigram_logprob

    docs = [
        (1, "san francisco is great"),
        (2, "san francisco is foggy"),
        (3, "the bay is great"),
        (4, "francisco"),          # 1 token: no bigrams, absent
        (5, "is is is"),           # repeated-token transitions
    ]
    want = _kn_ref(docs)
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_kn_logprob"])
           for r in kn_bigram_logprob(df).collect()}
    assert 4 not in got
    assert got == want


def test_kn_continuation_beats_raw_frequency(spark):
    """The KN signature: 'francisco' is frequent but follows ONLY 'san',
    so its continuation probability is lower than an equally frequent
    word seen after many contexts."""
    from knime_core_columnar_spark.operators.text import kn_bigram_logprob

    docs = [
        (1, "san francisco san francisco san francisco"),
        (2, "a good b good c good"),
        # probe docs: unseen-context transitions backed off via Pcont
        (3, "good francisco"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = kn_bigram_logprob(df).collect()
    assert {r["doc_id"] for r in out} == {1, 2, 3}
    ref = _kn_ref(docs)
    got = {r["doc_id"]: (r["n_bigrams"], r["avg_kn_logprob"]) for r in out}
    assert got == ref
    # 'good' follows 3 distinct contexts, 'francisco' only 1 — with
    # equal raw frequency (3), N1L(good)=3 > N1L(francisco)=1
    # (asserted through the replica's internals)
    bigr = {}
    for _, t in docs:
        ws = t.split()
        for b in zip(ws, ws[1:]):
            bigr[b] = bigr.get(b, 0) + 1
    n1l = {}
    for (_, w2) in bigr:
        n1l[w2] = n1l.get(w2, 0) + 1
    assert n1l["good"] > n1l["francisco"]


def test_kn_bigram_partition_invariance(spark):
    import hashlib

    from knime_core_columnar_spark.operators.text import kn_bigram_logprob

    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    rows = []
    for i in range(60):
        h = hashlib.md5(f"kn|{i}".encode()).digest()
        rows.append((i, " ".join(vocab[b % 5] for b in h[:8])))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r1 = sorted(tuple(r) for r in kn_bigram_logprob(df).collect())
    r2 = sorted(
        tuple(r) for r in kn_bigram_logprob(df.repartition(11)).collect()
    )
    assert r1 == r2
    assert len(r1) == 60


# ---------------------------------------------------------------------------
# plan shapes
# ---------------------------------------------------------------------------

def _plan(spark, df):
    return spark._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_html_extract_plan_zero_exchange(spark):
    """Extraction is scan-side codegen: no exchange, no join, no Python."""
    from knime_core_columnar_spark import catalog

    p = _plan(spark, catalog.QUERIES["html_extract_main"](
        spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in p
    assert "Join" not in p
    assert "Python" not in p


def test_kn_bigram_plan_materializes_count_table_once(spark):
    """The bigram count table is checkpointed: the executed plan must
    not replay the corpus explode per derived aggregate (was 15 parquet
    scans without the materialization)."""
    from knime_core_columnar_spark import catalog

    df = catalog.QUERIES["kn_bigram_quality"](spark, "/root/testdata/sf0.001")
    df.collect()
    p = _plan(spark, df)
    assert p.count("Scan parquet") <= 3
    assert "Cartesian" not in p


# ---------------------------------------------------------------------------
# image headers: BMP + WebP (round-7 format additions)
# ---------------------------------------------------------------------------

def _bmp(w, h):
    return (b"BM" + (54).to_bytes(4, "little") + b"\x00" * 4
            + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little")
            + h.to_bytes(4, "little", signed=True))


def _webp_vp8x(w, h):
    chunk = (b"VP8X" + (10).to_bytes(4, "little") + b"\x00" + b"\x00" * 3
             + (w - 1).to_bytes(3, "little") + (h - 1).to_bytes(3, "little"))
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def _webp_vp8l(w, h):
    v = (w - 1) | ((h - 1) << 14)
    data = b"\x2f" + v.to_bytes(4, "little")
    chunk = b"VP8L" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def _webp_vp8(w, h):
    frame = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
             + w.to_bytes(2, "little") + h.to_bytes(2, "little"))
    chunk = b"VP8 " + len(frame).to_bytes(4, "little") + frame
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def test_image_meta_bmp_and_webp_hand_fixtures(spark):
    from knime_core_columnar_spark.operators.multimodal import (
        extract_image_meta,
    )

    rows = [
        (1, bytearray(_bmp(640, 480))),
        (2, bytearray(_bmp(31, -600))),          # top-down: |height|
        (3, bytearray(_webp_vp8x(1920, 1080))),
        (4, bytearray(_webp_vp8l(800, 600))),
        (5, bytearray(_webp_vp8(320, 240))),
        (6, bytearray(b"RIFF\x04\x00\x00\x00WAVE")),  # riff, not webp
        (7, bytearray(b"BM")),                   # too short for dims
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: (r["format"], r["width"], r["height"])
           for r in extract_image_meta(df).collect()}
    assert out[1] == ("bmp", 640, 480)
    assert out[2] == ("bmp", 31, 600)
    assert out[3] == ("webp", 1920, 1080)
    assert out[4] == ("webp", 800, 600)
    assert out[5] == ("webp", 320, 240)
    assert out[6] == (None, None, None)
    assert out[7] == (None, None, None)


def test_image_meta_webp_desync_yields_null_dims(spark):
    from knime_core_columnar_spark.operators.multimodal import (
        extract_image_meta,
    )

    # VP8 chunk without the 9D012A sync code, VP8L without the 2F
    # signature: detected as webp, dims NULL (never garbage)
    bad_vp8 = (b"RIFF" + (20).to_bytes(4, "little") + b"WEBP"
               + b"VP8 " + (8).to_bytes(4, "little") + b"\x00" * 8)
    bad_vp8l = (b"RIFF" + (17).to_bytes(4, "little") + b"WEBP"
                + b"VP8L" + (5).to_bytes(4, "little") + b"\x00" * 5)
    df = spark.createDataFrame(
        [(1, bytearray(bad_vp8)), (2, bytearray(bad_vp8l))],
        "doc_id long, payload binary",
    )
    out = {r["doc_id"]: (r["format"], r["width"], r["height"])
           for r in extract_image_meta(df).collect()}
    assert out[1] == ("webp", None, None)
    assert out[2] == ("webp", None, None)


def _tiff(w, h, bo="little"):
    import struct as _s

    e = "<" if bo == "little" else ">"
    magic = b"II*\x00" if bo == "little" else b"MM\x00*"
    hdr = magic + _s.pack(e + "I", 8)
    # 2 entries: ImageWidth (SHORT inline), ImageLength (LONG inline)
    n = _s.pack(e + "H", 2)
    e1 = _s.pack(e + "HHI", 256, 3, 1) + _s.pack(e + "H", w) + b"\x00\x00"
    e2 = _s.pack(e + "HHI", 257, 4, 1) + _s.pack(e + "I", h)
    nxt = _s.pack(e + "I", 0)
    return hdr + n + e1 + e2 + nxt


def test_image_meta_tiff_ifd_walk(spark):
    from knime_core_columnar_spark.operators.multimodal import (
        extract_image_meta,
    )

    rows = [
        (1, bytearray(_tiff(640, 480, "little"))),
        (2, bytearray(_tiff(31, 7, "big"))),
        (3, bytearray(b"II*\x00\xff\xff\xff\xff")),  # IFD offset past EOF
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    # detection only (default): format tagged, dims NULL
    det = {r["doc_id"]: (r["format"], r["width"], r["height"])
           for r in extract_image_meta(df).collect()}
    assert det[1] == ("tiff", None, None)
    # full walk
    out = {r["doc_id"]: (r["format"], r["width"], r["height"])
           for r in extract_image_meta(df, parse_tiff=True).collect()}
    assert out[1] == ("tiff", 640, 480)
    assert out[2] == ("tiff", 31, 7)
    assert out[3] == ("tiff", None, None)


def test_image_meta_jpeg_and_tiff_mixed_walk(spark):
    from knime_core_columnar_spark.operators.multimodal import (
        extract_image_meta,
    )

    app0 = b"\xff\xe0" + (16).to_bytes(2, "big") + b"JFIF\x00" + b"\x00" * 9
    sof = (b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08"
           + (600).to_bytes(2, "big") + (800).to_bytes(2, "big")
           + b"\x03" + b"\x00" * 9)
    jpeg = b"\xff\xd8" + app0 + sof + b"\xff\xd9"
    rows = [(1, bytearray(jpeg)), (2, bytearray(_tiff(12, 34)))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = {r["doc_id"]: (r["format"], r["width"], r["height"])
           for r in extract_image_meta(
               df, parse_jpeg=True, parse_tiff=True).collect()}
    assert out[1] == ("jpeg", 800, 600)
    assert out[2] == ("tiff", 12, 34)


# ---------------------------------------------------------------------------
# re-aggregatable HLL sketch table
# ---------------------------------------------------------------------------

def test_hll_rollup_equals_direct_sketch(spark):
    """Union of per-(source, lang) sketches estimates within the HLL
    error bound of sketching per source directly (not bit-identical:
    DataSketches' sparse→dense promotion shifts a few registers at
    small cardinalities) — and both stay within the bound of exact."""
    import hashlib

    from knime_core_columnar_spark.operators.sketch import (
        hll_rollup,
        hll_sketch_table,
    )

    rows = []
    for i in range(3000):
        h = hashlib.md5(f"h|{i}".encode()).digest()
        rows.append((f"s{h[0] % 3}", f"l{h[1] % 4}", i % 2200))
    df = spark.createDataFrame(rows, "source string, lang string, doc_id long")
    fine = hll_sketch_table(df, ["source", "lang"], "doc_id")
    rolled = {r["source"]: r["approx_distinct"]
              for r in hll_rollup(fine, ["source"]).collect()}
    direct = {r["source"]: r["approx_distinct"]
              for r in hll_rollup(
                  hll_sketch_table(df, ["source"], "doc_id"), ["source"]
              ).collect()}
    exact = {r["source"]: r["n"] for r in df.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n")).collect()}
    for s in exact:
        assert abs(rolled[s] - direct[s]) / exact[s] <= 0.03
        assert abs(rolled[s] - exact[s]) / exact[s] <= 0.05
        assert abs(direct[s] - exact[s]) / exact[s] <= 0.05


def test_hll_sketch_survives_parquet_roundtrip(spark, tmp_path):
    from knime_core_columnar_spark.operators.sketch import (
        hll_rollup,
        hll_sketch_table,
    )

    rows = [(f"s{i % 2}", f"l{i % 3}", i) for i in range(500)]
    df = spark.createDataFrame(rows, "source string, lang string, doc_id long")
    skt = hll_sketch_table(df, ["source", "lang"], "doc_id")
    p = str(tmp_path / "sketches.parquet")
    skt.write.parquet(p)
    before = sorted(tuple(r) for r in hll_rollup(skt, ["source"]).collect())
    after = sorted(tuple(r) for r in hll_rollup(
        spark.read.parquet(p), ["source"]).collect())
    assert before == after


def test_hll_rollup_partition_invariance(spark):
    from knime_core_columnar_spark.operators.sketch import (
        hll_rollup,
        hll_sketch_table,
    )

    rows = [(f"s{i % 4}", f"l{i % 5}", i * 7 % 900) for i in range(2000)]
    df = spark.createDataFrame(rows, "source string, lang string, doc_id long")
    r1 = sorted(tuple(r) for r in hll_rollup(
        hll_sketch_table(df, ["source", "lang"], "doc_id"), ["source"]
    ).collect())
    r2 = sorted(tuple(r) for r in hll_rollup(
        hll_sketch_table(df.repartition(13), ["source", "lang"], "doc_id"),
        ["source"],
    ).collect())
    assert r1 == r2


# ---------------------------------------------------------------------------
# webdataset sharded tar export/import
# ---------------------------------------------------------------------------

def test_webdataset_roundtrip_and_reproducible_shards(spark, tmp_path):
    import os
    import tarfile

    from knime_core_columnar_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    rows = [(i, f"document body number {i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_webdataset(df, d1, key_col="doc_id", n_shards=4)
    write_webdataset(df.repartition(7), d2, key_col="doc_id", n_shards=4)
    shards1 = sorted(os.listdir(d1))
    assert shards1 == [f"shard-{i:05d}.tar" for i in range(4)]
    # reproducible bytes: same corpus -> byte-identical shards, at any
    # input partitioning
    for s in shards1:
        b1 = open(os.path.join(d1, s), "rb").read()
        b2 = open(os.path.join(d2, s), "rb").read()
        assert b1 == b2, s
    # members are readable with plain stdlib tarfile
    with tarfile.open(os.path.join(d1, shards1[0])) as tf:
        names = tf.getnames()
        assert all(n.endswith(".text") for n in names)
    # distributed read-back round-trips every sample
    back = {int(r["key"]): bytes(r["content"]).decode()
            for r in read_webdataset(spark, d1).filter(
                F.col("field") == "text").collect()}
    assert back == {i: t for i, t in rows}


def test_webdataset_binary_columns_and_empty_text(spark, tmp_path):
    from knime_core_columnar_spark.sources.webdataset import (
        read_webdataset,
        write_webdataset,
    )

    rows = [(1, None, bytearray(b"\x00\xffpayload")),
            (2, "some text", bytearray(b""))]
    df = spark.createDataFrame(rows, "doc_id long, text string, blob binary")
    d = str(tmp_path / "wds")
    write_webdataset(df, d, key_col="doc_id", n_shards=2,
                     text_cols=["text"], binary_cols=["blob"])
    out = {(int(r["key"]), r["field"]): bytes(r["content"])
           for r in read_webdataset(spark, d).collect()}
    assert out[(1, "text")] == b""          # NULL text -> empty member
    assert out[(1, "blob")] == b"\x00\xffpayload"
    assert out[(2, "text")] == b"some text"
    assert out[(2, "blob")] == b""


def test_webdataset_shard_assignment_is_md5_convention(spark):
    import hashlib

    from knime_core_columnar_spark.sources.webdataset import shard_of

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = {r["doc_id"]: r["s"] for r in df.select(
        "doc_id", shard_of("doc_id", 8).alias("s")).collect()}
    for i in range(50):
        want = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 8
        assert got[i] == want


def test_hll_incremental_merge_matches_full_build(spark):
    """Daily-ingest pattern: sketch(day1) merged with sketch(day2)
    estimates within the HLL bound of sketching day1+day2 directly —
    the store updates without rescanning history."""
    from knime_core_columnar_spark.operators.sketch import (
        hll_rollup,
        hll_sketch_merge_tables,
        hll_sketch_table,
    )

    day1 = [(f"s{i % 3}", f"l{i % 2}", i) for i in range(0, 1200)]
    day2 = [(f"s{i % 3}", f"l{i % 2}", i) for i in range(800, 2000)]
    schema = "source string, lang string, doc_id long"
    d1 = spark.createDataFrame(day1, schema)
    d2 = spark.createDataFrame(day2, schema)
    merged = hll_sketch_merge_tables(
        hll_sketch_table(d1, ["source", "lang"], "doc_id"),
        hll_sketch_table(d2, ["source", "lang"], "doc_id"),
        ["source", "lang"],
    )
    got = {r["source"]: r["approx_distinct"]
           for r in hll_rollup(merged, ["source"]).collect()}
    full = d1.unionByName(d2)
    exact = {r["source"]: r["n"] for r in full.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n")).collect()}
    for s, e in exact.items():
        assert abs(got[s] - e) / e <= 0.05
    # row accounting: n_rows sums both days
    n = {(r["source"], r["lang"]): r["n_rows"] for r in merged.collect()}
    assert sum(n.values()) == len(day1) + len(day2)


# ---------------------------------------------------------------------------
# WARC (Common Crawl container) export/import
# ---------------------------------------------------------------------------

def test_warc_roundtrip_and_member_per_record(spark, tmp_path):
    import gzip
    import os

    from knime_core_columnar_spark.sources.warc import (
        read_warc,
        write_warc,
    )

    rows = [(f"https://ex.test/{i}", f"body number {i}") for i in range(20)]
    df = spark.createDataFrame(rows, "url string, text string")
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_warc(df, d1, n_files=3)
    write_warc(df.repartition(7), d2, n_files=3)
    files = sorted(os.listdir(d1))
    assert files == [f"part-{i:05d}.warc.gz" for i in range(3)]
    # reproducible bytes at any input partitioning
    for f in files:
        assert (open(os.path.join(d1, f), "rb").read()
                == open(os.path.join(d2, f), "rb").read()), f
    # member-per-record: stdlib gzip reads ONLY the first member — a
    # multi-record file must decompress to more via the member splitter
    raw = open(os.path.join(d1, files[0]), "rb").read()
    first_member = gzip.decompress(raw)  # py gzip reads all members...
    assert first_member.startswith(b"WARC/1.0\r\n")
    # distributed read-back round-trips every record
    back = {r["url"]: bytes(r["content"]).decode()
            for r in read_warc(spark, d1).collect()}
    assert back == {u: t for u, t in rows}
    assert all(r["warc_type"] == "response"
               for r in read_warc(spark, d1).collect())


def test_warc_parses_plain_uncompressed_and_binary_payload(spark, tmp_path):
    from knime_core_columnar_spark.sources.warc import (
        _record_bytes,
        read_warc,
    )

    # hand-assembled plain .warc with a payload containing \r\n\r\n —
    # Content-Length framing must not split on payload bytes
    tricky = b"part one\r\n\r\npart two"
    blob = (_record_bytes("https://t/1", tricky)
            + _record_bytes("https://t/2", b""))
    p = tmp_path / "manual.warc"
    p.write_bytes(blob)
    out = {r["url"]: bytes(r["content"])
           for r in read_warc(spark, str(tmp_path)).collect()}
    assert out["https://t/1"] == tricky
    assert out["https://t/2"] == b""


def test_warc_record_ids_deterministic(spark, tmp_path):
    from knime_core_columnar_spark.sources.warc import read_warc, write_warc

    rows = [("https://ex.test/a", "x"), ("https://ex.test/b", "y")]
    df = spark.createDataFrame(rows, "url string, text string")
    d = str(tmp_path / "w")
    write_warc(df, d, n_files=1)
    ids1 = {r["url"]: r["record_id"] for r in read_warc(spark, d).collect()}
    import hashlib
    for u in ids1:
        h = hashlib.md5(u.encode()).hexdigest()
        assert ids1[u] == (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-"
                           f"{h[16:20]}-{h[20:32]}>")


# ---------------------------------------------------------------------------
# robots-style disallow filtering
# ---------------------------------------------------------------------------

def test_url_disallow_hand_case(spark):
    from knime_core_columnar_spark.operators.web import apply_disallow_rules

    docs = [
        (1, "https://a.test/keep/this"),
        (2, "https://a.test/private/x"),       # prefix-banned
        (3, "https://A.TEST/Private/x"),       # canonicalized: lowercase
        (4, "https://banned.test/anything"),   # whole-host ban ('')
        (5, "http://www.a.test/private"),      # www + scheme stripped
        (6, "https://other.test/private/x"),   # different host survives
    ]
    rules = spark.createDataFrame(
        [("a.test", "/private"), ("banned.test", "")],
        "host string, path_prefix string",
    )
    df = spark.createDataFrame(docs, "doc_id long, url string")
    kept = {r["doc_id"] for r in apply_disallow_rules(df, rules).collect()}
    assert kept == {1, 6}
    # original columns preserved, no helper columns leak
    assert apply_disallow_rules(df, rules).columns == ["doc_id", "url"]


def test_url_disallow_plan_broadcasts_rules(spark):
    from knime_core_columnar_spark.operators.web import apply_disallow_rules

    df = spark.createDataFrame(
        [(i, f"https://h{i % 3}.test/p/{i}") for i in range(100)],
        "doc_id long, url string",
    )
    rules = spark.createDataFrame(
        [("h0.test", "/p")], "host string, path_prefix string")
    p = spark._jvm.PythonSQLUtils.explainString(
        apply_disallow_rules(df, rules)._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in p and "LeftAnti" in p
    assert "SortMergeJoin" not in p
