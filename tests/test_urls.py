"""URL curation family (round-10, operators.urls): parsing,
canonicalization, registered-domain extraction, canonical-URL dedup,
domain rollup — hand cases plus plan pins (the dedup election must be
the min+semi-join pattern, never a Window over the URL hash)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from knime_core_columnar_spark.operators.urls import (
    canonicalize_url,
    domain_rollup,
    registered_domain,
    url_dedup,
    url_host,
    url_path,
    url_port,
    url_query,
    url_scheme,
)


def _one(spark, url, expr):
    return (
        spark.createDataFrame([(url,)], "url string")
        .select(expr("url").alias("v"))
        .collect()[0]["v"]
    )


def test_url_parts(spark):
    u = "HtTpS://User:pw@WWW.Example.COM:8443/A/b%20c?b=2&a=1#Frag"
    assert _one(spark, u, url_scheme) == "https"
    assert _one(spark, u, url_host) == "www.example.com"
    assert _one(spark, u, url_port) == "8443"
    assert _one(spark, u, url_path) == "/A/b%20c"
    assert _one(spark, u, url_query) == "b=2&a=1"
    # no scheme / no authority
    assert _one(spark, "not a url", url_scheme) == ""
    assert _one(spark, "not a url", url_host) == ""


@pytest.mark.parametrize("raw,canon", [
    # default port stripped, host/scheme lowered, fragment dropped
    ("HTTPS://WWW.Example.COM:443/p/1", "https://www.example.com/p/1"),
    ("http://h.example.org:80/x#frag", "http://h.example.org/x"),
    # explicit non-default port kept
    ("http://h.example.org:8080/x", "http://h.example.org:8080/x"),
    # tracking params dropped, survivors sorted, trailing ? removed
    ("http://e.com/p?utm_source=f&b=2&a=1", "http://e.com/p?a=1&b=2"),
    ("http://e.com/p?b=2&a=1&gclid=XYZ", "http://e.com/p?a=1&b=2"),
    ("http://e.com/p?utm_campaign=x", "http://e.com/p"),
    # userinfo folded out of the canonical authority
    ("http://u:pw@e.com/p", "http://e.com/p"),
    # path preserved verbatim (no trailing-slash guessing)
    ("http://e.com/p/", "http://e.com/p/"),
    ("http://e.com", "http://e.com"),
])
def test_canonicalize_url(spark, raw, canon):
    assert _one(spark, raw, canonicalize_url) == canon


def test_canonical_equivalence_classes(spark):
    """The three query-variant spellings + case/port mess all collapse
    to ONE canonical form."""
    variants = [
        "HTTPS://www.Example.COM:443/p/7?utm_source=feed&b=2&a=1",
        "https://www.example.com/p/7?a=1&b=2",
        "https://WWW.EXAMPLE.com/p/7?b=2&a=1&gclid=Z#sec",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url string")
    got = {r["c"] for r in
           df.select(canonicalize_url("url").alias("c")).collect()}
    assert got == {"https://www.example.com/p/7?a=1&b=2"}


@pytest.mark.parametrize("host,dom", [
    ("www.example.com", "example.com"),
    ("a.b.c.example.com", "example.com"),
    ("blog.example.co.uk", "example.co.uk"),
    ("example.co.uk", "example.co.uk"),
    ("user.github.io", "user.github.io"),
    ("pages.user.github.io", "user.github.io"),
    ("localhost", "localhost"),
    ("example.com", "example.com"),
])
def test_registered_domain(spark, host, dom):
    got = (
        spark.createDataFrame([(host,)], "h string")
        .select(registered_domain("h").alias("d"))
        .collect()[0]["d"]
    )
    assert got == dom


def test_url_dedup_keeps_min_id_per_canonical(spark):
    rows = [
        (3, "https://E.com/p?b=2&a=1"),
        (1, "HTTPS://e.COM:443/p?a=1&b=2&utm_source=x"),  # same canonical
        (2, "https://e.com/q"),                            # unique
        (5, "https://e.com/p?a=1&b=2#frag"),               # same canonical
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = url_dedup(df, "doc_id", "url")
    got = {r["doc_id"]: r["canon_url"] for r in out.collect()}
    assert set(got) == {1, 2}
    assert got[1] == "https://e.com/p?a=1&b=2"


def test_domain_rollup_counts_and_blocklist(spark):
    rows = [
        (1, "https://a.example.com/x"),
        (2, "https://b.example.com/x"),        # same domain, same canon? no - different host => different canon
        (3, "https://a.example.com/x?utm_s=1"),  # NOT tracking (utm_ prefix? 'utm_s' IS utm_ prefixed) -> same canon as 1
        (4, "http://blog.bad.co.uk/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["domain"]: r for r in
           domain_rollup(df, "url", blocklist=("bad.co.uk",)).collect()}
    assert out["example.com"]["n_docs"] == 3
    assert out["example.com"]["n_urls"] == 2  # rows 1+3 collapse
    assert not out["example.com"]["is_blocked"]
    assert out["bad.co.uk"]["n_docs"] == 1
    assert out["bad.co.uk"]["is_blocked"]


def test_url_dedup_no_hash_window_plan(spark):
    """Election is min+semi-join (AQE-skew-splittable), never a Window
    over the canonical-URL hash — the hottest URL on a crawl is exactly
    the one being deduped."""
    from knime_core_columnar_spark import catalog

    df = catalog.QUERIES["url_dedup_canonical"](
        spark, "/root/testdata/sf0.001")
    p = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    assert "Window" not in p
    assert "LeftSemi" in p
    assert "CartesianProduct" not in p


def test_schemeless_urls_pass_through_not_collapsed(spark):
    """Round-10 review: unparseable/relative URLs must NOT collapse into
    one degenerate '://' key (which silently deleted all but one)."""
    rows = [(3, "example.com/a"), (4, "other.org/b"), (5, "example.com/a")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    canon = {r["doc_id"]: r["c"] for r in
             df.select("doc_id", canonicalize_url("url").alias("c")).collect()}
    assert canon[3] == "example.com/a" and canon[4] == "other.org/b"
    out = url_dedup(df, "doc_id", "url")
    assert sorted(r["doc_id"] for r in out.collect()) == [3, 4]


def test_question_mark_in_fragment_is_not_a_query(spark):
    """Round-10 review: '?' first appearing inside the fragment must not
    be parsed as a query string."""
    assert _one(spark, "http://e.com/p#frag?x=1", url_query) == ""
    assert (_one(spark, "http://e.com/p#frag?x=1", canonicalize_url)
            == "http://e.com/p")
    # a real query before the fragment still parses
    assert _one(spark, "http://e.com/p?x=1#frag?y=2", url_query) == "x=1"


def test_url_dedup_null_urls_keep_one_survivor(spark):
    """Round-10 review: NULL urls dedup to one min-id survivor, they do
    not vanish through the null-rejecting equi-join."""
    rows = [(7, None), (2, None), (9, "https://e.com/x")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["doc_id"]: r["canon_url"] for r in
           url_dedup(df, "doc_id", "url").collect()}
    assert set(out) == {2, 9}
    assert out[2] is None


def _py_canonicalize(url):
    """Pure-Python replica of canonicalize_url (independent arithmetic:
    str.partition instead of regexes) for property fuzz."""
    import re

    if url is None:
        return None
    m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*)://", url)
    if not m:
        return url
    scheme = m.group(1).lower()
    rest = url[m.end():]
    authority = re.split(r"[/?#]", rest, 1)[0]
    tail = rest[len(authority):]
    hostport = authority.rsplit("@", 1)[-1]
    host, _, port = hostport.partition(":")
    host = host.lower()
    path = re.split(r"[?#]", tail, 1)[0]
    after_path = tail[len(path):]
    query = ""
    if after_path.startswith("?"):
        query = after_path[1:].split("#", 1)[0]
    defaults = {"http": "80", "https": "443", "ftp": "21"}
    port_part = "" if (port == "" or defaults.get(scheme) == port) \
        else f":{port}"
    kept = []
    for p in query.split("&"):
        if p == "":
            continue
        key = p.split("=", 1)[0].lower()
        if key.startswith("utm_") or key in (
                "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid",
                "ref", "ref_src", "igshid"):
            continue
        kept.append(p)
    q_part = "?" + "&".join(sorted(kept)) if kept else ""
    return f"{scheme}://{host}{port_part}{path}{q_part}"


def test_canonicalize_url_vs_python_replica(spark):
    """Property fuzz: the Spark expression equals an independent
    pure-Python canonicalizer on adversarial URL shapes."""
    cases = [
        "HTTPS://WWW.E.COM:443/p?b=2&a=1#f",
        "http://u:p@H.org:8080/a/b?utm_x=1&z=9&gclid=q",
        "ftp://files.example.com:21/pub",
        "http://e.com",
        "http://e.com/",
        "http://e.com?",
        "http://e.com?#",
        "http://e.com/#?notquery=1",
        "http://e.com/p?&&a=1&&",
        "http://e.com/p?A=1&a=1",          # case-sensitive param names kept
        "http://e.com/p?ref",              # bare tracking key
        "http://e.com/p?REF=2&x=1",        # tracking match is lowercased
        "scheme+odd.x-y://Host/Path?q=1#z",
        "no scheme at all",
        "://degenerate",
        "http//missing-colon.com/a",
        "x://",
        "HtTp://E.com:80/UPPER/path",
        "https://e.co.uk:443/p?utm_source=a&utm_medium=b",
    ]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = {r["url"]: r["c"] for r in
           df.select("url", canonicalize_url("url").alias("c")).collect()}
    for u in cases:
        assert got[u] == _py_canonicalize(u), u
