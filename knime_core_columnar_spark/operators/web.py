"""Web-corpus URL handling: canonicalization + host-level curation.

Every web-scale training pipeline keys its curation decisions on URLs:
per-host quotas, domain blocklists, dedup of re-crawls of the same page
under cosmetically different URLs (scheme case, tracking params,
fragments, trailing slashes). The operators here canonicalize URLs with
PURE Catalyst string expressions — codegen, no UDF, no shuffle — so the
canonical form is computed at scan speed and is expressible in ANSI SQL
for the DuckDB correctness gate.

Canonical form (documented simplifications):
- scheme stripped (http/https/ftp treated alike for identity);
- host lowercased, leading ``www.`` and explicit ``:port`` stripped;
- query string (``?...``) and fragment (``#...``) dropped — tracking
  params carry no page identity (the aggressive variant of the
  standard param-allowlist approach);
- trailing slashes on the path stripped;
- ``registered_domain`` is the LAST TWO host labels — a heuristic, not
  the Public Suffix List (which is external data this container does
  not ship); ``co.uk``-style suffixes therefore collapse to the suffix.
  Swap in a broadcast PSL lookup table where exactness matters.
- ``user:pass@`` userinfo is stripped from the authority before the
  port strip (so a password containing ``:`` cannot defeat it);
- bracketed IPv6 authorities (``http://[::1]:8080/``) are NOT handled:
  the bracket survives into ``host`` and the last-two-labels domain
  heuristic is meaningless for IP literals. Web-crawl curation keys on
  registered domains; pipelines with IP-literal URLs should filter
  them out first (``host LIKE '[%'`` or an IP regex).

Reference parity: the reference engine has no URL type; this family is
part of the training-data-pipeline surface (SURVEY.md §6), with
semantics per CCNet/Dolma-style curation (public papers).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["canonical_url_parts", "canonicalize_url", "host_stats"]


def canonical_url_parts(url: Column | str) -> Column:
    """Struct(host, domain, path, canonical) from a raw URL string.

    All steps are engine-portable: ``substring_index``/``split_part``
    for fragment+query strip, RE2-safe regexes for scheme/port/www
    strips (no lookaround, no backrefs), so the DuckDB oracle computes
    the identical canonical form.
    """
    u = F.col(url) if isinstance(url, str) else url
    u = F.lower(F.trim(u))
    u = F.substring_index(u, "#", 1)          # drop fragment
    u = F.substring_index(u, "?", 1)          # drop query
    u = F.regexp_replace(u, r"^[a-z][a-z0-9+.-]*://", "")  # drop scheme
    hostport = F.substring_index(u, "/", 1)
    # path = everything after the host token; strip trailing slashes
    path = F.regexp_replace(
        F.substr(u, F.length(hostport) + 1), r"/+$", ""
    )
    # userinfo first (user:pass@host — a ':' inside the password would
    # otherwise defeat the :port strip), then port, then www
    host = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(hostport, r"^[^/@]*@", ""), r":[0-9]+$", ""
        ),
        r"^www\.",
        "",
    )
    domain = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.struct(
        host.alias("host"),
        domain.alias("domain"),
        path.alias("path"),
        F.concat(host, path).alias("canonical"),
    )


def canonicalize_url(
    df: DataFrame, url_col: str = "url", prefix: str = "url_"
) -> DataFrame:
    """Append ``{prefix}host/domain/path/canonical`` columns. Scan-side
    row-local work — zero exchanges added to the plan."""
    parts = canonical_url_parts(url_col)
    return df.withColumns(
        {
            f"{prefix}host": parts["host"],
            f"{prefix}domain": parts["domain"],
            f"{prefix}path": parts["path"],
            f"{prefix}canonical": parts["canonical"],
        }
    )


def host_stats(
    df: DataFrame,
    url_col: str = "url",
    blocklist: list[str] | None = None,
    extra_aggs: list[Column] | None = None,
) -> DataFrame:
    """Per-host curation rollup: doc count, distinct canonical URLs
    (re-crawl detection: n_docs ≫ n_urls means the same pages keep
    reappearing), and a blocklist flag matched on host OR registered
    domain.

    Scale shape: canonicalization is scan-side; ONE hash aggregation
    keyed by (host, domain) — hosts ≪ documents, so map-side partial
    aggregation collapses each task to the host cardinality. The
    blocklist is a literal IN-expression (broadcast by construction,
    no join). At 100 TB this is the cheapest shape a per-host rollup
    can have: single shuffle of host-sized partials.
    """
    d = canonicalize_url(df, url_col)
    blocked = (
        F.col("url_host").isin(blocklist) | F.col("url_domain").isin(blocklist)
        if blocklist
        else F.lit(False)
    )
    return (
        d.withColumn("blocked", blocked)
        .groupBy("url_host", "url_domain")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("url_canonical").alias("n_urls"),
            F.max(F.col("blocked").cast("int")).cast("boolean").alias("blocked"),
            *(extra_aggs or []),
        )
    )
