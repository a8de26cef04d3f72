"""URL canonicalization for web-crawl ingest — pure Column expressions.

Before ``graph.build.build_link_graph`` joins pages to anchors on raw url
strings, a production crawl must collapse the url aliases that would
otherwise split one logical page across several vertices (and double-count
its inlinks): scheme/host case, default ports, fragments, tracking
parameters, ``www.`` prefixes, and empty paths. This module is that stage,
as a chain of built-in string/regex Columns — map-only, whole-stage
codegen, no UDF, no shuffle (plan-audited in tests/test_plans.py).

Scope (documented, deliberate): percent-encoding normalization, dot-segment
removal (``/a/../b``), IDN/punycode, and public-suffix registered-domain
extraction are NOT attempted — each needs tables or stateful parsing that
pure regex can't express faithfully, and a wrong "normalization" merges
DIFFERENT pages, which is worse for a link graph than missing a merge.
Relative (scheme-less) urls pass through unchanged; the link-graph join
drops them anyway unless the caller resolves them first.

All regexes live in the Java-regex ∩ RE2 dialect (the PII-scan discipline)
so the DuckDB oracle in ``__spark_entry__.py`` runs the IDENTICAL pattern
strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# one param per '&'-separated token, anchored: name[=value] where name is a
# known tracking family (utm_*, Google/Facebook/Microsoft click ids, bare ref)
TRACKING_PARAM_RE = r"^(utm_[^=&]*|gclid|fbclid|msclkid|ref)(=[^&]*)?$"

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOSTPORT_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"  # drops the fragment


def url_scheme(url: Column) -> Column:
    """Lowercased scheme ('' for scheme-less strings)."""
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def url_host(url: Column, strip_www: bool = True) -> Column:
    """Lowercased host with any port and (by default) a leading ``www.``
    removed; '' for scheme-less strings. The natural grouping key for
    ``structure.contract_graph`` host-graph rollups."""
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1)), r":[0-9]*$", ""
    )
    return F.regexp_replace(host, r"^www\.", "") if strip_www else host


def canonical_url(url: Column, strip_www: bool = True) -> Column:
    """Canonical form of an absolute url::

        - scheme and host lowercased (path/query case PRESERVED)
        - default port dropped (:80 for http, :443 for https; others kept)
        - leading ``www.`` dropped from the host (strip_www=False keeps it)
        - fragment dropped
        - tracking query params dropped (TRACKING_PARAM_RE families),
          remaining params kept in original order; '?' dropped if none left
        - empty path becomes '/'

    Scheme-less strings are returned unchanged.
    """
    scheme = url_scheme(url)
    hostport = F.lower(F.regexp_extract(url, _HOSTPORT_RE, 1))
    rest = F.regexp_extract(url, _REST_RE, 1)

    host = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")

    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    qs = F.array_join(kept, "&")

    rebuilt = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(scheme == "", url).otherwise(rebuilt)


def canonicalize_urls(
    df: DataFrame, url_col: str = "url", strip_www: bool = True
) -> DataFrame:
    """Adds ``canonical_url`` and ``host`` columns. Run on the pages table
    (and on extracted outlink targets) BEFORE ``build_link_graph`` so url
    aliases collapse to one vertex; pair with
    ``graph.build.latest_snapshot`` when captures repeat."""
    u = F.col(url_col)
    return df.withColumn("canonical_url", canonical_url(u, strip_www)).withColumn(
        "host", url_host(u, strip_www)
    )


def url_features(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Crawl-prioritization url-structure features (pure Column regex in
    the Java∩RE2 dialect — map-only, SQL-reproducible): adds

    - ``path_depth``: number of non-empty path segments ('/a/b/' → 2;
      homepage → 0)
    - ``n_params``: query parameters ('?a=1&b=2' → 2; no query → 0)
    - ``is_homepage``: empty or '/' path and no query
    - ``path_len``: characters in the path (query/fragment excluded)

    Deep paths and parameter-heavy urls correlate with calendar traps and
    faceted-navigation spider traps — the standard frontier-demotion
    features next to ``frontier_priority``'s score/staleness terms.

    Non-absolute urls (schemeless, relative, malformed) get NULL numeric
    features and ``is_homepage=false``: the extractors below would return
    path='' and query='' for them, which reads as the strongest-priority
    homepage shape — exactly the rows a frontier must NOT promote on parse
    garbage.
    """
    u = F.col(url_col)
    absolute = u.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    # path = rest up to '?' or '#'
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^#]*?\?([^#]*)", 1)
    seg = F.size(F.filter(F.split(path, "/"), lambda x: x != ""))
    n_params = F.when(query == "", 0).otherwise(
        F.size(F.filter(F.split(query, "&"), lambda x: x != ""))
    )
    null_int = F.lit(None).cast("int")
    return (
        df.withColumn(
            "path_depth", F.when(absolute, seg.cast("int")).otherwise(null_int)
        )
        .withColumn(
            "n_params",
            F.when(absolute, n_params.cast("int")).otherwise(null_int),
        )
        .withColumn(
            "is_homepage",
            absolute & ((path == "") | (path == "/")) & (query == ""),
        )
        .withColumn(
            "path_len",
            F.when(absolute, F.length(path).cast("int")).otherwise(null_int),
        )
    )
