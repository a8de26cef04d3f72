"""URL canonicalization: hand-computed expected forms for the alias classes
a crawl ingest must collapse, plus the map-only plan contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_spark.functions.urls import canonicalize_urls, url_host

CASES = [
    # (raw, canonical, host)
    ("HTTP://WWW.Example.COM:80", "http://example.com/", "example.com"),
    (
        "https://Sub.Example.com:443/A/B?x=1&utm_source=a&y=2#frag",
        "https://sub.example.com/A/B?x=1&y=2",
        "sub.example.com",
    ),
    ("https://example.com:8443/p", "https://example.com:8443/p", "example.com"),
    ("http://example.com/?utm_campaign=z", "http://example.com/", "example.com"),
    ("ftp://Example.com:80/File", "ftp://example.com:80/File", "example.com"),
    ("/relative/path", "/relative/path", ""),
    # param matching is per-token, case-sensitive, bare names count
    (
        "http://www.example.com/a?ref=tw&REF=x",
        "http://example.com/a?REF=x",
        "example.com",
    ),
    ("http://example.com#only-frag", "http://example.com/", "example.com"),
    (
        "http://example.com/p?gclid=abc&fbclid&msclkid=1&q=k",
        "http://example.com/p?q=k",
        "example.com",
    ),
    # path/query case preserved; empty query tokens dropped
    ("https://example.com/UP/Case?A=B&&c=d", "https://example.com/UP/Case?A=B&c=d",
     "example.com"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(i, r) for i, (r, _, _) in enumerate(CASES)],
                               "i long, url string")
    got = {
        r["i"]: (r["canonical_url"], r["host"])
        for r in canonicalize_urls(df).collect()
    }
    for i, (_, want_canon, want_host) in enumerate(CASES):
        assert got[i] == (want_canon, want_host), (i, CASES[i], got[i])


def test_strip_www_opt_out(spark):
    df = spark.createDataFrame([("http://WWW.Example.com/x",)], "url string")
    row = canonicalize_urls(df, strip_www=False).first()
    assert row["canonical_url"] == "http://www.example.com/x"
    assert row["host"] == "www.example.com"


def test_canonicalization_is_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) — the property that makes it
    safe to run at ingest AND again before graph build."""
    df = spark.createDataFrame([(r,) for r, _, _ in CASES], "url string")
    once = canonicalize_urls(df).select(F.col("canonical_url").alias("url"))
    twice = canonicalize_urls(once).collect()
    assert all(r["canonical_url"] == r["url"] for r in twice)


def test_urls_stay_jvm_side(spark):
    """Pure Column expressions: single Project over the scan, no Python
    node, no Exchange."""
    docs = spark.createDataFrame([("http://a.com/x",)], "url string")
    df = canonicalize_urls(docs)
    plan = spark.sparkContext._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan
    assert "Exchange" not in plan


def test_url_features_hand_cases(spark):
    from pagerank_spark.functions.urls import url_features

    cases = [
        (0, "https://example.com", 0, 0, True, 0),
        (1, "https://example.com/", 0, 0, True, 1),
        (2, "https://example.com/a/b/c", 3, 0, False, 6),
        (3, "https://example.com/a/b/?x=1&y=2", 2, 2, False, 5),
        (4, "http://example.com/?", 0, 0, True, 1),  # bare ? == no query
        (5, "https://example.com/p?x=1#frag", 1, 1, False, 2),
        (6, "https://example.com/cal/2026/08/19?view=day&tz=utc", 4, 2, False, 15),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, *_ in cases], "doc_id long, url string"
    )
    got = {r["doc_id"]: (r["path_depth"], r["n_params"], r["is_homepage"], r["path_len"])
           for r in url_features(df).collect()}
    for i, _, d, p, h, L in cases:
        assert got[i] == (d, p, h, L), (i, got[i])


def test_url_features_non_absolute_not_homepage(spark):
    """Schemeless/relative/malformed urls must not silently parse as
    homepages (the strongest frontier-priority shape): numeric features go
    NULL and is_homepage is false."""
    from pagerank_spark.functions.urls import url_features

    bad = ["example.com/a/b", "/relative/path", "mailto:x@y", "", "://nohost"]
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(bad)], "doc_id long, url string"
    )
    for r in url_features(df).collect():
        assert r["is_homepage"] is False, r
        assert r["path_depth"] is None and r["n_params"] is None, r
        assert r["path_len"] is None, r
