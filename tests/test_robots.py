"""robots.txt parse + filter: RFC 9309 group selection and the
longest-match / allow-wins-tie / no-match-allowed decision rule."""

from __future__ import annotations

from pagerank_spark.pipeline.robots import (
    parse_robots_text,
    robots_filter,
    robots_rules,
)

ROBOTS = """\
# crawler policy
User-agent: evilbot
Disallow: /

User-agent: prbot
User-agent: otherbot
Disallow:
Allow: /tie*
Disallow: /tie/
Disallow: /private
Allow: /private/ok$
Crawl-delay: 10
Sitemap: https://a.example/sitemap.xml
"""


def test_parse_group_selection_and_directives():
    # exact agent match picks the shared prbot/otherbot group, not evilbot's
    got = parse_robots_text(ROBOTS, "PrBot")
    assert got == [
        (True, "/tie*"),
        (False, "/tie/"),
        (False, "/private"),
        (True, "/private/ok$"),
    ]
    # unknown agent falls back to the '*' group; none here -> no rules
    assert parse_robots_text(ROBOTS, "nobody") == []
    # the evil group is reachable by its own name
    assert parse_robots_text(ROBOTS, "evilbot") == [(False, "/")]
    assert parse_robots_text(None, "x") == []


def test_parse_star_group_fallback():
    txt = "User-agent: *\nDisallow: /x\n\nUser-agent: special\nAllow: /x"
    assert parse_robots_text(txt, "anyone") == [(False, "/x")]
    assert parse_robots_text(txt, "Special") == [(True, "/x")]


def test_robots_filter_decisions(spark):
    robots = spark.createDataFrame(
        [("a.example", ROBOTS), ("empty.example", "")],
        "host string, robots_txt string",
    )
    rules = robots_rules(robots, agent="prbot")
    got_rules = {
        (r["host"], r["allow"], r["pattern"]) for r in rules.collect()
    }
    assert ("a.example", False, "/private") in got_rules
    assert all(h == "a.example" for h, _, _ in got_rules)

    cases = [
        # (url, expect_allowed)
        ("https://a.example/", True),                 # no rule matches
        ("https://a.example/private", False),          # prefix disallow
        ("https://a.example/private/x", False),        # prefix extends
        ("https://a.example/private/ok", True),        # $-anchored allow (longer)
        ("https://a.example/private/okx", False),      # $ must not match past end
        ("https://a.example/tie/x", True),             # equal length: allow wins
        ("https://www.A.example/private", False),      # host normalization
        ("https://unknown.example/private", True),     # no rules for host
        ("https://empty.example/private", True),       # empty robots.txt
    ]
    urls = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {r["url"]: r["allowed"] for r in robots_filter(urls, rules).collect()}
    for u, want in cases:
        assert got[u] is want, (u, want, got[u])


def test_robots_filter_like_metachars(spark):
    """URL paths containing %/_ and robots patterns containing them must
    not leak LIKE semantics (escaping test)."""
    rules_df = spark.createDataFrame(
        [("h.example", False, "/a_b"), ("h.example", False, "/c%d")],
        "host string, allow boolean, pattern string",
    )
    cases = [
        ("https://h.example/a_b", False),   # literal _ matches
        ("https://h.example/axb", True),    # _ must NOT be a wildcard
        ("https://h.example/c%d", False),
        ("https://h.example/cXd", True),    # % must NOT be a wildcard
    ]
    urls = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = {
        r["url"]: r["allowed"] for r in robots_filter(urls, rules_df).collect()
    }
    for u, want in cases:
        assert got[u] is want, (u, want, got[u])


def test_robots_sitemaps_and_sitemap_locs(spark):
    from pagerank_spark.pipeline.robots import robots_sitemaps, sitemap_locs

    robots = spark.createDataFrame(
        [
            ("a.example",
             "User-agent: *\nDisallow: /x\nSitemap: https://a.example/s1.xml\n"
             "sitemap: https://a.example/s2.xml # trailing comment\n"),
            ("b.example", "User-agent: *\nAllow: /\n"),
        ],
        "host string, robots_txt string",
    )
    got = {(r["host"], r["sitemap_url"]) for r in robots_sitemaps(robots).collect()}
    assert got == {
        ("a.example", "https://a.example/s1.xml"),
        ("a.example", "https://a.example/s2.xml"),
    }

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> https://a.example/p1 </loc></url>"
        "<url><loc>https://a.example/p2</loc></url></urlset>"
    )
    df = spark.createDataFrame(
        [(1, xml), (2, "<urlset></urlset>")], "id long, sitemap_xml string"
    )
    locs = {(r["id"], r["loc"]) for r in sitemap_locs(df).collect()}
    assert locs == {(1, "https://a.example/p1"), (1, "https://a.example/p2")}


def test_robots_filter_preserves_cardinality_and_columns(spark):
    from pagerank_spark.pipeline.robots import robots_filter

    rules = spark.createDataFrame(
        [("h.example", False, "/x")], "host string, allow boolean, pattern string"
    )
    # same url twice (two referrers) + an extra column that must pass through
    urls = spark.createDataFrame(
        [("https://h.example/x", "ref1"), ("https://h.example/x", "ref2"),
         ("https://h.example/ok", "ref3")],
        "url string, referrer string",
    )
    got = robots_filter(urls, rules).collect()
    assert len(got) == 3
    by_ref = {r["referrer"]: r["allowed"] for r in got}
    assert by_ref == {"ref1": False, "ref2": False, "ref3": True}


def test_robots_specificity_is_octets_not_chars(spark):
    """RFC 9309 measures pattern specificity in OCTETS: Disallow '/xé'
    (3 chars, 4 octets) beats Allow '/x*' (3 chars, 3 octets) on the path
    '/xé' — a character-length measure would tie and wrongly allow."""
    from pagerank_spark.pipeline.robots import robots_filter

    rules = spark.createDataFrame(
        [("h.example", True, "/x*"), ("h.example", False, "/xé")],
        "host string, allow boolean, pattern string",
    )
    urls = spark.createDataFrame([("https://h.example/xé",)], "url string")
    assert robots_filter(urls, rules).first()["allowed"] is False
