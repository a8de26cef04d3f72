r"""robots.txt politeness filter (RFC 9309) — the crawl-frontier stage that
decides which fetched/extracted urls a polite crawler may keep.

Two halves, split so the cheap part stays relational:

- :func:`robots_rules` — parse each host's robots.txt into a rules table
  (host, allow, pattern). Parsing is stateful line iteration (user-agent
  group selection), so it runs as an Arrow-batched UDF — one short text
  per HOST (robots.txt is capped at 500 KiB by the RFC), i.e. the O(hosts)
  side, millions of rows where the url side has trillions.
- :func:`robots_filter` — apply the rules to a url table with pure
  relational ops: one join on host + LIKE-based wildcard matching + a
  max-struct aggregation implementing the RFC decision rule (LONGEST
  matching pattern wins; equal-length tie goes to Allow; no match =
  allowed). Wildcard patterns compile to SQL LIKE patterns (``*`` → ``%``
  with ``%_\`` escaped, trailing ``$`` = no appended ``%``) — column-value
  LIKE, so no per-row regex compilation, and the DuckDB oracle can run the
  IDENTICAL match.

Semantics notes (documented simplifications, both standard practice):
- group selection is exact case-insensitive token match for the agent,
  falling back to the ``*`` group (RFC's longest-prefix product-token
  refinement is not implemented);
- pattern specificity = octet length of the raw pattern including
  wildcards (the RFC measure);
- ``Crawl-delay``/``Sitemap`` and unknown directives are ignored; an
  empty ``Disallow:`` contributes no rule (= allow everything).

At 100 TB: the rules table is O(hosts x rules/host) and joins the url
table on host — mega-hosts are url-side skew, but each carries only its
own few dozen rules, so the per-key build side stays tiny; the rules side
is size-gated to shuffle_hash above the broadcast-safe bound like every
other dimension join in the engine.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_spark import util as _util

ROBOTS_RULES_SCHEMA = "host string, allow boolean, pattern string"


def parse_robots_text(text: str, agent: str = "*") -> list[tuple[bool, str]]:
    """Rules of the group governing ``agent``: [(allow, pattern), ...].

    Pure-Python reference used inside the Arrow UDF and directly by
    tests. Consecutive ``User-agent`` lines share one group; a rule line
    closes the agent list; blank lines are insignificant (RFC 9309)."""
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    collecting_agents = False
    for raw in (text or "").split("\n"):
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not collecting_agents:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                collecting_agents = True
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            collecting_agents = False
            if val:
                cur_rules.append((key == "allow", val))
        else:  # crawl-delay, sitemap, unknown directives
            collecting_agents = False
    if cur_agents:
        groups.append((cur_agents, cur_rules))
    selected = [g for g in groups if agent in g[0]]
    if not selected:
        selected = [g for g in groups if "*" in g[0]]
    return [r for g in selected for r in g[1]]


def robots_rules(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    text_col: str = "robots_txt",
) -> DataFrame:
    """(host, robots_txt) -> (host, allow, pattern) rules for ``agent``.

    Arrow-batched; hosts whose file yields no applicable rules emit no
    rows (absence of rules = everything allowed, which is also what
    :func:`robots_filter`'s left join concludes)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            hosts: list[str] = []
            allows: list[bool] = []
            pats: list[str] = []
            for host, text in zip(b[host_col], b[text_col]):
                for allow, pattern in parse_robots_text(text, agent):
                    hosts.append(host)
                    allows.append(allow)
                    pats.append(pattern)
            yield pd.DataFrame(
                {"host": hosts, "allow": allows, "pattern": pats}
            )

    return robots.select(host_col, text_col).mapInPandas(
        gen, ROBOTS_RULES_SCHEMA
    )


def like_pattern(pattern: Column) -> Column:
    """Compile a robots path pattern to a SQL LIKE pattern (ESCAPE ``\\``):
    ``%``/``_``/``\\`` escaped, ``*`` → ``%``, trailing ``$`` anchors (no
    appended ``%``), otherwise prefix semantics (``%`` appended)."""
    esc = F.replace(
        F.replace(
            F.replace(pattern, F.lit("\\"), F.lit("\\\\")),
            F.lit("%"),
            F.lit("\\%"),
        ),
        F.lit("_"),
        F.lit("\\_"),
    )
    star = F.replace(esc, F.lit("*"), F.lit("%"))
    return F.when(
        pattern.endswith("$"),
        F.substring(star, F.lit(1), F.length(star) - 1),
    ).otherwise(F.concat(star, F.lit("%")))


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Adds an ``allowed`` boolean to ``urls`` per the RFC decision rule.

    The matched path is the url's path+query (fragment and host handled by
    functions.urls); rules join on the url's host. Longest matching
    pattern wins (octet length — the RFC measure, so multibyte patterns
    rank correctly), equal-length tie goes to Allow, no matching rule (or
    no rules for the host) = allowed — all three fall out of one
    ``MAX(struct(octet_length, allow))`` aggregation, because boolean
    ``true`` sorts above ``false``.

    Decisions are computed once per DISTINCT url and joined back, so the
    input's cardinality and extra columns pass through untouched (a
    frontier row seen from two referrers stays two rows). The rules frame
    is materialized first (eager localCheckpoint) so the Arrow-UDF parse
    runs once, not once for the size gate and again for the join.
    """
    from pagerank_spark.functions.urls import url_host

    rules = rules.localCheckpoint(eager=True)
    u = F.col(url_col)
    with_host = (
        urls.select(u.alias(url_col))
        .distinct()
        .withColumn("_rb_host", url_host(u))
        .withColumn(
            "_rb_path",
            F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1),
        )
        .withColumn(
            "_rb_path",
            F.when(F.col("_rb_path") == "", "/").otherwise(F.col("_rb_path")),
        )
    )

    r = rules.select(
        F.col("host").alias("_rb_host"),
        F.col("allow").alias("_rb_allow"),
        F.octet_length("pattern").alias("_rb_len"),
        like_pattern(F.col("pattern")).alias("_rb_like"),
    )
    # gate on distinct hosts (rules/host is bounded by the 500 KiB file
    # cap, so host count tracks the build-side row count)
    if (
        _util.approx_vertex_count(rules, src="host", dst="host")
        > _util.BROADCAST_SAFE_ROWS
    ):
        r = r.hint("shuffle_hash")

    joined = with_host.join(r, "_rb_host", "left").withColumn(
        "_rb_match",
        F.expr("_rb_path LIKE _rb_like ESCAPE '\\\\'"),
    )
    decisions = (
        joined.groupBy(url_col)
        .agg(
            F.max(
                F.when(
                    F.col("_rb_match"),
                    F.struct(
                        F.col("_rb_len").alias("l"), F.col("_rb_allow").alias("a")
                    ),
                )
            ).alias("_rb_best")
        )
        .select(
            url_col,
            F.coalesce(F.col("_rb_best.a"), F.lit(True)).alias("allowed"),
        )
    )
    return urls.join(decisions, url_col)


def robots_sitemaps(
    robots: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """(host, robots_txt) -> (host, sitemap_url), one row per ``Sitemap:``
    directive. Sitemap lines are group-independent (RFC 9309), so this is
    a pure Column regex over the raw text — no parse state, map-only."""
    return robots.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(
                F.col(text_col), F.lit(r"(?i)sitemap:[ \t]*([^ \t\r\n#]+)"), 1
            )
        ).alias("sitemap_url"),
    )


def sitemap_locs(df: DataFrame, xml_col: str = "sitemap_xml") -> DataFrame:
    """Explode ``<loc>`` entries out of sitemap XML (urlset AND
    sitemapindex — the tag is the same; indexes point at more sitemaps,
    which the crawl loop fetches and feeds back through this). Regex
    extraction is exact here because ``<loc>`` content is a url: XML
    forbids a raw ``<`` inside it (it must be escaped), so ``[^<]*``
    cannot over-capture. Map-only Column ops; keeps all input columns."""
    return df.withColumn(
        "loc",
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit(r"<loc>[ \t\r\n]*([^<]*?)[ \t\r\n]*</loc>"), 1
            )
        ),
    )
