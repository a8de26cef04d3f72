"""Crawl-frontier scheduling: pick what to (re)fetch next under per-host
politeness budgets.

The reference engine ranks a finished crawl
(/root/reference/Pagerank/src/pagerank32c.c); a production crawler closes
the loop by feeding those ranks back into frontier prioritization (the
OPIC/recrawl-scheduling literature: Cho & Garcia-Molina 2000, Abiteboul
et al. 2003). This module is that feedback operator: given candidate urls
with an importance score and a last-fetch timestamp, emit the top
``budget_per_host`` urls per host by a staleness-boosted priority.

Scale note — the whole design is the skew story. "Top-k per host" is a
window over host, and web hosts are the canonical hot keys (one host can
hold 1e8 candidate urls while the median holds 10). A single
row_number() window would sort every candidate of the hottest host on one
reducer; instead the selection runs as a salted two-stage top-k, exactly
the engine's salted-aggregation recipe (graph/skew.py): stage 1 takes the
per-(host, salt) top-k over ``n_salts`` deterministic shards, stage 2
re-ranks the surviving k*n_salts rows per host. Stage 2's input is
bounded by budget*n_salts per host regardless of how hot the host is.
The result is EXACT: every true per-host top-k row wins its own shard in
stage 1 (any row beating it in a shard would also beat it globally).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pagerank_spark import util as _util


def frontier_priority(
    score: Column,
    last_fetch_ts: Column,
    now: str,
    half_life_days: float = 30.0,
    cold_age_days: float = 365.0,
) -> Column:
    """Staleness-boosted importance: ``score * (1 + age_days / half_life)``
    with never-fetched urls (NULL last_fetch_ts) aged ``cold_age_days``.
    Pure column arithmetic (datediff + multiply), so the same expression is
    reproducible in ANSI SQL for the oracle — no pow/exp whose libm
    last-bits could diverge between engines.
    """
    age = F.coalesce(
        F.datediff(F.lit(now).cast("date"), last_fetch_ts.cast("date")).cast(
            "double"
        ),
        F.lit(float(cold_age_days)),
    )
    return score * (F.lit(1.0) + age / F.lit(float(half_life_days)))


def schedule_frontier(
    candidates: DataFrame,
    now: str,
    budget_per_host: int = 10,
    half_life_days: float = 30.0,
    cold_age_days: float = 365.0,
    n_salts: int = 32,
    url_col: str = "url",
    host_col: str = "host",
    score_col: str = "score",
    last_fetch_col: str = "last_fetch_ts",
) -> DataFrame:
    """Select the top ``budget_per_host`` urls per host by staleness-boosted
    priority. Returns (host, url, priority, fetch_order) with fetch_order
    1..budget within each host; ties break on url asc so the schedule is
    deterministic.

    ``now`` is an explicit 'YYYY-MM-DD' string, not wall-clock: schedules
    must be reproducible across retries of the same planning run.
    """
    if budget_per_host < 1:
        raise ValueError("budget_per_host must be >= 1")
    pri = frontier_priority(
        F.col(score_col), F.col(last_fetch_col), now, half_life_days, cold_age_days
    )
    base = candidates.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        pri.alias("priority"),
    )
    # salted two-stage exact top-k (util.salted_top_k): hot hosts spread
    # over n_salts reducers in stage 1, stage 2 re-ranks <= budget*n_salts
    # survivors per host — no full per-host sort anywhere
    return _util.salted_top_k(
        base,
        keys=["host"],
        order=[F.desc("priority"), F.asc("url")],
        k=budget_per_host,
        salt_expr=F.xxhash64("url"),
        n_salts=n_salts,
        rank_col="fetch_order",
    ).select("host", "url", "priority", "fetch_order")
