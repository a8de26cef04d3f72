"""Event sessionization: split each user's event stream into sessions at
inactivity gaps — the standard clickstream/telemetry primitive every
analytics engine ships (and the batch twin of the streaming module's
watermarked windows).

Semantics: events of one user, ordered by (ts, event_id) — the id
tie-break makes equal-timestamp orderings deterministic and therefore
SQL-oracle-reproducible — start a new session whenever the gap to the
previous event exceeds ``gap_seconds`` (strictly greater). Gap arithmetic
runs on exact MICROSECOND integers (``unix_micros``; DuckDB twin
``epoch_us``) — timestamps carry sub-second components, so truncating to
seconds would misclassify boundary gaps. Session numbering is 1-based per
user in time order.

Scale shape: ONE shuffle on user_id (the window partition); everything
else is per-partition sort + running sum, map-side. Hot users concentrate
their events in one partition by construction — that is inherent to
per-user ordering semantics (any engine pays it); per-user event counts,
not corpus size, bound the partition. At 100 TB the stats variant is the
one to run: its output is O(sessions), never O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(col):
    return F.unix_micros(col.cast("timestamp"))


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Tag every event with its session: adds ``session_seq`` (1-based per
    user) and ``new_session`` to the input columns."""
    gap_us = int(gap_seconds) * 1_000_000
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w)
    # parquet event times load as TIMESTAMP_NTZ, which unix_micros rejects:
    # cast through TIMESTAMP (deterministic — the engine pins UTC sessions)
    new_sess = F.when(
        prev.isNull()
        | (_us(F.col(ts_col)) - _us(prev) > gap_us),
        1,
    ).otherwise(0)
    return events.withColumn("new_session", new_sess).withColumn(
        "session_seq",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """-> (user_id, session_seq, n_events, start_ts, end_ts, duration_us):
    one row per session. duration_us is exact integer microseconds (divide
    by 1e6 for seconds; kept integral so results hash-compare exactly)."""
    tagged = sessionize(events, gap_seconds, user_col, ts_col, id_col)
    return tagged.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        (_us(F.max(ts_col)) - _us(F.min(ts_col))).alias("duration_us"),
    )


def retention_cohorts(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Weekly retention triangle: users grouped by first-active ISO week
    (their cohort), counted in every later week they return —
    (cohort_week: date, age_weeks: int, n_users) with age 0 = the cohort's
    own size. The standard activity-retention report over an event stream.

    Plan: distinct (user, week) pairs (one shuffle with partial distinct),
    a per-user min-week aggregate (co-partitioned on user), and the final
    cohort/age count — no windows, no driver state; weeks truncate to ISO
    Monday identically in Spark and DuckDB so the oracle is exact.
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    uw = events.select(F.col(user_col).alias("u"), wk.alias("week")).distinct()
    first = uw.groupBy("u").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(first, "u")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("week"), F.col("cohort_week")) / 7)
            .cast("int")
            .alias("age_weeks"),
        )
        .agg(F.count_distinct("u").alias("n_users"))
    )
