"""Event-time crawl statistics: watermarked windows + streaming dedup.

Two streaming-native operators over the page stream:

- ``crawl_stats``: per-host page counts in event-time tumbling windows of
  ``warc_ts``, with a watermark so late-arriving WARC batches are folded in
  up to the allowed lateness and state for closed windows is dropped. This
  is the crawl-health dashboard query (pages/host/hour).
- ``first_seen_pages``: streaming de-duplication of recrawled urls — keeps
  the first occurrence of each url within the watermark horizon. The
  watermark bounds the dedup state: without it, url state grows without
  limit over a 10^12-document crawl.

Scale notes: both operators shuffle once on their state key (window+host /
url) into the state store; state per partition is bounded by the watermark,
so executors hold O(active-horizon) rows, not O(stream-history).

Watermark contract (one-directional, per Spark semantics): data within the
horizon is NEVER dropped; data beyond it MAY still be aggregated — with the
Spark 4 default ``statefulOperator.allowMultiple=true`` late filtering uses
the previous micro-batch's watermark, so a beyond-horizon row typically
lands in its own immediately-finalized window rather than being dropped.
The watermark's hard guarantee is the STATE BOUND (closed windows / expired
url keys are evicted), which is the property that matters at crawl scale. Skewed
hosts (one domain dominating a crawl batch) only affect the single state
partition that owns the host — acceptable for counts; for heavier per-host
aggregates, salt the host key and re-aggregate downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def host_of(url: str | Column = "url") -> Column:
    """Extract the host from a crawl url (JVM-side regex, no UDF)."""
    return F.regexp_extract(url, r"^[a-z]+://([^/]+)", 1)


def windowed_counts(
    df: DataFrame,
    time_col: str,
    key: Column,
    window: str = "1 hour",
    watermark: str = "2 hours",
    count_alias: str = "n_rows",
) -> DataFrame:
    """Event-time tumbling-window counts per key.

    Works identically on streaming and batch frames (``withWatermark`` is a
    no-op in batch), so the batch run of the SAME code is the oracle twin of
    the streaming run — which is how the driver's DuckDB gate covers it
    (``time_bucket`` in SQL; both align windows to the epoch).

    ``key`` must be an aliased Column (its alias names the output column).
    """
    agg = (
        df.withWatermark(time_col, watermark)
        .groupBy(F.window(time_col, window).alias("w"), key)
        .agg(F.count(F.lit(1)).alias(count_alias))
    )
    key_name = agg.columns[1]
    return agg.select(
        F.col("w.start").alias("window_start"), key_name, count_alias
    )


def crawl_stats(
    pages: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming per-host page counts in event-time windows of warc_ts.

    Append output mode emits a (window_start, host, n_pages) row once the
    watermark passes the window end — i.e. once the row is final.
    """
    return windowed_counts(
        pages, "warc_ts", host_of("url").alias("host"),
        window=window, watermark=watermark, count_alias="n_pages",
    )


def first_seen_pages(pages: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming url dedup: first occurrence per url within the watermark.

    Recrawls of a url that arrive within the watermark horizon are dropped;
    the watermark lets the state store expire url keys once they can no
    longer receive a duplicate, keeping state bounded on an unbounded crawl.
    """
    return pages.withWatermark("warc_ts", watermark).dropDuplicates(["url"])
