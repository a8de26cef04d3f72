"""Structured Streaming ingest: continuously-arriving page batches -> edges.

The batch engine treats the crawl as a static Iceberg/parquet table of pages
(url, warc_ts, html, text, lang). In production the crawl arrives
continuously — new WARC-derived parquet files land in a directory every few
minutes. This module is the incremental twin of
``pagerank_spark.graph.build.build_link_graph``'s first stage: it tails the
landing directory with the file stream source, runs the SAME vectorized
Arrow extraction UDF (``functions/extract.py`` — stateless, so it is valid
in streaming unchanged), and appends edge rows to a checkpointed sink with
exactly-once file-sink semantics.

Scale notes (1000-executor, 100 TB crawl):
- The file source scales by listing, not by content: keep one directory per
  crawl day and point the stream at the active day to bound listing cost;
  ``maxFilesPerTrigger`` caps per-micro-batch work so a backlog replays at a
  controlled rate instead of one giant batch.
- Extraction is map-only (no shuffle): each micro-batch is embarrassingly
  parallel, input-partition count = files x row-groups.
- The parquet sink commits files atomically through the sink metadata log in
  ``checkpointLocation`` — a crashed micro-batch replays without duplicate
  edges (exactly-once for file sinks). Point the checkpoint at durable
  storage (HDFS/S3), never executor-local disk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from pagerank_spark.sources.pages import PAGES_SCHEMA


def stream_pages(
    spark: SparkSession,
    input_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Tail a landing directory of page parquet files as a stream.

    The schema is pinned to the crawl-table contract (PAGES_SCHEMA) — the
    file source requires an explicit schema and pinning it keeps a
    malformed producer file from silently widening types mid-stream.
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(input_dir)


def stream_edges(pages: DataFrame) -> DataFrame:
    """Streaming pages -> (src_url, dst_url, warc_ts) edge rows.

    Same two-step plan as the batch ``extract_outlinks`` (Arrow UDF returns
    the link array, explode stays JVM-side), plus ``warc_ts`` carried so
    downstream consumers can window or de-duplicate edges in event time.
    """
    from pagerank_spark.functions.extract import extract_links_udf

    return (
        pages.select("url", "warc_ts", extract_links_udf(F.col("html")).alias("links"))
        .select(
            F.col("url").alias("src_url"),
            F.explode("links").alias("dst_url"),
            "warc_ts",
        )
    )


def write_edge_stream(
    edges: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> "StreamingQuery":
    """Checkpointed append sink for the edge stream (exactly-once files).

    Returns the started StreamingQuery. ``available_now=True`` drains the
    current backlog then stops (the batch-replay trigger used in tests and
    backfills); pass False for a continuously-running micro-batch stream.
    """
    writer = (
        edges.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
