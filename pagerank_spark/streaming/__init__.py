from pagerank_spark.streaming.ingest import (
    stream_edges,
    stream_pages,
    write_edge_stream,
)
from pagerank_spark.streaming.state import incremental_outdegree
from pagerank_spark.streaming.stats import (
    crawl_stats,
    first_seen_pages,
    windowed_counts,
)

__all__ = [
    "stream_pages",
    "stream_edges",
    "write_edge_stream",
    "crawl_stats",
    "first_seen_pages",
    "incremental_outdegree",
    "windowed_counts",
]
