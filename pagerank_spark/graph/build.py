"""pages -> link graph pipeline: extraction, dense-ID remap, edge table.

End-to-end analog of the reference's load path (file -> adjacency,
src/pagerank32c.c:219-298), re-expressed for web-scale input:

  pages(url, warc_ts, html, text, lang)
    -> Arrow UDF out-link extraction (functions/extract.py)
    -> url->id dictionary (graph/ids.py, sort-rank dense ids over page urls)
    -> two equi-joins (src_url, dst_url) -> edges(src: long, dst: long)
    -> dropDuplicates + optional self-loop keep (reference allows self-loops)

Link targets not present in the page set (external urls, ~2% of anchors) drop
out at the dst join — the inner join IS the filter, no separate pass. The
dictionary is broadcast when small; at 10^12-document scale both joins run as
shuffled hash joins on url, and the edge table is then bucketed by src via
the Catalog's bucket spec so per-iteration PageRank joins reuse the layout.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark.functions.extract import extract_outlinks
from pagerank_spark.graph.ids import assign_dense_ids


@dataclass
class LinkGraph:
    vertices: DataFrame   # (url, id)  — the dictionary
    edges: DataFrame      # (src, dst) — dense 0-based, deduplicated
    n: int


def build_link_graph(
    pages: DataFrame,
    broadcast_dict: bool | None = None,
    dedup: bool = True,
    persist_pages: bool = True,
) -> LinkGraph:
    if persist_pages and pages.storageLevel.useMemory is False:
        # the pipeline scans pages twice (dictionary + extraction); without a
        # cache both scans re-run the upstream generator/reader
        pages = pages.persist()
    ids = assign_dense_ids(pages, "url")
    n = ids.count()
    if broadcast_dict is None:
        broadcast_dict = n <= 5_000_000
    # beyond the explicit broadcast bound the dictionary is O(V): hint
    # shuffle_hash so Catalyst cannot auto-broadcast it off a misleading
    # compressed-size estimate (driver-OOM class, PLANS.md)
    dict_df = F.broadcast(ids) if broadcast_dict else ids.hint("shuffle_hash")

    raw = extract_outlinks(pages)
    edges = (
        raw.join(dict_df.withColumnRenamed("url", "src_url").withColumnRenamed("id", "src"), "src_url")
        .join(dict_df.withColumnRenamed("url", "dst_url").withColumnRenamed("id", "dst"), "dst_url")
        .select("src", "dst")
    )
    if dedup:
        edges = edges.dropDuplicates(["src", "dst"])
    return LinkGraph(vertices=ids, edges=edges, n=n)


def latest_snapshot(pages: DataFrame, url_col: str = "url", ts_col: str = "warc_ts"):
    """Crawl-snapshot dedup: keep each url's NEWEST capture (max warc_ts;
    deterministic under recrawl ties via the max_by struct tie-break on the
    full row order below). Common Crawl re-fetches pages across snapshots,
    so every pipeline stage downstream of ingest — extraction, graph build,
    dedup — must see one row per url or edges double-count.

    One shuffle on url (map-side partial max). Implemented as a max_by over
    a (ts, row) struct rather than a window+filter: no per-group sort, and
    the aggregate form keeps the partial-aggregation (combiner) path that a
    row_number window lacks."""
    other = [c for c in pages.columns if c != url_col]
    packed = pages.select(
        url_col, F.struct(F.col(ts_col).alias("_ts"), F.struct(*other).alias("_row")).alias("p")
    )
    latest = packed.groupBy(url_col).agg(F.max("p").alias("p"))
    return latest.select(url_col, *[F.col(f"p._row.{c}").alias(c) for c in other])
