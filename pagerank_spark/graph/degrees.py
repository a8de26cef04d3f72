"""Degree / dangling-node computations (reference get_outdegree_*,
src/get_outdegree_single.nasm:17-54, and the nz/z split,
srcSparse/pagerank32c.c:462-482) as hash aggregates and anti-joins."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame) -> DataFrame:
    """(id, outdeg) for ids with >=1 out-edge. Map-side partial agg applies."""
    return edges.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("outdeg")
    )


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("dst").alias("id")).agg(
        F.count(F.lit(1)).alias("indeg")
    )


def dangling_nodes(vertices: DataFrame, edges: DataFrame) -> DataFrame:
    """vertices(id) with outdeg 0 — the reference's `z` index vector.

    Anti-join; the distinct-src side is aggregated first so the join input is
    at most |V| rows, not |E|.
    """
    srcs = edges.select(F.col("src").alias("id")).distinct()
    return vertices.join(srcs, "id", "left_anti")


def degree_histogram(edges: DataFrame) -> DataFrame:
    """(outdeg, n_vertices) — drives hub/skew decisions."""
    return (
        out_degrees(edges)
        .groupBy("outdeg")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .orderBy("outdeg")
    )
