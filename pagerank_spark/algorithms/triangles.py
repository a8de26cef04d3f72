"""Exact triangle counting via degree-ordered orientation.

Classic shuffle-optimal formulation (Suri & Vassilvitskii, WWW'11 "Counting
triangles and the curse of the last reducer"): orient each undirected edge
from the lower-(degree, id) endpoint to the higher, so every vertex's
out-neighborhood in the oriented graph is O(sqrt(m)) even at power-law hubs —
the wedge self-join then does O(m^{3/2}) work total instead of exploding at
hubs.

  wedges  = oriented(p, a) ⋈ oriented(p, b) on pivot p, a < b
  closed  = wedges semi-joined against oriented edges (a, b)
  global  = count(closed); per-vertex = explode each triangle's 3 corners.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _oriented(edges: DataFrame, big: bool | None = None) -> DataFrame:
    from pagerank_spark import util

    # canonicalize (lo, hi) FIRST, so the dedup shuffles |E| rows instead of
    # the 2|E| both-directions form (it used to be the largest shuffle here),
    # and checkpoint: the canonical edge set feeds both the degree aggregate
    # and the ranking join
    # one exchange on `a` serves BOTH the dedup (HashPartitioning(a)
    # satisfies its ClusteredDistribution(a, b)) and the big-graph ranking
    # join on `a` below — persist keeps the outputPartitioning that a
    # localCheckpoint's Scan ExistingRDD would drop. Skew exposure matches
    # the downstream joins/aggregates (per-vertex degree), with map-side
    # partial dedup absorbing the fan-in before the exchange.
    canon = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .repartition("a")
        .dropDuplicates(["a", "b"])
        .persist()
    )
    canon.count()  # materialize eagerly (replaces the old eager checkpoint)
    if big is None:
        # deg is O(V): above the safe-broadcast row count its hash relation
        # OOMs the driver if auto-broadcast (PLANS.md); below it, the
        # broadcast join is the better small-graph plan — size-gate the hint
        # on the broadcast-side (vertex) count like CC/LP/PageRank. The HLL
        # runs over the checkpointed canonical set, not a rescan of the input.
        row = (
            canon.select(F.col("a").alias("x"))
            .union(canon.select(F.col("b").alias("x")))
            .agg(F.approx_count_distinct("x").alias("n"))
            .first()
        )
        big = int(row["n"]) > util.BROADCAST_SAFE_ROWS
    deg = (
        canon.select(F.explode(F.array("a", "b")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    d1 = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    d2 = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    if big:
        d1, d2 = d1.hint("shuffle_hash"), d2.hint("shuffle_hash")
    # orient each canonical pair by (deg, id)
    canon = canon.join(d1, "a").join(d2, "b")
    return canon.select(
        F.when(
            (F.col("deg_a") < F.col("deg_b"))
            | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
            F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
        )
        .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
        .alias("e")
    ).select(F.col("e.lo").alias("u"), F.col("e.hi").alias("v"))


def triangles(edges: DataFrame) -> DataFrame:
    """-> one row per triangle (x, y, z), x<y<z. Exact, each counted once."""
    # persist partitioned on the pivot: w1/w2 are alias-projections of the
    # same cached table, so the wedge self-join on p sees HashPartitioning(p)
    # on both sides and plans ZERO exchanges (previously the checkpoint
    # dropped partitioning and both wedge sides re-shuffled O(E') rows)
    o = _oriented(edges).repartition("u").persist()
    o.count()  # materialize eagerly
    w1 = o.select(F.col("u").alias("p"), F.col("v").alias("a"))
    w2 = o.select(F.col("u").alias("p"), F.col("v").alias("b"))
    wedges = w1.join(w2, "p").filter(F.col("a") < F.col("b"))
    # closing edge may be oriented either way between a and b
    closing = o.select(F.col("u").alias("a"), F.col("v").alias("b")).union(
        o.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    tri = wedges.join(closing, ["a", "b"], "left_semi")
    return tri.select(
        F.least("p", "a", "b").alias("x"),
        F.expr("array_sort(array(p, a, b))[1]").alias("y"),
        F.greatest("p", "a", "b").alias("z"),
    )


def triangle_count(edges: DataFrame) -> int:
    return triangles(edges).count()


def triangle_counts_per_vertex(
    edges: DataFrame, vertices: DataFrame | None = None
) -> DataFrame:
    """(id, count) — number of triangles each vertex participates in."""
    tri = triangles(edges)
    corners = tri.select(F.explode(F.array("x", "y", "z")).alias("id"))
    per = corners.groupBy("id").agg(F.count(F.lit(1)).alias("count"))
    if vertices is not None:
        per = (
            vertices.select("id")
            .join(per, "id", "left")
            .select("id", F.coalesce("count", F.lit(0)).alias("count"))
        )
    return per
