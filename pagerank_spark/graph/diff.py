"""Crawl-to-crawl graph deltas: what changed between two link-graph
snapshots.

A production crawl re-ranks incrementally — the new snapshot's PageRank
warm-starts from the previous ranks (``PageRank(initial_ranks=...)``), and
the delta tables below are the audit surface for that loop: which edges
appeared/disappeared, and which vertices' degrees moved (the hubs whose
rank will actually shift). The reference engine ranks one static `.graph`
file (/root/reference/Pagerank/src/pagerank32c.c); snapshot diffing is the
piece a recrawl pipeline adds around it.

Both operators are single-shuffle-per-side plans: one full-outer hash join
on the edge key / vertex key with flag columns — no window, no driver
state, linear in the snapshot sizes at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def edge_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Edges added or removed between two snapshots: (src, dst, change)
    with change in {'added', 'removed'}. Parallel edges are collapsed
    (set semantics — presence is what recrawl cares about); unchanged
    edges are not emitted.
    """
    o = old.select("src", "dst").distinct().withColumn("in_old", F.lit(True))
    n = new.select("src", "dst").distinct().withColumn("in_new", F.lit(True))
    j = o.join(n, ["src", "dst"], "full_outer")
    return j.filter(F.col("in_old").isNull() | F.col("in_new").isNull()).select(
        "src",
        "dst",
        F.when(F.col("in_old").isNull(), "added").otherwise("removed").alias("change"),
    )


def degree_delta(old: DataFrame, new: DataFrame) -> DataFrame:
    """Per-vertex out/in-degree movement between two snapshots (distinct
    edges): (id, outdeg_old, outdeg_new, indeg_old, indeg_new, d_outdeg,
    d_indeg), emitting only vertices whose degree changed. Missing-side
    degrees are 0 (vertex absent from that snapshot).

    Plan: four partial-aggregated degree counts (each one shuffle on its
    key) joined full-outer on id — the degree tables are O(V), already the
    small side of the pipeline at web scale.
    """

    def degs(e: DataFrame, tag: str) -> DataFrame:
        d = e.select("src", "dst").distinct()
        od = d.groupBy(F.col("src").alias("id")).agg(
            F.count(F.lit(1)).alias(f"outdeg_{tag}")
        )
        idg = d.groupBy(F.col("dst").alias("id")).agg(
            F.count(F.lit(1)).alias(f"indeg_{tag}")
        )
        return od.join(idg, "id", "full_outer").select(
            "id",
            F.coalesce(f"outdeg_{tag}", F.lit(0)).alias(f"outdeg_{tag}"),
            F.coalesce(f"indeg_{tag}", F.lit(0)).alias(f"indeg_{tag}"),
        )

    j = degs(old, "old").join(degs(new, "new"), "id", "full_outer").select(
        "id",
        *[
            F.coalesce(c, F.lit(0)).alias(c)
            for c in ("outdeg_old", "outdeg_new", "indeg_old", "indeg_new")
        ],
    )
    return j.select(
        "id",
        "outdeg_old",
        "outdeg_new",
        "indeg_old",
        "indeg_new",
        (F.col("outdeg_new") - F.col("outdeg_old")).alias("d_outdeg"),
        (F.col("indeg_new") - F.col("indeg_old")).alias("d_indeg"),
    ).filter((F.col("d_outdeg") != 0) | (F.col("d_indeg") != 0))
