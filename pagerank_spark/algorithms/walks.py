"""Seeded random walks over the link graph — the corpus generator for
graph-embedding pipelines (DeepWalk / node2vec style, public papers): each
vertex emits ``walks_per_node`` fixed-length walks whose step sequence is
the training text for a skip-gram model.

Determinism contract: the next hop from vertex v at step t of walk (s, w)
is the out-neighbor minimizing the engine's md5 60-bit hash of
``"{seed}_{s}_{w}_{t}_{nb}"``. Each neighbor's rank is an independent
uniform hash, so the walk is an unbiased uniform random walk conditioned
on the seed — and byte-reproducible anywhere, including the DuckDB oracle
(`random_walks` in __spark_entry__.py unrolls the same argmin joins).
Walks TERMINATE at dangling vertices (standard for directed web graphs —
restarts are the caller's policy via more walks).

Scale shape per step: the frontier joins the edge cache on cur == src
(edge side cached hash(src); the frontier is repartitioned to hash(cur) as
part of its checkpoint) and the argmin aggregates by walk key — two
exchanges per step, both O(frontier x avg_outdeg) and O(frontier), never
O(E) or O(V) beyond the first step. Hub vertices fan out to outdeg
candidate rows per walk visiting them; the map-side partial min collapses
that before the wire (same salting exposure as every degree aggregation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark import util as _util


def _choice_hash(seed: int, start, walk, step: int, nb) -> F.Column:
    """md5 60-bit hash of the walk-step-neighbor key (the shared
    util.md5_hash60 convention)."""
    key = F.concat_ws(
        "_", F.lit(int(seed)), start, walk, F.lit(int(step)), nb
    )
    return _util.md5_hash60(key)


def random_walks(
    edges: DataFrame,
    walk_length: int = 4,
    walks_per_node: int = 1,
    seed: int = 42,
) -> DataFrame:
    """-> (start_id, walk, step, id): ``walks_per_node`` seeded uniform
    random walks of up to ``walk_length`` steps from EVERY vertex with an
    out-edge (step 0 is the start vertex itself; a walk reaching a dangling
    vertex stops early)."""
    spark = edges.sparkSession
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    n_verts = _util.approx_vertex_count(edges)

    def no_bcast(df: DataFrame) -> DataFrame:
        return df if n_verts <= _util.BROADCAST_SAFE_ROWS else df.hint("shuffle_hash")

    e_src = (
        edges.select("src", "dst").distinct().repartition(shuffle_p, "src").persist()
    )
    e_src.count()

    starts = e_src.select(F.col("src").alias("start_id")).distinct()
    frontier = (
        starts.join(
            F.broadcast(
                spark.range(0, walks_per_node).select(F.col("id").alias("walk"))
            )
        )
        .select("start_id", "walk", F.col("start_id").alias("cur"))
    )
    with _util.static_plan(spark):
        frontier = frontier.repartition(shuffle_p, "cur").localCheckpoint(eager=True)

    out_rows = [
        frontier.select(
            "start_id", "walk", F.lit(0).cast("int").alias("step"),
            F.col("cur").alias("id"),
        )
    ]
    for t in range(1, walk_length + 1):
        cand = e_src.join(no_bcast(frontier), e_src.src == frontier.cur).select(
            "start_id",
            "walk",
            F.struct(
                _choice_hash(seed, F.col("start_id"), F.col("walk"), t, F.col("dst")
                             ).alias("h"),
                F.col("dst").alias("nb"),
            ).alias("pick"),
        )
        nxt = (
            cand.groupBy("start_id", "walk")
            .agg(F.min("pick").alias("pick"))
            .select("start_id", "walk", F.col("pick.nb").alias("cur"))
        )
        with _util.static_plan(spark):
            frontier = nxt.repartition(shuffle_p, "cur").localCheckpoint(eager=True)
        out_rows.append(
            frontier.select(
                "start_id", "walk", F.lit(t).cast("int").alias("step"),
                F.col("cur").alias("id"),
            )
        )
        if frontier.isEmpty():
            break

    out = out_rows[0]
    for r in out_rows[1:]:
        out = out.unionByName(r)
    e_src.unpersist()
    return out
