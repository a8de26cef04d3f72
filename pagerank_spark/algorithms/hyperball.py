"""HyperBall: approximate neighborhood function, effective diameter, and
harmonic centrality via per-vertex HyperLogLog counters (Boldi & Vigna,
"In-Core Computation of Geometric Centralities with HyperBall", 2013; the
HyperANF recurrence from Boldi, Rosa & Vigna, WWW 2011).

The reference engine (/root/reference/Pagerank/src/pagerank32c.c) computes
only PageRank; distance-based statistics (effective diameter, harmonic /
closeness centrality) are the other half of the classic web-graph
measurement suite and are exactly what HyperBall was invented for at
Common-Crawl scale — exact per-pair BFS is O(V·E) and dead on arrival at
10^12 documents, while the HLL recurrence is one fixed-width register
merge per edge per hop.

Semantics: each vertex v carries an HLL counter approximating
|B(v, t)| = |{w : dist(v, w) <= t}| (out-balls; ``reverse=True`` gives
in-balls, i.e. "who can reach v", the direction centralities need). The
recurrence is

    B(v, t+1) = B(v, t)  union  U_{(v,w) in E} B(w, t)

which on HLL registers is an elementwise integer ``max`` — associative and
idempotent, so Spark's partial (map-side) aggregation applies and re-running
a converged round is a no-op (what makes the unrolled SQL oracle in
__spark_entry__.py exact).

Representation: m = 64 registers (b = 6, rsd = 1.04/sqrt(64) ~ 13%) stored
as 64 small int COLUMNS (r0..r63), not an array — every update compiles to
whole-stage-codegen ``max``/``greatest`` over flat ints (no higher-order
array functions, no UDF anywhere). The hash is the engine's md5 convention
(md5 hex prefix -> 60-bit int), bit-for-bit reproducible in DuckDB
(``('0x' || substr(md5(x), 1, 15))::UBIGINT``), so the oracle checks the
registers themselves: register index j = h mod 64, and rho = 1 + leading
zeros of the remaining 54 bits (1 <= rho <= 55).

Exactness contract for the oracle: per-vertex ``s_int`` (the integer-scaled
denominator sum_j 2^(55 - r_j), <= 2^61 so it fits a BIGINT exactly) and
``zero_regs`` are pure integers — no float leaves the engine on the checked
path; the float estimate is a closed-form function of (s_int, zero_regs)
unit-tested against a pure-Python HLL simulation.

Physical plan per hop (audited in tests/test_plans.py): the edge cache
carries hash(dst), the state checkpoint keeps hash(id) via
``util.static_plan``, so the ball-pull join is exchange-free; the ONE
shuffle is the groupBy(src) register merge (64-wide max, partial agg
collapses O(E) to O(V) before the wire); the merge-with-own-ball left join
consumes hash(id) x hash(src) exchange-free. O(V) join sides are
size-gated against auto-broadcast like every other graph loop.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pagerank_spark import util as _util

M = 64  # registers per counter (b = 6)
_B = 6  # index bits
_HASH_BITS = 60  # md5 hex prefix length 15 -> 60-bit hash
_VALUE_BITS = _HASH_BITS - _B  # 54 bits feed rho; 1 <= rho <= 55
_RHO_MAX = _VALUE_BITS + 1
ALPHA_M = 0.7213 / (1.0 + 1.079 / M)  # standard HLL bias constant, m >= 64
# raw estimate = ALPHA_M * m^2 / sum_j 2^(-r_j)
#              = (ALPHA_M * m^2 * 2^55) / s_int      with s_int a BIGINT
_EST_NUM = ALPHA_M * M * M * float(1 << _RHO_MAX)


def _hash60(col):
    """The engine's md5 60-bit hash (shared definition: util.md5_hash60)."""
    return _util.md5_hash60(col)


def _reg_cols():
    return [f"r{j}" for j in range(M)]


def _init_registers(vertices: DataFrame) -> DataFrame:
    """B(v, 0) = {v}: one register set per vertex. j = h mod 64; rho = 1 +
    leading zeros of (h >> 6) within 54 bits = 55 - bitlength(h >> 6)."""
    h = _hash60(F.col("id"))
    j = h % M
    rem = F.shiftright(h, _B)
    rho = F.when(rem == 0, F.lit(_RHO_MAX)).otherwise(
        F.lit(_RHO_MAX) - F.length(F.bin(rem))
    )
    return vertices.select(
        "id",
        *[
            F.when(j == k, rho).otherwise(F.lit(0)).cast("int").alias(f"r{k}")
            for k in range(M)
        ],
    )


def estimate_expr(s_int, zero_regs):
    """Corrected HLL cardinality estimate as a Column expression.

    raw = ALPHA_M * m^2 * 2^55 / s_int; LinearCounting below 2.5m with
    empty registers present (the standard small-range correction). Pure
    function of the two oracle-checked integers."""
    raw = F.lit(_EST_NUM) / s_int.cast("double")
    return F.when(
        (raw <= F.lit(2.5 * M)) & (zero_regs > 0),
        F.lit(float(M)) * F.log(F.lit(float(M)) / zero_regs.cast("double")),
    ).otherwise(raw)


def estimate_py(s_int: int, zero_regs: int) -> float:
    """Python twin of estimate_expr (unit-tested equal)."""
    raw = _EST_NUM / float(s_int)
    if raw <= 2.5 * M and zero_regs > 0:
        return float(M) * math.log(float(M) / zero_regs)
    return raw


def _summary_cols():
    """(s_int, zero_regs) from the 64 register columns — exact integers."""
    # SQL form: the Python F.shiftleft only takes a literal bit count
    terms = [F.expr(f"shiftleft(1L, {_RHO_MAX} - r{j})") for j in range(M)]
    s_int = terms[0]
    for t in terms[1:]:
        s_int = s_int + t
    zeros = [F.when(F.col(f"r{j}") == 0, 1).otherwise(0) for j in range(M)]
    z = zeros[0]
    for t in zeros[1:]:
        z = z + t
    return s_int.alias("s_int"), z.cast("int").alias("zero_regs")


def _hop(e_dst: DataFrame, state: DataFrame, no_bcast) -> DataFrame:
    """One HyperBall hop as a DataFrame plan: pull out-neighbor counters
    (join on hash(dst) x the checkpoint's hash(id), exchange-free), merge
    registers per src (the ONE shuffle; 64-wide max with map-side partials),
    then fold into the own ball (left join hash(id) x hash(src),
    exchange-free). Audited by tests/test_plans.py::test_hyperball_hop_single_exchange."""
    regs = _reg_cols()
    pulled = e_dst.join(no_bcast(state), e_dst.dst == state.id).select("src", *regs)
    merged = pulled.groupBy("src").agg(*[F.max(r).alias(r) for r in regs])
    return state.join(no_bcast(merged), state.id == merged.src, "left").select(
        state.id,
        *[
            F.greatest(state[r], F.coalesce(merged[r], F.lit(0)))
            .cast("int")
            .alias(r)
            for r in regs
        ],
    )


@dataclass
class HyperBallResult:
    balls: DataFrame  # (id, t, s_int, zero_regs, ball_est) for t = 0..T
    nf: list[float]  # neighborhood function NF(t) = sum_v est|B(v,t)|, t=0..T
    effective_diameter: float  # smallest interpolated t with NF >= 0.9*NF(T)
    iterations: int  # T actually run (may stop early on register fixpoint)
    iter_seconds: list[float] = field(default_factory=list)


def hyperball(
    edges: DataFrame,
    t_max: int = 16,
    reverse: bool = False,
    alpha: float = 0.9,
) -> HyperBallResult:
    """Run the HyperBall recurrence for up to ``t_max`` hops (stopping early
    at the register fixpoint — the set checksum the other graph loops use).

    ``edges``: (src, dst) long, directed. ``reverse=True`` computes in-balls
    (counters of {u : dist(u, v) <= t}), the direction harmonic centrality
    integrates over. Vertices are the distinct edge endpoints.
    """
    import time

    spark = edges.sparkSession
    shuffle_p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if reverse:
        edges = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n_verts = _util.approx_vertex_count(edges)

    def no_bcast(df: DataFrame) -> DataFrame:
        # above the gate: MERGE, not shuffle_hash — the register state is 65
        # fixed-width fields (~520 B as UnsafeRow), so per-partition hash
        # relations of it exhaust execution memory (reproduced at 4M vertices
        # / 8 GB: "Can't acquire ... to build hash relation"); sort-merge
        # spills. Both sides are already hash-partitioned on the join key,
        # so the hint adds sorts, never exchanges (plan-audited).
        return df if n_verts <= _util.BROADCAST_SAFE_ROWS else df.hint("merge")

    regs = _reg_cols()
    # ball-pull joins on dst == state.id every hop: cache that layout once
    e_dst = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .repartition(shuffle_p, "dst")
        .persist()
    )
    e_dst.count()
    vertices = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    with _util.static_plan(spark):
        state = (
            _init_registers(vertices)
            .repartition(shuffle_p, "id")
            .localCheckpoint(eager=True)
        )

    def snapshot(st: DataFrame, t: int) -> DataFrame:
        # materialize the 4-column summary per hop (id, t, s_int, zero_regs
        # + est) instead of pinning the 65-column register checkpoint: only
        # the CURRENT register state stays live, so memory is O(V) summaries
        # x hops + 2 register tables, not hops x register tables
        s_int, zero_regs = _summary_cols()
        frame = st.select(
            "id", F.lit(t).cast("int").alias("t"), s_int, zero_regs
        ).withColumn("ball_est", estimate_expr(F.col("s_int"), F.col("zero_regs")))
        return frame.localCheckpoint(eager=True)

    def summarize(snap: DataFrame) -> tuple[float, tuple[int, int]]:
        # ONE O(V) scan of the 40-byte summary rows yields both the NF sum
        # and the convergence witness. s_int STRICTLY DECREASES whenever any
        # register rises (a raised register swaps a 2^(55-r) term for a
        # smaller one), so (id, s_int) changes iff the register vector
        # changed — the xor checksum over it is exactly the CC/LP
        # convergence contract without rescanning the 65-column state.
        row = snap.agg(
            F.sum("ball_est").alias("nf"),
            F.count(F.lit(1)).alias("c"),
            F.coalesce(F.expr("bit_xor(xxhash64(id, s_int))"), F.lit(0)).alias("h"),
        ).first()
        return float(row["nf"] or 0.0), (int(row["c"]), int(row["h"]))

    snapshots = [snapshot(state, 0)]
    nf0, checksum = summarize(snapshots[0])
    nf = [nf0]
    iter_secs: list[float] = []

    t = 0
    for t in range(1, t_max + 1):
        t0 = time.time()
        with _util.static_plan(spark):
            new_state = _hop(e_dst, state, no_bcast).localCheckpoint(eager=True)
        state = new_state
        snapshots.append(snapshot(state, t))
        nf_t, new_checksum = summarize(snapshots[-1])
        nf.append(nf_t)
        iter_secs.append(time.time() - t0)
        if new_checksum == checksum:
            # fixpoint: last hop added nothing; drop the duplicate snapshot
            # AND its timing so len(iter_seconds) == iterations
            snapshots.pop()
            nf.pop()
            iter_secs.pop()
            t -= 1
            break
        checksum = new_checksum

    balls = snapshots[0]
    for s in snapshots[1:]:
        balls = balls.unionByName(s)
    e_dst.unpersist()
    return HyperBallResult(
        balls=balls,
        nf=nf,
        effective_diameter=_effective_diameter(nf, alpha),
        iterations=t,
        iter_seconds=iter_secs,
    )


def _effective_diameter(nf: list[float], alpha: float) -> float:
    """Smallest (linearly interpolated) t with NF(t) >= alpha * NF(T) —
    the HyperANF convention."""
    if not nf:
        return 0.0
    target = alpha * nf[-1]
    for t, v in enumerate(nf):
        if v >= target:
            if t == 0 or nf[t] == nf[t - 1]:
                return float(t)
            return (t - 1) + (target - nf[t - 1]) / (nf[t] - nf[t - 1])
    return float(len(nf) - 1)


def neighborhood_function(
    edges: DataFrame, t_max: int = 16
) -> tuple[list[float], float]:
    """(NF(0..T), effective diameter at 0.9) — the whole-graph distance
    summary. NF(t) = sum over vertices of the estimated |B(v, t)|."""
    res = hyperball(edges, t_max=t_max)
    return res.nf, res.effective_diameter


def harmonic_centrality(edges: DataFrame, t_max: int = 16) -> DataFrame:
    """Approximate harmonic centrality H(v) = sum_{u != v} 1/dist(u, v)
    (Boldi & Vigna 2013): run HyperBall on the REVERSED graph (in-balls) and
    integrate the ball growth, H(v) ~= sum_{t>=1} (|B(v,t)| - |B(v,t-1)|)/t.

    Returns (id, harmonic double). Estimates inherit the HLL rsd (~13% at
    m=64); ball growth is clamped at 0 (counters are monotone but estimates
    need not be). The integration is a per-vertex window over <= t_max+1
    rows riding the balls frame's hash(id) layout.
    """
    res = hyperball(edges, t_max=t_max, reverse=True)
    w = Window.partitionBy("id").orderBy("t")
    growth = res.balls.withColumn(
        "prev_est", F.lag("ball_est").over(w)
    ).filter(F.col("t") >= 1)
    return (
        growth.select(
            "id",
            (
                F.greatest(F.col("ball_est") - F.col("prev_est"), F.lit(0.0))
                / F.col("t")
            ).alias("g"),
        )
        .groupBy("id")
        .agg(F.sum("g").alias("harmonic"))
    )
