"""Physical-plan audits: the properties that matter at 100 TB must be
visible in `explain`, not assumed — filters reach the parquet scan
(PushedFilters), projections prune the read schema (ReadSchema), small
dimensions broadcast, and the O(V) sides of big-graph joins do NOT.

These guard against silent plan regressions: an operator can stay
correct while its plan quietly stops pushing a filter or starts
broadcasting an O(V) table.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _plan(df) -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_parquet_filter_pushdown_and_pruning(spark):
    """A filtered 2-column projection must push the filter into the scan
    and read ONLY those columns."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    q = docs.filter(F.col("lang") == "en").select("doc_id", "lang")
    plan = _plan(q)
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan
    # ReadSchema lists only the projected columns, never text/html payloads
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema


def test_small_dim_join_broadcasts(spark):
    """orders ⋈ customer with an aggregated left side: the small dimension
    must arrive via BroadcastHashJoin (no full shuffle of customer)."""
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    q = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("total"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
    )
    assert "BroadcastHashJoin" in _plan(q)


def test_pagerank_dataframe_no_broadcast_above_gate(spark, monkeypatch):
    """Above BROADCASTABLE_N the dataframe-mode contrib join must not plan a
    broadcast of the O(n) side (the driver-OOM class): the iteration plan
    contains ShuffledHashJoin and no BroadcastHashJoin."""
    from pagerank_spark.algorithms.pagerank import PageRank
    from pagerank_spark.sources.synthetic import synthetic_edges

    monkeypatch.setattr(PageRank, "BROADCASTABLE_N", 10)
    n = 200
    edges = synthetic_edges(spark, n, 2000, seed=1, num_partitions=2)
    # reproduce the setup join the iteration reuses: degrees ⋈ edges
    degrees = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    ew = edges.join(degrees.hint("shuffle_hash"), "src")
    plan = _plan(ew)
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_textstats_stay_jvm_side(spark):
    """The text-quality features are pure Column expressions — the plan is a
    single Project over the scan (codegen'd scan; the higher-order array
    lambdas are JVM-interpreted) with NO Python evaluation node anywhere."""
    from pagerank_spark.functions.textstats import quality_features

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(quality_features(docs))
    assert "codegen id" in plan  # scan + ColumnarToRow are codegen'd
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan
    assert "Exchange" not in plan  # map-only: no shuffle for per-doc stats


def test_widen_partitions_spreads_narrow_input(spark):
    """Compute-heavy per-row stages must not inherit a single file split:
    widen_partitions spreads a narrow input to the session parallelism and
    leaves already-wide inputs untouched (no extra shuffle)."""
    from pagerank_spark.util import widen_partitions

    target = spark.sparkContext.defaultParallelism
    narrow = spark.range(1000).coalesce(1)
    assert narrow.rdd.getNumPartitions() == 1
    assert widen_partitions(narrow).rdd.getNumPartitions() == target
    wide = spark.range(1000).repartition(target + 4)
    assert widen_partitions(wide) is wide


def test_signature_pass_parallel_on_single_file(spark):
    """The MinHash signature pass over a one-split corpus plans a round-robin
    repartition ahead of the Arrow UDF — the measured 17x single-task pin."""
    from pagerank_spark.pipeline.dedup import minhash_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert docs.rdd.getNumPartitions() == 1  # the hazard this guards against
    sig = minhash_signatures(docs)
    assert sig.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_cached_repartition_feeds_exchange_free_aggregation(spark):
    """The label-propagation round contract: an edge table cached as
    repartition("a") keeps its outputPartitioning through a broadcast join,
    so both round aggregates (groupBy(a, label) then groupBy(a)) plan with
    NO new Exchange — rounds move zero O(E) bytes on small graphs."""
    e = spark.range(2000).select(
        (F.col("id") % 100).alias("a"), (F.col("id") % 37).alias("b")
    )
    part = e.repartition("a").persist()
    part.count()
    labels = spark.range(37).select(
        F.col("id"), (F.col("id") * 10).alias("label")
    )
    agg = (
        part.join(F.broadcast(labels), part.b == labels.id)
        .groupBy("a", "label")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("a")
        .agg(F.expr("max_by(label, struct(cnt, -label))").alias("new_label"))
    )
    plan = _plan(agg)
    # operators ABOVE the cached relation print before it in the formatted
    # tree; no hash-partitioning Exchange may appear there
    head = plan.split("InMemoryRelation")[0]
    assert "Exchange hashpartitioning" not in head
    part.unpersist()
