from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from pagerank_spark.algorithms.pagerank import PageRank
from pagerank_spark.graph.build import build_link_graph
from pagerank_spark.graph.degrees import dangling_nodes, out_degrees
from pagerank_spark.graph.ids import assign_dense_ids
from pagerank_spark.graph.skew import salted_sum
from pagerank_spark.oracle import pagerank_numpy
from pagerank_spark.sources.graphfile import edges_from_numpy, vertices_df
from pagerank_spark.sources.pages import generate_pages


def test_dense_ids_bijective_and_sorted(spark):
    pages = generate_pages(spark, 500, seed=42, num_partitions=8)
    ids = assign_dense_ids(pages, "url", num_partitions=8).collect()
    assert len(ids) == 500
    got = sorted((r["url"], r["id"]) for r in ids)
    # id == global sort rank of url
    assert [i for _, i in got] == list(range(500))
    # matches the window-oracle path
    oracle = {
        r["url"]: r["id"]
        for r in assign_dense_ids(pages, "url", method="window").collect()
    }
    assert dict(got) == oracle


def test_build_link_graph_end_to_end(spark):
    n_pages = 400
    pages = generate_pages(spark, n_pages, seed=42, num_partitions=8)
    g = build_link_graph(pages)
    assert g.n == n_pages
    edges = g.edges.collect()
    assert len(edges) > 0
    arr = np.array([(r["src"], r["dst"]) for r in edges], dtype=np.int64)
    assert arr.min() >= 0 and arr.max() < n_pages
    # deduplicated
    assert len({tuple(e) for e in arr}) == len(arr)
    # external link targets were dropped: every dst is a page id
    # end-to-end: pagerank over the built graph matches the numpy oracle
    res = PageRank(mode="dataframe").run(g.edges, g.n)
    oracle, _, _ = pagerank_numpy(arr, n_pages)
    got = np.zeros(n_pages)
    for r in res.ranks.collect():
        got[r["id"]] = r["rank"]
    np.testing.assert_allclose(got, oracle, atol=1e-9)


def test_degrees_and_dangling(spark):
    arr = np.array([(0, 1), (0, 2), (1, 2)], dtype=np.int64)
    edges = edges_from_numpy(spark, arr)
    verts = vertices_df(spark, 4)
    deg = {r["id"]: r["outdeg"] for r in out_degrees(edges).collect()}
    assert deg == {0: 2, 1: 1}
    dang = sorted(r["id"] for r in dangling_nodes(verts, edges).collect())
    assert dang == [2, 3]


def test_salted_sum_equals_plain(spark):
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 10, size=(5000, 2))
    df = spark.createDataFrame(
        [(int(a), int(b), float(a + b)) for a, b in arr], "dst long, src long, v double"
    )
    plain = {
        r["dst"]: r["s"]
        for r in df.groupBy("dst").agg(F.sum("v").alias("s")).collect()
    }
    salted = {
        r["dst"]: r["s"]
        for r in salted_sum(df, "dst", F.col("v"), 8, "src", out="s").collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert abs(plain[k] - salted[k]) < 1e-9


def test_pagerank_salted_matches(spark, golden):
    arr, n, expected = golden
    edges = edges_from_numpy(spark, arr)
    res = PageRank(mode="dataframe", salt_partitions=8).run(edges, n)
    got = np.zeros(n)
    for r in res.ranks.collect():
        got[r["id"]] = r["rank"]
    np.testing.assert_allclose(got, expected, atol=1e-6)


def test_latest_snapshot_keeps_newest_capture(spark):
    from datetime import datetime

    from pagerank_spark.graph.build import latest_snapshot

    rows = [
        ("u1", datetime(2024, 1, 1), b"old", "old text", "en"),
        ("u1", datetime(2024, 3, 1), b"new", "new text", "en"),
        ("u2", datetime(2024, 2, 1), b"only", "only text", "de"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    got = {r["url"]: (bytes(r["html"]), r["text"]) for r in latest_snapshot(pages).collect()}
    assert got == {"u1": (b"new", "new text"), "u2": (b"only", "only text")}
    # schema preserved, one row per url
    assert latest_snapshot(pages).columns == pages.columns
    assert latest_snapshot(pages).count() == 2


def test_latest_snapshot_single_exchange(spark):
    from pagerank_spark.graph.build import latest_snapshot
    from pagerank_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 100, seed=42, num_partitions=4)
    df = latest_snapshot(pages)
    plan = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    import re

    assert len(re.findall(r"\(\d+\) Exchange\b", plan)) == 1
    assert "Window" not in plan  # aggregate form, not window+filter


def test_edge_diff_and_degree_delta(spark):
    """Hand-computed recrawl delta: added/removed edge sets and per-vertex
    degree movement, with parallel edges collapsed and unchanged vertices
    suppressed."""
    from pagerank_spark.graph.diff import degree_delta, edge_diff

    old = spark.createDataFrame(
        [(0, 1), (0, 1), (1, 2), (2, 3), (3, 0)], "src long, dst long"
    )
    new = spark.createDataFrame(
        [(0, 1), (1, 2), (1, 2), (2, 4), (4, 0), (5, 1)], "src long, dst long"
    )
    diff = {(r["src"], r["dst"]): r["change"] for r in edge_diff(old, new).collect()}
    assert diff == {
        (2, 3): "removed",
        (3, 0): "removed",
        (2, 4): "added",
        (4, 0): "added",
        (5, 1): "added",
    }

    dd = {r["id"]: (r["d_outdeg"], r["d_indeg"]) for r in degree_delta(old, new).collect()}
    # 0: out 1->1, in 1->1 (3->0 removed, 4->0 added) => unchanged, suppressed
    # 1: in 1->2 (5->1 added); 2: out 1->1 in unchanged? 1->2 stays, so in 1->1; out (2,3)->(2,4) 1->1 => suppressed
    assert dd == {
        1: (0, 1),
        3: (-1, -1),
        4: (1, 1),
        5: (1, 0),
    }
    # symmetric sanity: diffing a snapshot against itself is empty
    assert edge_diff(new, new).isEmpty()
    assert degree_delta(new, new).isEmpty()


def test_partition_skew_report(spark):
    """A single-hub edge table reports skew ~= n_buckets (everything lands
    in one bucket); a spread table reports low skew; totals always add up."""
    from pagerank_spark.graph.skew import partition_skew_report

    hub = spark.createDataFrame([(i, 7) for i in range(1000)], "src long, dst long")
    r = partition_skew_report(hub, key="dst", n_buckets=16).first()
    assert r["n_buckets_used"] == 1 and r["max_rows"] == 1000
    assert r["total_rows"] == 1000 and r["skew_e2"] == 1600

    spread = spark.createDataFrame([(i, i) for i in range(4000)], "src long, dst long")
    r2 = partition_skew_report(spread, key="dst", n_buckets=16).first()
    assert r2["total_rows"] == 4000 and r2["n_buckets_used"] == 16
    assert r2["skew_e2"] < 150  # md5-uniform spread stays near 1.0
