from __future__ import annotations

import numpy as np
import pytest

from pagerank_spark.algorithms.components import connected_components
from pagerank_spark.algorithms.labelprop import label_propagation
from pagerank_spark.algorithms.triangles import (
    triangle_count,
    triangle_counts_per_vertex,
)
from pagerank_spark.oracle import (
    connected_components_numpy,
    label_propagation_numpy,
    triangles_numpy,
)
from pagerank_spark.sources.graphfile import edges_from_numpy, vertices_df
from tests.conftest import micro_graphs


def _comp_dict(df):
    return {r["id"]: r["component"] for r in df.collect()}


@pytest.mark.parametrize("name", sorted(micro_graphs()))
def test_connected_components_exact(spark, name):
    arr, n = micro_graphs()[name]
    edges = edges_from_numpy(spark, arr)
    verts = vertices_df(spark, n)
    got = _comp_dict(connected_components(edges, verts))
    exp = connected_components_numpy(arr, n)
    assert got == {i: int(exp[i]) for i in range(n)}


def test_cc_two_islands(spark):
    arr, n = micro_graphs()["two_islands"]
    got = _comp_dict(connected_components(edges_from_numpy(spark, arr), vertices_df(spark, n)))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_cc_golden_graph(spark, golden):
    arr, n, _ = golden
    got = _comp_dict(
        connected_components(edges_from_numpy(spark, arr), vertices_df(spark, n))
    )
    exp = connected_components_numpy(arr, n)
    assert got == {i: int(exp[i]) for i in range(n)}


@pytest.mark.parametrize("name", ["two_islands", "chain_8", "star_hub", "complete_6"])
def test_label_propagation_exact(spark, name):
    arr, n = micro_graphs()[name]
    got = {
        r["id"]: r["label"]
        for r in label_propagation(
            edges_from_numpy(spark, arr), vertices_df(spark, n), max_iter=5
        ).collect()
    }
    exp = label_propagation_numpy(arr, n, max_iter=5)
    assert got == {i: int(exp[i]) for i in range(n)}


@pytest.mark.parametrize("name", sorted(micro_graphs()))
def test_triangles_exact(spark, name):
    arr, n = micro_graphs()[name]
    edges = edges_from_numpy(spark, arr)
    exp_total, exp_per = triangles_numpy(arr, n)
    assert triangle_count(edges) == exp_total
    got = {
        r["id"]: r["count"]
        for r in triangle_counts_per_vertex(edges, vertices_df(spark, n)).collect()
    }
    assert got == {i: int(exp_per[i]) for i in range(n)}


def test_triangles_complete6(spark):
    arr, n = micro_graphs()["complete_6"]
    assert triangle_count(edges_from_numpy(spark, arr)) == 20  # C(6,3)


def _spy_hints(monkeypatch):
    """Record DataFrame.hint calls on the real code path (Spark 4 classic
    subclass overrides hint(), so patch there)."""
    from pyspark.sql.classic.dataframe import DataFrame as SparkDF

    calls = []
    orig = SparkDF.hint

    def spy(self, name, *params):
        calls.append(name)
        return orig(self, name, *params)

    monkeypatch.setattr(SparkDF, "hint", spy)
    return calls


@pytest.mark.parametrize(
    "algo",
    ["cc", "lp", "tri"],
)
def test_vertex_gated_shuffle_hints(spark, monkeypatch, algo):
    """CC/LP/triangles gate their shuffle_hash hints on the broadcast-side
    (vertex) count via util.BROADCAST_SAFE_ROWS: hints fire above the gate,
    never below it (small graphs keep Catalyst's broadcast plans)."""
    from pagerank_spark import util

    arr, n = micro_graphs()["two_islands"]
    edges = edges_from_numpy(spark, arr)
    verts = vertices_df(spark, n)

    def run():
        if algo == "cc":
            connected_components(edges, verts).collect()
        elif algo == "lp":
            label_propagation(edges, verts, max_iter=2).collect()
        else:
            triangle_count(edges)

    calls = _spy_hints(monkeypatch)
    monkeypatch.setattr(util, "BROADCAST_SAFE_ROWS", 2)  # n=6 > 2 -> big
    run()
    assert calls.count("shuffle_hash") >= 1

    calls.clear()
    monkeypatch.setattr(util, "BROADCAST_SAFE_ROWS", 2_000_000)
    run()
    assert calls.count("shuffle_hash") == 0
