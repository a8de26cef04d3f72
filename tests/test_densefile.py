from __future__ import annotations

import numpy as np

from pagerank_spark.oracle import pagerank_numpy
from pagerank_spark.sources.densefile import (
    matrix_to_edges,
    pagerank_dense,
    read_matrix_file,
    write_matrix_file,
)
from tests.conftest import micro_graphs


def test_matrix_roundtrip(tmp_path):
    mat = np.arange(12, dtype=np.float64).reshape(3, 4)
    p = str(tmp_path / "t.matrix")
    write_matrix_file(p, mat)
    np.testing.assert_array_equal(read_matrix_file(p), mat)


def test_dense_pagerank_matches_sparse_oracle(tmp_path):
    """EP3 parity: adjacency written as .matrix -> dense power iteration
    matches the sparse-edge oracle on the same graph."""
    arr, n = micro_graphs()["two_islands"]
    adj = np.zeros((n, n))
    adj[arr[:, 0], arr[:, 1]] = 1.0
    p = str(tmp_path / "g.matrix")
    write_matrix_file(p, adj)
    mat = read_matrix_file(p)
    dense_pi, dense_it = pagerank_dense(mat)
    sparse_pi, sparse_it, _ = pagerank_numpy(arr, n)
    assert dense_it == sparse_it
    np.testing.assert_allclose(dense_pi, sparse_pi, atol=1e-12)
    # and the matrix round-trips to the same edge list
    np.testing.assert_array_equal(
        sorted(map(tuple, matrix_to_edges(mat))), sorted(map(tuple, arr))
    )


def test_dense_golden_graph(golden, tmp_path):
    arr, n, expected = golden
    adj = np.zeros((n, n))
    adj[arr[:, 0], arr[:, 1]] = 1.0
    pi, it = pagerank_dense(adj)
    assert it == 7
    np.testing.assert_allclose(pi, expected, atol=1e-6)
