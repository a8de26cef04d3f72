"""Reader for the reference's binary ``.matrix`` dense format + local oracle.

Layout (reference loader /root/reference/Pagerank/src/pagerank32c.c:151-217):
  int32 rows, int32 cols, then rows*cols float64 row-major — a pre-built
  transition matrix P (EP3 in SURVEY.md §3).

A dense N x N matrix is anti-scale by construction (SURVEY.md §1.2), so the
distributed engine does not densify; this module gives format parity: parse
the file, run the dense power iteration locally (NumPy), or convert the
matrix's nonzeros to a weighted edge list for the distributed engine when
the density allows.
"""

from __future__ import annotations

import struct

import numpy as np


def read_matrix_file(path: str) -> np.ndarray:
    with open(path, "rb") as f:
        rows, cols = struct.unpack("<ii", f.read(8))
        data = np.fromfile(f, dtype="<f8", count=rows * cols)
    return data.reshape(rows, cols)


def write_matrix_file(path: str, mat: np.ndarray) -> None:
    mat = np.asarray(mat, dtype="<f8")
    with open(path, "wb") as f:
        f.write(struct.pack("<ii", mat.shape[0], mat.shape[1]))
        mat.tofile(f)


def pagerank_dense(
    p_matrix: np.ndarray,
    c: float = 0.85,
    eps: float = 1e-5,
    max_iter: int = 200,
    already_google: bool = False,
) -> tuple[np.ndarray, int]:
    """Dense power iteration (reference getPagerank_dense semantics,
    srcSparse/pagerank32c.c:885-904). If already_google, the file holds P''
    and iteration is a plain mat-vec; otherwise P' is formed by row-
    normalizing + dangling rows -> 1/n, then P'' = c P' + (1-c)/n."""
    n = p_matrix.shape[0]
    if already_google:
        pp = p_matrix
    else:
        rowsum = p_matrix.sum(axis=1)
        p1 = np.where(
            rowsum[:, None] > 0, p_matrix / np.where(rowsum[:, None] > 0, rowsum[:, None], 1.0),
            1.0 / n,
        )
        pp = c * p1 + (1.0 - c) / n
    pi = np.full(n, 1.0 / n)
    it = 0
    for it in range(1, max_iter + 1):
        new = pp.T @ pi
        delta = float(np.abs(new - pi).sum())
        pi = new
        if delta < eps:
            break
    return pi / np.abs(pi).sum(), it


def matrix_to_edges(p_matrix: np.ndarray) -> np.ndarray:
    """Nonzeros of a 0/1 adjacency (or any matrix) -> (m, 2) edge array, for
    feeding the distributed engine when the dense file is really sparse."""
    src, dst = np.nonzero(p_matrix)
    return np.stack([src, dst], axis=1).astype(np.int64)
