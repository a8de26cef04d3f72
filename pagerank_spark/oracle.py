"""Pure NumPy/Python oracles for the graph algorithms.

These reimplement the *semantics* of the reference engine (verified in
SURVEY.md §0 to reproduce /root/reference/Pagerank/src/test1_pageranks.txt to
max-abs 1.1e-8) and give exact answers for connected components, label
propagation, and triangle counting. Tests compare every distributed path
against these.

Reference semantics for PageRank (src/pagerank32c.c:413-533, 808-865):
  P'[i][j]  = A[i][j]/outdeg(i); dangling rows -> uniform 1/n
  P''       = c*P' + (1-c)/n                       (Google matrix, c=0.85)
  pi_0      = (1/n, ..., 1/n)
  pi_{k+1}  = P''^T pi_k
  stop when L1(pi_{k+1} - pi_k) < eps              (eps=1e-5)
  finally L1-normalize.
"""

from __future__ import annotations

import numpy as np


def pagerank_numpy(
    edges: np.ndarray,
    n: int,
    c: float = 0.85,
    eps: float = 1e-5,
    max_iter: int = 200,
) -> tuple[np.ndarray, int, list[float]]:
    """Sparse power iteration; edges is an (m, 2) int array of 0-based (src, dst).

    Returns (ranks, iterations, per-iteration L1 residuals).
    Never materializes the dense Google matrix: dangling rows and teleport are
    the algebraic scalars the reference folds in (srcUnroll/pagerank32c.c:455-459).
    """
    src = np.asarray(edges[:, 0], dtype=np.int64)
    dst = np.asarray(edges[:, 1], dtype=np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    dangling = outdeg == 0.0
    w = np.zeros(n)
    nz = ~dangling
    w[nz] = 1.0 / outdeg[nz]

    pi = np.full(n, 1.0 / n)
    deltas: list[float] = []
    it = 0
    for it in range(1, max_iter + 1):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, pi[src] * w[src])
        dmass = pi[dangling].sum()
        new = c * (contrib + dmass / n) + (1.0 - c) / n * pi.sum()
        delta = float(np.abs(new - pi).sum())
        deltas.append(delta)
        pi = new
        if delta < eps:
            break
    pi = pi / np.abs(pi).sum()
    return pi, it, deltas


def connected_components_numpy(edges: np.ndarray, n: int) -> np.ndarray:
    """Union-find; returns comp[id] = min vertex id of the component."""
    parent = np.arange(n, dtype=np.int64)

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for u, v in np.asarray(edges, dtype=np.int64):
        ru, rv = find(int(u)), find(int(v))
        if ru != rv:
            if ru < rv:
                parent[rv] = ru
            else:
                parent[ru] = rv
    comp = np.array([find(i) for i in range(n)], dtype=np.int64)
    # roots chosen as min of the merge at each step -> root is already the
    # component min, but normalize defensively via a second pass.
    comp_min: dict[int, int] = {}
    for i, r in enumerate(comp):
        comp_min[r] = min(comp_min.get(r, i), i)
    return np.array([comp_min[r] for r in comp], dtype=np.int64)


def label_propagation_numpy(
    edges: np.ndarray, n: int, max_iter: int = 10
) -> np.ndarray:
    """Synchronous LP over the undirected graph, tie-break = min label.

    label_0 = id; each round every vertex with >=1 neighbor adopts the most
    frequent neighbor label (ties -> smallest label). Runs exactly max_iter
    rounds or until no label changes.
    """
    und: dict[int, list[int]] = {i: [] for i in range(n)}
    for u, v in np.asarray(edges, dtype=np.int64):
        u, v = int(u), int(v)
        if u == v:
            continue
        und[u].append(v)
        und[v].append(u)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        new = labels.copy()
        for i in range(n):
            if not und[i]:
                continue
            counts: dict[int, int] = {}
            for nb in und[i]:
                lbl = int(labels[nb])
                counts[lbl] = counts.get(lbl, 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[i] = best[0]
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def triangles_numpy(edges: np.ndarray, n: int) -> tuple[int, np.ndarray]:
    """Exact triangle count (global + per-vertex) on the simple undirected graph."""
    adj: list[set[int]] = [set() for _ in range(n)]
    for u, v in np.asarray(edges, dtype=np.int64):
        u, v = int(u), int(v)
        if u == v:
            continue
        adj[u].add(v)
        adj[v].add(u)
    per = np.zeros(n, dtype=np.int64)
    total = 0
    for u in range(n):
        for v in adj[u]:
            if v <= u:
                continue
            common = adj[u] & adj[v]
            for w in common:
                if w > v:
                    total += 1
                    per[u] += 1
                    per[v] += 1
                    per[w] += 1
    return total, per
