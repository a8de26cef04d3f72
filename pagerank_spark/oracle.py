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


def hits_numpy(
    edges: np.ndarray, n: int, max_iter: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """HITS with per-half-step L1 normalization (linkanalysis.hits
    semantics): init hub = 1; auth' = normalize(A^T hub); hub' =
    normalize(A auth'). Returns (hub, auth)."""
    A = np.zeros((n, n))
    for u, v in np.asarray(edges, dtype=np.int64):
        A[int(u), int(v)] = 1.0
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(max_iter):
        a = A.T @ h
        s = a.sum()
        if s > 0:
            a = a / s
        h = A @ a
        s = h.sum()
        if s > 0:
            h = h / s
    return h, a


def salsa_numpy(
    edges: np.ndarray, n: int, max_iter: int = 5
) -> tuple[np.ndarray, np.ndarray]:
    """SALSA with per-half-step L1 normalization (linkanalysis.salsa
    semantics): auth' = normalize(sum_{u->v} hub(u)/outdeg(u)),
    hub' = normalize(sum_{u->v} auth'(v)/indeg(v)), init hub = 1.
    Returns (hub, auth)."""
    arr = np.asarray(edges, dtype=np.int64)
    outdeg = np.zeros(n)
    indeg = np.zeros(n)
    for u, v in arr:
        outdeg[int(u)] += 1
        indeg[int(v)] += 1
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(max_iter):
        a = np.zeros(n)
        for u, v in arr:
            a[int(v)] += h[int(u)] / outdeg[int(u)]
        s = a.sum()
        if s > 0:
            a = a / s
        h = np.zeros(n)
        for u, v in arr:
            h[int(u)] += a[int(v)] / indeg[int(v)]
        s = h.sum()
        if s > 0:
            h = h / s
    return h, a


def personalized_pagerank_numpy(
    edges: np.ndarray,
    n: int,
    seeds: list[int],
    c: float = 0.85,
    max_iter: int = 20,
) -> np.ndarray:
    """Fixed-iteration topic-sensitive PageRank
    (linkanalysis.personalized_pagerank semantics): r0 = v,
    r' = c*(P^T r + dangling_mass*v) + (1-c)*total*v, final L1 normalize."""
    arr = np.asarray(edges, dtype=np.int64)
    v = np.zeros(n)
    v[list(seeds)] = 1.0 / len(seeds)
    outdeg = np.zeros(n, dtype=np.int64)
    for u, _ in arr:
        outdeg[int(u)] += 1
    r = v.copy()
    for _ in range(max_iter):
        dm = r[outdeg == 0].sum()
        total = r.sum()
        nxt = np.zeros(n)
        for u, w in arr:
            nxt[int(w)] += r[int(u)] / outdeg[int(u)]
        r = c * (nxt + dm * v) + (1.0 - c) * total * v
    s = np.abs(r).sum()
    return r / s if s else r


def spam_mass_numpy(
    edges: np.ndarray,
    n: int,
    seeds: list[int],
    c: float = 0.85,
    max_iter: int = 20,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Fixed-iteration spam mass (linkanalysis.spam_mass semantics):
    rel_mass = (pr - (|S|/n) * tr) / pr over the L1-normalized uniform and
    seed-personalized ranks. Returns (pr, tr, rel_mass)."""
    pr, _, _ = pagerank_numpy(edges, n, c=c, eps=0.0, max_iter=max_iter)
    tr = personalized_pagerank_numpy(edges, n, seeds, c=c, max_iter=max_iter)
    scale = float(len(seeds)) / float(n)
    with np.errstate(divide="ignore", invalid="ignore"):
        m = np.where(pr > 0, (pr - scale * tr) / pr, 0.0)
    return pr, tr, m


def clustering_numpy(edges: np.ndarray, n: int) -> dict[int, tuple[int, int, float]]:
    """Per-vertex (degree, n_triangles, cc) over the simple undirected
    graph; only vertices with >= 1 neighbor appear (matching
    linkanalysis.clustering_coefficients' edge-derived output)."""
    adj: list[set[int]] = [set() for _ in range(n)]
    for u, v in np.asarray(edges, dtype=np.int64):
        u, v = int(u), int(v)
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    _, per = triangles_numpy(edges, n)
    out: dict[int, tuple[int, int, float]] = {}
    for i in range(n):
        d = len(adj[i])
        if d == 0:
            continue
        cc = 2.0 * per[i] / (d * (d - 1)) if d >= 2 else 0.0
        out[i] = (d, int(per[i]), cc)
    return out


def bfs_numpy(
    edges: np.ndarray,
    n: int,
    sources: list[int],
    max_hops: int = 30,
    directed: bool = True,
) -> dict[int, int]:
    """Multi-source BFS hop distances (linkanalysis.bfs_distances
    semantics): {id: dist} for vertices reachable within max_hops."""
    adj: list[list[int]] = [[] for _ in range(n)]
    for u, v in np.asarray(edges, dtype=np.int64):
        adj[int(u)].append(int(v))
        if not directed:
            adj[int(v)].append(int(u))
    dist = {int(s): 0 for s in sources}
    frontier = list(dist)
    hop = 0
    while frontier and hop < max_hops:
        hop += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    return dist


def coreness_numpy(edges: np.ndarray, n: int) -> dict[int, int]:
    """k-core decomposition by exact peeling (Batagelj-Zaversnik order)
    over the simple undirected graph; only vertices with >= 1 neighbor
    appear (matching structure.coreness' edge-derived output)."""
    adj: list[set[int]] = [set() for _ in range(n)]
    for u, v in np.asarray(edges, dtype=np.int64):
        u, v = int(u), int(v)
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    deg = {i: len(adj[i]) for i in range(n) if adj[i]}
    core: dict[int, int] = {}
    alive = set(deg)
    k = 0
    while alive:
        k = max(k, min(deg[v] for v in alive))
        peel = [v for v in alive if deg[v] <= k]
        while peel:
            v = peel.pop()
            if v not in alive:
                continue
            core[v] = k
            alive.discard(v)
            for u in adj[v]:
                if u in alive:
                    deg[u] -= 1
                    if deg[u] <= k:
                        peel.append(u)
    return core


def scc_numpy(edges: np.ndarray, n: int) -> dict[int, int]:
    """Strongly connected components via iterative Tarjan; {id: scc} with
    scc = min member id, over all n vertices (trivial SCCs included).
    Self-loops are ignored (structure.strongly_connected_components
    semantics)."""
    adj: list[list[int]] = [[] for _ in range(n)]
    for u, v in np.asarray(edges, dtype=np.int64):
        if int(u) != int(v):
            adj[int(u)].append(int(v))
    index = {}
    low = {}
    on_stack = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]

    def strongconnect(root: int) -> None:
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            advanced = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    advanced = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                lab = min(comp)
                for w in comp:
                    out[w] = lab

    for v in range(n):
        if v not in index:
            strongconnect(v)
    return out


def graph_summary_numpy(
    edges: np.ndarray, n: int
) -> tuple[int, int, int, float, float | None]:
    """(n_vertices, n_edges, n_self_loops, reciprocity, assortativity)
    over the deduplicated directed edge set (structure.graph_summary
    semantics; assortativity = Pearson corr of (outdeg(src), indeg(dst))
    over distinct non-loop edges, None when degenerate)."""
    es = {(int(u), int(v)) for u, v in np.asarray(edges, dtype=np.int64)}
    verts = {u for u, _ in es} | {v for _, v in es}
    loops = sum(1 for u, v in es if u == v)
    nonloop = [(u, v) for u, v in es if u != v]
    recip = sum(1 for u, v in nonloop if (v, u) in es)
    od: dict[int, int] = {}
    idg: dict[int, int] = {}
    for u, v in es:
        od[u] = od.get(u, 0) + 1
        idg[v] = idg.get(v, 0) + 1
    xs = np.array([od[u] for u, _ in nonloop], dtype=np.float64)
    ys = np.array([idg[v] for _, v in nonloop], dtype=np.float64)
    assort: float | None = None
    if len(nonloop) >= 2 and xs.std() > 0 and ys.std() > 0:
        assort = float(np.corrcoef(xs, ys)[0, 1])
    return (
        len(verts),
        len(es),
        loops,
        (recip / len(nonloop)) if nonloop else 0.0,
        assort,
    )


def weighted_pagerank_numpy(
    edges_w: list[tuple[int, int, float]],
    n: int,
    c: float = 0.85,
    max_iter: int = 20,
    eps: float = 0.0,
) -> np.ndarray:
    """Weighted PageRank (linkanalysis.weighted_pagerank semantics):
    row-normalize by out-weight sums, dangling mass and teleport uniform,
    L1-normalized at the end."""
    P = np.zeros((n, n))
    wsum: dict[int, float] = {}
    for u, v, w in edges_w:
        wsum[u] = wsum.get(u, 0.0) + w
    for u, v, w in edges_w:
        P[u, v] += w / wsum[u]
    nd = np.array([u in wsum for u in range(n)])
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        dmass = r[~nd].sum()
        total = r.sum()
        new = c * (P.T @ r + dmass / n) + (1 - c) / n * total
        delta = np.abs(new - r).sum()
        r = new
        if delta < eps:
            break
    return r / np.abs(r).sum()


def hyperball_numpy(
    edges: np.ndarray, t_max: int, reverse: bool = False
) -> tuple[dict[tuple[int, int], tuple[int, int]], dict[tuple[int, int], int]]:
    """Exact simulation of algorithms.hyperball's HLL registers: per (id, t)
    the (s_int, zero_regs) summary, plus the EXACT ball size |B(id, t)| for
    estimate-quality checks. Vertices are the distinct edge endpoints, the
    hash is the engine's md5 60-bit convention, m=64, rho in [1, 55]."""
    import hashlib

    M, B, RHO_MAX = 64, 6, 55
    arr = np.asarray(edges, dtype=np.int64).reshape(-1, 2)
    if reverse:
        arr = arr[:, ::-1]
    verts = sorted({int(x) for x in arr.ravel()})
    out: dict[int, set[int]] = {v: set() for v in verts}
    for u, v in arr:
        if int(u) != int(v):
            out[int(u)].add(int(v))

    def jrho(x: int) -> tuple[int, int]:
        h = int(hashlib.md5(str(x).encode()).hexdigest()[:15], 16)
        rem = h >> B
        return h % M, (RHO_MAX - rem.bit_length()) if rem else RHO_MAX

    balls = {v: {v} for v in verts}
    summaries: dict[tuple[int, int], tuple[int, int]] = {}
    exact: dict[tuple[int, int], int] = {}
    for t in range(t_max + 1):
        if t > 0:
            balls = {
                v: balls[v].union(*(balls[w] for w in out[v])) if out[v] else balls[v]
                for v in verts
            }
        for v in verts:
            regs = [0] * M
            for w in balls[v]:
                j, rho = jrho(w)
                regs[j] = max(regs[j], rho)
            s_int = sum(1 << (RHO_MAX - r) for r in regs)
            summaries[(v, t)] = (s_int, sum(1 for r in regs if r == 0))
            exact[(v, t)] = len(balls[v])
    return summaries, exact


def random_walks_numpy(
    edges: np.ndarray, walk_length: int, walks_per_node: int, seed: int
) -> dict[tuple[int, int, int], int]:
    """Exact twin of algorithms.walks.random_walks: {(start, walk, step):
    vertex}. Same md5 argmin next-hop rule, walks stop at dangling."""
    import hashlib
    from collections import defaultdict

    # self-loops are legal hops (the engine's edge cache keeps them and so
    # does the SQL oracle; a walk may step v -> v)
    adj: dict[int, list[int]] = defaultdict(list)
    for u, v in np.asarray(edges, dtype=np.int64).reshape(-1, 2):
        adj[int(u)].append(int(v))
    adj = {u: sorted(set(vs)) for u, vs in adj.items()}

    def h(s, w, t, nb):
        key = f"{seed}_{s}_{w}_{t}_{nb}".encode()
        return int(hashlib.md5(key).hexdigest()[:15], 16)

    out: dict[tuple[int, int, int], int] = {}
    for s in adj:
        for w in range(walks_per_node):
            cur = s
            out[(s, w, 0)] = cur
            for t in range(1, walk_length + 1):
                nbrs = adj.get(cur)
                if not nbrs:
                    break
                cur = min(nbrs, key=lambda nb: (h(s, w, t, nb), nb))
                out[(s, w, t)] = cur
    return out
