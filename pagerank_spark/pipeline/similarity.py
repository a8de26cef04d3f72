"""Similarity search over an embedding column (array<float>).

- brute_force_topk: exact cosine top-k for a set of query vectors. The dot
  product runs JVM-side (zip_with + aggregate — whole-stage codegen, no
  Python); queries are broadcast. Baseline and small-n path.
- lsh_topk: random-hyperplane LSH with query-side multi-probe. Each vector
  gets an n_bits sign pattern split into >=16-bit band values (vectorized
  NumPy pandas UDF); the corpus is bucketed once per band, and each query
  probes every band value within probe_hamming bits of its own (corpus-side
  storage stays one bucket per band — only the query fan-out expands).
  With the 64-bit/4x16 defaults a query touches ~bands * probes / 2^16 of
  the corpus (~0.8% at probe_hamming=2): candidate cost stays LINEAR in n.
  Designed for high-cosine ANN (near-dup retrieval); for moderate-cosine
  k-NN use ivf_topk, whose probe set adapts to the data distribution.
- ivf_topk: FAISS-style IVF-Flat — driver-sampled k-means cells, n_probe
  cell equi-join, exact re-rank.
- embedding_cosine_pairs: all-pairs near-duplicate detection >= threshold,
  LSH-bucketed (128-bit signatures, 8 bands of 16 bits — bucket counts stay
  ~2^16 per band so the self-join cannot degenerate toward all-pairs as the
  corpus grows); used by the dedup suite.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(vec_a: str, vec_b: str):
    dot = F.aggregate(
        F.zip_with(vec_a, vec_b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    na = F.sqrt(
        F.aggregate(
            F.col(vec_a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    nb = F.sqrt(
        F.aggregate(
            F.col(vec_b), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )
    return dot / (na * nb)


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (query_id, neighbor_id, cosine, rank) exact top-k per query.

    queries: (vec_id, embedding) — broadcast; ties broken by neighbor id for
    full determinism. Self-matches excluded.
    """
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
        )
    )
    base = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        q.crossJoin(base)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _cosine("qvec", "nvec").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_bits: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_bits, dim))


def lsh_signatures(
    embeddings: DataFrame,
    dim: int,
    n_bits: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (vec_id, sig: long) random-hyperplane signature (sign pattern)."""
    planes = _hyperplanes(dim, n_bits, seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(n_bits, dtype=np.int64)
        for batch in batches:
            mat = np.array(batch[vec_col].tolist(), dtype=np.float64)
            if mat.size == 0:
                yield pd.DataFrame({"vec_id": [], "sig": []})
                continue
            bits = (mat @ planes.T) > 0
            sig = (bits * weights).sum(axis=1)
            yield pd.DataFrame({"vec_id": batch[id_col], "sig": sig})

    from pagerank_spark.util import widen_partitions

    return widen_partitions(embeddings.select(id_col, vec_col)).mapInPandas(
        gen, "vec_id long, sig long"
    )


def _band_values(
    df: DataFrame,
    dim: int,
    n_bits: int,
    n_bands: int,
    seed: int,
    id_col: str,
    vec_col: str,
    out_id: str,
) -> DataFrame:
    """-> (out_id, band, bv): integer value of each hyperplane-sign band.

    Band values are emitted directly from the Arrow batch instead of packing
    the whole signature into one 64-bit word, so signatures can be 128+ bits
    with wide (>=16-bit) bands — the shape that keeps per-band bucket counts
    at ~2^width and the candidate equi-join linear in corpus size."""
    assert n_bits % n_bands == 0
    width = n_bits // n_bands
    planes = _hyperplanes(dim, n_bits, seed)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(width, dtype=np.int64)
        for batch in batches:
            if not len(batch):
                yield pd.DataFrame({out_id: [], "band": [], "bv": []})
                continue
            mat = np.array(batch[vec_col].tolist(), dtype=np.float64)
            bits = (mat @ planes.T) > 0  # (n, n_bits)
            ids = batch[id_col].to_numpy()
            n = len(ids)
            bvs = np.empty((n, n_bands), dtype=np.int64)
            for bi in range(n_bands):
                bvs[:, bi] = bits[:, bi * width : (bi + 1) * width] @ weights
            yield pd.DataFrame(
                {
                    out_id: np.repeat(ids, n_bands),
                    "band": np.tile(np.arange(n_bands, dtype=np.int32), n),
                    "bv": bvs.reshape(-1),
                }
            )

    from pagerank_spark.util import widen_partitions

    return widen_partitions(df.select(id_col, vec_col)).mapInPandas(
        gen, f"{out_id} long, band int, bv long"
    )


def _probe_masks(width: int, radius: int) -> list[int]:
    """XOR masks enumerating all band values within Hamming `radius` bits."""
    masks = [0]
    if radius >= 1:
        masks += [1 << i for i in range(width)]
    if radius >= 2:
        masks += [
            (1 << i) | (1 << j) for i in range(width) for j in range(i + 1, width)
        ]
    if radius >= 3:
        raise ValueError("probe_hamming > 2 not supported (probe fan-out)")
    return masks


def lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_bits: int = 64,
    n_bands: int = 4,
    probe_hamming: int = 2,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via multi-probe hyperplane LSH; exact cosine
    re-ranks candidates. Returns (query_id, neighbor_id, cosine, rank).

    Defaults (64-bit signatures, 4 bands of 16 bits, probe radius 2) keep the
    per-band bucket count at 2^16 — each query's candidate set is
    ~4*137/65536 ≈ 0.8% of the corpus regardless of n, instead of the
    narrow-band shape whose buckets degenerate toward all-pairs as the
    corpus grows. High recall for high-cosine neighbors (≈0.97 per neighbor
    at cos 0.9); for moderate-cosine k-NN prefer ivf_topk."""
    assert n_bits % n_bands == 0
    width = n_bits // n_bands
    corpus_b = _band_values(
        embeddings, dim, n_bits, n_bands, seed, id_col, vec_col, "neighbor_id"
    )
    query_b = _band_values(
        queries, dim, n_bits, n_bands, seed, id_col, vec_col, "query_id"
    )
    # query-side multi-probe: expand each query band value to its Hamming
    # ball; corpus-side storage stays one bucket per band
    masks = _probe_masks(width, probe_hamming)
    probes = query_b.select(
        "query_id",
        "band",
        F.explode(
            F.array(*[F.col("bv").bitwiseXOR(F.lit(m)) for m in masks])
        ).alias("bv"),
    )
    cand = (
        probes.join(corpus_b, ["band", "bv"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        # e is O(corpus): never auto-broadcast it (driver-OOM class; PLANS.md)
        .join(e.hint("shuffle_hash"), "neighbor_id")
        .select("query_id", "neighbor_id", _cosine("qvec", "nvec").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def _kmeans_centroids(
    sample: np.ndarray, n_lists: int, seed: int, iters: int = 8
) -> np.ndarray:
    """Deterministic tiny k-means (L2, k-means++-lite seeding) on a driver
    sample; returns (n_lists, dim) float64 centroids, each L2-normalized so
    cosine assignment = dot product."""
    rng = np.random.default_rng(seed)
    x = sample / np.maximum(np.linalg.norm(sample, axis=1, keepdims=True), 1e-12)
    idx = [int(rng.integers(0, x.shape[0]))]
    for _ in range(1, n_lists):
        d = 1.0 - np.max(x @ x[idx].T, axis=1)  # cosine distance to chosen
        probs = np.maximum(d, 1e-9)
        idx.append(int(rng.choice(x.shape[0], p=probs / probs.sum())))
    c = x[idx].copy()
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_lists):
            members = x[assign == j]
            if members.shape[0]:
                m = members.mean(axis=0)
                c[j] = m / max(np.linalg.norm(m), 1e-12)
    return c


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int | None = None,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    sample_size: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize vectors into
    n_lists cells (k-means centroids from a deterministic sample), probe the
    n_probe closest cells per query, exact-cosine re-rank candidates.

    The 100 TB shape: centroid training is a driver-side O(sample) step, the
    assignment is one partition-parallel Arrow pass, and each query touches
    only ~n_probe/n_lists of the corpus via the cell equi-join (the same
    probe-vs-scan trade as FAISS IVF-Flat). Returns
    (query_id, neighbor_id, cosine, rank).
    """
    # deterministic sample: smallest hash(vec_id) order, collected via Arrow
    sample_df = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
    )
    sample = np.array(
        [list(r[1]) for r in sample_df.collect()], dtype=np.float64
    )
    if sample.size == 0:  # empty corpus -> empty result, like the siblings
        return embeddings.sparkSession.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    if dim is not None and sample.shape[1] != dim:
        raise ValueError(f"dim={dim} but embeddings have {sample.shape[1]} dims")
    cent = _kmeans_centroids(sample, n_lists, seed)

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                yield pd.DataFrame({"vec_id": [], "list_id": []})
                continue
            mat = np.array(batch[vec_col].tolist(), dtype=np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            yield pd.DataFrame(
                {"vec_id": batch[id_col], "list_id": np.argmax(mat @ cent.T, axis=1)}
            )

    from pagerank_spark.util import widen_partitions

    assigned = widen_partitions(embeddings.select(id_col, vec_col)).mapInPandas(
        assign, "vec_id long, list_id int"
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            ids, lists = [], []
            for qid, vec in zip(batch[id_col], batch[vec_col]):
                v = np.asarray(list(vec), dtype=np.float64)
                v = v / max(np.linalg.norm(v), 1e-12)
                top = np.argsort(-(cent @ v))[:n_probe]
                ids.extend([qid] * len(top))
                lists.extend(int(t) for t in top)
            yield pd.DataFrame({"query_id": ids, "list_id": lists})

    probes = queries.select(id_col, vec_col).mapInPandas(
        probe, "query_id long, list_id int"
    )
    cand = (
        F.broadcast(probes)
        .join(assigned, "list_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        # e is O(corpus): never auto-broadcast it (driver-OOM class; PLANS.md)
        .join(e.hint("shuffle_hash"), "neighbor_id")
        .select("query_id", "neighbor_id", _cosine("qvec", "nvec").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def lsh_candidate_pairs(
    embeddings: DataFrame,
    dim: int,
    n_bits: int = 128,
    n_bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id_a, id_b) distinct candidate pairs sharing >=1 signature band.

    Exposed so tests/bench can assert the scale contract directly: with
    >=16-bit bands the expected candidate count is
    sum_bands sum_buckets C(bucket_size, 2) ~ n^2 / 2^width per band — for
    width 16 that stays ~LINEAR in n until n approaches 2^16 per bucket,
    instead of the narrow-band shape where 2-4 buckets per band force ~n^2/4
    candidates outright."""
    banded = _band_values(
        embeddings, dim, n_bits, n_bands, seed, id_col, vec_col, "vec_id"
    )
    return (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bv"])
        .filter(F.col("x.vec_id") < F.col("y.vec_id"))
        .select(F.col("x.vec_id").alias("id_a"), F.col("y.vec_id").alias("id_b"))
        .distinct()
    )


def embedding_cosine_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int | None = None,
    n_bits: int = 128,
    n_bands: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = False,
) -> DataFrame:
    """-> (id_a, id_b, cosine) pairs with cosine >= threshold, id_a < id_b.

    exact=True does the full O(n^2) self-join (oracle/small-n); otherwise
    LSH-bucketed candidates only, re-scored with exact cosine (no false
    positives — only pairs missing from every band are lost). Defaults are
    the scale-safe shape: 128-bit signatures, 8 bands of 16 bits, so each
    band has ~2^16 buckets and the candidate self-join stays ~linear in n
    (see lsh_candidate_pairs). Per-pair recall ≈ 1 - (1 - p^16)^8 with
    p = 1 - arccos(cos)/pi: ~1.0 at cos 0.99, ~0.79 at 0.95, ~0.50 at 0.90.
    """
    a = embeddings.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = embeddings.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    if exact:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    else:
        if dim is None:
            raise ValueError("dim required for LSH path")
        cand = lsh_candidate_pairs(
            embeddings, dim, n_bits, n_bands, seed, id_col, vec_col
        )
        pairs = cand.join(a, "id_a").join(b, "id_b")
    return pairs.select(
        "id_a", "id_b", _cosine("va", "vb").alias("cosine")
    ).filter(F.col("cosine") >= threshold)


def _pq_kmeans(sample: np.ndarray, ks: int, seed: int, iters: int = 10) -> np.ndarray:
    """Deterministic plain-L2 k-means for PQ subspace codebooks (NOT the
    cosine variant above — subvectors are quantized in raw Euclidean space,
    the PQ convention). Returns (ks, sub_dim) float64."""
    rng = np.random.default_rng(seed)
    n = sample.shape[0]
    idx = [int(rng.integers(0, n))]
    for _ in range(1, min(ks, n)):
        d = np.min(
            ((sample[:, None, :] - sample[idx][None, :, :]) ** 2).sum(-1), axis=1
        )
        probs = np.maximum(d, 1e-12)
        idx.append(int(rng.choice(n, p=probs / probs.sum())))
    c = sample[idx].copy()
    if c.shape[0] < ks:  # degenerate tiny sample: repeat rows
        c = np.vstack([c] * (ks // c.shape[0] + 1))[:ks]
    for _ in range(iters):
        d2 = ((sample[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        assign = np.argmin(d2, axis=1)
        for j in range(ks):
            members = sample[assign == j]
            if members.shape[0]:
                c[j] = members.mean(axis=0)
    return c


def pq_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int | None = None,
    k: int = 10,
    m_subspaces: int = 8,
    ks: int = 16,
    refine: int = 4,
    seed: int = 42,
    sample_size: int = 512,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN (Jégou/Douze/Schmid 2011) with asymmetric
    distance computation and exact re-rank — the memory-bound third leg of
    the ANN surface (LSH buckets, IVF cells, PQ codes):

    1. vectors are L2-normalized and split into ``m_subspaces`` subvectors;
       each subspace gets a ``ks``-entry codebook (deterministic sampled
       k-means, driver-side O(sample));
    2. the corpus compresses to m uint8 codes per vector (one Arrow pass —
       at 100 TB this is the point: 8 bytes/vector instead of 4·dim, so the
       scoring scan reads ~1/256 of the data);
    3. per query, ADC builds an m×ks lookup table of subspace dot products
       (q·centroid); approximate cosine = Σ_j LUT[j][code_j]. Scoring runs
       as one mapInPandas over the codes with the tiny LUT tensor broadcast,
       emitting only each batch's per-query top ``k·refine`` (bounded
       output — no corpus×queries row explosion leaves the executor);
    4. the global k·refine ADC candidates per query are re-ranked by EXACT
       cosine against the raw vectors; final top-k is exact among them.

    Returns (query_id, neighbor_id, cosine, rank) — cosine is the exact
    value, so downstream thresholds behave identically to brute force.
    """
    sample_df = (
        embeddings.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.xxhash64(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
    )
    sample = np.array([list(r[1]) for r in sample_df.collect()], dtype=np.float64)
    spark = embeddings.sparkSession
    if sample.size == 0:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    d = sample.shape[1]
    if dim is not None and d != dim:
        raise ValueError(f"dim={dim} but embeddings have {d} dims")
    if ks > 256:
        raise ValueError("ks must fit a uint8 code (<= 256)")
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    bounds = np.linspace(0, d, m_subspaces + 1).astype(int)
    books = [
        _pq_kmeans(sample[:, bounds[j]:bounds[j + 1]], ks, seed + j)
        for j in range(m_subspaces)
    ]

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                yield pd.DataFrame({"vec_id": [], "codes": []})
                continue
            mat = np.array(batch[vec_col].tolist(), dtype=np.float64)
            mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            codes = np.empty((mat.shape[0], m_subspaces), dtype=np.int64)
            for j, cb in enumerate(books):
                sub = mat[:, bounds[j]:bounds[j + 1]]
                d2 = (
                    (sub ** 2).sum(1, keepdims=True)
                    - 2.0 * (sub @ cb.T)
                    + (cb ** 2).sum(1)[None, :]
                )
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame({"vec_id": batch[id_col], "codes": list(codes)})

    from pagerank_spark.util import widen_partitions

    codes = widen_partitions(embeddings.select(id_col, vec_col)).mapInPandas(
        encode, "vec_id long, codes array<long>"
    )

    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        return spark.createDataFrame(
            [], "query_id long, neighbor_id long, cosine double, rank int"
        )
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    qmat = np.array([list(r[1]) for r in qrows], dtype=np.float64)
    qmat = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    # LUT[q, j, c] = q_sub_j . centroid_{j,c}  (n_queries x m x ks, tiny)
    lut = np.stack(
        [qmat[:, bounds[j]:bounds[j + 1]] @ books[j].T for j in range(m_subspaces)],
        axis=1,
    )
    n_cand = int(k * refine)

    def adc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            if not len(batch):
                yield pd.DataFrame({"query_id": [], "neighbor_id": [], "adc": []})
                continue
            cds = np.array(batch["codes"].tolist(), dtype=np.int64)  # (b, m)
            vids = batch["vec_id"].to_numpy()
            # scores (n_queries, b): sum over subspaces of LUT gathers
            scores = np.zeros((lut.shape[0], cds.shape[0]))
            for j in range(m_subspaces):
                scores += lut[:, j, :][:, cds[:, j]]
            top = min(n_cand, cds.shape[0])
            part = np.argpartition(-scores, top - 1, axis=1)[:, :top]
            qi = np.repeat(qids, top)
            yield pd.DataFrame(
                {
                    "query_id": qi,
                    "neighbor_id": vids[part.ravel()],
                    "adc": np.take_along_axis(scores, part, axis=1).ravel(),
                }
            )

    batch_top = codes.mapInPandas(adc, "query_id long, neighbor_id long, adc double")
    w_adc = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    cand = (
        batch_top.filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("r", F.row_number().over(w_adc))
        .filter(F.col("r") <= n_cand)
        .select("query_id", "neighbor_id")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"))
    e = embeddings.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec")
    )
    scored = (
        cand.join(F.broadcast(q), "query_id")
        .join(e.hint("shuffle_hash"), "neighbor_id")
        .select("query_id", "neighbor_id", _cosine("qvec", "nvec").alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
