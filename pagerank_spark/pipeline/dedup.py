"""Document deduplication operators for large-scale training-data pipelines.

Five strategies, all returning DataFrames keyed by doc_id so they compose:

- exact_dedup           — md5(text) hash-groupBy; keeps the min doc_id per
                          group. One shuffle on a 16-byte key.
- ngram_jaccard_pairs   — exact Jaccard over word n-gram shingle sets via an
                          inverted-index join (doc pairs sharing >=1 shingle),
                          so no O(n^2) cross join; exact but shuffle-heavy.
- minhash_lsh_pairs     — MinHash signatures (vectorized NumPy inside a
                          pandas UDF) + banded LSH bucketing; candidate pairs
                          come from a bucket equi-join, then are verified
                          against the estimated Jaccard. The 100TB-scale
                          path: cost ~ O(n * bands), shuffle on band buckets.
- simhash_pairs         — 64-bit SimHash; near-dup candidates = equal
                          signature bands (Hamming-adjacent buckets), verified
                          by Hamming distance. Cheapest signature (8 bytes).
- embedding_cosine_pairs— near-dup by cosine over an embedding column, via
                          the similarity module's LSH bucketing or
                          brute-force for small n.

Signature hashing: defaults follow measurement, not intuition. Both a full
JVM path (shingles/tokens via split/transform built-ins, hashes via md5/
xxhash64 in codegen; SimHash as 64 per-bit SQL aggregates) and Arrow-batch
NumPy UDF paths exist and are tested bit-identical; at 100k docs on
local[32] the UDF paths WIN (SimHash 4.7s vs 13.4s SQL; MinHash crc 2.8s
vs 5.2s JVM-md5) because the "Python" hashing is C-backed (zlib.crc32 /
hashlib.md5) while the SQL route pays explode+shuffle+wide-aggregate or
JVM hex-string materialization. The UDFs additionally memoize per-batch:
each distinct token/shingle is hashed once (natural token streams are
Zipf — repeats dominate), with a bounded vocabulary cache. The JVM paths
remain available (simhash method="sql", minhash hash_fn="md5"/"xxhash")
for clusters where Python workers are the constraint, and double as
independent cross-checks of the UDF implementations.
Permutations are the standard (a*h + b) mod p family with a fixed seed.
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERSENNE = (1 << 61) - 1
_TOKEN_RE = re.compile(r"\W+")


def tokenize(text: str) -> list[str]:
    return [t for t in _TOKEN_RE.split(text.lower()) if t]


def shingles(text: str, n: int = 3) -> set[str]:
    toks = tokenize(text)
    if len(toks) < n:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _hash64(s: str) -> int:
    b = s.encode("utf-8")
    return (zlib.crc32(b, 0x9747B28C) << 32) | zlib.crc32(b, 0x85EBCA6B)


def _md5_64(s: str) -> int:
    """First 8 bytes of md5, big-endian -> [0, 2^64). Used where a SQL oracle
    must reproduce the hash: DuckDB ('0x'||substr(md5(t),1,16))::UBIGINT."""
    import hashlib

    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:8], "big")


def _mulmod61(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """(x*y) mod 2^61-1, exact, for uint64 arrays with x, y < 2^61.

    32-bit limb products (each < 2^64, no overflow) recombined with
    2^64 ≡ 8 and 2^61 ≡ 1 (mod p). Preserves the universal-hash family
    property the plain `(a*h+b) % p` int64 expression silently lost to
    wraparound (advisor finding, round 1).
    """
    P = np.uint64(_MERSENNE)
    M32 = np.uint64(0xFFFFFFFF)
    xh, xl = x >> np.uint64(32), x & M32
    yh, yl = y >> np.uint64(32), y & M32
    ll = xl * yl                      # < 2^64
    mid = xh * yl + xl * yh           # < 2^62 (xh, yh < 2^29)
    hh = xh * yh                      # < 2^58
    # x*y = hh*2^64 + mid*2^32 + ll
    m1, m0 = mid >> np.uint64(29), mid & np.uint64((1 << 29) - 1)
    term_mid = m1 + (m0 << np.uint64(32))          # mid*2^32 mod p (< 2^61+2^33)
    term_ll = (ll >> np.uint64(61)) + (ll & P)     # ll mod-ish (< 2^61+8)
    r = np.uint64(8) * hh + term_mid + term_ll     # < 2^63
    r = (r >> np.uint64(61)) + (r & P)
    r = (r >> np.uint64(61)) + (r & P)
    return np.where(r >= P, r - P, r)


# ---------------------------------------------------------------- exact
def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """-> (doc_id, keep_id): keep_id = min doc_id among byte-identical texts."""
    hashed = docs.select(id_col, F.md5(F.col(text_col)).alias("h"))
    keep = hashed.groupBy("h").agg(F.min(id_col).alias("keep_id"))
    return hashed.join(keep, "h").select(id_col, "keep_id")


def token_arrays(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, toks array<string>): the engine's ONE canonical tokenizer
    (lowercase, split non-word, drop empties; empty docs dropped), entirely
    JVM-side, matching the DuckDB oracles' TOKS macro. Shared by the
    shingle pipelines and BM25 so cross-engine parity has a single
    definition. Tokenizing is a compute-heavy per-row stage: the input is
    spread across the session parallelism even from a single file split."""
    from pagerank_spark.util import widen_partitions

    return (
        widen_partitions(docs.select(id_col, text_col))
        .select(
            F.col(id_col).alias("id"),
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != ""
            ).alias("toks"),
        )
        .filter(F.size("toks") > 0)
    )


def shingle_table(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (id, sh array<string>): distinct word n-gram shingles per doc,
    entirely JVM-side (split/transform built-ins). Docs shorter than n
    tokens contribute their whole token string as one shingle; empty docs
    are dropped (matches the Python shingles() helper and the DuckDB
    oracles' len(t) > 0 filter). Shared by the Jaccard dedup and the
    benchmark-contamination screen."""
    toks = token_arrays(docs, id_col=id_col, text_col=text_col)
    return toks.select(
        "id",
        F.array_distinct(
            F.when(
                F.size("toks") >= n,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - n),
                    lambda i: F.array_join(F.slice("toks", i + 1, n), " "),
                ),
            ).otherwise(F.array(F.array_join("toks", " ")))
        ).alias("sh"),
    ).filter(F.size("sh") > 0)


# ------------------------------------------------------- n-gram jaccard
def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_shingle_df: int | None | str = "auto",
) -> DataFrame:
    """Exact Jaccard >= threshold pairs via inverted-index join.

    Shingling runs JVM-side (split/transform/explode built-ins); the pair
    generation is a self-join on shingle, aggregated to intersection counts,
    then |A∪B| = |A|+|B|-|A∩B|. Returns (id_a, id_b, jaccard), id_a < id_b.

    max_shingle_df caps the inverted-index blowup at corpus scale: a shingle
    shared by f documents contributes f^2 rows to the self-join, so one hot
    shingle (boilerplate, headers) can emit 10^10 pairs. With the cap set,
    shingles with document frequency > max_shingle_df are dropped from
    CANDIDATE GENERATION only; the Jaccard of each surviving candidate pair
    is then recomputed exactly from the full shingle arrays
    (array_intersect), so reported scores are never approximated — the only
    approximation is that a pair sharing exclusively hot shingles is missed
    (such a pair is boilerplate-only overlap, below any useful threshold on
    real corpora; documented trade-off).

    The default "auto" resolves to max(1000, n_docs // 100) — the capped
    plan is the safe one at every scale, so it is the default; pass None to
    explicitly opt into the uncapped O(f^2)-per-hot-shingle plan (tiny
    corpora / oracle comparisons).
    """
    if max_shingle_df == "auto":
        max_shingle_df = max(1000, docs.count() // 100)
    sh = shingle_table(docs, n=n, id_col=id_col, text_col=text_col)
    # the shingle table feeds the inverted index, the size table, and (on
    # the capped path) the exact re-score join — materialize it once instead
    # of re-running the tokenizer/shingler 3-4x per consumer. Executor-local
    # mem+disk; recompute would cost more than the storage at any scale.
    sh = sh.localCheckpoint(eager=True)
    sizes = sh.select("id", F.size("sh").alias("sz"))
    inv = sh.select("id", F.explode("sh").alias("s"))
    if max_shingle_df is not None:
        # drop hot shingles from the index (candidate generation only), then
        # recompute exact intersections from the full arrays per candidate.
        # Before paying the full-array join, prune with an EXACT upper
        # bound: true_inter <= inter_nonhot + min(hot_a, hot_b) and jaccard
        # is monotone in inter, so any pair whose bound misses the
        # threshold cannot pass — on boilerplate-heavy corpora this
        # collapses the expensive re-score join to the true near-dups.
        dfreq = inv.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
        hot = dfreq.filter(F.col("df") > max_shingle_df).select("s")
        hot_per_doc = (
            inv.join(hot, "s", "left_semi")
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_hot"))
        )
        inv_cand = inv.join(hot, "s", "left_anti")
        cand = (
            inv_cand.alias("a")
            .join(inv_cand.alias("b"), "s")
            .filter(F.col("a.id") < F.col("b.id"))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("inter_nh"))
        )
        meta = sizes.join(hot_per_doc, "id", "left").select(
            "id", "sz", F.coalesce("n_hot", F.lit(0)).alias("n_hot")
        )
        cand = (
            cand.join(
                meta.select(
                    F.col("id").alias("id_a"),
                    F.col("sz").alias("sz_a"),
                    F.col("n_hot").alias("h_a"),
                ),
                "id_a",
            )
            .join(
                meta.select(
                    F.col("id").alias("id_b"),
                    F.col("sz").alias("sz_b"),
                    F.col("n_hot").alias("h_b"),
                ),
                "id_b",
            )
            .withColumn(
                "inter_ub", F.col("inter_nh") + F.least("h_a", "h_b")
            )
            .filter(
                F.col("inter_ub")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter_ub"))
                >= threshold
            )
            .select("id_a", "id_b")
        )
        pairs = (
            cand.join(
                sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a")),
                "id_a",
            )
            .join(
                sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b")),
                "id_b",
            )
            .select(
                "id_a",
                "id_b",
                F.size(F.array_intersect("sh_a", "sh_b")).alias("inter"),
            )
        )
    else:
        pairs = (
            inv.alias("a")
            .join(inv.alias("b"), "s")
            .filter(F.col("a.id") < F.col("b.id"))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("inter"))
        )
    return (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.col("inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------------- minhash
def _perm_params(n_perm: int, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, size=n_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=n_perm, dtype=np.int64)
    return a, b


def _jvm_shingle_hashes(
    docs: DataFrame,
    shingle_n: int,
    id_col: str,
    text_col: str,
    hash_fn: str,
) -> DataFrame:
    """-> (id, h: array<long>) distinct shingle hashes in [0, 2^61), computed
    entirely JVM-side (tokenize/shingle with split/transform built-ins, hash
    with md5 or xxhash64) — no per-shingle Python in the signature hot path.

    hash_fn="md5": first 8 bytes of md5 big-endian (hi/lo conv halves ORed
    into the exact 64-bit pattern) & (2^61-1) — bit-identical to the Python
    _md5_64 path, so the DuckDB oracle keeps matching. hash_fn="xxhash":
    built-in xxhash64 & (2^61-1) — the fastest production hash."""
    from pagerank_spark.util import widen_partitions

    toks = widen_partitions(docs.select(id_col, text_col)).select(
        F.col(id_col).alias("id"),
        F.filter(
            F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\W+"),
            lambda x: x != "",
        ).alias("toks"),
    )
    sh = toks.select(
        "id",
        F.array_distinct(
            F.when(F.size("toks") == 0, F.array().cast("array<string>"))
            .when(
                F.size("toks") >= shingle_n,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - shingle_n),
                    lambda i: F.array_join(F.slice("toks", i + 1, shingle_n), " "),
                ),
            )
            .otherwise(F.array(F.array_join("toks", " ")))
        ).alias("sh"),
    )
    if hash_fn == "md5":

        def h_expr(s):
            hx = F.md5(s)
            hi = F.conv(F.substring(hx, 1, 8), 16, 10).cast("long")
            lo = F.conv(F.substring(hx, 9, 8), 16, 10).cast("long")
            return F.shiftleft(hi, 32).bitwiseOR(lo).bitwiseAND(F.lit(_MERSENNE))

    else:  # xxhash

        def h_expr(s):
            return F.xxhash64(s).bitwiseAND(F.lit(_MERSENNE))

    return sh.select("id", F.transform("sh", h_expr).alias("h"))


def minhash_signatures(
    docs: DataFrame,
    n_perm: int = 128,
    shingle_n: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "crc",
) -> DataFrame:
    """-> (doc_id, sig: array<long>) MinHash signature per doc.

    hash_fn selects the shingle hash (all memoize distinct shingles per
    task; measured at 100k docs / local[32]):
      "crc"        zlib.crc32 x2 in the Arrow UDF — fastest (2.8s), default
      "md5"        hashlib md5[:8] big-endian in the UDF — exactly
                   reproducible in DuckDB SQL; the oracle-checked driver
                   entry uses this (5.1s)
      "jvm-md5"    same bits computed JVM-side (5.2s — hex-string conv cost
                   eats the win); for Python-worker-free clusters
      "jvm-xxhash" JVM xxhash64 & (2^61-1) (3.7s)"""
    a, b = _perm_params(n_perm, seed)

    def sig_from_hashes(h: np.ndarray) -> np.ndarray:
        if h.size == 0:
            return np.full(n_perm, _MERSENNE, dtype=np.int64)
        # (n_perm, n_shingles) permuted hashes, min over shingles; exact
        # mulmod keeps the (a*h+b) mod p family universal
        ph = _mulmod61(
            a.astype(np.uint64)[:, None],
            np.broadcast_to(h[None, :], (a.shape[0], h.shape[0])),
        ) + b.astype(np.uint64)[:, None]
        P = np.uint64(_MERSENNE)
        ph = np.where(ph >= P, ph - P, ph)
        return ph.min(axis=1).astype(np.int64)

    if hash_fn in ("jvm-md5", "jvm-xxhash"):
        # JVM-side shingle hashing ("jvm-md5" is bit-identical to "md5");
        # loses to the UDF paths on measurement — kept for clusters without
        # Python workers
        hashed = _jvm_shingle_hashes(
            docs, shingle_n, id_col, text_col, hash_fn.removeprefix("jvm-")
        )

        def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for batch in batches:
                ids, sigs = [], []
                for did, harr in zip(batch["id"], batch["h"]):
                    h = np.asarray(harr, dtype=np.uint64)
                    ids.append(did)
                    sigs.append(sig_from_hashes(h).tolist())
                yield pd.DataFrame({"doc_id": ids, "sig": sigs})

        return hashed.mapInPandas(gen, "doc_id long, sig array<long>")

    shash = _md5_64 if hash_fn == "md5" else _hash64
    MASK = np.uint64((1 << 61) - 1)

    def gen_py(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, int] = {}  # shingle -> masked hash, memoized per task

        def hval(s: str) -> int:
            v = cache.get(s)
            if v is None:
                if len(cache) > 2_000_000:  # bound executor memory
                    cache.clear()
                v = cache[s] = shash(s) & ((1 << 61) - 1)
            return v

        for batch in batches:
            ids, sigs = [], []
            for did, text in zip(batch[id_col], batch[text_col]):
                sset = shingles(text or "", shingle_n)
                h = np.fromiter(
                    (hval(s) for s in sset), dtype=np.uint64, count=len(sset)
                ) & MASK
                ids.append(did)
                sigs.append(sig_from_hashes(h).tolist())
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    from pagerank_spark.util import widen_partitions

    return widen_partitions(docs.select(id_col, text_col)).mapInPandas(
        gen_py, "doc_id long, sig array<long>"
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float = 0.8,
    n_perm: int = 128,
    bands: int = 32,
    shingle_n: int = 3,
    seed: int = 42,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_fn: str = "crc",
) -> DataFrame:
    """-> (id_a, id_b, est_jaccard) candidate near-dup pairs, id_a < id_b.

    bands*rows = n_perm; a pair lands in a candidate bucket iff some band of
    their signatures matches exactly. est_jaccard = fraction of matching
    signature positions (unbiased Jaccard estimator); pairs below threshold
    are filtered after verification.
    """
    assert n_perm % bands == 0
    rows = n_perm // bands
    sig = minhash_signatures(docs, n_perm, shingle_n, seed, id_col, text_col, hash_fn)
    sig = sig.localCheckpoint(eager=True)
    banded = sig.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.struct(
                    bi.alias("band"),
                    F.xxhash64(
                        F.array_join(
                            F.transform(
                                F.slice("sig", bi * rows + 1, rows),
                                lambda x: x.cast("string"),
                            ),
                            ",",
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select("doc_id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bucket"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"), F.col("y.doc_id").alias("id_b")
        )
        .distinct()
    )
    sa = sig.select(F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"))
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            (
                F.aggregate(
                    F.zip_with(
                        "sig_a", "sig_b", lambda p, q: (p == q).cast("int")
                    ),
                    F.lit(0),
                    lambda acc, x: acc + x,
                ).cast("double")
                / F.lit(float(n_perm))
            ).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= threshold)
    )


# -------------------------------------------------------------- simhash
def simhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "udf",
) -> DataFrame:
    """-> (doc_id, simhash: long) 64-bit token-weighted SimHash.

    Token hash is md5[:8] (not crc) so a DuckDB oracle reproduces the
    signature bit-for-bit: ('0x' || substr(md5(t), 1, 16))::UBIGINT.

    method="udf" (default — measured fastest): Arrow-batch NumPy with a
    per-task token vocabulary — each distinct token is md5'd once and its
    ±1 bit-sign row cached, so a doc costs one np.unique + one small
    matmul (token streams are Zipf: repeats dominate).
    method="sql": tokens explode JVM-side, md5 + per-bit weighted sums run
    as 64 codegen'd hash aggregates — zero Python workers, but measured 3x
    slower (13.4s vs 4.7s pre-memoization at 100k docs on local[32]: the
    explode+shuffle+wide-aggregate costs more than C-backed hashlib).
    Kept for Python-worker-free clusters and as an independent bit-exact
    cross-check of the UDF.
    """
    if method == "sql":
        return _simhash_signatures_sql(docs, id_col, text_col)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bitw = 1 << np.arange(64, dtype=np.uint64)
        uid: dict[str, int] = {}  # token -> row index in the sign matrix
        hashes: list[int] = []  # uid -> md5_64(token)
        usigns = np.empty((0, 64), dtype=np.int8)  # uid -> ±1 per bit

        for batch in batches:
            # pass 1: tokenize and extend the vocabulary
            tok_uids = []
            for text in batch[text_col]:
                toks = tokenize(text or "")
                for t in toks:
                    if t not in uid:
                        uid[t] = len(hashes)
                        hashes.append(_md5_64(t))
                tok_uids.append(
                    np.fromiter(
                        (uid[t] for t in toks), dtype=np.int64, count=len(toks)
                    )
                )
            # extend the cached ±1 sign rows for new vocabulary only
            if len(hashes) > usigns.shape[0]:
                new = np.array(hashes[usigns.shape[0] :], dtype=np.uint64)
                bits = ((new[:, None] & bitw[None, :]) != 0).astype(np.int8)
                usigns = np.concatenate([usigns, bits * 2 - 1])
            # pass 2: per doc, count distinct tokens and weight the signs
            ids, sigs = [], []
            for did, uids in zip(batch[id_col], tok_uids):
                if uids.size == 0:
                    ids.append(did)
                    sigs.append(0)
                    continue
                vals, counts = np.unique(uids, return_counts=True)
                acc = counts @ usigns[vals].astype(np.int64)
                sig = int((bitw[acc > 0]).sum(dtype=np.uint64))
                ids.append(did)
                sigs.append(sig - (1 << 64) if sig >= (1 << 63) else sig)
            yield pd.DataFrame({"doc_id": ids, "simhash": sigs})
            if len(hashes) > 2_000_000:  # bound executor memory
                uid.clear()
                hashes.clear()
                usigns = np.empty((0, 64), dtype=np.int8)

    from pagerank_spark.util import widen_partitions

    return widen_partitions(docs.select(id_col, text_col)).mapInPandas(
        gen, "doc_id long, simhash long"
    )


def _simhash_signatures_sql(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """JVM-side SimHash: explode tokens -> md5 -> 64 per-bit weighted-sum
    aggregates -> sign pattern packed back into one signed long. Matches the
    UDF path bit-for-bit (same md5[:8] big-endian token hash; the hi/lo conv
    halves reassemble the exact 64-bit pattern)."""
    toks = docs.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.coalesce(F.col(text_col), F.lit(""))), r"\W+"),
                lambda x: x != "",
            )
        ).alias("t"),
    )
    tc = toks.groupBy("id", "t").agg(F.count(F.lit(1)).alias("cnt"))
    hx = F.md5("t")
    hashed = tc.select(
        "id",
        "cnt",
        F.conv(F.substring(hx, 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(hx, 9, 8), 16, 10).cast("long").alias("lo"),
    )
    aggs = []
    for b in range(64):
        half = F.col("lo") if b < 32 else F.col("hi")
        bit = F.shiftright(half, b % 32).bitwiseAND(F.lit(1))
        aggs.append(F.sum(F.col("cnt") * (bit * 2 - 1)).alias(f"a{b}"))
    g = hashed.groupBy("id").agg(*aggs)
    sig = F.lit(0).cast("long")
    for b in range(64):
        # bit 63 contributes the sign bit of the signed-long representation
        w = F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")
        sig = sig + F.when(F.col(f"a{b}") > 0, w).otherwise(F.lit(0).cast("long"))
    sigs = g.select(F.col("id").alias("doc_id"), sig.alias("simhash"))
    # docs with no tokens produce no rows above; keep them with signature 0
    # (the UDF path's convention)
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(sigs, "doc_id", "left")
        .select("doc_id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    n_bands: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    method: str = "udf",
) -> DataFrame:
    """-> (id_a, id_b, hamming) pairs within max_hamming bits.

    Pigeonhole LSH: split the 64-bit signature into n_bands 16-bit bands; any
    pair within max_hamming <= n_bands-1 bits must agree on >=1 band, so the
    candidate join is an equi-join on (band, band_value).
    """
    sig = simhash_signatures(docs, id_col, text_col, method).localCheckpoint(
        eager=True
    )
    width = 64 // n_bands
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright("simhash", bi * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("bv"),
                    )
                    for bi in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
    cand = (
        banded.alias("x")
        .join(banded.alias("y"), ["band", "bv"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
            F.col("x.simhash").alias("sa"),
            F.col("y.simhash").alias("sb"),
        )
        .distinct()
    )
    return cand.select(
        "id_a",
        "id_b",
        F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


def canonical_docs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Collapse near-duplicate PAIRS into clusters and elect a canonical
    representative per cluster — the stage a training-data pipeline runs
    after any pair generator here (``minhash_lsh_pairs``,
    ``ngram_jaccard_pairs``, ``simhash_pairs``, ``embedding_cosine_pairs``).

    ``pairs``: (id_a, id_b) near-duplicate matches (any extra score columns
    are ignored). Clusters are the connected components of the pair graph
    (transitive closure — a~b, b~c puts a,c in one cluster even if the pair
    generator never scored them), computed with the engine's
    large-star/small-star algorithm, so the pair graph can be billions of
    edges without a driver-side union-find. Canonical id = min doc id of
    the cluster (deterministic, join-free election: the component label
    already IS the min member).

    Returns one row per input doc: (id_col, canonical_id, is_canonical) —
    docs in no pair are their own canonical. Filtering
    ``is_canonical`` yields the deduplicated corpus; grouping by
    ``canonical_id`` yields the duplicate clusters.
    """
    from pagerank_spark.algorithms.components import connected_components

    from pagerank_spark import util as _util

    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comp = connected_components(edges).select(
        F.col("id").alias(id_col), F.col("component").alias("canonical_id")
    )
    # the join's small side is the pair-involved docs, not the corpus;
    # size-gate its strategy on that (shared constant, HLL estimate)
    if _util.approx_vertex_count(edges) > _util.BROADCAST_SAFE_ROWS:
        comp = comp.hint("shuffle_hash")
    return docs.select(id_col).join(comp, id_col, "left").select(
        id_col,
        F.coalesce(F.col("canonical_id"), F.col(id_col)).alias("canonical_id"),
        (
            F.coalesce(F.col("canonical_id"), F.col(id_col)) == F.col(id_col)
        ).alias("is_canonical"),
    )


# ------------------------------------------------- paragraph-level exact
def paragraph_dedup(
    docs: DataFrame,
    sep: str = "\n\n",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Paragraph-level exact dedup (the C4 / RefinedWeb ingest stage): split
    each doc on ``sep``, keep only the globally FIRST occurrence of every
    byte-identical paragraph, and reassemble each doc from its surviving
    paragraphs in original order. "First" = smallest (doc id, paragraph
    index) over the whole corpus, so the output is deterministic and
    repeated boilerplate (headers, footers, license blocks) survives exactly
    once — in the earliest doc that carries it.

    Returns one row per input doc: (id_col, n_paras, n_kept, text_col) —
    ``text_col`` is the reassembled text ('' when every paragraph was seen
    earlier; callers typically drop those rows or gate on
    ``n_kept / n_paras``).

    Physical plan, in scale order: paragraphs are exploded once and hashed
    to a 16-byte md5 key; the first-occurrence election is a groupBy-min on
    that key — map-side partial aggregation, so the boilerplate-hot key
    (millions of copies of one footer at corpus scale, THE expected skew
    here) is combined per-partition before the shuffle. A window
    (row_number over hash) would sort every copy of the hot paragraph on
    one reducer instead; that's why it's groupBy+join-back rather than the
    one-shuffle window. The join-back is 1-row-per-hash against the
    exploded table (no blowup); a keep-flag then lets ONE aggregation on
    doc id produce counts and the rebuilt text together (collect_list
    ignores the NULLed-out dropped paragraphs; array_sort on (idx, para)
    structs restores original order — collect_list order is not
    deterministic). Three exchanges total; nothing is driver-resident.
    """
    # split takes a REGEX — escape the separator so sep="|" or "..." splits
    # on the literal string it reassembles with (re.escape output is valid
    # Java regex: backslash-escaped punctuation is literal there too)
    paras = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(
            F.split(
                F.coalesce(F.col(text_col), F.lit("")), F.lit(re.escape(sep)), -1
            )
        ).alias("_idx", "_para"),
    ).withColumn("_h", F.md5(F.col("_para")))
    firsts = paras.groupBy("_h").agg(
        F.min(F.struct("_id", "_idx")).alias("_first")
    )
    flagged = paras.join(firsts, "_h").withColumn(
        "_keep",
        (F.col("_id") == F.col("_first._id"))
        & (F.col("_idx") == F.col("_first._idx")),
    )
    return flagged.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.col("_keep").cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"), F.struct("_idx", "_para"))
                    )
                ),
                lambda s: s["_para"],
            ),
            sep,
        ).alias(text_col),
    ).withColumnRenamed("_id", id_col)


def span_windows(
    docs: DataFrame,
    span_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (id, wins array<string>): every consecutive ``span_tokens``-token
    window of each doc under the canonical tokenizer (token_arrays) —
    len(toks) - span_tokens + 1 windows, or [] for shorter docs. Pure
    Column expressions (transform/sequence/slice/concat_ws), no UDF."""
    if span_tokens < 2:
        raise ValueError("span_tokens must be >= 2")
    L = int(span_tokens)
    toks = token_arrays(docs, id_col=id_col, text_col=text_col)
    return toks.select(
        "id",
        F.when(
            F.size("toks") >= L,
            F.expr(
                f"transform(sequence(1, size(toks) - {L} + 1), "
                f"i -> concat_ws(' ', slice(toks, i, {L})))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("wins"),
    )


def duplicate_spans(
    docs: DataFrame,
    span_tokens: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Span-level (substring) duplication stats — the fingerprint-window
    approximation of suffix-array substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a window
    is DUPLICATED when its exact ``span_tokens``-token text occurs in at
    least ``min_df`` distinct documents; a doc's dup_fraction is the share
    of its window positions that are duplicated (in-doc repeats of a
    cross-doc span all count — they'd all be cut by the span remover).

    Returns (doc_id, n_windows, n_dup_windows, dup_fraction) for every
    tokenizable doc. Exact for the window granularity (every duplicated
    run of >= span_tokens tokens is detected; shorter overlaps are not —
    the standard recall/window-length trade).

    Scale shape: windows explode to O(total tokens) rows — one map-side
    stage; the span-df aggregation is one shuffle with partial
    count-distinct (boilerplate-hot spans combine map-side); the hot-span
    membership join keys on the md5 and the per-doc rollup is the last
    shuffle. No window functions, no driver state, no all-pairs join
    anywhere — corpus-linear at 100 TB.
    """
    if min_df < 2:
        raise ValueError("min_df must be >= 2 (a span is its own 1st copy)")
    from pagerank_spark import util as _util

    # tokenize+window ONCE: wins feeds the df aggregation, the per-doc
    # rollup, and the hint gate, so it is cached for the operator's
    # lifetime (spills to disk at corpus scale) instead of re-running the
    # most expensive stage per consumer
    wins = span_windows(docs, span_tokens, id_col, text_col).persist()
    n_windows_total = int(
        wins.agg(F.sum(F.size("wins"))).first()[0] or 0
    )
    ex = wins.select("id", F.explode("wins").alias("w")).select(
        "id", F.md5("w").alias("h")
    )
    span_df = ex.groupBy("h").agg(F.count_distinct("id").alias("df"))
    hot = span_df.filter(F.col("df") >= min_df).select("h")
    # the hot-span side is bounded by TOTAL WINDOWS (every window can be
    # duplicated — boilerplate-heavy corpora approach that bound), so the
    # never-auto-broadcast gate keys on the window count, not the doc count
    if n_windows_total > _util.BROADCAST_SAFE_ROWS:
        hot = hot.hint("shuffle_hash")
    per_doc = (
        ex.join(hot, "h", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    out = (
        wins.select("id", F.size("wins").cast("long").alias("n_windows"))
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.when(
                F.col("n_windows") > 0,
                F.coalesce("n_dup_windows", F.lit(0))
                / F.col("n_windows").cast("double"),
            )
            .otherwise(0.0)
            .alias("dup_fraction"),
        )
    )
    out = out.localCheckpoint(eager=True)
    wins.unpersist()
    return out


def duplicate_span_table(
    docs: DataFrame,
    span_tokens: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The duplicated spans themselves: (span, df) for every exact
    ``span_tokens``-token window occurring in >= ``min_df`` distinct docs
    — the boilerplate catalog a span-removal pass consumes. Same plan as
    :func:`duplicate_spans` up to the df aggregation (keyed on the span
    text so the output is human-auditable; the stats variant keys on md5)."""
    if min_df < 2:
        raise ValueError("min_df must be >= 2")
    wins = span_windows(docs, span_tokens, id_col, text_col)
    ex = wins.select("id", F.explode("wins").alias("span"))
    return (
        ex.groupBy("span")
        .agg(F.count_distinct("id").alias("df"))
        .filter(F.col("df") >= min_df)
    )


def remove_duplicate_spans(
    docs: DataFrame,
    span_tokens: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The removal stage of span-level dedup (Lee et al. 2022 §3 "we remove
    the duplicated substring"): every token position covered by ANY
    cross-doc duplicated window (df >= min_df) is dropped, survivors are
    reassembled in order. Overlapping hot windows merge naturally (a
    position is dropped if any window covers it). Returns
    (doc_id, n_tokens, n_removed, text) with ``text`` rebuilt from the
    kept tokens (single-space joined — the canonical tokenizer already
    collapsed whitespace/punctuation); docs with no hot window pass
    through with n_removed = 0.

    Plan: the duplicate_spans flag stage (explode + partial-agg shuffle +
    semi-join) reduced to hot window STARTS per doc (collect_list of a
    bounded-by-doc-length array), then a map-only rebuild: covered(pos) =
    any start in [pos-L+1, pos] — evaluated with JVM higher-order
    functions (exists/filter), no UDF. Nothing beyond the stats variant's
    shuffles; the start lists live per-row, never on the driver.
    """
    if min_df < 2:
        raise ValueError("min_df must be >= 2")
    from pagerank_spark import util as _util

    L = int(span_tokens)
    # ONE tokenize pass: windows derive from the cached token arrays (the
    # previous shape tokenized twice — once for toks, once inside
    # span_windows), and the cache also feeds the final rebuild join
    toks = token_arrays(docs, id_col=id_col, text_col=text_col).persist()
    wins = toks.select(
        "id",
        F.when(
            F.size("toks") >= L,
            F.expr(
                f"transform(sequence(1, size(toks) - {L} + 1), "
                f"i -> concat_ws(' ', slice(toks, i, {L})))"
            ),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("wins"),
    )
    n_windows_total = int(wins.agg(F.sum(F.size("wins"))).first()[0] or 0)
    ex = wins.select("id", F.posexplode("wins").alias("start", "w")).select(
        "id", "start", F.md5("w").alias("h")
    )
    span_df = ex.groupBy("h").agg(F.count_distinct("id").alias("df"))
    hot = span_df.filter(F.col("df") >= min_df).select("h")
    # gate on the hot side's true bound (total windows), as in duplicate_spans
    if n_windows_total > _util.BROADCAST_SAFE_ROWS:
        hot = hot.hint("shuffle_hash")
    starts = (
        ex.join(hot, "h", "left_semi")
        .groupBy("id")
        .agg(F.collect_list("start").alias("starts"))
    )
    joined = toks.join(starts, "id", "left").select(
        "id",
        "toks",
        F.coalesce("starts", F.array().cast("array<int>")).alias("starts"),
    )
    kept = F.filter(
        F.col("toks"),
        lambda tok, pos: ~F.exists(
            F.col("starts"),
            lambda s: (s <= pos) & (pos < s + F.lit(L)),
        ),
    )
    out = joined.select(
        F.col("id").alias(id_col),
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("text"),
    )
    out = out.localCheckpoint(eager=True)
    toks.unpersist()
    return out


def host_boilerplate_spans(
    docs: DataFrame,
    host_col: str = "source",
    span_tokens: int = 8,
    min_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Site-template mining: (host, span, df) for every exact
    ``span_tokens``-token window occurring in >= ``min_df`` distinct docs
    OF THE SAME host — the per-site boilerplate (nav bars, footers, legal
    blurbs) that a template-removal pass strips before dedup/quality
    scoring ever sees it. Cross-host duplicated content (syndication,
    quotes) deliberately does NOT trip this: the count is keyed by
    (host, span).

    Same corpus-linear shape as duplicate_span_table with the host riding
    the explode; the (host, span) aggregation gets map-side partials, so a
    million-page site's footer combines before the shuffle.
    """
    if min_df < 2:
        raise ValueError("min_df must be >= 2")
    wins = span_windows(
        docs.select(id_col, host_col, text_col), span_tokens, id_col, text_col
    )
    hosts = docs.select(F.col(id_col).alias("id"), F.col(host_col).alias("host"))
    from pagerank_spark import util as _util

    if docs.count() > _util.BROADCAST_SAFE_ROWS:
        hosts = hosts.hint("shuffle_hash")
    ex = wins.join(hosts, "id").select("host", "id", F.explode("wins").alias("span"))
    return (
        ex.groupBy("host", "span")
        .agg(F.count_distinct("id").alias("df"))
        .filter(F.col("df") >= min_df)
    )
