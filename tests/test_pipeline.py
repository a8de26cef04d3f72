from __future__ import annotations

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_spark.pipeline.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash_pairs,
)
from pagerank_spark.pipeline.similarity import (
    brute_force_topk,
    embedding_cosine_pairs,
    lsh_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # add exact + near duplicates with known structure
    dup = base.limit(5).withColumn("doc_id", F.col("doc_id") + 100000)
    near = (
        base.limit(5)
        .withColumn("doc_id", F.col("doc_id") + 200000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" extra tail token")))
    )
    return base.unionByName(dup).unionByName(near).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").localCheckpoint(eager=True)


def test_exact_dedup(spark, docs):
    res = exact_dedup(docs)
    kept = res.select("keep_id").distinct().count()
    total = docs.count()
    # exactly the 5 planted exact dups collapse
    assert kept == total - 5
    planted = {r["doc_id"]: r["keep_id"] for r in res.filter(F.col("doc_id") >= 100000).filter(F.col("doc_id") < 200000).collect()}
    assert all(k == d - 100000 for d, k in planted.items())


def test_ngram_jaccard_exact_oracle(spark, docs):
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    # python oracle over the same docs
    rows = docs.select("doc_id", "text").collect()
    sh = {r["doc_id"]: shingles(r["text"]) for r in rows}
    exp = {}
    for (a, sa), (b, sb) in itertools.combinations(sorted(sh.items()), 2):
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= 0.5:
            exp[(a, b)] = j
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) < 1e-9
    # the 5 exact-dup pairs are found with jaccard 1.0
    exact_pairs = [(a, b) for (a, b) in got if a < 1000 and b == a + 100000]
    assert len(exact_pairs) == 5
    assert all(abs(got[p] - 1.0) < 1e-12 for p in exact_pairs)


def test_minhash_lsh_finds_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_lsh_pairs(docs, threshold=0.5).collect()
    }
    # exact duplicates must collide in every band with est_jaccard 1.0
    for base_id in [r["doc_id"] for r in docs.filter(F.col("doc_id") < 5).collect()]:
        assert pairs.get((base_id, base_id + 100000)) == 1.0
    # near-dups (tail token added) should be found with high estimate
    near_found = [p for (a, b), p in pairs.items() if b == a + 200000]
    assert len(near_found) >= 4
    assert all(p >= 0.5 for p in near_found)


def test_simhash_finds_exact_dups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_pairs(docs, max_hamming=3).collect()
    }
    for base_id in range(5):
        assert pairs.get((base_id, base_id + 100000)) == 0


def _np_topk(emb_rows, qid, k):
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb_rows}
    q = vecs[qid]
    sims = []
    for nid, v in vecs.items():
        if nid == qid:
            continue
        cos = float(q @ v / (np.linalg.norm(q) * np.linalg.norm(v)))
        sims.append((nid, cos))
    sims.sort(key=lambda t: (-t[1], t[0]))
    return sims[:k]


def test_brute_force_topk_matches_numpy(spark, emb):
    rows = emb.collect()
    queries = emb.filter(F.col("vec_id") < 3)
    got = brute_force_topk(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    for qid in [0, 1, 2]:
        exp = _np_topk(rows, qid, 5)
        mine = sorted(by_q[qid])
        assert [m[1] for m in mine] == [e[0] for e in exp]
        for m, e in zip(mine, exp):
            assert abs(m[2] - e[1]) < 1e-9


def test_lsh_topk_recall(spark, emb):
    dim = len(emb.first()["embedding"])
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, dim=dim, k=5, n_bits=16, n_bands=8).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5  # generous bands -> decent recall on 500 vectors


def test_embedding_cosine_pairs_exact_vs_lsh(spark, emb):
    dim = len(emb.first()["embedding"])
    ex = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(emb, threshold=0.9, exact=True).collect()
    }
    ap = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(
            emb, threshold=0.9, dim=dim, n_bits=16, n_bands=8
        ).collect()
    }
    # approximate is a subset of exact; recall decent at 0.9 threshold
    assert ap <= ex
    if ex:
        assert len(ap) / len(ex) >= 0.5


def test_mulmod61_exact_vs_python_ints():
    from pagerank_spark.pipeline.dedup import _MERSENNE, _mulmod61

    rng = np.random.default_rng(7)
    x = rng.integers(0, _MERSENNE, size=2000, dtype=np.int64).astype(np.uint64)
    y = rng.integers(0, _MERSENNE, size=2000, dtype=np.int64).astype(np.uint64)
    got = _mulmod61(x, y)
    want = np.array(
        [(int(a) * int(b)) % _MERSENNE for a, b in zip(x, y)], dtype=np.uint64
    )
    assert np.array_equal(got, want)
    # edge values
    edge = np.array([0, 1, _MERSENNE - 1, (1 << 32) - 1, 1 << 60], dtype=np.uint64)
    for a in edge:
        for b in edge:
            assert int(_mulmod61(np.array([a]), np.array([b]))[0]) == (
                int(a) * int(b)
            ) % _MERSENNE


def test_ngram_df_cap_keeps_scores_exact(spark, docs):
    """A hot shingle planted in every doc must not change reported pairs when
    the DF cap drops it from candidate generation: every true pair still
    shares non-hot shingles, and scores are recomputed from full arrays."""
    hot = docs.withColumn("text", F.concat(F.lit("common boiler plate "), F.col("text")))
    exact = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(hot, threshold=0.4).collect()
    }
    capped = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(hot, threshold=0.4, max_shingle_df=50).collect()
    }
    assert exact == capped
    assert len(exact) > 0


def test_ngram_df_cap_bounds_candidates(spark):
    """With ONLY a hot shingle shared, the cap must eliminate the f^2 pair
    blowup entirely (0 candidates instead of n*(n-1)/2)."""
    rows = [(i, f"common boiler plate unique{i} filler{i} token{i}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = ngram_jaccard_pairs(df, threshold=0.01).count()
    capped = ngram_jaccard_pairs(df, threshold=0.01, max_shingle_df=10).count()
    assert uncapped > 0
    assert capped == 0


def test_ivf_topk_recall(spark, emb):
    from pagerank_spark.pipeline.similarity import ivf_topk

    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_lists=16, n_probe=6).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5
    # deterministic across invocations
    again = {(r["query_id"], r["neighbor_id"]) for r in
             ivf_topk(emb, queries, k=5, n_lists=16, n_probe=6).collect()}
    assert again == approx_set


def _planted_corpus(spark, emb):
    """emb as doubles + 25 planted near-dup twins at id+1e6 (cos ~0.99998)."""
    base = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    dim = len(base.first()["embedding"])
    planted = base.filter(F.col("vec_id") < 25).select(
        (F.col("vec_id") + F.lit(1_000_000)).alias("vec_id"),
        F.concat(
            F.array(F.col("embedding").getItem(0) + F.lit(0.01)),
            F.slice("embedding", 2, dim - 1),
        ).alias("embedding"),
    )
    return base.unionByName(planted), dim


def test_embedding_pairs_default_shape_finds_all_planted(spark, emb):
    """The scale-safe defaults (128-bit signatures, 8x16-bit bands) must
    still find every planted near-dup pair — equal to the exact twin."""
    base, dim = _planted_corpus(spark, emb)
    ex = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(base, threshold=0.9, exact=True).collect()
    }
    ap = {
        (r["id_a"], r["id_b"])
        for r in embedding_cosine_pairs(base, threshold=0.9, dim=dim).collect()
    }
    assert len(ex) == 25
    assert ap == ex


def test_lsh_topk_planted_twin_equals_exact(spark, emb):
    """lsh_topk's designed regime is high-cosine retrieval: top-1 for each
    planted twin must match brute force exactly at the multi-probe
    wide-band defaults."""
    base, dim = _planted_corpus(spark, emb)
    q = base.filter(F.col("vec_id") >= 1_000_000)
    ex = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_force_topk(base, q, k=1).collect()
    }
    ap = {
        (r["query_id"], r["neighbor_id"])
        for r in lsh_topk(base, q, dim=dim, k=1).collect()
    }
    assert len(ex) == 25
    assert ap == ex


def _clustered_corpus(spark, n_clusters, n_background, dim=64, seed=7):
    """Near-dup clusters (5 vectors each) + random background — near-dup
    DENSITY held constant so doubling the corpus doubles the true pairs."""
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        center = rng.standard_normal(dim)
        for _ in range(5):
            v = center + 0.01 * rng.standard_normal(dim)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    for _ in range(n_background):
        rows.append((vid, [float(x) for x in rng.standard_normal(dim)]))
        vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_lsh_candidate_count_subquadratic(spark):
    """Scale contract of the wide-band shape: doubling a constant-density
    corpus must grow the candidate set ~linearly (measured ~2.6x), never the
    ~4x of the narrow-band shape (whose 4-value bands collapse every band
    into 4 buckets: measured 1884x more candidates at the same n)."""
    from pagerank_spark.pipeline.similarity import lsh_candidate_pairs

    c1 = lsh_candidate_pairs(_clustered_corpus(spark, 100, 1000), 64).count()
    c2 = lsh_candidate_pairs(_clustered_corpus(spark, 200, 2000), 64).count()
    assert c2 / c1 < 3.2, (c1, c2)
    # narrow-band contrast at the smaller n: quadratic candidate blowup
    o1 = lsh_candidate_pairs(
        _clustered_corpus(spark, 100, 1000), 64, n_bits=16, n_bands=8
    ).count()
    assert o1 > 100 * c1, (o1, c1)


def test_simhash_sql_equals_udf(spark, docs):
    """The SQL path (64 per-bit JVM aggregates) and the memoized Arrow UDF
    are independent implementations of the same md5-token SimHash; they must
    agree bit-for-bit, including empty/whitespace/null texts."""
    from pagerank_spark.pipeline.dedup import simhash_signatures

    edge = spark.createDataFrame(
        [(900001, ""), (900002, "   "), (900003, "one"), (900005, None)],
        "doc_id long, text string",
    )
    d = docs.select("doc_id", "text").unionByName(edge)
    s_sql = {r["doc_id"]: r["simhash"] for r in simhash_signatures(d, method="sql").collect()}
    s_udf = {r["doc_id"]: r["simhash"] for r in simhash_signatures(d, method="udf").collect()}
    assert s_sql == s_udf


def test_minhash_md5_python_equals_jvm(spark, docs):
    """hash_fn='md5' (memoized hashlib in the UDF) and 'jvm-md5' (conv over
    md5 hex halves in codegen) must produce identical signatures."""
    from pagerank_spark.pipeline.dedup import minhash_signatures

    m_py = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signatures(docs, hash_fn="md5").collect()}
    m_jvm = {r["doc_id"]: tuple(r["sig"]) for r in minhash_signatures(docs, hash_fn="jvm-md5").collect()}
    assert m_py == m_jvm


def test_canonical_docs_transitive_clusters(spark):
    # pairs (1,2),(2,3) must collapse transitively to canonical 1 even
    # though (1,3) was never scored; untouched docs are their own canonical
    from pagerank_spark.pipeline.dedup import canonical_docs

    docs = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "id_a long, id_b long"
    )
    got = {
        r["doc_id"]: (r["canonical_id"], r["is_canonical"])
        for r in canonical_docs(docs, pairs).collect()
    }
    assert got == {
        0: (0, True), 1: (1, True), 2: (1, False), 3: (1, False),
        4: (4, True), 5: (5, True), 6: (6, True),
        7: (7, True), 8: (8, True), 9: (7, False),
    }


# ------------------------------------------------------ contamination screen
def test_benchmark_contamination_planted(spark):
    from pagerank_spark.pipeline.contamination import benchmark_contamination

    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "a completely different document about spark physical plans"),
            (3, "the quick brown fox jumps over something else entirely today"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog tonight")],
        "bench_id long, text string",
    )
    res = {
        r["doc_id"]: r
        for r in benchmark_contamination(
            corpus, bench, n=3, min_overlap_frac=0.5
        ).collect()
    }
    # expected via the Python shingle twin
    from pagerank_spark.pipeline.dedup import shingles

    bset = shingles("the quick brown fox jumps over the lazy dog tonight", 3)
    for did, text in [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "a completely different document about spark physical plans"),
        (3, "the quick brown fox jumps over something else entirely today"),
    ]:
        s = shingles(text, 3)
        assert res[did]["n_shingles"] == len(s)
        assert res[did]["n_hit"] == len(s & bset)
        assert abs(res[did]["overlap_frac"] - len(s & bset) / len(s)) < 1e-12
        assert res[did]["contaminated"] == (len(s & bset) / len(s) >= 0.5)
    assert 4 not in res  # empty docs have no shingles
    assert res[1]["contaminated"] and not res[2]["contaminated"]


def test_benchmark_contamination_no_overlap(spark):
    from pagerank_spark.pipeline.contamination import benchmark_contamination

    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(9, "one two three four five six seven")], "bench_id long, text string"
    )
    row = benchmark_contamination(corpus, bench, n=3).collect()[0]
    assert row["n_hit"] == 0 and row["overlap_frac"] == 0.0
    assert not row["contaminated"]


def test_benchmark_contamination_broadcasts_small_bench(spark):
    """The pooled benchmark shingle set must arrive via broadcast — the
    corpus side is never shuffled for the probe."""
    from pagerank_spark.pipeline.contamination import benchmark_contamination

    corpus = spark.createDataFrame(
        [(i, f"doc number {i} with some shared words here") for i in range(50)],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(1, "doc number 1 with some shared words here")], "bench_id long, text string"
    )
    df = benchmark_contamination(corpus, bench, n=3)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan


# ----------------------------------------------------------- sessionization
def test_sessionize_planted_gaps(spark):
    from datetime import datetime

    from pagerank_spark.pipeline.sessions import session_stats, sessionize

    def ts(m, us=0):
        return datetime(2024, 1, 1, 0, m, 0, us)

    rows = [
        # user 1: 3 events tight, then a 45-min gap, then 2 more
        (1, 1, ts(0)), (2, 1, ts(5)), (3, 1, ts(10)),
        (4, 1, ts(55)), (5, 1, ts(56)),
        # user 2: single event
        (6, 2, ts(7)),
        # user 3: equal timestamps -> event_id tie-break, same session
        (7, 3, ts(1)), (8, 3, ts(1)),
        # user 4: gap of EXACTLY 1800s is NOT a new session (strict >),
        # 1800s + 1us IS
        (9, 4, ts(0)), (10, 4, ts(30)), (11, 4, datetime(2024, 1, 1, 1, 0, 0, 1)),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    tagged = {
        r["event_id"]: r["session_seq"]
        for r in sessionize(ev, gap_seconds=1800).collect()
    }
    assert tagged == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 1, 7: 1, 8: 1,
                      9: 1, 10: 1, 11: 2}

    stats = {
        (r["user_id"], r["session_seq"]): (r["n_events"], r["duration_us"])
        for r in session_stats(ev, gap_seconds=1800).collect()
    }
    assert stats[(1, 1)] == (3, 10 * 60 * 1_000_000)
    assert stats[(1, 2)] == (2, 60 * 1_000_000)
    assert stats[(2, 1)] == (1, 0)
    assert stats[(3, 1)] == (2, 0)
    assert stats[(4, 1)] == (2, 30 * 60 * 1_000_000)
    assert stats[(4, 2)] == (1, 0)


def test_sessionize_single_shuffle(spark):
    """Sessionization plans exactly one shuffle: the user_id window
    partition also serves the downstream per-session aggregation."""
    from pagerank_spark.pipeline.sessions import session_stats

    ev = spark.read.parquet(f"{SF}/events.parquet")
    df = session_stats(ev)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    import re

    n_exchanges = len(re.findall(r"\(\d+\) Exchange\b", plan))
    assert n_exchanges == 1, plan[:2000]


def test_session_stats_cross_check_builtin_session_window(spark):
    """Independent implementation cross-check: per-user session event
    counts from session_stats equal Spark's built-in session_window
    aggregation on the real events table. (The two differ only when a gap
    EXACTLY equals the threshold — Spark's window is half-open there, ours
    keeps the session — impossible on microsecond event data.)"""
    from pagerank_spark.pipeline.sessions import session_stats

    ev = spark.read.parquet(f"{SF}/events.parquet")
    gap = 6 * 3600
    ours = sorted(
        (r["user_id"], r["n_events"])
        for r in session_stats(ev, gap_seconds=gap).collect()
    )
    builtin = sorted(
        (r["user_id"], r["n"])
        for r in ev.groupBy(
            "user_id", F.session_window("ts", f"{gap} seconds")
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert ours == builtin


# ------------------------------------------------------------------- BM25
def _bm25_py(texts: dict, query: str, k1=1.2, b=0.75):
    import math
    import re as _re

    tok = lambda s: [t for t in _re.split(r"\W+", s.lower()) if t]
    docs = {d: tok(t) for d, t in texts.items() if tok(t)}
    n = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / n
    q_terms = sorted(set(tok(query)))
    df = {t: sum(1 for v in docs.values() if t in v) for t in q_terms}
    out = {}
    for d, toks in docs.items():
        s = 0.0
        for t in q_terms:
            tf = toks.count(t)
            if tf == 0 or df[t] == 0:
                continue
            idf = math.log(1.0 + (float(n) - df[t] + 0.5) / (df[t] + 0.5))
            s = s + idf * (tf * (k1 + 1.0)) / (
                tf + k1 * (1.0 - b + b * len(toks) / avgdl)
            )
        if s > 0.0:
            out[d] = s
    return out


def test_bm25_matches_python_twin(spark):
    from pagerank_spark.pipeline.search import bm25_topk

    texts = {
        1: "spark shuffle exchange plan shuffle shuffle",
        2: "plan audit for the physical plan of a join",
        3: "completely unrelated words about cooking pasta",
        4: "shuffle plan shuffle",
        5: "",
    }
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {r["doc_id"]: (r["score"], r["rank"]) for r in
           bm25_topk(docs, "shuffle plan", k=10).collect()}
    exp = _bm25_py(texts, "shuffle plan")
    assert set(got) == set(exp)
    for d, s in exp.items():
        assert abs(got[d][0] - s) < 1e-9
    ranks = sorted(got.values(), key=lambda t: t[1])
    assert [s for s, _ in ranks] == sorted((s for s, _ in ranks), reverse=True)


def test_bm25_topk_on_documents(spark):
    from pagerank_spark.pipeline.search import bm25_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    top = bm25_topk(docs, "spark shuffle hash join", k=5).collect()
    assert len(top) == 5
    assert [r["rank"] for r in sorted(top, key=lambda r: r["rank"])] == [1, 2, 3, 4, 5]


def test_paragraph_dedup_planted(spark):
    """Global first-occurrence paragraph dedup: boilerplate survives only in
    the earliest (doc_id, idx); in-doc repeats collapse; fully-duplicate
    docs come back empty; original paragraph order is preserved."""
    from pagerank_spark.pipeline.dedup import paragraph_dedup

    rows = [
        (1, "alpha\n\nshared footer\n\nbeta"),
        (2, "shared footer\n\ngamma\n\ngamma"),   # cross-doc + in-doc dup
        (3, "alpha\n\nshared footer"),            # nothing new -> ''
        (4, "delta"),
        (5, None),                                # NULL text -> one '' para
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text"])
        for r in paragraph_dedup(docs).collect()
    }
    assert got[1] == (3, 3, "alpha\n\nshared footer\n\nbeta")
    assert got[2] == (3, 1, "gamma")
    assert got[3] == (2, 0, "")
    assert got[4] == (1, 1, "delta")
    assert got[5] == (1, 1, "")  # the empty paragraph's first occurrence
    assert set(got) == {1, 2, 3, 4, 5}


def test_paragraph_dedup_literal_separator(spark):
    """sep is treated as a LITERAL string even when it contains regex
    metacharacters (split takes a regex; the operator escapes it)."""
    from pagerank_spark.pipeline.dedup import paragraph_dedup

    docs = spark.createDataFrame(
        [(1, "aa|bb|aa"), (2, "bb|cc")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_paras"], r["n_kept"], r["text"])
        for r in paragraph_dedup(docs, sep="|").collect()
    }
    assert got[1] == (3, 2, "aa|bb")
    assert got[2] == (2, 1, "cc")


# ------------------------------------------------------------ crawl frontier
def test_schedule_frontier_exact(spark):
    """Salted two-stage top-k equals the naive single-window schedule on a
    corpus with a deliberately hot host, NULL last-fetch dates, and score
    ties; fetch_order is contiguous 1..k per host."""
    import datetime as dt

    from pagerank_spark.pipeline.frontier import schedule_frontier

    rng = np.random.default_rng(11)
    now = dt.date(2026, 3 + 0, 1)
    rows = []
    for i in range(500):
        host = "hot.example" if i < 200 else f"h{int(rng.integers(0, 12))}.example"
        url = f"https://{host}/p/{i:04d}"
        score = float(rng.integers(1, 50)) / 10.0  # coarse -> many ties
        if rng.random() < 0.3:
            fetched = None
        else:
            fetched = dt.datetime(2026, 1, 1) + dt.timedelta(
                days=int(rng.integers(0, 60))
            )
        rows.append((url, host, score, fetched))
    df = spark.createDataFrame(
        rows, "url string, host string, score double, last_fetch_ts timestamp"
    )
    got = schedule_frontier(
        df, now="2026-03-01", budget_per_host=5, n_salts=4
    ).collect()

    # python twin
    def pri(score, fetched):
        age = 365.0 if fetched is None else float((now - fetched.date()).days)
        return score * (1.0 + age / 30.0)

    from collections import defaultdict

    per_host = defaultdict(list)
    for url, host, score, fetched in rows:
        per_host[host].append((url, pri(score, fetched)))
    exp = {}
    for host, items in per_host.items():
        items.sort(key=lambda t: (-t[1], t[0]))
        for k, (url, p) in enumerate(items[:5], start=1):
            exp[(host, url)] = (p, k)

    assert len(got) == len(exp)
    for r in got:
        p, k = exp[(r["host"], r["url"])]
        assert abs(r["priority"] - p) < 1e-9
        assert r["fetch_order"] == k

    # determinism across runs (different salt layout must not matter)
    again = schedule_frontier(df, now="2026-03-01", budget_per_host=5, n_salts=16)
    assert sorted((r["host"], r["url"], r["fetch_order"]) for r in again.collect()) \
        == sorted((r["host"], r["url"], r["fetch_order"]) for r in got)

    with pytest.raises(ValueError):
        schedule_frontier(df, now="2026-03-01", budget_per_host=0)


# -------------------------------------------------------------- span dedup
def test_duplicate_spans_planted(spark):
    """Hand-planted corpus: a shared 10-token boilerplate block is flagged
    in every doc carrying it (including an in-doc double copy), unique text
    is not, and short docs get n_windows=0."""
    from pagerank_spark.pipeline.dedup import (
        duplicate_span_table,
        duplicate_spans,
        span_windows,
    )

    boiler = "the quick brown fox jumps over the lazy sleeping dog"  # 10 toks
    uniq = lambda i: " ".join(f"u{i}w{j}" for j in range(10))
    rows = [
        (0, boiler + " " + uniq(0)),        # boiler once + unique tail
        (1, uniq(1) + " " + boiler),        # boiler once, prefixed
        (2, boiler + " " + boiler),         # boiler twice in one doc
        (3, uniq(3)),                       # fully unique
        (4, "too short"),                   # < span_tokens
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    L = 10
    got = {
        r["doc_id"]: (r["n_windows"], r["n_dup_windows"], r["dup_fraction"])
        for r in duplicate_spans(docs, span_tokens=L).collect()
    }

    # python twin
    import re as _re
    from collections import defaultdict

    tok = lambda s: [t for t in _re.split(r"\W+", s.lower()) if t]
    winset = {}
    for d, t in rows:
        ts = tok(t)
        winset[d] = [" ".join(ts[i : i + L]) for i in range(len(ts) - L + 1)]
    df = defaultdict(set)
    for d, ws in winset.items():
        for w in ws:
            df[w].add(d)
    exp = {}
    for d, ws in winset.items():
        nd = sum(1 for w in ws if len(df[w]) >= 2)
        exp[d] = (len(ws), nd, nd / len(ws) if ws else 0.0)
    assert set(got) == set(exp)
    for d in exp:
        assert got[d][0] == exp[d][0] and got[d][1] == exp[d][1], d
        assert abs(got[d][2] - exp[d][2]) < 1e-12

    # the planted block itself survives in the span table with df >= 2
    spans = {r["span"]: r["df"] for r in duplicate_span_table(docs, span_tokens=L).collect()}
    assert spans[boiler] == 3  # docs 0, 1, 2
    assert all(boiler_tok in s for s in spans for boiler_tok in ())  # no-op guard
    # every flagged span really is cross-doc
    assert all(v >= 2 for v in spans.values())

    # sanity: windows of a 20-token doc number 11
    w0 = span_windows(docs, L).filter(F.col("id") == 0).first()["wins"]
    assert len(w0) == 11

    with pytest.raises(ValueError):
        duplicate_spans(docs, span_tokens=1)
    with pytest.raises(ValueError):
        duplicate_spans(docs, min_df=1)


def test_phrase_search_exact_and_overlapping(spark):
    from pagerank_spark.pipeline.search import phrase_search, positional_postings

    rows = [
        (0, "spark shuffle hash join beats sort merge join"),
        (1, "shuffle hash xyz join"),                      # not adjacent
        (2, "a shuffle hash join and a shuffle hash join"),  # two matches
        (3, "hash shuffle join"),                            # wrong order
        (4, "aa aa aa aa"),                                  # overlapping
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, "Shuffle, HASH join!").collect()}
    assert got == {0: 1, 2: 2}
    ov = {r["doc_id"]: r["n_matches"] for r in phrase_search(docs, "aa aa").collect()}
    assert ov == {4: 3}
    single = {r["doc_id"]: r["n_matches"] for r in phrase_search(docs, "join").collect()}
    assert single == {0: 2, 1: 1, 2: 2, 3: 1}
    assert positional_postings(docs).filter("doc_id = 4").count() == 4
    with pytest.raises(ValueError):
        phrase_search(docs, "!!!")


def test_remove_duplicate_spans_rebuild(spark):
    """Removal twin: every token position covered by a cross-doc duplicated
    window is dropped, overlapping windows merge, unique docs pass through
    untouched."""
    from pagerank_spark.pipeline.dedup import remove_duplicate_spans

    boiler = "the quick brown fox jumps over the lazy sleeping dog"
    uniq = lambda i: " ".join(f"u{i}w{j}" for j in range(10))
    rows = [
        (0, boiler + " " + uniq(0)),
        (1, uniq(1) + " " + boiler),
        (2, boiler + " " + boiler),
        (3, uniq(3)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    L = 10
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text"])
        for r in remove_duplicate_spans(docs, span_tokens=L).collect()
    }

    import re as _re
    from collections import defaultdict

    tok = lambda s: [t for t in _re.split(r"\W+", s.lower()) if t]
    winmap = {}
    for d, t in rows:
        ts = tok(t)
        winmap[d] = (ts, [" ".join(ts[i:i + L]) for i in range(len(ts) - L + 1)])
    df = defaultdict(set)
    for d, (_, ws) in winmap.items():
        for w in ws:
            df[w].add(d)
    for d, (ts, ws) in winmap.items():
        covered = set()
        for i, w in enumerate(ws):
            if len(df[w]) >= 2:
                covered.update(range(i, i + L))
        kept = [t for i, t in enumerate(ts) if i not in covered]
        assert got[d] == (len(ts), len(ts) - len(kept), " ".join(kept)), d

    # doc 3 (unique) untouched; boiler-only prefix of doc 0 removed
    assert got[3][1] == 0 and got[3][2] == " ".join(tok(rows[3][1]))
    assert got[0][1] == L and got[0][2] == uniq(0)
    assert got[2][1] == 20 and got[2][2] == ""


def test_pq_topk_recall_and_determinism(spark, emb):
    """PQ+ADC with exact re-rank: recall vs brute force at generous refine,
    deterministic across runs, and the reported cosine is the EXACT value
    (spot-checked vs numpy)."""
    from pagerank_spark.pipeline.similarity import pq_topk

    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = pq_topk(emb, queries, k=5, m_subspaces=8, ks=16, refine=8).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5
    again = {(r["query_id"], r["neighbor_id"]) for r in
             pq_topk(emb, queries, k=5, m_subspaces=8, ks=16, refine=8).collect()}
    assert again == approx_set

    # exact cosine on the reported rows
    rows = emb.collect()
    vecs = {r["vec_id"]: np.array(list(r["embedding"]), dtype=np.float64) for r in rows}
    for r in approx[:10]:
        q, n = vecs[r["query_id"]], vecs[r["neighbor_id"]]
        cos = float(q @ n / (np.linalg.norm(q) * np.linalg.norm(n)))
        assert abs(r["cosine"] - cos) < 1e-9

    with pytest.raises(ValueError):
        pq_topk(emb, queries, ks=1000)


def test_bm25f_matches_python_twin_and_field_weighting(spark):
    """BM25F python twin on a hand corpus; a title hit outweighs the same
    hit in the body under title weight 3; degenerates to plain BM25 when
    only one unit-weight field exists."""
    import math
    import re as _re

    from pagerank_spark.pipeline.search import bm25f_topk, bm25_topk

    rows = [
        (0, "title", "spark shuffle guide"),
        (0, "body", "a long body about joins and aggregation over rows"),
        (1, "title", "cooking recipes"),
        (1, "body", "spark shuffle appears here in the body text only once"),
        (2, "title", "unrelated"),
        (2, "body", "nothing relevant whatsoever in this document at all"),
    ]
    fields = spark.createDataFrame(rows, "doc_id long, field string, text string")
    weights = {"title": 3.0, "body": 1.0}
    got = {r["doc_id"]: r["score"]
           for r in bm25f_topk(fields, "spark shuffle", weights, k=10).collect()}

    tok = lambda s: [t for t in _re.split(r"\W+", s.lower()) if t]
    q = sorted({"spark", "shuffle"})
    docs = {0: {}, 1: {}, 2: {}}
    for d, f, t in rows:
        docs[d][f] = tok(t)
    wtf = {d: {t: sum(weights[f] * fl.count(t) for f, fl in flds.items()) for t in q}
           for d, flds in docs.items()}
    wdl = {d: sum(weights[f] * len(fl) for f, fl in flds.items()) for d, flds in docs.items()}
    n = len(docs)
    avg = sum(wdl.values()) / n
    dfq = {t: sum(1 for d in docs if wtf[d][t] > 0) for t in q}
    exp = {}
    for d in docs:
        s = 0.0
        for t in q:
            if wtf[d][t] == 0:
                continue
            idf = math.log(1.0 + (n - dfq[t] + 0.5) / (dfq[t] + 0.5))
            s += idf * (wtf[d][t] * 2.2) / (wtf[d][t] + 1.2 * (0.25 + 0.75 * wdl[d] / avg))
        if s > 0:
            exp[d] = s
    assert set(got) == set(exp)
    for d in exp:
        assert abs(got[d] - exp[d]) < 1e-12
    assert got[0] > got[1]  # title hit beats body hit

    # single unit-weight field == plain BM25
    body_only = fields.filter(F.col("field") == "body")
    f1 = {r["doc_id"]: r["score"]
          for r in bm25f_topk(body_only, "spark shuffle", {"body": 1.0}).collect()}
    plain = {r["doc_id"]: r["score"]
             for r in bm25_topk(body_only.select("doc_id", "text"), "spark shuffle").collect()}
    assert set(f1) == set(plain)
    for d in f1:
        assert abs(f1[d] - plain[d]) < 1e-12

    with pytest.raises(ValueError):
        bm25f_topk(fields, "!!!", weights)
    with pytest.raises(ValueError):
        bm25f_topk(fields, "spark", {})


def test_retention_cohorts_hand_computed(spark):
    import datetime as dt

    from pagerank_spark.pipeline.sessions import retention_cohorts

    # week of 2026-01-05 (Mon) and following weeks
    mk = lambda d, h=12: dt.datetime(2026, 1, d, h)
    rows = [
        (1, mk(5)), (1, mk(6)),           # u1 cohort w0, active w0 twice
        (1, mk(13)),                      # u1 returns w1
        (2, mk(7)),                       # u2 cohort w0, never returns
        (3, mk(14)), (3, mk(26)),         # u3 cohort w1, returns w3
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {(str(r["cohort_week"]), r["age_weeks"]): r["n_users"]
           for r in retention_cohorts(ev).collect()}
    assert got == {
        ("2026-01-05", 0): 2,   # u1, u2
        ("2026-01-05", 1): 1,   # u1
        ("2026-01-12", 0): 1,   # u3
        ("2026-01-12", 2): 1,   # u3 (w of jan 26 = age 2)
    }


def test_host_boilerplate_spans_keyed_by_host(spark):
    """A footer shared by two docs of host A is flagged for A only; the
    same text appearing once on host B does not flag B (cross-host
    syndication is not a site template)."""
    from pagerank_spark.pipeline.dedup import host_boilerplate_spans

    footer = "copyright two thousand twenty six all rights reserved worldwide inc"
    uniq = lambda i: " ".join(f"u{i}w{j}" for j in range(10))
    rows = [
        (0, "a.com", uniq(0) + " " + footer),
        (1, "a.com", uniq(1) + " " + footer),
        (2, "b.com", uniq(2) + " " + footer),   # only once on b.com
        (3, "b.com", uniq(3)),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r["host"], r["span"]): r["df"]
           for r in host_boilerplate_spans(docs, span_tokens=10).collect()}
    assert got == {("a.com", footer): 2}


def test_keyword_extract_tfidf_twin(spark):
    import math
    import re as _re
    from collections import Counter

    from pagerank_spark.pipeline.search import keyword_extract

    rows = [
        (0, "apple apple banana common common common"),
        (1, "banana cherry common common"),
        (2, "durian common"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["tfidf"])
           for r in keyword_extract(docs, k=2).collect()}

    tok = lambda s: [t for t in _re.split(r"\W+", s.lower()) if t]
    tfs = {d: Counter(tok(t)) for d, t in rows}
    dfc = Counter(t for c in tfs.values() for t in c)
    n = len(rows)
    exp = {}
    for d, c in tfs.items():
        ranked = sorted(
            ((t, tf, tf * math.log(n / dfc[t])) for t, tf in c.items()),
            key=lambda x: (-x[2], x[0]),
        )
        for i, (t, tf, s) in enumerate(ranked[:2], start=1):
            exp[(d, i)] = (t, tf, s)
    assert set(got) == set(exp)
    for key in exp:
        assert got[key][0] == exp[key][0] and got[key][1] == exp[key][1]
        assert abs(got[key][2] - exp[key][2]) < 1e-12
    # 'common' appears in every doc -> idf 0 -> never a top keyword for doc 0
    assert all(got[(0, r)][0] != "common" for r in (1, 2))
