"""Corpus-curation operators: Gopher rule filter, deterministic hash
split, token-budget selection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_spark.pipeline.curation import (
    gopher_filter,
    hash_split,
    token_budget_select,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").localCheckpoint(eager=True)


def test_gopher_filter_rules_hand_computed(spark):
    texts = {
        # long enough, english stopwords, clean -> keep
        1: "the cat sat on the mat and it was happy with that " * 5,
        # too short
        2: "tiny doc with the and of stopwords here",
        # no stopwords at all (word salad)
        3: "zxq vbn mlk pqr stu " * 12,
        # numeric tokens -> fails alpha-word fraction
        4: ("the and 123 456 789 012 345 678 901 234 " * 6),
        # heavy duplicate lines -> fails dup-line cap
        5: "the cat sat on the mat and was glad\n" * 40,
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_filter(df, min_tokens=50).collect()
    }
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["ok_tokens"] is False
    assert got[3]["keep"] is False and got[3]["ok_stopwords"] is False
    assert got[4]["ok_alpha_words"] is False
    assert got[5]["ok_dup_lines"] is False and got[5]["ok_top_line"] is False
    # every row is returned, keep == conjunction of the rule columns
    rules = [
        "ok_tokens", "ok_mean_token_len", "ok_alpha_words", "ok_stopwords",
        "ok_dup_lines", "ok_top_line", "ok_bullets",
    ]
    assert set(got) == set(texts)
    for r in got.values():
        assert r["keep"] == all(r[k] for k in rules)


def test_gopher_filter_splits_corpus(spark, docs):
    # the synthetic corpus has ~1 distinct stopword per doc; relax that rule
    out = gopher_filter(docs, min_stopword_hits=1).localCheckpoint(eager=True)
    n = out.count()
    kept = out.where("keep").count()
    assert n == docs.count()
    assert 0 < kept < n  # thresholds are non-degenerate on the corpus


def test_hash_split_deterministic_and_stable_under_growth(spark, docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs).collect()}
    assert a == b
    # adding rows never reassigns existing ones (pure function of id)
    half = docs.where(F.col("doc_id") % 2 == 0)
    c = {r["doc_id"]: r["split"] for r in hash_split(half).collect()}
    assert all(a[k] == v for k, v in c.items())
    # rough proportions on 200 docs: train is the vast majority
    from collections import Counter

    counts = Counter(a.values())
    assert counts["train"] > 0.75 * len(a)
    assert set(counts) <= {"train", "val", "test"}


def test_hash_split_salt_changes_assignment(spark, docs):
    a = {r["doc_id"]: r["bucket"] for r in hash_split(docs).collect()}
    b = {r["doc_id"]: r["bucket"] for r in hash_split(docs, salt="v2").collect()}
    assert any(a[k] != b[k] for k in a)


def test_token_budget_select_greedy_prefix(spark, docs):
    budget = 2000
    sel = token_budget_select(docs, budget_tokens=budget).collect()
    by_lang: dict[str, list] = {}
    for r in sel:
        by_lang.setdefault(r["lang"], []).append(r)
    assert by_lang, "selection is non-empty"
    for lang, rows in by_lang.items():
        rows.sort(key=lambda r: (-r["quality_e6"], r["doc_id"]))
        cum = 0
        for r in rows:
            cum += r["n_tokens"]
            assert r["cum_tokens"] == cum
        assert cum <= budget
    # the selection is the maximal greedy prefix: the best-quality
    # unselected doc per lang would overflow the budget
    all_q = token_budget_select(docs, budget_tokens=10**9).collect()
    sel_ids = {(r["lang"], r["doc_id"]) for r in sel}
    for lang, rows in by_lang.items():
        cum = sum(r["n_tokens"] for r in rows)
        rest = sorted(
            (r for r in all_q if r["lang"] == lang and (lang, r["doc_id"]) not in sel_ids),
            key=lambda r: (-r["quality_e6"], r["doc_id"]),
        )
        if rest:
            assert cum + rest[0]["n_tokens"] > budget


def test_sample_per_key_deterministic_md5_order(spark, docs):
    """Exactly min(k, group size) rows per key, chosen by md5(salt||id)
    order — python twin; salt draws an independent sample; reruns and
    different salt shard counts agree."""
    import hashlib
    from collections import defaultdict

    from pagerank_spark.pipeline.curation import sample_per_key

    rows = docs.select("doc_id", "lang").collect()
    groups = defaultdict(list)
    for r in rows:
        groups[r["lang"]].append(r["doc_id"])
    k = 7
    exp = {}
    for lang, ids in groups.items():
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        for rk, i in enumerate(ranked[:k], start=1):
            exp[(lang, i)] = rk

    got = {
        (r["lang"], r["doc_id"]): r["sample_rank"]
        for r in sample_per_key(docs, "lang", k).select(
            "lang", "doc_id", "sample_rank"
        ).collect()
    }
    assert got == exp

    again = {
        (r["lang"], r["doc_id"]): r["sample_rank"]
        for r in sample_per_key(docs, "lang", k, n_salts=4).select(
            "lang", "doc_id", "sample_rank"
        ).collect()
    }
    assert again == got

    other = {
        (r["lang"], r["doc_id"])
        for r in sample_per_key(docs, "lang", k, salt="v2").select(
            "lang", "doc_id"
        ).collect()
    }
    assert other != set(got)  # independent draw

    with pytest.raises(ValueError):
        sample_per_key(docs, "lang", 0)


def test_corpus_stats_by_exact_matches_numpy(spark, docs):
    import numpy as np

    from pagerank_spark.pipeline.curation import corpus_stats_by

    got = {
        r["key"]: r
        for r in corpus_stats_by(docs, "lang", "n_chars", exact=True).collect()
    }
    rows = docs.select("lang", "n_chars").collect()
    from collections import defaultdict

    by = defaultdict(list)
    for r in rows:
        by[r["lang"]].append(r["n_chars"])
    assert set(got) == set(by)
    for lang, vals in by.items():
        a = np.array(vals, dtype=float)
        g = got[lang]
        assert g["n_docs"] == len(vals)
        assert abs(g["mean_len"] - a.mean()) < 1e-9
        assert abs(g["p50_len"] - np.percentile(a, 50)) < 1e-9
        assert abs(g["p90_len"] - np.percentile(a, 90)) < 1e-9
    # the sketch path runs and lands near the exact one
    approx = {r["key"]: r for r in corpus_stats_by(docs, "lang").collect()}
    for lang in by:
        assert approx[lang]["n_docs"] == got[lang]["n_docs"]


def test_source_diversity_hand_computed(spark):
    from pagerank_spark.pipeline.curation import source_diversity

    rows = [(i, "a" if i < 60 else ("b" if i < 90 else "c"), 10 * (i + 1))
            for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    r = source_diversity(df, "source").first()
    # counts: a=60, b=30, c=10 over 100
    exp_hhi = 0.6**2 + 0.3**2 + 0.1**2
    assert r["n_keys"] == 3
    assert abs(r["hhi"] - exp_hhi) < 1e-12
    assert abs(r["top1_share"] - 0.6) < 1e-12

    rw = source_diversity(df, "source", weight_col="n_tokens").first()
    tot = sum(10 * (i + 1) for i in range(100))
    wa = sum(10 * (i + 1) for i in range(60))
    wb = sum(10 * (i + 1) for i in range(60, 90))
    wc = tot - wa - wb
    exp = (wa / tot) ** 2 + (wb / tot) ** 2 + (wc / tot) ** 2
    assert abs(rw["hhi"] - exp) < 1e-12
    assert abs(rw["top1_share"] - max(wa, wb, wc) / tot) < 1e-12


def test_c4_line_filter_rules(spark):
    from pagerank_spark.pipeline.curation import c4_line_filter

    good = "this line has enough words and ends properly."
    rows = [
        (0, "\n".join([
            good,
            "short line.",                                   # < 5 words
            "no terminal punctuation here at all",           # no punct
            "enable JavaScript to view the full content.",   # marker
            "lorem ipsum dolor sit amet consectetur elit.",  # marker
            "function() { return the thing now please; }",   # brace
            'he said "this quoted line has enough words."',  # quote end ok
        ])),
        (1, good),
        (2, ""),
        (3, good + "\r\n" + "short crlf line.\r\n" + good),  # CRLF corpus
        (4, None),                                            # NULL text
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_lines"], r["n_kept"], r["text"])
           for r in c4_line_filter(docs).collect()}
    assert got[0][0] == 7 and got[0][1] == 2
    assert got[0][2] == good + "\n" + 'he said "this quoted line has enough words."'
    assert got[1] == (1, 1, good)
    assert got[2] == (1, 0, "")
    # CRLF: lines split cleanly (no stray \r kept), short line dropped
    assert got[3] == (3, 2, good + "\n" + good)
    # NULL text behaves like empty, never size(-1)
    assert got[4] == (1, 0, "")
