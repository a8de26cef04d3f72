from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pagerank_spark.functions.textstats import (
    document_fingerprints,
    language_id,
    quality_features,
    token_count,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").localCheckpoint(eager=True)


def test_token_count(spark):
    df = spark.createDataFrame(
        [(1, "Hello, world! This is four+two tokens"), (2, ""), (3, "one")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["n"] for r in df.select("doc_id", token_count("text").alias("n")).collect()}
    assert got == {1: 7, 2: 0, 3: 1}


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and it was happy with that"),
            (2, "der hund ist nicht mit der katze und das ist gut"),
            (3, "el perro es un animal que vive en la casa con nosotros"),
            (4, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lang"] for r in df.select("doc_id", language_id("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "es"
    assert got[4] == "und"


def test_quality_features(spark, docs):
    feat = quality_features(docs)
    rows = feat.collect()
    assert all(0.0 <= r["quality_score"] <= 1.0 for r in rows)
    assert all(r["n_chars"] == len(r["text"]) for r in rows)
    # empty doc edge case
    empty = quality_features(
        spark.createDataFrame([(1, "")], "doc_id long, text string")
    ).first()
    assert empty["n_tokens"] == 0 and empty["quality_score"] is not None


def test_fingerprints_deterministic_and_dup_sensitive(spark, docs):
    fp1 = {r["doc_id"]: r["fingerprint"] for r in document_fingerprints(docs).collect()}
    fp2 = {r["doc_id"]: r["fingerprint"] for r in document_fingerprints(docs).collect()}
    assert fp1 == fp2
    # identical text -> identical fingerprint
    dup = docs.limit(3).withColumn("doc_id", F.col("doc_id") + 1000)
    fpd = {
        r["doc_id"]: r["fingerprint"]
        for r in document_fingerprints(docs.limit(3).unionByName(dup)).collect()
    }
    for i in [r["doc_id"] for r in docs.limit(3).collect()]:
        assert fpd[i] == fpd[i + 1000]


def test_fingerprint_matches_pure_python_reference(spark):
    """Vectorized Mersenne rolling hash == naive big-int implementation."""
    P = (1 << 61) - 1

    def ref_fp(text: str, window: int = 8) -> int:
        cps = [ord(c) for c in text]
        if not cps:
            return 0
        w = min(window, len(cps))
        best = None
        for j in range(len(cps) - w + 1):
            h = 0
            for k in range(w):
                h = (h * 257 + cps[j + k]) % P
            best = h if best is None else min(best, h)
        return best

    texts = [
        "",
        "a",
        "short",
        "exactly8",
        "a slightly longer document with words",
        "unicode: caffè ☕ and emoji 🚀 here",
        "aaaaaaaaaaaaaaaaaaaa",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["fingerprint"] for r in document_fingerprints(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == ref_fp(t), f"mismatch for {t!r}"


def test_repetition_features_hand_computed(spark):
    from pagerank_spark.functions.textstats import repetition_features

    texts = {
        # 4 lines, "dup" twice -> n_lines=4, distinct=3, dup=1/4, top=2/4;
        # one bullet line; tokens: dup dup other dup(x? ) compute bigrams below
        1: "dup\ndup\n- item\nother",
        # no newlines, single line; bigram "a b" repeats: a b a b a -> bigrams
        # (a b),(b a),(a b),(b a) -> top 2/4
        2: "a b a b a",
        # empty doc -> all zeros
        3: "",
        # whitespace-only lines dropped
        4: "   \n\t\n",
        # single token -> no bigrams
        5: "word",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in repetition_features(df).collect()}

    r1 = got[1]
    assert r1["n_lines"] == 4
    assert r1["dup_line_frac"] == pytest.approx(1 / 4)
    assert r1["top_line_frac"] == pytest.approx(2 / 4)
    assert r1["bullet_line_frac"] == pytest.approx(1 / 4)
    # tokens: dup dup item other -> bigrams: "dup dup","dup item","item other"
    assert r1["top_bigram_frac"] == pytest.approx(1 / 3)

    r2 = got[2]
    assert r2["n_lines"] == 1
    assert r2["dup_line_frac"] == 0.0
    assert r2["top_line_frac"] == 1.0
    assert r2["bullet_line_frac"] == 0.0
    assert r2["top_bigram_frac"] == pytest.approx(2 / 4)

    for d in (3, 4):
        r = got[d]
        assert r["n_lines"] == 0
        assert (
            r["dup_line_frac"]
            == r["top_line_frac"]
            == r["bullet_line_frac"]
            == r["top_bigram_frac"]
            == 0.0
        )

    r5 = got[5]
    assert r5["n_lines"] == 1 and r5["top_bigram_frac"] == 0.0


def test_repetition_features_detects_boilerplate(spark, docs):
    """A doc that is one line repeated scores dup_line_frac near 1; the
    organic corpus docs stay well below."""
    from pagerank_spark.functions.textstats import repetition_features

    spam = spark.createDataFrame(
        [(10**9, "buy now\n" * 50 + "tail")], "doc_id long, text string"
    )
    feat = repetition_features(docs.select("doc_id", "text").union(spam))
    rows = {r["doc_id"]: r for r in feat.collect()}
    assert rows[10**9]["dup_line_frac"] == pytest.approx(49 / 51)
    assert rows[10**9]["top_line_frac"] == pytest.approx(50 / 51)
    # sanity: every fraction is in [0, 1]
    for r in rows.values():
        for c in ("dup_line_frac", "top_line_frac", "bullet_line_frac", "top_bigram_frac"):
            assert 0.0 <= r[c] <= 1.0


# ------------------------------------------------------------------ PII scan
def test_pii_features_planted(spark):
    from pagerank_spark.functions.textstats import pii_features, redact_pii

    docs = spark.createDataFrame(
        [
            (1, "reach me at alice.smith+news@sub.example.co.uk today"),
            (2, "server at 10.0.0.1 and 192.168.001.255 replied"),
            (3, "call +1 555-123-4567 maybe"),
            (4, "nothing sensitive here, just 3.14 and v1.2.3 strings"),
            (5, "two mails: a@b.io c@d.org and ip 8.8.8.8"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_features(docs).collect()}
    assert (rows[1]["n_email"], rows[1]["n_ipv4"], rows[1]["n_phone"]) == (1, 0, 0)
    assert (rows[2]["n_email"], rows[2]["n_ipv4"], rows[2]["n_phone"]) == (0, 2, 0)
    assert (rows[3]["n_email"], rows[3]["n_ipv4"], rows[3]["n_phone"]) == (0, 0, 1)
    assert (rows[4]["n_email"], rows[4]["n_ipv4"], rows[4]["n_phone"]) == (0, 0, 0)
    assert (rows[5]["n_email"], rows[5]["n_ipv4"]) == (2, 1)
    assert rows[5]["has_pii"] and not rows[4]["has_pii"]

    red = {r["doc_id"]: r["redacted"] for r in redact_pii(docs).collect()}
    assert red[1] == "reach me at <EMAIL> today"
    assert red[2] == "server at <IPV4> and <IPV4> replied"
    assert red[3] == "call <PHONE> maybe"
    assert red[4] == docs.filter(F.col("doc_id") == 4).first()["text"]
    assert "<EMAIL>" in red[5] and "<IPV4>" in red[5]


def test_pii_plan_is_map_only(spark):
    from pagerank_spark.functions.textstats import pii_features

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df = pii_features(docs)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    for py_node in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert py_node not in plan
    assert "Exchange" not in plan


def test_unigram_surprisal_matches_python_lm(spark):
    """Lidstone-smoothed corpus-unigram surprisal equals a python twin, and
    the ordering matches intuition: a doc of corpus-hot tokens scores lower
    than a doc of singletons."""
    import math
    import re as _re
    from collections import Counter

    from pagerank_spark.functions.textstats import unigram_surprisal

    rows = [
        (0, "the cat sat on the mat and the dog sat too"),
        (1, "the the the the cat cat dog on and mat"),
        (2, "zyxgrobble flumwort quizzacious brillig slithy toves"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["mean_surprisal"])
        for r in unigram_surprisal(docs).collect()
    }

    tok = lambda s: [t for t in _re.split(r"\W+", s.lower()) if t]
    alltoks = [t for _, s in rows for t in tok(s)]
    c = Counter(alltoks)
    N, V, a = len(alltoks), len(c), 0.5
    p = lambda t: (c[t] + a) / (N + a * (V + 1))
    exp = {}
    for d, s in rows:
        ts = tok(s)
        if ts:
            exp[d] = (len(ts), -sum(math.log(p(t)) for t in ts) / len(ts))
    assert set(got) == set(exp)  # empty doc dropped by the tokenizer
    for d in exp:
        assert got[d][0] == exp[d][0]
        assert abs(got[d][1] - exp[d][1]) < 1e-12
    assert got[1][1] < got[0][1] < got[2][1]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        unigram_surprisal(docs, alpha=0.0)
