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
