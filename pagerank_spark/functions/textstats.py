"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All JVM-side built-ins except the fingerprint
(vectorized NumPy pandas UDF) — no per-row Python UDFs.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles for the n-gram/stopword heuristic
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "den", "nicht", "ein"],
    "it": ["il", "la", "di", "che", "e", "un", "per", "con", "del", "sono"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "pour", "dans"],
    "es": ["el", "la", "de", "que", "y", "un", "en", "es", "por", "con"],
}


def tokens_col(text: str | Column) -> Column:
    """Whitespace-ish tokenization: split on non-word runs, drop empties."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(F.lower(c), r"\W+"), lambda x: x != "")


def token_count(text: str | Column) -> Column:
    return F.size(tokens_col(text))


def bpe_ish_token_count(text: str | Column) -> Column:
    """Sub-word-ish token count: word pieces + digits + punctuation marks via
    one regexp scan (a cheap proxy for BPE token counts at corpus scale)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(
        F.filter(
            F.split(c, r"(?<=[\s\p{Punct}])|(?=[\s\p{Punct}])"),
            lambda x: F.trim(x) != "",
        )
    )


def language_id(text: str | Column) -> Column:
    """Stopword-profile language ID -> lang code with the highest hit count.

    Deterministic tie-break: profile order en,de,it,fr,es. Pure Column
    expression (array_intersect against each profile's stopword set over the
    doc's distinct tokens).
    """
    toks = F.array_distinct(tokens_col(text))
    scores = [
        (lang, F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))))
        for lang, words in STOPWORDS.items()
    ]
    best = scores[0][1]
    for _, s in scores[1:]:
        best = F.greatest(best, s)
    expr = F.lit("und")
    for lang, s in reversed(scores):
        expr = F.when(s == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features + composite score in [0, 1].

    Features mirror common pretraining-corpus filters: length, mean word
    length, punctuation density, stopword ratio, uppercase ratio.
    """
    c = F.col(text_col)
    toks = tokens_col(c)
    n_toks = F.size(toks)
    all_stop = F.array(
        *[F.lit(w) for words in STOPWORDS.values() for w in words]
    )
    feat = docs.withColumns(
        {
            "n_chars": F.length(c),
            "n_tokens": n_toks,
            "mean_token_len": F.when(
                n_toks > 0,
                F.aggregate(
                    toks, F.lit(0), lambda acc, x: acc + F.length(x)
                ).cast("double")
                / n_toks,
            ).otherwise(F.lit(0.0)),
            "punct_ratio": F.when(
                F.length(c) > 0,
                (
                    F.length(c) - F.length(F.regexp_replace(c, r"[\p{Punct}]", ""))
                ).cast("double")
                / F.length(c),
            ).otherwise(F.lit(0.0)),
            "stopword_ratio": F.when(
                n_toks > 0,
                F.size(F.filter(toks, lambda t: F.array_contains(all_stop, t))).cast(
                    "double"
                )
                / n_toks,
            ).otherwise(F.lit(0.0)),
            "upper_ratio": F.when(
                F.length(c) > 0,
                (
                    F.length(c) - F.length(F.regexp_replace(c, r"[A-Z]", ""))
                ).cast("double")
                / F.length(c),
            ).otherwise(F.lit(0.0)),
        }
    )
    score = (
        F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0)) * 0.3
        + F.when(
            (F.col("mean_token_len") >= 3) & (F.col("mean_token_len") <= 10),
            F.lit(1.0),
        ).otherwise(F.lit(0.0))
        * 0.2
        + F.when(F.col("punct_ratio") <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0)) * 0.2
        + F.least(F.col("stopword_ratio") * F.lit(4.0), F.lit(1.0)) * 0.2
        + F.when(F.col("upper_ratio") <= 0.3, F.lit(1.0)).otherwise(F.lit(0.0)) * 0.1
    )
    return feat.withColumn("quality_score", score)


def fingerprint_udf(window: int = 8):
    """Rolling-hash (Rabin-Karp style) document fingerprint -> long.

    Winnowing-lite: min rolling hash over byte windows; deterministic across
    processes (crc32-based), vectorized per Arrow batch.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for text in batch["text"]:
                b = (text or "").encode("utf-8")
                if len(b) < window:
                    out.append(zlib.crc32(b))
                    continue
                arr = np.frombuffer(b, dtype=np.uint8).astype(np.uint64)
                base = np.uint64(257)
                mod = np.uint64((1 << 61) - 1)
                pw = np.uint64(1)
                for _ in range(window - 1):
                    pw = (pw * base) % mod
                h = np.uint64(0)
                hashes = np.empty(len(arr) - window + 1, dtype=np.uint64)
                for i in range(window):
                    h = (h * base + arr[i]) % mod
                hashes[0] = h
                for i in range(window, len(arr)):
                    h = ((h + mod * base - (arr[i - window] * pw) % mod) % mod) % mod
                    h = (h * base + arr[i]) % mod
                    hashes[i - window + 1] = h
                out.append(int(hashes.min() & np.uint64(0x7FFFFFFFFFFFFFFF)))
            yield pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": out})

    return gen


def document_fingerprints(
    docs: DataFrame, window: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(fingerprint_udf(window), "doc_id long, fingerprint long")
