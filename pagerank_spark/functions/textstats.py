"""Text-analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All JVM-side built-ins except the fingerprint
(vectorized NumPy pandas UDF) — no per-row Python UDFs.
"""

from __future__ import annotations

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


_FP_P = np.uint64((1 << 61) - 1)  # Mersenne prime 2^61-1


def _mul257_mod61(h: np.ndarray) -> np.ndarray:
    """h*257 mod 2^61-1 for uint64 arrays with h < 2^61, overflow-free.

    Uses 2^61 ≡ 1 (mod p): h*256 = (h>>53)*2^61 + (h & (2^53-1))*2^8
    ≡ (h>>53) + ((h & mask)<<8). Everything stays under 2^62.
    """
    r = (h >> np.uint64(53)) + ((h & np.uint64((1 << 53) - 1)) << np.uint64(8))
    r = np.where(r >= _FP_P, r - _FP_P, r)
    r = r + h
    return np.where(r >= _FP_P, r - _FP_P, r)


def _poly_hashes(cp: np.ndarray, window: int) -> np.ndarray:
    """All length-`window` rolling polynomial hashes of a code-point array:
    h_j = sum_k cp[j+k] * 257^(window-1-k) mod 2^61-1, vectorized over j
    (Horner over the window offsets: `window` passes, each whole-array)."""
    nw = cp.shape[0] - window + 1
    h = np.zeros(nw, dtype=np.uint64)
    for k in range(window):
        h = _mul257_mod61(h) + cp[k : k + nw]
        h = np.where(h >= _FP_P, h - _FP_P, h)
    return h


def fingerprint_udf(window: int = 8):
    """Rolling-hash (Rabin-Karp style) document fingerprint -> long.

    Winnowing-lite: min of the base-257 mod-(2^61-1) polynomial hash over
    all `window`-codepoint windows; docs shorter than `window` hash the whole
    code-point sequence (empty doc -> 0). Defined over Unicode code points so
    a SQL oracle (DuckDB unicode()+list_reduce Horner on HUGEINT) reproduces
    it exactly; fully vectorized (the Horner runs `window` array passes per
    doc, no per-character Python).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = []
            for text in batch["text"]:
                t = text or ""
                if not t:
                    out.append(0)
                    continue
                cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.uint64
                )
                w = min(window, cp.shape[0])
                out.append(int(_poly_hashes(cp, w).min()))
            yield pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": out})

    return gen


def document_fingerprints(
    docs: DataFrame, window: int = 8, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    ).mapInPandas(fingerprint_udf(window), "doc_id long, fingerprint long")


def repetition_features(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style repetition/layout signals per document (Rae et al.
    2021 §A1.1 "repetition removal" — the filters a pretraining corpus
    runs before dedup): duplicate-line fraction, most-common-line
    fraction, bullet-line fraction, most-common-word-bigram fraction.

    Returns (id_col, n_lines, dup_line_frac, top_line_frac,
    bullet_line_frac, top_bigram_frac); fractions are 0.0 for docs without
    lines/bigrams. Lines are newline-split, whitespace-trimmed (full \\s
    class, not just spaces — tab-only lines are blank), empties dropped;
    bigrams come from the engine's shared tokenizer (``tokens_col``).

    Physical shape: the line/bigram modes need within-doc grouping, which
    no array expression does in linear time, so both go explode ->
    groupBy(doc, item) -> groupBy(doc) — two linear shuffles per signal on
    O(total lines)/O(total tokens) rows (the O(L^2) array-lambda
    alternative is a per-row compute bomb on long documents). The final
    assembly is two left joins against O(docs) aggregates.
    """
    did = F.col(id_col)
    lines = F.filter(
        F.transform(
            F.split(F.col(text_col), "\n"),
            lambda x: F.regexp_replace(x, r"^\s+|\s+$", ""),
        ),
        lambda x: x != "",
    )
    base = docs.select(
        did.alias("_id"),
        lines.alias("_lines"),
        tokens_col(F.col(text_col)).alias("_toks"),
    )

    lc = (
        base.select("_id", F.explode("_lines").alias("line"))
        .groupBy("_id", "line")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    line_stats = lc.groupBy("_id").agg(
        F.sum("n").alias("n_lines"),
        F.count(F.lit(1)).alias("n_distinct_lines"),
        F.max("n").alias("top_line_n"),
        F.sum(
            F.when(F.substring("line", 1, 1).isin("-", "*", "•"), F.col("n"))
            .otherwise(0)
        ).alias("bullet_n"),
    )

    bigrams = F.when(
        F.size("_toks") >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size("_toks") - 2),
            lambda i: F.concat(
                F.element_at("_toks", i + 1), F.lit(" "), F.element_at("_toks", i + 2)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bc = (
        base.select("_id", F.explode(bigrams).alias("bg"))
        .groupBy("_id", "bg")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    bigram_stats = bc.groupBy("_id").agg(
        F.sum("n").alias("n_bigrams"), F.max("n").alias("top_bigram_n")
    )

    out = (
        base.select("_id")
        .join(line_stats, "_id", "left")
        .join(bigram_stats, "_id", "left")
    )
    nl = F.coalesce(F.col("n_lines"), F.lit(0))
    return out.select(
        F.col("_id").alias(id_col),
        nl.cast("long").alias("n_lines"),
        F.when(
            nl > 0,
            (nl - F.coalesce(F.col("n_distinct_lines"), F.lit(0))).cast("double") / nl,
        )
        .otherwise(0.0)
        .alias("dup_line_frac"),
        F.when(nl > 0, F.coalesce(F.col("top_line_n"), F.lit(0)).cast("double") / nl)
        .otherwise(0.0)
        .alias("top_line_frac"),
        F.when(nl > 0, F.coalesce(F.col("bullet_n"), F.lit(0)).cast("double") / nl)
        .otherwise(0.0)
        .alias("bullet_line_frac"),
        F.when(
            F.coalesce(F.col("n_bigrams"), F.lit(0)) > 0,
            F.coalesce(F.col("top_bigram_n"), F.lit(0)).cast("double")
            / F.col("n_bigrams"),
        )
        .otherwise(0.0)
        .alias("top_bigram_frac"),
    )


# ------------------------------------------------------------------ PII scan
# Patterns restricted to the Java-regex ∩ RE2 common dialect (no lookaround,
# no backreferences) so the DuckDB oracle runs the IDENTICAL strings —
# leftmost non-overlapping match enumeration agrees between engines.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9\-]+(\.[A-Za-z0-9\-]+)+",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+\d{1,2}[ \-]\d{3}[ \-]\d{3}[ \-]\d{4}",
}


def pii_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds per-doc PII match counts (n_email, n_ipv4, n_phone) and
    ``has_pii`` — the screening stage a pretraining pipeline runs before
    release. Pure Column expressions (regexp_extract_all), JVM-side,
    map-only plan."""
    out = docs
    for name, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0))),
        )
    cols = [F.col(f"n_{name}") for name in PII_PATTERNS]
    total = cols[0]
    for c in cols[1:]:
        total = total + c
    return out.withColumn("has_pii", total > 0)


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replaces every PII match in ``text_col`` with a typed placeholder
    (``<EMAIL>``/``<IPV4>``/``<PHONE>``) in a new ``redacted`` column.
    Email first: an address would otherwise leave its domain behind after
    IP redaction of dotted-quad-looking hosts."""
    red = F.col(text_col)
    for name, pat in PII_PATTERNS.items():
        red = F.regexp_replace(red, pat, f"<{name.upper()}>")
    return docs.withColumn("redacted", red)


def unigram_surprisal(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Corpus-self-trained unigram LM quality signal: per-document mean
    token surprisal −(1/n)·Σ ln p(tok), with p estimated from the SAME
    corpus under Lidstone smoothing ``p(t) = (c(t) + α) / (N + α·(V+1))``
    (the +1 reserves mass for unseen tokens, keeping the estimate proper).

    Gibberish/boilerplate separates cleanly: rare-token soup scores high
    surprisal, a doc of nothing but the corpus's hottest tokens scores low
    — the cheap stand-in for the KenLM-perplexity filter of CCNet/Gopher
    when no external LM can ship with the job.

    Returns (doc_id, n_tokens, mean_surprisal) for tokenizable docs.

    Scale shape: token explode (map-only) → unigram counts (one shuffle,
    map-side combine absorbs the Zipf head) → count join keyed on the
    token (the hot "the" key is ONE row on the count side — hash join
    replication, no skewed aggregation) → per-doc mean (one shuffle).
    Corpus-linear, no UDFs, no driver state; the two scalars (N, V) are
    one tiny aggregate action.
    """
    from pagerank_spark.pipeline.dedup import token_arrays

    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    toks = token_arrays(docs, id_col=id_col, text_col=text_col)
    # tokenize+explode ONCE: the exploded stream feeds both the unigram
    # counts and the scoring join, so cache it for the operator's lifetime
    # (spills past memory); counts (O(vocab)) checkpoint so the scalar
    # action doesn't leave a second aggregation in the join's lineage
    ex = toks.select("id", F.explode("toks").alias("tok")).persist()
    counts = (
        ex.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=True)
    )
    row = counts.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    ).first()
    n_total, vocab = int(row["n"] or 0), int(row["v"] or 0)
    denom = float(n_total) + alpha * (vocab + 1)
    surprisal = -F.log((F.col("c") + F.lit(float(alpha))) / F.lit(denom))
    out = (
        ex.join(counts.select("tok", surprisal.alias("s")), "tok")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.avg("s").alias("mean_surprisal"),
        )
        .localCheckpoint(eager=True)
    )
    ex.unpersist()
    return out
