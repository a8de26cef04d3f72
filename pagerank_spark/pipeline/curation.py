"""Corpus-curation operators: the selection stage of a training-data
pipeline, run after cleaning/dedup — rule-based quality filtering (Gopher,
Rae et al. 2021 §A1.1), deterministic hash splits, and token-budget
sampling.

Everything is JVM-side Column expressions / window functions — no Python
UDFs — so each operator is one scan (filter, split) or one shuffle
(budget selection: a window over the stratum key). All are deterministic,
which is what makes them oracle-checkable and makes reruns reproducible
at 100 TB (no RNG state to coordinate across executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pagerank_spark import util as _util

from pagerank_spark.functions.textstats import (
    STOPWORDS,
    quality_features,
    repetition_features,
    tokens_col,
)


def gopher_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_token_len: float = 3.0,
    max_mean_token_len: float = 10.0,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    max_dup_line_frac: float = 0.3,
    max_top_line_frac: float = 0.2,
    max_bullet_line_frac: float = 0.9,
) -> DataFrame:
    """Gopher-style rule filter (Rae et al. 2021 §A1.1 Table A1 defaults):
    per-document boolean columns for each rule plus the conjunction `keep`.

    Rules: token count in [min_tokens, max_tokens]; mean token length in
    [min, max]; ≥ min_alpha_word_frac of tokens contain a letter;
    ≥ min_stopword_hits distinct stop words (union of the engine's
    language profiles); and the repetition caps (duplicate-line /
    top-line / bullet-line fractions from ``repetition_features``).
    The top-line cap only applies to docs with ≥ 2 lines — a single-line
    document's most-common-line fraction is trivially 1.0.

    Keeps every input row (the caller filters on `keep`) so rejection
    reasons are auditable — the shape a curation pipeline needs to report
    per-rule loss rates.

    Physical shape: the token rules are one map-only pass; the repetition
    rules come from repetition_features' explode->groupBy aggregates,
    joined back on id. One scan + the repetition shuffles, nothing O(n²).
    """
    did = F.col(id_col)
    toks = tokens_col(F.col(text_col))
    n_toks = F.size(toks)
    mtl = F.when(
        n_toks > 0,
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)).cast("double")
        / n_toks,
    ).otherwise(F.lit(0.0))
    alpha_frac = F.when(
        n_toks > 0,
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("double") / n_toks,
    ).otherwise(F.lit(0.0))
    all_stop = F.array(
        *[F.lit(w) for words in STOPWORDS.values() for w in words]
    )
    stop_hits = F.size(F.array_intersect(F.array_distinct(toks), all_stop))

    base = docs.select(
        did.alias("_id"),
        n_toks.alias("n_tokens"),
        ((n_toks >= min_tokens) & (n_toks <= max_tokens)).alias("ok_tokens"),
        ((mtl >= min_mean_token_len) & (mtl <= max_mean_token_len)).alias(
            "ok_mean_token_len"
        ),
        (alpha_frac >= min_alpha_word_frac).alias("ok_alpha_words"),
        (stop_hits >= min_stopword_hits).alias("ok_stopwords"),
    )
    rep = repetition_features(docs, id_col=id_col, text_col=text_col).select(
        F.col(id_col).alias("_rid"),
        (F.col("dup_line_frac") <= max_dup_line_frac).alias("ok_dup_lines"),
        (
            (F.col("n_lines") < 2) | (F.col("top_line_frac") <= max_top_line_frac)
        ).alias("ok_top_line"),
        (F.col("bullet_line_frac") <= max_bullet_line_frac).alias("ok_bullets"),
    )
    out = base.join(rep, base["_id"] == rep["_rid"], "inner").drop("_rid")
    rules = [
        "ok_tokens",
        "ok_mean_token_len",
        "ok_alpha_words",
        "ok_stopwords",
        "ok_dup_lines",
        "ok_top_line",
        "ok_bullets",
    ]
    keep = F.lit(True)
    for r in rules:
        keep = keep & F.col(r)
    return out.select(
        F.col("_id").alias(id_col), "n_tokens", *rules, keep.alias("keep")
    )


def hash_split(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    salt: str = "",
    n_buckets: int = 1_000_000,
) -> DataFrame:
    """Deterministic train/val/test assignment: md5(salt || id) → bucket in
    [0, n_buckets) → split label by cumulative weight thresholds.

    Unlike ``DataFrame.randomSplit`` this is a pure function of the row id:
    re-running on a grown corpus never reassigns an existing document
    (the property a training pipeline needs so incremental crawls don't
    leak validation docs into train), and the same doc lands in the same
    split on every cluster size. The salt makes independent resplits
    possible. Map-only — no shuffle, no RNG.

    Uses the top 15 hex digits (60 bits) of md5 so the value is exact in
    a signed 64-bit long on any engine.
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    total = sum(weights.values())
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % n_buckets
    )
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        cond = F.col("bucket") < int(round(acc * n_buckets))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = items[-1][0]
    split = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return docs.withColumn("bucket", bucket).withColumn("split", split)


def token_budget_select(
    docs: DataFrame,
    budget_tokens: int,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy per-stratum selection under a token budget: rank documents by
    quality (descending, id ascending as the deterministic tie-break) and
    keep each while the stratum's running token total stays ≤ budget.

    This is the "data mixing" step of corpus assembly — e.g. cap every
    language at N tokens, taking the highest-quality documents first.
    Quality is the engine's composite ``quality_score`` discretized to
    1e-6 (so the ordering is integer-stable across engines/precisions).

    Returns (id_col, stratum_col, n_tokens, quality_e6, cum_tokens) for
    the selected docs only.

    Physical shape: quality is a map-only pass; the selection is ONE
    shuffle — a running sum over Window.partitionBy(stratum). Skew note:
    a window partition is one task per stratum, fine when strata are
    languages/domains (hundreds); for high-cardinality strata the same
    shape holds because partitions shrink.
    """
    q = quality_features(docs, text_col=text_col).select(
        F.col(id_col),
        F.col(stratum_col),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(F.col("quality_score") * 1e6).cast("long").alias("quality_e6"),
    )
    w = (
        Window.partitionBy(stratum_col)
        .orderBy(F.col("quality_e6").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        q.withColumn("cum_tokens", F.sum("n_tokens").over(w))
        .where(F.col("cum_tokens") <= budget_tokens)
        .select(id_col, stratum_col, "n_tokens", "quality_e6", "cum_tokens")
    )


def sample_per_key(
    docs: DataFrame,
    key_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "",
    n_salts: int = 32,
) -> DataFrame:
    """Deterministic stratified sample: exactly ``min(k, |group|)`` rows per
    ``key_col`` group, chosen by md5(salt || id) order — the per-host /
    per-domain / per-language down-sampling stage of a pretraining corpus
    (cap any one source's share without an RNG).

    Like :func:`hash_split`, selection is a pure function of the row id:
    the same doc wins on every run, cluster size, and engine (the md5-hex
    ordering reproduces verbatim in SQL), and changing ``salt`` draws an
    independent sample. Each group's members are md5-ranked, i.e. uniform
    without replacement within the group.

    Executed as ``util.salted_top_k`` (two-stage window), so a corpus where
    one host holds 1e8 docs and the median holds 10 — the expected web
    skew — never sorts a whole group on one reducer. Returns the input
    columns plus ``sample_rank`` in 1..k.
    """
    okey = F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    return _util.salted_top_k(
        docs.withColumn("_okey", okey),
        keys=[key_col],
        order=[F.asc("_okey"), F.asc(id_col)],
        k=k,
        salt_expr=F.xxhash64(F.col(id_col).cast("string")),
        n_salts=n_salts,
        rank_col="sample_rank",
    ).drop("_okey")


def corpus_stats_by(
    docs: DataFrame,
    key_col: str = "lang",
    length_col: str = "n_chars",
    exact: bool = False,
) -> DataFrame:
    """Per-group corpus length profile: (key, n_docs, mean_len, p50_len,
    p90_len) — the mixture report a pretraining-data curator reads before
    setting per-language/per-source sampling weights.

    ``exact=False`` (default, the at-scale path) uses
    ``percentile_approx`` — bounded-memory t-digest-style sketch, one
    shuffle with map-side partials, safe when one language holds 1e10
    docs. ``exact=True`` switches to the exact interpolated percentile
    (buffers each group's values — the oracle/validation path; both
    engines define it as linear interpolation so DuckDB's quantile_cont
    reproduces it bit-for-bit at small scale).
    """
    pct = F.percentile if exact else F.percentile_approx
    return docs.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(length_col).alias("mean_len"),
        pct(F.col(length_col), F.lit(0.5)).cast("double").alias("p50_len"),
        pct(F.col(length_col), F.lit(0.9)).cast("double").alias("p90_len"),
    )


def source_diversity(
    docs: DataFrame,
    key_col: str = "source",
    weight_col: str | None = None,
) -> DataFrame:
    """One-row corpus concentration report over ``key_col`` (host, domain,
    source, lang): (n_keys, hhi, top1_share) where hhi is the
    Herfindahl-Hirschman index Σ share² — 1/n for a perfectly even corpus,
    →1 when one source dominates — and shares weight by row count or
    ``weight_col`` (e.g. token counts).

    Deliberately sort-free: a Gini coefficient needs a global sort of the
    per-key aggregates; HHI and max-share are plain aggregates, so the
    whole plan is two partial-aggregated shuffles regardless of key
    cardinality.
    """
    w = F.count(F.lit(1)) if weight_col is None else F.sum(weight_col)
    per = docs.groupBy(key_col).agg(w.cast("double").alias("wt"))
    return per.agg(
        F.count(F.lit(1)).alias("n_keys"),
        (F.sum(F.col("wt") * F.col("wt")) / (F.sum("wt") * F.sum("wt"))).alias("hhi"),
        (F.max("wt") / F.sum("wt")).alias("top1_share"),
    )


def c4_line_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation (. ! ? or a closing double
    quote), have >= ``min_words`` whitespace-separated words, and contain
    none of the boilerplate markers (case-insensitive "javascript",
    "lorem ipsum", or a curly brace — the code/placeholder tells).

    Returns (doc_id, n_lines, n_kept, text) with ``text`` rebuilt from the
    kept lines (newline-joined; empty string when nothing survives). The
    caller drops docs below its sentence threshold — kept separate because
    C4 applies that at the page level.

    Entirely JVM higher-order Column functions over split('\\n') — one
    map-only pass, no shuffle, no UDF; every predicate is in the Java∩RE2
    regex dialect so the DuckDB oracle runs the identical patterns.
    """
    # split on \r?\n (not bare \n): a CRLF corpus would otherwise leave a
    # trailing \r on every line, which Java's $ ignores ('line.\r' KEPT)
    # while RE2/DuckDB's $ does not — silently divergent decisions — and
    # the stray \r would survive into the rebuilt text. NULL text behaves
    # like the empty string (n_lines 1, n_kept 0) instead of size(-1).
    lines = F.split(F.coalesce(F.col(text_col), F.lit("")), r"\r?\n")

    def keep(line):
        t = F.trim(line)
        words = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != ""))
        low = F.lower(t)
        return (
            t.rlike('[.!?"]$')
            & (words >= min_words)
            & ~low.contains("javascript")
            & ~low.contains("lorem ipsum")
            & ~low.contains("{")
        )

    kept = F.filter(lines, keep)
    return docs.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.concat_ws("\n", kept).alias("text"),
    )
