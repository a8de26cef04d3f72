"""Benchmark-contamination screening: flag training documents whose n-gram
content overlaps an evaluation/benchmark set (the decontamination pass of
GPT-3 appendix C / PaLM / Llama training-data pipelines, public papers).

Nothing in the reference engine covers this; it is a first-class stage of
any 100 TB pretraining-corpus pipeline: before training, every corpus doc
is screened against the union of benchmark texts, and docs with high
n-gram overlap are dropped or quarantined.

Semantics: tokenize and shingle BOTH sides with the engine's dedup
convention (lowercase, split on non-word, distinct word n-grams —
``dedup.shingle_table``); a corpus doc's overlap fraction is

    |shingles(doc) ∩ union_of_benchmark_shingles| / |shingles(doc)|

i.e. containment in the pooled benchmark set (one contaminated doc may mix
several benchmark items; per-item attribution is not needed to drop it).
``contaminated`` = overlap_frac >= min_overlap_frac. With default n=8 a
hit requires an exact 8-token run shared with a benchmark item — the
standard "long n-gram" decontamination regime; lower n / lower threshold
tightens the screen.

Scale shape: the benchmark side is tiny relative to the corpus (thousands
of eval items vs 10^12 docs), so its distinct-shingle set is the classic
broadcast dimension — the corpus-side probe is a map-side semi-join with
NO shuffle of corpus data. Above ``util.BROADCAST_SAFE_ROWS`` distinct
benchmark shingles the join degrades gracefully to a shuffle-hash join
(never a corpus broadcast). The only corpus-wide aggregation is the
per-doc hit count, keyed by doc id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pagerank_spark import util as _util
from pagerank_spark.pipeline.dedup import shingle_table


def benchmark_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_overlap_frac: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, n_shingles, n_hit, overlap_frac, contaminated) for every
    corpus doc with at least one shingle (empty docs can't be contaminated
    and are absent, like every shingle-based operator here).

    ``docs``: the corpus. ``benchmark``: the eval set to screen against.
    """
    corpus_sh = shingle_table(docs, n=n, id_col=id_col, text_col=text_col)
    # the shingle array feeds both the size column and the probe explode —
    # materialize once (same reasoning as ngram_jaccard_pairs)
    corpus_sh = corpus_sh.localCheckpoint(eager=True)
    sizes = corpus_sh.select("id", F.size("sh").alias("n_shingles"))

    bench_sh = (
        shingle_table(benchmark, n=n, id_col=bench_id_col, text_col=bench_text_col)
        .select(F.explode("sh").alias("s"))
        .distinct()
    )
    # benchmark shingles are the small dimension: broadcast while safe,
    # shuffle-hash beyond (never risk an O(corpus) broadcast)
    n_bench = bench_sh.count()
    probe_side = (
        F.broadcast(bench_sh)
        if n_bench <= _util.BROADCAST_SAFE_ROWS
        else bench_sh.hint("shuffle_hash")
    )

    hits = (
        corpus_sh.select("id", F.explode("sh").alias("s"))
        .join(probe_side, "s", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        sizes.join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            "n_shingles",
            F.coalesce("n_hit", F.lit(0)).cast("int").alias("n_hit"),
            (
                F.coalesce("n_hit", F.lit(0)).cast("double")
                / F.col("n_shingles").cast("double")
            ).alias("overlap_frac"),
        )
        .withColumn(
            "contaminated", F.col("overlap_frac") >= F.lit(min_overlap_frac)
        )
    )
