"""BM25 full-text ranking over the documents table (Robertson/Sparck Jones
probabilistic relevance, public formula) — the retrieval half of a
link-graph search stack (PageRank supplies the authority half).

Tokenization is the engine's standard (lowercase, split non-word) so term
statistics line up with the dedup/textstats operators. Scoring uses the
classic Okapi BM25 with the +1 idf smoothing (Lucene's variant):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    s(d, q) = sum_{t in q} idf(t) * tf * (k1 + 1)
                           / (tf + k1 * (1 - b + b * dl / avgdl))

Scale shape: the query's term list is a literal broadcast; only documents
containing at least one query term are scored (inverted-index semi-join —
never a full-corpus scan of non-matching docs past the tokenize pass), and
the per-doc score aggregation shuffles only the matching postings. Corpus
statistics (N, avgdl, per-term df) are O(1)/O(terms) aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def term_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, term, tf, dl): term frequencies + document length in
    tokens (the inverted-index building block). Tokenization is the shared
    ``dedup.token_arrays`` — the one definition the DuckDB oracles mirror."""
    from pagerank_spark.pipeline.dedup import token_arrays

    toks = token_arrays(docs, id_col=id_col, text_col=text_col).select(
        F.col("id").alias("doc_id"), "toks"
    )
    return (
        toks.select("doc_id", F.size("toks").alias("dl"), F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"), F.first("dl").alias("dl"))
    )


def bm25_topk(
    docs: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """-> (doc_id, score, rank): the top-k BM25 matches for ``query``
    (tokenized the same way as documents; duplicate query terms count
    once). Deterministic tie-break (score desc, doc_id asc)."""
    q_terms = sorted(
        {t for t in __import__("re").split(r"\W+", query.lower()) if t}
    )
    if not q_terms:
        raise ValueError("bm25_topk needs a query with at least one token")

    postings = term_postings(docs, id_col, text_col).localCheckpoint(eager=True)
    # exact integer corpus stats -> avgdl mirrors the SQL oracle's
    # CAST(SUM(dl) AS DOUBLE)/COUNT op-for-op: round the exact integer sum
    # to double FIRST, then one division (a float AVG would sum in
    # partition-dependent order; Python int/int would round once and drift
    # from the SQL past 2^53 total tokens)
    stats = (
        postings.select("doc_id", "dl")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n"), F.sum("dl").alias("total_dl"))
        .first()
    )
    n_docs = int(stats["n"])
    avgdl = float(int(stats["total_dl"])) / n_docs

    hits = postings.filter(F.col("term").isin(q_terms))
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    per_term = hits.join(F.broadcast(dfreq), "term").withColumn(
        "s",
        idf
        * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
        / (
            F.col("tf").cast("double")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / F.lit(avgdl))
        ),
    )
    # fixed-order cross-term sum: each term appears at most once per doc, so
    # the conditional aggregates are exact single values and the final chain
    # adds them in the query's sorted term order — deterministic doubles
    # (a plain SUM over terms would add in partition order)
    pivoted = per_term.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("s"))).alias(f"s_{i}")
            for i, t in enumerate(q_terms)
        ]
    )
    score = F.coalesce(F.col("s_0"), F.lit(0.0))
    for i in range(1, len(q_terms)):
        score = score + F.coalesce(F.col(f"s_{i}"), F.lit(0.0))
    scored = pivoted.select("doc_id", score.alias("score"))
    # distributed top-k: orderBy+limit compiles to TakeOrderedAndProject
    # (per-partition partial top-k, k rows to the driver) — a global
    # row_number window would funnel EVERY matching doc into one task,
    # a single-executor hotspot on common query terms at corpus scale.
    # The rank window then runs over only the k surviving rows.
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score", "rank"
    )


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """-> (doc_id, term, pos): the positional inverted index (0-based token
    positions under the canonical tokenizer) — phrase/proximity queries'
    building block. Pure posexplode, map-only."""
    from pagerank_spark.pipeline.dedup import token_arrays

    toks = token_arrays(docs, id_col=id_col, text_col=text_col)
    return toks.select(
        F.col("id").alias(id_col), F.posexplode("toks").alias("pos", "term")
    ).select(id_col, "term", "pos")


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact consecutive-phrase match: (doc_id, n_matches) for every doc
    containing the phrase's tokens adjacently, counting every (possibly
    overlapping) start position.

    Classic positional-index conjunction: for an m-term phrase, align the
    m posting streams by joining on (doc, pos − i). Each stream is
    FILTERED to one term before any shuffle — the predicate pushes to the
    posting scan, so the joins move only matching postings, never the
    corpus (the reason search engines store positions in the index rather
    than re-scanning text). Stop-word-heavy phrases keep the hot term's
    stream large; that is inherent to phrase search and still
    corpus-linear. m−1 co-partitioned joins on the same (id, p) key =
    one exchange per stream.
    """
    import re as _re

    terms = [t for t in _re.split(r"\W+", phrase.lower()) if t]
    if not terms:
        raise ValueError("phrase has no tokens under the canonical tokenizer")
    post = positional_postings(docs, id_col=id_col, text_col=text_col)
    streams = [
        post.filter(F.col("term") == t).select(
            F.col(id_col), (F.col("pos") - F.lit(i)).alias("p")
        )
        for i, t in enumerate(terms)
    ]
    joined = streams[0]
    for s in streams[1:]:
        joined = joined.join(s, [id_col, "p"])
    return joined.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_matches"))


def bm25f_topk(
    fields: DataFrame,
    query: str,
    field_weights: dict[str, float],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    field_col: str = "field",
    text_col: str = "text",
) -> DataFrame:
    """Fielded BM25 (the simple BM25F of Robertson/Zaragoza 2009 §2.4):
    rank docs whose content lives in weighted fields — body text, title,
    and crucially the aggregated ANCHOR TEXT of in-links, the strongest
    web-retrieval field. ``fields`` is long-format (doc_id, field, text);
    term frequencies and doc lengths combine per doc as w_f-weighted sums
    BEFORE one shared saturation::

        wtf(t,d) = Σ_f w_f · tf_{t,d,f}      wdl(d) = Σ_f w_f · dl_{d,f}
        score    = Σ_t idf(t) · wtf·(k1+1) / (wtf + k1·(1−b+b·wdl/avgwdl))

    (weighting INSIDE the saturation is what distinguishes BM25F from
    naively summing per-field BM25 scores — a term stuffed into every
    field still saturates once). idf uses presence in any field.

    Determinism note: with integer-valued weights every wtf/wdl sum is
    exact in doubles regardless of partition order (integers < 2^53 add
    associatively), so the DuckDB oracle matches bit-for-bit; fractional
    weights are supported but order-noise then lands in the last bits
    (covered by the e6 rounding convention). Same physical shape as
    bm25_topk: query-term semi-join before any shuffle, fixed-order
    cross-term sum, TakeOrdered top-k.
    """
    import re as _re

    q_terms = sorted({t for t in _re.split(r"\W+", query.lower()) if t})
    if not q_terms:
        raise ValueError("bm25f_topk needs a query with at least one token")
    if not field_weights:
        raise ValueError("field_weights must be non-empty")

    from pagerank_spark.util import widen_partitions

    w_expr = None
    for name, w in sorted(field_weights.items()):
        cond = F.col(field_col) == name
        w_expr = (
            F.when(cond, float(w)) if w_expr is None else w_expr.when(cond, float(w))
        )
    # ONE tokenize pass: reduce each (doc, field) row to its length and its
    # query-term tokens (tiny arrays) and checkpoint THAT — both the length
    # stats and the hits derive from it without re-tokenizing the corpus
    # (the postings-checkpoint discipline of bm25_topk)
    slim = (
        widen_partitions(fields.select(id_col, field_col, text_col))
        .filter(F.col(field_col).isin(list(field_weights)))
        .select(
            F.col(id_col).alias("doc_id"),
            w_expr.alias("w"),
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\W+"), lambda x: x != ""
            ).alias("toks"),
        )
        .select(
            "doc_id",
            "w",
            F.size("toks").alias("dl_f"),
            F.filter("toks", lambda x: x.isin(q_terms)).alias("qtoks"),
        )
        .localCheckpoint(eager=True)
    )
    wdl = (
        slim.groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("dl_f")).alias("wdl"))
        .filter(F.col("wdl") > 0)
        .localCheckpoint(eager=True)
    )
    stats = wdl.agg(F.count(F.lit(1)).alias("n"), F.sum("wdl").alias("t")).first()
    n_docs = int(stats["n"])
    if n_docs == 0:
        return fields.sparkSession.createDataFrame(
            [], "doc_id long, score double, rank int"
        )
    avgwdl = float(stats["t"]) / n_docs

    hits = (
        slim.select("doc_id", "w", F.explode("qtoks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.sum("w").alias("wtf"))
    )
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    per_term = (
        hits.join(F.broadcast(dfreq), "term")
        .join(wdl, "doc_id")
        .withColumn(
            "s",
            idf
            * (F.col("wtf") * F.lit(k1 + 1.0))
            / (
                F.col("wtf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("wdl") / F.lit(avgwdl))
            ),
        )
    )
    pivoted = per_term.groupBy("doc_id").agg(
        *[
            F.sum(F.when(F.col("term") == t, F.col("s"))).alias(f"s_{i}")
            for i, t in enumerate(q_terms)
        ]
    )
    score = F.coalesce(F.col("s_0"), F.lit(0.0))
    for i in range(1, len(q_terms)):
        score = score + F.coalesce(F.col(f"s_{i}"), F.lit(0.0))
    scored = pivoted.select("doc_id", score.alias("score"))
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w)).select(
        "doc_id", "score", "rank"
    )


def keyword_extract(
    docs: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k keywords by tf-idf (idf = ln(N/df), the plain
    unsmoothed form): (doc_id, term, tf, tfidf, rank) — the cheap keyword
    / tag extraction stage of an indexing pipeline, and the feature input
    for cluster labeling.

    Ties break (tfidf desc, term asc) so output is deterministic. The
    per-doc top-k window partitions on doc_id — bounded by a document's
    distinct-term count, so unlike per-host top-k there is no hot-key
    hazard to salt away. Plan: the postings build (one shuffle), the df
    aggregation (one), the df join back (hash on term; the hot "the" term
    is one row on the df side), and the window (one) — corpus-linear.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    from pagerank_spark.util import widen_partitions

    postings = term_postings(docs, id_col, text_col).localCheckpoint(eager=True)
    n_docs = postings.select(id_col).distinct().count()
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = postings.join(dfreq, "term").select(
        id_col,
        "term",
        "tf",
        (
            F.col("tf").cast("double")
            * F.log(F.lit(float(n_docs)) / F.col("df").cast("double"))
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "tfidf", "rank")
    )
