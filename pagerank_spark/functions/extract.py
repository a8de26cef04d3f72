"""HTML out-link + text extraction as vectorized Arrow pandas UDFs.

Per BASELINE.json input_hint: no per-row Python UDFs — these are
``pandas_udf`` (Arrow batch transfer, one Python invocation per ~64k rows).
The regex work inside each batch is plain CPython over the batch's strings,
which is the Arrow-UDF execution model; there is no Spark row-at-a-time serde.

The extraction spec is the layout contract in
pagerank_spark.sources.pages.page_content: per-row invariant, the extracted
``text`` is byte-identical to the generator's ``text`` column (tested in
tests/test_extract.py). ``extract_text_reference`` is the pure-Python
reference implementation the UDF must agree with.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_TITLE_RE = re.compile(r"<title>(.*?)</title>", re.S)
_PARA_RE = re.compile(r"<p>(.*?)</p>", re.S)
_ANCHOR_RE = re.compile(r'<a href="(.*?)">(.*?)</a>', re.S)


def extract_text_reference(html: bytes) -> str:
    """Pure-Python reference extractor (the byte-identity oracle)."""
    s = html.decode("utf-8")
    title = _TITLE_RE.search(s)
    parts = [title.group(1)] if title else []
    parts += _PARA_RE.findall(s)
    parts += [a[1] for a in _ANCHOR_RE.findall(s)]
    return "\n".join(parts)


def extract_links_reference(html: bytes) -> list[str]:
    return [a[0] for a in _ANCHOR_RE.findall(html.decode("utf-8"))]


@F.pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_text_reference)


@F.pandas_udf(ArrayType(StringType()))
def extract_links_udf(html: pd.Series) -> pd.Series:
    return html.map(extract_links_reference)


def extract_outlinks(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> (src_url, dst_url), one row per anchor.

    explode happens JVM-side after the Arrow UDF returns the array column, so
    link fan-out never passes through Python row-at-a-time.
    """
    return (
        pages.select("url", extract_links_udf(F.col("html")).alias("links"))
        .select(F.col("url").alias("src_url"), F.explode("links").alias("dst_url"))
    )


def extract_text(pages: DataFrame) -> DataFrame:
    """pages -> (url, text) with text recomputed from html."""
    return pages.select("url", extract_text_udf(F.col("html")).alias("text"))


def extract_anchor_pairs_reference(html: bytes) -> list[tuple[str, str]]:
    """(href, anchor_text) pairs — the reference for the anchor UDF."""
    return [(a[0], a[1]) for a in _ANCHOR_RE.findall(html.decode("utf-8"))]


@F.pandas_udf(ArrayType(StructType([
    StructField("href", StringType()),
    StructField("anchor", StringType()),
])))
def extract_anchor_pairs_udf(html: pd.Series) -> pd.Series:
    return html.map(
        lambda h: [
            {"href": href, "anchor": anchor}
            for href, anchor in extract_anchor_pairs_reference(h)
        ]
    )


def extract_anchors(pages: DataFrame) -> DataFrame:
    """pages(url, html, ...) -> (src_url, dst_url, anchor): one row per
    anchor tag, carrying its link TEXT — the classic target-page ranking
    signal web search aggregates (anchor text describes the TARGET better
    than the target's own text; public IR folklore since AltaVista/Google).
    Explode is JVM-side after the Arrow batch returns."""
    return pages.select(
        "url", extract_anchor_pairs_udf(F.col("html")).alias("pairs")
    ).select(
        F.col("url").alias("src_url"),
        F.explode("pairs").alias("p"),
    ).select("src_url", F.col("p.href").alias("dst_url"), F.col("p.anchor").alias("anchor"))


def anchor_text_summary(anchors: DataFrame, k: int = 3) -> DataFrame:
    """-> (dst_url, n_inlinks, top_anchors array<string>): per target, the
    in-link count and the k most frequent anchor strings (count desc, text
    asc — deterministic). Two aggregations keyed on the same dst_url: the
    (dst, anchor) count reuses its exchange for the window rank and the
    final per-target rollup."""
    from pyspark.sql import Window

    counts = anchors.groupBy("dst_url", "anchor").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("dst_url").orderBy(F.desc("cnt"), F.asc("anchor"))
    ranked = counts.withColumn("rn", F.row_number().over(w))
    return ranked.groupBy("dst_url").agg(
        F.sum("cnt").cast("long").alias("n_inlinks"),
        F.array_sort(
            F.collect_list(F.when(F.col("rn") <= k, F.struct("rn", "anchor")))
        )["anchor"].alias("top_anchors"),
    )
