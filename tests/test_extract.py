from __future__ import annotations

from pyspark.sql import functions as F

from pagerank_spark.functions.extract import (
    extract_links_reference,
    extract_outlinks,
    extract_text,
    extract_text_reference,
)
from pagerank_spark.sources.pages import generate_pages, page_content


def test_generator_deterministic(spark):
    a = generate_pages(spark, 200, seed=7, num_partitions=4).orderBy("url").collect()
    b = generate_pages(spark, 200, seed=7, num_partitions=11).orderBy("url").collect()
    assert a == b
    assert len(a) == 200
    assert a[0].asDict().keys() == {"url", "warc_ts", "html", "text", "lang"}


def test_extracted_text_byte_identical(spark):
    """input_hint per-row invariant: extracted text == generated text, per url."""
    pages = generate_pages(spark, 300, seed=42, num_partitions=4)
    cmp = (
        extract_text(pages.select("url", "html"))
        .withColumnRenamed("text", "extracted")
        .join(pages.select("url", "text"), "url")
    )
    bad = cmp.filter(F.col("extracted") != F.col("text")).count()
    assert bad == 0
    # pure-python reference agrees row-by-row too
    for row in pages.limit(20).collect():
        assert extract_text_reference(bytes(row["html"])) == row["text"]


def test_extract_links_matches_generator():
    url, html, _, hrefs = page_content(5, 100, 2, 42)
    assert extract_links_reference(html) == hrefs


def test_extract_outlinks_explodes(spark):
    pages = generate_pages(spark, 100, seed=42, num_partitions=4)
    links = extract_outlinks(pages)
    assert links.columns == ["src_url", "dst_url"]
    n_links = links.count()
    assert n_links > 100  # non-dangling pages emit 1..10 anchors each
    # every src_url is a real page url
    n_pages_with_links = links.select("src_url").distinct().count()
    assert 0 < n_pages_with_links <= 100


# ------------------------------------------------------------- anchor text
def test_extract_anchors_match_reference(spark):
    from pagerank_spark.functions.extract import (
        extract_anchor_pairs_reference,
        extract_anchors,
    )
    from pagerank_spark.sources.pages import generate_pages

    pages = generate_pages(spark, 200, seed=42, num_partitions=4)
    got = {
        (r["src_url"], r["dst_url"], r["anchor"])
        for r in extract_anchors(pages).collect()
    }
    exp = set()
    for r in pages.select("url", "html").collect():
        for href, anchor in extract_anchor_pairs_reference(bytes(r["html"])):
            exp.add((r["url"], href, anchor))
    assert got == exp and len(got) > 0


def test_anchor_text_summary_topk(spark):
    from pagerank_spark.functions.extract import anchor_text_summary

    anchors = spark.createDataFrame(
        [
            ("s1", "t1", "best page"),
            ("s2", "t1", "best page"),
            ("s3", "t1", "ok page"),
            ("s4", "t1", "a rare one"),
            ("s5", "t1", "ok page"),
            ("s1", "t2", "solo"),
        ],
        "src_url string, dst_url string, anchor string",
    )
    rows = {r["dst_url"]: r for r in anchor_text_summary(anchors, k=2).collect()}
    assert rows["t1"]["n_inlinks"] == 5
    # top-2 by count desc, text asc: "best page" (2), "ok page" (2)
    assert rows["t1"]["top_anchors"] == ["best page", "ok page"]
    assert rows["t2"]["n_inlinks"] == 1 and rows["t2"]["top_anchors"] == ["solo"]
