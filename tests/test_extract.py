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
