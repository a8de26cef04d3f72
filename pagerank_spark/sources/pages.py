"""Deterministic Common-Crawl-style page generator (FIXTURES.md §1).

Schema matches BASELINE.json input_hint exactly:
    (url: string, warc_ts: timestamp, html: binary, text: string, lang: string)

Same (seed, n_pages) => byte-identical table, regardless of parallelism: every
page's content derives only from its index via a counter-based RNG stream
(numpy Philox-family `default_rng([seed, i])`). Link targets follow a Zipf
(a=1.5) over page indices — low indices become high-in-degree hubs, many
pages get no in-links, and pages with no out-links are dangling, matching the
reference graph's character (2047/2319 dangling in test1.graph). ~2% of link
targets point outside the page set and are dropped at dense-ID remap time
(documented engine behavior).

Generation runs distributed: ``spark.range(n)`` -> ``mapInPandas`` building
Arrow batches; no driver-side loop, so the same generator scales to the bench
sizes.

The ``text`` column is written by the generator AND must be reproduced
byte-identically from ``html`` by the extractor
(pagerank_spark.functions.extract) — the two modules share the layout
contract documented in :func:`page_content`.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string"
LANGS = ["en", "de", "it", "fr", "es"]
_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt labore dolore magna aliqua enim minim veniam quis "
    "nostrud exercitation ullamco laboris nisi aliquip commodo consequat"
).split()
_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def page_url(i: int, n_sites: int) -> str:
    return f"https://site{i % n_sites}.example/page/{i}"


def page_content(
    i: int, n_pages: int, n_sites: int, seed: int
) -> tuple[str, bytes, str, list[str]]:
    """Return (url, html, text, out_hrefs) for page index i.

    Layout contract with the extractor (functions/extract.py):
      html  = <html><head><title>T</title></head><body>
              <p>para</p>... <a href="H">anchor</a>... </body></html>
      text  = "\\n".join([title] + paragraphs + anchor_texts)
    Paragraph/anchor text never contains '<' or '"', so regex extraction is
    exact and the text round-trip is byte-identical.
    """
    rng = np.random.default_rng([seed, i])
    url = page_url(i, n_sites)
    title = f"Page {i} of site {i % n_sites}"

    n_paras = int(rng.integers(1, 4))
    paras = []
    for _ in range(n_paras):
        k = int(rng.integers(5, 25))
        paras.append(" ".join(_WORDS[j] for j in rng.integers(0, len(_WORDS), k)))

    # out-links: 30% of pages are dangling; the rest draw 1..10 Zipf targets
    hrefs: list[str] = []
    anchors: list[str] = []
    if rng.random() >= 0.30:
        n_links = int(rng.integers(1, 11))
        for _ in range(n_links):
            if rng.random() < 0.02:
                t = int(rng.integers(0, 1_000_000))
                href = f"https://external{t % 97}.example/x/{t}"
            else:
                z = int(rng.zipf(1.5))
                href = page_url((z - 1) % n_pages, n_sites)
            hrefs.append(href)
            anchors.append(f"link {len(anchors)} from page {i}")

    body = "".join(f"<p>{p}</p>" for p in paras) + "".join(
        f'<a href="{h}">{a}</a>' for h, a in zip(hrefs, anchors)
    )
    html = f"<html><head><title>{title}</title></head><body>{body}</body></html>"
    text = "\n".join([title] + paras + anchors)
    return url, html.encode("utf-8"), text, hrefs


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    seed: int = 42,
    n_sites: int | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    n_sites = n_sites or max(1, n_pages // 50)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            rows = []
            for i in batch["id"]:
                i = int(i)
                url, html, text, _ = page_content(i, n_pages, n_sites, seed)
                rows.append(
                    (url, _EPOCH + timedelta(seconds=17 * i), html, text,
                     LANGS[i % len(LANGS)])
                )
            yield pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"]
            )

    return (
        spark.range(0, n_pages, 1, num_partitions)
        .mapInPandas(gen, PAGES_SCHEMA)
    )
