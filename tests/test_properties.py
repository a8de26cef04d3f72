"""Property-based tests (hypothesis) for engine invariants."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pagerank_spark.functions.extract import (
    extract_links_reference,
    extract_text_reference,
)
from pagerank_spark.oracle import (
    connected_components_numpy,
    pagerank_numpy,
    triangles_numpy,
)
from pagerank_spark.pipeline.dedup import shingles, tokenize
from pagerank_spark.sources.pages import page_content

edge_lists = st.integers(2, 30).flatmap(
    lambda n: st.tuples(
        st.just(n),
        st.lists(
            st.tuples(st.integers(0, n - 1), st.integers(0, n - 1)),
            min_size=0,
            max_size=80,
        ),
    )
)


@given(edge_lists)
@settings(max_examples=40, deadline=None)
def test_pagerank_invariants(case):
    n, edges = case
    arr = np.array(edges, dtype=np.int64).reshape(-1, 2)
    pi, it, deltas = pagerank_numpy(arr, n)
    assert abs(pi.sum() - 1.0) < 1e-9
    assert pi.min() >= (1 - 0.85) / n - 1e-12
    assert all(d >= 0 for d in deltas)


@given(edge_lists)
@settings(max_examples=30, deadline=None)
def test_cc_is_equivalence_relation(case):
    n, edges = case
    arr = np.array(edges, dtype=np.int64).reshape(-1, 2)
    comp = connected_components_numpy(arr, n)
    # component label is the min member id
    for c in set(comp.tolist()):
        members = np.nonzero(comp == c)[0]
        assert members.min() == c
    # endpoints of every edge share a component
    for u, v in arr:
        assert comp[u] == comp[v]


@given(edge_lists)
@settings(max_examples=20, deadline=None)
def test_triangle_counts_consistent(case):
    n, edges = case
    arr = np.array(edges, dtype=np.int64).reshape(-1, 2)
    total, per = triangles_numpy(arr, n)
    assert per.sum() == 3 * total
    assert per.min() >= 0


@given(st.integers(0, 10_000), st.integers(1, 500), st.integers(0, 99))
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.filter_too_much])
def test_page_roundtrip_property(i, n_pages, seed):
    i = i % n_pages
    url, html, text, hrefs = page_content(i, n_pages, max(1, n_pages // 50), seed)
    assert extract_text_reference(html) == text
    assert extract_links_reference(html) == hrefs


@given(st.text(max_size=300))
@settings(max_examples=60, deadline=None)
def test_tokenize_and_shingles_total(text):
    toks = tokenize(text)
    assert all(t for t in toks)
    sh = shingles(text, 3)
    if len(toks) >= 3:
        assert len(sh) <= max(1, len(toks) - 2)
    elif toks:
        assert sh == {" ".join(toks)}
    else:
        assert sh == set()
