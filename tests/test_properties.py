"""Property-based tests (SURVEY.md §5.6) — no Ray needed, pure oracles."""

import re

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from hackathon_pagerank_ray import oracle
from hackathon_pagerank_ray.extract import normalize_url, parse_page
from hackathon_pagerank_ray.stages.dedup_near import _jaccard
from hackathon_pagerank_ray.stages.text_ops import (shingle_hashes, tokenize,
                                                    token_hashes)

url_st = st.from_regex(
    r"https?://[A-Za-z0-9.\-]{1,20}(/[A-Za-z0-9._\-/]{0,20})?(#[A-Za-z0-9]{0,8})?",
    fullmatch=True)


@given(url_st)
@settings(max_examples=200, deadline=None)
def test_normalize_url_fixpoint(url):
    # Reference parity (crawler/core.py:39-60) deliberately keeps the
    # reference's rstrip("/") semantics, which are NOT idempotent on
    # all-slash paths ("http://0//" -> "http://0" -> "http://0/"): a
    # stripped-empty path re-enters as "/".  Two applications always
    # reach the fixpoint; assert that, not single-step idempotency.
    twice = normalize_url(normalize_url(url))
    assert normalize_url(twice) == twice
    once = normalize_url(url)
    assert "#" not in once.split("?")[0] or once.startswith("mailto")


def test_normalize_url_all_slash_path_matches_reference():
    # Pinned against /root/reference/crawler/core.py:54-57 behavior:
    # path "//" rstrips to "" (NOT "/"); root "/" is preserved.
    assert normalize_url("http://0//") == "http://0"
    assert normalize_url("http://0/") == "http://0/"
    assert normalize_url("HTTP://Example.COM/a/#frag") == "http://example.com/a"


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_tokenize_matches_reference_regex(text):
    ref = [t.lower() for t in re.findall(r"\b\w+\b", text, re.UNICODE)]
    assert tokenize(text) == ref


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=120))
@settings(max_examples=60, deadline=None)
def test_pagerank_oracle_invariants(pairs):
    edges = np.array([(u, v) for u, v in pairs if u != v], dtype=np.int64)
    if len(edges) == 0:
        return
    r, sweeps, delta = oracle.pagerank(edges)
    n = oracle.n_from_edges(edges)
    assert len(r) == n
    assert abs(r.sum() - 1.0) < 1e-9            # A8: Σ rank = 1
    assert (r > 0).all()                        # teleport floor
    assert sweeps <= 100


@given(st.lists(st.tuples(st.integers(0, 25), st.integers(0, 25)),
                min_size=1, max_size=100))
@settings(max_examples=60, deadline=None)
def test_cc_labels_are_component_minima(pairs):
    edges = np.array(pairs, dtype=np.int64)
    n = oracle.n_from_edges(edges)
    labels = oracle.connected_components(edges, n)
    # every vertex's label is ≤ its id and shared with its neighbors
    assert (labels <= np.arange(n)).all()
    for u, v in edges:
        assert labels[u] == labels[v]


@given(st.lists(st.tuples(st.integers(0, 20), st.integers(0, 20)),
                min_size=1, max_size=80))
@settings(max_examples=40, deadline=None)
def test_triangle_counts_total_divisible_by_three(pairs):
    edges = np.array(pairs, dtype=np.int64)
    counts = oracle.triangle_counts(edges)
    assert counts.sum() % 3 == 0


@given(st.text(alphabet="ab ", max_size=120), st.text(alphabet="ab ", max_size=120))
@settings(max_examples=80, deadline=None)
def test_jaccard_symmetric_and_bounded(t1, t2):
    j = _jaccard(t1, t2, 3)
    assert 0.0 <= j <= 1.0
    assert abs(j - _jaccard(t2, t1, 3)) < 1e-12
    assert _jaccard(t1, t1, 3) == 1.0


@given(st.lists(st.text(alphabet="abcdef", min_size=1, max_size=6),
                max_size=30))
@settings(max_examples=60, deadline=None)
def test_shingle_hash_determinism(tokens):
    a = shingle_hashes(tokens, 3)
    b = shingle_hashes(list(tokens), 3)
    assert np.array_equal(a, b)
    assert np.array_equal(token_hashes(tokens), token_hashes(list(tokens)))


@given(st.text(max_size=400))
@settings(max_examples=50, deadline=None)
def test_parse_page_total_on_arbitrary_html(html):
    """The parser chain must never crash on arbitrary input (crawl-shaped
    robustness); outputs keep their contracts."""
    lang, text, links, indexed = parse_page(html, "https://ex.org/p")
    assert isinstance(text, str)
    assert all(isinstance(l, str) for l in links)
    assert indexed in (True, False)
    # whitespace collapse invariant (crawler/core.py:157)
    assert "  " not in text and text == text.strip()
