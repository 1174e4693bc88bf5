"""Anchor-text index: per link target, the aggregated visible anchor
text pointing at it — the classic target-page description signal a
search / training-data pipeline builds alongside the link graph
(Brin & Page 1998 §2.2 "anchor text ... often provides a more accurate
description of the page than the page itself").

The reference crawl keeps only hrefs (crawler/core.py:296-304); this
stage re-runs the SAME pruned-tree anchor walk with the text retained
(extract.extract_anchors) and aggregates per target.

Scale shape: one parse pass per page (the heavy part, embarrassingly
parallel map_batches), then ONE string-keyed groupby of the small
(target, anchor_text) rows — anchor rows are ~two short strings per
link, a tiny fraction of page bytes, so the shuffle volume is the edge
list's, not the corpus's.  Per-group work is a value_counts over that
target's in-links (bounded by in-degree; hubs stay one group — at
web scale salt the key with a per-group combiner if a single target's
in-degree exceeds a block).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

from ..extract import (extract_anchors, extract_text, get_base_domain,
                       normalize_url, parse_html)
from urllib.parse import urlparse


def _anchor_rows(batch: pa.Table, max_html_bytes: int) -> pa.Table:
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    out_t, out_a = [], []
    for url, html in zip(urls, htmls):
        if html is None or len(html) > max_html_bytes:
            continue
        html_str = html.decode("utf-8", errors="replace")
        doc = parse_html(html_str)
        norm = normalize_url(url)
        base = get_base_domain(urlparse(norm).netloc.lower())
        # prune boilerplate FIRST — the reference reads anchors from the
        # already-pruned tree (extract.extract_links contract)
        extract_text(doc)
        for target, text in extract_anchors(doc, norm, base):
            out_t.append(target)
            out_a.append(text)
    return pa.table({"target": pa.array(out_t, pa.string()),
                     "atext": pa.array(out_a, pa.string())})


def anchor_text_index(pages_ds, max_html_bytes: int = 2_000_000):
    """(url, n_anchors, n_unique_texts, top_text) per link target.

    ``top_text`` = the most frequent anchor text for the target, ties
    broken by lexicographically smallest (a deterministic convention
    the fixture oracle replays independently).
    """

    rows = pages_ds.map_batches(
        lambda t: _anchor_rows(t, max_html_bytes), batch_format="pyarrow")

    def _agg(df: pd.DataFrame) -> pd.DataFrame:
        vc = df.groupby("atext").size()
        top = sorted(vc.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        return pd.DataFrame({
            "url": [df["target"].iloc[0]],
            "n_anchors": pd.array([len(df)], dtype="int64"),
            "n_unique_texts": pd.array([len(vc)], dtype="int64"),
            "top_text": [top]})

    return rows.groupby("target").map_groups(_agg, batch_format="pandas")
