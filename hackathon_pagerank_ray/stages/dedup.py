"""Exact dedup operators from the reference (SURVEY.md §2.7)."""

from __future__ import annotations

import pandas as pd

from .relational import distinct


def dedup_edges(edges_url_ds, num_partitions: int | None = None):
    """D2: exact (src, dst) dedup — the ``seen``-set semantics of
    api/build_corpus.py:88-92 as a hash groupby."""
    return distinct(edges_url_ds, ["src_url", "dst_url"], num_partitions)


def dedup_pages_longer_text(docs_ds):
    """D3: per normalized url keep the record with the LONGEST text;
    on equal length the FIRST seen wins (api/main.py:68-83 replaces only
    when strictly longer).  Canonical "seen" order is ``warc_ts`` asc.
    """
    def _pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("warc_ts", kind="stable")
        lens = g["text"].fillna("").str.len()
        return g.loc[[lens.idxmax()]]   # idxmax → first occurrence of max

    return docs_ds.groupby("url").map_groups(_pick, batch_format="pandas")


def dedup_ranks_max(ranks_ds, key: str = "url", score: str = "score"):
    """D4: per url keep the MAX score (api/main.py:104-114)."""
    return ranks_ds.groupby(key).max(score)
