"""TextRank keyword scoring — PageRank over the word co-occurrence graph.

Mihalcea & Tarau, "TextRank: Bringing Order into Text" (EMNLP 2004),
corpus-level variant: vertices are distinct lowercased ``\\w+`` tokens,
edges are distinct ADJACENT token pairs anywhere in the corpus
(window = 2, unweighted, undirected), scores are fixed-sweep PageRank
over the symmetrized graph.  The classic unsupervised keyword extractor
— the per-corpus companion to the TF-IDF/BM25 rankers.

Composite of existing verified stages: the tokenizer parity
(``\\w+`` + lower) is the one `token_counts`/`top_bigrams` already
pin against DuckDB; the dense word→id relabel is the sort-ordered
`ids.assign_vertex_ids` (PageRank is invariant under relabeling, so
the SQL twin runs the SAME unrolled chain on string keys directly);
the solve is the sharded-actor `engine.pagerank` whose 12-sweep
float64 semantics the `pagerank` oracle already matches.  The
symmetric graph has no dangling vertices, so the dangling term is
identically zero in both engines.

Scale shape: pair extraction is a per-block vectorized map; the
distinct-pair table is the only shuffle before the solve (vocabulary
edges, not corpus tokens — boilerplate repeats collapse in the
per-block dedup first).  The id relabel sorts once; the solve is the
same mesh the flagship PageRank uses.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

# re.ASCII pins \w to [A-Za-z0-9_] — the semantics of the DuckDB (RE2)
# oracle twin's \w, so engine and SQL tokenize identically even on a
# non-ASCII corpus (ADVICE r3: Python's default Unicode \w would keep
# 'café' whole while RE2 splits it)
_TOKEN_RE = re.compile(r"\w+", re.ASCII)


def _adjacent_pairs(batch: pd.DataFrame, text_col: str) -> pd.DataFrame:
    """Per-block canonical adjacent-token pairs, block-locally dedup'd."""
    ws, vs = [], []
    for text in batch[text_col]:
        toks = _TOKEN_RE.findall((text or "").lower())
        if len(toks) < 2:
            continue
        a = np.asarray(toks[:-1], dtype=object)
        b = np.asarray(toks[1:], dtype=object)
        keep = a != b
        a, b = a[keep], b[keep]
        if len(a):
            ws.append(np.minimum(a, b))
            vs.append(np.maximum(a, b))
    if not ws:
        return pd.DataFrame({"w1": pd.Series(dtype=object),
                             "w2": pd.Series(dtype=object)})
    return (pd.DataFrame({"w1": np.concatenate(ws),
                          "w2": np.concatenate(vs)})
            .drop_duplicates(ignore_index=True))


def textrank_scores(docs_ds, text_col: str = "text", sweeps: int = 12,
                    alpha: float = 0.85, num_owners: int = 4,
                    num_partitions: int = 8):
    """(word, rank) for every word of the co-occurrence graph — full
    vector, not top-k, so the cross-engine compare has no float
    boundary.  Fixed ``sweeps`` (tol=0) to mirror the unrolled twin."""
    import ray

    from ..graph.engine import ShardedGraph, pagerank
    from ..stages.ids import assign_vertex_ids, edges_to_ids
    from ..stages.relational import distinct, inner_join, rename
    from ..stages.schema_util import drop_empty_blocks, enforce_schema

    pairs = drop_empty_blocks(enforce_schema(
        docs_ds.map_batches(lambda b: _adjacent_pairs(b, text_col),
                            batch_format="pandas"),
        pa.schema([("w1", pa.string()), ("w2", pa.string())])))
    if pairs.count() == 0:
        return ray.data.from_arrow(pa.table({
            "word": pa.array([], pa.string()),
            "rank": pa.array([], pa.float64())}))
    und = distinct(pairs, ["w1", "w2"], num_partitions).materialize()
    n_und = und.count()

    def _stack(t: pa.Table) -> pa.Table:
        return pa.table({"url": pa.concat_arrays(
            [t["w1"].combine_chunks(), t["w2"].combine_chunks()])})

    vocab = assign_vertex_ids(
        und.map_batches(_stack, batch_format="pyarrow"), col="url",
        input_rows_hint=2 * n_und)
    eint = edges_to_ids(
        rename(und, {"w1": "src_url", "w2": "dst_url"}), vocab,
        num_partitions=num_partitions)

    def _sym(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks()
        d = t["dst"].combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([s, d]), pa.concat_arrays([d, s])],
            names=["src", "dst"])

    g = ShardedGraph.build(
        eint.map_batches(_sym, batch_format="pyarrow"),
        num_owners=num_owners)
    try:
        ranks, _ = pagerank(g, tol=0.0, max_iter=sweeps, alpha=alpha)
    finally:
        g.shutdown()
    out = inner_join(ranks, vocab, on="vid",
                     num_partitions=num_partitions)
    return out.map_batches(
        lambda t: pa.table({"word": t["url"].combine_chunks(),
                            "rank": t["rank"].combine_chunks()
                            .cast(pa.float64())}),
        batch_format="pyarrow")
