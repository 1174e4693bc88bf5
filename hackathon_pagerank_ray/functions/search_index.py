"""Persisted term-partitioned search index (VERDICT r4 directive 7).

``tfidf_search`` / ``bm25_search`` rebuild their distributed tables per
query — right for one-shot analytics, wrong for serving.  This module
persists the tables ONCE as term-hash-partitioned Parquet
(:mod:`..sources.part_writer` — atomic, resumable partitions) so a warm
query is a PRUNED read (only the partitions containing the query's
terms) plus a broadcast:

- ``postings/tpart={h}/`` — ``(doc_id, term, weight, norm)``; the doc's
  cosine norm is DENORMALIZED onto every posting row (8 extra bytes)
  so query time needs no corpus-sized norms join at all
- ``bm25/tpart={h}/``     — ``(doc_id, term, tf, dl)`` (same trick for
  the doc length)
- ``df/tpart={h}/``       — ``(term, df)``
- ``meta.json``           — N (docs with ≥1 token), avgdl, P

``tpart = fnv1a(term) % P``: a q-term query touches ≤ |q| partitions of
each table regardless of corpus size — the serving story at 100 TB is
O(postings-of-query-terms) read, not O(corpus).

Scores are computed with the exact formulas of
:func:`..tfidf.search` / :func:`..tfidf.bm25_search` (weights and norms
are the PERSISTED values those builders produced), so results are
value-identical to the rebuild-per-query path and the same DuckDB
oracles check both.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.schema_util import drop_empty_blocks
from ..stages.text_ops import _fnv1a_bytes, tokenize
from .tfidf import build_tfidf_tables, query_weights


def _tpart(terms, P: int) -> np.ndarray:
    return np.array([int(np.uint64(_fnv1a_bytes(t.encode("utf-8")))
                         % np.uint64(P)) for t in terms], dtype=np.int64)


def build_search_index(docs_ds, index_dir: str, id_col: str = "doc_id",
                       text_col: str = "text", num_partitions: int = 64,
                       table_partitions: int = 8):
    """One corpus pass (the shared token explode inside
    ``build_tfidf_tables``) → persisted index.  ``num_partitions`` is
    the term-hash bucket count (sizes the per-query read);
    ``table_partitions`` the build-time shuffle width."""
    import ray

    from ..sources.part_writer import write_partitioned
    from ..stages.relational import inner_join
    from .tfidf import term_freq_table

    P = int(num_partitions)
    os.makedirs(index_dir, exist_ok=True)

    postings, norms, df_ds, N = build_tfidf_tables(
        docs_ds, id_col=id_col, text_col=text_col,
        num_partitions=table_partitions)

    # denormalize the norm onto each posting row (join once at BUILD
    # time so query time never touches a corpus-sized table)
    dec = inner_join(postings, norms, on=id_col,
                     num_partitions=table_partitions)

    def _post_rows(t: pa.Table) -> pa.Table:
        terms = t["term"].to_pylist()
        return pa.table({
            "doc_id": t[id_col].combine_chunks(),
            "term": t["term"].combine_chunks(),
            "weight": t["weight"].combine_chunks(),
            "norm": t["norm"].combine_chunks(),
            "tpart": pa.array(_tpart(terms, P))})

    write_partitioned(dec.map_batches(_post_rows, batch_format="pyarrow"),
                      os.path.join(index_dir, "postings"), "tpart")

    def _df_rows(t: pa.Table) -> pa.Table:
        terms = t["term"].to_pylist()
        return pa.table({"term": t["term"].combine_chunks(),
                         "df": t["df"].combine_chunks(),
                         "tpart": pa.array(_tpart(terms, P))})

    write_partitioned(df_ds.map_batches(_df_rows, batch_format="pyarrow"),
                      os.path.join(index_dir, "df"), "tpart")

    # bm25 side: raw tf explode + per-doc length (Σ tf), denormalized
    tf = drop_empty_blocks(
        term_freq_table(docs_ds, id_col, text_col)).materialize()
    from ..stages.relational import rename
    dl = rename(tf.groupby(id_col).sum("tf"), {"sum(tf)": "dl"})
    bm = inner_join(tf, dl, on=id_col, num_partitions=table_partitions)

    def _bm_rows(t: pa.Table) -> pa.Table:
        terms = t["term"].to_pylist()
        return pa.table({
            "doc_id": t[id_col].combine_chunks(),
            "term": t["term"].combine_chunks(),
            "tf": t["tf"].combine_chunks(),
            "dl": t["dl"].combine_chunks(),
            "tpart": pa.array(_tpart(terms, P))})

    write_partitioned(bm.map_batches(_bm_rows, batch_format="pyarrow"),
                      os.path.join(index_dir, "bm25"), "tpart")

    # avgdl over docs with ≥1 token — exact integer total / N
    tot = int(sum(r["dl"] for r in dl.map_batches(
        lambda t: pa.table({"dl": pa.array(
            [int(round(float(pc.sum(t["dl"]).as_py() or 0.0)))],
            pa.int64())}), batch_format="pyarrow").take_all()))
    with open(os.path.join(index_dir, "meta.json"), "w") as f:
        json.dump({"N": N, "total_tokens": tot,
                   "avgdl": (tot / N) if N else 0.0,
                   "num_partitions": P, "id_col": id_col}, f)
    return index_dir


def _part_files(index_dir: str, table: str, parts) -> list[str]:
    files = []
    for p in sorted(set(int(x) for x in parts)):
        d = os.path.join(index_dir, table, f"tpart={p}")
        if os.path.exists(os.path.join(d, "_SUCCESS")):
            files.extend(os.path.join(d, x) for x in sorted(os.listdir(d))
                         if x.endswith(".parquet"))
    return files


def _meta(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "meta.json")) as f:
        return json.load(f)


def _df_for_terms(index_dir: str, terms: list[str], P: int) -> dict:
    import pyarrow.parquet as pq
    out = {}
    qarr = pa.array(terms, pa.string())
    for f in _part_files(index_dir, "df", _tpart(terms, P)):
        t = pq.read_table(f, columns=["term", "df"])
        t = t.filter(pc.is_in(t["term"], value_set=qarr))
        for r in t.to_pylist():
            out[r["term"]] = r["df"]
    return out


def tfidf_query(index_dir: str, query: str, top_k: int = 10,
                num_partitions: int = 8):
    """Warm cosine-TF-IDF query: read ≤|q| postings partitions, filter
    to the query terms, one ``groupby(doc)`` exchange, top-k.  Same
    scores as :func:`..tfidf.search` on the same corpus."""
    import ray
    import ray.data as rd

    from ..stages.broadcast import cached_get
    from ..stages.relational import topk

    meta = _meta(index_dir)
    P, N = meta["num_partitions"], meta["N"]
    q_terms = sorted(set(tokenize(query)))
    if not q_terms:
        return None
    df_map = _df_for_terms(index_dir, q_terms, P)
    weights, q_norm = query_weights(query, df_map, N)
    if not weights:
        return None
    files = _part_files(index_dir, "postings", _tpart(q_terms, P))
    if not files:
        return None
    wref = ray.put(weights)

    def _dot(t: pa.Table) -> pa.Table:
        w = cached_get(wref)
        sub = t.filter(pc.is_in(
            t["term"], value_set=pa.array(sorted(w), pa.string())))
        terms = sub["term"].to_pylist()
        wv = np.fromiter((w[x] for x in terms), dtype=np.float64,
                         count=len(terms))
        return pa.table({
            "doc_id": sub["doc_id"].combine_chunks(),
            "dot": pa.array(
                sub["weight"].to_numpy(zero_copy_only=False) * wv,
                pa.float64()),
            "norm": sub["norm"].combine_chunks()})

    rows = drop_empty_blocks(
        rd.read_parquet(files, columns=["doc_id", "term", "weight",
                                        "norm"])
        .map_batches(_dot, batch_format="pyarrow"))
    import pyarrow.parquet as pq
    if pq.read_schema(files[0]).field("doc_id").type == pa.int64():
        # two-wave task shuffle: the Ray sort-groupby's fixed floor
        # dominates a warm query's candidate set
        from ..stages.taskshuffle import grouped_fsum_int64key
        dots = grouped_fsum_int64key(rows, "doc_id", "dot",
                                     out_val="dot", carry_col="norm")
    else:
        from ray.data.aggregate import Max, Sum
        dots = rows.groupby("doc_id").aggregate(
            Sum("dot", alias_name="dot"), Max("norm", alias_name="norm"))

    def _cos(batch: pd.DataFrame) -> pd.DataFrame:
        batch["tfidf_score"] = batch["dot"] / (q_norm * batch["norm"])
        return batch[["doc_id", "tfidf_score"]]

    scored = dots.map_batches(_cos, batch_format="pandas")
    return topk(scored, ["tfidf_score", "doc_id"], top_k,
                descending=[True, False])


def bm25_query(index_dir: str, query: str, top_k: int = 10,
               k1: float = 1.2, b: float = 0.75,
               num_partitions: int = 8):
    """Warm Okapi BM25 query against the persisted index — same scores
    (same parenthesization) as :func:`..tfidf.bm25_search`."""
    import ray
    import ray.data as rd

    from ..stages.broadcast import cached_get
    from ..stages.relational import rename, topk

    meta = _meta(index_dir)
    P, N, avgdl = meta["num_partitions"], meta["N"], meta["avgdl"]
    if not N:
        return None
    q_terms = sorted(set(tokenize(query)))
    if not q_terms:
        return None
    df_map = _df_for_terms(index_dir, q_terms, P)
    idf = {t: math.log(1.0 + (N - df + 0.5) / (df + 0.5))
           for t, df in df_map.items()}
    if not idf:
        return None
    files = _part_files(index_dir, "bm25", _tpart(q_terms, P))
    if not files:
        return None
    iref = ray.put(idf)
    qarr = pa.array(sorted(idf), pa.string())

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        w = cached_get(iref)
        batch = batch[batch["term"].isin(w)]
        tfv = batch["tf"].to_numpy(dtype=np.float64)
        dlv = batch["dl"].to_numpy(dtype=np.float64)
        iv = batch["term"].map(w).to_numpy(dtype=np.float64)
        # parenthesization mirrors bm25_search / the SQL twin exactly
        s = iv * (tfv * (k1 + 1.0)) / (tfv + k1 * (1.0 - b
                                                   + b * dlv / avgdl))
        return pd.DataFrame({"doc_id": batch["doc_id"], "s": s})

    pruned = rd.read_parquet(files, columns=["doc_id", "term", "tf",
                                             "dl"]) \
        .map_batches(lambda t, _q=qarr: t.filter(
            pc.is_in(t["term"], value_set=_q)), batch_format="pyarrow")
    srows = drop_empty_blocks(
        pruned.map_batches(_score, batch_format="pandas"))
    import pyarrow.parquet as pq
    if pq.read_schema(files[0]).field("doc_id").type == pa.int64():
        from ..stages.taskshuffle import grouped_fsum_int64key
        out = grouped_fsum_int64key(srows, "doc_id", "s",
                                    out_val="bm25_score")
    else:
        out = rename(srows.groupby("doc_id").sum("s"),
                     {"sum(s)": "bm25_score"})
    return topk(out, ["bm25_score", "doc_id"], top_k,
                descending=[True, False])
