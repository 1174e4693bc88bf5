"""Distributed TF-IDF tables + query-time scoring (SURVEY.md T4/Q1/Q3/M10).

Formulas are the reference's exactly (api/tfidf_index.py:50-132):
``idf = log((1+N)/(1+df)) + 1``; postings weight ``tf·idf``; doc norm
``sqrt(Σ w²)`` ; query scored by cosine ``dot/(q_norm·doc_norm)``; blended
ranking ``0.8·tfidf + 0.2·pagerank_norm`` (api/main.py:387-398); snippet
window generation (api/main.py:332-362).

Physical plan: tokenize per batch (actor pool) → explode to (doc, term, tf)
→ ``groupby(term)`` for df (the only corpus-wide shuffle) → broadcast
idf-join → per-doc norm groupby.  Query scoring broadcasts the (tiny)
query-term weights and never shuffles the corpus.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from ..stages.broadcast import cached_get
from ..stages.schema_util import drop_empty_blocks
from ..stages.text_ops import tokenize


def _id_is_int(ds, id_col: str) -> bool:
    """True iff the dataset has a known schema with an integer id column
    (the gate for the int64 task-shuffle fast paths; empty datasets have
    no schema and take the generic fallback)."""
    import pyarrow as pa
    sch = ds.schema()
    if sch is None or id_col not in sch.names:
        return False
    t = dict(zip(sch.names, sch.types)).get(id_col)
    return isinstance(t, pa.DataType) and pa.types.is_integer(t)


def term_freq_table(docs_ds, id_col="doc_id", text_col="text"):
    """(doc, term, tf) rows — one per distinct term per doc.

    Arrow in/out (r4 cleanup): the input docs table is text-heavy, and a
    pandas batch format forced a full copy of the text column per batch;
    only the two needed columns are pulled out of the zero-copy Arrow
    block now.  The per-doc Counter walk stays — tokenize is per-string
    regex work with no vectorized form."""
    import pyarrow as pa

    def _explode(t: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for doc_id, text in zip(t[id_col].to_pylist(),
                                t[text_col].to_pylist()):
            for term, tf in Counter(tokenize(text)).items():
                ids.append(doc_id)
                terms.append(term)
                tfs.append(float(tf))
        id_type = t.schema.field(id_col).type
        return pa.table({
            id_col: pa.array(ids, id_type),
            "term": pa.array(terms, pa.string()),
            "tf": pa.array(tfs, pa.float64())})

    return docs_ds.map_batches(_explode, batch_format="pyarrow")


def build_tfidf_tables(docs_ds, id_col="doc_id", text_col="text",
                       num_partitions: int = 8,
                       broadcast_max_terms: int = 5_000_000):
    """Returns (postings_ds (doc, term, weight), norms_ds (doc, norm),
    df_ds (term, df), N).  Weights/norms follow api/tfidf_index.py:65-93.

    NOTE: the reference counts only docs with ≥1 token into N
    (api/tfidf_index.py:55-58) — replicated here.

    Physical plan (r4): the idf side is a VOCABULARY table — when it
    fits a worker heap (≤ ``broadcast_max_terms`` rows) the
    postings-weight step broadcasts {term: idf} via ``ray.put`` and maps
    each tf batch locally, removing the full-explode all-to-all string
    join that used to dominate this pipeline; above the threshold the
    hash join runs (billions of distinct terms at 100 TB).  Weights are
    identical either way (same np.log inputs, one multiply).
    """
    import pyarrow as pa
    import ray

    # materialize the explode ONCE: N, df and the postings map each
    # consume it, and a lazy plan would re-run the tokenizer per consumer
    # (the object store holds — and spills — the exploded rows; the
    # tokenize pass is the pipeline's dominant compute)
    tf = drop_empty_blocks(
        term_freq_table(docs_ds, id_col, text_col)).materialize()
    # N = docs with ≥1 token, counted dataset-side (no driver list);
    # int64 ids go through the two-wave task distinct instead of the
    # sort-based groupby (same exact count, a fraction of the fixed cost)
    if _id_is_int(tf, id_col):
        from ..stages.taskshuffle import distinct_int64
        N = distinct_int64(tf.select_columns([id_col]), id_col).count()
    else:
        N = tf.select_columns([id_col]).groupby(id_col).count().count()

    from ..stages.relational import rename
    df_ds = drop_empty_blocks(
        rename(tf.groupby("term").count(), {"count()": "df"})).materialize()

    def _idf(t: pa.Table) -> pa.Table:
        df = t["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        return t.append_column(
            "idf", pa.array(np.log((1.0 + N) / (1.0 + df)) + 1.0,
                            pa.float64()))

    idf_ds = df_ds.map_batches(_idf, batch_format="pyarrow")

    n_terms = df_ds.count()
    if n_terms <= broadcast_max_terms:
        # the {term: idf} map is assembled in a WORKER task (the driver
        # holds only the ObjectRef — at the 5M-term threshold the dict
        # is ~0.5 GB, which must never live in the driver heap)
        @ray.remote
        def _build_map(*parts):
            out = {}
            for p in parts:
                if p.num_rows:
                    out.update(zip(p["term"].to_pylist(),
                                   p["idf"].to_numpy(zero_copy_only=False)))
            return out

        iref = _build_map.remote(*idf_ds.materialize().to_arrow_refs())

        def _weight_bc(t: pa.Table) -> pa.Table:
            w = cached_get(iref)
            tfv = t["tf"].to_numpy(zero_copy_only=False)
            terms = t["term"].to_pylist()
            idfv = np.fromiter((w[x] for x in terms), dtype=np.float64,
                               count=len(terms))
            return pa.table({id_col: t[id_col].combine_chunks(),
                             "term": t["term"].combine_chunks(),
                             "weight": pa.array(tfv * idfv, pa.float64())})

        postings = drop_empty_blocks(
            tf.map_batches(_weight_bc, batch_format="pyarrow"))
    else:
        from ..stages.relational import inner_join
        postings = inner_join(
            tf, idf_ds.select_columns(["term", "idf"]),
            on="term", num_partitions=num_partitions)

        def _weight(t: pa.Table) -> pa.Table:
            tfv = t["tf"].to_numpy(zero_copy_only=False)
            idfv = t["idf"].to_numpy(zero_copy_only=False)
            return pa.table({id_col: t[id_col].combine_chunks(),
                             "term": t["term"].combine_chunks(),
                             "weight": pa.array(tfv * idfv, pa.float64())})

        postings = drop_empty_blocks(
            postings.map_batches(_weight, batch_format="pyarrow"))

    def _sq(t: pa.Table) -> pa.Table:
        w = t["weight"].to_numpy(zero_copy_only=False)
        return pa.table({id_col: t[id_col].combine_chunks(),
                         "w2": pa.array(w * w, pa.float64())})

    norms = (postings.map_batches(_sq, batch_format="pyarrow")
             .groupby(id_col).sum("w2"))

    def _sqrt(t: pa.Table) -> pa.Table:
        n = np.sqrt(t["sum(w2)"].to_numpy(zero_copy_only=False))
        n[n <= 0] = 1.0                      # api/tfidf_index.py:92 guard
        return pa.table({id_col: t[id_col].combine_chunks(),
                         "norm": pa.array(n, pa.float64())})

    norms = drop_empty_blocks(
        norms.map_batches(_sqrt, batch_format="pyarrow"))
    return postings, norms, df_ds, N


def query_weights(query: str, df_map: dict[str, float], N: int):
    """Reference query vectorization (api/tfidf_index.py:95-110)."""
    q_tf = Counter(tokenize(query))
    weights = {}
    for term, freq in q_tf.items():
        df = df_map.get(term)
        if df is None:
            continue
        idf = math.log((1.0 + N) / (1.0 + df)) + 1.0
        weights[term] = freq * idf
    q_norm_sq = sum(w * w for w in weights.values())
    return weights, math.sqrt(q_norm_sq) if q_norm_sq > 0 else 1.0


def search(postings_ds, norms_ds, df_ds, N, query: str, top_k: int = 10,
           id_col="doc_id", num_partitions: int = 8):
    """Cosine-scored search (Q1): broadcast query weights → filter postings
    → groupby(doc).sum(dot) → normalize → top-k."""
    import ray

    # fetch df for ONLY the query's terms (a handful of rows) — never the
    # whole vocabulary (ADVICE r1: take_all() here was a driver OOM at
    # web-corpus scale)
    import pyarrow as pa
    import pyarrow.compute as pc

    q_terms = sorted(set(tokenize(query)))
    qset = pa.array(q_terms, pa.string())
    df_small = df_ds.map_batches(
        lambda t, _q=qset: t.filter(pc.is_in(t["term"], value_set=_q)),
        batch_format="pyarrow")
    df_map = {r["term"]: r["df"] for r in df_small.take_all()}
    weights, q_norm = query_weights(query, df_map, N)
    if not weights:
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
            id_col: sub[id_col].combine_chunks(),
            "dot": pa.array(
                sub["weight"].to_numpy(zero_copy_only=False) * wv,
                pa.float64())})

    dots = drop_empty_blocks(
        postings_ds.map_batches(_dot, batch_format="pyarrow")
        .groupby(id_col).sum("dot"))

    from ..stages.relational import inner_join, topk
    scored = inner_join(dots, norms_ds, on=id_col,
                        num_partitions=num_partitions)

    def _cos(batch: pd.DataFrame) -> pd.DataFrame:
        batch["tfidf_score"] = batch["sum(dot)"] / (q_norm * batch["norm"])
        return batch[[id_col, "tfidf_score"]]

    scored = scored.map_batches(_cos, batch_format="pandas")
    return topk(scored, ["tfidf_score", id_col], top_k,
                descending=[True, False])


def blended_search(postings_ds, norms_ds, df_ds, N, pagerank_norm_ds,
                   query: str, top_k: int = 10, id_col="doc_id",
                   alpha: float = 0.8, beta: float = 0.2,
                   num_partitions: int = 8):
    """Q3: ``alpha·tfidf + beta·pagerank_norm`` with the reference's 3×
    candidate over-fetch (api/main.py:385-413)."""
    base = search(postings_ds, norms_ds, df_ds, N, query, top_k * 3,
                  id_col, num_partitions)
    if base is None:
        return None
    from ..stages.relational import left_join_coalesce, topk
    joined = left_join_coalesce(base, pagerank_norm_ds, on=id_col,
                                fill={"pagerank_norm": 0.0},
                                num_partitions=num_partitions)

    def _blend(batch: pd.DataFrame) -> pd.DataFrame:
        batch["combined_score"] = (alpha * batch["tfidf_score"]
                                   + beta * batch["pagerank_norm"])
        return batch

    return topk(joined.map_batches(_blend, batch_format="pandas"),
                ["combined_score", id_col], top_k, descending=[True, False])


def bm25_search(docs_ds, query: str, top_k: int = 10, k1: float = 1.2,
                b: float = 0.75, id_col="doc_id", text_col="text",
                num_partitions: int = 8):
    """Okapi BM25 ranking (Lucene idf variant) — the probabilistic
    counterpart to :func:`search`'s cosine TF-IDF, over the SAME
    tokenizer (``stages/text_ops.tokenize``; reference scope note: the
    reference exposes only cosine TF-IDF, api/tfidf_index.py:95-132 —
    BM25 extends the search family for corpus-quality ranking work).

    ``score(d) = Σ_{t∈q∩d} idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl))``
    with ``idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`` — every float op
    mirrors the SQL twin's parenthesization so per-row terms are
    bit-equal (the per-doc Σ over ≤|q| terms is the only fold).

    Physical plan: one token explode (shared
    :func:`term_freq_table`) → per-doc length via ``groupby(doc)`` →
    df for ONLY the query's terms (the explode is filtered before the
    count shuffle — the full vocabulary is never aggregated) → broadcast
    the tiny idf map → join doc lengths → per-batch vectorized score →
    one ``groupby(doc).sum`` → top-k.  N and avgdl are exact integer
    aggregates (token counts), so they are summation-order independent.
    """
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    from ..stages.relational import inner_join, rename, topk

    # materialized once: dl and the query-term prune both consume the
    # explode, and a lazy plan would tokenize the corpus twice
    tf = drop_empty_blocks(
        term_freq_table(docs_ds, id_col, text_col)).materialize()
    # doc length = Σ tf (exact small ints carried as float64).  int64
    # doc ids take the two-wave task shuffle (Ray's sort-based groupby
    # has a multi-second fixed floor at this cardinality); the Ray
    # groupby stays as the generic-key fallback.  Both are exact int
    # sums — bit-identical.
    if _id_is_int(tf, id_col):
        from ..stages.taskshuffle import grouped_agg_int64

        tf_int = tf.map_batches(
            lambda t: pa.table({
                id_col: t[id_col].combine_chunks(),
                "f": t["tf"].combine_chunks().cast(pa.int64())}),
            batch_format="pyarrow")
        dl = grouped_agg_int64(tf_int, id_col, "f", out_val="dli") \
            .map_batches(
                lambda t: pa.table({
                    id_col: t[id_col].combine_chunks(),
                    "dl": t["dli"].combine_chunks().cast(pa.float64())}),
                batch_format="pyarrow").materialize()
    else:
        dl = rename(tf.groupby(id_col).sum("tf"),
                    {"sum(tf)": "dl"}).materialize()

    # N (docs with ≥1 token — term_freq_table emits nothing for empty
    # docs, matching build_tfidf_tables) and total tokens: both exact
    # integers, folded dataset-side
    totals = dl.map_batches(
        lambda t: pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "tot": pa.array(
                [int(round(float(pc.sum(t["dl"]).as_py() or 0.0)))],
                pa.int64())}),
        batch_format="pyarrow").sum(["n", "tot"])
    # zero blocks / all-empty corpus: sum() yields None per column
    if totals is None or totals.get("sum(n)") is None:
        return None
    N, tot = int(totals["sum(n)"]), int(totals["sum(tot)"])
    if N == 0:
        return None
    avgdl = float(tot) / float(N)

    q_terms = sorted(set(tokenize(query)))
    if not q_terms:
        return None

    # prune the explode to the query's terms BEFORE any shuffle
    # (Arrow filter: no pandas copy of the full explode, r4 cleanup)
    qarr = pa.array(q_terms, pa.string())
    qtf = drop_empty_blocks(tf.map_batches(
        lambda bt, _q=qarr: bt.filter(pc.is_in(bt["term"], value_set=_q)),
        batch_format="pyarrow")).materialize()

    # df over the pruned explode: ≤|q| rows ever reach the driver
    df_map = {r["term"]: float(r["count()"])
              for r in qtf.groupby("term").count().take_all()}
    idf = {t: math.log(1.0 + (N - df + 0.5) / (df + 0.5))
           for t, df in df_map.items()}
    if not idf:
        return None
    iref = ray.put(idf)

    # doc-length decoration: every qtf doc has a dl row by construction,
    # so a broadcast map is semantically the inner join; below the
    # threshold it removes the join operator's fixed exchange cost, and
    # the hash join remains the at-scale path
    if N <= 5_000_000:
        # worker-side map assembly: the driver holds only the ref
        @ray.remote
        def _build_dmap(*parts):
            out = {}
            for p in parts:
                if p.num_rows:
                    out.update(zip(p[id_col].to_pylist(),
                                   p["dl"].to_numpy(zero_copy_only=False)))
            return out

        dref = _build_dmap.remote(*dl.to_arrow_refs())

        def _with_dl(t: pa.Table) -> pa.Table:
            dm = cached_get(dref)
            ids = t[id_col].to_pylist()
            return t.append_column("dl", pa.array(
                np.fromiter((dm[i] for i in ids), dtype=np.float64,
                            count=len(ids)), pa.float64()))

        scored = qtf.map_batches(_with_dl, batch_format="pyarrow")
    else:
        scored = inner_join(qtf, dl, on=id_col,
                            num_partitions=num_partitions)

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        w = cached_get(iref)
        tfv = batch["tf"].to_numpy(dtype=np.float64)
        dlv = batch["dl"].to_numpy(dtype=np.float64)
        iv = batch["term"].map(w).to_numpy(dtype=np.float64)
        # parenthesization mirrors the SQL twin exactly
        s = iv * (tfv * (k1 + 1.0)) / (tfv + k1 * (1.0 - b
                                                   + b * dlv / avgdl))
        return pd.DataFrame({id_col: batch[id_col], "s": s})

    out = drop_empty_blocks(rename(
        scored.map_batches(_score, batch_format="pandas")
        .groupby(id_col).sum("s"), {"sum(s)": "bm25_score"}))
    return topk(out, ["bm25_score", id_col], top_k,
                descending=[True, False])


def make_snippet(text: str, query: str, max_len: int = 220) -> str:
    """Reference snippet window (api/main.py:332-362), byte-compatible."""
    if not text:
        return ""
    lowered = text.lower()
    pos = None
    for term in [t for t in query.lower().split() if t]:
        idx = lowered.find(term)
        if idx != -1:
            pos = idx if pos is None else min(pos, idx)
    if pos is None:
        return (text[:max_len] + "…") if len(text) > max_len else text
    start = max(0, pos - max_len // 3)
    end = min(len(text), start + max_len)
    snippet = text[start:end].strip()
    if start > 0:
        snippet = "… " + snippet
    if end < len(text):
        snippet = snippet + " …"
    return snippet


def term_zipf_alpha(docs_ds, fmin: int = 5, id_col="doc_id",
                    text_col="text"):
    """Hill estimator of the Zipf tail exponent of the corpus
    term-frequency distribution: ``alpha = 1 + n / Σ ln(f_i / fmin)``
    over terms with total occurrence count ≥ ``fmin`` — the corpus-health
    twin of ``stages/degrees.powerlaw_alpha`` (natural text follows
    Zipf's law with alpha ≈ 2 in this parameterization; a corpus whose
    tail exponent drifts is boilerplate- or spam-skewed).

    Shape: token explode → one count shuffle over the vocabulary → a
    BOUNDED frequency histogram (≤ max-frequency rows on any corpus) →
    an ascending-frequency ``math.log`` fold of the tiny histogram
    (``math.log`` matches SQL ``ln`` bit-for-bit; numpy's SIMD log
    differs in the last ulp).  One row ``(n_tail, alpha)``.
    """
    import math

    import pyarrow as pa
    import ray.data as rd

    from ..stages.taskshuffle import grouped_agg_int64

    tf = term_freq_table(docs_ds, id_col, text_col)

    def _to_int(t: pa.Table) -> pa.Table:
        # per-doc tf is an exact small integer carried as float64
        return pa.table({"term": t["term"].combine_chunks(),
                         "f": t["tf"].combine_chunks().cast(pa.int64())})

    totals = (tf.map_batches(_to_int, batch_format="pyarrow")
              .groupby("term").sum("f"))

    def _freq_only(t: pa.Table) -> pa.Table:
        return pa.table(
            {"f": t["sum(f)"].combine_chunks().cast(pa.int64())})

    hist = grouped_agg_int64(
        totals.map_batches(_freq_only, batch_format="pyarrow"),
        "f", None, op="sum", out_val="c").to_pandas()
    tail = hist[hist["f"] >= fmin].sort_values("f")
    n = int(tail["c"].sum())
    sl = 0.0
    for f, cnt in zip(tail["f"].to_numpy(), tail["c"].to_numpy()):
        sl += float(cnt) * math.log(float(f) / float(fmin))
    alpha = 1.0 + float(n) / sl if sl > 0 else float("inf")
    return rd.from_arrow(pa.table({
        "n_tail": pa.array([n], pa.int64()),
        "alpha": pa.array([alpha], pa.float64())}))


def doc_keywords(docs_ds, k: int = 3, id_col="doc_id", text_col="text",
                 num_partitions: int = 8):
    """Top-``k`` TF-IDF terms per document (weight desc, term asc
    tie-break) — per-document keyword extraction over the shared
    postings build.  One groupby(doc) exchange; weights rounded to 6dp
    (the idf ``ln`` can differ by an ulp across engines)."""
    postings, _norms, _df, _N = build_tfidf_tables(
        docs_ds, id_col=id_col, text_col=text_col,
        num_partitions=num_partitions)

    def _top(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["weight", "term"],
                          ascending=[False, True]).head(k)
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            "rank": np.arange(1, len(g) + 1, dtype=np.int64),
            "term": g["term"].to_numpy(),
            "weight": np.round(g["weight"].to_numpy(dtype=np.float64),
                               6)})

    return postings.groupby(id_col).map_groups(_top,
                                               batch_format="pandas")
