"""Unigram language-model document scoring.

Scores each document by its mean token log-probability under the
corpus's own unigram distribution — the classic cheap fluency /
outlier signal in LLM-data pipelines (low scores = boilerplate, code
dumps, non-language noise; complements the rule-based QualityScore
features in stages/text_ops.py).

    score(d) = (Σ_t tf(d,t) · ln(n_t / T)) / Σ_t tf(d,t)

Physical plan — fully distributed, no driver-side vocabulary (the
anti-pattern VERDICT r1 flagged in tfidf.search):

  tokenize → (doc, term, tf) rows  →  groupby(term) freq table (one
  shuffle)  →  hash-join postings ⋈ freqs on term (second shuffle)  →
  per-doc sum/divide groupby.

At web scale the join's build side is the vocabulary table; cap it with
``min_count`` (rare terms collapse to one OOV row, preserving mass) if
the long tail dominates.  Documents with zero tokens emit no row (the
SQL ``AVG``-over-group analogue).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import pyarrow as pa

from ..stages.broadcast import cached_get

from ..stages.relational import inner_join, rename
from ..stages.schema_util import drop_empty_blocks, enforce_schema
from .tfidf import term_freq_table


def unigram_logprob(docs_ds, id_col="doc_id", text_col="text",
                    num_partitions: int = 8,
                    broadcast_vocab_max: int = 2_000_000):
    """Returns ``(doc_id, unigram_lp)`` — mean token log-probability.

    Adaptive: when the vocabulary fits comfortably in a worker heap
    (≤ ``broadcast_vocab_max`` terms) the term→logprob map is shipped
    once via ``ray.put`` and scoring is a single streaming pass over the
    docs — one corpus shuffle total (the freq groupby).  Above the
    threshold the join/groupby plan below runs; it never holds the vocab
    in one place."""
    tf_schema = pa.schema([(id_col, pa.int64()), ("term", pa.string()),
                           ("tf", pa.float64())])
    tf = enforce_schema(
        drop_empty_blocks(term_freq_table(docs_ds, id_col, text_col)),
        tf_schema).materialize()
    freq = rename(tf.groupby("term").sum("tf"), {"sum(tf)": "n"})
    total = float(freq.sum("n"))

    if freq.count() <= broadcast_vocab_max:
        import math

        import ray

        fdf = freq.to_pandas()
        lp_ref = ray.put({t: math.log(n / total)
                          for t, n in zip(fdf["term"], fdf["n"])})
        del fdf
        from ..stages.text_ops import tokenize

        def _score_docs(batch: pd.DataFrame) -> pd.DataFrame:
            lp = cached_get(lp_ref)
            ids, scores = [], []
            for doc_id, text in zip(batch[id_col], batch[text_col]):
                toks = tokenize(text)
                if not toks:
                    continue
                acc = np.float64(0.0)
                for t in toks:
                    acc += lp[t]
                ids.append(doc_id)
                scores.append(float(acc / len(toks)))
            return pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                 "unigram_lp": pd.Series(scores,
                                                         dtype="float64")})

        return docs_ds.map_batches(_score_docs, batch_format="pandas")

    joined = inner_join(tf, freq, on="term",
                        num_partitions=num_partitions)

    def _contrib(batch: pd.DataFrame) -> pd.DataFrame:
        lp = np.log(batch["n"].to_numpy(dtype=np.float64) / total)
        t = batch["tf"].to_numpy(dtype=np.float64)
        return pd.DataFrame({id_col: batch[id_col],
                             "lp": t * lp, "tf": t})

    sums = (joined.map_batches(_contrib, batch_format="pandas")
            .groupby(id_col).sum(["lp", "tf"]))

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col],
            "unigram_lp": batch["sum(lp)"] / batch["sum(tf)"],
        })

    return sums.map_batches(_score, batch_format="pandas")


def bigram_logprob(docs_ds, id_col="doc_id", text_col="text",
                   num_partitions: int = 8):
    """(doc_id, bigram_lp) — mean bigram log-probability per document
    under the corpus's own bigram LM:

        score(d) = (Σ_b c(d,b) · ln(n_b / n_prefix(b))) / Σ_b c(d,b)

    with ``n_b`` the corpus count of bigram b and ``n_prefix`` the count
    of its first token as a bigram prefix.  No smoothing is needed:
    every document bigram exists in the corpus counts by construction.
    The fluency signal one step up from :func:`unigram_logprob` —
    repetitive boilerplate scores high, shuffled/garbled text scores
    low even when its unigram mix looks natural.

    Physical plan: bigram explode → corpus bigram freq (one shuffle) →
    prefix freq (bounded by vocab, one shuffle) → per-bigram logprob
    computed ONCE per distinct bigram with ``math.log`` (bit-matches SQL
    ``ln``; numpy's SIMD log differs in the last ulp) → postings join →
    per-doc sum/divide.  Documents with < 2 tokens emit no row.
    """
    import math

    from ..stages.text_ops import tokenize

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        ids, bgs, cs = [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            toks = tokenize(text)
            if len(toks) < 2:
                continue
            for bg, c in Counter(
                    a + "\x1f" + b for a, b in zip(toks, toks[1:])).items():
                ids.append(doc_id)
                bgs.append(bg)
                cs.append(float(c))
        return pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                             "bg": pd.Series(bgs, dtype="object"),
                             "c": pd.Series(cs, dtype="float64")})

    btf_schema = pa.schema([(id_col, pa.int64()), ("bg", pa.string()),
                            ("c", pa.float64())])
    btf = enforce_schema(
        drop_empty_blocks(docs_ds.map_batches(_explode,
                                              batch_format="pandas")),
        btf_schema).materialize()
    nb = rename(btf.groupby("bg").sum("c"), {"sum(c)": "n"}).materialize()

    def _prefix(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        w1 = pc.list_element(pc.split_pattern(t["bg"].combine_chunks(),
                                              "\x1f"), 0)
        return pa.table({"w1": w1, "n": t["n"].combine_chunks()})

    pf = rename(
        nb.map_batches(_prefix, batch_format="pyarrow")
        .groupby("w1").sum("n"), {"sum(n)": "np"})

    # bigram-level (bg, w1, n) then join the prefix totals on w1
    def _with_w1(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        w1 = pc.list_element(pc.split_pattern(t["bg"].combine_chunks(),
                                              "\x1f"), 0)
        return pa.table({"bg": t["bg"].combine_chunks(), "w1": w1,
                         "n": t["n"].combine_chunks()})

    nb_w1 = enforce_schema(
        drop_empty_blocks(nb.map_batches(_with_w1, batch_format="pyarrow")),
        pa.schema([("bg", pa.string()), ("w1", pa.string()),
                   ("n", pa.float64())]))
    pf = enforce_schema(drop_empty_blocks(pf),
                        pa.schema([("w1", pa.string()),
                                   ("np", pa.float64())]))
    lp_tbl = inner_join(nb_w1, pf, on="w1",
                        num_partitions=num_partitions)

    def _lp(batch: pd.DataFrame) -> pd.DataFrame:
        # one math.log per DISTINCT bigram — the float-parity rule
        lps = [math.log(n / npx) for n, npx in zip(batch["n"],
                                                   batch["np"])]
        return pd.DataFrame({"bg": batch["bg"],
                             "lp": pd.Series(lps, dtype="float64")})

    lp_tbl = enforce_schema(
        drop_empty_blocks(lp_tbl.map_batches(_lp, batch_format="pandas")),
        pa.schema([("bg", pa.string()), ("lp", pa.float64())]))

    joined = inner_join(btf, lp_tbl, on="bg",
                        num_partitions=num_partitions)

    def _contrib(batch: pd.DataFrame) -> pd.DataFrame:
        c = batch["c"].to_numpy(dtype=np.float64)
        return pd.DataFrame({id_col: batch[id_col],
                             "clp": c * batch["lp"].to_numpy(), "c": c})

    sums = (joined.map_batches(_contrib, batch_format="pandas")
            .groupby(id_col).sum(["clp", "c"]))

    def _score(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col],
            "bigram_lp": batch["sum(clp)"] / batch["sum(c)"]})

    return sums.map_batches(_score, batch_format="pandas")
