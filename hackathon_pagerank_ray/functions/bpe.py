"""Distributed BPE merge training (Sennrich et al., "Neural Machine
Translation of Rare Words with Subword Units", ACL 2016 — the
`learn_bpe` algorithm) over a Ray Dataset corpus.

Training operates on the WORD-FREQUENCY table, not the corpus: one
corpus pass folds documents into ``(word, count)`` rows (vocab-sized —
orders of magnitude smaller than the corpus), then each merge round is

    1. per-block adjacent-pair partial counts weighted by word count
       (vectorized over the block's words),
    2. one small ``groupby(pair).sum`` (pair-vocab-sized exchange),
    3. the argmax pair — DETERMINISTIC tie-break: highest count, then
       lexicographically smallest (left, right) (the reference
       implementation's dict-order max is run-dependent; this rule is a
       pure function of the counts),
    4. broadcast the winning pair and re-encode only the words that
       contain it (left-to-right non-overlapping, exactly
       ``learn_bpe``'s merge).

Words that no longer change ride along untouched; the per-round
exchange is bounded by the live pair vocabulary.  An adaptive small
path (vocab ≤ ``small_threshold``) runs the identical algorithm in one
task — same merges by construction.

No SQL twin: k rounds of string surgery is outside DuckDB's reach, so
the driver records the weaker rows-only check for the query; exactness
is pinned by a pytest against a transparent sequential reference.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa


def word_counts(docs_ds, text_col: str = "text"):
    """(word, count) over the reference tokenizer — the one corpus
    pass; everything after runs on the (much smaller) vocab table."""
    from ..stages.text_ops import tokenize

    def _partial(t: pa.Table) -> pa.Table:
        c = Counter()
        for text in t[text_col].to_pylist():
            c.update(tokenize(text))
        return pa.table({"word": pa.array(list(c.keys()), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    return (docs_ds.map_batches(_partial, batch_format="pyarrow")
            .groupby("word").sum("n")
            .map_batches(lambda t: pa.table(
                {"word": t["word"].combine_chunks(),
                 "n": t["sum(n)"].combine_chunks()}),
                batch_format="pyarrow"))


_SEP = "\x1f"      # symbol separator inside the encoded-word string


def _pair_counts_block(words: list[str], counts: np.ndarray) -> Counter:
    """Adjacent-pair counts over sep-encoded words, weighted by word
    frequency (every adjacent position counts — learn_bpe.get_stats)."""
    out = Counter()
    for w, n in zip(words, counts):
        syms = w.split(_SEP)
        n = int(n)
        for a, b in zip(syms, syms[1:]):
            out[(a, b)] += n
    return out


def _merge_word(w: str, left: str, right: str) -> str:
    """Left-to-right non-overlapping merge of (left, right) in one
    sep-encoded word — learn_bpe's replace semantics."""
    syms = w.split(_SEP)
    out = []
    i = 0
    while i < len(syms):
        if (i + 1 < len(syms) and syms[i] == left
                and syms[i + 1] == right):
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return _SEP.join(out)


def _train_seq(words: list[str], counts: np.ndarray, num_merges: int):
    """The sequential reference — also the small path (identical
    algorithm, one task)."""
    enc = [_SEP.join(w) for w in words]
    merges = []
    for _ in range(num_merges):
        stats = _pair_counts_block(enc, counts)
        if not stats:
            break
        best = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
        (left, right), freq = best
        merges.append((left, right, int(freq)))
        pat = _SEP.join((left, right))
        enc = [_merge_word(w, left, right) if pat in w else w
               for w in enc]
    return merges


def bpe_train(docs_ds, num_merges: int = 50, text_col: str = "text",
              small_threshold: int = 2_000_000):
    """Learn ``num_merges`` BPE merges from the corpus.  Returns a
    pandas DataFrame ``(merge_idx, left, right, freq)``.

    Distributed shape: vocab rows stay a Dataset; each round is one
    vectorized pair-count pass + one pair-vocab exchange + a broadcast
    merge pass.  ``small_threshold`` gates the single-task path (the
    identical algorithm — merges match by construction)."""
    import ray

    vocab = word_counts(docs_ds, text_col).materialize()
    n_words = vocab.count()
    if n_words == 0:
        return pd.DataFrame({"merge_idx": pd.Series(dtype="int64"),
                             "left": pd.Series(dtype="object"),
                             "right": pd.Series(dtype="object"),
                             "freq": pd.Series(dtype="int64")})

    if n_words <= small_threshold:
        @ray.remote
        def _small(*parts):
            words, counts = [], []
            for p in parts:
                if p.num_rows:
                    words.extend(p["word"].to_pylist())
                    counts.extend(p["n"].to_numpy(zero_copy_only=False))
            order = np.argsort(np.asarray(words, dtype=object))
            words = [words[i] for i in order]
            counts = np.asarray(counts, dtype=np.int64)[order]
            return _train_seq(words, counts, num_merges)

        merges = ray.get(_small.remote(*vocab.to_arrow_refs()))
    else:
        # distributed rounds over the encoded-vocab Dataset
        def _encode(t: pa.Table) -> pa.Table:
            return pa.table({
                "w": pa.array([_SEP.join(x) for x in
                               t["word"].to_pylist()], pa.string()),
                "n": t["n"].combine_chunks()})

        enc = vocab.map_batches(_encode,
                                batch_format="pyarrow").materialize()
        merges = []
        for _ in range(num_merges):
            def _pairs(t: pa.Table) -> pa.Table:
                c = _pair_counts_block(
                    t["w"].to_pylist(),
                    t["n"].to_numpy(zero_copy_only=False))
                ls, rs, ns = [], [], []
                for (a, b), n in c.items():
                    ls.append(a)
                    rs.append(b)
                    ns.append(n)
                return pa.table({"l": pa.array(ls, pa.string()),
                                 "r": pa.array(rs, pa.string()),
                                 "c": pa.array(ns, pa.int64())})

            agg = enc.map_batches(_pairs, batch_format="pyarrow") \
                .groupby(["l", "r"]).sum("c")
            # the argmax row: highest count, lexicographically smallest
            # pair — a 1-row sort+limit, never a full collect
            top = agg.sort(["sum(c)", "l", "r"],
                           descending=[True, False, False]).take(1)
            if not top:
                break
            left, right = top[0]["l"], top[0]["r"]
            freq = int(top[0]["sum(c)"])
            merges.append((left, right, freq))
            pat = _SEP.join((left, right))

            def _apply(t: pa.Table, _l=left, _r=right,
                       _p=pat) -> pa.Table:
                ws = t["w"].to_pylist()
                return pa.table({
                    "w": pa.array(
                        [_merge_word(w, _l, _r) if _p in w else w
                         for w in ws], pa.string()),
                    "n": t["n"].combine_chunks()})

            enc = enc.map_batches(_apply,
                                  batch_format="pyarrow").materialize()

    return pd.DataFrame({
        "merge_idx": np.arange(len(merges), dtype=np.int64),
        "left": [m[0] for m in merges],
        "right": [m[1] for m in merges],
        "freq": np.asarray([m[2] for m in merges], dtype=np.int64)})
