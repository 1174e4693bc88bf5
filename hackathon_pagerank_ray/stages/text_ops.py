"""Text-analysis operators for training-data pipelines.

Beyond-the-reference ops (task brief): token counting (the reference's
tokenizer semantics, api/tfidf_index.py:23-28), language-ID by stopword
n-gram heuristic, quality scoring, and rolling-hash document fingerprints.
All are stateful ``map_batches`` stages: regexes/tables compile once per
actor; per-batch work runs over pandas/numpy.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# re.UNICODE is REQUIRED reference parity (api/tfidf_index.py:23-28 uses
# Python's default Unicode \w).  ORACLE CAVEAT (ADVICE r3): the DuckDB
# twins' RE2 \w is effectively ASCII, so the SQL oracles match only on
# ASCII corpora (all committed fixtures/testdata are).  A non-ASCII
# corpus diverges from the SQL twin by design, never from the reference;
# textrank (no reference counterpart) pins re.ASCII instead to stay
# twin-exact.
TOKEN_RE = re.compile(r"\b\w+\b", re.UNICODE)

# small, deterministic per-language function-word profiles
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "on", "for",
           "with", "as", "was", "that", "this"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine",
           "zu", "den", "von", "im", "auf", "für"},
    "fr": {"le", "la", "les", "et", "de", "des", "un", "une", "est", "dans",
           "que", "pour", "sur", "avec", "pas"},
}
_STOPWORDS_EN = _LANG_PROFILES["en"]


def tokenize(text: str) -> list[str]:
    """Reference tokenizer: lowercase ``\\b\\w+\\b`` matches
    (api/tfidf_index.py:23-28)."""
    return [t.lower() for t in TOKEN_RE.findall(text or "")]


class TokenCount:
    """(id, text) → + ``n_tokens`` (int64)."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.re = TOKEN_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["n_tokens"] = [
            len(self.re.findall(t or "")) for t in batch[self.text_col]
        ]
        return batch


class QualityScore:
    """Heuristic quality features: char length, token count, mean token
    length, stopword ratio, alpha ratio, punctuation density."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.re = TOKEN_RE
        self.stop = _STOPWORDS_EN
        self.punct = re.compile(r"[.,;:!?]")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        n_chars, n_tok, mean_len, stop_r, alpha_r, punct_d = [], [], [], [], [], []
        for t in batch[self.text_col]:
            t = t or ""
            toks = [x.lower() for x in self.re.findall(t)]
            n_chars.append(len(t))
            n_tok.append(len(toks))
            mean_len.append(sum(map(len, toks)) / len(toks) if toks else 0.0)
            stop_r.append(sum(x in self.stop for x in toks) / len(toks)
                          if toks else 0.0)
            alpha_r.append(sum(c.isalpha() for c in t) / len(t) if t else 0.0)
            punct_d.append(len(self.punct.findall(t)) / len(t) if t else 0.0)
        batch["n_chars"] = np.asarray(n_chars, dtype=np.int64)
        batch["n_tokens"] = np.asarray(n_tok, dtype=np.int64)
        batch["mean_token_len"] = mean_len
        batch["stopword_ratio"] = stop_r
        batch["alpha_ratio"] = alpha_r
        batch["punct_density"] = punct_d
        return batch


class LanguageId:
    """Deterministic function-word language ID → ``lang_pred``/``lang_conf``.

    Scores each language by the fraction of tokens found in its profile;
    argmax with alphabetical tie-break; ``"und"`` when no profile token is
    seen."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.re = TOKEN_RE
        self.profiles = sorted(_LANG_PROFILES.items())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        preds, confs = [], []
        for t in batch[self.text_col]:
            toks = [x.lower() for x in self.re.findall(t or "")]
            if not toks:
                preds.append("und")
                confs.append(0.0)
                continue
            best_lang, best = "und", 0.0
            for lang, prof in self.profiles:
                score = sum(x in prof for x in toks) / len(toks)
                if score > best:
                    best_lang, best = lang, score
            preds.append(best_lang if best > 0 else "und")
            confs.append(best)
        batch["lang_pred"] = preds
        batch["lang_conf"] = confs
        return batch


_FP_BASE = np.uint64(1099511628211)      # FNV-ish multiplier
_FP_OFFSET = np.uint64(14695981039346656037)


def _fnv1a_bytes(data: bytes) -> int:
    h = int(_FP_OFFSET)
    for b in data:
        h = ((h ^ b) * int(_FP_BASE)) & 0xFFFFFFFFFFFFFFFF
    return h


def token_hashes(tokens: list[str]) -> np.ndarray:
    """Deterministic 64-bit hash per token (FNV-1a over utf-8)."""
    return np.fromiter((_fnv1a_bytes(t.encode("utf-8")) for t in tokens),
                       dtype=np.uint64, count=len(tokens))


def shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """Rolling k-token shingle fingerprints (polynomial combine of token
    hashes) — the document-fingerprinting primitive shared by MinHash and
    winnowing."""
    th = token_hashes(tokens)
    if len(th) < k:
        return np.unique(th)
    with np.errstate(over="ignore"):
        acc = th[: len(th) - k + 1].copy()
        for i in range(1, k):
            acc = acc * _FP_BASE + th[i: len(th) - k + 1 + i]
    return np.unique(acc)


class Fingerprint:
    """Whole-document fingerprint (order-sensitive rolling hash) plus a
    winnowed min-sample of shingle hashes."""

    def __init__(self, text_col: str = "text", k: int = 3, sample: int = 8):
        self.text_col = text_col
        self.k = k
        self.sample = sample

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        fps, mins = [], []
        for t in batch[self.text_col]:
            toks = tokenize(t)
            fps.append(np.int64(np.uint64(
                _fnv1a_bytes(" ".join(toks).encode("utf-8")))
                .astype(np.int64)))
            sh = shingle_hashes(toks, self.k)
            sel = np.sort(sh)[: self.sample]
            mins.append(sel.astype(np.int64).tolist())
        batch["fingerprint"] = np.asarray(fps, dtype=np.int64)
        batch["min_shingles"] = mins
        return batch


#: PII-style scrub patterns — written to the common subset of Python ``re``
#: and RE2 (no lookaround, no backrefs; ``\1`` group refs in the
#: REPLACEMENT are fine in both) so a DuckDB ``regexp_replace`` /
#: ``regexp_extract_all`` oracle computes the identical result.
#: The email pattern anchors the LOCAL PART at a left boundary
#: (``(^|[^local-char])`` captured and re-emitted by the replacement):
#: a hostile 100 KB local-char run then has exactly ONE viable start
#: position, so Python re stays linear even with the unbounded ``+`` on
#: the local part — and, unlike the r4 bounded ``{1,64}`` form, a
#: >64-char local is redacted IN FULL instead of leaving its head in
#: clear next to the placeholder (ADVICE r4).  Domain quantifiers stay
#: RFC-bounded (labels ≤63×9, TLD ≤24) to cap per-start domain
#: backtracking at a constant.
_REDACT_PATTERNS = (
    ("email",
     r"(^|[^A-Za-z0-9._%+-])[A-Za-z0-9._%+-]+@[A-Za-z0-9-]{1,63}"
     r"(?:\.[A-Za-z0-9-]{1,63}){0,8}\.[A-Za-z]{2,24}", "\\1<EMAIL>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


class Redact:
    """(id, text) → + ``text_redacted``, ``n_emails``, ``n_phones``,
    ``n_ips`` — the scrub pass a training-data pipeline runs before
    publishing a corpus (emails / phone numbers / IPv4 literals replaced
    by typed placeholder tokens).

    Replacement is sequential (email → phone → ip) so an already-redacted
    span can't be re-matched by a later pattern; the per-category counts
    are computed independently on the ORIGINAL text (that is also what a
    SQL oracle naturally measures).  Patterns avoid lookaround/backrefs so
    Python ``re`` and RE2 (DuckDB) agree byte-for-byte.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.pats = [(name, re.compile(p), repl)
                     for name, p, repl in _REDACT_PATTERNS]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        red, counts = [], {name: [] for name, _, _ in self.pats}
        for t in batch[self.text_col]:
            t = t or ""
            out = t
            for name, rx, repl in self.pats:
                counts[name].append(len(rx.findall(t)))
                out = rx.sub(repl, out)
            red.append(out)
        batch["text_redacted"] = red
        batch["n_emails"] = np.asarray(counts["email"], dtype=np.int64)
        batch["n_phones"] = np.asarray(counts["phone"], dtype=np.int64)
        batch["n_ips"] = np.asarray(counts["ip"], dtype=np.int64)
        return batch


class RepetitionStats:
    """(id, text) → + ``dup_line_frac``, ``top_bigram_frac`` — the
    repetition signals web-scale quality filters cut on (the
    Gopher/MassiveText family of rules): boilerplate and
    machine-generated spam repeat lines and n-grams far more than
    prose.

    - ``dup_line_frac``: 1 − distinct/total over the non-empty lines
      (``\\n``-split, exact string match); 0.0 for a document with no
      non-empty lines.
    - ``top_bigram_frac``: occurrences of the most frequent token
      bigram / total bigrams (reference tokenizer, lowercase
      ``\\w+``); 0.0 with fewer than 2 tokens.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.re = TOKEN_RE

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from collections import Counter
        dup, big = [], []
        for t in batch[self.text_col]:
            lines = [l for l in (t or "").split("\n") if len(l) > 0]
            dup.append(0.0 if not lines
                       else 1.0 - len(set(lines)) / len(lines))
            toks = [x.lower() for x in self.re.findall(t or "")]
            if len(toks) < 2:
                big.append(0.0)
            else:
                counts = Counter(zip(toks, toks[1:]))
                big.append(max(counts.values()) / (len(toks) - 1))
        batch["dup_line_frac"] = np.asarray(dup, dtype=np.float64)
        batch["top_bigram_frac"] = np.asarray(big, dtype=np.float64)
        return batch


# These stages are plain-task map_batches with worker-process-cached
# operator state (functools.lru_cache): the state here is a compiled regex
# and a few small sets, and Ray throttles NEW actor starts for seconds
# after any Dataset execution, so a per-query actor pool costs more to
# spin up than the whole stage runs.  (The page-parse stage reached the
# same conclusion — see stages/extract_stage.parse_pages; the one
# remaining actor pool is the multimodal decode stub, whose real-codec
# version would hold heavy per-actor state.)

from functools import lru_cache


@lru_cache(maxsize=16)
class Readability:
    """LIX readability per doc: ``n_words``, ``n_sents`` ([.!?]+ runs)
    and ``lix = w/max(s,1) + 100·lw/w`` where lw = words longer than 6
    chars (Björnsson's läsbarhetsindex — the standard long-word
    formulation, language-agnostic unlike syllable-based indices).
    Empty docs get lix 0.0.  Every float op mirrors the SQL twin's
    parenthesization."""

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.re = TOKEN_RE
        self.sent = re.compile(r"[.!?]+")

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        w_out, s_out, lix = [], [], []
        for t in batch[self.text_col]:
            toks = self.re.findall(t or "")
            w = len(toks)
            lw = sum(1 for x in toks if len(x) > 6)
            s = len(self.sent.findall(t or ""))
            w_out.append(w)
            s_out.append(s)
            lix.append(0.0 if w == 0
                       else (w / max(s, 1)) + (100.0 * lw) / w)
        batch["n_words"] = pd.Series(w_out, dtype="int64",
                                     index=batch.index)
        batch["n_sents"] = pd.Series(s_out, dtype="int64",
                                     index=batch.index)
        batch["lix"] = pd.Series(lix, dtype="float64", index=batch.index)
        return batch


def _cached_op(cls_name: str, text_col: str):
    cls = {"TokenCount": TokenCount, "QualityScore": QualityScore,
           "LanguageId": LanguageId, "Fingerprint": Fingerprint,
           "RepetitionStats": RepetitionStats, "Redact": Redact,
           "Readability": Readability}[cls_name]
    return cls(text_col)


def _task_stage(ds, cls_name: str, text_col: str):
    def _fn(batch: pd.DataFrame) -> pd.DataFrame:
        return _cached_op(cls_name, text_col)(batch)
    return ds.map_batches(_fn, batch_format="pandas")


def add_token_counts(ds, text_col: str = "text", concurrency=None):
    return _task_stage(ds, "TokenCount", text_col)


def add_quality_scores(ds, text_col: str = "text", concurrency=None):
    return _task_stage(ds, "QualityScore", text_col)


def add_language_id(ds, text_col: str = "text", concurrency=None):
    return _task_stage(ds, "LanguageId", text_col)


def add_fingerprints(ds, text_col: str = "text", concurrency=None):
    return _task_stage(ds, "Fingerprint", text_col)


def add_repetition_stats(ds, text_col: str = "text", concurrency=None):
    return _task_stage(ds, "RepetitionStats", text_col)


def add_redaction(ds, text_col: str = "text", concurrency=None):
    return _task_stage(ds, "Redact", text_col)


def add_readability(ds, text_col: str = "text", concurrency=None):
    return _task_stage(ds, "Readability", text_col)


def top_ngrams(docs_ds, text_col: str = "text", n: int = 2, k: int = 100):
    """Global top-k word n-grams by corpus count — the n-gram frequency
    table every corpus-statistics / contamination pipeline starts from.

    Per-block Counter partials (each block contributes each of its
    distinct n-grams once, pre-summed) → one ``groupby(ngram).sum()``
    exchange → tiny deterministic top-k ordered by (count desc, ngram).
    """
    from collections import Counter

    from .relational import topk

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for text in batch[text_col]:
            toks = tokenize(text)
            c.update(" ".join(toks[i:i + n])
                     for i in range(len(toks) - n + 1))
        if not c:
            return pd.DataFrame({"ngram": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        return pd.DataFrame({"ngram": list(c.keys()),
                             "n": np.fromiter(c.values(), dtype=np.int64)})

    import pyarrow as pa

    from .schema_util import enforce_schema
    partials = enforce_schema(
        docs_ds.map_batches(_partial, batch_format="pandas"),
        pa.schema([("ngram", pa.string()), ("n", pa.int64())]))
    totals = (partials.groupby("ngram").sum("n")
              .rename_columns({"sum(n)": "n"}))
    return topk(totals, ["n", "ngram"], k, descending=[True, False])


def bpe_pair_counts(docs_ds, text_col: str = "text", k: int = 100):
    """Top-k adjacent CHARACTER pairs inside tokens, weighted by corpus
    token frequency — the merge-candidate table of the first BPE
    (byte-pair-encoding) vocabulary-training step.

    Two-level shape (vocab ≪ corpus): per-block token Counter partials →
    one ``groupby(token).sum`` over the vocabulary → per DISTINCT token,
    explode its len−1 character pairs × its corpus frequency (vocab-sized
    work, not corpus-sized) → one ``groupby(pair).sum`` over the pair
    alphabet (bounded by |chars|²) → deterministic top-k
    (count desc, pair asc).
    """
    from collections import Counter

    import pyarrow as pa

    from .relational import topk
    from .schema_util import enforce_schema

    def _tok_partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for text in batch[text_col]:
            c.update(tokenize(text))
        if not c:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        return pd.DataFrame({"token": list(c.keys()),
                             "n": np.fromiter(c.values(), dtype=np.int64)})

    vocab = enforce_schema(
        docs_ds.map_batches(_tok_partial, batch_format="pandas"),
        pa.schema([("token", pa.string()), ("n", pa.int64())])) \
        .groupby("token").sum("n")

    def _pairs(batch: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for tok, freq in zip(batch["token"], batch["sum(n)"]):
            f = int(freq)
            for i in range(len(tok) - 1):
                c[tok[i:i + 2]] += f
        if not c:
            return pd.DataFrame({"pair": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64")})
        return pd.DataFrame({"pair": list(c.keys()),
                             "n": np.fromiter(c.values(), dtype=np.int64)})

    pairs = enforce_schema(
        vocab.map_batches(_pairs, batch_format="pandas"),
        pa.schema([("pair", pa.string()), ("n", pa.int64())])) \
        .groupby("pair").sum("n")
    pairs = pairs.map_batches(
        lambda t: t.rename_columns(["pair", "n"]), batch_format="pyarrow")
    return topk(pairs, ["n", "pair"], k, descending=[True, False])


#: fixed logistic quality-classifier weights — a deterministic stand-in
#: for a trained fastText/regression quality model (the container has no
#: model artifacts; the SCORING plumbing — per-actor weight load, batched
#: vectorized inference — is the real surface).  Order matters: the
#: score folds left-to-right exactly as the SQL twin writes it.
_QM_BIAS = -1.5
_QM_WEIGHTS = (
    ("n_tokens", 0.002),
    ("mean_token_len", 0.25),
    ("stopword_ratio", 3.0),
    ("alpha_ratio", 1.2),
    ("punct_density", -8.0),
)


class QualityModel:
    """Batched model inference over the six quality signals: weights are
    "loaded" once per actor in ``__init__`` (the model-load-per-actor
    pattern; swap the constants for a real artifact read), and
    ``__call__`` scores a batch with one vectorized pass —
    ``score = round(sigmoid(bias + Σ w_i·f_i), 6)``.
    """

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.features = QualityScore(text_col)
        self.bias = _QM_BIAS
        self.weights = list(_QM_WEIGHTS)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch = self.features(batch)
        z = np.full(len(batch), self.bias, dtype=np.float64)
        for col, w in self.weights:          # fixed left-to-right fold
            z = z + w * batch[col].to_numpy(dtype=np.float64)
        batch["quality_score"] = np.round(1.0 / (1.0 + np.exp(-z)), 6)
        return batch


def add_quality_model(ds, text_col: str = "text", batch_size: int = 256,
                      concurrency=4):
    """Actor-pool quality-model scoring stage (see :class:`QualityModel`)."""
    return ds.map_batches(
        QualityModel, fn_constructor_kwargs=dict(text_col=text_col),
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency)


def doc_length_histogram(docs_ds, text_col: str = "text"):
    """Log2-bucketed token-length histogram of the corpus — the
    length-distribution profile a data pipeline reports before choosing
    packing/truncation budgets.  ``bucket = (n_tokens+1).bit_length()-1``
    (== floor(log2(n+1)) in exact integer arithmetic); per-block partial
    Counters shrink the exchange to ≤ 64 rows per block.  Returns
    ``(bucket, lo, hi, n_docs, total_tokens)``."""
    import pyarrow as pa

    def _partial(t: pa.Table) -> pa.Table:
        bks, nds, tts = {}, {}, {}
        for text in t[text_col].to_pylist():
            n = len(TOKEN_RE.findall(text or ""))
            b = (n + 1).bit_length() - 1
            nds[b] = nds.get(b, 0) + 1
            tts[b] = tts.get(b, 0) + n
        ks = sorted(nds)
        return pa.table({
            "bucket": pa.array(ks, pa.int64()),
            "n_docs": pa.array([nds[k] for k in ks], pa.int64()),
            "total_tokens": pa.array([tts[k] for k in ks], pa.int64())})

    agg = (docs_ds.map_batches(_partial, batch_format="pyarrow")
           .groupby("bucket").sum(["n_docs", "total_tokens"]))

    def _final(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(b),
            "lo": pa.array((1 << b.astype(np.int64)) - 1, pa.int64()),
            "hi": pa.array((1 << (b.astype(np.int64) + 1)) - 2,
                           pa.int64()),
            "n_docs": t["sum(n_docs)"].combine_chunks(),
            "total_tokens": t["sum(total_tokens)"].combine_chunks()})

    return agg.map_batches(_final, batch_format="pyarrow")


def pmi_collocations(docs_ds, text_col: str = "text", k: int = 100,
                     min_count: int = 5,
                     broadcast_max_vocab: int = 5_000_000):
    """Top-``k`` bigram collocations by pointwise mutual information —
    the collocation-detection pass (phrase mining, tokenizer-vocab
    candidates) over the corpus.

    ``pmi(a,b) = ln( (B(a,b)·T_uni²) / (T_bi·U(a)·U(b)) )`` with exact
    integer counts folded into the double formula in a FIXED order
    (mirrored by the SQL twin), bigrams below ``min_count`` dropped,
    6dp rounding, ties (pmi desc, ngram asc).  Unigram counts broadcast
    as a worker-assembled dict below ``broadcast_max_vocab`` terms
    (cached per worker); the at-scale fallback is the hash join."""
    from collections import Counter

    import pyarrow as pa
    import ray

    from .broadcast import cached_get
    from .relational import rename, topk
    from .schema_util import enforce_schema

    def _uni(batch: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for text in batch[text_col]:
            c.update(tokenize(text))
        return pd.DataFrame({"word": list(c.keys()),
                             "n": np.fromiter(c.values(), dtype=np.int64,
                                              count=len(c))})

    def _bi(batch: pd.DataFrame) -> pd.DataFrame:
        c = Counter()
        for text in batch[text_col]:
            toks = tokenize(text)
            c.update(" ".join(toks[i:i + 2])
                     for i in range(len(toks) - 1))
        return pd.DataFrame({"ngram": list(c.keys()),
                             "n": np.fromiter(c.values(), dtype=np.int64,
                                              count=len(c))})

    uni = enforce_schema(
        docs_ds.map_batches(_uni, batch_format="pandas"),
        pa.schema([("word", pa.string()), ("n", pa.int64())])) \
        .groupby("word").sum("n")
    uni = rename(uni, {"sum(n)": "n"}).materialize()
    bi = enforce_schema(
        docs_ds.map_batches(_bi, batch_format="pandas"),
        pa.schema([("ngram", pa.string()), ("n", pa.int64())])) \
        .groupby("ngram").sum("n")
    bi = rename(bi, {"sum(n)": "n"}).materialize()

    t_uni = int(sum(r["s"] for r in uni.map_batches(
        lambda t: pa.table({"s": pa.array(
            [int(t["n"].to_numpy(zero_copy_only=False).sum())
             if t.num_rows else 0], pa.int64())}),
        batch_format="pyarrow").take_all()))
    t_bi = int(sum(r["s"] for r in bi.map_batches(
        lambda t: pa.table({"s": pa.array(
            [int(t["n"].to_numpy(zero_copy_only=False).sum())
             if t.num_rows else 0], pa.int64())}),
        batch_format="pyarrow").take_all()))
    if t_bi == 0:
        return pd.DataFrame({"ngram": pd.Series(dtype="object"),
                             "n": pd.Series(dtype="int64"),
                             "pmi": pd.Series(dtype="float64")})

    n_vocab = uni.count()
    if n_vocab > broadcast_max_vocab:
        raise NotImplementedError(
            "pmi_collocations above the broadcast vocab gate needs the "
            "two-sided hash-join plan; raise broadcast_max_vocab or "
            "pre-prune the corpus")

    @ray.remote
    def _umap(*parts):
        out = {}
        for p in parts:
            if p.num_rows:
                out.update(zip(p["word"].to_pylist(),
                               p["n"].to_numpy(zero_copy_only=False)))
        return out

    uref = _umap.remote(*uni.to_arrow_refs())

    def _score(t: pa.Table) -> pa.Table:
        um = cached_get(uref)
        ngrams = t["ngram"].to_pylist()
        b = t["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = b >= min_count
        ua = np.empty(len(ngrams))
        ub = np.empty(len(ngrams))
        for i, g in enumerate(ngrams):
            if keep[i]:
                a, bb = g.split(" ", 1)
                ua[i] = um[a]
                ub[i] = um[bb]
            else:
                ua[i] = ub[i] = 1.0
        # fixed fold order — mirrored verbatim by the SQL twin
        pmi = np.round(np.log((b * t_uni * t_uni) / (t_bi * ua * ub)), 6)
        return pa.table({
            "ngram": pa.array(ngrams, pa.string()),
            "n": pa.array(b.astype(np.int64)),
            "pmi": pa.array(pmi, pa.float64())}).filter(pa.array(keep))

    scored = bi.map_batches(_score, batch_format="pyarrow")
    return topk(scored, ["pmi", "ngram"], k, descending=[True, False])
