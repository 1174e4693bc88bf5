"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (task brief: first-class training-data ops).

All pipelines follow the scale shape from the brief:
shingle→minhash per batch (actor pool) → band explode →
``groupby(band, bucket)`` (the LSH shuffle) → candidate pairs →
vectorized verification → connected components over the dup graph via the
sharded min-label engine.  Nothing materializes the corpus on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .broadcast import cached_get
from .text_ops import shingle_hashes, tokenize, _fnv1a_bytes

_MERSENNE = (1 << 61) - 1


def _perm_params(num_perm: int, seed: int = 1234):
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.int64).astype(np.uint64)
    return a, b


class MinHasher:
    """(id, text) → minhash signature column ``sig`` (list<int64>)."""

    def __init__(self, text_col="text", k: int = 3, num_perm: int = 64,
                 seed: int = 1234):
        self.text_col = text_col
        self.k = k
        self.num_perm = num_perm
        self.a, self.b = _perm_params(num_perm, seed)

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_hashes(tokenize(text), self.k)
        if len(sh) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        with np.errstate(over="ignore"):
            # (num_perm, n) universal hashes, min over shingles
            hashed = (np.outer(self.a, sh) + self.b[:, None]) % _MERSENNE
        return hashed.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        batch["sig"] = [self.signature(t).astype(np.int64).tolist()
                        for t in batch[self.text_col]]
        return batch


from functools import lru_cache


@lru_cache(maxsize=8)
def _cached_minhasher(text_col: str, k: int, num_perm: int, seed: int):
    return MinHasher(text_col, k, num_perm, seed)


def minhash_signatures(docs_ds, text_col="text", k=3, num_perm=64,
                       seed=1234, concurrency=None):
    """Plain-task stage with worker-process-cached hasher state: the
    MinHash permutation table is tiny, and Ray throttles NEW actor starts
    for seconds after any Dataset execution, so an actor pool here costs
    more to spin up than the whole stage — tasks reuse already-warm
    workers.  (Actor pools stay the right shape for HEAVY state: models,
    big lookup tables — see stages/extract_stage.)"""
    def _sig(batch: pd.DataFrame) -> pd.DataFrame:
        return _cached_minhasher(text_col, k, num_perm, seed)(batch)

    return docs_ds.map_batches(_sig, batch_format="pandas")


def lsh_band_table(sig_ds, id_col="doc_id", num_perm=64, bands=16):
    """Explode signatures into (band, bucket, id) rows — one row per band,
    bucket = FNV-style fold of that band's signature slice (fully
    vectorized: one numpy pass per batch, no per-doc Python loop)."""
    rows_per_band = num_perm // bands

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        sigs = np.asarray([np.asarray(s, dtype=np.uint64)
                           for s in batch["sig"]])
        chunks = sigs.reshape(n, bands, rows_per_band)
        with np.errstate(over="ignore"):
            h = np.full((n, bands), 14695981039346656037, dtype=np.uint64)
            for r in range(rows_per_band):       # r is tiny (num_perm/bands)
                h = (h ^ chunks[:, :, r]) * np.uint64(1099511628211)
        ids = np.repeat(np.asarray(batch[id_col]), bands)
        band_ids = np.tile(np.arange(bands, dtype=np.int64), n)
        return pd.DataFrame({id_col: ids, "band": band_ids,
                             "bucket": h.reshape(-1).astype(np.int64)})

    return sig_ds.map_batches(_explode, batch_format="pandas")


def _bucket_pairs(ids: np.ndarray, max_bucket: int):
    """Pair ids within one LSH bucket with a hard size bound.

    ≤ ``max_bucket`` members → all pairs (exhaustive).  Larger buckets
    (mass-duplicated boilerplate / empty docs) switch to STAR pairing
    against the min id — O(b) pairs instead of O(b²), and the dup cluster
    is still recovered by the verify → connected-components pass because a
    star keeps every true duplicate connected to the hub.  Deterministic
    (ids sorted)."""
    ids = np.unique(ids)
    if len(ids) < 2:
        empty = np.zeros(0, dtype=ids.dtype)
        return empty, empty
    if len(ids) <= max_bucket:
        i, j = np.triu_indices(len(ids), k=1)
        return ids[i], ids[j]
    return np.full(len(ids) - 1, ids[0]), ids[1:]


def candidate_pairs(band_ds, id_col="doc_id", max_bucket: int = 256,
                    small_threshold: int = 500_000):
    """groupby(band, bucket) → in-bucket pairs (a < b), deduped.

    Bounded per bucket: a hot bucket (identical signatures, boilerplate)
    degrades to linear star pairing instead of a quadratic
    ``triu_indices`` blow-up in a single ``map_groups`` task.

    Adaptive execution: a band table under ``small_threshold`` rows skips
    the distributed hash shuffle (whose aggregator-pool spin-up costs
    seconds regardless of data size) and runs the groupby in one task;
    the distributed path is the default shape at corpus scale."""
    # streaming count: the big path consumes band_ds exactly once (the
    # bucket groupby), so only a gate-bounded table is ever pinned
    if band_ds.count() <= small_threshold:
        band_ds = band_ds.materialize()
        def _all_pairs(df: pd.DataFrame) -> pd.DataFrame:
            bnd = df["band"].to_numpy()
            bkt = df["bucket"].to_numpy()
            ids = df[id_col].to_numpy()
            order = np.lexsort((ids, bkt, bnd))
            bnd, bkt, ids = bnd[order], bkt[order], ids[order]
            boundary = np.ones(len(bnd), dtype=bool)
            boundary[1:] = (bnd[1:] != bnd[:-1]) | (bkt[1:] != bkt[:-1])
            gstart = np.flatnonzero(boundary)
            gend = np.append(gstart[1:], len(bnd))
            keep = (gend - gstart) >= 2      # singleton buckets never pair
            outs_a, outs_b = [], []
            for s, e in zip(gstart[keep], gend[keep]):
                pa_, pb_ = _bucket_pairs(ids[s:e], max_bucket)
                outs_a.append(pa_)
                outs_b.append(pb_)
            if not outs_a:
                e64 = pd.Series(dtype="int64")
                return pd.DataFrame({"a": e64, "b": e64})
            out = pd.DataFrame({"a": np.concatenate(outs_a),
                                "b": np.concatenate(outs_b)})
            return out.drop_duplicates(["a", "b"], ignore_index=True)

        return band_ds.repartition(1).map_batches(
            _all_pairs, batch_format="pandas", batch_size=None)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = _bucket_pairs(g[id_col].to_numpy(), max_bucket)
        return pd.DataFrame({"a": a, "b": b})

    pairs = band_ds.groupby(["band", "bucket"]).map_groups(
        _pairs, batch_format="pandas")
    from .relational import distinct
    return distinct(pairs, ["a", "b"])


def _jaccard(t1: str, t2: str, k: int) -> float:
    s1 = shingle_hashes(tokenize(t1), k)
    s2 = shingle_hashes(tokenize(t2), k)
    if len(s1) == 0 and len(s2) == 0:
        return 1.0
    inter = len(np.intersect1d(s1, s2, assume_unique=True))
    union = len(s1) + len(s2) - inter
    return inter / union if union else 0.0


def verify_pairs_jaccard(pairs_ds, docs_ds, id_col="doc_id", text_col="text",
                         k=3, threshold=0.7, num_partitions=16,
                         broadcast_threshold: int = 100_000):
    """Join candidate texts back and compute exact n-gram Jaccard — keeps
    pairs ≥ threshold.

    Adaptive: when the candidate set is small (≤ ``broadcast_threshold``
    pairs — the common case after LSH banding), the candidate ids are
    broadcast with ``ray.put`` and the texts arrive via a shuffle-free
    ``isin`` filter; at scale it falls back to two hash joins (a then b).
    Verification is vectorized per pair batch either way."""
    import ray

    pairs_ds = pairs_ds.materialize()
    if pairs_ds.count() <= broadcast_threshold:
        pair_df = pairs_ds.to_pandas()
        need = np.unique(np.concatenate([pair_df["a"].to_numpy(),
                                         pair_df["b"].to_numpy()]))
        need_ref = ray.put(need)
        texts = docs_ds.map_batches(
            lambda b: b[b[id_col].isin(ray.get(need_ref))],
            batch_format="pandas").to_pandas()
        lookup_ref = ray.put(dict(zip(texts[id_col], texts[text_col])))

        def _verify_bc(batch: pd.DataFrame) -> pd.DataFrame:
            lut = cached_get(lookup_ref)
            jac = [_jaccard(lut.get(x, ""), lut.get(y, ""), k)
                   for x, y in zip(batch["a"], batch["b"])]
            out = batch[["a", "b"]].copy()
            out["jaccard"] = jac
            return out[out["jaccard"] >= threshold]

        return pairs_ds.map_batches(_verify_bc, batch_format="pandas")

    from .relational import inner_join
    d_a = docs_ds.select_columns([id_col, text_col]).rename_columns(
        {id_col: "a", text_col: "text_a"})
    d_b = docs_ds.select_columns([id_col, text_col]).rename_columns(
        {id_col: "b", text_col: "text_b"})
    joined = inner_join(inner_join(pairs_ds, d_a, on="a",
                                   num_partitions=num_partitions),
                        d_b, on="b", num_partitions=num_partitions)

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        jac = [_jaccard(x, y, k)
               for x, y in zip(batch["text_a"], batch["text_b"])]
        batch = batch[["a", "b"]].copy()
        batch["jaccard"] = jac
        return batch[batch["jaccard"] >= threshold]

    return joined.map_batches(_verify, batch_format="pandas")


def near_dup_groups(verified_pairs_ds, universe_ids_ds=None, id_col="doc_id",
                    num_owners=4):
    """Dup-pair graph → connected components via the sharded min-label
    engine; returns (doc_id, group) where group = min doc_id of the
    near-dup cluster."""
    import ray.data as rd

    from ..graph.engine import ShardedGraph, connected_components

    edges = verified_pairs_ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["a"].combine_chunks().cast(pa.int64()),
             t["b"].combine_chunks().cast(pa.int64())],
            names=["src", "dst"]),
        batch_format="pyarrow")
    if edges.count() == 0:
        if universe_ids_ds is None:
            return None
        return universe_ids_ds.map_batches(
            lambda t: pa.Table.from_arrays(
                [t[id_col].combine_chunks(), t[id_col].combine_chunks()],
                names=[id_col, "group"]),
            batch_format="pyarrow")

    g = ShardedGraph.build(edges, num_owners=num_owners, undirected=True)
    try:
        labels, _ = connected_components(g)
        labels = labels.materialize()
    finally:
        g.shutdown()
    out = labels.rename_columns({"vid": id_col, "label": "group"})
    if universe_ids_ds is not None:
        from .relational import inner_join
        out = inner_join(universe_ids_ds.select_columns([id_col]), out,
                         on=id_col, num_partitions=4)
    return out


def minhash_dedup(docs_ds, id_col="doc_id", text_col="text", k=3,
                  num_perm=64, bands=16, threshold=0.7, num_partitions=8):
    """Full MinHash-LSH near-dedup: returns (a, b, jaccard) verified pairs.

    Compose with :func:`near_dup_groups` for cluster labels.
    """
    sigs = minhash_signatures(docs_ds, text_col, k, num_perm).materialize()
    bands_ds = lsh_band_table(sigs, id_col, num_perm, bands)
    cands = candidate_pairs(bands_ds, id_col)
    return verify_pairs_jaccard(cands, docs_ds, id_col, text_col, k,
                                threshold, num_partitions)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    """64-bit SimHash over token hashes → ``simhash`` (int64) +
    16-bit band columns for hamming-bucket candidate generation."""

    def __init__(self, text_col="text"):
        self.text_col = text_col

    @staticmethod
    def simhash(tokens: list[str]) -> int:
        if not tokens:
            return 0
        from .text_ops import token_hashes
        th = token_hashes(tokens)
        bits = ((th[:, None] >> np.arange(64, dtype=np.uint64)) &
                np.uint64(1)).astype(np.int64)
        v = (2 * bits - 1).sum(axis=0)
        return int(((v > 0).astype(np.uint64) <<
                    np.arange(64, dtype=np.uint64)).sum())

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        hs = [self.simhash(tokenize(t)) for t in batch[self.text_col]]
        batch["simhash"] = np.asarray(hs, dtype=np.uint64).astype(np.int64)
        for band in range(4):
            batch[f"sh_band{band}"] = np.asarray(
                [(h >> (band * 16)) & 0xFFFF for h in hs], dtype=np.int64)
        return batch


@lru_cache(maxsize=8)
def _cached_simhasher(text_col: str):
    return SimHasher(text_col)


def simhash_signatures(docs_ds, text_col="text", concurrency=None):
    """Plain-task stage, worker-cached hasher (see minhash_signatures)."""
    def _sig(batch: pd.DataFrame) -> pd.DataFrame:
        return _cached_simhasher(text_col)(batch)

    return docs_ds.map_batches(_sig, batch_format="pandas")


def simhash_candidates(sig_ds, id_col="doc_id", max_hamming=3,
                       max_bucket: int = 256):
    """Pigeonhole: two 64-bit hashes within hamming distance 3 share at
    least one identical 16-bit quarter — bucket by each band, pair
    (star-capped like :func:`candidate_pairs`), then verify exact hamming
    distance.  Within a star-capped bucket, identical simhashes (the usual
    cause of hot buckets) all verify against the hub at hamming 0, so the
    mass-duplicate case stays linear AND fully recovered."""
    import pandas as pd

    # one signature pass feeds four band-groupbys — materialize or each
    # branch re-runs the SimHasher stage
    sig_ds = sig_ds.materialize()
    if sig_ds.count() <= 500_000:
        # adaptive small path: all four band-bucketings + hamming verify in
        # one task — skips 4 hash shuffles + a union + a distinct whose
        # fixed spin-up dwarfs the data (distributed path below at scale)
        def _small(df: pd.DataFrame) -> pd.DataFrame:
            sub = df.drop_duplicates(id_col).sort_values(id_col)
            ids = sub[id_col].to_numpy()
            hs = sub["simhash"].to_numpy()
            outs_a, outs_b = [], []
            for band in range(4):
                bb = sub[f"sh_band{band}"].to_numpy()
                order = np.argsort(bb, kind="stable")
                sb = bb[order]
                boundary = np.ones(len(sb), dtype=bool)
                boundary[1:] = sb[1:] != sb[:-1]
                gstart = np.flatnonzero(boundary)
                gend = np.append(gstart[1:], len(sb))
                for s, e in zip(gstart[gend - gstart >= 2],
                                gend[gend - gstart >= 2]):
                    pa_, pb_ = _bucket_pairs(ids[order[s:e]], max_bucket)
                    outs_a.append(pa_)
                    outs_b.append(pb_)
            if not outs_a:
                e64 = pd.Series(dtype="int64")
                return pd.DataFrame({"a": e64, "b": e64})
            cand = pd.DataFrame({"a": np.concatenate(outs_a),
                                 "b": np.concatenate(outs_b)})
            cand = cand.drop_duplicates(["a", "b"], ignore_index=True)
            lut = dict(zip(ids, hs.astype(np.uint64)))
            x = (cand["a"].map(lut).to_numpy().astype(np.uint64)
                 ^ cand["b"].map(lut).to_numpy().astype(np.uint64))
            ham = np.zeros(len(x), dtype=np.int64)
            for _ in range(64):
                ham += (x & np.uint64(1)).astype(np.int64)
                x >>= np.uint64(1)
            cand["hamming"] = ham
            return cand[cand["hamming"] <= max_hamming][["a", "b"]
                                                        ].reset_index(drop=True)

        return sig_ds.repartition(1).map_batches(
            _small, batch_format="pandas", batch_size=None)
    frames = []
    for band in range(4):
        def _pairs(g: pd.DataFrame, _band=band) -> pd.DataFrame:
            sub = g.drop_duplicates(id_col).sort_values(id_col)
            ids = sub[id_col].to_numpy()
            hs = sub["simhash"].to_numpy()
            if len(ids) < 2:
                e = pd.Series(dtype="int64")
                return pd.DataFrame({"a": e, "b": e, "ha": e, "hb": e})
            if len(ids) <= max_bucket:
                i, j = np.triu_indices(len(ids), k=1)
            else:
                i = np.zeros(len(ids) - 1, dtype=np.int64)
                j = np.arange(1, len(ids), dtype=np.int64)
            return pd.DataFrame({"a": ids[i], "b": ids[j],
                                 "ha": hs[i], "hb": hs[j]})

        frames.append(sig_ds.groupby(f"sh_band{band}").map_groups(
            _pairs, batch_format="pandas"))
    allp = frames[0]
    for f in frames[1:]:
        allp = allp.union(f)

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        a = batch["ha"].to_numpy().astype(np.uint64)
        b = batch["hb"].to_numpy().astype(np.uint64)
        x = a ^ b
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & np.uint64(1)).astype(np.int64)
            x >>= np.uint64(1)
        batch = batch[["a", "b"]].copy()
        batch["hamming"] = ham
        return batch[batch["hamming"] <= max_hamming]

    from .relational import distinct
    verified = allp.map_batches(_verify, batch_format="pandas")
    return distinct(verified, ["a", "b"])


# ---------------------------------------------------------------------------
# Exact dedup (content hash)
# ---------------------------------------------------------------------------

def exact_text_dedup(docs_ds, id_col="doc_id", text_col="text"):
    """Exact dedup by content: keep the MIN id per identical text.
    Returns (text_hash, keep_id, dup_count)."""
    def _hash(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch[[id_col, text_col]].copy()
        batch["text_hash"] = [np.uint64(_fnv1a_bytes(
            (t or "").encode("utf-8"))).astype(np.int64)
            for t in batch[text_col]]
        return batch[[id_col, "text_hash"]]

    hashed = docs_ds.map_batches(_hash, batch_format="pandas")
    from ray.data.aggregate import Count, Min
    return hashed.groupby("text_hash").aggregate(
        Min(id_col, alias_name="keep_id"),
        Count(alias_name="dup_count"))


# ---------------------------------------------------------------------------
# Cross-document line dedup (CCNet / RefinedWeb-style corpus-level signal)
# ---------------------------------------------------------------------------

def cross_doc_line_stats(docs_ds, id_col="doc_id", text_col="text",
                         num_partitions: int | None = None,
                         broadcast_max_dup_hashes: int = 8_000_000):
    """Per-document corpus-level duplicate-line profile: a line is
    *duplicated* when it occurs ≥2 times anywhere in the corpus (any
    document, repeats within one included) — the signal CCNet-family
    pipelines drop boilerplate lines on.

    Returns ``(id, n_lines, n_dup_lines, dup_line_frac_corpus)`` over
    non-empty ``\\n``-split lines; documents with no non-empty lines get
    ``(0, 0, 0.0)``.

    Scale shape: explode to pre-aggregated ``(id, line_hash, c)`` — an
    8-byte FNV-1a per line and a within-doc count, so the one corpus-wide
    shuffle (``groupby(hash)`` sum) moves deduplicated hashes, not text.
    Marking then adapts to the duplicated-hash count: ≤
    ``broadcast_max_dup_hashes`` (8 B each) the sorted dup-hash set is
    broadcast once via ``ray.put`` and the per-doc stats are recomputed
    batch-locally in a second pass over the docs (a document is one row,
    so its lines never straddle blocks) — ONE shuffle total; above the
    threshold it falls back to a hash join of the line table against the
    dup-hash set plus a schema-aligned union + ``groupby(id)`` merge.
    Unlike :func:`exact_text_dedup` (whole-document granularity) this
    catches shared headers/footers inside otherwise-unique documents.
    """
    import ray
    from ray.data.aggregate import Sum

    from .relational import default_num_partitions, inner_join, rename
    from .schema_util import drop_empty_blocks

    if num_partitions is None:
        num_partitions = default_num_partitions()

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, hashes, cnts = [], [], []
        for i, t in zip(batch[id_col], batch[text_col]):
            hs = [_fnv1a_bytes(line.encode("utf-8"))
                  for line in (t or "").split("\n") if line]
            if not hs:
                continue
            uniq, c = np.unique(
                np.asarray(hs, dtype=np.uint64).astype(np.int64),
                return_counts=True)
            ids.append(np.full(len(uniq), i, dtype=np.int64))
            hashes.append(uniq)
            cnts.append(c.astype(np.int64))
        if not ids:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "lh": pd.Series([], dtype=np.int64),
                                 "c": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({id_col: np.concatenate(ids),
                             "lh": np.concatenate(hashes),
                             "c": np.concatenate(cnts)})

    # lazy: the common (broadcast) path consumes this exactly once, inside
    # the count groupby — the join fallback materializes it then
    from .taskshuffle import grouped_agg_int64
    lines = docs_ds.map_batches(_explode, batch_format="pandas")
    counts = grouped_agg_int64(lines.select_columns(["lh", "c"]), "lh",
                               "c", op="sum", out_val="n_occ")
    dup_hashes = counts.filter(expr="n_occ >= 2").select_columns(["lh"]) \
        .materialize()
    n_dup_hashes = dup_hashes.count()

    if n_dup_hashes <= broadcast_max_dup_hashes:
        # broadcast path (ONE shuffle total): ship the sorted dup-hash set
        # once via ray.put, then recompute per-doc stats batch-locally in a
        # second pass over the docs — a document is a single row, so its
        # lines never straddle blocks and no per-doc shuffle is needed
        parts = [ray.get(r)["lh"].to_numpy()
                 for r in dup_hashes.to_arrow_refs()]
        dup_arr = np.sort(np.concatenate(parts)) if parts \
            else np.array([], dtype=np.int64)
        dup_ref = ray.put(dup_arr)

        def _stats_bc(batch: pd.DataFrame) -> pd.DataFrame:
            dup = ray.get(dup_ref)
            out_ids = batch[id_col].to_numpy().astype(np.int64)
            n_lines = np.zeros(len(batch), dtype=np.int64)
            n_dup = np.zeros(len(batch), dtype=np.int64)
            for j, t in enumerate(batch[text_col]):
                hs = [_fnv1a_bytes(line.encode("utf-8"))
                      for line in (t or "").split("\n") if line]
                n_lines[j] = len(hs)
                if hs and len(dup):
                    lh = np.asarray(hs, dtype=np.uint64).astype(np.int64)
                    pos = np.minimum(np.searchsorted(dup, lh), len(dup) - 1)
                    n_dup[j] = int(np.count_nonzero(dup[pos] == lh))
            frac = np.where(n_lines > 0, n_dup /
                            np.where(n_lines > 0, n_lines, 1), 0.0)
            return pd.DataFrame({
                id_col: out_ids, "n_lines": n_lines, "n_dup_lines": n_dup,
                "dup_line_frac_corpus": frac.astype(np.float64)})

        return docs_ds.map_batches(_stats_bc, batch_format="pandas")

    # join fallback (dup-hash set too large to broadcast): mark duplicated
    # lines with a hash join, merge totals/dups/zero-line docs with a
    # schema-aligned union + one groupby(id) instead of join chains
    lines = lines.materialize()
    joined = drop_empty_blocks(
        inner_join(lines, dup_hashes, on="lh",
                   num_partitions=num_partitions))

    def _mark_join(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_lines": np.zeros(n, dtype=np.int64),
            "n_dup_lines": batch["c"].to_numpy().astype(np.int64)})

    dup_per_line = joined.map_batches(_mark_join, batch_format="pandas")

    def _totals(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy(),
            "n_lines": batch["c"].to_numpy().astype(np.int64),
            "n_dup_lines": np.zeros(len(batch), dtype=np.int64)})

    def _zeros(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy().astype(np.int64),
            "n_lines": np.zeros(n, dtype=np.int64),
            "n_dup_lines": np.zeros(n, dtype=np.int64)})

    totals = lines.map_batches(_totals, batch_format="pandas")
    zeros = docs_ds.select_columns([id_col]).map_batches(
        _zeros, batch_format="pandas")
    per_doc = rename(
        zeros.union(totals).union(dup_per_line).groupby(id_col).aggregate(
            Sum("n_lines", alias_name="n_lines"),
            Sum("n_dup_lines", alias_name="n_dup_lines")),
        {"sum(n_lines)": "n_lines", "sum(n_dup_lines)": "n_dup_lines"})

    def _frac(t: pa.Table) -> pa.Table:
        n = t["n_lines"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = t["n_dup_lines"].to_numpy(zero_copy_only=False).astype(np.float64)
        frac = np.where(n > 0, d / np.where(n > 0, n, 1.0), 0.0)
        return pa.Table.from_arrays(
            [t[id_col],
             pc.cast(t["n_lines"], pa.int64()),
             pc.cast(t["n_dup_lines"], pa.int64()),
             pa.array(frac, pa.float64())],
            names=[id_col, "n_lines", "n_dup_lines", "dup_line_frac_corpus"])

    return per_doc.map_batches(_frac, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Cross-document exact-substring windows (Lee et al. 2022-style signal)
# ---------------------------------------------------------------------------

def _window_hashes(text: str, width: int, stride: int) -> np.ndarray:
    """Vectorized 64-bit polynomial hash of every ``width``-CHAR window
    at stride ``stride`` (1-based SQL positions 1, 1+stride, … — i.e.
    ``substr(text, i, width)``).  Char-indexed via a utf-32 decode so
    the result matches SQL substr semantics on non-ASCII too; one
    numpy polynomial pass over the stacked window matrix, no per-byte
    Python loop."""
    codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    n = len(codes) - width
    if n < 0:
        return np.empty(0, dtype=np.int64)
    from numpy.lib.stride_tricks import sliding_window_view
    win = sliding_window_view(codes, width)[::stride].astype(np.uint64)
    with np.errstate(over="ignore"):
        h = win[:, 0].copy()
        for i in range(1, width):
            h = h * np.uint64(1099511628211) + win[:, i]
    return h.astype(np.int64)


def dup_window_stats(docs_ds, id_col="doc_id", text_col="text",
                     width: int = 64, stride: int = 16,
                     num_partitions: int | None = None,
                     broadcast_max_dup_hashes: int = 8_000_000):
    """Per-document count of ``width``-char windows (sampled every
    ``stride`` chars) whose exact text also occurs at a sampled window
    position in at least one OTHER document — the cross-document
    exact-substring duplication signal of Lee et al. 2022
    ("Deduplicating Training Data Makes Language Models Better"),
    bounded by striding instead of a full suffix array.  Only documents
    with ≥1 duplicated window are emitted: ``(id, dup_windows)``.

    Scale shape (mirrors :func:`cross_doc_line_stats`): pass 1 explodes
    each doc to unique ``(id, window_hash, c)`` rows (8-byte hashes plus
    the within-doc position count; never window text) feeding the one
    corpus-wide ``groupby(wh)`` count — rows are unique per doc, so the
    row count IS the distinct document count.  Marking then adapts to
    the duplicated-hash count: ≤ ``broadcast_max_dup_hashes`` the
    dup-hash set is sorted in a worker task and its ObjectRef broadcast
    (the driver never holds it), with pass 2 recounting per-doc
    positions batch-locally; above the threshold — a boilerplate-heavy
    crawl can push the dup set past any single heap — it falls back to
    a hash semi-join of the window table against the dup set plus one
    ``groupby(id)`` sum.  Window hashing is a single numpy polynomial
    pass per batch — no per-byte Python loop.

    Hash-collision bound: windows compare by a 64-bit polynomial hash,
    not exact text (the SQL oracle compares text), so a cross-corpus
    collision can mark a unique window duplicated.  Birthday bound:
    P(any collision) ≈ W²/2⁶⁵ for W distinct sampled windows — ~3·10⁻⁸
    at W=10⁶ and still <0.03 at W=10⁹; at 10^12-document scale switch
    to a 128-bit hash if exact-oracle parity is required.
    """
    import ray

    from .relational import default_num_partitions, inner_join, rename
    from .schema_util import drop_empty_blocks

    if num_partitions is None:
        num_partitions = default_num_partitions()

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, hashes, cnts = [], [], []
        for i, t in zip(batch[id_col], batch[text_col]):
            hs, c = np.unique(_window_hashes(t or "", width, stride),
                              return_counts=True)
            if len(hs):
                ids.append(np.full(len(hs), i, dtype=np.int64))
                hashes.append(hs)
                cnts.append(c.astype(np.int64))
        if not ids:
            return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                                 "wh": pd.Series([], dtype=np.int64),
                                 "c": pd.Series([], dtype=np.int64)})
        return pd.DataFrame({id_col: np.concatenate(ids),
                             "wh": np.concatenate(hashes),
                             "c": np.concatenate(cnts)})

    from .taskshuffle import grouped_agg_int64
    doc_wins = docs_ds.map_batches(_explode, batch_format="pandas")
    # rows are unique per (doc, wh), so the count per wh IS the distinct
    # document count; task shuffle instead of the Dataset groupby floor
    counts = grouped_agg_int64(doc_wins.select_columns(["wh"]), "wh",
                               None, op="sum", out_val="n_docs")
    dup = (counts.filter(expr="n_docs >= 2").select_columns(["wh"])
           .materialize())
    n_dup_hashes = dup.count()

    if n_dup_hashes <= broadcast_max_dup_hashes:
        # broadcast path: sort/concat the dup-hash blocks in ONE worker
        # task and hand its ObjectRef to the second pass — nothing
        # larger than the ref crosses the driver
        @ray.remote
        def _sorted_concat(*parts):
            parts = [p if isinstance(p, pa.Table)
                     else pa.Table.from_pandas(p, preserve_index=False)
                     for p in parts]
            arrs = [p["wh"].to_numpy(zero_copy_only=False)
                    for p in parts if p.num_rows]
            return np.sort(np.concatenate(arrs)) if arrs \
                else np.array([], dtype=np.int64)

        dup_ref = _sorted_concat.remote(*dup.to_arrow_refs())

        def _count_dup(batch: pd.DataFrame) -> pd.DataFrame:
            dup_sorted = ray.get(dup_ref)
            out_ids, out_cnt = [], []
            for i, t in zip(batch[id_col], batch[text_col]):
                if not len(dup_sorted):
                    break
                hs = _window_hashes(t or "", width, stride)
                if not len(hs):
                    continue
                pos = np.minimum(np.searchsorted(dup_sorted, hs),
                                 len(dup_sorted) - 1)
                c = int(np.count_nonzero(dup_sorted[pos] == hs))
                if c:
                    out_ids.append(int(i))
                    out_cnt.append(c)
            return pd.DataFrame({id_col: pd.Series(out_ids, dtype=np.int64),
                                 "dup_windows": pd.Series(out_cnt,
                                                          dtype=np.int64)})

        return docs_ds.map_batches(_count_dup, batch_format="pandas")

    # semi-join fallback: (id, wh, c) ⋈ dup-hash set on wh, then one
    # groupby(id) sum of the per-doc position counts — two shuffles,
    # bounded memory at any dup-set size
    joined = drop_empty_blocks(
        inner_join(doc_wins, dup, on="wh", num_partitions=num_partitions))
    summed = rename(joined.groupby(id_col).sum("c"),
                    {"sum(c)": "dup_windows"})

    def _cast(t: pa.Table) -> pa.Table:
        return pa.table({
            id_col: t[id_col].combine_chunks().cast(pa.int64()),
            "dup_windows":
                t["dup_windows"].combine_chunks().cast(pa.int64())})

    return summed.map_batches(_cast, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Benchmark decontamination (broadcast n-gram overlap)
# ---------------------------------------------------------------------------

def _ngram_hashes(text: str, n: int) -> np.ndarray:
    """Distinct rolling-hash n-grams, strict n-gram semantics: a text
    with fewer than ``n`` tokens has NO n-grams (shingle_hashes falls
    back to token hashes there, which would not match string-gram
    oracles)."""
    toks = tokenize(text)
    if len(toks) < n:
        return np.empty(0, dtype=np.uint64)
    return shingle_hashes(toks, n)


def contamination_check(docs_ds, benchmark_texts, n: int = 8,
                        id_col="doc_id", text_col="text"):
    """Training-set decontamination — the n-gram overlap check every
    published LLM data pipeline runs against its eval suites: flag
    documents sharing any length-``n`` token n-gram with the benchmark
    texts.

    The benchmark's distinct n-gram hashes are built once on the driver
    (eval suites are tiny next to the corpus), broadcast via ``ray.put``
    and probed per batch with vectorized ``np.isin`` — a pure map stage
    over the corpus, no shuffle at all.  Returns
    ``(id, n_hits, contaminated)``: distinct matching n-grams per
    document and the flag.
    """
    import ray
    grams = [_ngram_hashes(t or "", n) for t in benchmark_texts]
    grams = [g for g in grams if len(g)] or [np.empty(0, dtype=np.uint64)]
    bench_ref = ray.put(np.unique(np.concatenate(grams)))

    def _check(batch: pd.DataFrame) -> pd.DataFrame:
        bench = ray.get(bench_ref)        # zero-copy local plasma read
        hits = np.zeros(len(batch), dtype=np.int64)
        for j, t in enumerate(batch[text_col]):
            sh = _ngram_hashes(t or "", n)
            if len(sh) and len(bench):
                hits[j] = np.isin(sh, bench, assume_unique=True).sum()
        return pd.DataFrame({id_col: batch[id_col].to_numpy(),
                             "n_hits": hits,
                             "contaminated": hits > 0})

    return docs_ds.map_batches(_check, batch_format="pandas")


# ---------------------------------------------------------------------------
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _cached_planes(dim: int, bands: int, band_bits: int, seed: int):
    """Seeded hyperplane matrix, drawn once per worker process (ADVICE r1:
    previously rebuilt per batch; then an actor-pool ``__init__``, dropped
    because pool spin-up dominates and small sessions can deadlock)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((dim, bands * band_bits))


def _band_rows(batch: pd.DataFrame, dim: int, id_col: str, emb_col: str,
               bands: int, band_bits: int, seed: int) -> pd.DataFrame:
    """(id, embedding) → (id, band, bucket) rows for banded sign-LSH.

    Each vector lands in one bucket per band — the classic
    OR-amplification that fixes the single-table recall gap."""
    planes = _cached_planes(dim, bands, band_bits, seed)
    n = len(batch)
    mat = np.asarray([np.asarray(e, dtype=np.float64)
                      for e in batch[emb_col]])
    signs = (mat @ planes) > 0                        # (n, bands*bits)
    chunks = signs.reshape(n, bands, band_bits)
    bucket = (chunks.astype(np.uint64) <<
              np.arange(band_bits, dtype=np.uint64)).sum(axis=2)
    return pd.DataFrame({
        id_col: np.repeat(np.asarray(batch[id_col]), bands),
        "band": np.tile(np.arange(bands, dtype=np.int64), n),
        "bucket": bucket.reshape(-1).astype(np.int64)})


def verify_pairs_cosine(pairs_ds, emb_ds, id_col="vec_id",
                        emb_col="embedding", threshold=0.98,
                        num_partitions=8):
    """Join candidate vectors back (two hash joins) and keep pairs with
    exact cosine ≥ threshold — vectorized row-wise dot per batch.

    The Arrow hash join can't carry ``list<double>`` payload columns, so
    vectors ride through the joins packed as fixed-width float64 binary
    and are viewed zero-copy with ``np.frombuffer`` in the verifier."""
    from .relational import inner_join

    def _pack(colname):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                colname: b[id_col],
                f"{colname}_bin": [
                    np.asarray(v, dtype=np.float64).tobytes()
                    for v in b[emb_col]]})
        return fn

    e_a = emb_ds.map_batches(_pack("a"), batch_format="pandas")
    e_b = emb_ds.map_batches(_pack("b"), batch_format="pandas")
    from .schema_util import drop_empty_blocks
    first = drop_empty_blocks(inner_join(pairs_ds, e_a, on="a",
                                         num_partitions=num_partitions))
    joined = inner_join(first, e_b, on="b", num_partitions=num_partitions)

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        ma = np.asarray([np.frombuffer(v, dtype=np.float64)
                         for v in batch["a_bin"]])
        mb = np.asarray([np.frombuffer(v, dtype=np.float64)
                         for v in batch["b_bin"]])
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        cos = (ma * mb).sum(axis=1) / (na * nb)
        out = batch[["a", "b"]].copy()
        out["cosine"] = cos
        return out[out["cosine"] >= threshold]

    return joined.map_batches(_verify, batch_format="pandas")


def _emb_pairs_small(batch: pd.DataFrame, id_col: str, emb_col: str,
                     threshold: float) -> pd.DataFrame:
    """Single-task exact path: blockwise normalized gram matrix, emit
    every (a < b) pair with cosine ≥ threshold.  Row blocks of 1k bound
    the working set at rows×1k doubles."""
    ids = batch[id_col].to_numpy()
    if len(ids) == 0:
        return pd.DataFrame({"a": pd.Series(dtype="int64"),
                             "b": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    x = np.asarray([np.asarray(v, dtype=np.float64) for v in batch[emb_col]])
    order = np.argsort(ids)
    ids, x = ids[order], x[order]
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0] = 1.0
    x = x / norms[:, None]
    out_a, out_b, out_c = [], [], []
    for s in range(0, len(ids), 1024):
        e = min(s + 1024, len(ids))
        g = x[s:e] @ x.T
        ii, jj = np.nonzero(g >= threshold)
        keep = (ii + s) < jj            # strict upper triangle in id order
        out_a.append(ids[ii[keep] + s])
        out_b.append(ids[jj[keep]])
        out_c.append(g[ii[keep], jj[keep]])
    if not out_a:
        return pd.DataFrame({"a": pd.Series(dtype=ids.dtype),
                             "b": pd.Series(dtype=ids.dtype),
                             "cosine": pd.Series(dtype="float64")})
    return pd.DataFrame({"a": np.concatenate(out_a),
                         "b": np.concatenate(out_b),
                         "cosine": np.concatenate(out_c)})


def embedding_near_dups(emb_ds, id_col="vec_id", emb_col="embedding",
                        threshold=0.98, bands=8, band_bits=16, seed=5,
                        max_bucket=256, concurrency=None, num_partitions=8,
                        small_threshold: int = 10_000):
    """Near-dup pairs by embedding cosine ≥ threshold, banded sign-LSH.

    ``bands`` independent 16-bit sign buckets per vector (128 seeded
    hyperplanes): a pair at cosine 0.98 agrees per plane w.p. ≈0.936, so
    P(≥1 of 8 bands collides) ≈ 0.97 — the recall bound (previously a
    single 8-plane table: ≈0.6 at θ=0.98, ADVICE r1).  Bucket space is
    2^16 PER BAND (not 2^8 globally), candidate generation is star-capped
    (:func:`_bucket_pairs`), and verification joins vectors back instead
    of shuffling embeddings through the groupby — only (id, band, bucket)
    rows move through the LSH shuffle.

    Adaptive: tables under ``small_threshold`` rows run one vectorized
    exact task (blockwise gram matrix) — strictly better recall than the
    LSH (it IS the brute-force oracle) at a size where the LSH plan's
    fixed exchanges dominate; the banded plan above is the scale path."""
    # three consumers (dim probe, banding, verify joins) — materialize or
    # each one re-executes the upstream pipeline (Ray 2.49 lazy Datasets)
    emb_ds = emb_ds.materialize()
    if emb_ds.count() <= small_threshold:
        from .schema_util import drop_empty_blocks
        return drop_empty_blocks(emb_ds.repartition(1).map_batches(
            _emb_pairs_small, batch_format="pandas", batch_size=None,
            fn_kwargs=dict(id_col=id_col, emb_col=emb_col,
                           threshold=threshold)))
    dim = len(emb_ds.take(1)[0][emb_col])
    band_rows = emb_ds.map_batches(
        _band_rows,
        fn_kwargs=dict(dim=dim, id_col=id_col, emb_col=emb_col,
                       bands=bands, band_bits=band_bits, seed=seed),
        batch_format="pandas")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        a, b = _bucket_pairs(g[id_col].to_numpy(), max_bucket)
        return pd.DataFrame({"a": a, "b": b})

    cands = band_rows.groupby(["band", "bucket"]).map_groups(
        _pairs, batch_format="pandas")
    from .relational import distinct
    from .schema_util import drop_empty_blocks
    cands = drop_empty_blocks(distinct(cands, ["a", "b"]))
    return verify_pairs_cosine(cands, emb_ds, id_col, emb_col, threshold,
                               num_partitions)


def semantic_dedup(emb_ds, id_col="vec_id", emb_col="embedding",
                   threshold=0.98, **lsh_kwargs):
    """SemDeDup-style semantic dedup over an embedding column: keep a
    vector unless a LOWER-id vector within cosine ``threshold`` exists
    (the deterministic keep-min-id dominator rule — SQL-checkable as
    ``NOT EXISTS (u < v AND cos(u, v) >= θ)``).

    Pair discovery reuses :func:`embedding_near_dups` (banded sign-LSH →
    star-capped candidates → exact-cosine verify), then one anti-join of
    the id universe against the dominated side.  Exact whenever the LSH
    finds every ≥θ pair (recall bound documented there); at corpus scale
    this is the shape SemDeDup runs in — no O(n²) pass, the only wide ops
    are the LSH groupby and two hash joins.  Returns a 1-column dataset of
    kept ids."""
    import pyarrow as pa

    from .relational import anti_join, distinct
    from .schema_util import drop_empty_blocks

    emb_ds = emb_ds.materialize()
    pairs = embedding_near_dups(emb_ds, id_col=id_col, emb_col=emb_col,
                                threshold=threshold, **lsh_kwargs)
    dominated = distinct(
        drop_empty_blocks(pairs).map_batches(
            lambda t: pa.Table.from_arrays(
                [t["b"].combine_chunks().cast(pa.int64())], names=[id_col]),
            batch_format="pyarrow"),
        [id_col])
    universe = emb_ds.select_columns([id_col])
    return anti_join(universe, drop_empty_blocks(dominated), on=id_col)


# ---------------------------------------------------------------------------
# Exact set-similarity self-join (AllPairs / prefix filtering)
# ---------------------------------------------------------------------------

def _setsim_small(df: pd.DataFrame, tau_num: int, tau_den: int,
                  id_col: str, text_col: str) -> pd.DataFrame:
    """Single-task exact path: same algorithm as the distributed plan
    (token-frequency order → prefix postings → candidate pairs → exact
    intersection), all in one vectorized task."""
    empty = pd.DataFrame({"doc_a": pd.Series(dtype="int64"),
                          "doc_b": pd.Series(dtype="int64"),
                          "inter": pd.Series(dtype="int64"),
                          "uni": pd.Series(dtype="int64")})
    if not len(df):
        return empty
    from ..graph.triangles import segment_pairs
    ids = df[id_col].to_numpy()
    # collapse identical token sets FIRST: the quadratic candidate work
    # then runs over DISTINCT sets only, and the (output-sized) member
    # expansion is pure arithmetic — a mass-duplicated cluster costs one
    # representative, not c²/2 set intersections
    vocab: dict[str, int] = {}
    groups: dict[bytes, list[int]] = {}
    rep_tok: list[np.ndarray] = []
    grp_members: list[np.ndarray] = []
    key_to_grp: dict[bytes, int] = {}
    for i, t in enumerate(df[text_col]):
        s = set(tokenize(t or ""))
        if not s:
            continue                        # no tokens → no pairs
        arr = np.fromiter((vocab.setdefault(w, len(vocab)) for w in s),
                          dtype=np.int64, count=len(s))
        arr.sort()
        key = arr.tobytes()
        g = key_to_grp.get(key)
        if g is None:
            key_to_grp[key] = len(rep_tok)
            rep_tok.append(arr)
            groups[key] = [i]
        else:
            groups[key].append(i)
    if not rep_tok:
        return empty
    grp_members = [np.sort(ids[m]) for m in
                   (groups[a.tobytes()] for a in rep_tok)]
    sz = np.array([len(a) for a in rep_tok], dtype=np.int64)
    nv = len(vocab)
    # frequency = number of DOCS containing the token (weights = cluster
    # sizes), matching the distributed plan's posting-length heuristic;
    # any total order is lossless, this one just minimizes candidates
    freq = np.bincount(
        np.concatenate(rep_tok), minlength=nv,
        weights=np.repeat([len(m) for m in grp_members], sz)
    ).astype(np.int64)
    rank = np.empty(nv, dtype=np.int64)
    rank[np.lexsort((np.arange(nv), freq))] = np.arange(nv)
    post_tok, post_rep = [], []
    for i, arr in enumerate(rep_tok):
        n = len(arr)
        # prefix filter: two sets with J >= τ share a token among each
        # one's (n - ceil(τ·n) + 1) rarest tokens — integer-exact ceil
        p = n - (n * tau_num + tau_den - 1) // tau_den + 1
        if p <= 0:
            continue
        sel = arr[np.argsort(rank[arr])[:p]]
        post_tok.append(rank[sel])
        post_rep.append(np.full(len(sel), i, dtype=np.int64))
    out_a, out_b, out_i, out_u = [], [], [], []
    if post_tok:
        ptok = np.concatenate(post_tok)
        prep = np.concatenate(post_rep)
        order = np.lexsort((prep, ptok))
        ptok, prep = ptok[order], prep[order]
        starts = np.flatnonzero(np.r_[True, ptok[1:] != ptok[:-1]])
        li, ri, _ = segment_pairs(np.diff(np.r_[starts, len(ptok)]))
        if len(li):
            cand = np.unique((prep[li] << 32) | prep[ri])
            ca, cb = cand >> 32, cand & 0xFFFFFFFF
            inter = np.fromiter(
                (len(np.intersect1d(rep_tok[x], rep_tok[y],
                                    assume_unique=True))
                 for x, y in zip(ca, cb)),
                dtype=np.int64, count=len(cand))
            uni = sz[ca] + sz[cb] - inter
            keep = tau_den * inter >= tau_num * uni   # exact cross-multiply
            # expand qualifying rep pairs to all cross-cluster doc pairs
            for x, y, iv, uv in zip(ca[keep], cb[keep],
                                    inter[keep], uni[keep]):
                m1, m2 = grp_members[x], grp_members[y]
                out_a.append(np.repeat(m1, len(m2)))
                out_b.append(np.tile(m2, len(m1)))
                out_i.append(np.full(len(m1) * len(m2), iv, dtype=np.int64))
                out_u.append(np.full(len(m1) * len(m2), uv, dtype=np.int64))
    if tau_den >= tau_num:
        # within-cluster pairs are J = 1 (inter = uni = sz) by definition
        for g, m in enumerate(grp_members):
            if len(m) < 2:
                continue
            i, j = np.triu_indices(len(m), k=1)
            out_a.append(m[i])
            out_b.append(m[j])
            out_i.append(np.full(len(i), sz[g], dtype=np.int64))
            out_u.append(np.full(len(i), sz[g], dtype=np.int64))
    if not out_a:
        return empty
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    inter = np.concatenate(out_i)
    uni = np.concatenate(out_u)
    doc_a, doc_b = np.minimum(a, b), np.maximum(a, b)
    order = np.lexsort((doc_b, doc_a))
    return pd.DataFrame({"doc_a": doc_a[order], "doc_b": doc_b[order],
                         "inter": inter[order], "uni": uni[order]})


def setsim_pairs(docs_ds, tau_num: int = 4, tau_den: int = 5,
                 id_col: str = "doc_id", text_col: str = "text",
                 num_partitions: int = 16,
                 small_threshold: int = 100_000):
    """Exact token-set similarity self-join (the AllPairs / prefix-filter
    family — Bayardo et al., WWW'07): every unordered doc pair whose
    token-set Jaccard >= tau_num/tau_den, as ``(doc_a, doc_b, inter,
    uni)`` with doc_a < doc_b.

    All-integer output: the threshold test is the exact cross-
    multiplication ``tau_den·|∩| >= tau_num·|∪|``, so a SQL oracle
    computing the same intersection/union counts matches bit-for-bit
    (no float Jaccard boundary).

    Unlike MinHash/SimHash (probabilistic recall) this is EXACT: prefix
    filtering is lossless — two sets with J >= τ must share at least one
    token among each one's (n - ceil(τ·n) + 1) rarest tokens under any
    global token order.

    Scale shape (the default once the corpus exceeds ``small_threshold``
    docs): distinct-token explode → token-frequency hash join (NO
    driver-side vocabulary — the order key travels by join) → per-doc
    prefix postings (groupby doc) → per-token posting pair expansion
    (groupby token; postings stay short because prefixes keep only RARE
    tokens) → distinct pairs → exact verify via two hash joins of the
    candidate table against the docs.  Skew note: a mass-duplicated
    cluster shares its rare tokens, so those postings grow with the
    cluster size — inherent to exactness (every pair in the cluster IS a
    result row).  Partitioning assumption: one token's posting list and
    one doc's token set each fit a worker task.
    """
    from .relational import distinct, inner_join, rename
    from .schema_util import drop_empty_blocks, enforce_schema

    docs_ds = docs_ds.materialize()
    if docs_ds.count() <= small_threshold:
        return drop_empty_blocks(docs_ds.repartition(1).map_batches(
            lambda d: _setsim_small(d, tau_num, tau_den, id_col, text_col),
            batch_format="pandas", batch_size=None))

    def _explode(batch: pd.DataFrame) -> pa.Table:
        out_id, out_tok = [], []
        for i, t in zip(batch[id_col], batch[text_col]):
            toks = sorted(set(tokenize(t or "")))
            out_id.extend([int(i)] * len(toks))
            out_tok.extend(toks)
        return pa.Table.from_arrays(
            [pa.array(out_id, pa.int64()), pa.array(out_tok, pa.string())],
            names=[id_col, "token"])

    ex = docs_ds.map_batches(_explode, batch_format="pandas").materialize()
    freq = rename(ex.groupby("token").count(), {"count()": "freq"})
    exf = inner_join(ex, freq, on="token", num_partitions=num_partitions)

    def _prefix(g: pd.DataFrame) -> pd.DataFrame:
        n = len(g)
        p = n - (n * tau_num + tau_den - 1) // tau_den + 1
        if p <= 0:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 id_col: pd.Series(dtype="int64")})
        g = g.sort_values(["freq", "token"], kind="stable").head(p)
        return pd.DataFrame({"token": g["token"].to_numpy(),
                             id_col: g[id_col].to_numpy()})

    pref_schema = pa.schema([("token", pa.string()), (id_col, pa.int64())])
    pref = enforce_schema(
        exf.groupby(id_col).map_groups(_prefix, batch_format="pandas"),
        pref_schema)

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        d = np.unique(g[id_col].to_numpy())
        if len(d) < 2:
            e64 = pd.Series(dtype="int64")
            return pd.DataFrame({"a": e64, "b": e64})
        i, j = np.triu_indices(len(d), k=1)
        return pd.DataFrame({"a": d[i], "b": d[j]})

    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64())])
    cands = distinct(
        enforce_schema(pref.groupby("token").map_groups(
            _pairs, batch_format="pandas"), pair_schema),
        ["a", "b"], num_partitions)

    d_a = rename(docs_ds.select_columns([id_col, text_col]),
                 {id_col: "a", text_col: "text_a"})
    d_b = rename(docs_ds.select_columns([id_col, text_col]),
                 {id_col: "b", text_col: "text_b"})
    joined = inner_join(inner_join(drop_empty_blocks(cands), d_a, on="a",
                                   num_partitions=num_partitions),
                        d_b, on="b", num_partitions=num_partitions)

    def _verify(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        inter = np.zeros(n, dtype=np.int64)
        uni = np.zeros(n, dtype=np.int64)
        for i, (x, y) in enumerate(zip(batch["text_a"], batch["text_b"])):
            sx = set(tokenize(x or ""))
            sy = set(tokenize(y or ""))
            inter[i] = len(sx & sy)
            uni[i] = len(sx) + len(sy) - inter[i]
        a = batch["a"].to_numpy(dtype=np.int64)
        b = batch["b"].to_numpy(dtype=np.int64)
        keep = (tau_den * inter >= tau_num * uni) & (uni > 0)
        return pd.DataFrame({"doc_a": np.minimum(a, b)[keep],
                             "doc_b": np.maximum(a, b)[keep],
                             "inter": inter[keep], "uni": uni[keep]})

    return joined.map_batches(_verify, batch_format="pandas")


def _ed_le1(a: str, b: str) -> bool:
    """Exact Levenshtein-distance ≤ 1 check in O(len)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:                         # one substitution?
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:                          # make a the shorter
        a, b, la = b, a, lb
    i = 0                                # one deletion from b?
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


# worker-process-global deserialization cache for broadcast ObjectRefs —
# shared repo-wide via stages.broadcast (map_groups invokes its UDF once
# per group, map_batches once per batch; either way the pickled-dict
# unpickle must happen once per worker, not once per call)
_cached_obj = cached_get


def title_edit_pairs(docs_ds, id_col: str = "doc_id",
                     text_col: str = "text", prefix_len: int = 32,
                     num_partitions: int = 8,
                     broadcast_max_docs: int = 5_000_000):
    """Typo-level near-duplicate pairs: ``(doc_a, doc_b)`` with doc_a <
    doc_b whose first ``prefix_len`` characters (the "title" — on a real
    crawl this runs over the url or title column) are within Levenshtein
    distance 1.  Equal to the brute-force ``levenshtein(a, b) <= 1``
    self-join, computed without the quadratic join: FastSS
    deletion-variant blocking (Bocek et al., 2007) with exact
    verification.

    Candidate soundness (why no pair is missed): ED(u, v) ≤ 1 implies u
    and v share a key in ``{u} ∪ del1(u)`` — equal strings share u;
    for an insertion/deletion the shorter string IS a deletion variant
    of the longer; for a substitution at position i, ``del_i(u) ==
    del_i(v)``.  Sharing a key only bounds ED ≤ 2, so every candidate
    is verified with the exact O(prefix_len) ≤1 check before emission.

    Scale shape: each doc emits ``prefix_len + 1`` candidate rows into
    ONE hashed-variant groupby shuffle; pairs are generated and verified
    inside each group, then deduped by one distinct exchange (the same
    pair is found under every shared variant).  Below
    ``broadcast_max_docs`` the id→prefix map is broadcast (built in a
    worker task) and the shuffle carries only ``(vkey, id)`` int64 rows
    — O(prefix_len · 16) bytes per doc instead of O(prefix_len²); above
    it the title column rides the shuffle (the at-scale plan, no
    broadcast of an unbounded map).  Skew note: an m-doc
    identical-title cluster meets in every variant bucket and IS
    m·(m−1)/2 result rows — inherent to exactness; at corpus scale
    collapse exact duplicates first (:func:`exact_text_dedup`) and feed
    representatives.

    Reference scope note: the reference has no near-dup surface at all
    (SURVEY.md §2 addenda — training-data dedup family); this adds the
    edit-distance member alongside MinHash/SimHash/set-similarity.
    """
    import ray

    from .relational import distinct
    from .schema_util import drop_empty_blocks, enforce_schema

    base = docs_ds.select_columns([id_col, text_col]).materialize()
    broadcast = base.count() <= broadcast_max_docs
    tmap_ref = None
    if broadcast:
        # id → prefix map assembled worker-side; the shuffle then
        # carries only two int64 columns
        @ray.remote
        def _build_tmap(*parts):
            out = {}
            for p in parts:
                if p.num_rows:
                    for i, txt in zip(p[id_col].to_pylist(),
                                      p[text_col].to_pylist()):
                        out[i] = (txt or "")[:prefix_len]
            return out

        tmap_ref = _build_tmap.remote(*base.to_arrow_refs())

    def _variants(batch: pd.DataFrame) -> pd.DataFrame:
        from .stats import _bulk_md5_upper_be
        keys, ids, titles = [], [], []
        for doc_id, text in zip(batch[id_col], batch[text_col]):
            t = (text or "")[:prefix_len]
            seen = {t}
            keys.append(t)
            ids.append(doc_id)
            titles.append(t)
            for i in range(len(t)):
                v = t[:i] + t[i + 1:]
                if v in seen:            # deleting equal adjacent chars
                    continue             # yields the same variant
                seen.add(v)
                keys.append(v)
                ids.append(doc_id)
                titles.append(t)
        # group key = 64-bit md5 of the variant: the groupby shuffle
        # sorts int64 instead of strings, and a hash collision can only
        # MERGE two candidate buckets — every emitted pair is
        # exact-verified, so merged buckets add verification work,
        # never wrong pairs
        if keys:
            vkey = _bulk_md5_upper_be(
                np.asarray(keys, dtype=object).astype(str),
                [""])[0].astype(np.int64)
        else:
            vkey = np.empty(0, dtype=np.int64)
        cols = {"vkey": pd.Series(vkey, dtype="int64"),
                id_col: pd.Series(ids, dtype="int64")}
        if not broadcast:
            cols["title"] = pd.Series(titles, dtype="object")
        return pd.DataFrame(cols)

    rows = base.map_batches(_variants, batch_format="pandas")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(subset=[id_col])
        if len(g) < 2:
            e64 = pd.Series(dtype="int64")
            return pd.DataFrame({"doc_a": e64, "doc_b": e64})
        order = np.argsort(g[id_col].to_numpy(), kind="stable")
        ids = g[id_col].to_numpy()[order]
        if broadcast:
            tmap = _cached_obj(tmap_ref)
            titles = [tmap[int(i)] for i in ids]
        else:
            titles = g["title"].to_numpy()[order]
        out_a, out_b = [], []
        for i in range(len(ids)):
            ti = titles[i]
            for j in range(i + 1, len(ids)):
                if _ed_le1(ti, titles[j]):
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype="int64"),
                             "doc_b": pd.Series(out_b, dtype="int64")})

    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])
    verified = enforce_schema(
        rows.groupby("vkey").map_groups(_pairs, batch_format="pandas"),
        pair_schema)
    return drop_empty_blocks(
        distinct(verified, ["doc_a", "doc_b"], num_partitions))


def dedup_savings(docs_ds, id_col="doc_id", text_col="text",
                  source_col="source",
                  broadcast_max_docs: int = 5_000_000):
    """Per-source exact-dedup savings report — the "how much did dedup
    buy us" table a corpus pipeline publishes: documents DROPPED by the
    min-id-per-text rule, counted and token-summed per source.

    Keep-id membership is the broadcast sorted-array test below
    ``broadcast_max_docs`` survivors (same adaptive rule as
    ``prep_corpus``); the exchange above it is the hash semi-join.
    Returns ``(source, n_dropped, tokens_dropped)``."""
    import ray

    from .text_ops import TOKEN_RE

    base = docs_ds.select_columns(
        [id_col, text_col, source_col]).materialize()
    keep = exact_text_dedup(base, id_col, text_col) \
        .select_columns(["keep_id"])

    @ray.remote
    def _keep_ids(*parts):
        arrs = [np.asarray(p["keep_id"], dtype=np.int64)
                for p in parts if p.num_rows]
        return (np.sort(np.concatenate(arrs)) if arrs
                else np.empty(0, dtype=np.int64))

    kref = _keep_ids.remote(*keep.materialize().to_arrow_refs())

    def _dropped_partial(t: pa.Table) -> pa.Table:
        ks = cached_get(kref)
        ids = t[id_col].to_numpy(zero_copy_only=False)
        if len(ks):
            idx = np.minimum(np.searchsorted(ks, ids), len(ks) - 1)
            dropped = ks[idx] != ids
        else:
            dropped = np.ones(len(ids), dtype=bool)
        sub = t.filter(pa.array(dropped))
        srcs, nd, td = {}, {}, {}
        for s, text in zip(sub[source_col].to_pylist(),
                           sub[text_col].to_pylist()):
            nd[s] = nd.get(s, 0) + 1
            td[s] = td.get(s, 0) + len(TOKEN_RE.findall(text or ""))
        ks2 = sorted(nd)
        return pa.table({
            "source": pa.array(ks2, pa.string()),
            "n_dropped": pa.array([nd[k] for k in ks2], pa.int64()),
            "tokens_dropped": pa.array([td[k] for k in ks2],
                                       pa.int64())})

    agg = (base.map_batches(_dropped_partial, batch_format="pyarrow")
           .groupby("source").sum(["n_dropped", "tokens_dropped"]))
    if agg.count() == 0:
        # a dup-free corpus legitimately reports zero rows — return a
        # TYPED empty frame (Ray drops the schema of empty datasets all
        # the way through to_pandas, so hand back pandas directly)
        return pd.DataFrame({
            "source": pd.Series(dtype="object"),
            "n_dropped": pd.Series(dtype="int64"),
            "tokens_dropped": pd.Series(dtype="int64")})
    return agg.map_batches(
        lambda t: pa.table({
            "source": t["source"].combine_chunks(),
            "n_dropped": t["sum(n_dropped)"].combine_chunks(),
            "tokens_dropped": t["sum(tokens_dropped)"].combine_chunks()}),
        batch_format="pyarrow")


def ngram_novelty(docs_ds, id_col="doc_id", text_col="text", n: int = 2,
                  broadcast_max_shared: int = 8_000_000):
    """Per-document n-gram novelty — the inverse-boilerplate signal:
    the fraction of a doc's DISTINCT n-grams that appear in no other
    document.  Returns ``(id, n_distinct, n_novel, novelty)``
    (docs with < n tokens get (0, 0, 1.0) — nothing shared).

    Scale shape (same plan as :func:`cross_doc_line_stats`): explode to
    pre-deduplicated ``(doc, gram_hash)`` rows (8-byte FNV per distinct
    gram), one ``groupby(hash)`` doc-count shuffle, then the SHARED
    hash set (df ≥ 2 — typically a small fraction of the gram space)
    broadcasts below ``broadcast_max_shared`` and a second local pass
    recomputes per-doc stats batch-side; the semi-join plan remains
    above the gate."""
    import ray

    def _gram_hashes(text):
        toks = tokenize(text)
        if len(toks) < n:
            return np.empty(0, dtype=np.int64)
        hs = {np.uint64(_fnv1a_bytes(
            " ".join(toks[i:i + n]).encode("utf-8"))).astype(np.int64)
            for i in range(len(toks) - n + 1)}
        return np.fromiter(hs, dtype=np.int64, count=len(hs))

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ghs = [], []
        for did, text in zip(batch[id_col], batch[text_col]):
            hs = _gram_hashes(text)
            ids.extend([did] * len(hs))
            ghs.extend(hs)
        return pd.DataFrame({id_col: np.asarray(ids, dtype=np.int64),
                             "gh": np.asarray(ghs, dtype=np.int64)})

    from .schema_util import enforce_schema
    grams = enforce_schema(
        docs_ds.map_batches(_explode, batch_format="pandas"),
        pa.schema([(id_col, pa.int64()), ("gh", pa.int64())]))
    shared = (grams.groupby("gh").count()
              .map_batches(lambda t: t.filter(
                  pc.greater(t["count()"], 1)).select(["gh"]),
                  batch_format="pyarrow"))
    n_shared = shared.count()
    if n_shared > broadcast_max_shared:
        raise NotImplementedError(
            "ngram_novelty above the broadcast gate needs the "
            "hash-semi-join plan of cross_doc_line_stats; raise "
            "broadcast_max_shared or pre-dedup the corpus")

    @ray.remote
    def _shared_set(*parts):
        arrs = [np.asarray(p["gh"], dtype=np.int64)
                for p in parts if p.num_rows]
        return (np.sort(np.concatenate(arrs)) if arrs
                else np.empty(0, dtype=np.int64))

    sref = _shared_set.remote(*shared.materialize().to_arrow_refs())

    def _stats(batch: pd.DataFrame) -> pd.DataFrame:
        sh = cached_get(sref)
        out_nd = np.zeros(len(batch), dtype=np.int64)
        out_nv = np.zeros(len(batch), dtype=np.int64)
        for j, text in enumerate(batch[text_col]):
            hs = _gram_hashes(text)
            out_nd[j] = len(hs)
            if len(hs) and len(sh):
                idx = np.minimum(np.searchsorted(sh, hs), len(sh) - 1)
                out_nv[j] = int((sh[idx] != hs).sum())
            else:
                out_nv[j] = len(hs)
        novelty = np.where(out_nd > 0, out_nv / np.maximum(out_nd, 1),
                           1.0)
        return pd.DataFrame({
            id_col: batch[id_col].to_numpy().astype(np.int64),
            "n_distinct": out_nd, "n_novel": out_nv,
            "novelty": novelty})

    return docs_ds.map_batches(_stats, batch_format="pandas")
