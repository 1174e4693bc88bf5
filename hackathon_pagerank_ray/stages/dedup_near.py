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


def minhash_signatures(docs_ds, text_col="text", k=3, num_perm=64,
                       seed=1234, concurrency=4):
    return docs_ds.map_batches(
        MinHasher, fn_constructor_kwargs=dict(text_col=text_col, k=k,
                                              num_perm=num_perm, seed=seed),
        batch_format="pandas", concurrency=concurrency)


def lsh_band_table(sig_ds, id_col="doc_id", num_perm=64, bands=16):
    """Explode signatures into (band, bucket, id) rows — one row per band,
    bucket = hash of that band's signature slice."""
    rows_per_band = num_perm // bands

    def _explode(batch: pd.DataFrame) -> pd.DataFrame:
        ids, band_ids, buckets = [], [], []
        for doc_id, sig in zip(batch[id_col], batch["sig"]):
            s = np.asarray(sig, dtype=np.uint64)
            for b in range(bands):
                chunk = s[b * rows_per_band:(b + 1) * rows_per_band]
                ids.append(doc_id)
                band_ids.append(b)
                buckets.append(np.int64(np.uint64(
                    _fnv1a_bytes(chunk.tobytes())).astype(np.int64)))
        return pd.DataFrame({id_col: ids, "band": band_ids, "bucket": buckets})

    return sig_ds.map_batches(_explode, batch_format="pandas")


def candidate_pairs(band_ds, id_col="doc_id"):
    """groupby(band, bucket) → all in-bucket pairs (a < b), deduped."""
    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g[id_col].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series(dtype=ids.dtype), "b": pd.Series(dtype=ids.dtype)})
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[i], "b": ids[j]})

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
                         k=3, threshold=0.7, num_partitions=16):
    """Join candidate texts back and compute exact n-gram Jaccard — keeps
    pairs ≥ threshold.  Two hash joins (a then b), verification vectorized
    per pair batch."""
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


def simhash_signatures(docs_ds, text_col="text", concurrency=4):
    return docs_ds.map_batches(SimHasher,
                               fn_constructor_kwargs={"text_col": text_col},
                               batch_format="pandas", concurrency=concurrency)


def simhash_candidates(sig_ds, id_col="doc_id", max_hamming=3):
    """Pigeonhole: two 64-bit hashes within hamming distance 3 share at
    least one identical 16-bit quarter — bucket by each band, pair, then
    verify exact hamming distance."""
    import pandas as pd

    # one signature pass feeds four band-groupbys — materialize or each
    # branch re-runs the SimHasher actor pool
    sig_ds = sig_ds.materialize()
    frames = []
    for band in range(4):
        def _pairs(g: pd.DataFrame, _band=band) -> pd.DataFrame:
            sub = g.drop_duplicates(id_col)
            if len(sub) < 2:
                return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "ha": pd.Series(dtype="int64"), "hb": pd.Series(dtype="int64")})
            ids = sub[id_col].to_numpy()
            hs = sub["simhash"].to_numpy()
            order = np.argsort(ids)
            ids, hs = ids[order], hs[order]
            i, j = np.triu_indices(len(ids), k=1)
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
# Embedding cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dups(emb_ds, id_col="vec_id", emb_col="embedding",
                        threshold=0.98, num_planes=8, seed=5):
    """Near-dup pairs by embedding cosine ≥ threshold.

    Scale path: bucket by signs of ``num_planes`` seeded random hyperplanes
    (an LSH for cosine), pair within buckets, verify exactly — near-dup
    vectors collide with high probability; the all-pairs matmul never
    happens."""
    def _bucket(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.asarray([np.asarray(e, dtype=np.float64)
                          for e in batch[emb_col]])
        rng = np.random.RandomState(seed)
        planes = rng.standard_normal((mat.shape[1], num_planes))
        signs = (mat @ planes) > 0
        bucket = (signs.astype(np.uint64) <<
                  np.arange(num_planes, dtype=np.uint64)).sum(axis=1)
        out = batch[[id_col]].copy()
        out["bucket"] = bucket.astype(np.int64)
        out["norm_emb"] = [
            (v / (np.linalg.norm(v) or 1.0)).tolist() for v in mat]
        return out

    bucketed = emb_ds.map_batches(_bucket, batch_format="pandas")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "cosine": pd.Series(dtype="float64")})
        g = g.sort_values("vec_id" if id_col == "vec_id" else id_col)
        ids = g[id_col].to_numpy()
        mat = np.asarray([np.asarray(v) for v in g["norm_emb"]])
        sims = mat @ mat.T
        i, j = np.triu_indices(len(ids), k=1)
        keep = sims[i, j] >= threshold
        return pd.DataFrame({"a": ids[i][keep], "b": ids[j][keep],
                             "cosine": sims[i, j][keep]})

    return bucketed.groupby("bucket").map_groups(_pairs, batch_format="pandas")
