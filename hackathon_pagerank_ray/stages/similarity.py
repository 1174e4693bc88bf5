"""Similarity search over embedding columns (task brief: ANN first-class).

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and every batch does one numpy matmul + partial top-k; a final
tiny per-query merge produces exact global top-k.  Scale path:
LSH-bucketed (IVF-like) search via :func:`bucketed_topk` that probes only
matching hyperplane buckets.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import ray


class _BruteForcePartial:
    """Per-batch partial top-k against a broadcast query matrix."""

    def __init__(self, query_ref, k: int, id_col: str, emb_col: str):
        q = ray.get(query_ref) if isinstance(query_ref, ray.ObjectRef) else query_ref
        q = np.asarray(q, dtype=np.float64)
        norms = np.linalg.norm(q, axis=1)
        norms[norms == 0] = 1.0
        self.q = q / norms[:, None]            # (nq, d), normalized once
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids = batch[self.id_col].to_numpy()
        mat = np.asarray([np.asarray(v, dtype=np.float64)
                          for v in batch[self.emb_col]])
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        mat = mat / norms[:, None]
        sims = self.q @ mat.T                   # (nq, batch)
        k = min(self.k, sims.shape[1])
        part = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            sel = part[qi]
            out_q.extend([qi] * len(sel))
            out_id.extend(ids[sel])
            out_s.extend(sims[qi, sel])
        return pd.DataFrame({"query_id": np.asarray(out_q, dtype=np.int64),
                             self.id_col: out_id,
                             "cosine": out_s})


def brute_force_topk(emb_ds, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     concurrency=4):
    """Exact cosine top-k per query row of ``queries`` (nq × d).

    Returns (query_id, id, cosine), exactly k rows per query (ties broken
    by lowest id for determinism).
    """
    query_ref = ray.put(np.asarray(queries, dtype=np.float64))
    partials = emb_ds.map_batches(
        _BruteForcePartial,
        fn_constructor_kwargs=dict(query_ref=query_ref, k=k, id_col=id_col,
                                   emb_col=emb_col),
        batch_format="pandas", concurrency=concurrency)

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        top = heapq.nsmallest(
            k, g.itertuples(index=False),
            key=lambda r: (-r.cosine, getattr(r, id_col)))
        return pd.DataFrame(top, columns=g.columns)

    return partials.groupby("query_id").map_groups(_merge,
                                                   batch_format="pandas")


def bucketed_topk(emb_ds, queries: np.ndarray, k: int = 10,
                  id_col: str = "vec_id", emb_col: str = "embedding",
                  num_planes: int = 6, probes: int = 2, seed: int = 5,
                  concurrency=4):
    """Approximate top-k: search only vectors whose hyperplane-sign bucket
    is within ``probes`` bit-flips of the query's bucket (multi-probe LSH).
    At corpus scale this touches ~``(Σ C(planes, i≤probes)) / 2^planes``
    of the data instead of all of it."""
    queries = np.asarray(queries, dtype=np.float64)
    rng = np.random.RandomState(seed)
    dim = queries.shape[1]
    planes = rng.standard_normal((dim, num_planes))

    def _qbucket(v):
        return int(((v @ planes > 0).astype(np.uint64) <<
                    np.arange(num_planes, dtype=np.uint64)).sum())

    probe_sets = []
    for qv in queries:
        base = _qbucket(qv)
        buckets = {base}
        if probes >= 1:
            for b1 in range(num_planes):
                buckets.add(base ^ (1 << b1))
        if probes >= 2:
            for b1 in range(num_planes):
                for b2 in range(b1 + 1, num_planes):
                    buckets.add(base ^ (1 << b1) ^ (1 << b2))
        probe_sets.append(buckets)
    wanted = set().union(*probe_sets) if probe_sets else set()
    wanted_ref = ray.put(np.fromiter(sorted(wanted), dtype=np.uint64,
                                     count=len(wanted)))
    planes_ref = ray.put(planes)

    def _filter(batch: pd.DataFrame) -> pd.DataFrame:
        pl = ray.get(planes_ref)
        want = ray.get(wanted_ref)
        mat = np.asarray([np.asarray(v, dtype=np.float64)
                          for v in batch[emb_col]])
        bucket = ((mat @ pl > 0).astype(np.uint64) <<
                  np.arange(num_planes, dtype=np.uint64)).sum(axis=1)
        keep = np.isin(bucket, want)
        return batch[keep]

    candidates = emb_ds.map_batches(_filter, batch_format="pandas")
    return brute_force_topk(candidates, queries, k, id_col, emb_col,
                            concurrency)
