"""Distributed Lloyd's k-means over an embedding column.

Unlike :func:`stages.similarity.train_centroids` (which trains the IVF
coarse quantizer on a bounded driver-pulled sample), this is the full
distributed algorithm: every iteration is one ``map_batches`` pass that
computes per-batch partial sums (k rows per batch: cluster, member count,
coordinate sums), and only those tiny partials — ``num_blocks × k`` rows
of dimension-``d`` lists — ever reach the driver.  Vectors themselves
never leave the object store, so the same plan runs at corpus scale.

Every rule is deterministic and SQL-replayable, so the DuckDB oracle
(unrolled per-iteration CTEs, see ``__ray_entry__.oracle_sql``) matches
the assignment table:

- init: the embeddings of the ``k`` smallest ids (no RNG);
- assignment: argmin squared-L2 distance, ties to the smallest
  cluster index (numpy ``argmin`` first-hit == SQL ``ORDER BY d, cidx``);
- update: coordinate-wise mean; an empty cluster keeps its previous
  centroid.

Precision caveat: the oracle parity is EMPIRICAL, not guaranteed — the
two engines compute squared distances with different float fold orders
(numpy vectorized pairwise sums vs DuckDB's sequential
``list_distance``), so a pair of centroids whose distances to a vector
differ only in the last ulp could flip an argmin and cascade through
later centroid updates.  No such near-tie exists on the test fixtures
(verified by the passing hash oracle at three scale factors); at real
corpus scale treat assignment boundaries as ±1-ulp fuzzy, or scale
inputs to fixed-precision integers if exact cross-engine parity is a
requirement.

Reference scope note: the reference engine (begum-kara/
Hackathon-PageRank) has no clustering surface; this extends the
training-data operator family (SURVEY.md §2 addenda) — IVF-ANN's scale
path trains its quantizer with exactly this loop.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def _stack(col) -> np.ndarray:
    return np.asarray([np.asarray(v, dtype=np.float64) for v in col])


def kmeans_fit(emb_ds, k: int = 8, iters: int = 3, id_col: str = "vec_id",
               emb_col: str = "embedding") -> np.ndarray:
    """Train centroids; returns the (k, d) float64 centroid matrix."""
    import ray

    # deterministic init: per-batch min-k, then a tiny driver merge
    def _mink(df: pd.DataFrame) -> pd.DataFrame:
        return df.nsmallest(k, id_col)[[id_col, emb_col]]

    init = (emb_ds.map_batches(_mink, batch_format="pandas")
            .to_pandas().nsmallest(k, id_col).sort_values(id_col))
    cents = _stack(init[emb_col])
    d = cents.shape[1]

    for _ in range(iters):
        cref = ray.put(cents)

        def _partial(df: pd.DataFrame) -> pa.Table:
            c = ray.get(cref)
            x = _stack(df[emb_col])
            if not len(x):
                return pa.table({
                    "cluster": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "s": pa.array([], pa.list_(pa.float64()))})
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)            # first hit == smallest cluster idx
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=len(c)).astype(np.int64)
            nz = np.flatnonzero(cnt)
            return pa.table({
                "cluster": pa.array(nz, pa.int64()),
                "cnt": pa.array(cnt[nz], pa.int64()),
                "s": pa.array(list(sums[nz]), pa.list_(pa.float64()))})

        parts = emb_ds.map_batches(
            _partial, batch_format="pandas").to_pandas()
        sums = np.zeros((len(cents), d))
        cnt = np.zeros(len(cents), dtype=np.int64)
        # driver reduce over num_blocks × k tiny partial rows
        for cl, n, s in zip(parts["cluster"], parts["cnt"], parts["s"]):
            sums[cl] += np.asarray(s, dtype=np.float64)
            cnt[cl] += n
        nz = cnt > 0
        cents[nz] = sums[nz] / cnt[nz, None]   # empty cluster: keep old
    return cents


def kmeans_assign(emb_ds, k: int = 8, iters: int = 3,
                  id_col: str = "vec_id", emb_col: str = "embedding",
                  centroids: np.ndarray | None = None):
    """(id, cluster) assignment table under the final centroids."""
    import ray

    cents = kmeans_fit(emb_ds, k, iters, id_col, emb_col) \
        if centroids is None else np.asarray(centroids, dtype=np.float64)
    cref = ray.put(cents)

    def _assign(df: pd.DataFrame) -> pa.Table:
        c = ray.get(cref)
        x = _stack(df[emb_col])
        a = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1).argmin(1) \
            if len(x) else np.empty(0, dtype=np.int64)
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
            "cluster": pa.array(a.astype(np.int64), pa.int64())})

    return emb_ds.map_batches(_assign, batch_format="pandas")
