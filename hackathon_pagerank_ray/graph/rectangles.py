"""Global rectangle (4-cycle) census over the undirected simple graph.

The 4-cycle count is the classic link-farm / co-purchase structural
signal (butterfly counting in the bipartite literature — Wang et al.,
"Butterfly Counting in Bipartite Networks", and Sanei-Mehri et al.
KDD'18 use the same codegree identity).  Identity: every 4-cycle has
exactly two vertex-disjoint diagonals, so

    C4 = (1/2) · Σ_{u<v} C(codeg(u, v), 2)

where codeg counts common neighbors over ALL vertex pairs (adjacent or
not — a 4-cycle's diagonal may be chorded).  All terms are exact
integers; the engine and the SQL twin sum the same numbers.

Plan: the codegree table is the same per-center segmented pair
expansion the link-prediction ops use — below the broadcast gate it
runs the center-parallel plan over the one-task layout
(`linkpred._pair_scores_parallel`), past it the wedge rows shuffle
through a ``groupby(center).map_groups`` pair expansion and ONE
(u, v)-keyed count.  The final reduce is a 3-scalar per-batch partial
(Σ C(cn,2), pair count, max cn) merged in one tiny aggregate — nothing
bigger than scalars reaches the driver.

Scale note: wedge volume is Σ deg(c)² — super-hub centers dominate.
At web scale cap or pre-filter hub centers (the same documented skew
knob as `linkpred.common_neighbors_topk`); the exact uncapped mode is
what the SQL oracle checks.

Reference scope note: the reference has no motif-census surface
(SURVEY.md §2 addenda) — rectangles complement the triangle counter as
the standard even-cycle spam signal on web graphs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

def _partials(t: pa.Table, col: str) -> pa.Table:
    """Per-batch (Σ C(cn,2), #pairs, max cn) over exact int64 codegrees.
    cn < 2^31 keeps cn·(cn−1)/2 inside int64 (vids are < 2^31 by the
    packed-pair bound, so cn — a count of common neighbors — is too)."""
    cn = np.asarray(t[col], dtype=np.int64)
    halves = cn * (cn - 1) // 2
    return pa.table({
        "diag2": pa.array([int(halves.sum())], pa.int64()),
        "pairs": pa.array([len(cn)], pa.int64()),
        "mx": pa.array([int(cn.max()) if len(cn) else 0], pa.int64())})


def rectangle_count(edges_ds, num_partitions: int = 16,
                    small_threshold: int = 2_000_000):
    """ONE row ``(rectangles, codegree_pairs, max_codegree)`` for the
    canonical undirected simple graph (self-loops dropped):
    ``rectangles`` = number of distinct 4-cycles, ``codegree_pairs`` =
    vertex pairs sharing ≥1 common neighbor, ``max_codegree`` = the
    largest codegree.  Exact — no sampling, no caps."""
    import ray

    from ..stages.schema_util import drop_empty_blocks, enforce_schema
    from .linkpred import _small_gate, _symmetrize
    from .triangles import canonical_undirected

    def _one(diag2: int, pairs: int, mx: int):
        assert diag2 % 2 == 0, "4-cycle diagonal sum must be even"
        return ray.data.from_arrow(pa.table({
            "rectangles": pa.array([diag2 // 2], pa.int64()),
            "codegree_pairs": pa.array([pairs], pa.int64()),
            "max_codegree": pa.array([mx], pa.int64())}))

    edges_ds, small, merged, _lay = _small_gate(
        edges_ds, "cn", None, small_threshold)
    if small:
        if merged is None:
            return _one(0, 0, 0)
        parts = merged.map_batches(
            lambda t: _partials(t, "sum(s)"),
            batch_format="pyarrow").take_all()     # ≤ reducer-count rows
        return _one(sum(p["diag2"] for p in parts),
                    sum(p["pairs"] for p in parts),
                    max((p["mx"] for p in parts), default=0))

    und = canonical_undirected(edges_ds, num_partitions).materialize()
    nbr = und.map_batches(_symmetrize, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        b = np.sort(g["b"].to_numpy())
        if len(b) < 2:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64")})
        i, j = np.triu_indices(len(b), k=1)
        return pd.DataFrame({"u": b[i], "v": b[j]})

    wedges = drop_empty_blocks(enforce_schema(
        nbr.groupby("a").map_groups(_pairs, batch_format="pandas"),
        pa.schema([("u", pa.int64()), ("v", pa.int64())])))
    counts = drop_empty_blocks(wedges.groupby(["u", "v"]).count())
    parts = counts.map_batches(
        lambda t: _partials(t, "count()"),
        batch_format="pyarrow").take_all()         # ≤ block-count rows
    return _one(sum(p["diag2"] for p in parts),
                sum(p["pairs"] for p in parts),
                max((p["mx"] for p in parts), default=0))
