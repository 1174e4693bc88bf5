"""Crawl-snapshot diff operators: edge churn and per-vertex degree delta.

A production web pipeline re-crawls continuously; the graph maintenance
step diffs consecutive snapshots — which links appeared/vanished
(churn) and how each page's out-degree moved (the freshness/decay
signal; cf. Ntoulas, Cho & Olston, "What's new on the web?", WWW'04).
The reference is a single-crawl engine (crawler/core.py runs one BFS
frontier); these operators extend it to the recrawl loop.

Scale shape: churn is ONE hash-partitioned semi-join over the two
distinct edge sets plus three streaming counts (added/removed derived
arithmetically — never materialized as row sets); degree delta is ONE
two-input tagged count shuffle (taskshuffle.two_way_count_int64) — no
join at all, both snapshots' partials meet in the reducer by key hash.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def edge_churn(edges_a, edges_b, num_partitions: int = 16):
    """One row ``(n_a, n_b, n_common, n_added, n_removed, jaccard)``
    comparing the DISTINCT edge sets of two snapshots.

    Only the common count needs a join (both sides distinct, so the
    semi-join count equals the SQL inner-join COUNT(*)); added/removed
    fall out arithmetically, and the Jaccard is one float64 division of
    exact int64 counts — bit-identical to the SQL twin.
    """
    from .relational import distinct, semi_join

    a = distinct(edges_a, ["src", "dst"], num_partitions).materialize()
    b = distinct(edges_b, ["src", "dst"], num_partitions).materialize()
    n_a = a.count()
    n_b = b.count()
    n_common = semi_join(a, b, on=("src", "dst"),
                         num_partitions=num_partitions).count()
    union = n_a + n_b - n_common
    jac = float(n_common) / float(union) if union else 0.0
    return rd.from_arrow(pa.table({
        "n_a": pa.array([n_a], pa.int64()),
        "n_b": pa.array([n_b], pa.int64()),
        "n_common": pa.array([n_common], pa.int64()),
        "n_added": pa.array([n_b - n_common], pa.int64()),
        "n_removed": pa.array([n_a - n_common], pa.int64()),
        "jaccard": pa.array([jac], pa.float64())}))


def degree_delta(edges_a, edges_b, src_col: str = "src",
                 num_reducers: int | None = None):
    """Per-vertex out-degree movement between two snapshots:
    ``(src, outdeg_a, outdeg_b, delta)`` over the UNION of sources
    (missing side = 0) — the FULL OUTER JOIN of the two degree tables,
    computed without a join via the tagged two-input count shuffle."""
    from .taskshuffle import two_way_count_int64

    counts = two_way_count_int64(
        edges_a.select_columns([src_col]), edges_b.select_columns([src_col]),
        src_col, num_reducers, out_a="outdeg_a", out_b="outdeg_b")

    def _delta(t: pa.Table) -> pa.Table:
        import numpy as np
        a = np.asarray(t["outdeg_a"], dtype=np.int64)
        b = np.asarray(t["outdeg_b"], dtype=np.int64)
        return pa.table({src_col: t[src_col].combine_chunks(),
                         "outdeg_a": t["outdeg_a"].combine_chunks(),
                         "outdeg_b": t["outdeg_b"].combine_chunks(),
                         "delta": pa.array(b - a, pa.int64())})

    return counts.map_batches(_delta, batch_format="pyarrow")


def rank_delta(edges_a, edges_b, num_owners: int = 4, sweeps: int = 20,
               alpha: float = 0.85, num_partitions: int = 8):
    """Per-vertex PageRank movement between two crawl snapshots — the
    rank-churn signal that drives re-crawl prioritization (pages whose
    rank is rising get fetched sooner).

    Runs fixed-``sweeps`` PageRank on snapshot A, then on snapshot B
    **warm-started from A's final vector** (the recrawl loop's real
    shape: new-since-A vertices seed at uniform 1/n_B, vanished vertices
    drop — ``graph.engine._install_warm_start``).  With ``tol=0`` both
    solves run exactly ``sweeps`` power sweeps, so a SQL twin can unroll
    the same two chains and match bit-for-bit at hash precision.

    Returns ``(vid, rank_a, rank_b, delta)`` over snapshot B's vertex
    universe; ``rank_a`` is 0.0 for pages new in B (delta = rank_b), and
    ``delta = rank_b - rank_a`` is one exact float64 subtraction per row.

    Scale shape: two mesh solves (the engine's core primitive); both
    meshes use the same ``vid % P`` partition map, so the per-vertex
    combine is a per-owner slot-aligned zip (A's slice zero-padded past
    n_A) — no join at all.
    """
    import ray
    import ray.data as _rd
    from ..graph.engine import ShardedGraph, pagerank

    zip_delta = ray.remote(_zip_delta_fn)

    g_a = ShardedGraph.build(edges_a, num_owners=num_owners)
    try:
        pagerank(g_a, alpha=alpha, tol=0.0, max_iter=sweeps)
        a_refs = [ray.put(t) for t in ray.get(
            [ow.ranks_table.remote() for ow in g_a.owners])]
    finally:
        g_a.shutdown()

    g_b = ShardedGraph.build(edges_b, num_owners=num_owners)
    try:
        pagerank(g_b, alpha=alpha, tol=0.0, max_iter=sweeps,
                 warm_start=_rd.from_arrow_refs(a_refs))
        refs = [zip_delta.remote(a_refs[j], ow.ranks_table.remote())
                for j, ow in enumerate(g_b.owners)]
        out = _rd.from_arrow_refs(refs).materialize()
    finally:
        g_b.shutdown()
    return out


def _zip_delta_fn(a_t: pa.Table, b_t: pa.Table) -> pa.Table:
    """Slot-aligned zip of snapshot A's and B's per-owner rank tables
    (same vid %% P map; A zero-padded past its universe, A's extra slots
    are vanished pages and drop — the warm-start contract)."""
    import numpy as np
    import pyarrow.compute as pc
    rb = b_t["rank"].combine_chunks().cast(pa.float64())
    a = a_t["rank"].to_numpy(zero_copy_only=False)
    ra_np = np.zeros(len(rb))
    m = min(len(a), len(rb))
    ra_np[:m] = a[:m]
    ra = pa.array(ra_np, pa.float64())
    return pa.table({"vid": b_t["vid"].combine_chunks(),
                     "rank_a": ra, "rank_b": rb,
                     "delta": pc.subtract(rb, ra)})
