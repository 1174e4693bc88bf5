"""Betweenness centrality via source-parallel Brandes (Brandes 2001).

Directed, unweighted betweenness over the distinct edge table: for every
ordered pair (s, t), each intermediate vertex v earns
sigma_st(v) / sigma_st — the fraction of shortest s→t paths through v.

Parallel decomposition: the SOURCES are the data-parallel axis.  The CSR
adjacency is built once and ``ray.put`` into the object store; a stateful
actor pool maps over batches of source vertices, each actor running a
level-synchronous (numpy-vectorized) Brandes forward/backward sweep per
source and accumulating the dependency vector locally across its whole
batch.  One tiny ``groupby("vid").sum`` merges the per-actor partials.
This is exact for ``max_sources=None`` and the standard unbiased sampled
estimator (scaled by n_sources/|sample|) otherwise; the sample is chosen
by md5 rank so runs are deterministic and resumable.

Partitioning assumption (documented per SURVEY.md custom-operator rule):
the CSR adjacency must fit in one worker's heap — the same broadcast
contract as stages/similarity's brute-force ANN.  At cluster scale the
sampled mode (``max_sources``) bounds compute, not memory; a
shards-distributed multi-source BFS would lift the memory bound and is
out of scope here.

Reference scope note: the reference engine (begum-kara/Hackathon-PageRank,
backend/cuda/pagerank_gpu.cu) ships PageRank only; betweenness extends the
same link-graph analytics surface (SURVEY.md §2 G-family).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.relational import distinct


def _distinct_edges(edges_ds, num_partitions: int):
    """Distinct directed edges, materialized once — shared by the gate
    (row count) and whichever path the gate picks."""
    return distinct(edges_ds, ["src", "dst"], num_partitions).materialize()


def _csr_and_sources(edges_ds, num_partitions: int,
                     max_sources: int | None = None, seed: int = 42,
                     restrict=None, already_distinct: bool = False):
    """Distinct edges → CSR + source table, built in ONE worker task.

    Returns ``(csr_ref, src_ref, n_sources, scale)``: an ObjectRef to
    the ``(verts, indptr, nbrs)`` CSR tuple (dense 0..n-1 ids over the
    sorted src∪dst vertex union), an ObjectRef to a one-column Arrow
    table of source vids, the source count, and the sampled-estimator
    scale.  The driver never holds the edge table or the CSR — only the
    two scalars cross to it (round-2 verdict: the previous version
    ``ray.get``-concatenated every distinct-edge block on the driver).

    ``max_sources`` md5-rank-samples the sources (deterministic,
    resume-stable; scale = n_sources / max_sources); ``restrict``
    intersects with an explicit start set first.
    """
    import ray

    e = edges_ds if already_distinct else \
        _distinct_edges(edges_ds, num_partitions)
    refs = e.to_arrow_refs()

    @ray.remote(num_returns=4)
    def _build(restrict, *parts):
        # to_arrow_refs does not convert pandas blocks — normalize
        parts = [p if isinstance(p, pa.Table)
                 else pa.Table.from_pandas(p, preserve_index=False)
                 for p in parts]
        parts = [p for p in parts if p.num_rows]
        empty_src = pa.table({"start": pa.array([], pa.int64())})
        if not parts:
            return (np.empty(0, np.int64), np.zeros(1, np.int64),
                    np.empty(0, np.int64)), empty_src, 0, 1.0
        tbl = pa.concat_tables(parts)
        src = tbl["src"].to_numpy(zero_copy_only=False)
        dst = tbl["dst"].to_numpy(zero_copy_only=False)
        verts = np.unique(np.concatenate([src, dst]))
        s = np.searchsorted(verts, src)
        d = np.searchsorted(verts, dst)
        # neighbor lists sorted ascending: the distinct() upstream emits
        # edges in shuffle order, and float dependency accumulation in
        # edge order would make last-ulp results run-dependent
        order = np.lexsort((d, s))
        s, d = s[order], d[order]
        indptr = np.zeros(len(verts) + 1, dtype=np.int64)
        np.add.at(indptr, s + 1, 1)
        np.cumsum(indptr, out=indptr)
        sources = verts[(indptr[1:] - indptr[:-1]) > 0]
        if restrict is not None:
            sources = np.intersect1d(
                sources, np.asarray(restrict, dtype=np.int64))
        scale = 1.0
        if max_sources is not None and len(sources) > max_sources:
            # rank by the big-endian md5 prefix (bulk-hashed) — identical
            # order to lexicographic digest[:8] bytes, deterministic
            from ..stages.stats import _bulk_md5_upper_be
            ranks = _bulk_md5_upper_be(
                sources.astype(str), [f"{seed}:"])[0]
            pick = np.argsort(ranks, kind="stable")[:max_sources]
            scale = len(sources) / max_sources
            sources = np.sort(sources[pick])
        return ((verts, indptr, d),
                pa.table({"start": pa.array(sources, pa.int64())}),
                len(sources), scale)

    csr_ref, src_ref, n_ref, scale_ref = _build.remote(restrict, *refs)
    return csr_ref, src_ref, int(ray.get(n_ref)), float(ray.get(scale_ref))


def _brandes_source(src_dense: int, indptr: np.ndarray, nbrs: np.ndarray,
                    n: int) -> np.ndarray:
    """One exact Brandes sweep from ``src_dense``; returns its dependency
    vector delta.

    Level-synchronous: each BFS level expands every frontier out-edge in
    one vectorized gather, so the python-level loop count is the graph
    diameter, not the vertex count.  With the CSR's ascending neighbor
    order, every float accumulation runs in ascending (u, w) order — the
    order the SQL twin's ordered list folds reproduce.
    """
    dist = np.full(n, -1, dtype=np.int64)
    sigma = np.zeros(n, dtype=np.float64)
    dist[src_dense] = 0
    sigma[src_dense] = 1.0
    frontier = np.array([src_dense], dtype=np.int64)
    levels = [frontier]
    level = 0
    while True:
        u, w = _expand(indptr, nbrs, frontier)
        if not len(u):
            break
        level += 1
        nxt = np.unique(w[dist[w] == -1])
        dist[nxt] = level
        on_sp = dist[w] == level
        np.add.at(sigma, w[on_sp], sigma[u[on_sp]])
        if not len(nxt):
            break
        frontier = nxt
        levels.append(nxt)
    # backward accumulation
    delta = np.zeros(n, dtype=np.float64)
    for frontier in reversed(levels[:-1]):
        u, w = _expand(indptr, nbrs, frontier)
        on_sp = dist[w] == dist[u] + 1
        u, w = u[on_sp], w[on_sp]
        np.add.at(delta, u, (sigma[u] / sigma[w]) * (1.0 + delta[w]))
    delta[src_dense] = 0.0
    return delta


def _expand(indptr: np.ndarray, nbrs: np.ndarray, frontier: np.ndarray):
    """All out-edges of the frontier as parallel (u, w) arrays — one
    vectorized gather, no per-vertex python loop."""
    counts = indptr[frontier + 1] - indptr[frontier]
    f = frontier[counts > 0]
    counts = counts[counts > 0]
    if not len(f):
        e = np.empty(0, dtype=np.int64)
        return e, e
    total = int(counts.sum())
    # concatenated ranges [indptr[v], indptr[v+1]) via the cumsum trick
    step = np.ones(total, dtype=np.int64)
    seg = np.zeros(len(f), dtype=np.int64)
    np.cumsum(counts[:-1], out=seg[1:])
    prev_end = indptr[f[:-1]] + counts[:-1]
    step[0] = indptr[f[0]]
    step[seg[1:]] = indptr[f[1:]] - prev_end + 1
    idx = np.cumsum(step)
    return np.repeat(f, counts), nbrs[idx]


class _BrandesBatch:
    """Actor-pool stage: CSR fetched once in __init__, Brandes per source
    in __call__, dependencies accumulated locally across the batch.
    ``exact_fold=True`` emits per-source (vid, s, delta) rows instead of
    batch-local partial sums, so the final per-vertex total can fold in
    ascending-source order (SQL-twin-exact); the default partial-sum
    shape is the scale path (exchange ≤ reach rows per batch)."""

    def __init__(self, csr_ref, scale: float, exact_fold: bool = False):
        import ray
        self.verts, self.indptr, self.nbrs = ray.get(csr_ref)
        self.scale = scale
        self.exact_fold = exact_fold

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        n = len(self.verts)
        starts = batch["start"].to_numpy()
        if self.exact_fold:
            out_v, out_s, out_d = [], [], []
            for raw, s in zip(starts, np.searchsorted(self.verts, starts)):
                delta = _brandes_source(int(s), self.indptr, self.nbrs, n)
                nz = np.flatnonzero(delta)
                out_v.append(self.verts[nz])
                out_s.append(np.full(len(nz), raw, dtype=np.int64))
                out_d.append(delta[nz])
            cat = (lambda a, t: np.concatenate(a) if a
                   else np.empty(0, dtype=t))
            return pa.table({
                "vid": pa.array(cat(out_v, np.int64), pa.int64()),
                "s": pa.array(cat(out_s, np.int64), pa.int64()),
                "delta": pa.array(cat(out_d, np.float64), pa.float64())})
        bc = np.zeros(n, dtype=np.float64)
        for s in np.searchsorted(self.verts, starts):
            bc += _brandes_source(int(s), self.indptr, self.nbrs, n)
        nz = np.flatnonzero(bc)
        return pa.table({
            "vid": pa.array(self.verts[nz], pa.int64()),
            "part": pa.array(bc[nz] * self.scale, pa.float64())})


def betweenness_centrality(edges_ds, num_partitions: int = 16,
                           max_sources: int | None = None, seed: int = 42,
                           concurrency: int = 8, exact_fold: bool = False,
                           small_threshold: int = 2_000_000,
                           lanes: int = 8):
    """(vid, betweenness) for every vertex with positive centrality.

    Exact (all vertices with out-edges as sources) when ``max_sources``
    is None; otherwise the md5-rank-sampled estimator scaled by
    n_sources / max_sources.  Zero-centrality vertices are omitted
    (same contract as mutual_edge_counts).

    Adaptive gate (same pattern as linkpred's wedge plan): at or below
    ``small_threshold`` distinct edges the broadcast-CSR source-parallel
    plan runs (CSR ray.put once, actors sweep source batches — the
    SQL-twin-exact path); above it the partitioned K-lane Brandes in
    :mod:`.brandes_sharded` runs — no whole-graph structure in any
    single worker, ``max_sources`` bounds compute with the SAME
    deterministic md5 sample.  The sharded path's float association
    differs (allclose ~1e-9 to the broadcast result).

    ``exact_fold=True`` makes the per-vertex total a sequential
    ascending-source fold (heavier exchange: per-source dependency rows
    instead of batch partials) so the result is bit-reproducible by an
    ordered-list SQL fold — the oracle-parity mode, not the scale mode
    (it always uses the broadcast plan).
    """
    import ray

    e = _distinct_edges(edges_ds, num_partitions)
    if not exact_fold and e.count() > small_threshold:
        from .brandes_sharded import betweenness_sharded
        return betweenness_sharded(
            e, num_owners=max(2, num_partitions // 2), lanes=lanes,
            max_sources=max_sources, seed=seed)
    csr_ref, src_ref, n_sources, scale = _csr_and_sources(
        e, num_partitions, max_sources=max_sources, seed=seed,
        already_distinct=True)
    if not n_sources:
        return ray.data.from_arrow(pa.table({
            "vid": pa.array([], pa.int64()),
            "betweenness": pa.array([], pa.float64())}))

    src_ds = ray.data.from_arrow_refs([src_ref])
    # leave headroom for the downstream groupby's shuffle aggregators —
    # a fixed pool sized past the session's CPUs deadlocks small sessions
    cpus = int(ray.cluster_resources().get("CPU", 8))
    conc = max(1, min(concurrency, cpus - 2, n_sources))
    batch = max(1, (n_sources + conc - 1) // conc)
    parts = src_ds.map_batches(
        _BrandesBatch, fn_constructor_args=(csr_ref, scale, exact_fold),
        concurrency=conc, batch_size=min(batch, 4096),
        batch_format="pandas")
    if exact_fold:
        def _fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("s", kind="stable")
            total = float(np.cumsum(g["delta"].to_numpy())[-1]) * scale
            return pd.DataFrame({"vid": [int(g["vid"].iloc[0])],
                                 "betweenness": [total]})

        return parts.groupby("vid").map_groups(_fold, batch_format="pandas")
    out = parts.groupby("vid").sum("part")
    return out.map_batches(
        lambda t: pa.table({
            "vid": t["vid"].combine_chunks().cast(pa.int64()),
            "betweenness": t["sum(part)"].combine_chunks()}),
        batch_format="pyarrow")


class _ClosenessBatch:
    """Actor-pool stage: one BFS per source over the shared CSR; emits
    one row per source directly (no downstream shuffle)."""

    def __init__(self, csr_ref):
        import ray
        self.verts, self.indptr, self.nbrs = ray.get(csr_ref)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        n = len(self.verts)
        vids, clos, reach = [], [], []
        for raw, s in zip(batch["start"].to_numpy(),
                          np.searchsorted(self.verts,
                                          batch["start"].to_numpy())):
            dist = np.full(n, -1, dtype=np.int64)
            dist[s] = 0
            frontier = np.array([s], dtype=np.int64)
            level = 0
            while len(frontier):
                u, w = _expand(self.indptr, self.nbrs, frontier)
                if not len(u):
                    break
                level += 1
                nxt = np.unique(w[dist[w] == -1])
                dist[nxt] = level
                frontier = nxt
            d = dist[dist > 0]
            vids.append(int(raw))
            reach.append(len(d))
            clos.append(float(len(d)) / float(d.sum()) if len(d) else 0.0)
        return pa.table({"vid": pa.array(vids, pa.int64()),
                         "closeness": pa.array(clos, pa.float64()),
                         "n_reachable": pa.array(reach, pa.int64())})


def closeness_centrality(edges_ds, num_partitions: int = 16,
                         concurrency: int = 8, sources=None,
                         small_threshold: int = 2_000_000,
                         lanes: int = 8):
    """(vid, closeness, n_reachable) per vertex with out-edges:
    out-closeness C(s) = |reachable| / sum of d(s, t) (0.0 when nothing
    is reachable).  Below ``small_threshold`` distinct edges: the
    broadcast-CSR source-parallel plan; above: the partitioned K-lane
    BFS (:func:`.brandes_sharded.distance_stats_sharded`) — distances
    and reach counts are exact int sums, so closeness is bit-identical
    between the two plans.  ``sources`` restricts to an explicit start
    set (intersected with the out-degree>0 vertices)."""
    import ray

    e = _distinct_edges(edges_ds, num_partitions)
    if e.count() > small_threshold:
        from .brandes_sharded import distance_stats_sharded
        stats = distance_stats_sharded(
            e, num_owners=max(2, num_partitions // 2), lanes=lanes,
            sources=sources)
        return stats.map_batches(
            lambda t: pa.table({
                "vid": t["vid"].combine_chunks(),
                "closeness": pa.array(
                    np.divide(
                        t["n_reachable"].to_numpy(zero_copy_only=False)
                        .astype(np.float64),
                        t["sum_dist"].to_numpy(zero_copy_only=False)
                        .astype(np.float64),
                        out=np.zeros(t.num_rows),
                        where=t["sum_dist"].to_numpy(zero_copy_only=False)
                        > 0),
                    pa.float64()),
                "n_reachable": t["n_reachable"].combine_chunks()}),
            batch_format="pyarrow")
    csr_ref, src_ref, n_sources, _ = _csr_and_sources(
        e, num_partitions, restrict=sources, already_distinct=True)
    if not n_sources:
        return ray.data.from_arrow(pa.table({
            "vid": pa.array([], pa.int64()),
            "closeness": pa.array([], pa.float64()),
            "n_reachable": pa.array([], pa.int64())}))
    src_ds = ray.data.from_arrow_refs([src_ref])
    cpus = int(ray.cluster_resources().get("CPU", 8))
    conc = max(1, min(concurrency, cpus - 2, n_sources))
    batch = max(1, (n_sources + conc - 1) // conc)
    return src_ds.map_batches(
        _ClosenessBatch, fn_constructor_args=(csr_ref,),
        concurrency=conc, batch_size=min(batch, 4096),
        batch_format="pandas")


class _HarmonicBatch:
    """Like :class:`_ClosenessBatch` but emits out-harmonic
    sum(1/d(s,t)).  Exactness: per-distance integer counts are folded in
    ascending-d order with sequential double adds — the same fixed-order
    fold the SQL twin's list_sum over ``list(c/d ORDER BY d)`` runs, so
    no float-summation-order drift."""

    def __init__(self, csr_ref):
        import ray
        self.verts, self.indptr, self.nbrs = ray.get(csr_ref)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        n = len(self.verts)
        vids, harm, reach = [], [], []
        for raw, s in zip(batch["start"].to_numpy(),
                          np.searchsorted(self.verts,
                                          batch["start"].to_numpy())):
            dist = np.full(n, -1, dtype=np.int64)
            dist[s] = 0
            frontier = np.array([s], dtype=np.int64)
            level = 0
            while len(frontier):
                u, w = _expand(self.indptr, self.nbrs, frontier)
                if not len(u):
                    break
                level += 1
                nxt = np.unique(w[dist[w] == -1])
                dist[nxt] = level
                frontier = nxt
            d = dist[dist > 0]
            cnts = np.bincount(d) if len(d) else np.zeros(1, np.int64)
            h = 0.0
            for dd in range(1, len(cnts)):     # ascending-d fixed fold
                if cnts[dd]:
                    h += float(cnts[dd]) / float(dd)
            vids.append(int(raw))
            reach.append(len(d))
            harm.append(h)
        return pa.table({"vid": pa.array(vids, pa.int64()),
                         "harmonic": pa.array(harm, pa.float64()),
                         "n_reachable": pa.array(reach, pa.int64())})


def harmonic_out_centrality(edges_ds, num_partitions: int = 16,
                            concurrency: int = 8, sources=None,
                            small_threshold: int = 2_000_000,
                            lanes: int = 8):
    """(vid, harmonic, n_reachable): exact out-harmonic centrality
    sum_t 1/d(s,t) — the exact small-scale twin of HyperBall's estimate.
    Below ``small_threshold`` distinct edges: the broadcast-CSR plan
    with the ascending-d SQL-twin fold; above: the partitioned K-lane
    BFS, whose harmonic sum folds in owner-major order (allclose to the
    broadcast fold; reach counts stay exact)."""
    import ray

    e = _distinct_edges(edges_ds, num_partitions)
    if e.count() > small_threshold:
        from .brandes_sharded import distance_stats_sharded
        stats = distance_stats_sharded(
            e, num_owners=max(2, num_partitions // 2), lanes=lanes,
            sources=sources)
        return stats.map_batches(
            lambda t: pa.table({
                "vid": t["vid"].combine_chunks(),
                "harmonic": t["harmonic"].combine_chunks(),
                "n_reachable": t["n_reachable"].combine_chunks()}),
            batch_format="pyarrow")
    csr_ref, src_ref, n_sources, _ = _csr_and_sources(
        e, num_partitions, restrict=sources, already_distinct=True)
    if not n_sources:
        return ray.data.from_arrow(pa.table({
            "vid": pa.array([], pa.int64()),
            "harmonic": pa.array([], pa.float64()),
            "n_reachable": pa.array([], pa.int64())}))
    src_ds = ray.data.from_arrow_refs([src_ref])
    cpus = int(ray.cluster_resources().get("CPU", 8))
    conc = max(1, min(concurrency, cpus - 2, n_sources))
    batch = max(1, (n_sources + conc - 1) // conc)
    return src_ds.map_batches(
        _HarmonicBatch, fn_constructor_args=(csr_ref,),
        concurrency=conc, batch_size=min(batch, 4096),
        batch_format="pandas")
