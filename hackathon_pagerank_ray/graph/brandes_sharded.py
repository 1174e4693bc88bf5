"""Partitioned Brandes betweenness / closeness over the sharded mesh.

The at-scale exact path (r3 verdict directive #2): the broadcast path in
:mod:`hackathon_pagerank_ray.graph.betweenness` builds one CSR of the whole
graph in a single worker — fine below the gate, impossible at 10^12
documents.  This module removes the one-worker-heap bound entirely: edges
live only in :class:`~.shards.EdgeShard` partitions, vertex state only in
``(n/P, K)`` matrices on the :class:`~.shards.RankOwner` actors, and a batch
of K sources runs level-synchronously as lanes:

* **forward** (forward mesh): per BFS level, owners publish each lane's
  frontier sigma (shortest-path counts), shards plain-sum them over their
  edges per destination (``lane_sum_partials``) and owners assign
  newly-reached vertices to the next level — sigma values are
  integer-in-float, so the sums are exact regardless of order;
* **backward** (reversed mesh, same ``vid % P`` layout): from the deepest
  level down, owners publish ``g(v) = (1 + delta(v)) / sigma(v)`` masked to
  that level, shards sum ``g`` over the reversed edges, and predecessors
  fold ``delta(u) += sigma(u)·Σg`` — Brandes' dependency recursion with the
  per-edge division factored per-vertex, which associates float ops
  differently from the broadcast path (parity is allclose ~1e-9, not
  bit-equal; the driver-conformance queries stay on the broadcast path
  below the gate, where the SQL-twin fold is reproduced exactly).

Cost shape: per level each mesh does O(m·K) bincount work and ships one
(n/P, K) object per owner — the standard price of a level-synchronous mesh
sweep (frontier sparsity is not exploited); ``max_sources`` bounds total
compute via the same deterministic md5-rank sample as the broadcast path,
computed owner-side so the driver never holds more than P·max_sources
candidate rows.

Reference scope note: the reference (begum-kara/Hackathon-PageRank) ships
PageRank only (backend/cuda/pagerank_gpu.cu); betweenness extends the same
link-graph surface (SURVEY.md §2 G-family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _reverse_ds(edges_ds):
    return edges_ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["dst"].combine_chunks(), t["src"].combine_chunks()],
            names=["src", "dst"]),
        batch_format="pyarrow")


def _build_meshes(edges_ds, num_owners: int, gather_mode: str = "auto"):
    """Forward + reversed meshes sharing the vid % P layout
    (``gather_mode`` as in ``ShardedGraph.build``: auto picks the
    subscribe gather on a multi-node cluster)."""
    from .engine import ShardedGraph
    g_fwd = ShardedGraph.build(edges_ds, num_owners=num_owners,
                               gather_mode=gather_mode)
    g_rev = ShardedGraph.build(_reverse_ds(edges_ds), n=g_fwd.n,
                               num_owners=num_owners,
                               gather_mode=g_fwd.gather_mode)
    return g_fwd, g_rev


def _lane_partials(graph, kind: str, level: int):
    """One K-lane gather + shard-partial wave: full mode ships each
    owner's whole publish matrix (one plasma object per owner, shared by
    every shard); subscribe mode ships only each shard's subscription
    rows (``RankOwner.lane_slices_all``, one owner call with E returns —
    the multi-node path)."""
    if graph.gather_mode == "full":
        pub = ("brandes_publish_sigma" if kind == "sigma"
               else "brandes_publish_g")
        vals = [getattr(ow, pub).remote(level) for ow in graph.owners]
        return [sh.lane_sum_partials.remote(*vals)
                for sh in graph.edge_shards]
    per_owner = []
    for ow in graph.owners:
        refs = ow.lane_slices_all.options(
            num_returns=graph.E).remote(kind, level)
        if graph.E == 1:
            refs = [refs]
        per_owner.append(refs)
    return [
        graph.edge_shards[e].lane_sum_partials.remote(
            *[per_owner[j][e] for j in range(graph.P)])
        for e in range(graph.E)
    ]


def _sample_sources(g_fwd, max_sources, seed: int):
    """Merge the owners' local md5-rank samples into the global source
    set: exact mode returns every outdeg>0 vid; sampled mode the global
    ``max_sources`` smallest ranks (identical pick to the broadcast
    path's ``argsort(ranks)[:k]`` — md5 ranks are collision-free in
    practice, and owner-side pre-truncation cannot drop a global
    winner).  Returns ``(sorted vids, scale)``."""
    import ray
    parts = ray.get([ow.source_sample.remote(max_sources, seed)
                     for ow in g_fwd.owners])
    total = sum(p[0] for p in parts)
    vids = np.concatenate([p[1] for p in parts]) if parts else \
        np.empty(0, np.int64)
    if max_sources is None or total <= max_sources:
        return np.sort(vids), 1.0
    ranks = np.concatenate([p[2] for p in parts])
    pick = np.argsort(ranks, kind="stable")[:max_sources]
    return np.sort(vids[pick]), total / max_sources


def _forward_batch(g_fwd, batch: np.ndarray) -> int:
    """Run one K-lane forward phase; returns the deepest level reached."""
    import ray
    ray.get([ow.brandes_init.remote(batch) for ow in g_fwd.owners])
    level = 0
    while True:
        partials = _lane_partials(g_fwd, "sigma", level)
        changed = sum(ray.get([
            ow.brandes_apply_sigma.remote(level, *partials)
            for ow in g_fwd.owners]))
        if changed == 0:
            return level
        level += 1


def betweenness_sharded(edges_ds, num_owners: int = 8, lanes: int = 8,
                        max_sources: int | None = None, seed: int = 42,
                        gather_mode: str = "auto"):
    """(vid, betweenness) with positive centrality only — the sharded
    exact path (or the md5-sampled unbiased estimator with
    ``max_sources``, scaled by n_sources/|sample| like the broadcast
    path).  ``edges_ds`` must already be the DISTINCT directed edge set
    (the gate in :func:`..betweenness.betweenness_centrality` dedupes
    before dispatching here)."""
    import ray

    g_fwd, g_rev = _build_meshes(edges_ds, num_owners, gather_mode)
    try:
        sources, scale = _sample_sources(g_fwd, max_sources, seed)
        ray.get([ow.brandes_reset_total.remote() for ow in g_rev.owners])
        if not len(sources):
            return ray.data.from_arrow(pa.table(
                {"vid": pa.array([], pa.int64()),
                 "betweenness": pa.array([], pa.float64())}))
        for lo in range(0, len(sources), lanes):
            batch = sources[lo:lo + lanes]
            deepest = _forward_batch(g_fwd, batch)
            # ship (sources, dist, sigma) to the same-index reversed
            # owner — identical vid % P slots, one object per owner
            states = [ow.brandes_state.remote() for ow in g_fwd.owners]
            ray.get([g_rev.owners[j].brandes_load_state.remote(states[j])
                     for j in range(g_rev.P)])
            for lev in range(deepest, 0, -1):
                partials = _lane_partials(g_rev, "g", lev)
                ray.get([ow.brandes_apply_delta.remote(lev - 1, *partials)
                         for ow in g_rev.owners])
            ray.get([ow.brandes_accumulate.remote(scale)
                     for ow in g_rev.owners])
        return ray.data.from_arrow_refs(
            [ow.brandes_total_table.remote()
             for ow in g_rev.owners]).materialize()
    finally:
        g_fwd.shutdown()
        g_rev.shutdown()


def distance_stats_sharded(edges_ds, num_owners: int = 8, lanes: int = 8,
                           sources=None, gather_mode: str = "auto"):
    """Per-source BFS reductions on the sharded mesh, forward phase only:
    returns a materialized Dataset ``(vid, sum_dist, n_reachable,
    harmonic)`` with one row per source (every outdeg>0 vertex, or the
    given ``sources`` intersected with them).  ``sum_dist`` /
    ``n_reachable`` are exact int64; ``harmonic`` = Σ 1/d folded in
    owner-major order (allclose to the broadcast path's ascending-d
    fold).  Backs both the sharded closeness and harmonic gates."""
    import ray

    from .engine import ShardedGraph
    g_fwd = ShardedGraph.build(edges_ds, num_owners=num_owners,
                               gather_mode=gather_mode)
    try:
        all_src, _ = _sample_sources(g_fwd, None, 0)
        if sources is not None:
            all_src = np.intersect1d(
                all_src, np.asarray(sources, dtype=np.int64))
        rows_v, rows_s, rows_r, rows_h = [], [], [], []
        for lo in range(0, len(all_src), lanes):
            batch = all_src[lo:lo + lanes]
            _forward_batch(g_fwd, batch)
            parts = ray.get([ow.distance_lane_partials.remote()
                             for ow in g_fwd.owners])
            sums = np.sum([p[0] for p in parts], axis=0)
            reach = np.sum([p[1] for p in parts], axis=0)
            harm = np.sum([p[2] for p in parts], axis=0)
            rows_v.append(batch)
            rows_s.append(sums.astype(np.int64))
            rows_r.append(reach.astype(np.int64))
            rows_h.append(harm)
        cat = (lambda a, dt: np.concatenate(a).astype(dt) if a
               else np.empty(0, dtype=dt))
        return ray.data.from_arrow(pa.table({
            "vid": pa.array(cat(rows_v, np.int64), pa.int64()),
            "sum_dist": pa.array(cat(rows_s, np.int64), pa.int64()),
            "n_reachable": pa.array(cat(rows_r, np.int64), pa.int64()),
            "harmonic": pa.array(cat(rows_h, np.float64), pa.float64()),
        }))
    finally:
        g_fwd.shutdown()
