"""Bow-tie decomposition of the directed web graph (Broder et al.,
"Graph structure in the Web", WWW 2000) — the classic macroscopic
structure report for a crawl snapshot.

Regions (per vertex, reported as bounded size counts):

- ``CORE``          — the largest SCC (ties broken by min label, which is
                      deterministic because SCC labels are min vids),
- ``IN``            — reaches CORE but is not in it,
- ``OUT``           — reachable from CORE but not in it,
- ``TENDRIL``       — same *weakly* connected component as CORE but none
                      of the above (Broder's tendrils AND tubes — the
                      published decompositions that distinguish them need
                      two more reachability passes; lumping them is the
                      common operational variant),
- ``DISCONNECTED``  — a different weak component entirely.

Key algorithmic economy: CORE is strongly connected, so reachability
from/to the *whole* CORE equals reachability from/to any single member.
We use its min-vid representative (== the SCC label itself), making each
side ONE single-source BFS over the sharded mesh instead of a
multi-source propagation.

Scale shape: one SCC coloring + one CC fixpoint + two single-source BFS
fixpoints (all sharded-mesh gather-scatter, the same exchange volume as
:func:`connected_components`).  Every per-vertex state lives on meshes
sharing the same ``vid % P`` slot layout, so classification is a
per-owner zip over aligned arrays — no join and no classify shuffle;
only P five-int count vectors reach the driver.  The one Dataset
shuffle left is the component-size groupby that picks the giant SCC
(O(components) rows — never a driver merge).  Output is 5 rows no
matter the graph size.

Reference scope note: the reference engine computes PageRank only
(backend/data/pagerank.py); the bow-tie report is part of this repo's
link-graph-analytics widening (SURVEY.md §2 G-family), built from the
same mesh primitives as CC/SCC/BFS.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

REGIONS = ("CORE", "IN", "OUT", "TENDRIL", "DISCONNECTED")


def _pick_slot_fn(arr, slot):
    """One int out of an owner's per-slot array without shipping the
    array to the driver."""
    return int(arr[slot])


def _region_counts_fn(scc_t, fwd_arr, bwd_arr, wcc_arr, core, wcc_core,
                      sent):
    """Per-owner 5-way classify over slot-aligned arrays → one 5-vector
    of counts (REGIONS order).  CASE order matters: CORE first; a vertex
    reachable in BOTH directions is mutually reachable with the
    representative and hence CORE, so IN/OUT are disjoint."""
    lab = np.asarray(scc_t["label"])
    fwd = np.asarray(fwd_arr)
    bwd = np.asarray(bwd_arr)
    wcc = np.asarray(wcc_arr)
    core_m = lab == core
    in_m = ~core_m & (bwd != sent)
    out_m = ~core_m & ~in_m & (fwd != sent)
    tend_m = ~core_m & ~in_m & ~out_m & (wcc == wcc_core)
    n_loc = len(lab)
    c = [int(core_m.sum()), int(in_m.sum()), int(out_m.sum()),
         int(tend_m.sum())]
    return c + [n_loc - sum(c)]


def _swap_src_dst(t: pa.Table) -> pa.Table:
    return pa.Table.from_arrays(
        [t["dst"].combine_chunks(), t["src"].combine_chunks()],
        names=["src", "dst"])


def _bowtie_small_fn(*parts):
    """Whole decomposition in ONE vectorized task (the adaptive small
    path): the same fwd/bwd min-label SCC coloring, representative
    BFS reachability and weak-CC fixpoint the mesh runs, as in-task
    numpy sweeps — every output is an integer count, so the two plans
    are identical by construction."""
    parts = [p if isinstance(p, pa.Table)
             else pa.Table.from_pandas(p, preserve_index=False)
             for p in parts]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return None
    t = pa.concat_tables([p.select(["src", "dst"]) for p in parts])
    src = np.asarray(t["src"], dtype=np.int64)
    dst = np.asarray(t["dst"], dtype=np.int64)
    n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
    if n <= 0:
        return None
    sent = np.iinfo(np.int64).max
    vids = np.arange(n, dtype=np.int64)

    def _min_label_fixpoint(s, d, settled_mask):
        lab = np.where(settled_mask, sent, vids)
        while True:
            new = lab.copy()
            np.minimum.at(new, d, lab[s])
            new[settled_mask] = sent
            if (new == lab).all():
                return lab
            lab = new

    scc = np.full(n, -1, dtype=np.int64)
    while (scc < 0).any():
        settled = scc >= 0
        fwd = _min_label_fixpoint(src, dst, settled)
        bwd = _min_label_fixpoint(dst, src, settled)
        m = (~settled) & (fwd == bwd) & (fwd != sent)
        assert m.any(), "bow-tie small path made no progress"
        scc[m] = fwd[m]

    # largest SCC, ties by min label (identical tie-break to the
    # Dataset groupby + sort in the mesh plan)
    uniq, counts = np.unique(scc, return_counts=True)
    best = counts.max()
    core = int(uniq[counts == best].min())

    def _reach(s, d, start):
        r = np.zeros(n, dtype=bool)
        r[start] = True
        while True:
            new = r.copy()
            new[d[r[s]]] = True
            if (new == r).all():
                return r
            r = new

    fwd_r = _reach(src, dst, core)
    bwd_r = _reach(dst, src, core)

    # weak components: min-label over the symmetrized edge set
    lab = vids.copy()
    while True:
        new = lab.copy()
        np.minimum.at(new, dst, lab[src])
        np.minimum.at(new, src, lab[dst])
        if (new == lab).all():
            break
        lab = new
    wcc_core = int(lab[core])

    core_m = scc == core
    in_m = ~core_m & bwd_r
    out_m = ~core_m & ~in_m & fwd_r
    tend_m = ~core_m & ~in_m & ~out_m & (lab == wcc_core)
    c = [int(core_m.sum()), int(in_m.sum()), int(out_m.sum()),
         int(tend_m.sum())]
    return c + [n - sum(c)]


def bowtie_regions(edges_ds, num_owners: int = 4,
                   num_edge_shards: int | None = None,
                   num_partitions: int = 8,
                   small_threshold: int = 2_000_000):
    """Region sizes of the bow-tie decomposition.

    Returns a Dataset with columns ``(region: string, n_vertices:
    int64)`` — one row per non-empty region, sorted by region name.
    The vertex universe is the engine convention ``[0, max_id + 1)``
    (isolated vids in range count as singleton weak components, i.e.
    ``DISCONNECTED``), matching :func:`strongly_connected_components`.

    Adaptive small path: at or below ``small_threshold`` edge rows the
    whole decomposition runs as one vectorized worker task (the three
    mesh builds + ~hundreds of sweep task waves dominate wall time at
    small scale); above it the sharded three-mesh plan runs.  All
    outputs are integer counts — the plans are identical, and a parity
    test pins them.
    """
    import ray
    import ray.data
    from .engine import (ShardedGraph, bfs_distances, connected_components,
                         strongly_connected_components)
    from .triangles import canonical_undirected

    _pick_slot = ray.remote(_pick_slot_fn)
    _region_counts = ray.remote(_region_counts_fn)

    empty = ray.data.from_arrow(pa.table(
        {"region": pa.array([], pa.string()),
         "n_vertices": pa.array([], pa.int64())}))

    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= small_threshold:
        _small = ray.remote(_bowtie_small_fn)
        counts5 = ray.get(_small.remote(*edges_ds.to_arrow_refs()))
        if counts5 is None:
            return empty
        total = np.asarray(counts5, dtype=np.int64)
        keep = total > 0
        names = np.array(REGIONS)[keep]
        order = np.argsort(names)
        return ray.data.from_arrow(pa.table({
            "region": pa.array(names[order], pa.string()),
            "n_vertices": pa.array(total[keep][order], pa.int64())}))
    # ONE forward + ONE reversed mesh serve both the SCC coloring and the
    # two BFS reachability passes (owner state is re-initialized between
    # algorithms) — builds are the fixed cost here, so share them.  The
    # CC mesh is built with the same n and num_owners, so ALL per-vertex
    # state (scc labels, fwd/bwd distances, weak labels) lives on the
    # same vid % P slot layout: classification is a per-owner zip over
    # aligned arrays, no joins and no classify shuffle at all.
    rev = edges_ds.map_batches(_swap_src_dst, batch_format="pyarrow")
    g_fwd = ShardedGraph.build(edges_ds, num_owners=num_owners,
                               num_edge_shards=num_edge_shards)
    g_rev = ShardedGraph.build(rev, n=g_fwd.n, num_owners=num_owners,
                               num_edge_shards=num_edge_shards)
    n = g_fwd.n
    und = canonical_undirected(edges_ds, num_partitions).map_batches(
        lambda t: pa.Table.from_arrays(
            [t["u"].combine_chunks(), t["v"].combine_chunks()],
            names=["src", "dst"]),
        batch_format="pyarrow")
    g_cc = ShardedGraph.build(und, n=n, num_owners=num_owners,
                              num_edge_shards=num_edge_shards,
                              undirected=True)
    try:
        scc, _ = strongly_connected_components(
            edges_ds, meshes=(g_fwd, g_rev))

        # Largest SCC, ties by min label.  The groupby output is one row
        # per component (can be O(n) on a shattered graph, so this stays
        # a Dataset shuffle, never a driver merge); the sort ranks
        # component COUNT rows, not vertices.
        top = (scc.groupby("label").count()
               .sort(["count()", "label"], descending=[True, False])
               .limit(1).take_all())
        if not top:
            return empty
        core_label = int(top[0]["label"])

        # Forward BFS from the representative (reachable-from-CORE side);
        # backward BFS = forward BFS over the reversed mesh.  BFS state
        # lives in owner.labels; owner.scc_label is untouched by it.
        bfs_distances(g_fwd, core_label)
        bfs_distances(g_rev, core_label)
        connected_components(g_cc)

        sent = np.iinfo(np.int64).max
        wcc_core = ray.get(_pick_slot.remote(
            g_cc.owners[core_label % num_owners].labels_array.remote(),
            core_label // num_owners))

        counts = ray.get([
            _region_counts.remote(
                fo.scc_table.remote(),      # (vid, scc label)
                fo.labels_array.remote(),   # fwd BFS distances (sentinel)
                ro.labels_array.remote(),   # bwd BFS distances (sentinel)
                co.labels_array.remote(),   # weak labels
                core_label, wcc_core, sent)
            for fo, ro, co in zip(g_fwd.owners, g_rev.owners, g_cc.owners)
        ])
    finally:
        g_fwd.shutdown()
        g_rev.shutdown()
        g_cc.shutdown()

    total = np.sum(np.asarray(counts, dtype=np.int64), axis=0)
    keep = total > 0
    names = np.array(REGIONS)[keep]
    order = np.argsort(names)
    return ray.data.from_arrow(pa.table({
        "region": pa.array(names[order], pa.string()),
        "n_vertices": pa.array(total[keep][order], pa.int64())}))
