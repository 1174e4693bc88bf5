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
:func:`connected_components`), then three hash joins keyed on the
engine's single partitioning key (vid) over per-vertex tables, a
vectorized 5-way classify in ``map_batches``, and a ≤5-key count
shuffle.  Output is 5 rows no matter the graph size.

Reference scope note: the reference engine computes PageRank only
(backend/data/pagerank.py); the bow-tie report is part of this repo's
link-graph-analytics widening (SURVEY.md §2 G-family), built from the
same mesh primitives as CC/SCC/BFS.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

REGIONS = ("CORE", "IN", "OUT", "TENDRIL", "DISCONNECTED")


def _swap_src_dst(t: pa.Table) -> pa.Table:
    return pa.Table.from_arrays(
        [t["dst"].combine_chunks(), t["src"].combine_chunks()],
        names=["src", "dst"])


def bowtie_regions(edges_ds, num_owners: int = 4,
                   num_edge_shards: int | None = None,
                   num_partitions: int = 8):
    """Region sizes of the bow-tie decomposition.

    Returns a Dataset with columns ``(region: string, n_vertices:
    int64)`` — one row per non-empty region, sorted by region name.
    The vertex universe is the engine convention ``[0, max_id + 1)``
    (isolated vids in range count as singleton weak components, i.e.
    ``DISCONNECTED``), matching :func:`strongly_connected_components`.
    """
    import ray.data
    from .engine import (ShardedGraph, bfs_distances, connected_components,
                         strongly_connected_components)
    from .triangles import canonical_undirected
    from ..stages.relational import inner_join

    empty = ray.data.from_arrow(pa.table(
        {"region": pa.array([], pa.string()),
         "n_vertices": pa.array([], pa.int64())}))

    edges_ds = edges_ds.materialize()
    # ONE forward + ONE reversed mesh serve both the SCC coloring and the
    # two BFS reachability passes (owner state is re-initialized between
    # algorithms) — builds are the fixed cost here, so share them.
    rev = edges_ds.map_batches(_swap_src_dst, batch_format="pyarrow")
    g_fwd = ShardedGraph.build(edges_ds, num_owners=num_owners,
                               num_edge_shards=num_edge_shards)
    g_rev = ShardedGraph.build(rev, n=g_fwd.n, num_owners=num_owners,
                               num_edge_shards=num_edge_shards)
    n = g_fwd.n
    try:
        scc, _ = strongly_connected_components(
            edges_ds, meshes=(g_fwd, g_rev))
        scc = scc.materialize()

        # Largest SCC, ties by min label.  The groupby output is one row
        # per component; the sort ranks component COUNT rows, not vertices.
        top = (scc.groupby("label").count()
               .sort(["count()", "label"], descending=[True, False])
               .limit(1).take_all())
        if not top:
            return empty
        core_label = int(top[0]["label"])

        # Forward BFS from the representative (reachable-from-CORE side);
        # backward BFS = forward BFS over the reversed mesh.
        fwd, _ = bfs_distances(g_fwd, core_label)
        fwd = fwd.materialize()
        bwd, _ = bfs_distances(g_rev, core_label)
        bwd = bwd.materialize()
    finally:
        g_fwd.shutdown()
        g_rev.shutdown()

    # Weak components over the same universe (n passed explicitly:
    # canonical_undirected drops self-loops, which could shrink max vid).
    und = canonical_undirected(edges_ds, num_partitions).map_batches(
        lambda t: pa.Table.from_arrays(
            [t["u"].combine_chunks(), t["v"].combine_chunks()],
            names=["src", "dst"]),
        batch_format="pyarrow")
    g_cc = ShardedGraph.build(und, n=n, num_owners=num_owners,
                              num_edge_shards=num_edge_shards,
                              undirected=True)
    try:
        wcc, _ = connected_components(g_cc)
        wcc = wcc.materialize()
    finally:
        g_cc.shutdown()

    wcc_core = int(wcc.map_batches(
        lambda t: t.filter(pc.equal(t["vid"],
                                    pa.scalar(core_label, pa.int64()))),
        batch_format="pyarrow").take_all()[0]["label"])

    # Three vid-keyed hash joins of per-vertex tables (n rows each).
    t = inner_join(scc, fwd.rename_columns({"dist": "dist_f"}), "vid",
                   num_partitions=num_partitions)
    t = inner_join(t, bwd.rename_columns({"dist": "dist_b"}), "vid",
                   num_partitions=num_partitions)
    t = inner_join(t, wcc.rename_columns({"label": "wlabel"}), "vid",
                   num_partitions=num_partitions)

    def _classify(tb: pa.Table) -> pa.Table:
        lab = tb["label"].combine_chunks().to_numpy(zero_copy_only=False)
        d_f = tb["dist_f"].combine_chunks().to_numpy(zero_copy_only=False)
        d_b = tb["dist_b"].combine_chunks().to_numpy(zero_copy_only=False)
        wl = tb["wlabel"].combine_chunks().to_numpy(zero_copy_only=False)
        # Order matters: CORE first; a vertex with both dist_f >= 0 and
        # dist_b >= 0 is mutually reachable with the representative and
        # hence in CORE, so IN/OUT below are disjoint.
        region = np.select(
            [lab == core_label, d_b >= 0, d_f >= 0, wl == wcc_core],
            ["CORE", "IN", "OUT", "TENDRIL"],
            default="DISCONNECTED")
        return pa.table({"region": pa.array(region.astype(str),
                                            pa.string())})

    counts = (t.map_batches(_classify, batch_format="pyarrow")
              .groupby("region").count()
              .rename_columns({"count()": "n_vertices"}))

    out_schema = pa.schema([pa.field("region", pa.string()),
                            pa.field("n_vertices", pa.int64())])
    # enforce_schema + drop_empty_blocks: the groupby emits schema-less
    # empty blocks for empty partitions, which would poison the driver's
    # schema/hash comparison downstream.
    from ..stages.schema_util import drop_empty_blocks, enforce_schema
    return drop_empty_blocks(
        enforce_schema(counts, out_schema).sort("region"))
