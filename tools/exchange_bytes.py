"""Cross-raylet exchange-bytes accounting for the mesh sweeps (r5).

Runs on an ALREADY-STARTED multi-raylet cluster (the rehearsal script's
head + workers): builds the sharded mesh, runs PageRank in subscribe
mode, and reports the EXACT per-sweep wire volume from the actors' own
subscription/partial footprints —

- slice bytes  (owner → shard): Σ_e Σ_j 8·|subscription[e][j]|  — the
  O(E)-total gather (each edge endpoint subscribed once per shard
  touching it, bounded by 8·m + 8·n·E_overlap)
- partial bytes (shard → owner): Σ_e Σ_j 8·|uniq_dst_local[e][j]| — the
  O(E·P)-bounded combiner output (≤ one float per (shard, owner,
  distinct-dst))

and splits each into same-raylet vs cross-raylet portions using the
actual actor placement (``ray.get_runtime_context().get_node_id()``
inside each actor).  The owners' accumulated ``gather_bytes`` metric
over the measured sweeps cross-checks the computed slice volume.

Usage: RAY_ADDRESS=<cluster> python tools/exchange_bytes.py <edges_dir>
Prints one JSON line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np


def main(edges_dir: str, sweeps: int = 5) -> dict:
    import ray
    ray.init(address="auto")
    import ray.data as rd

    from hackathon_pagerank_ray.graph.engine import ShardedGraph, pagerank

    edges = rd.read_parquet(edges_dir)
    g = ShardedGraph.build(edges, num_owners=8, gather_mode="subscribe")

    own_prof = ray.get([ow.exchange_profile.remote() for ow in g.owners])
    shd_prof = ray.get([sh.exchange_profile.remote()
                        for sh in g.edge_shards])
    own_node = {p["owner"]: p["node"] for p in own_prof}
    shd_node = {p["shard"]: p["node"] for p in shd_prof}
    nodes = sorted(set(own_node.values()) | set(shd_node.values()))

    slice_total = slice_cross = 0
    for p in own_prof:
        for e, b in enumerate(p["slice_bytes_to_shard"]):
            slice_total += b
            if p["node"] != shd_node[e]:
                slice_cross += b
    part_total = part_cross = 0
    for p in shd_prof:
        for j, b in enumerate(p["partial_bytes_to_owner"]):
            part_total += b
            if p["node"] != own_node[j]:
                part_cross += b

    base_gb = sum(m["gather_bytes"] for m in ray.get(
        [ow.get_metrics.remote() for ow in g.owners]))
    ranks, info = pagerank(g, tol=0.0, max_iter=sweeps)
    ranks_sum = float(ranks.to_pandas()["rank"].sum())
    gb = sum(m["gather_bytes"] for m in ray.get(
        [ow.get_metrics.remote() for ow in g.owners])) - base_gb
    g.shutdown()

    out = {
        "metric": "exchange_bytes_per_sweep",
        "raylets": len(nodes),
        "mesh": {"owners": g.P, "edge_shards": g.E,
                 "n": g.n, "m": g.m},
        "actors_per_raylet": {
            n[:8]: {"owners": sum(1 for v in own_node.values() if v == n),
                    "shards": sum(1 for v in shd_node.values() if v == n)}
            for n in nodes},
        "slice_bytes_per_sweep": slice_total,
        "slice_bytes_cross_raylet": slice_cross,
        "partial_bytes_per_sweep": part_total,
        "partial_bytes_cross_raylet": part_cross,
        "bytes_per_edge_slice": round(slice_total / g.m, 3),
        "bytes_per_edge_partial": round(part_total / g.m, 3),
        "partial_bound_8mP_ratio": round(part_total / (8 * g.m), 3),
        "measured_gather_bytes": gb,
        "measured_sweeps": info["sweeps_run"],
        # the fused-slice pipeline emits one extra slice wave (the last
        # update's slices are never consumed), so the measured counter
        # sits in [sweeps, sweeps+1] × computed volume
        "measured_over_computed_waves": round(gb / slice_total, 3)
        if slice_total else None,
        "ranks_sum": round(ranks_sum, 9),
    }
    print(json.dumps(out))
    ray.shutdown()
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else
         "/tmp/graft_rehearsal_edges")
