"""Round-4 additions: the partitioned (no-broadcast-CSR) Brandes paths.

The r3 verdict's one remaining at-scale gap: betweenness/closeness built a
whole-graph CSR in one worker.  These tests force the sharded K-lane path
(``small_threshold=0``) and pin it against the broadcast plan / a naive
oracle, including on a hub-skewed graph.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _random_graph(seed=3, n=50, m=400):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    return src[keep], dst[keep]


def _hub_graph(seed=11, n=120, m=700):
    """Skewed: vertex 0 is a hub on ~35% of endpoints (in AND out)."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    hub_in = rng.random(m) < 0.2
    hub_out = rng.random(m) < 0.15
    dst[hub_in] = 0
    src[hub_out] = 0
    keep = src != dst
    return src[keep], dst[keep]


@pytest.mark.parametrize("gen", [_random_graph, _hub_graph])
def test_betweenness_sharded_matches_broadcast(gen):
    from hackathon_pagerank_ray.graph.betweenness import \
        betweenness_centrality

    src, dst = gen()
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)

    ref = betweenness_centrality(ds, num_partitions=4).to_pandas()
    got = betweenness_centrality(ds, num_partitions=4,
                                 small_threshold=0, lanes=7).to_pandas()
    r = dict(zip(ref["vid"], ref["betweenness"]))
    g = dict(zip(got["vid"], got["betweenness"]))
    assert set(g) == set(r)
    for v, b in r.items():
        assert abs(g[v] - b) < 1e-9 * max(1.0, b)


def test_betweenness_sharded_sampled_same_pick():
    """The owner-side md5 sample must pick the SAME sources as the
    broadcast path's global argsort (scaled estimator parity)."""
    from hackathon_pagerank_ray.graph.betweenness import \
        betweenness_centrality

    src, dst = _random_graph(seed=9, n=80, m=600)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)

    ref = betweenness_centrality(ds, num_partitions=4, max_sources=20) \
        .to_pandas().sort_values("vid").reset_index(drop=True)
    got = betweenness_centrality(ds, num_partitions=4, max_sources=20,
                                 small_threshold=0, lanes=6) \
        .to_pandas().sort_values("vid").reset_index(drop=True)
    assert list(ref["vid"]) == list(got["vid"])
    assert np.allclose(ref["betweenness"], got["betweenness"],
                       rtol=1e-9, atol=1e-12)


def test_closeness_sharded_bit_equal():
    """Distances and reach counts are exact int sums on both plans, so
    closeness must be bit-identical through the gate."""
    from hackathon_pagerank_ray.graph.betweenness import \
        closeness_centrality

    src, dst = _hub_graph(seed=5)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)

    ref = closeness_centrality(ds, num_partitions=4).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    got = closeness_centrality(ds, num_partitions=4, small_threshold=0,
                               lanes=5).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert list(ref["vid"]) == list(got["vid"])
    assert list(ref["n_reachable"]) == list(got["n_reachable"])
    assert (ref["closeness"].to_numpy()
            == got["closeness"].to_numpy()).all()


def test_harmonic_sharded_allclose():
    from hackathon_pagerank_ray.graph.betweenness import \
        harmonic_out_centrality

    src, dst = _random_graph(seed=21, n=60, m=500)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)

    ref = harmonic_out_centrality(ds, num_partitions=4).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    got = harmonic_out_centrality(ds, num_partitions=4,
                                  small_threshold=0, lanes=4).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert list(ref["vid"]) == list(got["vid"])
    assert list(ref["n_reachable"]) == list(got["n_reachable"])
    assert np.allclose(ref["harmonic"], got["harmonic"], rtol=1e-12)


def test_closeness_sharded_restricted_sources():
    from hackathon_pagerank_ray.graph.betweenness import \
        closeness_centrality

    src, dst = _random_graph(seed=2, n=40, m=250)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(2)
    pick = [1, 5, 9, 33]
    ref = closeness_centrality(ds, num_partitions=4, sources=pick) \
        .to_pandas().sort_values("vid").reset_index(drop=True)
    got = closeness_centrality(ds, num_partitions=4, sources=pick,
                               small_threshold=0).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert ref[["vid", "n_reachable"]].equals(got[["vid", "n_reachable"]])
    assert (ref["closeness"].to_numpy()
            == got["closeness"].to_numpy()).all()


# -- checkpoint/resume parity for the label/distance fixpoints (r4 dir. 4) --

def _und_graph(seed=31, n=400, m=1600):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    return rd.from_arrow(pa.table({"src": src[keep], "dst": dst[keep]}))


def test_cc_resume_bit_parity(tmp_path):
    from hackathon_pagerank_ray.graph.engine import (ShardedGraph,
                                                     connected_components)
    ds = _und_graph()
    g = ShardedGraph.build(ds, num_owners=3, undirected=True)
    ref, info = connected_components(g)
    ref = ref.to_pandas().sort_values("vid").reset_index(drop=True)
    assert info["sweeps"] > 2
    g.shutdown()

    ck = str(tmp_path / "cc")
    g = ShardedGraph.build(ds, num_owners=3, undirected=True)
    connected_components(g, max_iter=2, checkpoint_dir=ck,
                         checkpoint_every=1)          # "killed" after 2
    g.shutdown()
    g = ShardedGraph.build(ds, num_owners=3, undirected=True)
    out, info2 = connected_components(g, checkpoint_dir=ck, resume=True)
    out = out.to_pandas().sort_values("vid").reset_index(drop=True)
    g.shutdown()
    assert info2["sweeps"] == info["sweeps"]          # no recomputation
    assert out.equals(ref)

    # resuming an already-converged checkpoint returns immediately
    g = ShardedGraph.build(ds, num_owners=3, undirected=True)
    connected_components(g, checkpoint_dir=ck, checkpoint_every=1)
    g.shutdown()
    g = ShardedGraph.build(ds, num_owners=3, undirected=True)
    out3, info3 = connected_components(g, checkpoint_dir=ck, resume=True)
    out3 = out3.to_pandas().sort_values("vid").reset_index(drop=True)
    g.shutdown()
    assert info3.get("converged") and out3.equals(ref)


def test_lp_resume_bit_parity(tmp_path):
    from hackathon_pagerank_ray.graph.engine import (ShardedGraph,
                                                     label_propagation)
    ds = _und_graph(seed=8, n=200, m=900)
    g = ShardedGraph.build(ds, num_owners=3, undirected=True)
    ref, info = label_propagation(g, max_iter=8)
    ref = ref.to_pandas().sort_values("vid").reset_index(drop=True)
    g.shutdown()

    ck = str(tmp_path / "lp")
    g = ShardedGraph.build(ds, num_owners=3, undirected=True)
    label_propagation(g, max_iter=3, checkpoint_dir=ck, checkpoint_every=1)
    g.shutdown()
    g = ShardedGraph.build(ds, num_owners=3, undirected=True)
    out, info2 = label_propagation(g, max_iter=8, checkpoint_dir=ck,
                                   resume=True)
    out = out.to_pandas().sort_values("vid").reset_index(drop=True)
    g.shutdown()
    assert out.equals(ref), "LP resume must be bit-exact (non-monotone op)"
    assert info2["sweeps"] == info["sweeps"]


def test_sssp_resume_bit_parity(tmp_path):
    import pytest as _pytest

    from hackathon_pagerank_ray.graph.engine import (ShardedGraph,
                                                     sssp_distances)
    rng = np.random.default_rng(44)
    n, m = 300, 1200
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    w = rng.uniform(0.5, 2.0, m)
    keep = src != dst
    ds = rd.from_arrow(pa.table({"src": src[keep], "dst": dst[keep],
                                 "w": w[keep]}))
    g = ShardedGraph.build(ds, num_owners=3, weight_col="w")
    ref, info = sssp_distances(g, 0)
    ref = ref.to_pandas().sort_values("vid").reset_index(drop=True)
    g.shutdown()

    ck = str(tmp_path / "sssp")
    g = ShardedGraph.build(ds, num_owners=3, weight_col="w")
    sssp_distances(g, 0, max_iter=2, checkpoint_dir=ck, checkpoint_every=1)
    g.shutdown()
    g = ShardedGraph.build(ds, num_owners=3, weight_col="w")
    out, info2 = sssp_distances(g, 0, checkpoint_dir=ck, resume=True)
    out = out.to_pandas().sort_values("vid").reset_index(drop=True)
    assert out.equals(ref), "SSSP resume must be bit-exact"
    assert info2["sweeps"] == info["sweeps"]

    # a different source set must fail fast against the manifest
    with _pytest.raises(ValueError, match="sources"):
        sssp_distances(g, 1, checkpoint_dir=ck, resume=True)
    g.shutdown()


# -- incremental recrawl delta-apply (r4 directive 6) -----------------------

def _ranged_edge_files(edges, tmp_path, E, tag):
    """Write edges (already src-sorted) as E contiguous-range parquet
    files; returns (paths, bounds) where bounds are the range-routing
    boundaries apply_edge_delta derives."""
    import pyarrow.parquet as pq
    per = (len(edges) + E - 1) // E
    # cut at src-VALUE boundaries so no source straddles two files (the
    # disjoint-range contract apply_edge_delta checks)
    cuts = [0]
    for e in range(1, E):
        c = min(e * per, len(edges))
        while c < len(edges) and edges[c, 0] == edges[c - 1, 0]:
            c += 1
        cuts.append(c)
    cuts.append(len(edges))
    paths, mins = [], []
    for e in range(E):
        chunk = edges[cuts[e]:cuts[e + 1]]
        p = str(tmp_path / f"{tag}-{e:02d}.parquet")
        pq.write_table(pa.table({"src": chunk[:, 0], "dst": chunk[:, 1]}), p)
        paths.append(p)
        mins.append(int(chunk[0, 0]))
    return paths, np.array(mins[1:], dtype=np.int64)


def test_apply_edge_delta_bit_parity(tmp_path):
    """4.8% churn: delta-applied mesh must solve PageRank BIT-identically
    to a cold build of the post-delta edge set routed by the same
    persistent src-range boundaries."""
    import ray

    from hackathon_pagerank_ray.graph.engine import ShardedGraph, pagerank

    rng = np.random.default_rng(5)
    n, m, E = 20_000, 200_000, 4
    key = rng.integers(0, n, (m, 2)).astype(np.int64)
    key = key[key[:, 0] != key[:, 1]]
    key = np.unique(key[:, 0] * n + key[:, 1])       # distinct directed
    edges = np.stack([key // n, key % n], axis=1)
    edges = edges[np.argsort(edges[:, 0], kind="stable")]

    paths, bounds = _ranged_edge_files(edges, tmp_path, E, "a")
    g = ShardedGraph.build(paths, n=n, num_owners=E, num_edge_shards=E,
                           canonical_scatter=True)

    # churn: remove 4.8%, add the same count of fresh (disjoint) edges
    k = int(len(edges) * 0.048)
    rem_idx = rng.choice(len(edges), k, replace=False)
    removed = edges[rem_idx]
    existing = set(key.tolist())
    cand = rng.integers(0, n, (3 * k, 2)).astype(np.int64)
    cand = cand[cand[:, 0] != cand[:, 1]]
    ck = cand[:, 0] * n + cand[:, 1]
    fresh = ~np.isin(ck, key)
    added = cand[fresh][:k]
    assert len(added) == k

    import ray.data as rd2
    info = g.apply_edge_delta(
        added=rd2.from_arrow(pa.table({"src": added[:, 0],
                                       "dst": added[:, 1]})),
        removed=rd2.from_arrow(pa.table({"src": removed[:, 0],
                                         "dst": removed[:, 1]})),
        n=n)
    assert info["m"] == len(edges) - k + k
    ranks_d, _ = pagerank(g, tol=0.0, max_iter=10)
    ranks_d = ranks_d.to_pandas().sort_values("vid").reset_index(drop=True)
    g.shutdown()

    # cold twin: post-delta edge set routed by the SAME boundaries
    bkey = np.setdiff1d(key, removed[:, 0] * n + removed[:, 1])
    bkey = np.union1d(bkey, added[:, 0] * n + added[:, 1])
    b_edges = np.stack([bkey // n, bkey % n], axis=1)
    route = np.searchsorted(bounds, b_edges[:, 0], side="right")
    import pyarrow.parquet as pq
    b_paths = []
    for e in range(E):
        chunk = b_edges[route == e]
        p = str(tmp_path / f"b-{e:02d}.parquet")
        pq.write_table(pa.table({"src": chunk[:, 0], "dst": chunk[:, 1]}), p)
        b_paths.append(p)
    g2 = ShardedGraph.build(b_paths, n=n, num_owners=E, num_edge_shards=E,
                            canonical_scatter=True)
    ranks_c, _ = pagerank(g2, tol=0.0, max_iter=10)
    ranks_c = ranks_c.to_pandas().sort_values("vid").reset_index(drop=True)
    g2.shutdown()

    assert list(ranks_d["vid"]) == list(ranks_c["vid"])
    assert (ranks_d["rank"].to_numpy()
            == ranks_c["rank"].to_numpy()).all(), "delta solve not bit-exact"


def test_apply_edge_delta_guards(tmp_path):
    import pytest as _pytest
    import ray.data as rd2

    from hackathon_pagerank_ray.graph.engine import ShardedGraph

    rng = np.random.default_rng(3)
    edges = rng.integers(0, 1000, (5000, 2)).astype(np.int64)
    edges = edges[edges[:, 0] != edges[:, 1]]
    edges = edges[np.argsort(edges[:, 0], kind="stable")]
    paths, _ = _ranged_edge_files(edges, tmp_path, 2, "g")

    # default (non-canonical) build refuses deltas
    g = ShardedGraph.build(paths, num_owners=2, num_edge_shards=2)
    with _pytest.raises(Exception, match="canonical_scatter"):
        g.apply_edge_delta(added=rd2.from_arrow(
            pa.table({"src": pa.array([1], pa.int64()),
                      "dst": pa.array([2], pa.int64())})))
    g.shutdown()

    # a random (non-range-partitioned) layout refuses deltas
    shuf = edges[rng.permutation(len(edges))]
    import pyarrow.parquet as pq
    p0 = str(tmp_path / "r0.parquet")
    p1 = str(tmp_path / "r1.parquet")
    pq.write_table(pa.table({"src": shuf[:2000, 0], "dst": shuf[:2000, 1]}),
                   p0)
    pq.write_table(pa.table({"src": shuf[2000:, 0], "dst": shuf[2000:, 1]}),
                   p1)
    g = ShardedGraph.build([p0, p1], num_owners=2, num_edge_shards=2,
                           canonical_scatter=True)
    with _pytest.raises(ValueError, match="src ranges"):
        g.apply_edge_delta(added=rd2.from_arrow(
            pa.table({"src": pa.array([1], pa.int64()),
                      "dst": pa.array([2], pa.int64())})))
    g.shutdown()


def test_brandes_sharded_subscribe_gather_bit_equal():
    """The subscribe-mode lane gather (owner-side subscription slices —
    the multi-node path) must reproduce the full-mode result bit-for-bit
    (identical per-edge contribution order either way)."""
    from hackathon_pagerank_ray.graph.brandes_sharded import (
        betweenness_sharded, distance_stats_sharded)
    from hackathon_pagerank_ray.stages.relational import distinct

    src, dst = _hub_graph(seed=19)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    e = distinct(ds, ["src", "dst"], 4).materialize()

    full = betweenness_sharded(e, num_owners=2, lanes=5,
                               gather_mode="full").to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    sub = betweenness_sharded(e, num_owners=2, lanes=5,
                              gather_mode="subscribe").to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert list(full["vid"]) == list(sub["vid"])
    assert (full["betweenness"].to_numpy()
            == sub["betweenness"].to_numpy()).all()

    dfull = distance_stats_sharded(e, num_owners=2, lanes=4,
                                   gather_mode="full").to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    dsub = distance_stats_sharded(e, num_owners=2, lanes=4,
                                  gather_mode="subscribe").to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert dfull.equals(dsub)


def test_bowtie_small_path_matches_mesh():
    """The single-task bow-tie (≤ small_threshold) must produce the
    identical 5-region counts as the three-mesh plan (all integers)."""
    from hackathon_pagerank_ray.graph.bowtie import bowtie_regions

    for seed, gen in ((7, _random_graph), (13, _hub_graph)):
        src, dst = gen(seed=seed)
        ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
        small = bowtie_regions(ds, num_owners=2).to_pandas() \
            .sort_values("region").reset_index(drop=True)
        mesh = bowtie_regions(ds, num_owners=2, small_threshold=0) \
            .to_pandas().sort_values("region").reset_index(drop=True)
        assert small.equals(mesh), (seed, small, mesh)


def test_lp_small_path_matches_mesh():
    from hackathon_pagerank_ray.graph.engine import label_propagation_ds
    from hackathon_pagerank_ray.graph.triangles import canonical_undirected

    src, dst = _hub_graph(seed=23)
    und = canonical_undirected(
        rd.from_arrow(pa.table({"src": src, "dst": dst})), 4).map_batches(
        lambda t: pa.Table.from_arrays(
            [t["u"].combine_chunks(), t["v"].combine_chunks()],
            names=["src", "dst"]),
        batch_format="pyarrow")
    small = label_propagation_ds(und, max_iter=10, num_owners=2) \
        .to_pandas().sort_values("vid").reset_index(drop=True)
    mesh = label_propagation_ds(und, max_iter=10, num_owners=2,
                                small_threshold=0).to_pandas() \
        .sort_values("vid").reset_index(drop=True)
    assert small.equals(mesh)


def test_apply_edge_delta_weighted_and_repeated(tmp_path):
    """Weighted meshes patch w alongside src/dst, and two SEQUENTIAL
    deltas still solve bit-identically to a cold build of the final
    edge set (the recrawl loop applies deltas every cycle)."""
    import pyarrow.parquet as pq

    from hackathon_pagerank_ray.graph.engine import ShardedGraph, pagerank

    rng = np.random.default_rng(77)
    n, E = 5_000, 3
    key = np.unique(rng.integers(0, n, (60_000, 2)).astype(np.int64) @
                    np.array([n, 1], dtype=np.int64))
    edges = np.stack([key // n, key % n], axis=1)
    edges = edges[edges[:, 0] != edges[:, 1]]
    key = edges[:, 0] * n + edges[:, 1]
    w = (rng.integers(1, 8, len(edges))).astype(np.float64)
    edges_w = np.column_stack([edges, w]).astype(np.float64)
    order = np.argsort(edges[:, 0], kind="stable")
    edges, w, key = edges[order], w[order], key[order]

    # value-boundary range files with a w column
    per = (len(edges) + E - 1) // E
    cuts = [0]
    for e in range(1, E):
        c = min(e * per, len(edges))
        while c < len(edges) and edges[c, 0] == edges[c - 1, 0]:
            c += 1
        cuts.append(c)
    cuts.append(len(edges))
    paths, mins = [], []
    for e in range(E):
        ch = slice(cuts[e], cuts[e + 1])
        p = str(tmp_path / f"w-{e:02d}.parquet")
        pq.write_table(pa.table({"src": edges[ch, 0], "dst": edges[ch, 1],
                                 "w": w[ch]}), p)
        paths.append(p)
        mins.append(int(edges[cuts[e], 0]))
    bounds = np.array(mins[1:], dtype=np.int64)

    g = ShardedGraph.build(paths, n=n, num_owners=E, num_edge_shards=E,
                           canonical_scatter=True, weight_col="w")

    import ray.data as rd2

    def _delta(seed):
        r = np.random.default_rng(seed)
        k = len(edges) // 25
        rem_i = r.choice(len(edges), k, replace=False)
        cand = r.integers(0, n, (3 * k, 2)).astype(np.int64)
        cand = cand[cand[:, 0] != cand[:, 1]]
        fresh = cand[~np.isin(cand[:, 0] * n + cand[:, 1], key)][:k]
        aw = r.integers(1, 8, len(fresh)).astype(np.float64)
        return edges[rem_i], fresh, aw

    cur_key = key.copy()
    cur_w = dict(zip(key.tolist(), w.tolist()))
    for seed in (1, 2):
        rem, add, aw = _delta(seed)
        g.apply_edge_delta(
            added=rd2.from_arrow(pa.table(
                {"src": add[:, 0], "dst": add[:, 1], "w": aw})),
            removed=rd2.from_arrow(pa.table(
                {"src": rem[:, 0], "dst": rem[:, 1]})),
            n=n)
        rk = rem[:, 0] * n + rem[:, 1]
        for x in rk.tolist():
            cur_w.pop(x, None)
        ak = add[:, 0] * n + add[:, 1]
        for x, ww in zip(ak.tolist(), aw.tolist()):
            cur_w[x] = ww
        cur_key = np.array(sorted(cur_w), dtype=np.int64)
    ranks_d, _ = pagerank(g, tol=0.0, max_iter=8)
    ranks_d = ranks_d.to_pandas().sort_values("vid")["rank"].to_numpy()
    g.shutdown()

    # cold twin of the FINAL edge set, same boundaries
    b_edges = np.stack([cur_key // n, cur_key % n], axis=1)
    b_w = np.array([cur_w[int(x)] for x in cur_key], dtype=np.float64)
    route = np.searchsorted(bounds, b_edges[:, 0], side="right")
    b_paths = []
    for e in range(E):
        m = route == e
        p = str(tmp_path / f"wb-{e:02d}.parquet")
        pq.write_table(pa.table({"src": b_edges[m, 0],
                                 "dst": b_edges[m, 1], "w": b_w[m]}), p)
        b_paths.append(p)
    g2 = ShardedGraph.build(b_paths, n=n, num_owners=E, num_edge_shards=E,
                            canonical_scatter=True, weight_col="w")
    ranks_c, _ = pagerank(g2, tol=0.0, max_iter=8)
    ranks_c = ranks_c.to_pandas().sort_values("vid")["rank"].to_numpy()
    g2.shutdown()
    assert (ranks_d == ranks_c).all(), \
        "two sequential weighted deltas must equal the cold rebuild"


def test_title_edit_pairs_broadcast_and_shuffle_plans_agree():
    from hackathon_pagerank_ray.stages.dedup_near import title_edit_pairs
    docs = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array(["alpha beta", "alpha betz", "alpha beta",
                          "gamma delta", "gamma delt", "epsilon",
                          "epsilo", "zeta"], pa.string())})
    ds = rd.from_arrow(docs)
    a = title_edit_pairs(ds, prefix_len=16).to_pandas() \
        .sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    b = title_edit_pairs(ds, prefix_len=16, broadcast_max_docs=0) \
        .to_pandas().sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    assert a.equals(b) and len(a) >= 4


def test_dataprep_broadcast_and_join_plans_agree():
    from hackathon_pagerank_ray.pipelines.dataprep import prep_corpus
    docs = pa.table({
        "doc_id": pa.array(list(range(6)), pa.int64()),
        "text": pa.array([
            "the quick brown fox jumps over the lazy dog again and again",
            "the quick brown fox jumps over the lazy dog again and again",
            "a different document with enough words and the stopwords in it",
            "short",
            "email me at a.b@c.org and the rest of this text is long enough",
            "xxxxx yyyyy zzzzz qqqqq wwwww"], pa.string())})
    ds = rd.from_arrow(docs)
    a = prep_corpus(ds).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    b = prep_corpus(ds, broadcast_max_docs=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b) and len(a) >= 2


def test_redact_linear_on_hostile_text():
    """The unbounded email regex was quadratic-to-catastrophic under
    Python re's backtracking (a 100 KB dot-run took >15 s); the
    RFC-bounded pattern must stay fast on hostile runs."""
    import time

    from hackathon_pagerank_ray.stages.text_ops import Redact

    hostile = pd.DataFrame({"text": [
        "a@" + "a." * 20000 + "!",
        "." * 100000,
        "a." * 50000,
        "@" + "." * 100000,
        "real contact: a.b-c_d%e+f@mail.example.co.uk ok",
    ]})
    r = Redact()
    t0 = time.perf_counter()
    out = r(hostile.copy())
    assert time.perf_counter() - t0 < 2.0, "redaction not linear-safe"
    assert out["n_emails"].iloc[4] == 1
    assert "<EMAIL>" in out["text_redacted"].iloc[4]
