"""Sharded-engine tests: skew, dangling, CC/LP exactness, resume."""

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from hackathon_pagerank_ray import oracle
from hackathon_pagerank_ray.graph.engine import (ShardedGraph,
                                                 connected_components,
                                                 label_propagation, pagerank)
from hackathon_pagerank_ray.testgen import (edges_to_table, gen_hub_edges,
                                            gen_random_edges, load_edge_txt)


def _ranks(ds):
    return ds.to_pandas().sort_values("vid")["rank"].to_numpy()


def _labels(ds):
    return ds.to_pandas().sort_values("vid")["label"].to_numpy()


def test_hub_skew_graph_matches_oracle():
    """FIXTURES.md hubgraph: hub in-degree skew must not change scores."""
    edges = gen_hub_edges(400, 4000, hub_k=3, seed=5)
    g = ShardedGraph.build(rd.from_arrow(edges_to_table(edges)), num_owners=4)
    try:
        r = _ranks(pagerank(g)[0])
    finally:
        g.shutdown()
    ro, _, _ = oracle.pagerank(edges)
    assert np.abs(r - ro).max() < 1e-12


def test_dangling_heavy_graph():
    # only vertex 0..2 have out-edges; 3..9 are dangling targets
    edges = np.array([[0, 3], [0, 4], [1, 5], [2, 6], [2, 7], [0, 9]])
    g = ShardedGraph.build(rd.from_arrow(edges_to_table(edges)),
                           n=10, num_owners=3)
    try:
        r = _ranks(pagerank(g)[0])
    finally:
        g.shutdown()
    ro, _, _ = oracle.pagerank(edges, n=10)
    assert np.abs(r - ro).max() < 1e-12
    assert abs(r.sum() - 1) < 1e-9


def test_connected_components_exact():
    edges = gen_random_edges(300, 350, seed=21)  # sparse → many components
    und = np.unique(np.sort(edges, axis=1), axis=0)
    t = pa.Table.from_arrays([pa.array(und[:, 0]), pa.array(und[:, 1])],
                             names=["src", "dst"])
    g = ShardedGraph.build(rd.from_arrow(t), n=300, num_owners=4,
                           undirected=True)
    try:
        labels = _labels(connected_components(g)[0])
    finally:
        g.shutdown()
    assert np.array_equal(labels, oracle.connected_components(edges, n=300))


def test_label_propagation_exact():
    edges = gen_hub_edges(200, 900, hub_k=4, seed=17)
    und = np.unique(np.sort(edges[edges[:, 0] != edges[:, 1]], axis=1), axis=0)
    t = pa.Table.from_arrays([pa.array(und[:, 0]), pa.array(und[:, 1])],
                             names=["src", "dst"])
    g = ShardedGraph.build(rd.from_arrow(t), n=200, num_owners=4,
                           undirected=True)
    try:
        labels = _labels(label_propagation(g, max_iter=10)[0])
    finally:
        g.shutdown()
    assert np.array_equal(labels,
                          oracle.label_propagation(edges, n=200, max_iter=10))


def test_checkpoint_resume_identical_ranks(tmp_path):
    """North-rule resume: kill after k sweeps, resume, identical output;
    an incomplete sweep directory is discarded."""
    edges = load_edge_txt("/root/reference/backend/data/random_1k_10k.txt")
    ds = rd.from_arrow(edges_to_table(edges))
    ck = str(tmp_path / "ck")

    g = ShardedGraph.build(ds, num_owners=4)
    try:
        pagerank(g, max_iter=6, checkpoint_dir=ck, normalize=False)
    finally:
        g.shutdown()
    # simulate a mid-sweep crash artifact
    os.makedirs(ck + "/sweeps/it=6.tmp/ranks", exist_ok=True)

    g = ShardedGraph.build(ds, num_owners=4)
    try:
        ranks_ds, info = pagerank(g, checkpoint_dir=ck, resume=True)
        r = _ranks(ranks_ds)
    finally:
        g.shutdown()
    ro, sweeps, _ = oracle.pagerank(edges)
    assert info["sweeps"] == sweeps
    assert info["sweeps_run"] == sweeps - 6     # earlier sweeps not redone
    assert np.abs(r - ro).max() < 1e-12

    manifest = json.load(
        open(ck + f"/sweeps/it={sweeps - 1}/manifest.json"))
    assert manifest["residual_l1"] < 1e-8
    assert len(manifest["partitions"]) == 4      # per-partition lineage
    assert len(manifest["edge_shards"]) == 4


def test_degenerate_single_partition():
    edges = np.array([[0, 1], [1, 0], [2, 0]])
    g = ShardedGraph.build(rd.from_arrow(edges_to_table(edges)),
                           num_owners=1, num_edge_shards=1)
    try:
        r = _ranks(pagerank(g)[0])
    finally:
        g.shutdown()
    ro, _, _ = oracle.pagerank(edges)
    assert np.abs(r - ro).max() < 1e-12


def test_build_from_parquet_paths(tmp_path):
    """Direct-parquet build (fragments straight to shards, no driver
    materialize) must produce identical ranks to the Dataset build and
    report the same canonical m."""
    from hackathon_pagerank_ray.testgen import write_edges_parquet

    edges = gen_random_edges(300, 3000, seed=11)
    pdir = write_edges_parquet(edges, str(tmp_path / "edges"), n_shards=5)
    g1 = ShardedGraph.build(pdir, num_owners=4)
    try:
        r1 = _ranks(pagerank(g1)[0])
        m1, n1 = g1.m, g1.n
    finally:
        g1.shutdown()
    g2 = ShardedGraph.build(rd.from_arrow(edges_to_table(edges)), num_owners=4)
    try:
        r2 = _ranks(pagerank(g2)[0])
        assert g2.m == m1 == len(edges)
        assert g2.n == n1
    finally:
        g2.shutdown()
    # different shard groupings reorder float additions — identical up to ulp
    assert np.abs(r1 - r2).max() < 1e-15


def test_gather_mode_auto_resolves_single_node_to_full():
    """gather_mode="auto" (the default) must pick the single-node fast
    path here and still match the oracle."""
    edges = gen_random_edges(60, 240, seed=3)
    g = ShardedGraph.build(rd.from_arrow(edges_to_table(edges)),
                           num_owners=2)
    try:
        assert g.gather_mode == "full"
        ranks, info = pagerank(g, tol=1e-10, max_iter=100)
        want, _, _ = oracle.pagerank(edges, n=g.n, tol=1e-10, max_iter=100)
        got = _ranks(ranks)
        assert np.allclose([got[v] for v in range(g.n)], want, atol=1e-9)
    finally:
        g.shutdown()
