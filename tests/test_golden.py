"""Reference golden-report parity (FIXTURES.md F2) for oracle + engine."""

import re

import numpy as np
import pytest
import ray.data as rd

from hackathon_pagerank_ray import oracle
from hackathon_pagerank_ray.graph.engine import ShardedGraph, pagerank
from hackathon_pagerank_ray.testgen import edges_to_table, load_edge_txt

REF = "/root/reference"
GOLDENS = [
    (f"{REF}/backend/data/random_1k_10k.txt", f"{REF}/backend/output_1k.txt"),
    (f"{REF}/backend/jobs/input.txt", f"{REF}/backend/jobs/output.txt"),
]


def _golden_scores(path):
    txt = open(path).read()
    return {int(k): float(v)
            for k, v in re.findall(r"node\s+(\d+)\s*:\s*([0-9.eE+-]+)", txt)}


@pytest.mark.parametrize("graph_path,golden_path", GOLDENS)
def test_oracle_matches_reference_goldens(graph_path, golden_path):
    edges = load_edge_txt(graph_path)
    r, _, _ = oracle.pagerank(edges)
    for node, score in _golden_scores(golden_path).items():
        assert abs(r[node] - score) < 1e-6


@pytest.mark.parametrize("gather_mode", ["full", "subscribe"])
def test_engine_matches_reference_golden_1k(gather_mode):
    edges = load_edge_txt(GOLDENS[0][0])
    g = ShardedGraph.build(rd.from_arrow(edges_to_table(edges)),
                           num_owners=4, gather_mode=gather_mode)
    try:
        ranks_ds, info = pagerank(g)
        r = ranks_ds.to_pandas().sort_values("vid")["rank"].to_numpy()
    finally:
        g.shutdown()
    for node, score in _golden_scores(GOLDENS[0][1]).items():
        assert abs(r[node] - score) < 1e-6
    ro, sweeps, _ = oracle.pagerank(edges)
    assert info["sweeps"] == sweeps
    assert np.abs(r - ro).max() < 1e-12


def test_cycle3_uniform():
    edges = load_edge_txt(f"{REF}/api/test.txt")
    g = ShardedGraph.build(rd.from_arrow(edges_to_table(edges)), num_owners=2)
    try:
        r = pagerank(g)[0].to_pandas().sort_values("vid")["rank"].to_numpy()
    finally:
        g.shutdown()
    assert np.allclose(r, 1 / 3, atol=1e-12)
