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
