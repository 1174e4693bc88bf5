"""Triangles + Dataset-native PageRank vs oracles."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from hackathon_pagerank_ray import oracle
from hackathon_pagerank_ray.graph.dataset_pagerank import pagerank_dataset
from hackathon_pagerank_ray.graph.triangles import triangle_counts
from hackathon_pagerank_ray.testgen import (edges_to_table, gen_hub_edges,
                                            gen_random_edges)


def test_triangles_exact_with_universe():
    edges = gen_hub_edges(150, 1000, hub_k=4, seed=13)
    verts = rd.from_arrow(pa.Table.from_pydict(
        {"vid": np.arange(150, dtype=np.int64)}))
    out = (triangle_counts(rd.from_arrow(edges_to_table(edges)), verts,
                           num_partitions=4)
           .to_pandas().sort_values("vid"))
    assert np.array_equal(out["triangles"].to_numpy(),
                          oracle.triangle_counts(edges, n=150))


def test_triangles_handles_reciprocal_and_self_loops():
    edges = np.array([[0, 1], [1, 0], [1, 2], [2, 0], [2, 2]])
    out = (triangle_counts(rd.from_arrow(edges_to_table(edges)),
                           num_partitions=2)
           .to_pandas().sort_values("vid"))
    # one triangle {0,1,2}; self-loop ignored; reciprocal edges collapse
    assert out["triangles"].tolist() == [1, 1, 1]


def test_dataset_pagerank_matches_oracle_no_dangling():
    edges = gen_random_edges(80, 400, seed=9)
    ranks, info = pagerank_dataset(rd.from_arrow(edges_to_table(edges)),
                                   num_partitions=2, max_iter=5)
    r = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    ro, sweeps, _ = oracle.pagerank(edges, max_iter=5)
    assert info["sweeps"] == sweeps
    assert np.abs(r - ro).max() < 1e-12


def test_dataset_pagerank_with_dangling():
    edges = np.array([[0, 1], [1, 2], [2, 3], [3, 4], [0, 4]])
    ranks, _ = pagerank_dataset(rd.from_arrow(edges_to_table(edges)),
                                n=5, num_partitions=2, max_iter=8)
    r = ranks.to_pandas().sort_values("vid")["rank"].to_numpy()
    ro, _, _ = oracle.pagerank(edges, n=5, max_iter=8)
    assert np.abs(r - ro).max() < 1e-12


def test_triangles_distributed_path_matches_oracle():
    """Force the distributed wedge-join plan (small_threshold=0) — the
    at-scale shape must stay exact even though small inputs normally take
    the single-task path."""
    edges = gen_hub_edges(120, 800, hub_k=4, seed=29)
    verts = rd.from_arrow(pa.Table.from_pydict(
        {"vid": np.arange(120, dtype=np.int64)}))
    out = (triangle_counts(rd.from_arrow(edges_to_table(edges)), verts,
                           num_partitions=4, small_threshold=0)
           .to_pandas().sort_values("vid"))
    assert np.array_equal(out["triangles"].to_numpy(),
                          oracle.triangle_counts(edges, n=120))


def test_link_prediction_paths_agree():
    import pandas as pd
    from hackathon_pagerank_ray.graph.linkpred import common_neighbors_topk
    from hackathon_pagerank_ray.testgen import edges_to_table, gen_random_edges
    edges = gen_random_edges(120, 900, seed=23)
    ds = rd.from_arrow(edges_to_table(edges))
    small = common_neighbors_topk(ds, k=25, num_partitions=4).to_pandas()
    big = common_neighbors_topk(ds, k=25, num_partitions=4,
                                small_threshold=0).to_pandas()
    pd.testing.assert_frame_equal(
        small.reset_index(drop=True),
        big[small.columns].reset_index(drop=True), check_dtype=False)
    # ordering contract: count desc, then (u, v)
    c = small["common_neighbors"].to_numpy()
    assert (c[:-1] >= c[1:]).all()
    # no reported pair is an existing undirected edge
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    assert all((u, v) not in und
               for u, v in zip(small["u"], small["v"]))


def test_adamic_adar_paths_agree_and_weighting():
    import pandas as pd
    from hackathon_pagerank_ray.graph.linkpred import adamic_adar_topk
    from hackathon_pagerank_ray.testgen import edges_to_table, gen_random_edges
    edges = gen_random_edges(100, 700, seed=31)
    ds = rd.from_arrow(edges_to_table(edges))
    small = adamic_adar_topk(ds, k=20, num_partitions=4).to_pandas()
    big = adamic_adar_topk(ds, k=20, num_partitions=4,
                           small_threshold=0).to_pandas()
    pd.testing.assert_frame_equal(
        small.reset_index(drop=True),
        big[small.columns].reset_index(drop=True), check_dtype=False)
    s = small["aa_score"].to_numpy()
    assert (s[:-1] >= s[1:]).all() and (s > 0).all()
    # hand-check on a star + path: centers 0 (deg 3) and 1 (deg 2)
    tiny = rd.from_arrow(pa.table({
        "src": pa.array([0, 0, 0, 1, 1], pa.int64()),
        "dst": pa.array([2, 3, 4, 2, 3], pa.int64())}))
    out = adamic_adar_topk(tiny, k=100).to_pandas()
    row = out[(out["u"] == 2) & (out["v"] == 3)]
    exp = (round(1e9 / np.log(3)) + round(1e9 / np.log(2))) / 1e9
    assert abs(row["aa_score"].iloc[0] - exp) < 1e-9


def test_hyperball_neighborhood_function_path_graph():
    """HyperBall vs exact BFS on a 10-path: md5-seeded registers are
    deterministic, so the estimates are reproducible; m=256 keeps every
    ball in the near-exact linear-counting regime."""
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hackathon_pagerank_ray.graph.hyperball import neighborhood_function

    n = 10
    edges = pd.DataFrame({"src": np.arange(n - 1), "dst": np.arange(1, n)})
    nf, d_eff = neighborhood_function(rd.from_pandas(edges),
                                      num_partitions=2, m=256)
    # converges in exactly diameter sweeps (t = 0..9)
    assert list(nf["t"]) == list(range(n))
    exact = [sum(min(u + t, n - 1) - max(u - t, 0) + 1 for u in range(n))
             for t in range(n)]
    rel = np.abs(nf["n_pairs"].to_numpy() - np.asarray(exact)) / np.asarray(exact)
    assert rel.max() < 0.10, (nf, exact)
    assert (np.diff(nf["n_pairs"].to_numpy()) >= 0).all()
    # exact d90 = 6 + (90-88)/(94-88) = 6.333…
    assert abs(d_eff - 19 / 3) < 0.5, d_eff
    # distributed path: identical registers, same estimator (float-order
    # differences only)
    nf2, d2 = neighborhood_function(rd.from_pandas(edges),
                                    num_partitions=2, m=256,
                                    small_threshold=0)
    assert list(nf2["t"]) == list(nf["t"])
    assert np.allclose(nf2["n_pairs"], nf["n_pairs"], rtol=1e-9)
    assert abs(d2 - d_eff) < 1e-6


def test_hyperball_star_graph_diameter_two():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hackathon_pagerank_ray.graph.hyperball import neighborhood_function

    k = 20   # hub 0 with 20 leaves: diameter 2
    edges = pd.DataFrame({"src": np.zeros(k, dtype=np.int64),
                          "dst": np.arange(1, k + 1)})
    nf, d_eff = neighborhood_function(rd.from_pandas(edges),
                                      num_partitions=2, m=256)
    assert list(nf["t"]) == [0, 1, 2]
    n = k + 1
    exact = [n, n + 2 * k, n * n]
    rel = np.abs(nf["n_pairs"].to_numpy() - np.asarray(exact)) / np.asarray(exact)
    assert rel.max() < 0.10
    assert 1.0 < d_eff <= 2.0


def test_hyperball_harmonic_centrality():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from hackathon_pagerank_ray.graph.hyperball import harmonic_centrality

    n = 10
    edges = pd.DataFrame({"src": np.arange(n - 1), "dst": np.arange(1, n)})
    small = (harmonic_centrality(rd.from_pandas(edges), num_partitions=2,
                                 m=256).to_pandas()
             .sort_values("vid").reset_index(drop=True))
    exact = np.array([sum(1.0 / abs(u - v) for v in range(n) if v != u)
                      for u in range(n)])
    assert len(small) == n
    rel = np.abs(small["harmonic"].to_numpy() - exact) / exact
    assert rel.max() < 0.15, (small, exact)
    # endpoints are least central, middle most central — ordering holds
    h = small["harmonic"].to_numpy()
    assert h[0] < h[4] and h[9] < h[5]

    big = (harmonic_centrality(rd.from_pandas(edges), num_partitions=2,
                               m=256, small_threshold=0).to_pandas()
           .sort_values("vid").reset_index(drop=True))
    assert np.allclose(big["harmonic"], small["harmonic"], rtol=1e-9)


def test_ktruss_decomposition_and_fixed_k():
    from itertools import combinations

    import pandas as pd

    from hackathon_pagerank_ray.graph.truss import ktruss, ktruss_edges

    # K5 + pendant on vertex 4 + disjoint triangle {6,7,8}
    e = list(combinations(range(5), 2)) + [(4, 9), (6, 7), (7, 8), (6, 8)]
    df = pd.DataFrame({"src": [a for a, b in e], "dst": [b for a, b in e]})
    ds = rd.from_pandas(df)
    small = (ktruss(ds).to_pandas()
             .sort_values(["u", "v"]).reset_index(drop=True))
    want = {(a, b): 5 for a, b in combinations(range(5), 2)}
    want[(4, 9)] = 2
    want.update({(6, 7): 3, (6, 8): 3, (7, 8): 3})
    got = {(int(r.u), int(r.v)): int(r.truss) for r in small.itertuples()}
    assert got == want
    big = (ktruss(ds, num_partitions=2, small_threshold=0).to_pandas()
           .sort_values(["u", "v"]).reset_index(drop=True))
    assert small.equals(big)

    # fixed-k edge sets, both paths
    for k, n_edges in ((3, 13), (4, 10), (5, 10), (6, 0)):
        e_small = ktruss_edges(ds, k=k).to_pandas()
        assert len(e_small) == n_edges, (k, e_small)
        e_big = ktruss_edges(ds, k=k, num_partitions=2,
                             small_threshold=0).to_pandas()
        assert (sorted(map(tuple, e_small.to_numpy()))
                == sorted(map(tuple, e_big.to_numpy())))
