"""Round-3 operator additions vs oracles: host-graph collapse, domain
PageRank, global reciprocity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from hackathon_pagerank_ray import oracle
from hackathon_pagerank_ray.graph.engine import ShardedGraph, pagerank
from hackathon_pagerank_ray.stages.domains import (domain_graph,
                                                   domain_weighted_edges,
                                                   reciprocity)
from hackathon_pagerank_ray.testgen import edges_to_table, gen_random_edges


def _ranks(ds):
    return ds.to_pandas().sort_values("vid")["rank"].to_numpy()


def _collapse_numpy(edges: np.ndarray, nd: int):
    """Reference collapse: dict of (sdom, ddom) -> page-link count."""
    out = {}
    for s, d in edges:
        sd, dd = int(s) % nd, int(d) % nd
        if sd == dd:
            continue
        out[(sd, dd)] = out.get((sd, dd), 0) + 1
    return out


def test_domain_graph_matches_numpy_replay():
    edges = gen_random_edges(400, 5000, seed=3)
    ds = rd.from_arrow(edges_to_table(edges)).repartition(4)
    got = (domain_graph(ds, num_domains=16).to_pandas()
           .sort_values(["src_dom", "dst_dom"]).reset_index(drop=True))
    want = _collapse_numpy(edges, 16)
    assert len(got) == len(want)
    for row in got.itertuples(index=False):
        assert want[(row.src_dom, row.dst_dom)] == row.w
    assert got["w"].dtype == np.int64
    # intra-domain edges are dropped
    assert (got["src_dom"] != got["dst_dom"]).all()


def test_domain_graph_keeps_intra_when_asked():
    df = pd.DataFrame({"src": [0, 1, 16, 5], "dst": [16, 1, 0, 21]})
    ds = rd.from_pandas(df)
    got = (domain_graph(ds, num_domains=16, drop_intra=False).to_pandas()
           .sort_values(["src_dom", "dst_dom"]).reset_index(drop=True))
    # 0→16 and 16→0 both collapse to (0,0); 1→1 is (1,1); 5→21 is (5,5)
    assert got.values.tolist() == [[0, 0, 2], [1, 1, 1], [5, 5, 1]]


def test_domain_pagerank_matches_weighted_oracle():
    edges = gen_random_edges(300, 4000, seed=7)
    nd = 32
    ds = rd.from_arrow(edges_to_table(edges)).repartition(4)
    wedges = domain_weighted_edges(ds, num_domains=nd)
    g = ShardedGraph.build(wedges, num_owners=4, weight_col="w")
    try:
        ranks = (pagerank(g, tol=0.0, max_iter=20)[0].to_pandas()
                 .sort_values("vid")["rank"].to_numpy())
    finally:
        g.shutdown()
    # numpy twin over the same collapse
    want = _collapse_numpy(edges, nd)
    ce = np.array([[s, d] for (s, d) in sorted(want)], dtype=np.int64)
    cw = np.array([want[(s, d)] for (s, d) in sorted(want)],
                  dtype=np.float64)
    ro, _, _ = oracle.weighted_pagerank(ce, cw, n=int(ce.max()) + 1,
                                        tol=0.0, max_iter=20)
    assert np.abs(ranks - ro).max() < 1e-12


def test_reciprocity_counts_exact():
    # distinct non-self edges: (1,2) (2,1) (2,3) (3,2) (4,5) -> 4 mutual
    # of 5; the (4,4) self-loop and the duplicate (1,2) must not count
    df = pd.DataFrame({"src": [1, 2, 2, 3, 4, 4, 1],
                       "dst": [2, 1, 3, 2, 5, 4, 2]})
    out = reciprocity(rd.from_pandas(df).repartition(3)).to_pandas()
    assert out["n_edges"].tolist() == [5]
    assert out["n_mutual"].tolist() == [4]
    assert out["reciprocity"].tolist() == [4.0 / 5.0]
    assert out["n_edges"].dtype == np.int64
    assert out["reciprocity"].dtype == np.float64


def test_anchor_text_index_semantics():
    """Pruned-tree anchors only; per-target count/distinct/top with
    lexicographic tie-break; cross-domain and mailto links dropped."""
    from hackathon_pagerank_ray.stages.anchors import anchor_text_index

    p1 = (b"<html><body><nav><a href='/nav'>chrome link</a></nav>"
          b"<p><a href='/t1'>Alpha</a> <a href='/t1'>Beta</a>"
          b"<a href='http://other.example.org/x'>offsite</a>"
          b"<a href='mailto:a@b.c'>mail</a></p></body></html>")
    p2 = (b"<html><body><p><a href='/t1'>Beta</a>"
          b"<a href='/t2'>Gamma</a></p></body></html>")
    pages = rd.from_arrow(pa.table({
        "url": ["http://site.example.com/a", "http://site.example.com/b"],
        "html": pa.array([p1, p2], pa.binary())}))
    out = (anchor_text_index(pages).to_pandas()
           .sort_values("url").reset_index(drop=True))
    t1 = out[out["url"].str.endswith("/t1")].iloc[0]
    # /t1: texts Alpha, Beta, Beta -> top = Beta (count 2)
    assert t1["n_anchors"] == 3 and t1["n_unique_texts"] == 2
    assert t1["top_text"] == "Beta"
    t2 = out[out["url"].str.endswith("/t2")].iloc[0]
    assert t2["n_anchors"] == 1 and t2["top_text"] == "Gamma"
    # nav anchor pruned, offsite + mailto filtered: exactly 2 targets
    assert len(out) == 2
    assert out["n_anchors"].dtype == np.int64


def test_anchor_text_tie_breaks_lexicographic():
    from hackathon_pagerank_ray.stages.anchors import anchor_text_index

    html = (b"<html><body><p><a href='/t'>zeta</a>"
            b"<a href='/t'>alpha</a></p></body></html>")
    pages = rd.from_arrow(pa.table({
        "url": ["http://s.example.com/"],
        "html": pa.array([html], pa.binary())}))
    out = anchor_text_index(pages).to_pandas()
    assert out.iloc[0]["top_text"] == "alpha"


def test_two_way_count_union_of_keys():
    from hackathon_pagerank_ray.stages.taskshuffle import two_way_count_int64
    a = rd.from_pandas(pd.DataFrame({"k": [1, 1, 2, 5]})).repartition(2)
    b = rd.from_pandas(pd.DataFrame({"k": [2, 2, 3]})).repartition(2)
    out = (two_way_count_int64(a, b, "k").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert out["k"].tolist() == [1, 2, 3, 5]
    assert out["cnt_a"].tolist() == [2, 1, 0, 1]
    assert out["cnt_b"].tolist() == [0, 2, 1, 0]


def test_edge_churn_counts_exact():
    from hackathon_pagerank_ray.stages.snapshots import edge_churn
    # A = {(1,2),(2,3),(3,4)} (dup (1,2) ignored); B = {(1,2),(3,4),(4,5)}
    a = pd.DataFrame({"src": [1, 2, 3, 1], "dst": [2, 3, 4, 2]})
    b = pd.DataFrame({"src": [1, 3, 4], "dst": [2, 4, 5]})
    out = edge_churn(rd.from_pandas(a).repartition(2),
                     rd.from_pandas(b)).to_pandas()
    assert out.iloc[0][["n_a", "n_b", "n_common", "n_added",
                        "n_removed"]].tolist() == [3, 3, 2, 1, 1]
    assert out.iloc[0]["jaccard"] == 2.0 / 4.0


def test_degree_delta_full_outer_semantics():
    from hackathon_pagerank_ray.stages.snapshots import degree_delta
    a = pd.DataFrame({"src": [1, 1, 2], "dst": [9, 8, 9]})
    b = pd.DataFrame({"src": [1, 3], "dst": [9, 9]})
    out = (degree_delta(rd.from_pandas(a).repartition(2),
                        rd.from_pandas(b)).to_pandas()
           .sort_values("src").reset_index(drop=True))
    assert out["src"].tolist() == [1, 2, 3]
    assert out["outdeg_a"].tolist() == [2, 1, 0]
    assert out["outdeg_b"].tolist() == [1, 0, 1]
    assert out["delta"].tolist() == [-1, -1, 1]
    assert out["delta"].dtype == np.int64


def test_pagerank_warm_start_same_fixpoint_fewer_sweeps():
    """Recrawl loop: warm-starting snapshot B's solve from snapshot A's
    ranks converges to the identical fixpoint in fewer sweeps (the power
    iteration's fixpoint is unique for alpha < 1)."""
    edges_a = gen_random_edges(400, 4000, seed=5)
    # snapshot B: drop every 7th edge, add a shifted batch
    keep = edges_a[np.arange(len(edges_a)) % 7 != 0]
    extra = gen_random_edges(400, 400, seed=6)
    edges_b = np.concatenate([keep, extra])

    g_a = ShardedGraph.build(rd.from_arrow(edges_to_table(edges_a)),
                             n=400, num_owners=4)
    try:
        ranks_a, _ = pagerank(g_a, tol=1e-12)
        ranks_a_ds = ranks_a.materialize()
    finally:
        g_a.shutdown()

    g_b = ShardedGraph.build(rd.from_arrow(edges_to_table(edges_b)),
                             n=400, num_owners=4)
    try:
        cold, info_cold = pagerank(g_b, tol=1e-12)
        cold_r = _ranks(cold)
        warm, info_warm = pagerank(g_b, tol=1e-12, warm_start=ranks_a_ds)
        warm_r = _ranks(warm)
        # array-pair form must behave identically
        df_a = ranks_a_ds.to_pandas()
        warm2, info_warm2 = pagerank(
            g_b, tol=1e-12, warm_start=(df_a["vid"].to_numpy(),
                                        df_a["rank"].to_numpy()))
        warm2_r = _ranks(warm2)
    finally:
        g_b.shutdown()

    assert np.abs(warm_r - cold_r).max() < 1e-9
    assert np.abs(warm2_r - warm_r).max() == 0.0
    assert info_warm["sweeps"] < info_cold["sweeps"]
    assert info_warm2["sweeps"] == info_warm["sweeps"]


def test_pagerank_warm_start_resume_conflict_and_reuse():
    edges = gen_random_edges(100, 600, seed=9)
    g = ShardedGraph.build(rd.from_arrow(edges_to_table(edges)),
                           n=100, num_owners=2)
    try:
        import pytest
        with pytest.raises(ValueError):
            pagerank(g, warm_start=(np.array([0]), np.array([1.0])),
                     resume=True, checkpoint_dir="/tmp/never")
        # a warm-started mesh reused WITHOUT warm_start must re-init
        # to uniform and give the plain cold-start result
        r_warm = _ranks(pagerank(g, warm_start=(
            np.arange(100, dtype=np.int64), np.full(100, 0.01)))[0])
        r_plain = _ranks(pagerank(g)[0])
    finally:
        g.shutdown()
    ro, _, _ = oracle.pagerank(edges, n=100)
    assert np.abs(r_plain - ro).max() < 1e-12
    assert np.abs(r_warm - ro).max() < 1e-6  # same fixpoint at tol


def test_eigenvector_centrality_matches_numpy_replay():
    from hackathon_pagerank_ray.graph.engine import eigenvector_centrality
    edges = gen_random_edges(300, 3000, seed=17)
    ds = rd.from_arrow(edges_to_table(edges)).repartition(4)
    out, info = eigenvector_centrality(ds, num_owners=4, max_iter=20)
    got = out.to_pandas().sort_values("vid")["score"].to_numpy()
    # numpy twin: x' = A^T x, L2 normalize, 20 sweeps from 1/sqrt(n)
    n = 300
    x = np.full(n, 1.0 / np.sqrt(n))
    src, dst = edges[:, 0], edges[:, 1]
    for _ in range(20):
        pre = np.bincount(dst, weights=x[src], minlength=n)
        nr = np.sqrt((pre * pre).sum())
        x = pre / nr if nr > 0 else pre
    assert np.abs(got - x).max() < 1e-12
    assert info["sweeps"] == 20
    # L2 norm of the output is 1
    assert abs(np.sqrt((got * got).sum()) - 1.0) < 1e-12


def test_grouped_hll_matches_per_group_global_sketch():
    """hll_registers_by(group) must equal running hll_registers on each
    group's rows separately — and its estimates track exact distincts."""
    from hackathon_pagerank_ray.stages.stats import (hll_estimate,
                                                     hll_registers,
                                                     hll_registers_by)
    rng = np.random.default_rng(31)
    groups, keys = [], []
    exact = {}
    for g, n in ((3, 50), (7, 400), (12, 1500)):
        ks = rng.integers(0, n * 2, n * 3)   # duplicates on purpose
        groups += [g] * len(ks)
        keys += [f"u{g}_{k}" for k in ks]
        exact[g] = len(set(keys[-len(ks):]))
    df = pd.DataFrame({"grp": groups, "key": keys})
    ds = rd.from_pandas(df).repartition(4)
    out = hll_registers_by(ds, "grp", "key").to_pandas()
    for g in exact:
        regs = (out[out["grp"] == g][["bucket", "rho"]]
                .reset_index(drop=True))
        solo = (hll_registers(
            rd.from_pandas(df[df["grp"] == g][["key"]]), "key")
            .to_pandas().sort_values("bucket").reset_index(drop=True))
        merged = regs.sort_values("bucket").reset_index(drop=True)
        pd.testing.assert_frame_equal(merged, solo, check_exact=True)
        est = hll_estimate(regs)
        assert abs(est - exact[g]) / exact[g] < 0.2, (g, est, exact[g])


def test_dup_cluster_size_histogram():
    """Identical texts form clusters; histogram counts clusters by size."""
    from hackathon_pagerank_ray.stages.dedup_near import (minhash_dedup,
                                                          near_dup_groups)
    from hackathon_pagerank_ray.stages.relational import distinct
    from hackathon_pagerank_ray.stages.taskshuffle import grouped_agg_int64

    t3 = "the quick brown fox jumps over the lazy dog again and again"
    t2 = "an entirely different duplicated boilerplate footer text block"
    uniq = "completely unrelated single document with its own words"
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 10, 11, 20],
        "text": [t3, t3, t3, t2, t2, uniq]})
    ds = rd.from_pandas(docs).repartition(3)
    pairs = minhash_dedup(ds, threshold=0.5, num_partitions=4).materialize()

    def _ids(t):
        ids = np.concatenate([np.asarray(t["a"], dtype=np.int64),
                              np.asarray(t["b"], dtype=np.int64)])
        return pa.table({"doc_id": pa.array(np.unique(ids), pa.int64())})

    universe = distinct(pairs.map_batches(_ids, batch_format="pyarrow"),
                        ["doc_id"], 2)
    groups = near_dup_groups(pairs, universe_ids_ds=universe)
    sizes = grouped_agg_int64(groups.select_columns(["group"]), "group",
                              None, op="sum", out_val="cluster_size")
    hist = (grouped_agg_int64(sizes.select_columns(["cluster_size"]),
                              "cluster_size", None, op="sum",
                              out_val="n_clusters")
            .to_pandas().sort_values("cluster_size")
            .reset_index(drop=True))
    assert hist.values.tolist() == [[2, 1], [3, 1]]


def test_warm_start_single_owner_and_shrunk_graph():
    """Review regressions: (a) the Dataset warm-start path must work at
    num_owners=1 (Ray keeps a 1-tuple return as one object); (b) rank
    rows whose vid no longer exists (graph shrank) are dropped, not a
    crash."""
    edges = gen_random_edges(80, 500, seed=23)
    ds = rd.from_arrow(edges_to_table(edges))

    # previous snapshot had MORE vertices (120) than the new graph (80)
    prev = rd.from_pandas(pd.DataFrame({
        "vid": np.arange(120, dtype=np.int64),
        "rank": np.full(120, 1.0 / 120)}))

    g = ShardedGraph.build(ds, n=80, num_owners=1)
    try:
        r = _ranks(pagerank(g, warm_start=prev)[0])
        # array-pair form with stale vids must also drop them
        r2 = _ranks(pagerank(g, warm_start=(
            np.arange(120, dtype=np.int64), np.full(120, 1.0 / 120)))[0])
    finally:
        g.shutdown()
    ro, _, _ = oracle.pagerank(edges, n=80)
    assert np.abs(r - ro).max() < 1e-6
    assert np.abs(r2 - ro).max() < 1e-6


def test_powerlaw_alpha_closed_form():
    import math
    from hackathon_pagerank_ray.stages.degrees import powerlaw_alpha
    # degrees: v0->6 edges, v1->10 edges, v2->3 edges (below dmin=5)
    src = [0] * 6 + [1] * 10 + [2] * 3
    dst = list(range(6)) + list(range(10)) + list(range(3))
    ds = rd.from_pandas(pd.DataFrame({"src": src, "dst": dst}))
    out = powerlaw_alpha(ds, dmin=5).to_pandas()
    sl = math.log(6 / 5) + math.log(10 / 5)
    assert out["n_tail"].tolist() == [2]
    assert out["alpha"].iloc[0] == 1.0 + 2.0 / sl


def test_bowtie_handmade():
    from hackathon_pagerank_ray.graph.bowtie import bowtie_regions
    # 0 -> {1,2} cycle (CORE) -> 3; tendril 0->4; island 5->6
    edges = np.array([[0, 1], [1, 2], [2, 1], [2, 3], [0, 4], [5, 6]])
    out = (bowtie_regions(rd.from_arrow(edges_to_table(edges)),
                          num_owners=2, num_partitions=2)
           .to_pandas().set_index("region")["n_vertices"])
    assert out.to_dict() == {"CORE": 2, "IN": 1, "OUT": 1,
                             "TENDRIL": 1, "DISCONNECTED": 2}


def test_bowtie_matches_numpy_oracle_on_random_graph():
    from hackathon_pagerank_ray.graph.bowtie import bowtie_regions
    edges = gen_random_edges(90, 260, seed=47)
    out = (bowtie_regions(rd.from_arrow(edges_to_table(edges)),
                          num_owners=2, num_partitions=2)
           .to_pandas().set_index("region")["n_vertices"].to_dict())
    reg = oracle.bowtie_regions(edges)
    want = {k: int((reg == k).sum()) for k in np.unique(reg)}
    assert out == want


def test_modularity_two_triangles():
    from hackathon_pagerank_ray.graph.modularity import community_modularity
    edges = np.array([[0, 1], [1, 2], [0, 2], [3, 4], [4, 5], [3, 5],
                      [2, 3]])
    labels = rd.from_pandas(pd.DataFrame(
        {"vid": np.arange(6, dtype=np.int64),
         "label": np.array([0, 0, 0, 3, 3, 3], dtype=np.int64)}))
    out = (community_modularity(rd.from_arrow(edges_to_table(edges)), labels,
                                num_partitions=2)
           .to_pandas().sort_values("label").reset_index(drop=True))
    assert out["label"].tolist() == [0, 3]
    assert out["inside_edges"].tolist() == [3, 3]
    assert out["volume"].tolist() == [7, 7]
    # m = 7: q_c = 3/7 - (7/14)^2
    want = 3.0 / 7.0 - (7.0 / 14.0) * (7.0 / 14.0)
    assert out["q"].tolist() == [want, want]


def test_modularity_random_graph_numpy_twin():
    from hackathon_pagerank_ray.graph.modularity import community_modularity
    edges = gen_random_edges(60, 200, seed=11)
    n = 60
    labels_np = oracle.label_propagation(edges, n=n)
    labels = rd.from_pandas(pd.DataFrame(
        {"vid": np.arange(n, dtype=np.int64), "label": labels_np}))
    out = (community_modularity(rd.from_arrow(edges_to_table(edges)), labels,
                                num_partitions=2)
           .to_pandas().sort_values("label").reset_index(drop=True))
    und = {(min(int(u), int(v)), max(int(u), int(v)))
           for u, v in edges if u != v}
    m = len(und)
    inside, vol = {}, {}
    for u, v in und:
        lu, lv = int(labels_np[u]), int(labels_np[v])
        vol[lu] = vol.get(lu, 0) + 1
        vol[lv] = vol.get(lv, 0) + 1
        if lu == lv:
            inside[lu] = inside.get(lu, 0) + 1
    assert out["label"].tolist() == sorted(vol)
    for _, r in out.iterrows():
        lab = int(r["label"])
        assert r["inside_edges"] == inside.get(lab, 0)
        assert r["volume"] == vol[lab]
        frac = vol[lab] / (2.0 * m)
        assert r["q"] == inside.get(lab, 0) / float(m) - frac * frac


def test_rank_delta_warm_start_twin():
    from hackathon_pagerank_ray.stages.snapshots import rank_delta
    a = gen_random_edges(70, 300, seed=5)
    # snapshot B: drop every 7th edge, add a few new ones (incl. a new vid)
    b = np.vstack([a[np.arange(len(a)) % 7 != 0],
                   np.array([[69, 70], [70, 3], [2, 70]])])
    out = (rank_delta(rd.from_arrow(edges_to_table(a)),
                      rd.from_arrow(edges_to_table(b)),
                      num_owners=2, sweeps=12)
           .to_pandas().sort_values("vid").reset_index(drop=True))
    n_a, n_b = 70, 71
    ra, _, _ = oracle.pagerank(a, n=n_a, tol=0.0, max_iter=12)
    seed = np.full(n_b, 1.0 / n_b)
    seed[:n_a] = ra                       # warm-start overlay contract
    rb, _, _ = oracle.pagerank(b, n=n_b, tol=0.0, max_iter=12, r0=seed)
    assert len(out) == n_b
    ra_pad = np.zeros(n_b)
    ra_pad[:n_a] = ra
    assert np.abs(out["rank_a"].to_numpy() - ra_pad).max() < 1e-12
    assert np.abs(out["rank_b"].to_numpy() - rb).max() < 1e-12
    assert np.abs(out["delta"].to_numpy() - (rb - ra_pad)).max() < 1e-12


def test_modularity_zero_inside_edges():
    """Synchronous LP can two-color bipartite-ish graphs so no edge is
    within-community — the inside table is then entirely empty and the
    operator must splice a zero column instead of joining."""
    from hackathon_pagerank_ray.graph.modularity import community_modularity
    edges = np.array([[0, 1], [1, 2], [2, 3]])
    labels = rd.from_pandas(pd.DataFrame(
        {"vid": np.arange(4, dtype=np.int64),
         "label": np.array([0, 1, 0, 1], dtype=np.int64)}))
    out = (community_modularity(rd.from_arrow(edges_to_table(edges)), labels,
                                num_partitions=2)
           .to_pandas().sort_values("label").reset_index(drop=True))
    assert out["inside_edges"].tolist() == [0, 0]
    assert out["volume"].tolist() == [3, 3]
    assert out["q"].tolist() == [-0.25, -0.25]


def test_spam_mass_numpy_twin():
    from hackathon_pagerank_ray.graph.trustrank import spam_mass
    edges = gen_random_edges(80, 350, seed=77)
    out = (spam_mass(rd.from_arrow(edges_to_table(edges)), num_owners=2,
                     sweeps=10)
           .to_pandas().sort_values("vid").reset_index(drop=True))
    n = 80
    pr, _, _ = oracle.pagerank(edges, n=n, tol=0.0, max_iter=10)
    seeds = np.arange(0, n, 10, dtype=np.int64)
    tr, _, _ = oracle.personalized_pagerank(edges, seeds, n=n, tol=0.0,
                                            max_iter=10)
    assert len(out) == n
    assert np.abs(out["pr"].to_numpy() - pr).max() < 1e-12
    assert np.abs(out["tr"].to_numpy() - tr).max() < 1e-12
    assert np.abs(out["spam_mass"].to_numpy() - (pr - tr) / pr).max() < 1e-12
    # trusted seeds concentrate trust: their mean spam mass must sit
    # below the non-seed mean
    sm = out["spam_mass"].to_numpy()
    assert sm[seeds].mean() < np.delete(sm, seeds).mean()


def test_salsa_matches_numpy_twin():
    from hackathon_pagerank_ray.graph.engine import salsa
    edges = gen_random_edges(70, 300, seed=19)
    out, info = salsa(rd.from_arrow(edges_to_table(edges)), num_owners=2,
                      max_iter=8)
    df = out.to_pandas().sort_values("vid").reset_index(drop=True)
    a, h = oracle.salsa(edges, n=70, max_iter=8)
    assert info["sweeps"] == 8
    assert len(df) == 70
    assert np.abs(df["salsa_auth"].to_numpy() - a).max() < 1e-12
    assert np.abs(df["salsa_hub"].to_numpy() - h).max() < 1e-12


def test_salsa_star_graph_closed_form():
    from hackathon_pagerank_ray.graph.engine import salsa
    # star: 1..4 -> 0; authority concentrates on 0, hubs split evenly
    edges = np.array([[1, 0], [2, 0], [3, 0], [4, 0]])
    out, _ = salsa(rd.from_arrow(edges_to_table(edges)), num_owners=2,
                   max_iter=5)
    df = out.to_pandas().sort_values("vid").reset_index(drop=True)
    assert df["salsa_auth"].tolist() == [1.0, 0.0, 0.0, 0.0, 0.0]
    assert df["salsa_hub"].tolist() == [0.0, 0.25, 0.25, 0.25, 0.25]


def test_term_zipf_closed_form():
    import math
    from hackathon_pagerank_ray.functions.tfidf import term_zipf_alpha
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a a a a b b C c", "A a a b b b x"]}))
    # totals: a=7, b=5, c=2, x=1 -> tail (>=5): a(7), b(5)
    out = term_zipf_alpha(docs, fmin=5).to_pandas()
    assert out["n_tail"].tolist() == [2]
    assert out["alpha"].iloc[0] == 1.0 + 2.0 / math.log(7.0 / 5.0)


def test_modularity_join_path_matches_broadcast_path():
    """Force the at-scale join plan (broadcast_threshold=0) — it must
    produce exactly the broadcast plan's rows."""
    from hackathon_pagerank_ray.graph.modularity import community_modularity
    edges = gen_random_edges(50, 160, seed=3)
    labels_np = oracle.label_propagation(edges, n=50)
    labels = rd.from_pandas(pd.DataFrame(
        {"vid": np.arange(50, dtype=np.int64), "label": labels_np}))
    kw = dict(num_partitions=2)
    a = (community_modularity(rd.from_arrow(edges_to_table(edges)), labels,
                              **kw)
         .to_pandas().sort_values("label").reset_index(drop=True))
    b = (community_modularity(rd.from_arrow(edges_to_table(edges)), labels,
                              broadcast_threshold=0, **kw)
         .to_pandas().sort_values("label").reset_index(drop=True))
    assert a.equals(b)


def test_new_graph_ops_empty_graph():
    """Empty edge tables short-circuit to typed empty outputs."""
    from hackathon_pagerank_ray.graph.bowtie import bowtie_regions
    from hackathon_pagerank_ray.graph.engine import salsa
    from hackathon_pagerank_ray.graph.trustrank import spam_mass
    empty = rd.from_arrow(pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())}))
    assert bowtie_regions(empty, num_owners=2).count() == 0
    out, info = salsa(empty, num_owners=2, max_iter=3)
    assert out.count() == 0 and info["n"] == 0
    assert spam_mass(empty, num_owners=2, sweeps=3).count() == 0


def test_user_recency_exact_dyadics():
    from hackathon_pagerank_ray.stages.events import recency_activity
    base = pd.Timestamp("2026-01-31 12:00:00")
    rows = [(1, base), (1, base - pd.Timedelta(days=3, hours=1)),
            (2, base - pd.Timedelta(hours=23)),          # age 0
            (2, base - pd.Timedelta(days=50)),           # clamped to 40
            (3, base - pd.Timedelta(days=1))]
    ev = rd.from_pandas(pd.DataFrame(
        {"user_id": [u for u, _ in rows], "ts": [t for _, t in rows]}))
    out = (recency_activity(ev).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out["user_id"].tolist() == [1, 2, 3]
    # exact dyadic arithmetic: bit-equal, not approx
    assert out["recency"].tolist() == [1.0 + 2.0 ** -3,
                                       1.0 + 2.0 ** -40,
                                       2.0 ** -1]


def test_bigram_logprob_closed_form():
    import math
    from hackathon_pagerank_ray.functions.lm_score import bigram_logprob
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b c", "a b b", "x"]}))   # doc 2: <2 tokens, no row
    out = (bigram_logprob(docs).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    # nb: ab=2 bc=1 bb=1; prefixes: a=2 b=2
    # doc0 = (ln(2/2) + ln(1/2))/2, doc1 identical
    want = (0.0 + math.log(1.0 / 2.0)) / 2.0
    assert out["doc_id"].tolist() == [0, 1]
    assert out["bigram_lp"].tolist() == [want, want]


def test_edge_support_handmade():
    from hackathon_pagerank_ray.graph.truss import edge_support
    # triangle {0,1,2} + pendant 2-3: triangle edges support 1, bridge 0
    edges = np.array([[0, 1], [1, 2], [0, 2], [2, 3]])
    out = (edge_support(rd.from_arrow(edges_to_table(edges)),
                        num_partitions=2)
           .to_pandas().sort_values(["u", "v"]).reset_index(drop=True))
    assert out.values.tolist() == [[0, 1, 1], [0, 2, 1], [1, 2, 1],
                                   [2, 3, 0]]


def test_avg_neighbor_degree_handmade():
    from hackathon_pagerank_ray.stages.degrees import avg_neighbor_degree
    # path 0-1-2 plus 2-3: degs 1,2,2,1
    edges = np.array([[0, 1], [1, 2], [2, 3]])
    out = (avg_neighbor_degree(rd.from_arrow(edges_to_table(edges)))
           .to_pandas().sort_values("vid").reset_index(drop=True))
    assert out["vid"].tolist() == [0, 1, 2, 3]
    assert out["avg_nbr_deg"].tolist() == [2.0, 1.5, 1.5, 2.0]


def test_gap_quantiles_handmade():
    from hackathon_pagerank_ray.stages.events import gap_quantiles
    ts = pd.to_datetime(["2026-01-01 00:00:00", "2026-01-01 00:00:10",
                         "2026-01-01 00:00:40", "2026-01-01 00:02:40",
                         "2026-01-02 00:00:00"])   # user 2: single event
    ev = rd.from_pandas(pd.DataFrame(
        {"user_id": [1, 1, 1, 1, 2], "event_id": [1, 2, 3, 4, 5],
         "ts": ts}))
    out = (gap_quantiles(ev, qs=(0.5,)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    # user 1 gaps: 10s, 30s, 120s -> median 30s; user 2 emits nothing
    assert out["user_id"].tolist() == [1]
    assert out["value"].tolist() == [30_000_000.0]


def test_cocitation_handmade():
    from hackathon_pagerank_ray.graph.linkpred import cocitation_topk
    # 0->{2,3}, 1->{2,3}, 4->{2}: pair (2,3) cocited twice
    edges = np.array([[0, 2], [0, 3], [1, 2], [1, 3], [4, 2]])
    out = (cocitation_topk(rd.from_arrow(edges_to_table(edges)), k=5,
                           num_partitions=2).to_pandas())
    assert out.values.tolist() == [[2, 3, 2]]


def test_rich_club_handmade():
    from hackathon_pagerank_ray.stages.degrees import rich_club
    # K4 core {0,1,2,3} + pendants to push core degrees above 3
    core = [[a, b] for a in range(4) for b in range(a + 1, 4)]
    pend = [[i, 10 + 4 * i + j] for i in range(4) for j in range(2)]
    edges = np.array(core + pend)
    out = (rich_club(rd.from_arrow(edges_to_table(edges)), ks=(3, 4))
           .to_pandas().sort_values("k").reset_index(drop=True))
    # degrees: core vertices 3+2=5, pendants 1 -> k=3: N=4, E=6, phi=1.0
    # k=4: N=4 (deg 5 > 4), phi=1.0
    assert out["n_nodes"].tolist() == [4, 4]
    assert out["n_edges"].tolist() == [6, 6]
    assert out["phi"].tolist() == [1.0, 1.0]


def test_sssp_matches_dijkstra():
    import heapq
    from hackathon_pagerank_ray.graph.engine import ShardedGraph, \
        sssp_distances
    rng = np.random.RandomState(13)
    n, m = 60, 240
    src = rng.randint(0, n, m)
    dst = rng.randint(0, n, m)
    w = (1.0 + rng.randint(0, 5, m)).astype(np.float64)
    t = pa.table({"src": pa.array(src, pa.int64()),
                  "dst": pa.array(dst, pa.int64()),
                  "w": pa.array(w, pa.float64())})
    g = ShardedGraph.build(rd.from_arrow(t), n=n, num_owners=2,
                           weight_col="w")
    try:
        out, _ = sssp_distances(g, 0)
        got = (out.to_pandas().sort_values("vid")["dist"].to_numpy())
    finally:
        g.shutdown()
    adj = [[] for _ in range(n)]
    for s, d, ww in zip(src, dst, w):
        adj[int(s)].append((int(d), float(ww)))
    dist = np.full(n, np.inf)
    dist[0] = 0.0
    pq_ = [(0.0, 0)]
    while pq_:
        dd, u = heapq.heappop(pq_)
        if dd > dist[u]:
            continue
        for v, ww in adj[u]:
            nd = dd + ww
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(pq_, (nd, v))
    want = np.where(np.isinf(dist), -1.0, dist)
    assert np.array_equal(got, want)


def test_sssp_unweighted_defaults_to_hops():
    from hackathon_pagerank_ray.graph.engine import (ShardedGraph,
                                                     bfs_distances,
                                                     sssp_distances)
    edges = gen_random_edges(50, 150, seed=21)
    g = ShardedGraph.build(rd.from_arrow(edges_to_table(edges)),
                           num_owners=2)
    try:
        s_out, _ = sssp_distances(g, 0)
        s = s_out.to_pandas().sort_values("vid")["dist"].to_numpy()
        b_out, _ = bfs_distances(g, 0)
        b = b_out.to_pandas().sort_values("vid")["dist"].to_numpy()
    finally:
        g.shutdown()
    assert np.array_equal(s, b.astype(np.float64))


def test_sssp_multi_source_nearest_seed():
    from hackathon_pagerank_ray.graph.engine import ShardedGraph, \
        sssp_distances
    # chain 0->1->2->3->4 (w=1 each); seeds {0, 4}: dist = [0,1,2,1,0]?
    # directed! 4 has no out-edges: dist(3) from seed 0 = 3.
    t = pa.table({"src": pa.array([0, 1, 2, 3], pa.int64()),
                  "dst": pa.array([1, 2, 3, 4], pa.int64()),
                  "w": pa.array([1.0] * 4, pa.float64())})
    g = ShardedGraph.build(rd.from_arrow(t), num_owners=2, weight_col="w")
    try:
        out, _ = sssp_distances(g, np.array([0, 4]))
        d = out.to_pandas().sort_values("vid")["dist"].tolist()
    finally:
        g.shutdown()
    assert d == [0.0, 1.0, 2.0, 3.0, 0.0]


def test_cube_counts_all_grouping_sets():
    from hackathon_pagerank_ray.stages.aggregates import cube_counts
    rng = np.random.RandomState(23)
    df = pd.DataFrame({
        "t": rng.choice(list("xyz"), 300),
        "u": rng.choice(list("ab"), 300),
        "amt": np.round(rng.uniform(1, 500, 300), 2),
    })
    out = cube_counts(rd.from_pandas(df).repartition(4), ["t", "u"],
                      "amt").to_pandas()
    cents = (df["amt"] * 100).round().astype(np.int64)
    # 2^2 grouping sets: finest, t-only, u-only, grand total
    fine = out[(out["t"] != "ALL") & (out["u"] != "ALL")]
    exp = df.assign(c=cents).groupby(["t", "u"])["c"].agg(["sum", "size"])
    assert len(fine) == len(exp)
    for (t, u), row in exp.iterrows():
        m = fine[(fine["t"] == t) & (fine["u"] == u)]
        assert int(m["n"].iloc[0]) == row["size"]
        assert abs(m["total"].iloc[0] - row["sum"] / 100.0) < 1e-9
    by_u = out[(out["t"] == "ALL") & (out["u"] != "ALL")]
    exp_u = df.assign(c=cents).groupby("u")["c"].agg(["sum", "size"])
    assert len(by_u) == len(exp_u)          # the set ROLLUP can't emit
    for u, row in exp_u.iterrows():
        m = by_u[by_u["u"] == u]
        assert int(m["n"].iloc[0]) == row["size"]
        assert abs(m["total"].iloc[0] - row["sum"] / 100.0) < 1e-9
    g = out[(out["t"] == "ALL") & (out["u"] == "ALL")]
    assert len(g) == 1 and int(g["n"].iloc[0]) == 300
    assert abs(g["total"].iloc[0] - cents.sum() / 100.0) < 1e-9


def _greedy_mis_oracle(src, dst, seed=7):
    import collections
    from hackathon_pagerank_ray.graph.mis import _priorities
    adj = collections.defaultdict(set)
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    verts = sorted(adj)
    if not verts:
        return set(), []
    p = dict(zip(verts, _priorities(np.array(verts), seed)))
    mis = set()
    for v in sorted(verts, key=lambda x: p[x]):
        if not (adj[v] & mis):
            mis.add(v)
    return mis, verts


def test_mis_matches_sequential_greedy():
    from hackathon_pagerank_ray.graph.mis import maximal_independent_set
    rng = np.random.RandomState(31)
    src = rng.randint(0, 400, 1500).astype(np.int64)
    dst = rng.randint(0, 400, 1500).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(4)
    # distributed local-min rounds
    out, info = maximal_independent_set(ds, seed=7, small_threshold=0)
    df = out.to_pandas()
    mis, verts = _greedy_mis_oracle(src, dst)
    assert set(df["vid"]) == set(verts)
    assert set(df[df["in_mis"] == 1]["vid"]) == mis
    assert info["rounds"] >= 1 and info["path"] != "greedy-task"
    # adaptive small path (single worker-task greedy): identical rows
    out2, info2 = maximal_independent_set(ds, seed=7)
    assert info2["path"] == "greedy-task"
    df2 = out2.to_pandas()
    assert set(df2[df2["in_mis"] == 1]["vid"]) == mis
    assert set(df2["vid"]) == set(verts)
    # independence + maximality re-checked structurally
    import collections
    adj = collections.defaultdict(set)
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    for v in verts:
        if v in mis:
            assert not (adj[v] & (mis - {v}))
        else:
            assert adj[v] & mis


def test_mis_edge_cases():
    from hackathon_pagerank_ray.graph.mis import maximal_independent_set
    # triangle + isolated pair + self-loop-only vertex (dropped)
    t = pa.table({"src": pa.array([0, 1, 2, 5, 9], pa.int64()),
                  "dst": pa.array([1, 2, 0, 6, 9], pa.int64())})
    out, info = maximal_independent_set(rd.from_arrow(t), seed=7)
    df = out.to_pandas().set_index("vid")["in_mis"]
    assert 9 not in df.index            # self-loop only: no simple edge
    assert df.loc[[0, 1, 2]].sum() == 1  # triangle: exactly one joins
    assert df.loc[[5, 6]].sum() == 1     # pair: exactly one joins
    # empty graph
    e = pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    out2, info2 = maximal_independent_set(rd.from_arrow(e), seed=7)
    assert out2.count() == 0 and info2["rounds"] == 0


def _oracle_coloring(src, dst, seed=7):
    import collections
    from hackathon_pagerank_ray.graph.mis import _priorities
    adj = collections.defaultdict(set)
    for s, d in zip(src, dst):
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    verts = sorted(adj)
    p = dict(zip(verts, _priorities(np.array(verts), seed)))
    color, uncolored, c = {}, set(verts), 0
    while uncolored:
        mis = set()
        for v in sorted(uncolored, key=lambda x: p[x]):
            if not ((adj[v] & uncolored) & mis):
                mis.add(v)
        for v in mis:
            color[v] = c
        uncolored -= mis
        c += 1
    return color, c


def test_greedy_coloring_both_paths_match_oracle():
    from hackathon_pagerank_ray.graph.mis import greedy_coloring
    rng = np.random.RandomState(17)
    src = rng.randint(0, 80, 400).astype(np.int64)
    dst = rng.randint(0, 80, 400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)
    exp, k = _oracle_coloring(src, dst)
    for thr in (2_000_000, 0):          # small path / distributed path
        out, info = greedy_coloring(ds, seed=7, small_threshold=thr)
        df = out.to_pandas()
        assert dict(zip(df["vid"], df["color"])) == exp
        assert info["colors"] == k
    # proper coloring
    got = exp
    for s, d in zip(src, dst):
        if s != d:
            assert got[s] != got[d]


def test_greedy_coloring_edge_cases():
    from hackathon_pagerank_ray.graph.mis import greedy_coloring
    # isolated-in-residual vertex must join the NEXT color, not a final
    # lumped one: path a-b-c-d where priorities force sequencing
    t = pa.table({"src": pa.array([0, 1, 2, 9], pa.int64()),
                  "dst": pa.array([1, 2, 3, 9], pa.int64())})
    out, info = greedy_coloring(rd.from_arrow(t), seed=7)
    df = out.to_pandas().set_index("vid")["color"]
    assert 9 not in df.index            # self-loop-only vertex dropped
    for s, d in [(0, 1), (1, 2), (2, 3)]:
        assert df.loc[s] != df.loc[d]
    assert info["colors"] == df.max() + 1
    # empty graph
    e = pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    out2, info2 = greedy_coloring(rd.from_arrow(e), seed=7)
    assert out2.count() == 0 and info2["colors"] == 0


def test_readability_lix():
    from hackathon_pagerank_ray.stages.text_ops import add_readability
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": ["Short one. And another sentence here!",
                 "wonderful extraordinary magnificent",   # all long words
                 ""]}))
    out = add_readability(docs).to_pandas().set_index("doc_id")
    # doc 0: 6 words ("short one and another sentence here"), 2 sentences,
    # long words (>6 chars): another(7), sentence(8) -> 2
    assert out.loc[0, "n_words"] == 6 and out.loc[0, "n_sents"] == 2
    assert abs(out.loc[0, "lix"] - (6 / 2 + 100.0 * 2 / 6)) < 1e-12
    # doc 1: no sentence marks -> s clamped to 1; 3/3 long words
    assert out.loc[1, "n_sents"] == 0
    assert abs(out.loc[1, "lix"] - (3 / 1 + 100.0)) < 1e-12
    assert out.loc[2, "lix"] == 0.0 and out.loc[2, "n_words"] == 0


def test_crawl_budget_hamilton_rounding():
    from hackathon_pagerank_ray.stages.domains import crawl_budget
    ranks = rd.from_arrow(pa.table({
        "vid": pa.array([0, 1, 2, 3], pa.int64()),
        "rank": pa.array([0.4005, 0.3004, 0.1996, 0.0995], pa.float64())}))
    out = crawl_budget(ranks, budget=10).to_pandas().set_index("vid")
    # quotas 4.005, 3.004, 1.996, 0.995 -> bases 4,3,1,0 (sum 8),
    # leftover 2 -> largest remainders .996 (vid 2) and .995 (vid 3)
    assert out["alloc"].tolist() == [4, 3, 2, 1]
    assert out["alloc"].sum() == 10
    assert out["alloc"].dtype == np.int64
    # remainder tie broken to the smaller vid
    r2 = rd.from_arrow(pa.table({
        "vid": pa.array([5, 3], pa.int64()),
        "rank": pa.array([0.5, 0.5], pa.float64())}))
    out2 = crawl_budget(r2, budget=5).to_pandas().set_index("vid")
    assert out2.loc[3, "alloc"] == 3 and out2.loc[5, "alloc"] == 2


def test_hopping_window_counts_math():
    from hackathon_pagerank_ray.stages.events import hopping_window_counts
    h = 3_600_000_000
    ts = pa.array([0, 1, h, 3 * h - 1, 3 * h], pa.timestamp("us"))
    ev = rd.from_arrow(pa.table({"ts": ts})).repartition(2)
    out = (hopping_window_counts(ev, width_us=3 * h, hop_us=h).to_pandas()
           .sort_values("window_start").reset_index(drop=True))
    # brute force: window k covers [k*h, k*h + 3h)
    import collections
    want = collections.Counter()
    for t in [0, 1, h, 3 * h - 1, 3 * h]:
        for k in range(t // h - 2, t // h + 1):
            want[k * h] += 1
    got = dict(zip(out["window_start"], out["n"]))
    assert got == dict(want)
    assert out["n"].dtype == np.int64
    with pytest.raises(ValueError):
        hopping_window_counts(ev, width_us=5 * h, hop_us=2 * h)


def test_maximal_matching_both_paths_match_greedy():
    from hackathon_pagerank_ray.graph.matching import (_edge_pkeys,
                                                       maximal_matching)
    rng = np.random.RandomState(41)
    src = rng.randint(0, 150, 700).astype(np.int64)
    dst = rng.randint(0, 150, 700).astype(np.int64)
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)
    # greedy oracle over the canonical distinct edge set
    e = sorted({(min(int(s), int(d)), max(int(s), int(d)))
                for s, d in zip(src, dst) if s != d})
    us = np.array([a for a, _ in e])
    vs = np.array([b for _, b in e])
    order = np.argsort(_edge_pkeys(us, vs, 9), kind="stable")
    taken, exp = set(), []
    for i in order:
        a, b = int(us[i]), int(vs[i])
        if a in taken or b in taken:
            continue
        taken.add(a)
        taken.add(b)
        exp.append((a, b))
    exp = sorted(exp)
    for thr in (2_000_000, 0):
        out, info = maximal_matching(ds, seed=9, small_threshold=thr)
        got = sorted(map(tuple,
                         out.to_pandas()[["u", "v"]]
                         .itertuples(index=False)))
        assert got == exp, info
    # matching: no shared endpoints; maximal: every edge touches one
    flat = [x for p in exp for x in p]
    assert len(flat) == len(set(flat))
    mv = set(flat)
    for s, d in zip(src, dst):
        if s != d:
            assert s in mv or d in mv


def test_maximal_matching_empty_and_selfloops():
    from hackathon_pagerank_ray.graph.matching import maximal_matching
    t = pa.table({"src": pa.array([7], pa.int64()),
                  "dst": pa.array([7], pa.int64())})
    out, info = maximal_matching(rd.from_arrow(t), seed=9)
    assert out.count() == 0 and info["path"] == "empty"


def test_densest_subgraph_finds_planted_clique():
    import itertools
    from hackathon_pagerank_ray.graph.densest import densest_subgraph
    rng = np.random.RandomState(9)
    src = rng.randint(0, 100, 200).astype(np.int64)
    dst = rng.randint(0, 100, 200).astype(np.int64)
    cu, cv = zip(*itertools.combinations(range(12), 2))
    src = np.concatenate([src, np.array(cu, dtype=np.int64)])
    dst = np.concatenate([dst, np.array(cv, dtype=np.int64)])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)

    # python replay of the exact peel
    def oracle():
        e = sorted({(min(int(a), int(b)), max(int(a), int(b)))
                    for a, b in zip(src, dst) if a != b})
        u = np.array([a for a, _ in e])
        v = np.array([b for _, b in e])
        best = (-1.0, None, 0, 0)
        while len(u):
            verts, cnt = np.unique(np.concatenate([u, v]),
                                   return_counts=True)
            m, n = len(u), len(verts)
            if m / n > best[0]:
                best = (m / n, set(verts.tolist()), m, n)
            keep = set(verts[cnt * 10 * n > 22 * m].tolist())
            mask = np.array([a in keep and b in keep
                             for a, b in zip(u, v)])
            u, v = u[mask], v[mask]
        return best

    dens, vset, m_, n_ = oracle()
    for thr in (2_000_000, 0):
        out, info = densest_subgraph(ds, small_threshold=thr)
        assert set(out.to_pandas()["vid"]) == vset, info
        assert (info["best_m"], info["best_n"]) == (m_, n_)
    # the planted 12-clique must survive into the winning set
    assert set(range(12)) <= vset
    # empty graph
    e = pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    out2, info2 = densest_subgraph(rd.from_arrow(e))
    assert out2.count() == 0 and info2["rounds"] == 0


def test_rectangle_count_known_graphs():
    from hackathon_pagerank_ray.graph.rectangles import rectangle_count
    import itertools

    def run(src, dst, thr):
        t = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
        return rectangle_count(rd.from_arrow(t).repartition(2),
                               small_threshold=thr).to_pandas().iloc[0]

    for thr in (2_000_000, 0):
        # 4-cycle 0-1-2-3-0: exactly one rectangle
        r = run([0, 1, 2, 3], [1, 2, 3, 0], thr)
        assert (r["rectangles"], r["max_codegree"]) == (1, 2)
        # K4: 3 distinct 4-cycles
        cu, cv = zip(*itertools.combinations(range(4), 2))
        r = run(list(cu), list(cv), thr)
        assert r["rectangles"] == 3 and r["codegree_pairs"] == 6
        # K_{2,3}: C(3,2)*C(2,2) = 3 butterflies
        r = run([0, 0, 0, 1, 1, 1], [2, 3, 4, 2, 3, 4], thr)
        assert r["rectangles"] == 3
        # triangle: no 4-cycles, 3 codegree pairs
        r = run([0, 1, 2], [1, 2, 0], thr)
        assert r["rectangles"] == 0 and r["codegree_pairs"] == 3
    # empty graph
    e = pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    r0 = rectangle_count(rd.from_arrow(e)).to_pandas().iloc[0]
    assert (r0["rectangles"], r0["codegree_pairs"],
            r0["max_codegree"]) == (0, 0, 0)


def test_rectangle_count_random_vs_bruteforce():
    from hackathon_pagerank_ray.graph.rectangles import rectangle_count
    import itertools
    rng = np.random.RandomState(5)
    src = rng.randint(0, 40, 150).astype(np.int64)
    dst = rng.randint(0, 40, 150).astype(np.int64)
    adj = {}
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # brute force: for each 4-set, each unordered 4-cycle is determined
    # by which pair {b, d} flanks the smallest vertex a (K4 hosts 3)
    verts = sorted(adj)
    n_rect = 0
    for q in itertools.combinations(verts, 4):
        a = q[0]
        for b, d in itertools.combinations(q[1:], 2):
            c = next(x for x in q[1:] if x not in (b, d))
            if (b in adj[a] and c in adj[b] and d in adj[c]
                    and a in adj[d]):
                n_rect += 1
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)
    for thr in (2_000_000, 0):
        r = rectangle_count(ds, small_threshold=thr).to_pandas().iloc[0]
        assert r["rectangles"] == n_rect, (thr, r["rectangles"], n_rect)


def test_clique4_census_known_and_random():
    import itertools
    from hackathon_pagerank_ray.graph.cliques import clique4_census

    def run(src, dst, thr):
        t = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
        return clique4_census(rd.from_arrow(t).repartition(2),
                              small_threshold=thr).to_pandas().iloc[0]

    k4u, k4v = zip(*itertools.combinations(range(4), 2))
    k5u, k5v = zip(*itertools.combinations(range(5), 2))
    for thr in (3_000_000, 0):
        r = run(list(k4u), list(k4v), thr)          # K4
        assert (r["triangles"], r["four_cliques"]) == (4, 1), (thr, r)
        r = run(list(k5u), list(k5v), thr)          # K5: C(5,3), C(5,4)
        assert (r["triangles"], r["four_cliques"]) == (10, 5), (thr, r)
        r = run([0, 1, 2, 3], [1, 2, 3, 0], thr)    # C4: square, no tris
        assert (r["triangles"], r["four_cliques"]) == (0, 0), (thr, r)

    # random graph vs brute force
    rng = np.random.RandomState(11)
    src = rng.randint(0, 30, 140).astype(np.int64)
    dst = rng.randint(0, 30, 140).astype(np.int64)
    adj = {}
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    n_tri = sum(1 for q in itertools.combinations(verts, 3)
                if q[1] in adj[q[0]] and q[2] in adj[q[0]]
                and q[2] in adj[q[1]])
    n_k4 = sum(1 for q in itertools.combinations(verts, 4)
               if all(b in adj[a] for a, b in itertools.combinations(q, 2)))
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)
    for thr in (3_000_000, 0):
        r = clique4_census(ds, small_threshold=thr).to_pandas().iloc[0]
        assert (r["triangles"], r["four_cliques"]) == (n_tri, n_k4), (thr, r)

    # empty graph
    e = pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    r0 = clique4_census(rd.from_arrow(e)).to_pandas().iloc[0]
    assert (r0["triangles"], r0["four_cliques"]) == (0, 0)


def test_copurchase_topk_vs_replay():
    from hackathon_pagerank_ray.stages.copurchase import copurchase_topk
    import itertools
    rng = np.random.RandomState(13)
    baskets = rng.randint(0, 60, 400).astype(np.int64)
    items = rng.randint(0, 25, 400).astype(np.int64)
    ds = rd.from_arrow(pa.table({"b": baskets, "i": items})).repartition(4)

    want = {}
    per = {}
    for b, i in zip(baskets, items):
        per.setdefault(int(b), set()).add(int(i))
    for s in per.values():
        for p1, p2 in itertools.combinations(sorted(s), 2):
            want[(p1, p2)] = want.get((p1, p2), 0) + 1
    order = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = copurchase_topk(ds, "b", "i", k=10).to_pandas()
    assert [((r.p1, r.p2), r.n_both) for r in
            got.itertuples(index=False)] == order
    assert got["n_both"].dtype == np.int64

    # duplicate (basket, item) rows count once
    d2 = rd.from_arrow(pa.table({"b": pa.array([1, 1, 1, 1], pa.int64()),
                                 "i": pa.array([7, 7, 9, 9], pa.int64())}))
    g2 = copurchase_topk(d2, "b", "i", k=5).to_pandas()
    assert g2.values.tolist() == [[7, 9, 1]]

    # max_basket_size keeps the smallest item ids
    d3 = rd.from_arrow(pa.table({"b": pa.array([1] * 4, pa.int64()),
                                 "i": pa.array([4, 3, 2, 1], pa.int64())}))
    g3 = copurchase_topk(d3, "b", "i", k=10,
                         max_basket_size=2).to_pandas()
    assert g3.values.tolist() == [[1, 2, 1]]

    # empty input
    e = rd.from_arrow(pa.table({"b": pa.array([], pa.int64()),
                                "i": pa.array([], pa.int64())}))
    assert copurchase_topk(e, "b", "i").count() == 0


def test_textrank_vs_numpy_replay():
    from hackathon_pagerank_ray.functions.textrank import textrank_scores

    docs = ["the quick brown fox jumps over the lazy dog",
            "the quick red fox runs. The dog sleeps!",
            "Brown dog, lazy fox?", "one", ""]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs, pa.string())}))
    got = (textrank_scores(ds, sweeps=12).to_pandas()
           .sort_values("word").reset_index(drop=True))

    # python replay: adjacent distinct pairs -> symmetric PageRank
    import re
    pairs = set()
    for d in docs:
        toks = re.findall(r"\w+", d.lower())
        for a, b in zip(toks, toks[1:]):
            if a != b:
                pairs.add((min(a, b), max(a, b)))
    words = sorted({w for p in pairs for w in p})
    idx = {w: i for i, w in enumerate(words)}
    e = np.array([[idx[a], idx[b]] for a, b in sorted(pairs)],
                 dtype=np.int64)
    sym = np.concatenate([e, e[:, ::-1]])
    want, _, _ = oracle.pagerank(sym, n=len(words), tol=0.0, max_iter=12)

    assert got["word"].tolist() == words
    assert np.abs(got["rank"].to_numpy() - want).max() < 1e-12
    assert abs(got["rank"].sum() - 1.0) < 1e-12
    # punctuation-only / empty corpus
    e0 = rd.from_arrow(pa.table({"text": pa.array(["!!", ""], pa.string())}))
    assert textrank_scores(e0).count() == 0


def test_assign_vertex_ids_more_partitions_than_values():
    """Regression: the distributed sort path emits zero-column empty
    blocks when distinct values < partitions; _assign_ids must type
    them instead of raising KeyError."""
    from hackathon_pagerank_ray.stages.ids import assign_vertex_ids
    ds = rd.from_arrow(pa.table({
        "url": pa.array(["b", "a", "c", "a", "b", "c", "a", "b"] * 4,
                        pa.string())})).repartition(8)
    out = (assign_vertex_ids(ds).to_pandas()
           .sort_values("vid").reset_index(drop=True))
    assert out["url"].tolist() == ["a", "b", "c"]
    assert out["vid"].tolist() == [0, 1, 2]


def test_transitivity_ratio_known_and_replay():
    from hackathon_pagerank_ray.graph.triangles import transitivity_ratio
    import itertools

    def run(src, dst):
        t = pa.table({"src": pa.array(src, pa.int64()),
                      "dst": pa.array(dst, pa.int64())})
        return transitivity_ratio(
            rd.from_arrow(t).repartition(2)).to_pandas().iloc[0]

    # triangle: 3 wedges, 1 triangle, transitivity 1.0
    r = run([0, 1, 2], [1, 2, 0])
    assert (r["wedges"], r["triangles"], r["transitivity"]) == (3, 1, 1.0)
    # star K_{1,3}: 3 wedges, no triangles
    r = run([0, 0, 0], [1, 2, 3])
    assert (r["wedges"], r["triangles"], r["transitivity"]) == (3, 0, 0.0)
    # random graph replay
    rng = np.random.RandomState(17)
    src = rng.randint(0, 40, 160).astype(np.int64)
    dst = rng.randint(0, 40, 160).astype(np.int64)
    adj = {}
    for a, b in zip(src, dst):
        a, b = int(a), int(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    tri = sum(1 for q in itertools.combinations(sorted(adj), 3)
              if q[1] in adj[q[0]] and q[2] in adj[q[0]]
              and q[2] in adj[q[1]])
    r = run(src, dst)
    assert (r["wedges"], r["triangles"]) == (wedges, tri)
    assert r["transitivity"] == 3.0 * tri / wedges
    # empty graph
    e = pa.table({"src": pa.array([], pa.int64()),
                  "dst": pa.array([], pa.int64())})
    r0 = transitivity_ratio(rd.from_arrow(e)).to_pandas().iloc[0]
    assert (r0["wedges"], r0["triangles"], r0["transitivity"]) == (0, 0, 0.0)
