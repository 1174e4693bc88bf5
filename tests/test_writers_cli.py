"""Reference-format writers, URL stages, and the rank-report round trip."""

import json

import numpy as np
import pyarrow as pa
import ray.data as rd

from hackathon_pagerank_ray import oracle
from hackathon_pagerank_ray.graph.engine import ShardedGraph, pagerank
from hackathon_pagerank_ray.sources.writers import (parse_rank_report,
                                                    write_edges_txt,
                                                    write_pagerank_json,
                                                    write_rank_report)
from hackathon_pagerank_ray.stages.url_ops import (add_base_domain,
                                                   filter_same_domain,
                                                   filter_schemes,
                                                   normalize_url_column,
                                                   validate_http_urls)
from hackathon_pagerank_ray.testgen import edges_to_table, load_edge_txt


def test_rank_report_matches_reference_golden(tmp_path):
    """Engine report on the reference's own graph must be byte-identical to
    the committed golden (backend/output_1k.txt)."""
    edges = load_edge_txt("/root/reference/backend/data/random_1k_10k.txt")
    g = ShardedGraph.build(rd.from_arrow(edges_to_table(edges)), num_owners=4)
    try:
        ranks, _ = pagerank(g)
        out = str(tmp_path / "report.txt")
        write_rank_report(ranks, out, n=g.n, m=g.m, dangling_count=0,
                          top_k=10)
    finally:
        g.shutdown()
    golden = open("/root/reference/backend/output_1k.txt").read()
    assert open(out).read() == golden


def test_edges_txt_roundtrip(tmp_path):
    edges = np.array([[0, 1], [2, 3], [1, 0]])
    p = str(tmp_path / "e.txt")
    n = write_edges_txt(rd.from_arrow(edges_to_table(edges)), p)
    assert n == 3
    rt = load_edge_txt(p)
    assert np.array_equal(np.sort(rt, axis=0), np.sort(edges, axis=0))


def test_rank_report_parser():
    txt = "Top 2 nodes by PageRank:\n  node 5 : 0.1234567890\n  node 1 : 1e-3\n"
    import tempfile
    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write(txt)
    assert parse_rank_report(f.name) == [(5, 0.123456789), (1, 0.001)]


def test_pagerank_json_drop_and_renormalize(tmp_path):
    """parse_pagerank.py semantics: inner join urls, renormalize kept, sort."""
    ranks = rd.from_arrow(pa.Table.from_pydict(
        {"vid": [0, 1, 2], "rank": [0.5, 0.3, 0.2]}))
    verts = rd.from_arrow(pa.Table.from_pydict(
        {"vid": [0, 1], "url": ["u0", "u1"]}))
    p = str(tmp_path / "pr.json")
    k = write_pagerank_json(ranks, verts, p, num_partitions=2)
    data = json.load(open(p))
    assert k == 2
    assert data[0] == {"id": 0, "url": "u0", "score": 0.625}
    assert abs(sum(d["score"] for d in data) - 1.0) < 1e-12
    assert data[0]["score"] >= data[1]["score"]


def test_url_ops_stages():
    ds = rd.from_arrow(pa.Table.from_pydict({"url": [
        "https://EN.Example.org/a/#x", "https://other.net/b",
        "mailto:a@b.c", "ftp://x.y/z", "https://example.org/c/"]}))
    normed = normalize_url_column(ds, out_col="norm").to_pandas()
    assert normed["norm"].tolist()[0] == "https://en.example.org/a"
    assert normed["norm"].tolist()[4] == "https://example.org/c"

    bd = add_base_domain(ds).to_pandas()
    assert bd["base_domain"].tolist()[0] == "example.org"

    same = filter_same_domain(ds, "example.org").to_pandas()
    assert len(same) == 2
    schemes = filter_schemes(ds).to_pandas()
    assert "mailto:a@b.c" not in schemes["url"].tolist()
    http = validate_http_urls(ds).to_pandas()
    assert len(http) == 3


def test_teleport_mode_matches_oracle():
    edges = np.array([[0, 1], [0, 2], [1, 3], [2, 3], [3, 4], [4, 0], [0, 5]])
    g = ShardedGraph.build(rd.from_arrow(edges_to_table(edges)), num_owners=2)
    try:
        for mode in ("distribute", "teleport"):
            r = (pagerank(g, dangling_mode=mode)[0].to_pandas()
                 .sort_values("vid")["rank"].to_numpy())
            ro, _, _ = oracle.pagerank(edges, dangling_mode=mode)
            assert np.abs(r - ro).max() < 1e-12
    finally:
        g.shutdown()


def test_jsonl_roundtrip(tmp_path):
    import pandas as pd
    from hackathon_pagerank_ray.sources.readers import read_jsonl
    from hackathon_pagerank_ray.sources.writers import write_jsonl
    df = pd.DataFrame({"a": np.arange(20, dtype=np.int64),
                       "s": [f"x{i}" for i in range(20)],
                       "f": np.linspace(0, 1, 20)})
    out = str(tmp_path / "j")
    write_jsonl(rd.from_pandas(df).repartition(3), out)
    back = (read_jsonl(out).to_pandas()
            .sort_values("a").reset_index(drop=True))
    pd.testing.assert_frame_equal(back[["a", "s", "f"]], df)


def test_partitioned_write_resume_skips_committed(tmp_path):
    import os
    import pandas as pd
    from hackathon_pagerank_ray.sources.part_writer import (read_partitioned,
                                                            write_partitioned)
    df = pd.DataFrame({"g": np.repeat([1, 2, 3], 10).astype(np.int64),
                       "x": np.arange(30, dtype=np.int64)})
    out = str(tmp_path / "p")
    m1 = write_partitioned(rd.from_pandas(df).repartition(4), out, "g")
    assert m1["skipped"].tolist() == [False, False, False]
    assert sorted(m1["rows"]) == [10, 10, 10]
    # simulate a failed partition: remove one _SUCCESS marker
    os.remove(os.path.join(out, "g=2", "_SUCCESS"))
    f1 = os.path.join(out, "g=1", "part-0.parquet")
    mtime_before = os.path.getmtime(f1)
    m2 = write_partitioned(rd.from_pandas(df).repartition(2), out, "g")
    m2 = m2.set_index("key")
    assert bool(m2.loc["1", "skipped"]) and bool(m2.loc["3", "skipped"])
    assert not bool(m2.loc["2", "skipped"])        # rewritten
    assert os.path.getmtime(f1) == mtime_before    # untouched
    back = read_partitioned(out, "g").to_pandas().sort_values("x")
    pd.testing.assert_frame_equal(back.reset_index(drop=True),
                                  df.sort_values("x").reset_index(drop=True),
                                  check_like=True)
