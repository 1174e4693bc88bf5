"""End-to-end flagship pipeline vs a serial reference-semantics oracle."""

import numpy as np
import ray.data as rd

from hackathon_pagerank_ray import oracle
from hackathon_pagerank_ray.extract import normalize_url, parse_page
from hackathon_pagerank_ray.pipelines.flagship import run_flagship
from hackathon_pagerank_ray.testgen import generate_pages

TARGET = "en"


def _oracle_pipeline(table):
    docs, edges_url = {}, []
    for row in table.to_pylist():
        html = row["html"]
        if html is None or len(html) > 2_000_000:
            continue
        _, text, links, indexed = parse_page(
            html.decode("utf-8", errors="replace"), row["url"], TARGET)
        if not indexed:
            continue
        u = normalize_url(row["url"])
        if u not in docs or len(text) > len(docs[u]):
            docs[u] = text
        edges_url.extend((u, l) for l in links)
    edge_set = sorted(set(edges_url))
    universe = sorted({u for u, _ in edge_set} | {v for _, v in edge_set}
                      | set(docs))
    url2id = {u: i for i, u in enumerate(universe)}
    e = np.array([[url2id[a], url2id[b]] for a, b in edge_set],
                 dtype=np.int64)
    ranks, _, _ = oracle.pagerank(e, n=len(universe))
    return docs, {u: ranks[i] for u, i in url2id.items()}


def test_flagship_end_to_end(tmp_path):
    table = generate_pages(150, seed=42)
    docs_oracle, ranks_oracle = _oracle_pipeline(table)

    res = run_flagship(rd.from_arrow(table), out_dir=str(tmp_path / "out"),
                       target_lang=TARGET, num_owners=2, top_k=20)
    rp = res["ranks"].to_pandas().merge(res["vertices"].to_pandas(), on="vid")
    eng = dict(zip(rp["url"], rp["rank"]))

    assert set(eng) == set(ranks_oracle)
    assert max(abs(eng[u] - ranks_oracle[u]) for u in eng) < 1e-6

    dd = res["docs"].to_pandas()
    engd = dict(zip(dd["url"], dd["text"]))
    assert set(engd) == set(docs_oracle)
    # the per-row invariant: byte-identical extracted text per url
    assert all(engd[u] == docs_oracle[u] for u in docs_oracle)

    # report: sorted desc, k rows, consistent with ranks
    rep = res["report"].to_pandas()
    assert len(rep) == 20
    assert (rep["rank"].values[:-1] >= rep["rank"].values[1:]).all()
    # graph summary invariants (S7 semantics)
    assert res["info"]["n"] == len(ranks_oracle)
    assert abs(rp["rank"].sum() - 1.0) < 1e-9
    res["graph"].shutdown()
