"""Round-5 regression tests: checkpoint op guards, weighted-delta
duplicate-key rejection, boundary-anchored email redaction."""
import numpy as np
import pyarrow as pa
import ray.data as rd


def _digraph(seed=11, n=300, m=1400):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    keep = src != dst
    return rd.from_arrow(pa.table({"src": src[keep], "dst": dst[keep]}))


def test_checkpoint_op_guard_both_directions(tmp_path):
    """pagerank and sssp both store state under kind 'ranks': a resume
    pointed at the OTHER operator's checkpoint dir (same mesh shape) must
    fail fast instead of silently loading wrong state (ADVICE r4)."""
    import pytest

    from hackathon_pagerank_ray.graph.engine import (ShardedGraph, pagerank,
                                                     sssp_distances)
    ds = _digraph()
    pr_dir = str(tmp_path / "pr")
    sp_dir = str(tmp_path / "sp")

    g = ShardedGraph.build(ds, num_owners=2)
    pagerank(g, max_iter=3, checkpoint_dir=pr_dir, checkpoint_every=1)
    g.shutdown()
    g = ShardedGraph.build(ds, num_owners=2, weight_col=None)
    sssp_distances(g, 0, max_iter=3, checkpoint_dir=sp_dir,
                   checkpoint_every=1)
    g.shutdown()

    # sssp resume pointed at a pagerank checkpoint → rejected
    g = ShardedGraph.build(ds, num_owners=2)
    with pytest.raises(ValueError, match="op='pagerank'"):
        sssp_distances(g, 0, checkpoint_dir=pr_dir, resume=True)
    g.shutdown()

    # pagerank resume pointed at an sssp checkpoint → rejected
    g = ShardedGraph.build(ds, num_owners=2)
    with pytest.raises(ValueError, match="op='sssp'"):
        pagerank(g, checkpoint_dir=sp_dir, resume=True)
    g.shutdown()


def test_weighted_delta_rejects_duplicate_keys(tmp_path):
    """Duplicate (src, dst) keys on a WEIGHTED mesh tie under the
    canonical scatter order, so the merge patch cannot reproduce the
    cold build's stable input-order tie-break — apply_edge_delta must
    reject them rather than silently break bit-exactness (ADVICE r4)."""
    import pyarrow.parquet as pq
    import pytest

    from hackathon_pagerank_ray.graph.engine import ShardedGraph

    edges = np.array([[0, 1], [0, 2], [3, 4], [5, 6]], dtype=np.int64)
    w = np.array([1.0, 2.0, 3.0, 4.0])
    p0 = str(tmp_path / "d0.parquet")
    p1 = str(tmp_path / "d1.parquet")
    pq.write_table(pa.table({"src": edges[:2, 0], "dst": edges[:2, 1],
                             "w": w[:2]}), p0)
    pq.write_table(pa.table({"src": edges[2:, 0], "dst": edges[2:, 1],
                             "w": w[2:]}), p1)

    # added edge duplicating an EXISTING key → rejected
    g = ShardedGraph.build([p0, p1], n=7, num_owners=2, num_edge_shards=2,
                           canonical_scatter=True, weight_col="w")
    with pytest.raises(ValueError, match="distinct"):
        g.apply_edge_delta(added=rd.from_arrow(pa.table(
            {"src": pa.array([0], pa.int64()),
             "dst": pa.array([1], pa.int64()),
             "w": pa.array([9.0], pa.float64())})), n=7)
    g.shutdown()

    # duplicate keys WITHIN the added set → rejected
    g = ShardedGraph.build([p0, p1], n=7, num_owners=2, num_edge_shards=2,
                           canonical_scatter=True, weight_col="w")
    with pytest.raises(ValueError, match="distinct"):
        g.apply_edge_delta(added=rd.from_arrow(pa.table(
            {"src": pa.array([1, 1], pa.int64()),
             "dst": pa.array([5, 5], pa.int64()),
             "w": pa.array([1.0, 2.0], pa.float64())})), n=7)
    g.shutdown()

    # distinct added keys still apply fine (and remove-then-re-add of an
    # existing key is the sanctioned way to change a weight)
    g = ShardedGraph.build([p0, p1], n=7, num_owners=2, num_edge_shards=2,
                           canonical_scatter=True, weight_col="w")
    info = g.apply_edge_delta(
        added=rd.from_arrow(pa.table(
            {"src": pa.array([0], pa.int64()),
             "dst": pa.array([1], pa.int64()),
             "w": pa.array([9.0], pa.float64())})),
        removed=rd.from_arrow(pa.table(
            {"src": pa.array([0], pa.int64()),
             "dst": pa.array([1], pa.int64())})),
        n=7)
    assert info["m"] == 4
    g.shutdown()


def test_redact_overlong_local_fully_redacted():
    """A >64-char local part must be redacted in full — the r4 bounded
    pattern left its head in clear next to the placeholder (ADVICE r4)."""
    import pandas as pd

    from hackathon_pagerank_ray.stages.text_ops import Redact

    long_local = "secret.person" + "x" * 60
    batch = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [f"contact {long_local}@corp.example.com now",
                 "plain a@b.co here",
                 "no emails at all"]})
    out = Redact()(batch)
    assert out["text_redacted"].tolist() == [
        "contact <EMAIL> now", "plain <EMAIL> here", "no emails at all"]
    assert out["n_emails"].tolist() == [1, 1, 0]
    assert "secret" not in out["text_redacted"][0]


def test_train_centroids_driver_pull_bounded():
    """On a dataset LARGER than max_train_vectors, training must select
    exactly the bound (md5-rank rule), stay deterministic under
    re-partitioning, and keep ivf_topk recall intact (ADVICE r4: the old
    default pulled the full table into the driver heap)."""
    from hackathon_pagerank_ray.stages import similarity as SIM

    rng = np.random.default_rng(9)
    n, d, bound = 3000, 16, 500
    mat = rng.normal(size=(n, d))
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(mat.tolist(),
                                          pa.list_(pa.float64()))})

    pulls = []
    orig_take_all = rd.Dataset.take_all

    def _spy(self, *a, **kw):
        rows = orig_take_all(self, *a, **kw)
        pulls.append(len(rows))
        return rows

    rd.Dataset.take_all = _spy
    try:
        c1 = SIM.train_centroids(rd.from_arrow(tbl), n_centroids=8,
                                 max_train_vectors=bound)
        c2 = SIM.train_centroids(rd.from_arrow(tbl).repartition(7),
                                 n_centroids=8, max_train_vectors=bound)
    finally:
        rd.Dataset.take_all = orig_take_all
    # the embedding-row pull is exactly the bound; no full-table collect
    assert max(pulls) == bound, pulls
    assert (c1 == c2).all(), "md5-rank sample must be partition-stable"

    # bounded training still answers ivf queries correctly at full probe
    # depth (== brute force regardless of centroid quality)
    got = SIM.ivf_topk(rd.from_arrow(tbl), mat[:1], k=5, n_centroids=8,
                       nprobe=8, max_train_vectors=bound).to_pandas()
    brute = SIM.brute_force_topk(rd.from_arrow(tbl), mat[:1],
                                 k=5).to_pandas()
    assert sorted(got["vec_id"]) == sorted(brute["vec_id"])


def test_pack_sequences_properties():
    """Every doc in exactly one pack; multi-doc packs fill ≤ capacity; an
    oversized doc sits alone; greedy = no doc could have joined the
    previous pack of its group; deterministic under re-partitioning."""
    from hackathon_pagerank_ray.stages.aggregates import (pack_sequences,
                                                          pack_summary)

    rng = np.random.default_rng(3)
    n, cap = 900, 2048
    counts = rng.integers(1, 1200, n).astype(np.int64)
    counts[17] = 4000          # oversized: own pack, fill > capacity
    tbl = pa.table({"doc_id": pa.array(range(n), pa.int64()),
                    "n_tokens": pa.array(counts)})
    packed = pack_sequences(rd.from_arrow(tbl), capacity=cap,
                            group_size=64).to_pandas()
    assert sorted(packed["doc_id"]) == list(range(n))      # exactly once

    summ = pack_summary(rd.from_arrow(pa.Table.from_pandas(
        packed, preserve_index=False)), capacity=cap).to_pandas()
    multi = summ[summ["n_docs"] > 1]
    assert (multi["pack_tokens"] <= cap).all()
    over = summ[summ["pack_tokens"] > cap]
    assert (over["n_docs"] == 1).all() and len(over) == 1
    assert np.isclose(over["fill_frac"].iloc[0], 4000 / cap)

    # greedy: within a group, a pack opens only when the previous pack
    # could not take the doc
    packed["grp"] = packed["pack_id"] // 64
    for _, g in packed.groupby("grp"):
        g = g.sort_values(["pack_id", "pack_pos"])
        fills = g.groupby("pack_id")["n_tokens"].sum()
        firsts = g[g["pack_pos"] == 1].set_index("pack_id")["n_tokens"]
        packs = list(fills.index)
        for prev, cur in zip(packs, packs[1:]):
            assert fills[prev] + firsts[cur] > cap, \
                "doc should have joined the previous pack"

    again = pack_sequences(rd.from_arrow(tbl).repartition(7), capacity=cap,
                           group_size=64).to_pandas()
    key = ["doc_id", "n_tokens", "pack_id", "pack_pos"]
    assert again.sort_values("doc_id")[key].reset_index(drop=True).equals(
        packed.sort_values("doc_id")[key].reset_index(drop=True))


def test_apply_page_delta_matches_cold_rebuild(tmp_path):
    """Incremental prep state: removal-only delta (exercises keeper
    promotion), then an add-back delta, each bit-exact vs a cold
    prep_corpus of the post-churn corpus; patches touch only affected
    partitions and the driver holds churn-sized arrays only."""
    from hackathon_pagerank_ray.pipelines.dataprep import prep_corpus
    from hackathon_pagerank_ray.pipelines.incremental import (
        apply_page_delta, init_prep_state, read_prep)

    rng = np.random.default_rng(4)
    words = ("the a of and to in quick brown fox jumps over lazy dog "
             "document content with some words again").split()
    n = 400
    texts = [" ".join(rng.choice(words, rng.integers(6, 40)))
             for _ in range(n)]
    for i in range(12, n):                    # plant ~25% duplicates
        if rng.random() < 0.25:
            texts[i] = texts[rng.integers(0, i)]
    ids = np.arange(n, dtype=np.int64)

    def docs(sel):
        return rd.from_arrow(pa.table(
            {"doc_id": pa.array(sel, pa.int64()),
             "text": pa.array([texts[i] for i in sel])}))

    base = ids[ids % 10 != 0]
    state = str(tmp_path / "prep_state")
    init_prep_state(docs(base), state, num_partitions=16)

    rem = base[rng.choice(len(base), 30, replace=False)]
    info = apply_page_delta(state, removed_ids=rem)
    assert info["removed"] == 30
    assert info["newly_kept"] > 0, "test corpus should exercise promotion"
    cur = np.setdiff1d(base, rem)
    got = read_prep(state).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    want = prep_corpus(docs(cur)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got.equals(want), "removal delta must equal cold rebuild"

    back = np.union1d(rem, ids[ids % 10 == 0])
    info2 = apply_page_delta(state, added_docs_ds=docs(back))
    assert info2["added"] == len(back)
    got = read_prep(state).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    want = prep_corpus(docs(ids)).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert got.equals(want), "add delta must equal cold rebuild"

    # duplicate-id guard: adding an id that is already present raises
    import pytest
    with pytest.raises(ValueError, match="already present"):
        apply_page_delta(state, added_docs_ds=docs(ids[:1]))


def test_search_index_matches_rebuild_path(tmp_path):
    """Persisted term-partitioned index: warm tfidf/bm25 queries must
    reproduce the rebuild-per-query results (ids exact, scores to
    summation-order ulps), and the per-query read must touch only the
    query terms' partitions."""
    from hackathon_pagerank_ray.functions.search_index import (
        _part_files, _tpart, bm25_query, build_search_index, tfidf_query)
    from hackathon_pagerank_ray.functions.tfidf import (bm25_search,
                                                        build_tfidf_tables,
                                                        search)

    rng = np.random.default_rng(6)
    words = ("alpha beta gamma delta epsilon zeta eta theta data table "
             "query fast graph rank web page the of and").split()
    texts = [" ".join(rng.choice(words, rng.integers(8, 30)))
             for _ in range(300)]
    docs = rd.from_arrow(pa.table(
        {"doc_id": pa.array(range(300), pa.int64()),
         "text": pa.array(texts)}))
    idx = str(tmp_path / "idx")
    build_search_index(docs, idx, num_partitions=32)

    q = "data table query fast"
    got_t = tfidf_query(idx, q, top_k=10).to_pandas()
    got_b = bm25_query(idx, q, top_k=10).to_pandas()
    postings, norms, df_ds, N = build_tfidf_tables(docs)
    want_t = search(postings, norms, df_ds, N, q, top_k=10).to_pandas()
    want_b = bm25_search(docs, q, top_k=10).to_pandas()
    assert got_t["doc_id"].tolist() == want_t["doc_id"].tolist()
    assert np.allclose(got_t["tfidf_score"], want_t["tfidf_score"],
                       rtol=0, atol=1e-12)
    assert got_b["doc_id"].tolist() == want_b["doc_id"].tolist()
    assert np.allclose(got_b["bm25_score"], want_b["bm25_score"],
                       rtol=0, atol=1e-12)

    # pruned read: 4 query terms -> at most 4 partitions of each table
    files = _part_files(idx, "postings", _tpart(sorted(set(q.split())), 32))
    parts = {f.split("tpart=")[1].split("/")[0] for f in files}
    assert len(parts) <= 4

    # unknown-vocabulary query degrades to None, not an error
    assert tfidf_query(idx, "zzz qqq") is None


def test_audio_windows_and_media_stats():
    """Audio windowing emits the documented cardinality (1 truncated
    window below window_ms; 1 + (dur-w)//hop above), RMS is
    deterministic, and media_stats counts come from the actual stage
    outputs."""
    from hackathon_pagerank_ray.stages import multimodal as MM

    tbl = MM.synthetic_media_table(n=24, seed=3)
    ds = rd.from_arrow(tbl)
    wins = MM.audio_windows(ds, window_ms=400, hop_ms=200).to_pandas()
    durs = dict(zip(tbl["media_id"].to_pylist(),
                    tbl["duration_ms"].to_pylist()))
    counts = wins.groupby("media_id").size()
    for mid, dur in durs.items():
        want = 1 + (dur - 400) // 200 if dur >= 400 else 1
        assert counts[mid] == want, (mid, dur)
    assert (wins["rms"] >= 0).all() and (wins["rms"] <= 1).all()
    again = MM.audio_windows(rd.from_arrow(tbl).repartition(3),
                             window_ms=400, hop_ms=200).to_pandas()
    key = ["media_id", "win_ms"]
    assert again.sort_values(key).reset_index(drop=True).equals(
        wins.sort_values(key).reset_index(drop=True))

    stats = MM.media_stats(ds).to_pandas().sort_values("media_id")
    assert len(stats) == 24
    for _, r in stats.iterrows():
        dur = durs[r["media_id"]]
        assert r["n_frames"] == max(1, dur // 1000)
        assert r["n_windows"] == (1 + (dur - 400) // 200
                                  if dur >= 400 else 1)

    # derived media table is a pure function of documents
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["hello", "héllo"])}))
    med = MM.media_from_documents(docs).to_pandas()
    assert med["payload_bytes" if "payload_bytes" in med else "payload"] \
        .map(len).tolist() == [5, 6]
    assert med["mime"].tolist() == ["image/fake", "audio/fake"]
    assert med["duration_ms"].tolist() == [500 + 5 * 13, 500 + 6 * 13]


def test_apply_crawl_delta_matches_cold_extract(tmp_path):
    """Crawl-side delta bridge: re-extract only churned pages, patch the
    url-keyed docs/edges/vertices state, and the resulting tables must
    equal a cold extract of the post-churn page set (url space); the
    returned id-space edge delta must be consistent with the patched
    url-edge table under the append-only vid map."""
    from hackathon_pagerank_ray.pipelines.incremental import (
        apply_crawl_delta, init_crawl_state, _part_file, _read_part,
        _CEDGE_SCHEMA, _CDOCS_SCHEMA)
    from hackathon_pagerank_ray.stages.dedup import (dedup_edges,
                                                     dedup_pages_longer_text)
    from hackathon_pagerank_ray.stages.extract_stage import (explode_links,
                                                             indexed_docs,
                                                             parse_pages)
    from hackathon_pagerank_ray.testgen import generate_pages
    import os
    import pandas as pd

    from hackathon_pagerank_ray.extract import normalize_url

    pages = generate_pages(120, seed=9)
    # the crawl state is keyed by NORMALIZED url — express all churn
    # sets in normalized terms
    nurls = [normalize_url(u) for u in pages["url"].to_pylist()]
    extra = generate_pages(140, seed=9)          # superset, deterministic
    ex20 = extra.slice(120, 20)
    ex_n = [normalize_url(u) for u in ex20["url"].to_pylist()]
    keep_extra, seen = [], set(nurls)
    for i, u in enumerate(ex_n):
        if u not in seen and len(keep_extra) < 10:
            keep_extra.append(i)
            seen.add(u)
    extra_rows = ex20.take(keep_extra)
    rem_urls = sorted(set(nurls[::8]))[:15]
    readd = pages.filter(pa.array([u in rem_urls[:8] for u in nurls]))

    base = pages.filter(pa.array([u not in rem_urls for u in nurls]))
    state = str(tmp_path / "crawl")
    info0 = init_crawl_state(rd.from_arrow(base), state, num_partitions=16)

    added = pa.concat_tables([readd, extra_rows])
    delta = apply_crawl_delta(state, added_pages_ds=rd.from_arrow(added),
                              removed_urls=rem_urls[:8])
    assert delta["n"] >= info0["n"]

    # post-churn page set for the cold twin
    post = pa.concat_tables([base.filter(pa.array(
        [u not in rem_urls[:8] for u in base["url"].to_pylist()])), added])
    parsed = parse_pages(rd.from_arrow(post)).materialize()
    want_docs = dedup_pages_longer_text(indexed_docs(parsed)).to_pandas()
    want_edges = dedup_edges(explode_links(parsed)).to_pandas()

    def read_state(table, by, schema):
        parts = []
        for p in range(16):
            t = _read_part(_part_file(state, table, by, p), schema)
            if t.num_rows:
                # init-written partitions carry the partition column,
                # patched ones don't — normalize to the logical schema
                parts.append(t.select(schema.names))
        return pa.concat_tables(parts).to_pandas() if parts else \
            schema.empty_table().to_pandas()

    got_docs = read_state("docs", "dpart", _CDOCS_SCHEMA)
    got_edges = read_state("edges_url", "epart", _CEDGE_SCHEMA)
    ek = ["src_url", "dst_url"]
    assert (got_edges.sort_values(ek).reset_index(drop=True)[ek]
            .equals(want_edges.sort_values(ek).reset_index(drop=True)[ek]))
    dk = ["url", "warc_ts", "text", "lang"]
    assert (got_docs.sort_values("url").reset_index(drop=True)[dk]
            .equals(want_docs.sort_values("url")
                    .reset_index(drop=True)[dk]))

    # id-space delta consistency: patched url edges mapped through the
    # state's vid table == (original id edges - removed + added)
    from hackathon_pagerank_ray.pipelines.incremental import _VERT_SCHEMA
    verts = read_state("vertices", "vpart", _VERT_SCHEMA)
    vmap = dict(zip(verts["url"], verts["vid"]))
    assert len(set(vmap.values())) == len(vmap)      # vids unique
    got_idedges = sorted((vmap[s], vmap[d]) for s, d in
                         zip(got_edges["src_url"], got_edges["dst_url"]))
    add_pairs = set(zip(delta["added"]["src"].to_pylist(),
                        delta["added"]["dst"].to_pylist()))
    rem_pairs = set(zip(delta["removed"]["src"].to_pylist(),
                        delta["removed"]["dst"].to_pylist()))
    assert add_pairs.isdisjoint(rem_pairs) or True   # overlap allowed
    # every added id pair maps back to a patched url edge
    want_pairs = set(got_idedges)
    assert add_pairs - want_pairs == set()


def test_crawl_delta_feeds_apply_edge_delta(tmp_path):
    """End-to-end recrawl loop: build a canonical ranged mesh over the
    pre-churn id edges, apply the crawl delta's id-space added/removed
    tables via apply_edge_delta, and PageRank must be BIT-identical to
    a cold mesh of the patched edge table (same n, same boundaries)."""
    import pyarrow.parquet as pq

    from hackathon_pagerank_ray.graph.engine import ShardedGraph, pagerank
    from hackathon_pagerank_ray.pipelines.incremental import (
        _CEDGE_SCHEMA, _VERT_SCHEMA, _part_file, _read_part,
        apply_crawl_delta, init_crawl_state)
    from hackathon_pagerank_ray.testgen import generate_pages

    pages = generate_pages(150, seed=21)
    urls = sorted(set(pages["url"].to_pylist()))
    rem = urls[::11][:6]
    from hackathon_pagerank_ray.extract import normalize_url
    rem_n = [normalize_url(u) for u in rem]
    base = pages.filter(pa.array(
        [u not in set(rem) for u in pages["url"].to_pylist()]))
    churn = pages.filter(pa.array(
        [u in set(rem) for u in pages["url"].to_pylist()]))

    state = str(tmp_path / "crawl2")
    info0 = init_crawl_state(rd.from_arrow(base), state, num_partitions=8)

    def read_state(table, by, schema):
        parts = [
            _read_part(_part_file(state, table, by, p), schema)
            .select(schema.names) for p in range(8)]
        return pa.concat_tables([t for t in parts if t.num_rows])

    # pre-churn id edges via the state's vid map
    verts = read_state("vertices", "vpart", _VERT_SCHEMA).to_pandas()
    vmap0 = dict(zip(verts["url"], verts["vid"]))
    e0 = read_state("edges_url", "epart", _CEDGE_SCHEMA).to_pandas()
    src0 = np.array([vmap0[u] for u in e0["src_url"]], np.int64)
    dst0 = np.array([vmap0[u] for u in e0["dst_url"]], np.int64)

    delta = apply_crawl_delta(state, added_pages_ds=rd.from_arrow(churn),
                              removed_urls=rem_n)
    n1 = delta["n"]

    # ranged files over the pre-churn edges (2 contiguous src ranges)
    order = np.argsort(src0, kind="stable")
    src0, dst0 = src0[order], dst0[order]
    cut = len(src0) // 2
    while cut < len(src0) and src0[cut] == src0[cut - 1]:
        cut += 1
    paths = []
    for i, sl in enumerate((slice(0, cut), slice(cut, len(src0)))):
        p = str(tmp_path / f"ce-{i}.parquet")
        pq.write_table(pa.table({"src": src0[sl], "dst": dst0[sl]}), p)
        paths.append(p)
    bound = int(src0[cut]) if cut < len(src0) else int(src0[-1]) + 1

    g = ShardedGraph.build(paths, n=info0["n"], num_owners=2,
                           num_edge_shards=2, canonical_scatter=True)
    g.apply_edge_delta(added=rd.from_arrow(delta["added"]),
                       removed=rd.from_arrow(delta["removed"]), n=n1)
    rd_d, _ = pagerank(g, tol=0.0, max_iter=8)
    rd_d = rd_d.to_pandas().sort_values("vid")["rank"].to_numpy()
    g.shutdown()

    # cold twin: patched edge table from state, same range boundary
    e1 = read_state("edges_url", "epart", _CEDGE_SCHEMA).to_pandas()
    verts1 = read_state("vertices", "vpart", _VERT_SCHEMA).to_pandas()
    vmap1 = dict(zip(verts1["url"], verts1["vid"]))
    s1 = np.array([vmap1[u] for u in e1["src_url"]], np.int64)
    d1 = np.array([vmap1[u] for u in e1["dst_url"]], np.int64)
    b_paths = []
    for i, m in enumerate((s1 < bound, s1 >= bound)):
        p = str(tmp_path / f"cb-{i}.parquet")
        pq.write_table(pa.table({"src": s1[m], "dst": d1[m]}), p)
        b_paths.append(p)
    g2 = ShardedGraph.build(b_paths, n=n1, num_owners=2,
                            num_edge_shards=2, canonical_scatter=True)
    rd_c, _ = pagerank(g2, tol=0.0, max_iter=8)
    rd_c = rd_c.to_pandas().sort_values("vid")["rank"].to_numpy()
    g2.shutdown()
    assert len(rd_d) == len(rd_c) == n1
    assert (rd_d == rd_c).all(), "crawl delta -> edge delta not bit-exact"


def test_apply_index_delta_bm25_parity(tmp_path):
    """Delta-maintained BM25 index: remove-then-re-add churn must leave
    bm25_query identical to a search over the full corpus (raw tf/dl
    rows are patched, idf/avgdl derive from the patched df/meta at
    query time); tfidf_query must refuse on the stale index."""
    import pytest

    from hackathon_pagerank_ray.functions.search_index import (
        apply_index_delta, bm25_query, build_search_index,
        enable_index_deltas, tfidf_query)
    from hackathon_pagerank_ray.functions.tfidf import bm25_search

    rng = np.random.default_rng(12)
    words = ("alpha beta gamma delta data table query fast web page "
             "rank the of and").split()
    texts = [" ".join(rng.choice(words, rng.integers(5, 25)))
             for _ in range(400)]
    ids = np.arange(400, dtype=np.int64)

    def docs(sel):
        return rd.from_arrow(pa.table(
            {"doc_id": pa.array(sel, pa.int64()),
             "text": pa.array([texts[i] for i in sel])}))

    base = ids[ids % 10 != 0]
    idx = str(tmp_path / "idx")
    build_search_index(docs(base), idx, num_partitions=32)
    enable_index_deltas(idx, docs(base))

    rem = base[::7][:20]
    info = apply_index_delta(idx, removed_ids=rem)
    assert info["removed_docs"] == 20 and info["N"] == len(base) - 20
    back = np.union1d(rem, ids[ids % 10 == 0])
    apply_index_delta(idx, added_docs_ds=docs(back))

    q = "data table query fast"
    got = bm25_query(idx, q, top_k=10).to_pandas()
    want = bm25_search(docs(ids), q, top_k=10).to_pandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(got["bm25_score"], want["bm25_score"],
                       rtol=0, atol=1e-12)

    with pytest.raises(ValueError, match="stale"):
        tfidf_query(idx, q)
    with pytest.raises(ValueError, match="already present"):
        apply_index_delta(idx, added_docs_ds=docs(ids[:1]))


def test_search_index_rebuild_clears_stale(tmp_path):
    """The documented recovery from tfidf_stale — rebuild — must
    actually refresh every partition (resume-skip would silently keep
    stale postings) and clear the stale flag."""
    from hackathon_pagerank_ray.functions.search_index import (
        apply_index_delta, build_search_index, enable_index_deltas,
        tfidf_query)
    from hackathon_pagerank_ray.functions.tfidf import (build_tfidf_tables,
                                                        search)

    texts = ["data table fast", "query data", "table query data fast",
             "other words here", "data data data"]

    def docs(sel):
        return rd.from_arrow(pa.table(
            {"doc_id": pa.array(sel, pa.int64()),
             "text": pa.array([texts[i] for i in sel])}))

    idx = str(tmp_path / "idx")
    build_search_index(docs([0, 1, 2, 3]), idx, num_partitions=8)
    enable_index_deltas(idx, docs([0, 1, 2, 3]))
    apply_index_delta(idx, added_docs_ds=docs([4]))

    # rebuild over the same dir with the post-churn corpus
    build_search_index(docs([0, 1, 2, 3, 4]), idx, num_partitions=8)
    got = tfidf_query(idx, "data table", top_k=5).to_pandas()
    postings, norms, df_ds, N = build_tfidf_tables(docs([0, 1, 2, 3, 4]))
    want = search(postings, norms, df_ds, N, "data table",
                  top_k=5).to_pandas()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert np.allclose(got["tfidf_score"], want["tfidf_score"],
                       rtol=0, atol=1e-12)


def test_bpe_train_matches_sequential_reference():
    """Distributed BPE rounds must learn the exact merge list of a
    transparent sequential implementation (deterministic tie-break:
    highest count, then lexicographically smallest pair), on both the
    small path and the forced distributed path."""
    from collections import Counter

    from hackathon_pagerank_ray.functions.bpe import bpe_train
    from hackathon_pagerank_ray.stages.text_ops import tokenize

    texts = ["low lower lowest", "new newer newest news",
             "low low low new new widest wide wide",
             "the lowest newest widest low"] * 3
    docs = rd.from_arrow(pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts)}))

    # independent sequential reference (classic learn_bpe)
    wc = Counter()
    for t in texts:
        wc.update(tokenize(t))

    def ref_merges(wc, k):
        enc = {w: list(w) for w in wc}
        out = []
        for _ in range(k):
            stats = Counter()
            for w, n in wc.items():
                s = enc[w]
                for a, b in zip(s, s[1:]):
                    stats[(a, b)] += n
            if not stats:
                break
            (l, r), f = min(stats.items(), key=lambda kv: (-kv[1], kv[0]))
            out.append((l, r, f))
            for w in wc:
                s, res, i = enc[w], [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                        res.append(l + r)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                enc[w] = res
        return out

    want = ref_merges(wc, 12)
    got_small = bpe_train(docs, num_merges=12)
    got_dist = bpe_train(docs, num_merges=12, small_threshold=0)
    for got in (got_small, got_dist):
        assert list(zip(got["left"], got["right"], got["freq"])) == want


def test_embedding_covariance_and_pca():
    """Distributed covariance fold equals numpy's population covariance
    exactly at the rounding contract; PCA projections are centered,
    variance-ordered, and deterministic under re-partitioning."""
    from hackathon_pagerank_ray.stages.similarity import (
        embedding_covariance, pca_project)

    rng = np.random.default_rng(15)
    n, d = 600, 12
    mat = rng.normal(size=(n, d)) @ np.diag(np.linspace(2.0, 0.3, d))
    tbl = pa.table({"vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array(mat.tolist(),
                                          pa.list_(pa.float64()))})

    cov = embedding_covariance(rd.from_arrow(tbl))
    ref = np.cov(mat, rowvar=False, bias=True)
    iu, ju = np.triu_indices(d)
    assert np.abs(np.round(ref[iu, ju], 6)
                  - cov["cov"].to_numpy()).max() <= 1e-6

    proj = pca_project(rd.from_arrow(tbl), k=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    v = proj[["pc0", "pc1", "pc2"]].var(ddof=0).to_numpy()
    assert (np.diff(v) <= 1e-9).all(), "pc variance must be descending"
    assert np.abs(proj[["pc0", "pc1", "pc2"]].mean().to_numpy()
                  ).max() < 1e-9, "projections must be centered"
    again = pca_project(rd.from_arrow(tbl).repartition(7),
                        k=3).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert np.allclose(proj[["pc0", "pc1", "pc2"]].to_numpy(),
                       again[["pc0", "pc1", "pc2"]].to_numpy(),
                       rtol=0, atol=1e-9)


def test_quality_model_scoring():
    """Batched model-inference stage: per-actor weight load, one
    vectorized pass; score equals the documented logistic formula over
    the quality signals and is monotone in stopword ratio."""
    import pandas as pd

    from hackathon_pagerank_ray.stages.text_ops import (
        _QM_BIAS, _QM_WEIGHTS, QualityModel, QualityScore)

    batch = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["the quick brown fox jumps over the lazy dog and it is",
                 "zzz qqq xxx!!!???...", ""]})
    out = QualityModel()(batch.copy())
    feats = QualityScore()(batch.copy())
    z = np.full(3, _QM_BIAS)
    for col, w in _QM_WEIGHTS:
        z = z + w * feats[col].to_numpy(dtype=np.float64)
    want = np.round(1.0 / (1.0 + np.exp(-z)), 6)
    assert np.array_equal(out["quality_score"].to_numpy(), want)
    assert out["quality_score"][0] > out["quality_score"][1]


def test_repeated_page_and_index_deltas_no_drift(tmp_path):
    """Four random churn rounds (overlapping removals/re-adds, dup-heavy
    corpus): after EVERY round the patched prep state must equal a cold
    prep_corpus, and the delta-maintained bm25 index must answer like a
    cold search — repeated patching accumulates no drift."""
    from hackathon_pagerank_ray.functions.search_index import (
        apply_index_delta, bm25_query, build_search_index,
        enable_index_deltas)
    from hackathon_pagerank_ray.functions.tfidf import bm25_search
    from hackathon_pagerank_ray.pipelines.dataprep import prep_corpus
    from hackathon_pagerank_ray.pipelines.incremental import (
        apply_page_delta, init_prep_state, read_prep)

    rng = np.random.default_rng(31)
    words = ("the a of and to data table query fast web page rank "
             "quick brown fox lazy dog words content").split()
    n = 260
    texts = [" ".join(rng.choice(words, rng.integers(6, 30)))
             for _ in range(n)]
    for i in range(12, n):
        if rng.random() < 0.3:
            texts[i] = texts[rng.integers(0, i)]
    ids = np.arange(n, dtype=np.int64)

    def docs(sel):
        return rd.from_arrow(pa.table(
            {"doc_id": pa.array(sorted(sel), pa.int64()),
             "text": pa.array([texts[i] for i in sorted(sel)])}))

    live = set(ids.tolist())
    pstate = str(tmp_path / "prep")
    istate = str(tmp_path / "idx")
    init_prep_state(docs(live), pstate, num_partitions=8)
    build_search_index(docs(live), istate, num_partitions=16)
    enable_index_deltas(istate, docs(live))

    q = "data table query fast"
    for rnd in range(4):
        pool = sorted(live)
        rem = set(int(x) for x in
                  rng.choice(pool, size=min(25, len(pool) - 10),
                             replace=False))
        n_back = rng.integers(5, len(rem) + 1)
        back = set(int(x) for x in
                   rng.choice(sorted(rem), size=n_back, replace=False))
        apply_page_delta(pstate, removed_ids=np.array(sorted(rem)))
        apply_index_delta(istate, removed_ids=np.array(sorted(rem)))
        live -= rem
        if back:
            apply_page_delta(pstate, added_docs_ds=docs(back))
            apply_index_delta(istate, added_docs_ds=docs(back))
            live |= back

        got = read_prep(pstate).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        want = prep_corpus(docs(live)).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        assert got.equals(want), f"prep drift at round {rnd}"

        gb = bm25_query(istate, q, top_k=8)
        wb = bm25_search(docs(live), q, top_k=8)
        gb = gb.to_pandas() if gb is not None else None
        wb = wb.to_pandas() if wb is not None else None
        assert (gb is None) == (wb is None)
        if gb is not None:
            assert gb["doc_id"].tolist() == wb["doc_id"].tolist(), \
                f"bm25 drift at round {rnd}"
            assert np.allclose(gb["bm25_score"], wb["bm25_score"],
                               rtol=0, atol=1e-12)


def test_dedup_savings_with_planted_dups():
    """Per-source dedup savings on a corpus WITH duplicates (the sf
    tables are dup-free, so the driver gate only sees the empty path):
    dropped = every non-min-id copy, token-summed per source."""
    from hackathon_pagerank_ray.stages.dedup_near import dedup_savings
    from hackathon_pagerank_ray.stages.text_ops import tokenize

    texts = ["alpha beta gamma", "alpha beta gamma", "delta epsilon",
             "alpha beta gamma", "zeta eta theta iota", "delta epsilon",
             "unique text one", "unique text two"]
    srcs = ["web", "web", "wiki", "wiki", "web", "web", "wiki", "web"]
    tbl = pa.table({"doc_id": pa.array(range(8), pa.int64()),
                    "text": pa.array(texts),
                    "source": pa.array(srcs)})
    got = dedup_savings(rd.from_arrow(tbl)).to_pandas() \
        .sort_values("source").reset_index(drop=True)

    import pandas as pd
    df = tbl.to_pandas()
    keep = df.groupby("text")["doc_id"].min()
    dropped = df[~df["doc_id"].isin(keep)]
    want = (dropped.assign(tok=[len(tokenize(t)) for t in dropped["text"]])
            .groupby("source").agg(n_dropped=("doc_id", "size"),
                                   tokens_dropped=("tok", "sum"))
            .reset_index().sort_values("source").reset_index(drop=True))
    assert got["source"].tolist() == want["source"].tolist()
    assert got["n_dropped"].tolist() == want["n_dropped"].tolist()
    assert got["tokens_dropped"].tolist() == want["tokens_dropped"].tolist()


def test_ngram_novelty_known_answer():
    """Hand-checkable bigram novelty: shared vs unique bigrams across
    three docs, short docs get novelty 1.0."""
    from hackathon_pagerank_ray.stages.dedup_near import ngram_novelty

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "alpha beta gamma",      # bigrams: 'alpha beta', 'beta gamma'
            "alpha beta delta",      # shares 'alpha beta'
            "unique words only here",
            "tiny"])})               # < 2 tokens
    got = ngram_novelty(rd.from_arrow(docs), n=2).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert got["n_distinct"].tolist() == [2, 2, 3, 0]
    assert got["n_novel"].tolist() == [1, 1, 3, 0]
    assert got["novelty"].tolist() == [0.5, 0.5, 1.0, 1.0]
