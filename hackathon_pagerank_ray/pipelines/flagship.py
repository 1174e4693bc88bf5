"""The flagship pipeline — the Ray Data restatement of the reference's
``api/build_corpus.py`` batch run (SURVEY.md §3.1):

    read_parquet(pages)
      → ExtractPages actor pool (parse once: lang → filter → text → links)
      → docs table (D3 longer-text dedup)
      → link explode → D2 edge dedup → T2′ vertex ids → J2 id edges
      → ShardedGraph (per-partition CSR) → power-iteration PageRank
      → A7 normalize (inside pagerank) → J1 url join → K1 top-k report

Everything before the iterative solve is streaming Dataset ops; outputs are
partitioned Parquet directories so reruns can reuse finished tables.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..graph.engine import ShardedGraph, pagerank
from ..stages.dedup import dedup_edges, dedup_pages_longer_text
from ..stages.degrees import out_degrees
from ..stages.extract_stage import explode_links, indexed_docs, parse_pages
from ..stages.ids import assign_vertex_ids, edges_to_ids
from ..stages.relational import inner_join, topk


def build_graph_tables(pages_ds, target_lang: str | None = None,
                       concurrency=None, batch_size: int = 128,
                       num_partitions: int | None = None):
    """pages → (docs, vertices, edges) Datasets.

    ``parsed`` is materialized once because two branches (docs and edges)
    consume it — html is dropped at that point, so what's pinned is the
    extracted text + link lists, not the raw bytes.
    """
    import ray.data as rd

    from ..stages.relational import default_num_partitions, tune_shuffle
    tune_shuffle()
    if num_partitions is None:
        num_partitions = default_num_partitions()

    parsed = parse_pages(pages_ds, target_lang=target_lang,
                         concurrency=concurrency,
                         batch_size=batch_size).materialize()
    # each table below has ≥2 consumers — materialize once or every
    # consumer re-executes the whole upstream chain
    docs = dedup_pages_longer_text(indexed_docs(parsed)).materialize()
    edges_url = dedup_edges(explode_links(parsed), num_partitions).materialize()

    def _just(col, name):
        def inner(t: pa.Table) -> pa.Table:
            return pa.Table.from_arrays([t[col].combine_chunks()], names=[name])
        return inner

    url_universe = (
        edges_url.map_batches(_just("src_url", "url"), batch_format="pyarrow")
        .union(edges_url.map_batches(_just("dst_url", "url"),
                                     batch_format="pyarrow"))
        .union(docs.map_batches(_just("url", "url"), batch_format="pyarrow"))
    )
    # docs/edges are materialized above, so the universe size is two cheap
    # counts — lets small runs take the single-pass id assignment
    hint = 2 * edges_url.count() + docs.count()
    vertices = assign_vertex_ids(url_universe,
                                 input_rows_hint=hint).materialize()
    edges = edges_to_ids(edges_url, vertices, num_partitions).materialize()
    return docs, vertices, edges


def pagerank_report(ranks_ds, vertices_ds, k: int = 100,
                    num_partitions: int | None = None):
    """J1 + K1: (vid, url, rank) top-k sorted desc, vid as tiebreaker —
    the Parquet-native form of the reference's text report + pagerank.json
    (backend/cuda/pagerank_gpu.cu:438-443, backend/data/parse_pagerank.py)."""
    from ..stages.relational import default_num_partitions
    joined = inner_join(ranks_ds, vertices_ds, on="vid",
                        num_partitions=num_partitions
                        or default_num_partitions())
    return topk(joined.select_columns(["vid", "url", "rank"]),
                ["rank", "vid"], k, descending=[True, False])


def run_flagship(pages_path_or_ds, out_dir: str | None = None,
                 target_lang: str | None = None, alpha: float = 0.85,
                 tol: float = 1e-8, max_iter: int = 100, top_k: int = 100,
                 num_owners: int = 8, num_edge_shards: int | None = None,
                 checkpoint: bool = True, resume: bool = False,
                 concurrency=None):
    """End-to-end run.  Returns dict with datasets + run info."""
    import ray.data as rd

    if isinstance(pages_path_or_ds, str):
        from ..sources.readers import read_pages
        pages_ds = read_pages(pages_path_or_ds)
    else:
        pages_ds = pages_path_or_ds

    docs, vertices, edges = build_graph_tables(
        pages_ds, target_lang=target_lang, concurrency=concurrency)
    n = vertices.count()

    graph = ShardedGraph.build(edges, n=n, num_owners=num_owners,
                               num_edge_shards=num_edge_shards)
    ckpt = os.path.join(out_dir, "checkpoints") if (out_dir and checkpoint) else None
    ranks, info = pagerank(graph, alpha=alpha, tol=tol, max_iter=max_iter,
                           checkpoint_dir=ckpt, resume=resume)
    report = pagerank_report(ranks, vertices, k=top_k)

    result = {
        "docs": docs, "vertices": vertices, "edges": edges,
        "ranks": ranks, "report": report, "info": info, "graph": graph,
    }
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        vertices.write_parquet(os.path.join(out_dir, "vertices"))
        edges.write_parquet(os.path.join(out_dir, "edges"))
        docs.select_columns(["url", "warc_ts", "lang", "text"]).write_parquet(
            os.path.join(out_dir, "docs"))
        ranks.write_parquet(os.path.join(out_dir, "ranks"))
        report.write_parquet(os.path.join(out_dir, "report"))
    return result
