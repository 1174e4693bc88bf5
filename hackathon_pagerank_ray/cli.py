"""Engine CLI (SURVEY.md X3) — the Ray-native analogue of the reference's
CLI knobs (crawler/crawl.py:11-40, api/build_corpus.py:215-265,
backend/cuda/pagerank_gpu.cu:357-370).  Launch directly or via
``ray job submit -- python -m hackathon_pagerank_ray.cli ...``.

Subcommands::

    flagship  <pages_parquet_dir> --out DIR [--lang en] [--damping 0.85]
              [--tol 1e-8] [--max-iter 100] [--top-k 100] [--owners 8]
              [--resume]
    pagerank  <edges.(txt|parquet dir)> --out DIR [--damping/--tol/...]
              [--weight-col w] [--seeds 1,2,3]
    graph     <edges.(txt|parquet dir)> --out DIR
              --op cc|scc|lp|kcore|hits|bfs|truss|diameter|harmonic|
                   bowtie|modularity|salsa|sssp [--k 3] [--source 0]
    gen-corpus <out_dir> --pages N [--seed 42]

Owns the Ray session (guarded init; the library itself never inits).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _ensure_ray(num_cpus: int | None):
    import ray
    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False,
                      ignore_reinit_error=True, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False
    from .stages.relational import tune_shuffle
    tune_shuffle()
    return ray


def _add_pr_args(p):
    p.add_argument("--damping", type=float, default=0.85)
    p.add_argument("--tol", type=float, default=1e-8)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--top-k", type=int, default=100)
    p.add_argument("--owners", type=int, default=8)
    p.add_argument("--dangling-mode", choices=["distribute", "teleport"],
                   default="distribute")
    p.add_argument("--num-cpus", type=int, default=None)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="hackathon_pagerank_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("flagship")
    f.add_argument("pages")
    f.add_argument("--out", required=True)
    f.add_argument("--lang", default=None)
    f.add_argument("--resume", action="store_true")
    _add_pr_args(f)

    g = sub.add_parser("pagerank")
    g.add_argument("edges")
    g.add_argument("--out", required=True)
    g.add_argument("--resume", action="store_true")
    g.add_argument("--weight-col", default=None,
                   help="edge weight column (weighted PageRank)")
    g.add_argument("--seeds", default=None,
                   help="comma-separated vids for personalized PageRank")
    _add_pr_args(g)

    gr = sub.add_parser("graph")
    gr.add_argument("edges")
    gr.add_argument("--out", required=True)
    gr.add_argument("--op", required=True,
                    choices=["cc", "scc", "lp", "kcore", "hits", "bfs",
                             "truss", "diameter", "harmonic", "bowtie",
                             "modularity", "salsa", "sssp"])
    gr.add_argument("--k", type=int, default=3,
                    help="kcore/truss threshold")
    gr.add_argument("--source", type=int, default=0, help="bfs source vid")
    gr.add_argument("--weight-col", default=None,
                    help="per-edge weight column for --op sssp (parquet "
                         "input only; omitted = hop distances)")
    gr.add_argument("--max-iter", type=int, default=None)
    gr.add_argument("--owners", type=int, default=8)
    gr.add_argument("--num-cpus", type=int, default=None)

    c = sub.add_parser("gen-corpus")
    c.add_argument("out_dir")
    c.add_argument("--pages", type=int, default=1000)
    c.add_argument("--seed", type=int, default=42)

    args = ap.parse_args(argv)

    if args.cmd == "gen-corpus":
        from .testgen import write_pages_parquet
        path = write_pages_parquet(args.out_dir, args.pages, seed=args.seed)
        print(json.dumps({"corpus": path, "pages": args.pages}))
        return 0

    ray = _ensure_ray(args.num_cpus)
    try:
        if args.cmd == "flagship":
            from .pipelines.flagship import run_flagship
            res = run_flagship(args.pages, out_dir=args.out,
                               target_lang=args.lang, alpha=args.damping,
                               tol=args.tol, max_iter=args.max_iter,
                               top_k=args.top_k, num_owners=args.owners,
                               resume=args.resume)
            res["graph"].shutdown()
            print(json.dumps(res["info"]))
        elif args.cmd == "graph":
            from .graph.engine import (ShardedGraph, bfs_distances,
                                       connected_components, hits, k_core,
                                       label_propagation)
            from .graph.triangles import canonical_undirected
            import pyarrow as pa
            if args.edges.endswith(".txt"):
                from .sources.readers import read_edge_txt
                edges = read_edge_txt(args.edges)
                if args.weight_col:
                    raise SystemExit("--weight-col needs parquet edges")
            else:
                from .sources.readers import read_edges_parquet
                edges = read_edges_parquet(args.edges,
                                           weight_col=args.weight_col)
            os.makedirs(args.out, exist_ok=True)
            kw = {} if args.max_iter is None else {"max_iter": args.max_iter}
            if args.op == "truss":
                from .graph.truss import ktruss_edges
                out = ktruss_edges(edges, k=args.k,
                                   num_partitions=args.owners).materialize()
                info = {"k": args.k, "edges": out.count()}
            elif args.op == "diameter":
                from .graph.hyperball import neighborhood_function
                import ray.data as rd
                nf, d_eff = neighborhood_function(
                    edges, num_partitions=args.owners)
                out = rd.from_pandas(nf)
                info = {"d_eff": d_eff, "sweeps": int(nf["t"].iloc[-1])}
            elif args.op == "harmonic":
                from .graph.hyperball import harmonic_centrality
                out = harmonic_centrality(
                    edges, num_partitions=args.owners).materialize()
                info = {"vertices": out.count()}
            elif args.op == "sssp":
                from .graph.engine import sssp_distances
                graph = ShardedGraph.build(edges, num_owners=args.owners,
                                           weight_col=args.weight_col)
                out, info = sssp_distances(graph, args.source, **kw)
                out = out.materialize()
                graph.shutdown()
            elif args.op == "salsa":
                from .graph.engine import salsa as _salsa
                out, info = _salsa(edges, num_owners=args.owners, **kw)
            elif args.op == "hits":
                out, info = hits(edges, num_owners=args.owners, **kw)
            elif args.op == "bowtie":
                from .graph.bowtie import bowtie_regions
                out = bowtie_regions(edges, num_owners=args.owners,
                                     num_partitions=args.owners)
                out = out.materialize()
                info = {"regions": out.count()}
            elif args.op == "modularity":
                from .graph.engine import label_propagation as _lp
                from .graph.modularity import community_modularity
                und0 = canonical_undirected(edges, args.owners).map_batches(
                    lambda t: pa.Table.from_arrays(
                        [t["u"].combine_chunks(), t["v"].combine_chunks()],
                        names=["src", "dst"]),
                    batch_format="pyarrow")
                graph = ShardedGraph.build(und0, num_owners=args.owners,
                                           undirected=True)
                labels, _ = _lp(graph, **kw)
                labels = labels.materialize()
                graph.shutdown()
                out = community_modularity(
                    edges, labels, num_partitions=args.owners).materialize()
                info = {"communities": out.count()}
            elif args.op == "scc":
                from .graph.engine import strongly_connected_components
                out, info = strongly_connected_components(
                    edges, num_owners=args.owners)
            elif args.op == "bfs":
                graph = ShardedGraph.build(edges, num_owners=args.owners)
                out, info = bfs_distances(graph, args.source, **kw)
                out = out.materialize()
                graph.shutdown()
            else:   # undirected fixpoint ops
                und = canonical_undirected(edges, args.owners).map_batches(
                    lambda t: pa.Table.from_arrays(
                        [t["u"].combine_chunks(), t["v"].combine_chunks()],
                        names=["src", "dst"]),
                    batch_format="pyarrow")
                graph = ShardedGraph.build(und, num_owners=args.owners,
                                           undirected=True)
                fn = {"cc": connected_components, "lp": label_propagation,
                      "kcore": lambda gg, **k2: k_core(gg, args.k, **k2)}
                out, info = fn[args.op](graph, **kw)
                out = out.materialize()
                graph.shutdown()
            out.write_parquet(os.path.join(args.out, args.op))
            print(json.dumps({"op": args.op, **info}))
        else:
            from .graph.engine import ShardedGraph, pagerank
            from .sources.writers import write_rank_report
            if args.edges.endswith(".txt"):
                from .sources.readers import read_edge_txt
                edges = read_edge_txt(args.edges)
                if args.weight_col:
                    raise SystemExit("--weight-col needs parquet edges")
            else:
                from .sources.readers import read_edges_parquet
                edges = read_edges_parquet(args.edges,
                                           weight_col=args.weight_col)
            graph = ShardedGraph.build(edges, num_owners=args.owners,
                                       weight_col=args.weight_col)
            personalization = None
            if args.seeds:
                import numpy as np
                vids = np.array([int(s) for s in args.seeds.split(",")],
                                dtype=np.int64)
                personalization = (vids, np.full(len(vids), 1.0 / len(vids)))
            os.makedirs(args.out, exist_ok=True)
            ranks, info = pagerank(
                graph, alpha=args.damping, tol=args.tol,
                max_iter=args.max_iter, dangling_mode=args.dangling_mode,
                personalization=personalization,
                checkpoint_dir=os.path.join(args.out, "checkpoints"),
                resume=args.resume)
            ranks.write_parquet(os.path.join(args.out, "ranks"))
            dangling = sum(m["dangling"] for m in
                           ray.get([ow.finalize_build.remote()
                                    for ow in graph.owners]))
            write_rank_report(ranks, os.path.join(args.out, "report.txt"),
                              n=graph.n, m=graph.m, dangling_count=dangling,
                              top_k=args.top_k)
            graph.shutdown()
            print(json.dumps(info))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
