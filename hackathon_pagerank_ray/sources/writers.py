"""Sinks with reference-format compatibility (SURVEY.md S4–S9).

Parquet is the engine's canonical format; these writers/parsers exist for
drop-in parity with the reference's text artifacts:

* ``edges.txt`` — ``"src dst"`` lines (crawler/crawl.py:73-75)
* ``edges.csv`` — header ``source,target_id`` (crawler/crawl.py:60-71)
* rank text report — summary + ``"  node <id> : <score>"`` 10-decimal lines
  (backend/cuda/pagerank_gpu.cu:413-446)
* rank report parser — the regex round-trip (api/main.py:40,
  backend/data/parse_pagerank.py:6)
* ``pagerank.json`` — ``[{id, url, score}]`` renormalized + sorted desc
  (backend/data/parse_pagerank.py:51-68)
"""

from __future__ import annotations

import json
import re

RANK_LINE_RE = re.compile(r"node\s+(\d+)\s*:\s*([0-9.eE+-]+)")


def write_edges_txt(edges_ds, path: str) -> int:
    """Streaming write of ``"src dst"`` lines; returns edge count."""
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        for batch in edges_ds.iter_batches(batch_size=65536,
                                           batch_format="pyarrow"):
            src = batch["src"].to_pylist()
            dst = batch["dst"].to_pylist()
            f.writelines(f"{u} {v}\n" for u, v in zip(src, dst))
            n += len(src)
    return n


def write_edges_csv(edges_url_ds, vertices_ds, path: str,
                    num_partitions: int = 8) -> int:
    """Debug CSV with url source + int target id — the reference's mixed
    format (crawler/crawl.py:63-71)."""
    from ..stages.ids import edges_to_ids  # noqa: F401  (shape reference)
    from ..stages.relational import inner_join
    v_dst = vertices_ds.rename_columns({"vid": "target_id",
                                        "url": "dst_url"})
    joined = inner_join(edges_url_ds, v_dst, on="dst_url",
                        num_partitions=num_partitions)
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write("source,target_id\n")
        for batch in joined.iter_batches(batch_size=65536,
                                         batch_format="pyarrow"):
            srcs = batch["src_url"].to_pylist()
            tids = batch["target_id"].to_pylist()
            f.writelines(f"{s},{t}\n" for s, t in zip(srcs, tids))
            n += len(srcs)
    return n


def write_rank_report(ranks_ds, path: str, n: int, m: int,
                      dangling_count: int, top_k: int = 10) -> None:
    """The reference's text report, byte-format compatible
    (backend/cuda/pagerank_gpu.cu:420-443)."""
    from ..stages.relational import topk
    top_k = min(top_k, n)
    top = topk(ranks_ds, ["rank", "vid"], top_k,
               descending=[True, False]).to_pandas()
    with open(path, "w", encoding="utf-8") as f:
        f.write("Graph summary:\n")
        f.write(f"  N (nodes) : {n}\n")
        f.write(f"  M (edges) : {m}\n")
        f.write(f"  Dangling nodes: {dangling_count}\n\n")
        f.write(f"Top {top_k} nodes by PageRank:\n")
        for _, row in top.iterrows():
            f.write(f"  node {int(row['vid'])} : {row['rank']:.10f}\n")


def parse_rank_report(path: str) -> list[tuple[int, float]]:
    """Regex parse of the text report (S8 semantics:
    backend/data/parse_pagerank.py:28-37)."""
    out = []
    with open(path, encoding="utf-8") as f:
        for line in f:
            m = RANK_LINE_RE.search(line)
            if m:
                out.append((int(m.group(1)), float(m.group(2))))
    return out


def write_pagerank_json(ranks_ds, vertices_ds, path: str,
                        num_partitions: int = 8) -> int:
    """``pagerank.json`` shape: inner-join urls (drop rank rows without a
    url), renormalize over the KEPT rows, sort desc
    (backend/data/parse_pagerank.py:43-68)."""
    from ..stages.relational import inner_join, sum_normalize
    joined = inner_join(ranks_ds, vertices_ds, on="vid",
                        num_partitions=num_partitions)
    joined = sum_normalize(joined, "rank").materialize()
    ordered = joined.sort(["rank", "vid"], descending=[True, False])
    # stream the sorted table — the artifact IS the whole ranked table
    # (backend/data/parse_pagerank.py:51-68), so the writer must not hold
    # it in a driver list
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        f.write("[")
        for batch in ordered.iter_batches(batch_size=65536,
                                          batch_format="pyarrow"):
            vids = batch["vid"].to_pylist()
            urls = batch["url"].to_pylist()
            scores = batch["rank"].to_pylist()
            for vid, url, score in zip(vids, urls, scores):
                prefix = ",\n  " if n else "\n  "
                f.write(prefix + json.dumps(
                    {"id": int(vid), "url": url, "score": float(score)},
                    ensure_ascii=False))
                n += 1
        f.write("\n]")
    return n


def write_jsonl(ds, path: str) -> None:
    """JSON-lines sink: one file per block under ``path`` (directory),
    streaming — resumable at block granularity like the parquet sinks."""
    ds.write_json(path)
