"""Sources (SURVEY.md S1–S3, S10).

The engine's canonical input is the Common-Crawl-style Parquet page table
(BASELINE.json input_hint); ``read_edge_txt`` keeps compatibility with the
reference's ``"src dst"`` text format (backend/cuda/pagerank_gpu.cu:41-57)
and ``api/test.txt``-style uploads (api/main.py:313-327).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

PAGE_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_pages(path, columns: list[str] | None = None, **kw):
    """Page-table reader with column pruning at the read — a pipeline that
    only parses html never lifts the ``text`` column off storage."""
    return rd.read_parquet(path, columns=columns or PAGE_COLUMNS, **kw)


def read_edges_parquet(path, weight_col: str | None = None, **kw):
    cols = ["src", "dst"] + ([weight_col] if weight_col else [])
    return rd.read_parquet(path, columns=cols, **kw)


def read_edge_txt(path):
    """Whitespace ``"src dst"`` lines → (src:int64, dst:int64) Dataset."""
    def _parse(batch: pa.Table) -> pa.Table:
        import numpy as np
        src, dst = [], []
        for line in batch["text"].to_pylist():
            parts = line.split()
            if len(parts) >= 2:
                src.append(int(parts[0]))
                dst.append(int(parts[1]))
        return pa.Table.from_arrays(
            [pa.array(src, pa.int64()), pa.array(dst, pa.int64())],
            names=["src", "dst"])

    return rd.read_text(path).map_batches(_parse, batch_format="pyarrow")


def read_jsonl(path, **kw):
    """JSON-lines reader (S-family extension): Ray's native ``read_json``
    handles .jsonl / .json line-delimited files with block-parallel
    parsing; schema is unified from the sampled blocks."""
    return rd.read_json(path, **kw)
