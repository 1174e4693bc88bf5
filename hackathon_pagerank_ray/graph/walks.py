"""Deterministic random-walk generation (DeepWalk / node2vec-style
corpus sampling for graph-embedding training data).

One walk per start vertex over the distinct directed edge table.  The
step rule is fully deterministic so runs are resumable and a SQL oracle
can replay every walk bit-exactly: at step ``t`` (1-based) standing on
vertex ``v`` in the walk started at ``start``, the next vertex is

    nbrs(v)[ H(f"{start}:{t}:{v}") % outdeg(v) ]

where ``nbrs(v)`` is v's distinct out-neighbors sorted ascending and
``H`` is the big-endian integer of the first 4 bytes of md5 — the same
hash convention the HLL / count-min sketches use (stages/stats.py), so
the DuckDB twin is the documented strpos-over-hex trick.  Walks stop
early at dangling vertices (no out-edges).  Output rows are
``(start, step, v)`` with step 0 = the start vertex itself.

Scale shape: two equivalent plans, chosen by distinct-edge count.
Small side (≤ ``broadcast_max_edges``): the sorted CSR adjacency is
``ray.put`` once and a single ``map_batches`` over the start vertices
walks all steps task-locally — zero shuffles.  Large side: the ranked
neighbor table ``(src, dst, r, deg)`` is built once (one groupby) and
each step is ONE hash-partitioned inner join of the current frontier
against it plus a batch-local hash filter — ``steps`` shuffles total,
never materializing adjacency on any single node.  Both paths produce
identical rows (tested).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.relational import distinct, inner_join, rename
from ..stages.schema_util import drop_empty_blocks


def _h32(key: str) -> int:
    return int.from_bytes(hashlib.md5(key.encode()).digest()[:4], "big")


def _ranked_neighbors(edges_ds, num_partitions: int):
    """(src, dst, r, deg): distinct edges with the 0-based rank of each
    dst within its src (ascending) and the src out-degree."""
    e = distinct(edges_ds, ["src", "dst"], num_partitions)

    def _rank(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["dst"].to_numpy())
        return pd.DataFrame({
            "src": np.full(len(d), g["src"].iloc[0], dtype=np.int64),
            "dst": d.astype(np.int64),
            "r": np.arange(len(d), dtype=np.int64),
            "deg": np.full(len(d), len(d), dtype=np.int64)})

    return e.groupby("src").map_groups(_rank, batch_format="pandas")


def _walk_local(starts: np.ndarray, steps: int, uniq_src: np.ndarray,
                indptr: np.ndarray, nbrs: np.ndarray) -> pd.DataFrame:
    """Walk every start for ``steps`` steps against a local sorted-CSR
    adjacency (uniq_src sorted; nbrs sorted within each src segment)."""
    out_start, out_step, out_v = [starts.astype(np.int64)], \
        [np.zeros(len(starts), dtype=np.int64)], [starts.astype(np.int64)]
    cur_start = starts.astype(np.int64)
    cur_v = starts.astype(np.int64)
    for t in range(1, steps + 1):
        if not len(cur_v) or not len(uniq_src):
            break
        pos = np.minimum(np.searchsorted(uniq_src, cur_v),
                         len(uniq_src) - 1)
        alive = uniq_src[pos] == cur_v
        cur_start, cur_v, pos = cur_start[alive], cur_v[alive], pos[alive]
        if not len(cur_v):
            break
        deg = indptr[pos + 1] - indptr[pos]
        idx = np.fromiter(
            (_h32(f"{s}:{t}:{v}") % d
             for s, v, d in zip(cur_start, cur_v, deg)),
            dtype=np.int64, count=len(cur_v))
        cur_v = nbrs[indptr[pos] + idx]
        out_start.append(cur_start.copy())
        out_step.append(np.full(len(cur_v), t, dtype=np.int64))
        out_v.append(cur_v.copy())
    return pd.DataFrame({"start": np.concatenate(out_start),
                         "step": np.concatenate(out_step),
                         "v": np.concatenate(out_v)})


def random_walks(edges_ds, steps: int = 8, starts_ds=None,
                 num_partitions: int = 16,
                 broadcast_max_edges: int = 2_000_000):
    """(start, step, v) walk table — see module docstring for the rule.

    ``starts_ds`` defaults to the distinct source vertices of the edge
    table (column ``start``).  Adaptive plan: broadcast-CSR single pass
    under ``broadcast_max_edges`` distinct edges, join-per-step above.
    """
    import ray

    if starts_ds is None:
        starts_ds = rename(distinct(edges_ds, ["src"], num_partitions),
                           {"src": "start"})

    nbr = _ranked_neighbors(edges_ds, num_partitions).materialize()
    n_edges = nbr.count()

    if n_edges <= broadcast_max_edges:
        parts = [ray.get(r) for r in nbr.to_arrow_refs()]
        tbl = pa.concat_tables([p for p in parts if p.num_rows]) \
            if parts else pa.table({"src": pa.array([], pa.int64()),
                                    "dst": pa.array([], pa.int64())})
        src = tbl["src"].to_numpy(zero_copy_only=False)
        dst = tbl["dst"].to_numpy(zero_copy_only=False)
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        uniq_src, counts = np.unique(src, return_counts=True)
        indptr = np.zeros(len(uniq_src) + 1, dtype=np.int64)
        np.cumsum(counts, out=indptr[1:])
        csr_ref = ray.put((uniq_src, indptr, dst))

        def _walk(batch: pd.DataFrame) -> pd.DataFrame:
            u, ip, nb = ray.get(csr_ref)
            return _walk_local(batch["start"].to_numpy(), steps, u, ip, nb)

        return starts_ds.map_batches(_walk, batch_format="pandas")

    # join-per-step plan: frontier × ranked-neighbor join, hash filter
    frontier = starts_ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["start"], t["start"]], names=["start", "v"]),
        batch_format="pyarrow")
    out = [frontier.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["start"], pa.array(np.zeros(t.num_rows, dtype=np.int64)),
             t["v"]], names=["start", "step", "v"]),
        batch_format="pyarrow")]
    for t_step in range(1, steps + 1):
        j = inner_join(frontier, nbr, on="v", right_on="src",
                       num_partitions=num_partitions)

        # emit explicitly-typed Arrow (NOT pandas): an all-filtered pandas
        # batch becomes a schema-less empty block, and a join partition
        # fed only those crashes pyarrow's FieldRef lookup
        def _pick(df: pd.DataFrame, t=t_step) -> pa.Table:
            if len(df):
                idx = np.fromiter(
                    (_h32(f"{s}:{t}:{v}") % d
                     for s, v, d in zip(df["start"], df["v"], df["deg"])),
                    dtype=np.int64, count=len(df))
                keep = df["r"].to_numpy() == idx
                start = df["start"].to_numpy()[keep].astype(np.int64)
                v = df["dst"].to_numpy()[keep].astype(np.int64)
            else:
                start = v = np.empty(0, dtype=np.int64)
            return pa.table({"start": pa.array(start, pa.int64()),
                             "v": pa.array(v, pa.int64())})

        # drop_empty_blocks doubles as the per-step materialize: the join
        # emits schema-less empty blocks for empty partitions and
        # map_batches never calls the UDF on them, so they'd poison the
        # next step's join schema broadcast
        frontier = drop_empty_blocks(j.map_batches(
            _pick, batch_format="pandas"))
        out.append(frontier.map_batches(
            lambda t, ts=t_step: pa.Table.from_arrays(
                [t["start"],
                 pa.array(np.full(t.num_rows, ts, dtype=np.int64)),
                 t["v"]], names=["start", "step", "v"]),
            batch_format="pyarrow"))
        if frontier.count() == 0:
            break
    res = out[0]
    for ds in out[1:]:
        res = res.union(ds)
    return res
