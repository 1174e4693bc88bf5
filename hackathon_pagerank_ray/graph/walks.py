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

Scale shape: two equivalent plans, chosen by raw edge count (an upper
bound on the distinct count, so the gate is conservative).  Small side
(≤ ``broadcast_max_edges``): dedup, CSR build and every step run in
one worker task (default starts = the CSR's own uniq_src), or — with
caller-supplied starts — the CSR is built in one worker task and its
ObjectRef broadcast to a single ``map_batches`` over the starts; zero
shuffles either way.  Large side: the ranked
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


def _h32_bulk(starts: np.ndarray, t: int, vs: np.ndarray) -> np.ndarray:
    """Vectorized step hash: ``_h32(f"{s}:{t}:{v}")`` for every row —
    key strings built by Arrow kernels, md5 by the bulk DuckDB path
    that killed the round-2 sketch bottleneck (the big-endian uint64 of
    ``digest()[:8]`` shifted right 32 bits IS the first-4-bytes value
    ``_h32`` computes; parity pinned by test_random_walks' independent
    per-key hashlib replay)."""
    import pyarrow.compute as pc

    from ..stages.stats import _bulk_md5_upper_be

    keys = pc.binary_join_element_wise(
        pc.cast(pa.array(starts, pa.int64()), pa.string()),
        str(t),
        pc.cast(pa.array(vs, pa.int64()), pa.string()),
        ":")
    return (_bulk_md5_upper_be(keys)[0] >> np.uint64(32)).astype(np.int64)


def _ranked_neighbors(e, num_partitions: int):
    """(src, dst, r, deg) over an already-distinct edge dataset: the
    0-based rank of each dst within its src (ascending) and the src
    out-degree.  Only the join-per-step (large) plan needs ranks; the
    broadcast plan builds its CSR straight from (src, dst)."""

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
        idx = _h32_bulk(cur_start, t, cur_v) % deg
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

    # Small side gates on the RAW edge count (≥ distinct count, so the
    # bound is conservative): dedup, the CSR build, the default starts
    # (= distinct src, exactly uniq_src) and all the steps then run in
    # ONE worker task — the Dataset restatement of this (distinct
    # shuffle + starts shuffle + walk map_batches) paid ~3 exchange
    # floors for a 0.15 s walk at bench scale.  The count is a
    # streaming pass (nothing pinned); only a table already under the
    # gate is materialized — never the raw edge table of the big path.
    if edges_ds.count() <= broadcast_max_edges:
        refs = edges_ds.materialize().to_arrow_refs()

        def _csr(parts):
            parts = [p if isinstance(p, pa.Table)
                     else pa.Table.from_pandas(p, preserve_index=False)
                     for p in parts]
            parts = [p for p in parts if p.num_rows]
            if not parts:
                z = np.empty(0, dtype=np.int64)
                return z, np.zeros(1, dtype=np.int64), z
            tbl = pa.concat_tables(parts)
            src = tbl["src"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            dst = tbl["dst"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            order = np.lexsort((dst, src))
            src, dst = src[order], dst[order]
            keep = np.r_[True, (src[1:] != src[:-1])
                         | (dst[1:] != dst[:-1])]      # in-task distinct
            src, dst = src[keep], dst[keep]
            uniq_src, counts = np.unique(src, return_counts=True)
            indptr = np.zeros(len(uniq_src) + 1, dtype=np.int64)
            np.cumsum(counts, out=indptr[1:])
            return uniq_src, indptr, dst

        if starts_ds is None:
            @ray.remote
            def _solve(*parts):
                u, ip, nb = _csr(list(parts))
                df = _walk_local(u, steps, u, ip, nb)
                return pa.Table.from_pandas(df, preserve_index=False)

            return ray.data.from_arrow_refs([_solve.remote(*refs)])

        # caller-supplied starts: build the CSR once in a worker task,
        # broadcast the ref, stream the starts through one map_batches
        @ray.remote
        def _build(*parts):
            return _csr(list(parts))

        csr_ref = _build.remote(*refs)

        def _walk(batch: pd.DataFrame) -> pd.DataFrame:
            u, ip, nb = ray.get(csr_ref)
            return _walk_local(batch["start"].to_numpy(), steps, u, ip, nb)

        return starts_ds.map_batches(_walk, batch_format="pandas")

    if starts_ds is None:
        starts_ds = rename(distinct(edges_ds, ["src"], num_partitions),
                           {"src": "start"})

    e = distinct(edges_ds, ["src", "dst"], num_partitions).materialize()
    nbr = _ranked_neighbors(e, num_partitions).materialize()

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
                idx = (_h32_bulk(df["start"].to_numpy(), t,
                                 df["v"].to_numpy())
                       % df["deg"].to_numpy())
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
