"""Vertex-ID assignment and url→id edge mapping (SURVEY.md T2′ / J2).

The reference assigns dense ints in crawl-discovery order via a driver dict
(crawler/core.py:214-215,286-289,306-308).  Discovery order doesn't exist in
a batch corpus, so the engine uses **sort-based dense assignment**: distinct
urls → global sort → per-block offsets from cumulative block row-counts →
dense int64 vid.  Deterministic for a given url set, compact (rank vectors
stay dense arrays), and id-scheme-independent for every url-keyed output —
which is all the reference's outputs key on (backend/data/
parse_pagerank.py:51).  The cumulative-offset step is the one place the
Dataset API genuinely can't express the semantics (a global ordinal), so it
drops to small Ray tasks over the sorted blocks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from .relational import inner_join


@ray.remote
def _block_rows(table: pa.Table) -> int:
    return table.num_rows


@ray.remote
def _assign_ids(table: pa.Table, offset: int, col: str,
                col_type: pa.DataType) -> pa.Table:
    if table.num_rows == 0 or col not in table.column_names:
        # the sort emits zero-column empty blocks when there are fewer
        # distinct values than partitions — type them (with the INPUT
        # column's type, ADVICE r3: a hardcoded string here would break
        # the downstream union for non-string keys) instead of raising
        return pa.schema([("vid", pa.int64()), (col, col_type)]) \
            .empty_table()
    vids = pa.array(np.arange(offset, offset + table.num_rows, dtype=np.int64))
    return pa.Table.from_arrays([vids, table[col].combine_chunks()],
                                names=["vid", col])


def assign_vertex_ids(urls_ds, col: str = "url",
                      input_rows_hint: int | None = None,
                      small_max_rows: int = 2_000_000):
    """Distinct values of ``col`` → ``(vid: int64, url)`` with dense
    sort-ordered vids.  Shuffles once (sort doubles as the distinct's
    partitioner: we dedup per-block before and after the sort).

    When the caller knows the input is small (``input_rows_hint`` ≤
    ``small_max_rows`` — e.g. counted from already-materialized
    upstreams), the distributed groupby+sort (two all-to-all exchanges
    whose fixed cost dwarfs the work at small scale) is replaced by a
    per-block distinct + one driver-side ``np.unique`` producing the
    identical sorted-dense assignment.  Without a hint the streaming
    shuffle path runs unchanged — nothing extra is materialized at
    scale."""
    def _local_distinct(t: pa.Table) -> pa.Table:
        return t.select([col]).group_by(col).aggregate([])

    if input_rows_hint is not None and input_rows_hint <= small_max_rows:
        parts = [ray.get(r) for r in urls_ds.map_batches(
            _local_distinct, batch_format="pyarrow").to_arrow_refs()]
        vals = [p[col].to_numpy(zero_copy_only=False)
                for p in parts if p.num_rows]
        uniq = (np.unique(np.concatenate(vals)) if vals
                else np.zeros(0, dtype=np.str_))
        return ray.data.from_arrow(pa.Table.from_arrays(
            [pa.array(np.arange(len(uniq), dtype=np.int64)),
             pa.array(uniq)], names=["vid", col]))

    from ray.data.aggregate import Count
    distinct_sorted = (
        urls_ds.map_batches(_local_distinct, batch_format="pyarrow")
        .groupby(col)
        .aggregate(Count(alias_name="_n"))
        .select_columns([col])
        .sort(col)
        .materialize()
    )
    sch = distinct_sorted.schema()
    try:
        col_type = dict(zip(sch.names, sch.types))[col]
        if not isinstance(col_type, pa.DataType):
            col_type = pa.string()
    except Exception:
        col_type = pa.string()
    refs = distinct_sorted.to_arrow_refs()
    counts = ray.get([_block_rows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
    out_refs = [
        _assign_ids.remote(r, int(off), col, col_type)
        for r, off in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(out_refs)


def edges_to_ids(edges_url_ds, vertices_ds, num_partitions: int = 16,
                 broadcast_max_vertices: int = 2_000_000):
    """J2: map (src_url, dst_url) → (src, dst); edges with an unknown
    endpoint are dropped (the reference's both-sides semi-join,
    api/build_corpus.py:83-92).

    When the vertex table fits comfortably in a worker heap (≤
    ``broadcast_max_vertices`` rows) this is a classic broadcast join:
    the url→vid map is ``ray.put`` once and each edge batch maps locally
    — zero shuffles instead of two hash joins (which cost two all-to-all
    exchanges regardless of edge count).  Above the threshold it falls
    back to the two-sided hash join, the right shape when vertices are
    billions of rows."""
    n_v = vertices_ds.count()
    if n_v <= broadcast_max_vertices:
        # broadcast the SORTED (url, vid) arrays once; the sort/concat
        # runs in a WORKER task so the driver holds only the ObjectRef
        # (per-batch lookup is then a binary search — Arrow in/out)
        @ray.remote
        def _build_vmap(*parts):
            live = [p.select(["url", "vid"]) for p in parts if p.num_rows]
            if not live:
                return (np.empty(0, dtype=object),
                        np.empty(0, dtype=np.int64))
            v = pa.concat_tables(live)
            urls = v["url"].to_numpy(zero_copy_only=False)
            vids = v["vid"].to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            order = np.argsort(urls)
            return urls[order], vids[order]

        vmap_ref = _build_vmap.remote(*vertices_ds.to_arrow_refs())

        def _lookup(us, vs, keys):
            if not len(us):
                return np.full(len(keys), -1, dtype=np.int64)
            idx = np.minimum(np.searchsorted(us, keys), len(us) - 1)
            out = vs[idx]
            out[us[idx] != keys] = -1
            return out

        def _map(t: pa.Table) -> pa.Table:
            us, vs = ray.get(vmap_ref)
            src = _lookup(us, vs,
                          t["src_url"].to_numpy(zero_copy_only=False))
            dst = _lookup(us, vs,
                          t["dst_url"].to_numpy(zero_copy_only=False))
            keep = (src >= 0) & (dst >= 0)
            return pa.table({"src": pa.array(src[keep], pa.int64()),
                             "dst": pa.array(dst[keep], pa.int64())})

        return edges_url_ds.map_batches(_map, batch_format="pyarrow")
    v_src = vertices_ds.rename_columns({"vid": "src", "url": "src_url"})
    v_dst = vertices_ds.rename_columns({"vid": "dst", "url": "dst_url"})
    e = inner_join(edges_url_ds, v_src, on="src_url",
                   num_partitions=num_partitions)
    e = inner_join(e, v_dst, on="dst_url", num_partitions=num_partitions)
    return e.select_columns(["src", "dst"])
