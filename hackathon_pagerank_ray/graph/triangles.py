"""Per-vertex triangle counting as Dataset ops (north_rule mandate).

Degree-oriented wedge join (the standard distributed algorithm):

1. canonicalize to the undirected simple graph (``u < v``, dedup,
   self-loops dropped),
2. orient each edge low→high by ``(degree, vid)`` — bounds every oriented
   adjacency list by O(√m), so no wedge group explodes on hub vertices
   (this is the skew handling),
3. per-source wedge generation inside ``map_groups`` (numpy
   ``triu_indices``), and
4. a hash join of wedges against the oriented edge set on the closing pair
   — each match is one triangle, counted for all three corners.

Exact; matches ``oracle.triangle_counts`` by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.relational import distinct, inner_join, left_join_coalesce
from ..stages.schema_util import drop_empty_blocks, enforce_schema

_WEDGE_SCHEMA = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.int64()),
                           pa.field("c", pa.int64())])
_CLOSE_SCHEMA = pa.schema([pa.field("b", pa.int64()), pa.field("c", pa.int64())])
_CORNER_SCHEMA = pa.schema([pa.field("vid", pa.int64())])


def segment_pairs(lengths: np.ndarray, want_groups: bool = False):
    """All within-group unordered pairs over contiguous groups — the
    vectorized segmented ``triu_indices``.

    Given group ``lengths`` describing consecutive segments of a flat
    array of ``lengths.sum()`` elements, return ``(left, right, grp)``:
    GLOBAL element indices of every within-group pair with local i < j,
    plus (when ``want_groups``) each pair's group index, else None.
    Pure run-length arithmetic — no per-group Python loop, so a task
    over 100k+ small groups stays in numpy instead of interpreting 100k
    loop bodies.  Indices come back int32 when they fit (they do until a
    single task holds 2^31 elements) — pair arrays dominate the task's
    memory, and on lazily-paged hosts first-touch bytes are the cost.
    """
    from ..state.alloc import tune_allocator
    tune_allocator()   # pair expansion is allocation-heavy; see alloc.py
    lengths = np.asarray(lengths, dtype=np.int64)
    total = int(lengths.sum())
    idx_t = np.int32 if total < 2 ** 31 else np.int64
    empty = np.empty(0, dtype=idx_t)
    if total == 0:
        return empty, empty, (empty if want_groups else None)
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    pos = np.arange(total, dtype=idx_t) - np.repeat(starts.astype(idx_t),
                                                    lengths)
    cnt = np.repeat(lengths.astype(idx_t), lengths) - 1 - pos
    npairs = int(cnt.sum(dtype=np.int64))
    if npairs == 0:
        return empty, empty, (empty if want_groups else None)
    left = np.repeat(np.arange(total, dtype=idx_t), cnt)
    cstart = np.concatenate(([0], np.cumsum(cnt, dtype=np.int64)[:-1]))
    pair_t = np.int32 if (npairs < 2 ** 31 and total < 2 ** 31) else np.int64
    right = np.arange(npairs, dtype=pair_t)
    right -= np.repeat(cstart.astype(pair_t), cnt)   # now the local offset
    right += left
    right += 1
    grp = None
    if want_groups:
        grp_t = np.int32 if len(lengths) < 2 ** 31 else np.int64
        grp = np.repeat(np.arange(len(lengths), dtype=grp_t),
                        lengths * (lengths - 1) // 2)
    return left, right, grp


def canonical_undirected(edges_ds, num_partitions: int = 16):
    """(src,dst) digraph → unique undirected simple edges (u < v)."""
    def _canon(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["src"], t["dst"])
        t = t.filter(keep)
        u = pc.min_element_wise(t["src"], t["dst"])
        v = pc.max_element_wise(t["src"], t["dst"])
        return pa.Table.from_arrays([u, v], names=["u", "v"])

    return distinct(edges_ds.map_batches(_canon, batch_format="pyarrow"),
                    ["u", "v"], num_partitions)


def undirected_degrees(und_ds):
    both = und_ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [pa.concat_arrays([t["u"].combine_chunks(),
                               t["v"].combine_chunks()])], names=["vid"]),
        batch_format="pyarrow")
    return both.groupby("vid").count().rename_columns({"count()": "deg"})


def _triangle_counts_small(df: pd.DataFrame) -> pd.DataFrame:
    """Exact single-task path: same algorithm (canonicalize → degree-orient
    → wedge → close), fully vectorized with packed-int64 edge keys.  Used
    below when the edge table is small enough that the ~7 distributed
    shuffles' fixed spin-up would dominate."""
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    keep = src != dst
    u = np.minimum(src[keep], dst[keep]).astype(np.int64)
    v = np.maximum(src[keep], dst[keep]).astype(np.int64)
    if len(u) == 0:
        return pd.DataFrame({"vid": pd.Series(dtype="int64"),
                             "triangles": pd.Series(dtype="int64")})
    packed = np.unique((u << 32) | v)            # vids < 2^31 by caller
    u, v = packed >> 32, packed & 0xFFFFFFFF
    n = int(v.max()) + 1
    deg = np.bincount(u, minlength=n) + np.bincount(v, minlength=n)
    fwd = (deg[u] < deg[v]) | ((deg[u] == deg[v]) & (u < v))
    a = np.where(fwd, u, v)
    b = np.where(fwd, v, u)
    order = np.lexsort((b, deg[b], a))
    a, b = a[order], b[order]
    boundary = np.ones(len(a), dtype=bool)
    boundary[1:] = a[1:] != a[:-1]
    gs = np.flatnonzero(boundary)
    ge = np.append(gs[1:], len(a))
    li, ri, _ = segment_pairs(ge - gs)
    counts = np.zeros(n, dtype=np.int64)
    if len(li):
        wa, wb, wc = a[li], b[li], b[ri]
        del li, ri
        ecode = np.sort((a << 32) | b)
        wcode = (wb << 32) | wc
        pos = np.minimum(np.searchsorted(ecode, wcode), len(ecode) - 1)
        closed = ecode[pos] == wcode
        del wcode, pos
        counts = (np.bincount(wa[closed], minlength=n)
                  + np.bincount(wb[closed], minlength=n)
                  + np.bincount(wc[closed], minlength=n))
    vids = np.flatnonzero(counts)
    return pd.DataFrame({"vid": vids, "triangles": counts[vids]})


def triangle_counts(edges_ds, vertices_ds=None, num_partitions: int = 16,
                    small_threshold: int = 5_000_000):
    """Per-vertex triangle counts ``(vid, triangles)``.

    ``vertices_ds`` (optional, column ``vid``) fixes the output universe so
    triangle-free vertices appear with count 0; otherwise only vertices
    incident to at least one undirected edge appear.

    Adaptive: edge tables under ``small_threshold`` rows run the identical
    algorithm in one vectorized task (the distributed plan is ~7 hash
    shuffles whose fixed spin-up dwarfs small inputs); the distributed
    wedge-join below is the shape at scale.
    """
    n_raw = edges_ds.count()           # streaming pass, nothing pinned
    if n_raw <= small_threshold:
        edges_ds = edges_ds.materialize()   # bounded by the gate
        mx = edges_ds.max(["src", "dst"]) if n_raw else None
        max_id = (max(mx["max(src)"], mx["max(dst)"]) if mx else 0) or 0
        if max_id < 2 ** 31:
            counts = drop_empty_blocks(edges_ds.repartition(1).map_batches(
                _triangle_counts_small, batch_format="pandas",
                batch_size=None))
            if vertices_ds is not None:
                out = left_join_coalesce(
                    vertices_ds.select_columns(["vid"]), counts, on="vid",
                    fill={"triangles": 0}, num_partitions=num_partitions)
                return out.map_batches(
                    lambda t: t.set_column(
                        t.schema.get_field_index("triangles"), "triangles",
                        pc.cast(t["triangles"], pa.int64())),
                    batch_format="pyarrow")
            return counts

    und = canonical_undirected(edges_ds, num_partitions).materialize()
    deg = undirected_degrees(und)

    d_u = deg.rename_columns({"vid": "u", "deg": "deg_u"})
    d_v = deg.rename_columns({"vid": "v", "deg": "deg_v"})
    withdeg = inner_join(inner_join(und, d_u, on="u",
                                    num_partitions=num_partitions),
                         d_v, on="v", num_partitions=num_partitions)

    # orient low (deg, vid) → high (deg, vid)
    def _orient(t: pa.Table) -> pa.Table:
        u = np.asarray(t["u"])
        v = np.asarray(t["v"])
        du = np.asarray(t["deg_u"])
        dv = np.asarray(t["deg_v"])
        fwd = (du < dv) | ((du == dv) & (u < v))
        a = np.where(fwd, u, v)
        b = np.where(fwd, v, u)
        db = np.where(fwd, dv, du)
        return pa.Table.from_arrays(
            [pa.array(a), pa.array(b), pa.array(db)],
            names=["a", "b", "deg_b"])

    oriented = drop_empty_blocks(
        withdeg.map_batches(_orient, batch_format="pyarrow"))

    # wedges: for each a, all (b, c) pairs of its oriented neighbors with
    # b before c in (deg, vid) order — so (b, c) is itself oriented and can
    # close only via the oriented edge b→c
    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"), "b": pd.Series(dtype="int64"), "c": pd.Series(dtype="int64")})
        g = g.sort_values(["deg_b", "b"], kind="stable")
        nb = g["b"].to_numpy()
        i, j = np.triu_indices(len(nb), k=1)
        return pd.DataFrame({"a": np.full(len(i), g["a"].iloc[0]),
                             "b": nb[i], "c": nb[j]})

    wedges = drop_empty_blocks(enforce_schema(
        oriented.groupby("a").map_groups(_wedges, batch_format="pandas"),
        _WEDGE_SCHEMA))

    # fresh projection (rename a→b, b→c would collide with existing names)
    closing = enforce_schema(oriented.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()],
            names=["b", "c"]),
        batch_format="pyarrow"), _CLOSE_SCHEMA)
    tris = inner_join(wedges, closing, on=("b", "c"),
                      num_partitions=num_partitions)

    def _corners(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return _CORNER_SCHEMA.empty_table()
        return pa.Table.from_arrays(
            [pa.concat_arrays([t["a"].combine_chunks().cast(pa.int64()),
                               t["b"].combine_chunks().cast(pa.int64()),
                               t["c"].combine_chunks().cast(pa.int64())])],
            names=["vid"])

    counts = (tris.map_batches(_corners, batch_format="pyarrow")
              .groupby("vid").count()
              .rename_columns({"count()": "triangles"}))

    if vertices_ds is not None:
        # result-sized; materializing sidesteps an Acero planning failure
        # when the full lazy diamond feeds the final outer join
        counts = drop_empty_blocks(counts)
        out = left_join_coalesce(vertices_ds.select_columns(["vid"]), counts,
                                 on="vid", fill={"triangles": 0},
                                 num_partitions=num_partitions)
        def _cast(t: pa.Table) -> pa.Table:
            i = t.schema.get_field_index("triangles")
            return t.set_column(i, "triangles", pc.cast(t["triangles"], pa.int64()))
        return out.map_batches(_cast, batch_format="pyarrow")
    return counts


def _lcc_small(df: pd.DataFrame) -> pd.DataFrame:
    """Single-task path: canonical degrees + triangle counts + lcc in one
    vectorized pass (same adaptive rationale as _triangle_counts_small)."""
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    keep = src != dst
    u = np.minimum(src[keep], dst[keep]).astype(np.int64)
    v = np.maximum(src[keep], dst[keep]).astype(np.int64)
    if len(u) == 0:
        return pd.DataFrame({"vid": pd.Series(dtype="int64"),
                             "deg": pd.Series(dtype="int64"),
                             "triangles": pd.Series(dtype="int64"),
                             "lcc": pd.Series(dtype="float64")})
    packed = np.unique((u << 32) | v)
    u, v = packed >> 32, packed & 0xFFFFFFFF
    n = int(v.max()) + 1
    deg = np.bincount(u, minlength=n) + np.bincount(v, minlength=n)
    tri_df = _triangle_counts_small(df)
    tri = np.zeros(n, dtype=np.int64)
    tri[tri_df["vid"].to_numpy()] = tri_df["triangles"].to_numpy()
    vids = np.flatnonzero(deg)
    d = deg[vids].astype(np.float64)
    denom = d * (d - 1.0)
    lcc = np.divide(2.0 * tri[vids], denom, out=np.zeros(len(vids)),
                    where=denom > 0)
    return pd.DataFrame({"vid": vids, "deg": deg[vids],
                         "triangles": tri[vids], "lcc": lcc})


def clustering_coefficient(edges_ds, num_partitions: int = 16,
                           small_threshold: int = 5_000_000):
    """Local clustering coefficient per vertex on the undirected simple
    graph: ``lcc(v) = 2·T(v) / (deg(v)·(deg(v)−1))`` (0 when deg < 2).

    Canonicalizes once, reuses :func:`triangle_counts` for T(v) and
    :func:`undirected_degrees` for deg(v) — one extra hash join over the
    triangle pipeline.  Returns ``(vid, deg, triangles, lcc)`` for every
    vertex incident to at least one undirected edge.  Adaptive like
    :func:`triangle_counts`: small edge tables run one vectorized task.
    """
    n_raw = edges_ds.count()           # streaming pass, nothing pinned
    if n_raw <= small_threshold:
        edges_ds = edges_ds.materialize()   # bounded by the gate
        mx = edges_ds.max(["src", "dst"]) if n_raw else None
        max_id = (max(mx["max(src)"], mx["max(dst)"]) if mx else 0) or 0
        if max_id < 2 ** 31:
            return drop_empty_blocks(edges_ds.repartition(1).map_batches(
                _lcc_small, batch_format="pandas", batch_size=None))

    und = canonical_undirected(edges_ds, num_partitions).materialize()
    deg = undirected_degrees(und)
    as_digraph = und.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["u"].combine_chunks(), t["v"].combine_chunks()],
            names=["src", "dst"]),
        batch_format="pyarrow")
    tris = drop_empty_blocks(
        triangle_counts(as_digraph, num_partitions=num_partitions))
    out = left_join_coalesce(deg, tris, on="vid", fill={"triangles": 0},
                             num_partitions=num_partitions)

    def _lcc(t: pa.Table) -> pa.Table:
        d = np.asarray(t["deg"], dtype=np.float64)
        tr = np.asarray(t["triangles"], dtype=np.float64)
        denom = d * (d - 1.0)
        lcc = np.divide(2.0 * tr, denom, out=np.zeros(len(d)),
                        where=denom > 0)
        return pa.Table.from_arrays(
            [t["vid"].combine_chunks().cast(pa.int64()),
             t["deg"].combine_chunks().cast(pa.int64()),
             t["triangles"].combine_chunks().cast(pa.int64()),
             pa.array(lcc, pa.float64())],
            names=["vid", "deg", "triangles", "lcc"])

    return out.map_batches(_lcc, batch_format="pyarrow")


def transitivity_ratio(edges_ds, num_partitions: int = 16,
                       small_threshold: int = 5_000_000):
    """Global transitivity (Newman–Watts–Strogatz): ONE row
    ``(wedges, triangles, transitivity)`` with transitivity =
    3·triangles / wedges over the canonical undirected simple graph
    (0.0 when wedge-free).  The corpus-level companion to the
    per-vertex `clustering_coefficient` — exact integer wedge and
    triangle counts, ONE float division shared with the SQL twin.

    Plan: wedges = Σ C(deg, 2) from one degree count (per-row int64
    partials, d < 2^31 keeps d·(d−1)/2 in range); the triangle total
    reuses `triangle_counts` (per-vertex counts sum to exactly 3T).
    """
    import ray

    und = canonical_undirected(edges_ds, num_partitions).materialize()
    if und.count() == 0:
        return ray.data.from_arrow(pa.table({
            "wedges": pa.array([0], pa.int64()),
            "triangles": pa.array([0], pa.int64()),
            "transitivity": pa.array([0.0], pa.float64())}))

    def _wedge_partial(t: pa.Table) -> pa.Table:
        d = np.asarray(t["deg"], dtype=np.int64)
        return pa.table({"w": pa.array(d * (d - 1) // 2, pa.int64())})

    wedges = int(drop_empty_blocks(undirected_degrees(und))
                 .map_batches(_wedge_partial, batch_format="pyarrow")
                 .sum("w") or 0)
    tsum = int(triangle_counts(
        edges_ds, num_partitions=num_partitions,
        small_threshold=small_threshold).sum("triangles") or 0)  # == 3T
    return ray.data.from_arrow(pa.table({
        "wedges": pa.array([wedges], pa.int64()),
        "triangles": pa.array([tsum // 3], pa.int64()),
        "transitivity": pa.array(
            [float(tsum) / wedges if wedges else 0.0], pa.float64())}))
