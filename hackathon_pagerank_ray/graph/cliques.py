"""Global 4-clique census over the undirected simple graph.

Completes the motif family next to `triangles.triangle_counts` (odd
cycles) and `rectangles.rectangle_count` (even cycles): the K4 count is
the strongest small-motif cohesion signal — link farms and copy rings
show up as clique-dense blocks (Chiba & Nishizeki's arboricity listing
is the classic sequential algorithm; the anchoring below is its
groupby restatement).

Counting identity (exact, each clique once): a 4-clique a<b<c<d is
anchored at its two LOWEST vertices (a, b) — list triangles sorted
(x<y<z), group them by (x, y), pair-expand the z's of each group, and
keep pairs (z1 < z2) that are themselves edges:

    K4 = |{((x,y), z1<z2) : (x,y,z1), (x,y,z2) triangles, (z1,z2) ∈ E}|

Triangles are themselves listed anchored at their minimum vertex
(center x, neighbor pairs y<z both > x, closing edge (y,z) ∈ E).

Plan: below the gate ONE worker task runs the whole census vectorized
(degree-oriented wedge enumeration, packed-code searchsorted closure —
the `truss._edge_supports` kernel shape).  Past it, two
``groupby().map_groups`` pair expansions each followed by a packed
int64 code semi-join against the broadcast-free edge-code table; the
partitioning keys are the wedge center then the (x, y) anchor — the
same keys `triangles.triangle_counts` relies on.  Wedge volume is
Σ C(deg_>(v), 2) — super-hub centers dominate; at web scale pre-filter
or cap hub centers (the same documented skew knob as
`linkpred.common_neighbors_topk`); the exact uncapped mode is what the
SQL oracle checks.  Requires vids < 2^31 (packed-code bound, gated).

Reference scope note: the reference has no motif-census surface
(SURVEY.md §2 addenda).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

_CAND_SCHEMA = pa.schema([("x", pa.int64()), ("code", pa.int64())])


def _census_small(df: pd.DataFrame) -> pd.DataFrame:
    """Whole census in one vectorized task: oriented closed-wedge
    triangle listing, then (x, y)-anchored z-pair closure."""
    from .triangles import segment_pairs

    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    keep = src != dst
    u = np.minimum(src[keep], dst[keep]).astype(np.int64)
    v = np.maximum(src[keep], dst[keep]).astype(np.int64)
    zero = pd.DataFrame({"triangles": pd.Series([0], dtype="int64"),
                         "four_cliques": pd.Series([0], dtype="int64")})
    if len(u) == 0:
        return zero
    # densify ids BEFORE any O(max_id) structure (ADVICE r3: sparse
    # 31-bit vids would make the degree bincount a multi-GB allocation);
    # searchsorted relabeling is monotone, so orientation tie-breaks by
    # vid order and the packed-edge binary search are unaffected
    verts = np.unique(np.concatenate([u, v]))
    u = np.searchsorted(verts, u).astype(np.int64)
    v = np.searchsorted(verts, v).astype(np.int64)
    ecode = np.unique((u << 32) | v)
    u, v = ecode >> 32, ecode & 0xFFFFFFFF
    n = int(v.max()) + 1
    deg = np.bincount(u, minlength=n) + np.bincount(v, minlength=n)
    fwd = (deg[u] < deg[v]) | ((deg[u] == deg[v]) & (u < v))
    a = np.where(fwd, u, v)
    b = np.where(fwd, v, u)
    order = np.lexsort((b, deg[b], a))
    a, b = a[order], b[order]
    starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
    li, ri, _ = segment_pairs(np.diff(np.r_[starts, len(a)]))
    if not len(li):
        return zero
    wa, wb, wc = a[li], b[li], b[ri]
    lo = np.minimum(wb, wc)
    hi = np.maximum(wb, wc)
    pos = np.minimum(np.searchsorted(ecode, (lo << 32) | hi),
                     len(ecode) - 1)
    closed = ecode[pos] == ((lo << 32) | hi)
    t1, t2, t3 = wa[closed], lo[closed], hi[closed]   # t2 < t3
    x = np.minimum(t1, t2)
    z = np.maximum(t1, t3)
    y = t1 + t2 + t3 - x - z
    n_tri = len(x)
    if n_tri == 0:
        return pd.DataFrame({"triangles": pd.Series([0], dtype="int64"),
                             "four_cliques": pd.Series([0], dtype="int64")})
    # group sorted triangles by the (x, y) anchor, pair-expand the z's
    axy = (x << 32) | y
    order = np.lexsort((z, axy))
    axy, z = axy[order], z[order]
    astarts = np.flatnonzero(np.r_[True, axy[1:] != axy[:-1]])
    li2, ri2, _ = segment_pairs(np.diff(np.r_[astarts, n_tri]))
    k4 = 0
    if len(li2):
        ccode = (z[li2] << 32) | z[ri2]               # z sorted per group
        p = np.minimum(np.searchsorted(ecode, ccode), len(ecode) - 1)
        k4 = int((ecode[p] == ccode).sum())
    return pd.DataFrame({"triangles": pd.Series([n_tri], dtype="int64"),
                         "four_cliques": pd.Series([k4], dtype="int64")})


def clique4_census(edges_ds, num_partitions: int = 16,
                   small_threshold: int = 3_000_000):
    """ONE row ``(triangles, four_cliques)``: the exact global triangle
    and 4-clique counts of the canonical undirected simple graph."""
    import ray

    from ..stages.relational import semi_join
    from ..stages.schema_util import drop_empty_blocks, enforce_schema
    from .linkpred import _symmetrize
    from .triangles import canonical_undirected, segment_pairs

    n_raw = edges_ds.count()           # streaming pass, nothing pinned
    if n_raw == 0:                     # map_batches never runs on 0 rows
        return ray.data.from_arrow(pa.table({
            "triangles": pa.array([0], pa.int64()),
            "four_cliques": pa.array([0], pa.int64())}))
    if n_raw <= small_threshold:
        edges_ds = edges_ds.materialize()   # bounded by the gate
        mx = edges_ds.max(["src", "dst"]) if n_raw else None
        max_id = (max(mx["max(src)"], mx["max(dst)"]) if mx else 0) or 0
        if max_id < 2 ** 31:
            return drop_empty_blocks(edges_ds.repartition(1).map_batches(
                _census_small, batch_format="pandas", batch_size=None))

    und = canonical_undirected(edges_ds, num_partitions).materialize()

    def _codes(t: pa.Table) -> pa.Table:
        uu = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        vv = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        assert len(vv) == 0 or vv.max() < 2 ** 31, \
            "clique4_census packed-code bound: vid >= 2^31"
        return pa.table({"code": pa.array((uu << 32) | vv, pa.int64())})

    ecodes = und.map_batches(_codes, batch_format="pyarrow").materialize()
    nbr = und.map_batches(_symmetrize, batch_format="pyarrow")

    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        # neighbors above the center: each triangle anchored at its min
        c = int(g["a"].iloc[0])
        nb = np.sort(g["b"].to_numpy(dtype=np.int64))
        nb = nb[nb > c]
        if len(nb) < 2:
            return pd.DataFrame({"x": pd.Series(dtype="int64"),
                                 "code": pd.Series(dtype="int64")})
        li, ri, _ = segment_pairs(np.array([len(nb)], dtype=np.int64))
        return pd.DataFrame({
            "x": np.full(len(li), c, dtype=np.int64),
            "code": (nb[li] << np.int64(32)) | nb[ri]})

    def _zero():
        return ray.data.from_arrow(pa.table({
            "triangles": pa.array([0], pa.int64()),
            "four_cliques": pa.array([0], pa.int64())}))

    # materialize before the joins: Ray's join validates schemas eagerly
    # and a lazy map_groups has none yet (volume = the wedge table the
    # shuffle holds anyway); a fully-empty side has NO schema at all —
    # guard with an early return
    cand = drop_empty_blocks(enforce_schema(
        nbr.groupby("a").map_groups(_wedges, batch_format="pandas"),
        _CAND_SCHEMA)).materialize()
    if cand.count() == 0:
        return _zero()
    tris = semi_join(cand, ecodes, on="code",
                     num_partitions=num_partitions)
    tris = drop_empty_blocks(tris).materialize()
    n_tri = tris.count()
    if n_tri == 0:
        return _zero()

    def _zpairs(g: pd.DataFrame) -> pd.DataFrame:
        # triangles (x, y=code>>32, z=code&mask) grouped by (x, y):
        # regroup by the full anchor inside the center-keyed group
        x = g["x"].to_numpy(dtype=np.int64)
        code = g["code"].to_numpy(dtype=np.int64)
        y, z = code >> np.int64(32), code & np.int64(0xFFFFFFFF)
        axy = (x << np.int64(32)) | y      # x, y < 2^31 by the gate
        order = np.lexsort((z, axy))
        axy, z = axy[order], z[order]
        starts = np.flatnonzero(np.r_[True, axy[1:] != axy[:-1]])
        li, ri, _ = segment_pairs(np.diff(np.r_[starts, len(axy)]))
        if not len(li):
            return pd.DataFrame({"x": pd.Series(dtype="int64"),
                                 "code": pd.Series(dtype="int64")})
        return pd.DataFrame({"x": axy[li] >> np.int64(32),
                             "code": (z[li] << np.int64(32)) | z[ri]})

    zc = drop_empty_blocks(enforce_schema(
        tris.groupby("x").map_groups(_zpairs, batch_format="pandas"),
        _CAND_SCHEMA)).materialize()
    k4 = 0 if zc.count() == 0 else semi_join(
        zc, ecodes, on="code", num_partitions=num_partitions).count()
    return ray.data.from_arrow(pa.table({
        "triangles": pa.array([n_tri], pa.int64()),
        "four_cliques": pa.array([k4], pa.int64())}))
