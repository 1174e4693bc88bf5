"""k-truss decomposition: per-edge cohesion (the edge analogue of k-core).

The k-truss is the maximal subgraph in which every edge closes at least
k−2 triangles WITHIN the subgraph; ``truss(e)`` is the largest k whose
truss contains e (2 for triangle-free edges, k for every edge of a
k-clique).  Standard peeling: for k = 3, 4, … repeatedly delete edges
whose within-subgraph support drops below k−2 — edges deleted while
processing k have truss k−1.

Single-task path: fully vectorized rounds — support per edge comes from
the same degree-oriented wedge enumeration the triangle counter uses
(closed wedges looked up with ``searchsorted`` on packed edge codes,
supports via ``bincount`` over the three edge slots of each triangle).

Distributed path (the at-scale restatement): each peel round recomputes
per-edge support with the oriented wedge join (``groupby(a).map_groups``
pair expansion → hash join on the closing edge → per-edge count), then
filters.  Cost is O(rounds) triangle passes — the documented price of
exact truss at scale; the partitioning keys are the wedge center and the
closing edge pair, identical to ``triangles.triangle_counts``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..stages.schema_util import drop_empty_blocks, enforce_schema


def _edge_supports(u: np.ndarray, v: np.ndarray, n: int):
    """#triangles per canonical edge (u < v, unique), vectorized."""
    from .triangles import segment_pairs
    deg = np.bincount(u, minlength=n) + np.bincount(v, minlength=n)
    fwd = (deg[u] < deg[v]) | ((deg[u] == deg[v]) & (u < v))
    a = np.where(fwd, u, v)
    b = np.where(fwd, v, u)
    order = np.lexsort((b, deg[b], a))
    a, b = a[order], b[order]
    starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
    li, ri, _ = segment_pairs(np.diff(np.r_[starts, len(a)]))
    sup = np.zeros(len(u), dtype=np.int64)
    if not len(li):
        return sup
    ecode = (u << 32) | v          # sorted: packed unique canonical codes
    wa, wb, wc = a[li], b[li], b[ri]
    lo = np.minimum(wb, wc)
    hi = np.maximum(wb, wc)
    wcode = (lo << 32) | hi
    pos = np.minimum(np.searchsorted(ecode, wcode), len(ecode) - 1)
    closed = ecode[pos] == wcode
    sup = np.bincount(pos[closed], minlength=len(u)).astype(np.int64)
    # each closed wedge is one triangle: credit its other two edges too
    for x, y in ((wa[closed], wb[closed]), (wa[closed], wc[closed])):
        c = (np.minimum(x, y) << 32) | np.maximum(x, y)
        p = np.searchsorted(ecode, c)
        sup += np.bincount(p, minlength=len(u)).astype(np.int64)
    return sup


def _truss_small(df: pd.DataFrame) -> pd.DataFrame:
    empty = pd.DataFrame({"u": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64"),
                          "truss": pd.Series(dtype="int64")})
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    keep = src != dst
    u = np.minimum(src[keep], dst[keep]).astype(np.int64)
    v = np.maximum(src[keep], dst[keep]).astype(np.int64)
    if len(u) == 0:
        return empty
    packed = np.unique((u << 32) | v)
    u, v = packed >> 32, packed & 0xFFFFFFFF
    n = int(v.max()) + 1
    m = len(u)
    truss = np.full(m, 2, dtype=np.int64)
    active = np.ones(m, dtype=bool)
    k = 3
    while active.any():
        # peel everything below k-2 within the CURRENT subgraph
        while True:
            au, av = u[active], v[active]
            sup = _edge_supports(au, av, n)
            rm = sup < k - 2
            if not rm.any():
                break
            idx = np.flatnonzero(active)[rm]
            truss[idx] = k - 1
            active[idx] = False
            if not active.any():
                break
        if active.any():
            # survivors are in the k-truss; they'll fall at some k' > k
            truss[active] = k
            k += 1
    return pd.DataFrame({"u": u, "v": v, "truss": truss})


def ktruss(edges_ds, num_partitions: int = 16,
           small_threshold: int = 3_000_000):
    """Per-edge truss numbers ``(u, v, truss)`` over the undirected
    simple graph.  Adaptive single-task path under ``small_threshold``
    raw edges; distributed round-based peel above it."""
    n_raw = edges_ds.count()           # streaming pass, nothing pinned
    if n_raw <= small_threshold:
        edges_ds = edges_ds.materialize()   # bounded by the gate
        mx = edges_ds.max(["src", "dst"]) if n_raw else None
        max_id = (max(mx["max(src)"], mx["max(dst)"]) if mx else 0) or 0
        if max_id < 2 ** 31:
            return drop_empty_blocks(edges_ds.repartition(1).map_batches(
                _truss_small, batch_format="pandas", batch_size=None))

    from ..stages.relational import inner_join, left_join_coalesce, rename
    from .triangles import canonical_undirected

    und = canonical_undirected(edges_ds, num_partitions).materialize()
    # distributed peel: per round, per-edge support via the oriented
    # wedge join, then filter.  Each round is one triangle pass over the
    # surviving subgraph.
    out_levels = []
    active = und
    k = 3
    while active.count() > 0:
        while True:
            sup = _support_ds(active, num_partitions)
            withsup = left_join_coalesce(active, sup, on=("u", "v"),
                                         fill={"support": 0},
                                         num_partitions=num_partitions)
            falling = withsup.filter(
                lambda r, k=k: r["support"] < k - 2)
            n_fall = falling.count()
            if n_fall == 0:
                break
            out_levels.append(
                falling.map_batches(
                    lambda t, k=k: pa.table(
                        {"u": pa.compute.cast(t["u"], pa.int64()),
                         "v": pa.compute.cast(t["v"], pa.int64()),
                         "truss": pa.array([k - 1] * len(t), pa.int64())}),
                    batch_format="pyarrow").materialize())
            active = (withsup.filter(lambda r, k=k: r["support"] >= k - 2)
                      .select_columns(["u", "v"]).materialize())
            if active.count() == 0:
                break
        if active.count() > 0:
            k += 1
            # survivors of the final k carry truss = that k when they
            # eventually fall; loop continues until nothing is active
    import ray.data as rd
    if not out_levels:
        return drop_empty_blocks(und.map_batches(
            lambda t: pa.table({"u": t["u"], "v": t["v"],
                                "truss": pa.array([2] * len(t),
                                                  pa.int64())}),
            batch_format="pyarrow"))
    out = out_levels[0]
    for lvl in out_levels[1:]:
        out = out.union(lvl)
    return out


def _support_ds(und, num_partitions: int):
    """Per-edge triangle support as Dataset ops (oriented wedge join)."""
    import pyarrow.compute as pc

    from ..stages.relational import inner_join, rename
    from .triangles import undirected_degrees

    und = und.materialize()
    deg = undirected_degrees(und)
    d_u = rename(deg, {"vid": "u", "deg": "deg_u"})
    d_v = rename(deg, {"vid": "v", "deg": "deg_v"})
    withdeg = inner_join(inner_join(und, d_u, on="u",
                                    num_partitions=num_partitions),
                         d_v, on="v", num_partitions=num_partitions)

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

    def _wedges(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame({"a": pd.Series(dtype="int64"),
                                 "b": pd.Series(dtype="int64"),
                                 "c": pd.Series(dtype="int64")})
        g = g.sort_values(["deg_b", "b"], kind="stable")
        nb = g["b"].to_numpy()
        i, j = np.triu_indices(len(nb), k=1)
        return pd.DataFrame({"a": np.full(len(i), g["a"].iloc[0]),
                             "b": nb[i], "c": nb[j]})

    wedge_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                              ("c", pa.int64())])
    wedges = drop_empty_blocks(enforce_schema(
        oriented.groupby("a").map_groups(_wedges, batch_format="pandas"),
        wedge_schema))
    closing = enforce_schema(oriented.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["a"].combine_chunks(), t["b"].combine_chunks()],
            names=["b", "c"]),
        batch_format="pyarrow"),
        pa.schema([("b", pa.int64()), ("c", pa.int64())]))
    tris = inner_join(wedges, closing, on=("b", "c"),
                      num_partitions=num_partitions)

    def _edge_rows(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return pa.schema([("u", pa.int64()),
                              ("v", pa.int64())]).empty_table()
        a = np.asarray(t["a"], dtype=np.int64)
        b = np.asarray(t["b"], dtype=np.int64)
        c = np.asarray(t["c"], dtype=np.int64)
        x = np.concatenate([a, a, b])
        y = np.concatenate([b, c, c])
        return pa.table({"u": pa.array(np.minimum(x, y)),
                         "v": pa.array(np.maximum(x, y))})

    sup = (drop_empty_blocks(
        tris.map_batches(_edge_rows, batch_format="pyarrow"))
        .groupby(["u", "v"]).count())
    return rename(sup, {"count()": "support"})


def _truss_edges_small(df: pd.DataFrame, k: int) -> pd.DataFrame:
    """Single-task fixed-k path: peel at one k only — no full
    decomposition when the caller just wants the k-truss edge set."""
    empty = pd.DataFrame({"u": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64")})
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    keep = src != dst
    u = np.minimum(src[keep], dst[keep]).astype(np.int64)
    v = np.maximum(src[keep], dst[keep]).astype(np.int64)
    if len(u) == 0:
        return empty
    packed = np.unique((u << 32) | v)
    u, v = packed >> 32, packed & 0xFFFFFFFF
    n = int(v.max()) + 1
    active = np.ones(len(u), dtype=bool)
    while active.any():
        sup = _edge_supports(u[active], v[active], n)
        rm = sup < k - 2
        if not rm.any():
            break
        active[np.flatnonzero(active)[rm]] = False
    return pd.DataFrame({"u": u[active], "v": v[active]})


def ktruss_edges(edges_ds, k: int, num_partitions: int = 16,
                 small_threshold: int = 3_000_000):
    """Edge set of the k-truss ``(u, v)`` — fixed-k peel (cheaper than
    the full decomposition when one cohesion level is wanted)."""
    n_raw = edges_ds.count()           # streaming pass, nothing pinned
    if n_raw <= small_threshold:
        edges_ds = edges_ds.materialize()   # bounded by the gate
        mx = edges_ds.max(["src", "dst"]) if n_raw else None
        max_id = (max(mx["max(src)"], mx["max(dst)"]) if mx else 0) or 0
        if max_id < 2 ** 31:
            return drop_empty_blocks(edges_ds.repartition(1).map_batches(
                lambda d: _truss_edges_small(d, k),
                batch_format="pandas", batch_size=None))

    from ..stages.relational import left_join_coalesce
    from .triangles import canonical_undirected

    active = canonical_undirected(edges_ds, num_partitions).materialize()
    while active.count() > 0:
        sup = _support_ds(active, num_partitions)
        withsup = left_join_coalesce(active, sup, on=("u", "v"),
                                     fill={"support": 0},
                                     num_partitions=num_partitions)
        n_fall = withsup.filter(lambda r: r["support"] < k - 2).count()
        if n_fall == 0:
            break
        active = (withsup.filter(lambda r: r["support"] >= k - 2)
                  .select_columns(["u", "v"]).materialize())
    return active.map_batches(
        lambda t: pa.table({"u": pa.compute.cast(t["u"], pa.int64()),
                            "v": pa.compute.cast(t["v"], pa.int64())}),
        batch_format="pyarrow")


def edge_support(edges_ds, num_partitions: int = 16):
    """Per-edge triangle support (embeddedness) over the undirected
    simple graph: ``(u, v, support)`` where support = number of common
    neighbors of u and v — the tie-strength signal (Granovetter: low
    embeddedness = bridge-like weak tie; also the per-edge input the
    k-truss peel consumes).  One oriented wedge join, the same plan a
    single truss round runs; full edge coverage via the fill-0 join."""
    from ..stages.relational import left_join_coalesce
    from ..stages.schema_util import enforce_schema
    from .triangles import canonical_undirected

    und = canonical_undirected(edges_ds, num_partitions).materialize()
    sup = _support_ds(und, num_partitions)
    out = left_join_coalesce(und, sup, on=("u", "v"),
                             fill={"support": 0},
                             num_partitions=num_partitions)
    return drop_empty_blocks(enforce_schema(out, pa.schema(
        [("u", pa.int64()), ("v", pa.int64()),
         ("support", pa.int64())])))
