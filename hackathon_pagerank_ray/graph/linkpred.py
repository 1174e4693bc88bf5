"""Link prediction by common-neighbor counting.

Classic friends-of-friends scoring over the canonical undirected simple
graph: for every non-adjacent pair (u, v) count the vertices adjacent to
both, and return the top-k candidate edges.  The wedge enumeration is the
same per-center pair expansion the triangle counter uses, expressed as a
``groupby(center).map_groups`` so each center's neighbor list is pair-
expanded in one vectorized task and the pair counts reduce through an
ordinary hash ``groupby``.

Scale note: wedge volume is Σ deg(a)² — super-hub centers dominate it.
``max_center_degree`` caps the per-center expansion by keeping the
``cap`` lowest-vid neighbors (deterministic, so resumable and testable);
the exact mode (cap=None) is what the SQL oracle checks.  At web scale
run with a cap (boilerplate hubs carry little link-prediction signal) or
pre-filter centers by degree — the partitioning key is the center vertex
in the wedge stage and the (u, v) pair in the reduce, the same key pair
the triangle counter already relies on.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.relational import anti_join, inner_join, topk
from ..stages.schema_util import drop_empty_blocks, enforce_schema
from .triangles import canonical_undirected, segment_pairs

_PAIR_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64())])


def _canon_neighbors(df: pd.DataFrame):
    """Canonicalize raw (src, dst) in-task (packed-int64 dedup, vids < 2^31
    guaranteed by the caller's max-id gate) and return the symmetrized
    neighbor layout: ``packed`` edge codes, flat sorted ``b`` grouped by
    center, and per-center group ``lens``."""
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    keep = src != dst
    u = np.minimum(src[keep], dst[keep]).astype(np.int64)
    v = np.maximum(src[keep], dst[keep]).astype(np.int64)
    if len(u) == 0:
        return None
    packed = np.unique((u << 32) | v)
    u, v = packed >> 32, packed & 0xFFFFFFFF
    a = np.concatenate([u, v])
    b = np.concatenate([v, u])
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    starts = np.flatnonzero(np.r_[True, a[1:] != a[:-1]])
    lens = np.diff(np.r_[starts, len(a)])
    return packed, b, starts, lens


def _cn_small(df: pd.DataFrame, k: int,
              cap: int | None) -> pd.DataFrame:
    """Single-task exact path: same semantics as the distributed plan,
    fully vectorized (segmented pair expansion, no per-center loop)."""
    empty = pd.DataFrame({"u": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64"),
                          "common_neighbors": pd.Series(dtype="int64")})
    layout = _canon_neighbors(df) if len(df) else None
    if layout is None:
        return empty
    packed, b, starts, lens = layout
    if cap is not None:
        pos = np.arange(len(b), dtype=np.int64) - np.repeat(starts, lens)
        b = b[pos < cap]        # keep the cap lowest-vid neighbors
        lens = np.minimum(lens, cap)
    li, ri, _ = segment_pairs(lens)
    if len(li) == 0:
        return empty
    code = (b[li] << 32) | b[ri]
    del li, ri                      # free before the sort-heavy unique
    code, cnt = np.unique(code, return_counts=True)
    pos = np.minimum(np.searchsorted(packed, code), len(packed) - 1)
    keep = packed[pos] != code      # drop pairs already adjacent
    code, cnt = code[keep], cnt[keep]
    if len(code) > k:               # prune to the boundary before lexsort
        thresh = np.partition(cnt, len(cnt) - k)[len(cnt) - k]
        sel = cnt >= thresh
        code, cnt = code[sel], cnt[sel]
    pu, pv = code >> 32, code & 0xFFFFFFFF
    top = np.lexsort((pv, pu, -cnt))[:k]
    return pd.DataFrame({"u": pu[top], "v": pv[top],
                         "common_neighbors": cnt[top].astype(np.int64)})


def common_neighbors_topk(edges_ds, k: int = 50, num_partitions: int = 16,
                          max_center_degree: int | None = None,
                          small_threshold: int = 2_000_000):
    """Top-k non-adjacent pairs by common-neighbor count:
    ``(u, v, common_neighbors)`` with u < v, ordered by
    (count desc, u, v).

    Adaptive: raw edge tables under ``small_threshold`` rows run the
    identical algorithm in one vectorized task — including the
    canonicalization, so no distributed distinct shuffle is paid at all
    (the distributed plan is ~5 hash exchanges whose fixed spin-up
    dwarfs small inputs); the wedge-join plan below is the shape at
    scale.
    """
    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= small_threshold:
        mx = edges_ds.max(["src", "dst"]) if edges_ds.count() else None
        max_id = (max(mx["max(src)"], mx["max(dst)"]) if mx else 0) or 0
        if max_id < 2 ** 31:
            return drop_empty_blocks(edges_ds.repartition(1).map_batches(
                lambda df: _cn_small(df, k, max_center_degree),
                batch_format="pandas", batch_size=None))
    und = canonical_undirected(edges_ds, num_partitions).materialize()

    def _both(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([u, v]), pa.concat_arrays([v, u])],
            names=["a", "b"])

    nbr = und.map_batches(_both, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        b = np.sort(g["b"].to_numpy())
        if max_center_degree is not None and len(b) > max_center_degree:
            b = b[:max_center_degree]
        if len(b) < 2:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64")})
        i, j = np.triu_indices(len(b), k=1)
        return pd.DataFrame({"u": b[i], "v": b[j]})

    wedges = drop_empty_blocks(enforce_schema(
        nbr.groupby("a").map_groups(_pairs, batch_format="pandas"),
        _PAIR_SCHEMA))
    counts = (wedges.groupby(["u", "v"]).count()
              .rename_columns({"count()": "common_neighbors"}))
    fresh = anti_join(counts, und, on=("u", "v"),
                      num_partitions=num_partitions)
    return topk(fresh, ["common_neighbors", "u", "v"], k,
                descending=[True, False, False])


_AA_SCALE = 1e9
_W_SCHEMA = pa.schema([("u", pa.int64()), ("v", pa.int64()),
                       ("w", pa.int64())])


def _aa_weight(deg: int) -> int:
    """Adamic-Adar center weight 1/ln(deg), carried as a scaled int64 so
    pair scores sum exactly and the top-k boundary is deterministic
    across engines (same fixed-point trick as the scaled-cent sums)."""
    return int(round(_AA_SCALE / np.log(deg)))


def _aa_small(df: pd.DataFrame, k: int) -> pd.DataFrame:
    empty = pd.DataFrame({"u": pd.Series(dtype="int64"),
                          "v": pd.Series(dtype="int64"),
                          "aa_score": pd.Series(dtype="float64")})
    layout = _canon_neighbors(df) if len(df) else None
    if layout is None:
        return empty
    packed, b, _starts, lens = layout
    li, ri, grp = segment_pairs(lens, want_groups=True)
    if len(li) == 0:
        return empty
    aw = np.zeros(len(lens), dtype=np.int64)
    m2 = lens >= 2
    aw[m2] = np.rint(_AA_SCALE / np.log(lens[m2])).astype(np.int64)
    code = (b[li] << 32) | b[ri]
    w = aw[grp]
    del li, ri, grp                 # free before the sort-heavy unique
    uniq, inv = np.unique(code, return_inverse=True)
    del code
    score = np.bincount(inv, weights=w).astype(np.int64)
    del inv, w
    pos = np.minimum(np.searchsorted(packed, uniq), len(packed) - 1)
    keep = packed[pos] != uniq      # drop pairs already adjacent
    uniq, score = uniq[keep], score[keep]
    if len(uniq) > k:               # prune to the boundary before lexsort
        thresh = np.partition(score, len(score) - k)[len(score) - k]
        sel = score >= thresh
        uniq, score = uniq[sel], score[sel]
    pu, pv = uniq >> 32, uniq & 0xFFFFFFFF
    top = np.lexsort((pv, pu, -score))[:k]
    return pd.DataFrame({"u": pu[top], "v": pv[top],
                         "aa_score": score[top] / _AA_SCALE})


def adamic_adar_topk(edges_ds, k: int = 50, num_partitions: int = 16,
                     small_threshold: int = 2_000_000):
    """Top-k non-adjacent pairs by Adamic-Adar score
    Σ_center 1/ln(deg(center)) — common neighbors weighted down by how
    promiscuous they are.  Same adaptive shape and partitioning keys as
    :func:`common_neighbors_topk`."""
    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= small_threshold:
        mx = edges_ds.max(["src", "dst"]) if edges_ds.count() else None
        max_id = (max(mx["max(src)"], mx["max(dst)"]) if mx else 0) or 0
        if max_id < 2 ** 31:
            return drop_empty_blocks(edges_ds.repartition(1).map_batches(
                lambda df: _aa_small(df, k),
                batch_format="pandas", batch_size=None))
    und = canonical_undirected(edges_ds, num_partitions).materialize()

    def _both(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([u, v]), pa.concat_arrays([v, u])],
            names=["a", "b"])

    nbr = und.map_batches(_both, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        b = np.sort(g["b"].to_numpy())
        if len(b) < 2:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64"),
                                 "w": pd.Series(dtype="int64")})
        i, j = np.triu_indices(len(b), k=1)
        return pd.DataFrame({"u": b[i], "v": b[j],
                             "w": np.full(len(i), _aa_weight(len(b)),
                                          dtype=np.int64)})

    wedges = drop_empty_blocks(enforce_schema(
        nbr.groupby("a").map_groups(_pairs, batch_format="pandas"),
        _W_SCHEMA))
    scores = wedges.groupby(["u", "v"]).sum("w")
    fresh = anti_join(scores, und, on=("u", "v"),
                      num_partitions=num_partitions)
    top = topk(fresh, ["sum(w)", "u", "v"], k,
               descending=[True, False, False])
    return top.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["u"].combine_chunks(), t["v"].combine_chunks(),
             pc.divide(pc.cast(t["sum(w)"], pa.float64()),
                       pa.scalar(_AA_SCALE)).combine_chunks()],
            names=["u", "v", "aa_score"]),
        batch_format="pyarrow")


def jaccard_topk(edges_ds, k: int = 50, num_partitions: int = 16,
                 max_center_degree: int | None = None):
    """Top-k non-adjacent pairs by neighborhood Jaccard similarity:
    ``(u, v, jaccard)`` with u < v, jaccard = |N(u)∩N(v)| /
    |N(u)∪N(v)| over undirected distinct neighbor sets, ordered by
    (jaccard desc, u, v).

    Same wedge-join shape as :func:`common_neighbors_topk`, then the
    endpoint degrees are joined in and jaccard = cn / (du + dv − cn)
    is computed as ONE double division of exact integers — so the SQL
    twin is bit-identical and the top-k boundary can't drift on a
    float rounding difference.
    """
    from .triangles import undirected_degrees

    und = canonical_undirected(edges_ds, num_partitions).materialize()
    deg = drop_empty_blocks(undirected_degrees(und))

    def _both(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        return pa.Table.from_arrays(
            [pa.concat_arrays([u, v]), pa.concat_arrays([v, u])],
            names=["a", "b"])

    nbr = und.map_batches(_both, batch_format="pyarrow")

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        b = np.sort(g["b"].to_numpy())
        if max_center_degree is not None and len(b) > max_center_degree:
            b = b[:max_center_degree]
        if len(b) < 2:
            return pd.DataFrame({"u": pd.Series(dtype="int64"),
                                 "v": pd.Series(dtype="int64")})
        i, j = np.triu_indices(len(b), k=1)
        return pd.DataFrame({"u": b[i], "v": b[j]})

    wedges = drop_empty_blocks(enforce_schema(
        nbr.groupby("a").map_groups(_pairs, batch_format="pandas"),
        _PAIR_SCHEMA))
    counts = (wedges.groupby(["u", "v"]).count()
              .rename_columns({"count()": "cn"}))
    fresh = anti_join(counts, und, on=("u", "v"),
                      num_partitions=num_partitions)
    j = inner_join(drop_empty_blocks(fresh),
                   deg.rename_columns({"vid": "a", "deg": "du"}),
                   on="u", right_on="a", num_partitions=num_partitions)
    j = inner_join(drop_empty_blocks(j),
                   deg.rename_columns({"vid": "a", "deg": "dv"}),
                   on="v", right_on="a", num_partitions=num_partitions)

    def _jac(t: pa.Table) -> pa.Table:
        cn = pc.cast(t["cn"], pa.float64())
        union = pc.cast(pc.subtract(pc.add(t["du"], t["dv"]), t["cn"]),
                        pa.float64())
        jac = pc.divide(cn, union)
        return pa.table({
            "u": t["u"].combine_chunks().cast(pa.int64()),
            "v": t["v"].combine_chunks().cast(pa.int64()),
            "jaccard": jac.combine_chunks()
            if isinstance(jac, pa.ChunkedArray) else jac})

    scored = drop_empty_blocks(j.map_batches(_jac, batch_format="pyarrow"))
    return topk(scored, ["jaccard", "u", "v"], k,
                descending=[True, False, False])
