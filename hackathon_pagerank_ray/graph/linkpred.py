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
    return packed, a[starts], b, starts, lens


def _layout_refs(edges_ds):
    """Build the canonical symmetrized neighbor layout in ONE worker
    task; returns ``(layout_ref, n_centers)`` — the betweenness-style
    broadcast contract (the simple graph's layout must fit one worker
    heap; the wedge-shuffle plan below is the shape past that bound).
    Nothing bigger than a scalar reaches the driver."""
    import ray

    refs = edges_ds.to_arrow_refs()

    @ray.remote(num_returns=2)
    def _build(*parts):
        parts = [p if isinstance(p, pa.Table)
                 else pa.Table.from_pandas(p, preserve_index=False)
                 for p in parts]
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return None, 0
        df = pa.concat_tables(parts).to_pandas()
        layout = _canon_neighbors(df)
        if layout is None:
            return None, 0
        return layout, len(layout[4])

    lay_ref, n_ref = _build.remote(*refs)
    return lay_ref, int(ray.get(n_ref))


def _score_chunk_impl(lay, lo: int, hi: int, cap, mode: str) -> pa.Table:
    """Pair scores for center indices [lo, hi): segmented pair expansion
    over the broadcast layout's contiguous b-slice, combined locally to
    one (code, s) row per distinct pair — exact int64 partials, so the
    single-key ``groupby(code).sum`` merge is order-independent."""
    empty = pa.table({"code": pa.array([], pa.int64()),
                      "s": pa.array([], pa.int64())})
    packed, centers, b, starts, lens = lay
    if hi <= lo:
        return empty
    lens_c = lens[lo:hi]
    b0 = int(starts[lo])
    bseg = b[b0:int(starts[hi - 1] + lens[hi - 1])]
    if cap is not None:
        rel = starts[lo:hi] - b0
        pos = np.arange(len(bseg), dtype=np.int64) - np.repeat(rel, lens_c)
        bseg = bseg[pos < cap]
        lens_c = np.minimum(lens_c, cap)
    li, ri, grp = segment_pairs(lens_c, want_groups=(mode == "aa"))
    if len(li) == 0:
        return empty
    code = (bseg[li].astype(np.int64) << 32) | bseg[ri]
    if mode == "aa":
        aw = np.zeros(len(lens_c), dtype=np.int64)
        m2 = lens_c >= 2
        aw[m2] = np.rint(_AA_SCALE / np.log(lens_c[m2])).astype(np.int64)
        w = aw[np.asarray(grp, dtype=np.int64)]
        uniq, inv = np.unique(code, return_inverse=True)
        s = np.bincount(inv, weights=w).astype(np.int64)
    else:
        uniq, s = np.unique(code, return_counts=True)
        s = s.astype(np.int64)
    return pa.table({"code": pa.array(uniq, pa.int64()),
                     "s": pa.array(s, pa.int64())})


def _pair_scores_parallel(edges_ds, mode: str, cap=None,
                          concurrency: int | None = None):
    """Center-parallel pair scoring over the broadcast layout: chunk
    tasks emit locally-combined (code, s) partials, ONE worker reduce
    task merges them (np.unique + bincount — a Dataset groupby has a
    multi-second sort-shuffle floor at ANY size in Ray 2.49, measured
    9–12 s for 313k rows, versus milliseconds for the task reduce;
    the merged pair table is bounded by the same broadcast contract as
    the layout itself).  Returns ``(merged_ds_or_None, lay_ref)`` with
    ``merged`` a Dataset of (code, sum(s))."""
    import ray

    lay_ref, n_centers = _layout_refs(edges_ds)
    if n_centers == 0:
        return None, lay_ref
    cpus = int(ray.cluster_resources().get("CPU", 8))
    C = max(1, min(concurrency or (cpus - 2), n_centers))
    # reducers: enough to parallelize the unique/merge, few enough that
    # the (C × R) object fan stays cheap
    R = max(1, min(C, cpus // 4))

    @ray.remote
    def _score_chunk(lay, lo, hi):
        t = _score_chunk_impl(lay, lo, hi, cap, mode)
        code = np.asarray(t["code"], dtype=np.int64)
        s = np.asarray(t["s"], dtype=np.int64)
        # range-split by the pair's u so each reducer merges a disjoint
        # code range (same rule in every chunk task)
        part = (code >> np.int64(32)) % R
        outs = []
        for r in range(R):
            m = part == r
            outs.append(pa.table({"code": pa.array(code[m], pa.int64()),
                                  "s": pa.array(s[m], pa.int64())}))
        return tuple(outs) if R > 1 else outs[0]

    @ray.remote
    def _reduce(*parts):
        code = np.concatenate([np.asarray(p["code"]) for p in parts])
        s = np.concatenate([np.asarray(p["s"]) for p in parts])
        uniq, inv = np.unique(code, return_inverse=True)
        tot = np.bincount(inv, weights=s).astype(np.int64)
        return pa.table({"code": pa.array(uniq, pa.int64()),
                         "sum(s)": pa.array(tot, pa.int64())})

    bounds = np.linspace(0, n_centers, C + 1).astype(np.int64)
    chunk_rets = [
        _score_chunk.options(num_returns=R).remote(lay_ref, int(lo), int(hi))
        for lo, hi in zip(bounds[:-1], bounds[1:]) if hi > lo]
    if R == 1:
        red_refs = [_reduce.remote(*chunk_rets)]
    else:
        red_refs = [_reduce.remote(*[c[r] for c in chunk_rets])
                    for r in range(R)]
    merged = ray.data.from_arrow_refs(red_refs)
    return merged, lay_ref


def _decode_fresh(merged, lay_ref, out_col: str):
    """(code, Σs) → (u, v, out_col) minus already-adjacent pairs (the
    broadcast ``packed`` edge set probed batch-locally)."""
    import ray

    def _decode(t: pa.Table) -> pa.Table:
        packed = ray.get(lay_ref)[0]
        code = np.asarray(t["code"], dtype=np.int64)
        s = np.asarray(t["sum(s)"], dtype=np.int64)
        if len(code):
            pos = np.minimum(np.searchsorted(packed, code),
                             max(len(packed) - 1, 0))
            keep = (packed[pos] != code) if len(packed) \
                else np.ones(len(code), dtype=bool)
            code, s = code[keep], s[keep]
        return pa.table({"u": pa.array(code >> 32, pa.int64()),
                         "v": pa.array(code & 0xFFFFFFFF, pa.int64()),
                         out_col: pa.array(s, pa.int64())})

    return merged.map_batches(_decode, batch_format="pyarrow")


def _small_gate(edges_ds, mode: str, cap: int | None,
                small_threshold: int):
    """The (materialize, row-count ≤ threshold, max-id < 2^31) gate
    shared by the three ``*_topk`` entry points — ONE copy so the
    packing bound and threshold semantics can't drift between them.

    Returns ``(edges_ds, use_small, merged, lay)``: ``use_small`` False
    → run the distributed wedge-join plan; ``use_small`` True with
    ``merged`` None → empty graph (caller returns its typed empty
    table)."""
    n = edges_ds.count()               # streaming pass, nothing pinned
    if n <= small_threshold:
        edges_ds = edges_ds.materialize()   # bounded by the gate
        mx = edges_ds.max(["src", "dst"]) if n else None
        max_id = (max(mx["max(src)"], mx["max(dst)"]) if mx else 0) or 0
        if max_id < 2 ** 31:
            merged, lay = _pair_scores_parallel(edges_ds, mode, cap=cap)
            return edges_ds, True, merged, lay
    return edges_ds, False, None, None


def _empty_pairs(out_col: str, typ: pa.DataType):
    import ray
    return ray.data.from_arrow(pa.table({
        "u": pa.array([], pa.int64()),
        "v": pa.array([], pa.int64()),
        out_col: pa.array([], typ)}))


def _symmetrize(t: pa.Table) -> pa.Table:
    """(u, v) canonical edges → both-direction (a=center, b=neighbor)."""
    u = t["u"].combine_chunks()
    v = t["v"].combine_chunks()
    return pa.Table.from_arrays(
        [pa.concat_arrays([u, v]), pa.concat_arrays([v, u])],
        names=["a", "b"])


def common_neighbors_topk(edges_ds, k: int = 50, num_partitions: int = 16,
                          max_center_degree: int | None = None,
                          small_threshold: int = 2_000_000):
    """Top-k non-adjacent pairs by common-neighbor count:
    ``(u, v, common_neighbors)`` with u < v, ordered by
    (count desc, u, v).

    Adaptive: edge tables under ``small_threshold`` rows (and vids <
    2^31) run the center-parallel broadcast plan — the layout is built
    once in a worker task, center ranges fan over chunk tasks that emit
    locally-combined (pair-code, count) partials, and ONE single-key
    groupby merges (no distributed distinct shuffle, no multi-key
    groupby); the wedge-join plan below is the shape past the broadcast
    memory bound.
    """
    edges_ds, small, merged, lay = _small_gate(
        edges_ds, "cn", max_center_degree, small_threshold)
    if small:
        if merged is None:
            return _empty_pairs("common_neighbors", pa.int64())
        fresh = _decode_fresh(merged, lay, "common_neighbors")
        return topk(fresh, ["common_neighbors", "u", "v"], k,
                    descending=[True, False, False])
    und = canonical_undirected(edges_ds, num_partitions).materialize()
    nbr = und.map_batches(_symmetrize, batch_format="pyarrow")

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


def adamic_adar_topk(edges_ds, k: int = 50, num_partitions: int = 16,
                     small_threshold: int = 2_000_000):
    """Top-k non-adjacent pairs by Adamic-Adar score
    Σ_center 1/ln(deg(center)) — common neighbors weighted down by how
    promiscuous they are.  Same adaptive shape and partitioning keys as
    :func:`common_neighbors_topk`."""
    edges_ds, small, merged, lay = _small_gate(
        edges_ds, "aa", None, small_threshold)
    if small:
        if merged is None:
            return _empty_pairs("aa_score", pa.float64())
        fresh = _decode_fresh(merged, lay, "s")
        top = topk(fresh, ["s", "u", "v"], k,
                   descending=[True, False, False])

        def _score(t: pa.Table) -> pa.Table:
            sc = pc.divide(pc.cast(t["s"], pa.float64()),
                           pa.scalar(_AA_SCALE))
            return pa.table({
                "u": t["u"].combine_chunks(),
                "v": t["v"].combine_chunks(),
                "aa_score": sc.combine_chunks()
                if isinstance(sc, pa.ChunkedArray) else sc})

        return top.map_batches(_score, batch_format="pyarrow")
    und = canonical_undirected(edges_ds, num_partitions).materialize()
    nbr = und.map_batches(_symmetrize, batch_format="pyarrow")

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
                 max_center_degree: int | None = None,
                 small_threshold: int = 2_000_000):
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
    import ray

    from .triangles import undirected_degrees

    edges_ds, small, merged, lay = _small_gate(
        edges_ds, "cn", max_center_degree, small_threshold)
    if small:
        if merged is None:
            return _empty_pairs("jaccard", pa.float64())
        fresh = _decode_fresh(merged, lay, "cn")
        lay_ref = lay

        def _jac_small(t: pa.Table) -> pa.Table:
            layv = ray.get(lay_ref)
            centers, lens = layv[1], layv[4]
            u = np.asarray(t["u"], dtype=np.int64)
            v = np.asarray(t["v"], dtype=np.int64)
            cn = np.asarray(t["cn"], dtype=np.int64)
            # every pair endpoint has >= 1 neighbor, so it IS a center
            du = lens[np.searchsorted(centers, u)]
            dv = lens[np.searchsorted(centers, v)]
            # one double division of exact ints (same op as the
            # distributed plan and the SQL twin)
            jac = cn.astype(np.float64) / (du + dv - cn)
            return pa.table({"u": pa.array(u, pa.int64()),
                             "v": pa.array(v, pa.int64()),
                             "jaccard": pa.array(jac, pa.float64())})

        scored = fresh.map_batches(_jac_small, batch_format="pyarrow")
        return topk(scored, ["jaccard", "u", "v"], k,
                    descending=[True, False, False])

    und = canonical_undirected(edges_ds, num_partitions).materialize()
    deg = drop_empty_blocks(undirected_degrees(und))

    nbr = und.map_batches(_symmetrize, batch_format="pyarrow")

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


def cocitation_topk(edges_ds, k: int = 50, num_partitions: int = 16,
                    max_center_degree: int | None = None):
    """Top-k page pairs by co-citation count (Small 1973): pairs
    ``(u < v, cocitations)`` where cocitations = number of pages linking
    to BOTH — the directed sibling of common-neighbor link prediction
    (bibliographic coupling = the same op on the reversed edge table).

    Plan: distinct directed edges → group by the citing page → segmented
    within-group target-pair expansion (no Python pair loops) → packed
    int64 pair codes through ONE task-shuffle count → top-k.  Wedge
    volume is Σ indeg(citing)²; ``max_center_degree`` caps hub citers
    (boilerplate nav pages carry little co-citation signal) — the same
    documented skew knob as the link-prediction ops.  Requires vids
    < 2^31 (the packed-pair bound, asserted).
    """
    from ..stages.relational import distinct, topk
    from ..stages.schema_util import drop_empty_blocks, enforce_schema
    from ..stages.taskshuffle import grouped_agg_int64
    from .triangles import segment_pairs

    dist = distinct(edges_ds, ["src", "dst"], num_partitions)

    def _pair_codes(g: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(np.unique(g["dst"].to_numpy(dtype=np.int64)))
        if max_center_degree is not None and len(t) > max_center_degree:
            t = t[:max_center_degree]
        if len(t) < 2:
            return pd.DataFrame({"code": pd.Series(dtype="int64")})
        assert t[-1] < 2 ** 31, "cocitation packed-pair bound: vid >= 2^31"
        li, ri, _ = segment_pairs(np.array([len(t)], dtype=np.int64))
        code = (t[li] << np.int64(32)) | t[ri]
        return pd.DataFrame({"code": pd.Series(code, dtype="int64")})

    codes = drop_empty_blocks(enforce_schema(
        dist.groupby("src").map_groups(_pair_codes, batch_format="pandas"),
        pa.schema([("code", pa.int64())])))
    counts = grouped_agg_int64(codes, "code", None, op="sum",
                               out_val="cocitations")

    def _unpack(t: pa.Table) -> pa.Table:
        c = np.asarray(t["code"], dtype=np.int64)
        return pa.table({
            "u": pa.array(c >> np.int64(32), pa.int64()),
            "v": pa.array(c & np.int64(0xFFFFFFFF), pa.int64()),
            "cocitations": t["cocitations"].combine_chunks()
            .cast(pa.int64())})

    pairs = drop_empty_blocks(enforce_schema(
        counts.map_batches(_unpack, batch_format="pyarrow"),
        pa.schema([("u", pa.int64()), ("v", pa.int64()),
                   ("cocitations", pa.int64())])))
    return topk(pairs, ["cocitations", "u", "v"], k,
                descending=[True, False, False])
