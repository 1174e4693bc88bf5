"""HyperBall / HyperANF: neighborhood function + effective diameter.

The classic web-graph analysis after PageRank (Boldi, Rosa & Vigna,
"HyperANF", WWW'11; "HyperBall", 2013): estimate the neighborhood
function N(t) = #ordered vertex pairs within distance <= t by giving
every vertex a HyperLogLog counter of its ball and iterating

    B(u, t+1) = B(u, t)  ∪  ⋃_{(u,v) ∈ E}  B(v, t)

until no counter changes.  HLL union is register-wise max, so the whole
sweep is expressible in Dataset ops: the state is a (vid, bucket, rho)
table of nonzero registers, one sweep = ship state across edges with a
hash join + ``groupby(vid, bucket).max(rho)``.  No driver-side state —
the only driver values are the per-sweep scalar Σ|B| estimates.

Scale shape: per sweep the join ships ≤ |E|·m register rows and the
groupby reduces them back to ≤ n·m — the documented HyperBall cost
(m counters per edge per sweep, ~diameter sweeps).  Partitioning key is
the destination vertex in the ship join and (vid, bucket) in the merge,
both plain hash shuffles.  Registers use the md5-hex scheme of
``stages.stats._hll_partial`` (deterministic across engines/runs).

Effective diameter d_q = the smallest t (linearly interpolated) with
N(t) >= q·N(∞); approximate by construction (HLL), so the driver query
is rows-only — the unit tests pin the deterministic md5-seeded outputs
against exact BFS on small graphs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.schema_util import drop_empty_blocks

_STATE_SCHEMA = pa.schema([("vid", pa.int64()), ("bucket", pa.int64()),
                           ("rho", pa.int64())])


def _vid_registers(vids: np.ndarray, m: int):
    """(bucket, rho) of each vid's own singleton ball — md5-hex scheme:
    bucket = first log16(m) hex digits, rho = leading-zero bits (+1) of
    the remaining digits (integer-exact, no float log2).  Bulk-hashed
    via stages.stats._bulk_md5_upper_be (vectorized DuckDB md5 + numpy
    bit ops) — no per-vid Python loop."""
    from ..stages.stats import _bit_length_u64, _bulk_md5_upper_be
    p = {16: 1, 256: 2}[m]
    nbits = 4 * (16 - p)               # hex-tail bits feeding rho
    keys = np.asarray(vids).astype(np.int64).astype(str)
    h = _bulk_md5_upper_be(keys)[0]
    buckets = (h >> np.uint64(64 - 4 * p)).astype(np.int64)
    tail = h & np.uint64((1 << nbits) - 1)
    rhos = nbits - _bit_length_u64(tail) + 1
    # historical rule: an all-zero tail scores 4*(ndig-1)+1, not nbits+1
    rhos[tail == np.uint64(0)] = nbits - 3
    return buckets, rhos


def _merge_state(ds, m: int):
    """Register-max merge of a (vid, bucket, rho) table via the task
    shuffle: key = ``vid << 8 | bucket`` (bucket < 256 always), op=max —
    replaces the multi-column Dataset groupby (see
    stages/taskshuffle.py for the measured floor)."""
    from ..stages.taskshuffle import grouped_agg_int64

    def _pack(t: pa.Table) -> pa.Table:
        vid = np.asarray(t["vid"], dtype=np.int64)
        # packed-key bound: vid << 8 wraps silently for |vid| >= 2^55
        # and would max-merge two different vertices' registers (same
        # convention as relational.distinct / deterministic_shuffle:
        # fail loudly, never corrupt).  64-bit-hash vertex ids must be
        # densified before the HyperBall entry points.
        if len(vid) and (vid.min() < -(2 ** 55) or vid.max() >= 2 ** 55):
            raise ValueError(
                "hyperball: vertex ids must be in [-2^55, 2^55) to pack "
                "with the 8-bit bucket; densify ids first")
        k = (vid << np.int64(8)) | np.asarray(t["bucket"], dtype=np.int64)
        return pa.table({"k": pa.array(k, pa.int64()),
                         "rho": t["rho"].combine_chunks()})

    def _unpack(t: pa.Table) -> pa.Table:
        k = np.asarray(t["k"], dtype=np.int64)
        return pa.table({
            "vid": pa.array(k >> np.int64(8), pa.int64()),
            "bucket": pa.array(k & np.int64(0xFF), pa.int64()),
            "rho": t["rho"].combine_chunks().cast(pa.int64())
            if isinstance(t["rho"], pa.ChunkedArray) else t["rho"]})

    merged = grouped_agg_int64(ds.map_batches(_pack, batch_format="pyarrow"),
                               "k", "rho", op="max", out_val="rho")
    return merged.map_batches(_unpack, batch_format="pyarrow")


def _vertex_estimates(state, m: int):
    """Per-vertex (vid, est, rsum) as a Dataset — no driver pull of the
    register table; summing it gives the sweep scalars in one execution.

    After the (vid, bucket) groupby the state holds ONE row per nonzero
    register, so a vertex's harmonic sum Σ 2^-rho, its nonzero-bucket
    count, and its rho total are all ADDITIVE over blocks: per-block
    partials → ``groupby(vid).sum`` → a vectorized per-vertex estimator
    map → one ``sum()``.  Σ rho is the exact fixpoint signature
    (registers only grow under the max merge).  Only scalars reach the
    driver."""
    def _partial(t: pa.Table) -> pa.Table:
        vid = np.asarray(t["vid"])
        rho = np.asarray(t["rho"])
        order = np.argsort(vid, kind="stable")
        vid, rho = vid[order], rho[order]
        starts = np.flatnonzero(np.r_[True, vid[1:] != vid[:-1]])
        # rho ≤ 61, so 2^-rho is exact in float64
        s = np.add.reduceat(np.ldexp(1.0, -rho), starts)
        rsum = np.add.reduceat(rho.astype(np.int64), starts)
        nnz = np.diff(np.r_[starts, len(vid)])
        return pa.table({"vid": pa.array(vid[starts], pa.int64()),
                         "s": pa.array(s, pa.float64()),
                         "nnz": pa.array(nnz.astype(np.int64)),
                         "rsum": pa.array(rsum)})

    agg = (state.map_batches(_partial, batch_format="pyarrow")
           .groupby("vid").sum(["s", "nnz", "rsum"]))
    alpha = {16: 0.673, 256: 0.7213 / (1.0 + 1.079 / 256)}[m]

    def _est(t: pa.Table) -> pa.Table:
        s = np.asarray(t["sum(s)"], dtype=np.float64)
        nnz = np.asarray(t["sum(nnz)"], dtype=np.int64)
        zeros = (m - nnz).astype(np.float64)
        est = alpha * m * m / (s + zeros)      # zeros contribute 2^0 each
        small = (est <= 2.5 * m) & (zeros > 0)
        # libm log (math.log == DuckDB ln bit-for-bit; numpy's SIMD
        # log differs at the last ulp) so SQL twins reproduce the
        # linear-counting branch exactly
        est[small] = m * np.array(
            [math.log(m / z) for z in zeros[small]], dtype=np.float64)
        return pa.table({"vid": t["vid"],
                         "est": pa.array(est, pa.float64()),
                         "rsum": t["sum(rsum)"]})

    return agg.map_batches(_est, batch_format="pyarrow")


def _sweep_stats(state, m: int):
    out = _vertex_estimates(state, m).sum(["est", "rsum"])
    if not out:
        return 0.0, 0
    return float(out["sum(est)"] or 0.0), int(out["sum(rsum)"] or 0)


def _hyperball_small(df: pd.DataFrame, m: int, max_t: int):
    """Single-task path: dense (n, m) rho matrix, one synchronous
    ``np.maximum.at`` max-merge per sweep — same registers, same
    estimator, same fixpoint rule as the distributed plan."""
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    keep = src != dst
    u = np.minimum(src[keep], dst[keep]).astype(np.int64)
    v = np.maximum(src[keep], dst[keep]).astype(np.int64)
    if len(u) == 0:
        return []
    vids = np.unique(np.concatenate([u, v]))
    idx = {int(x): i for i, x in enumerate(vids)}
    ui = np.fromiter((idx[int(x)] for x in u), dtype=np.int64, count=len(u))
    vi = np.fromiter((idx[int(x)] for x in v), dtype=np.int64, count=len(v))
    up = np.concatenate([ui, vi])
    nbr = np.concatenate([vi, ui])
    n = len(vids)
    rho = np.zeros((n, m), dtype=np.int64)       # 0 = empty register
    b, r = _vid_registers(vids, m)
    np.maximum.at(rho, (np.arange(n), b), r)
    alpha = {16: 0.673, 256: 0.7213 / (1.0 + 1.079 / 256)}[m]

    def _est_sum(rho):
        # empty registers hold rho=0, so 2^-rho is exactly their 2^0 term
        s = np.ldexp(1.0, -rho).sum(axis=1)
        est = alpha * m * m / s
        zeros = (rho == 0).sum(axis=1)
        small = (est <= 2.5 * m) & (zeros > 0)
        # libm log (math.log == DuckDB ln bit-for-bit; numpy's SIMD
        # log differs at the last ulp) so SQL twins reproduce the
        # linear-counting branch exactly
        est[small] = m * np.array(
            [math.log(m / z) for z in zeros[small]], dtype=np.float64)
        # sequential ascending-vid fold (cumsum), not np.sum: np.sum's
        # pairwise blocking beyond 128 elements would diverge from the
        # SQL twin's ordered list_sum at the last-ulp level
        return float(np.cumsum(est)[-1]) if len(est) else 0.0

    nf = [(0, _est_sum(rho))]
    last_sig = int(rho.sum())
    for t in range(1, max_t + 1):
        new = rho.copy()
        np.maximum.at(new, up, rho[nbr])
        rho = new
        sig = int(rho.sum())
        nf.append((t, _est_sum(rho)))
        if sig == last_sig:
            nf.pop()
            break
        last_sig = sig
    return nf


def neighborhood_function(edges_ds, num_partitions: int = 8, m: int = 16,
                          max_t: int = 64, q: float = 0.9,
                          small_threshold: int = 2_000_000):
    """Run HyperBall on the UNDIRECTED simple graph of ``edges_ds``
    (src, dst).  Returns ``(nf, d_eff)``: ``nf`` a pandas DataFrame
    ``(t, n_pairs)`` with the estimated #ordered pairs within distance t
    (t = 0 .. convergence), and ``d_eff`` the interpolated effective
    diameter at quantile ``q``.

    The per-sweep fixpoint test is exact: registers only grow (max
    merge), so an unchanged Σrho means no register moved.
    """
    if m not in (16, 256):
        raise ValueError("m must be 16 or 256 (md5 hex-digit buckets)")
    from ..stages.relational import inner_join, rename
    from .triangles import canonical_undirected

    n_raw = edges_ds.count()           # streaming pass, nothing pinned
    if n_raw <= small_threshold:
        edges_ds = edges_ds.materialize()   # bounded by the gate
        rows = edges_ds.repartition(1).map_batches(
            lambda df: pd.DataFrame(_hyperball_small(df, m, max_t),
                                    columns=["t", "n_pairs"]),
            batch_format="pandas", batch_size=None).to_pandas()
        nf_df = rows.sort_values("t").reset_index(drop=True)
        return nf_df, _interp_d_eff(nf_df, q)

    und = canonical_undirected(edges_ds, num_partitions).materialize()

    # symmetrize: ship B(dst) to src along both directions
    both = und.map_batches(
        lambda t: pa.Table.from_arrays(
            [pa.concat_arrays([t["u"].combine_chunks(),
                               t["v"].combine_chunks()]),
             pa.concat_arrays([t["v"].combine_chunks(),
                               t["u"].combine_chunks()])],
            names=["up", "nbr"]),
        batch_format="pyarrow").materialize()

    def _init(t: pa.Table) -> pa.Table:
        vids = np.unique(np.asarray(t["u"]))
        b, r = _vid_registers(vids, m)
        return pa.Table.from_arrays(
            [pa.array(vids, pa.int64()), pa.array(b), pa.array(r)],
            names=["vid", "bucket", "rho"])

    verts = und.map_batches(
        lambda t: pa.Table.from_arrays(
            [pa.concat_arrays([t["u"].combine_chunks(),
                               t["v"].combine_chunks()])], names=["u"]),
        batch_format="pyarrow")
    state = _merge_state(
        verts.map_batches(_init, batch_format="pyarrow"), m).materialize()

    est0, last_sig = _sweep_stats(state, m)
    nf = [(0, est0)]
    for t in range(1, max_t + 1):
        # ship: every (up, nbr) edge pulls nbr's registers to up
        shipped = inner_join(
            both, rename(state, {"vid": "nbr"}),
            on="nbr", num_partitions=num_partitions)
        shipped = shipped.map_batches(
            lambda tb: pa.Table.from_arrays(
                [tb["up"].combine_chunks().cast(pa.int64()),
                 tb["bucket"].combine_chunks().cast(pa.int64()),
                 tb["rho"].combine_chunks().cast(pa.int64())],
                names=["vid", "bucket", "rho"]),
            batch_format="pyarrow")
        state = _merge_state(
            state.union(drop_empty_blocks(shipped)), m).materialize()
        est, sig = _sweep_stats(state, m)
        nf.append((t, est))
        if sig == last_sig:              # exact fixpoint: no register grew
            nf.pop()                     # final sweep added no information
            break
        last_sig = sig

    nf_df = pd.DataFrame(nf, columns=["t", "n_pairs"])
    return nf_df, _interp_d_eff(nf_df, q)


def _interp_d_eff(nf_df: pd.DataFrame, q: float) -> float:
    """Smallest (linearly interpolated) t with N(t) >= q·N(∞)."""
    if not len(nf_df):
        return 0.0
    target = q * nf_df["n_pairs"].iloc[-1]
    vals = nf_df["n_pairs"].to_numpy()
    d_eff = 0.0
    if vals[0] < target:
        i = int(np.searchsorted(vals, target))
        lo, hi = vals[i - 1], vals[i]
        d_eff = (i - 1) + (target - lo) / (hi - lo) if hi > lo else float(i)
    return float(d_eff)


def _harmonic_small(df: pd.DataFrame, m: int, max_t: int) -> pd.DataFrame:
    """Single-task harmonic centrality: same matrix sweeps as
    :func:`_hyperball_small`, accumulating H(u) += (|B(u,t)| −
    |B(u,t−1)|)/t per sweep (HyperBall's centrality recurrence)."""
    empty = pd.DataFrame({"vid": pd.Series(dtype="int64"),
                          "harmonic": pd.Series(dtype="float64")})
    src = df["src"].to_numpy()
    dst = df["dst"].to_numpy()
    keep = src != dst
    u = np.minimum(src[keep], dst[keep]).astype(np.int64)
    v = np.maximum(src[keep], dst[keep]).astype(np.int64)
    if len(u) == 0:
        return empty
    vids = np.unique(np.concatenate([u, v]))
    idx = {int(x): i for i, x in enumerate(vids)}
    ui = np.fromiter((idx[int(x)] for x in u), dtype=np.int64, count=len(u))
    vi = np.fromiter((idx[int(x)] for x in v), dtype=np.int64, count=len(v))
    up = np.concatenate([ui, vi])
    nbr = np.concatenate([vi, ui])
    n = len(vids)
    rho = np.zeros((n, m), dtype=np.int64)
    b, r = _vid_registers(vids, m)
    np.maximum.at(rho, (np.arange(n), b), r)
    alpha = {16: 0.673, 256: 0.7213 / (1.0 + 1.079 / 256)}[m]

    def _est(rho):
        s = np.ldexp(1.0, -rho).sum(axis=1)
        est = alpha * m * m / s
        zeros = (rho == 0).sum(axis=1)
        small = (est <= 2.5 * m) & (zeros > 0)
        # libm log (math.log == DuckDB ln bit-for-bit; numpy's SIMD
        # log differs at the last ulp) so SQL twins reproduce the
        # linear-counting branch exactly
        est[small] = m * np.array(
            [math.log(m / z) for z in zeros[small]], dtype=np.float64)
        return est

    prev = _est(rho)
    h = np.zeros(n, dtype=np.float64)
    last_sig = int(rho.sum())
    for t in range(1, max_t + 1):
        new = rho.copy()
        np.maximum.at(new, up, rho[nbr])
        rho = new
        sig = int(rho.sum())
        if sig == last_sig:
            break
        cur = _est(rho)
        h += (cur - prev) / t
        prev = cur
        last_sig = sig
    return pd.DataFrame({"vid": vids, "harmonic": h})


def harmonic_centrality(edges_ds, num_partitions: int = 8, m: int = 16,
                        max_t: int = 64, small_threshold: int = 2_000_000):
    """HyperBall harmonic centrality H(u) = Σ_{v≠u} 1/d(u, v) on the
    undirected simple graph — the centrality HyperBall was built for
    (Boldi & Vigna 2013): each sweep's per-vertex ball-size delta pays
    1/t into the running total, so the whole computation is the
    neighborhood-function loop plus ONE extra hash join per sweep
    (previous estimates → new estimates, keyed on vid).  Approximate
    (HLL); returns a Dataset/DataFrame ``(vid, harmonic)``.
    """
    if m not in (16, 256):
        raise ValueError("m must be 16 or 256 (md5 hex-digit buckets)")
    from ..stages.relational import inner_join, rename
    from .triangles import canonical_undirected

    n_raw = edges_ds.count()           # streaming pass, nothing pinned
    if n_raw <= small_threshold:
        edges_ds = edges_ds.materialize()   # bounded by the gate
        return drop_empty_blocks(edges_ds.repartition(1).map_batches(
            lambda df: _harmonic_small(df, m, max_t),
            batch_format="pandas", batch_size=None))

    und = canonical_undirected(edges_ds, num_partitions).materialize()
    both = und.map_batches(
        lambda t: pa.Table.from_arrays(
            [pa.concat_arrays([t["u"].combine_chunks(),
                               t["v"].combine_chunks()]),
             pa.concat_arrays([t["v"].combine_chunks(),
                               t["u"].combine_chunks()])],
            names=["up", "nbr"]),
        batch_format="pyarrow").materialize()

    def _init(t: pa.Table) -> pa.Table:
        vids = np.unique(np.asarray(t["u"]))
        b, r = _vid_registers(vids, m)
        return pa.Table.from_arrays(
            [pa.array(vids, pa.int64()), pa.array(b), pa.array(r)],
            names=["vid", "bucket", "rho"])

    verts = und.map_batches(
        lambda t: pa.Table.from_arrays(
            [pa.concat_arrays([t["u"].combine_chunks(),
                               t["v"].combine_chunks()])], names=["u"]),
        batch_format="pyarrow")
    state = _merge_state(
        verts.map_batches(_init, batch_format="pyarrow"), m).materialize()

    # cent carries (vid, h, prev) — prev = |B(u, t-1)| estimate
    est0 = _vertex_estimates(state, m)
    cent = est0.map_batches(
        lambda t: pa.table({"vid": t["vid"],
                            "h": pa.array(np.zeros(len(t)), pa.float64()),
                            "prev": t["est"]}),
        batch_format="pyarrow").materialize()
    last_sig = int(est0.sum("rsum") or 0)

    for t in range(1, max_t + 1):
        shipped = inner_join(
            both, rename(state, {"vid": "nbr"}),
            on="nbr", num_partitions=num_partitions)
        shipped = shipped.map_batches(
            lambda tb: pa.Table.from_arrays(
                [tb["up"].combine_chunks().cast(pa.int64()),
                 tb["bucket"].combine_chunks().cast(pa.int64()),
                 tb["rho"].combine_chunks().cast(pa.int64())],
                names=["vid", "bucket", "rho"]),
            batch_format="pyarrow")
        state = _merge_state(
            state.union(drop_empty_blocks(shipped)), m).materialize()
        est = _vertex_estimates(state, m).materialize()
        sig = int(est.sum("rsum") or 0)
        if sig == last_sig:
            break
        last_sig = sig

        def _upd(tb: pa.Table, t=t) -> pa.Table:
            h = np.asarray(tb["h"], dtype=np.float64)
            prev = np.asarray(tb["prev"], dtype=np.float64)
            cur = np.asarray(tb["est"], dtype=np.float64)
            return pa.table({"vid": tb["vid"],
                             "h": pa.array(h + (cur - prev) / t),
                             "prev": tb["est"]})

        cent = inner_join(cent, est.drop_columns(["rsum"]),
                          on="vid", num_partitions=num_partitions
                          ).map_batches(_upd, batch_format="pyarrow"
                                        ).materialize()

    return cent.map_batches(
        lambda tb: pa.table({"vid": pc.cast(tb["vid"], pa.int64()),
                             "harmonic": tb["h"]}),
        batch_format="pyarrow")
