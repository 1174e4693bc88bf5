"""Katz centrality in pure Dataset ops (fixed-sweep, oracle-exact).

Truncated Katz series over the distinct directed edge table with
rational attenuation ``alpha = 1/inv_alpha``:

    x_0(v) = 1;   x_{t+1}(v) = 1 + alpha * sum_{(u,v) in E} x_t(u)

i.e. after ``sweeps`` rounds each vertex holds
``sum_{k<=sweeps} alpha^k (#paths of length k ending at v)`` — the
attenuated-path centrality (Katz 1953).  Each sweep is the same
gather-scatter shape as graph/dataset_pagerank.py: ``x ⋈ edges on src``
→ ``groupby(dst).sum`` (the hash(dst)-keyed shuffle) → affine update via
a left join that keeps in-degree-0 vertices at the additive baseline.

Exactness: the scaled iterate ``y_t = inv_alpha^t * x_t`` obeys the
INTEGER recurrence ``y_{t+1} = inv_alpha^(t+1) + sum y_t(u)``, so every
sweep is exact int64 arithmetic in both engines — float summation order
can never flip a rounding boundary — and only the final
``float(y)/float(inv_alpha^sweeps)`` is a (bit-identical) double op.
The DuckDB twin unrolls the identical integer sweeps
(``__ray_entry__._katz_sql``).  int64 bound:
``y_sweeps <= (inv_alpha + max_indeg)^sweeps`` must stay < 2^63 — at
web scale keep sweeps small or alpha below 1/max_indeg (the classical
Katz convergence condition anyway).  This is ENFORCED at runtime: each
sweep checks the analytic bound against the measured max in-degree and
raises ``OverflowError`` before a silent int64 wrap can occur.

Reference scope note: the reference engine (begum-kara/
Hackathon-PageRank, backend/cuda/pagerank_gpu.cu) ships PageRank only;
Katz extends the same centrality surface (SURVEY.md §2 G-family).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..stages.relational import distinct, inner_join, left_join_coalesce
from ..stages.schema_util import drop_empty_blocks, enforce_schema

_Y = pa.schema([pa.field("vid", pa.int64()), pa.field("y", pa.int64())])


def _overflow_check(t_sweep: int, inv_alpha: int, max_indeg: int,
                    y_bound: int) -> int:
    """Analytic running bound B_t = inv_alpha^t + max_indeg·B_{t-1} ≥
    max(y_t), checked in exact Python ints BEFORE the sweep's sum — a
    wrap inside the int64 sum would be silent in numpy/Arrow."""
    bound_next = inv_alpha ** t_sweep + max_indeg * y_bound
    if bound_next >= 2 ** 63:
        raise OverflowError(
            f"katz_dataset: sweep {t_sweep} could overflow int64 "
            f"(bound {bound_next:.3e} ≥ 2^63 with max in-degree "
            f"{max_indeg}); reduce sweeps or raise inv_alpha")
    return bound_next


def _katz_small(e, inv_alpha: int, sweeps: int):
    """Small path: the distinct edge table fits one worker task, so the
    exact integer sweeps run over an in-task CSR — same recurrence,
    same overflow guard, bit-identical final division as the Dataset
    plan, but 2 task waves instead of ~3·sweeps Dataset exchanges
    (the sf0.01 conformance run spent 25 s on exchange floors)."""
    import ray

    refs = e.to_arrow_refs()

    @ray.remote
    def _solve(*parts):
        parts = [p if isinstance(p, pa.Table)
                 else pa.Table.from_pandas(p, preserve_index=False)
                 for p in parts]
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return pa.table({"vid": pa.array([], pa.int64()),
                             "katz": pa.array([], pa.float64())})
        tbl = pa.concat_tables(parts)
        src = tbl["src"].to_numpy(zero_copy_only=False).astype(np.int64)
        dst = tbl["dst"].to_numpy(zero_copy_only=False).astype(np.int64)
        verts = np.unique(np.concatenate([src, dst]))
        s = np.searchsorted(verts, src)
        d = np.searchsorted(verts, dst)
        order = np.argsort(d, kind="stable")
        s, d = s[order], d[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        dgrp = d[starts]
        indeg = np.diff(np.r_[starts, len(d)])
        max_indeg = int(indeg.max()) if len(indeg) else 0
        y = np.ones(len(verts), dtype=np.int64)
        y_bound = 1
        for t_sweep in range(1, sweeps + 1):
            y_bound = _overflow_check(t_sweep, inv_alpha, max_indeg,
                                      y_bound)
            # int64 reduceat: exact (order-independent) group sums
            gathered = np.add.reduceat(y[s], starts)
            y_new = np.full(len(verts), inv_alpha ** t_sweep,
                            dtype=np.int64)
            y_new[dgrp] += gathered
            y = y_new
        katz = y.astype(np.float64) / float(inv_alpha ** sweeps)
        return pa.table({"vid": pa.array(verts, pa.int64()),
                         "katz": pa.array(katz, pa.float64())})

    return ray.data.from_arrow_refs([_solve.remote(*refs)])


def katz_dataset(edges_ds, inv_alpha: int = 20, sweeps: int = 8,
                 num_partitions: int = 8,
                 small_threshold: int = 2_000_000):
    """(vid, katz) for every vertex of the distinct edge graph.

    Adaptive like the other centrality ops: distinct edge tables under
    ``small_threshold`` rows solve in one worker task
    (:func:`_katz_small`); the streaming Dataset plan below is the
    shape past the single-task memory bound."""
    e = drop_empty_blocks(distinct(edges_ds, ["src", "dst"],
                                   num_partitions)).materialize()
    if e.count() <= small_threshold:
        return _katz_small(e, inv_alpha, sweeps)

    verts = drop_empty_blocks(
        e.select_columns(["src"]).rename_columns({"src": "vid"})
        .union(e.select_columns(["dst"]).rename_columns({"dst": "vid"}))
        .groupby("vid").count().select_columns(["vid"]))

    def _seed(t: pa.Table) -> pa.Table:
        return pa.table({
            "vid": t["vid"].combine_chunks().cast(pa.int64()),
            "y": pa.array([1] * t.num_rows, pa.int64())})

    x = verts.map_batches(_seed, batch_format="pyarrow").materialize()

    # Overflow guard input: the exact-integer iterate grows like
    # (spectral radius)^t, and an int64 wrap inside the groupby sum is
    # SILENT (numpy/Arrow wrap; the DuckDB twin's HUGEINT would raise) —
    # so the engine and oracle would silently diverge.  One in-degree
    # max (via the task shuffle — the Dataset groupby pays a multi-
    # second floor, stages/taskshuffle.py) seeds the analytic running
    # bound B_t: B_0 = 1, B_{t+1} = inv_alpha^(t+1) + max_indeg·B_t ≥
    # max(y_{t+1}), checked in exact Python ints before each sweep's
    # sum — no per-sweep re-aggregation of x.
    from ..stages.taskshuffle import grouped_agg_int64
    max_indeg = int(grouped_agg_int64(
        e.select_columns(["dst"]), "dst", None, op="sum",
        out_val="n").max("n") or 0)

    y_bound = 1                 # = max(y_0)
    for t_sweep in range(1, sweeps + 1):
        y_bound = _overflow_check(t_sweep, inv_alpha, max_indeg, y_bound)
        j = inner_join(e, enforce_schema(x, _Y), on="src", right_on="vid",
                       num_partitions=num_partitions)
        gathered = (j.select_columns(["dst", "y"])
                    .groupby("dst").sum("y"))
        base = inv_alpha ** t_sweep

        def _upd(t: pa.Table, _b=base) -> pa.Table:
            s = pc.fill_null(pc.cast(t["sum(y)"], pa.int64()), 0)
            y = pc.add(pa.scalar(_b, pa.int64()), s)
            return pa.table({
                "vid": t["vid"].combine_chunks().cast(pa.int64()),
                "y": y.combine_chunks()
                if isinstance(y, pa.ChunkedArray) else y})

        joined = left_join_coalesce(
            verts, drop_empty_blocks(gathered), on="vid", right_on="dst",
            fill={"sum(y)": 0}, num_partitions=num_partitions)
        # drop_empty_blocks doubles as the per-sweep materialize
        x = drop_empty_blocks(
            joined.map_batches(_upd, batch_format="pyarrow"))

    denom = float(inv_alpha ** sweeps)

    def _final(t: pa.Table) -> pa.Table:
        katz = pc.divide(pc.cast(t["y"], pa.float64()),
                         pa.scalar(denom, pa.float64()))
        return pa.table({
            "vid": t["vid"].combine_chunks().cast(pa.int64()),
            "katz": katz.combine_chunks()
            if isinstance(katz, pa.ChunkedArray) else katz})

    return x.map_batches(_final, batch_format="pyarrow")
