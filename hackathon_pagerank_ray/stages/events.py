"""Windowed event operators (sessionization).

Sessionization is the canonical "custom operator the Dataset API lacks"
(SURVEY.md §2 training-data extensions): expressed as a per-key
``groupby().map_groups`` so each user's ordered event stream is
processed in one task.  Partitioning assumption: one user's events fit a
worker (the hash shuffle moves each user to exactly one group task); at
10^12-event scale a hot user bounds a single task's size, which is the
standard sessionization shape — salt by (user, day) first if a key can
exceed worker memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _ts_us_i64(col) -> "pa.Array":
    """Epoch microseconds (int64) from a timestamp column of ANY
    resolution: sub-microsecond components TRUNCATE — matching the SQL
    twins' epoch_us — instead of raising ArrowInvalid the way a plain
    cast from ns does."""
    opts = pc.CastOptions(target_type=pa.timestamp("us"),
                          allow_time_truncate=True)
    us = pc.cast(col, options=opts)
    out = pc.cast(us, pa.int64())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def _pad(n: int, typ: pa.DataType) -> pa.Array:
    """Type-preserving filler for the never-read side of a tag-union block.

    The tag-union-groupby operators below pad each side's absent columns
    so the two unioned schemas align.  Null padding would coerce integer
    columns to float64 once Ray converts the group block to pandas
    (Arrow int64 + null -> NaN -> float64), silently changing output
    dtypes — and a downstream exact value-hash then sees 5.0 vs 5.  The
    padded values are unreachable (every read is behind a ``__side``
    filter), so numeric types pad with zeros to keep dtypes intact;
    non-numeric types keep null padding.
    """
    if pa.types.is_integer(typ) or pa.types.is_floating(typ):
        return pa.array(np.zeros(n, dtype=typ.to_pandas_dtype()), type=typ)
    return pa.nulls(n, typ)


def sessionize(events_ds, user_col: str = "user_id", ts_col: str = "ts",
               gap_sec: float = 1800.0):
    """Split each user's event stream into sessions at gaps > ``gap_sec``.

    Returns one row per (user, session): ``user_id, session_idx`` (1-based
    in time order), ``n_events``, ``start_us``, ``end_us`` (event-time
    bounds in epoch microseconds).
    """
    gap_us = int(round(gap_sec * 1_000_000))

    def _to_us(t: pa.Table) -> pa.Table:
        micros = pc.cast(t[ts_col], pa.int64())
        if isinstance(micros, pa.ChunkedArray):
            micros = micros.combine_chunks()
        return pa.Table.from_arrays(
            [t[user_col].combine_chunks(), micros],
            names=[user_col, "t_us"])

    def _sess(df: pd.DataFrame) -> pd.DataFrame:
        empty = {
            user_col: pd.Series(dtype="int64"),
            "session_idx": pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
            "start_us": pd.Series(dtype="int64"),
            "end_us": pd.Series(dtype="int64"),
        }
        if not len(df):
            return pd.DataFrame(empty)
        t = np.sort(df["t_us"].to_numpy(dtype=np.int64))
        new = np.ones(len(t), dtype=bool)
        new[1:] = (t[1:] - t[:-1]) > gap_us
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(t)]])
        return pd.DataFrame({
            user_col: np.full(len(starts), int(df[user_col].iloc[0]),
                              dtype=np.int64),
            "session_idx": np.arange(1, len(starts) + 1, dtype=np.int64),
            "n_events": (ends - starts).astype(np.int64),
            "start_us": t[starts],
            "end_us": t[ends - 1],
        })

    rows = events_ds.map_batches(_to_us, batch_format="pyarrow")
    try:
        id_is_int = rows.schema().base_schema.field(user_col).type \
            == pa.int64()
    except Exception:
        id_is_int = False
    if id_is_int:
        # r5 fast path: two-wave task shuffle on user hash, then ONE
        # vectorized kernel per reducer covering ALL its users — a
        # lexsort + diff computes every session boundary at once,
        # replacing the per-group pandas UDF invocation (and the Ray
        # sort-groupby floor).  Output rows are bit-identical: same
        # per-user time sort, same gap rule, same int fields.
        import ray

        mat = rows.materialize()
        refs = mat.to_arrow_refs()
        cpus = int(ray.cluster_resources().get("CPU", 8))
        R = max(1, min(len(refs), cpus // 4))

        @ray.remote
        def _split(block):
            t = block if isinstance(block, pa.Table) else \
                pa.Table.from_pandas(block, preserve_index=False)
            u = (np.asarray(t[user_col], dtype=np.int64) if t.num_rows
                 else np.empty(0, np.int64))
            part = u % R
            outs = [t.filter(pa.array(part == r)) for r in range(R)]
            return tuple(outs) if R > 1 else outs[0]

        @ray.remote
        def _reduce(*parts):
            parts = [p for p in parts if p.num_rows]
            if not parts:
                return pa.table({
                    user_col: pa.array([], pa.int64()),
                    "session_idx": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "start_us": pa.array([], pa.int64()),
                    "end_us": pa.array([], pa.int64())})
            t = pa.concat_tables(parts)
            u = np.asarray(t[user_col], dtype=np.int64)
            ts = np.asarray(t["t_us"], dtype=np.int64)
            order = np.lexsort((ts, u))
            u, ts = u[order], ts[order]
            new = np.ones(len(u), dtype=bool)
            new[1:] = (u[1:] != u[:-1]) | (ts[1:] - ts[:-1] > gap_us)
            starts = np.flatnonzero(new)
            ends = np.concatenate([starts[1:], [len(u)]])
            su = u[starts]
            # 1-based session index within each user: session ordinal
            # minus the ordinal of the user's first session
            ufirst = np.ones(len(su), dtype=bool)
            ufirst[1:] = su[1:] != su[:-1]
            base = np.arange(len(su)) - \
                np.maximum.accumulate(np.where(
                    ufirst, np.arange(len(su)), 0))
            return pa.table({
                user_col: pa.array(su),
                "session_idx": pa.array(base + 1),
                "n_events": pa.array((ends - starts).astype(np.int64)),
                "start_us": pa.array(ts[starts]),
                "end_us": pa.array(ts[ends - 1])})

        splits = [_split.options(num_returns=R).remote(r) for r in refs]
        if R == 1:
            red = [_reduce.remote(*splits)]
        else:
            red = [_reduce.remote(*[s[r] for s in splits])
                   for r in range(R)]
        import ray.data as rd
        return rd.from_arrow_refs(red)
    return rows.groupby(user_col).map_groups(_sess, batch_format="pandas")


def asof_join(left_ds, right_ds, by: str, on: str,
              left_keep: dict, right_keep: dict, how: str = "inner",
              direction: str = "backward", right_t_name: str | None = None):
    """Distributed backward/forward as-of join (a Dataset-API gap).

    For each left row, find the single right row with the same ``by`` key
    and the greatest ``on`` <= left's ``on`` (``direction="backward"``; for
    ``"forward"``, the least ``on`` >= left's).  Ties on ``on`` break by
    the first ``right_keep`` column (largest wins backward, smallest
    forward) so results are deterministic.

    ``on`` must be a timestamp column (compared in epoch microseconds).
    ``left_keep`` / ``right_keep`` map input column -> output column; the
    output also carries ``by`` and ``t_us`` (left's ``on`` in epoch us).

    Shape: tag each side, align schemas, ``union`` -> ``groupby(by)`` ->
    per-key ``map_groups`` doing a sorted ``np.searchsorted`` merge — one
    hash shuffle total, each key processed in one task.  Partitioning
    assumption: one key's rows fit a worker (same as ``sessionize``; salt
    ``by`` upstream if a key can exceed worker memory).

    ``how="left"`` keeps unmatched left rows with right columns as NaN
    (pandas-nullable); ``"inner"`` drops them, keeping integer dtypes.
    ``right_t_name`` additionally emits the matched right row's ``on``
    (epoch us) under that name.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    l_cols = list(left_keep)
    r_cols = list(right_keep)

    def _prep(side: int, keep: list):
        def _fn(t: pa.Table) -> pa.Table:
            n = len(t)
            micros = pc.cast(t[on], pa.int64())
            arrays = [t[by].combine_chunks(), micros.combine_chunks()
                      if isinstance(micros, pa.ChunkedArray) else micros,
                      pa.array(np.full(n, side, dtype=np.int8))]
            names = [by, "t_us", "__side"]
            for c in l_cols:
                arrays.append(t[c].combine_chunks() if side == 0
                              else _pad(n, t.schema.field(c).type
                                        if c in t.column_names
                                        else pa.int64()))
                names.append("l__" + c)
            for c in r_cols:
                arrays.append(t[c].combine_chunks() if side == 1
                              else _pad(n, t.schema.field(c).type
                                        if c in t.column_names
                                        else pa.int64()))
                names.append("r__" + c)
            return pa.Table.from_arrays(arrays, names=names)
        return _fn

    def _merge(df: pd.DataFrame) -> pd.DataFrame:
        lhs = df[df["__side"] == 0]
        rhs = df[df["__side"] == 1]
        out_cols = ([by, "t_us"]
                    + [left_keep[c] for c in l_cols]
                    + [right_keep[c] for c in r_cols]
                    + ([right_t_name] if right_t_name else []))
        if not len(lhs) or (how == "inner" and not len(rhs)):
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in out_cols})
        lt = lhs["t_us"].to_numpy(dtype=np.int64)
        rt = rhs["t_us"].to_numpy(dtype=np.int64)
        tie = (rhs["r__" + r_cols[0]].to_numpy() if r_cols
               else np.zeros(len(rhs), dtype=np.int64))
        order = np.lexsort((tie, rt))
        rt = rt[order]
        if direction == "backward":
            idx = np.searchsorted(rt, lt, side="right") - 1
            matched = idx >= 0
        else:
            idx = np.searchsorted(rt, lt, side="left")
            matched = idx < len(rt)
        if how == "inner":
            lhs = lhs[matched]
            lt, idx = lt[matched], idx[matched]
            matched = np.ones(len(lhs), dtype=bool)
        out = {by: lhs[by].to_numpy(dtype=np.int64), "t_us": lt}
        for c in l_cols:
            out[left_keep[c]] = lhs["l__" + c].to_numpy()
        safe = np.where(matched, idx, 0)
        for c in r_cols:
            if len(rhs):
                vals = rhs["r__" + c].to_numpy()[order][safe]
            else:
                vals = np.zeros(len(lhs), dtype=np.int64)
            if not matched.all():
                vals = pd.array(vals).copy()
                vals[~matched] = pd.NA
            out[right_keep[c]] = vals
        if right_t_name:
            vals = rt[safe] if len(rhs) else np.zeros(len(lhs), np.int64)
            if not matched.all():
                vals = pd.array(vals).copy()
                vals[~matched] = pd.NA
            out[right_t_name] = vals
        return pd.DataFrame(out)

    tagged_l = left_ds.map_batches(_prep(0, l_cols), batch_format="pyarrow")
    tagged_r = right_ds.map_batches(_prep(1, r_cols), batch_format="pyarrow")
    return (tagged_l.union(tagged_r)
            .groupby(by)
            .map_groups(_merge, batch_format="pandas"))


def rolling_window_sum(events_ds, by: str, on: str, value_col: str,
                       window_us: int, id_col: str,
                       out_col: str = "roll_sum"):
    """Time-range rolling aggregate (the SQL ``SUM(...) OVER (PARTITION BY
    key ORDER BY t RANGE BETWEEN w PRECEDING AND CURRENT ROW)`` shape —
    a Dataset-API gap): per key, for each row the sum of ``value_col``
    over rows with ``on`` in ``[t - window_us, t]``.

    One hash shuffle on ``by``; per-key work is sort + prefix-sum + two
    ``searchsorted`` — O(n log n), fully vectorized.  Rows sharing a
    timestamp are peers (all included in each other's window), matching
    SQL RANGE semantics.  ``value_col`` should be integer (exact sums);
    emits ``by, id_col, t_us, out_col``.  Partitioning assumption: one
    key's rows fit a worker task.
    """

    def _to_us(t: pa.Table) -> pa.Table:
        micros = pc.cast(t[on], pa.int64())
        if isinstance(micros, pa.ChunkedArray):
            micros = micros.combine_chunks()
        return pa.Table.from_arrays(
            [t[by].combine_chunks(), micros, t[id_col].combine_chunks(),
             t[value_col].combine_chunks()],
            names=[by, "t_us", id_col, value_col])

    def _roll(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in (by, id_col, "t_us", out_col)})
        t = df["t_us"].to_numpy(dtype=np.int64)
        order = np.argsort(t, kind="stable")
        t = t[order]
        v = df[value_col].to_numpy(dtype=np.int64)[order]
        cs = np.cumsum(v)
        lo = np.searchsorted(t, t - window_us, side="left")
        hi = np.searchsorted(t, t, side="right")
        roll = cs[hi - 1] - np.where(lo > 0, cs[lo - 1], 0)
        return pd.DataFrame({
            by: df[by].to_numpy(dtype=np.int64)[order],
            id_col: df[id_col].to_numpy()[order],
            "t_us": t,
            out_col: roll,
        })

    return (events_ds
            .map_batches(_to_us, batch_format="pyarrow")
            .groupby(by)
            .map_groups(_roll, batch_format="pandas"))


def point_in_interval_join(points_ds, intervals_ds, by: str, on: str,
                           start_col: str, end_col: str,
                           point_keep: dict, interval_keep: dict):
    """Range join: attach to each point row the interval (same ``by``
    key) whose ``[start_col, end_col]`` contains its ``on`` timestamp.
    Intervals must be NON-OVERLAPPING per key (e.g. ``sessionize``
    output); a point in no interval is dropped (inner semantics).

    Same single-shuffle shape as ``asof_join``: tag, union, group by
    key, then per key ``searchsorted`` of point times into the sorted
    interval starts + a containment check against the matched end.
    ``start_col``/``end_col`` are epoch-microsecond int64 columns;
    ``on`` is a timestamp column.  Emits ``by, t_us`` + the kept
    columns.  Partitioning assumption: one key's rows fit a worker.
    """
    p_cols = list(point_keep)
    i_cols = list(interval_keep)

    def _prep_points(t: pa.Table) -> pa.Table:
        n = len(t)
        micros = pc.cast(t[on], pa.int64())
        if isinstance(micros, pa.ChunkedArray):
            micros = micros.combine_chunks()
        arrays = [t[by].combine_chunks(), micros,
                  pa.array(np.zeros(n, dtype=np.int8)),
                  pa.array(np.zeros(n, dtype=np.int64)),
                  pa.array(np.zeros(n, dtype=np.int64))]
        names = [by, "t_us", "__side", "__start", "__end"]
        for c in p_cols:
            arrays.append(t[c].combine_chunks())
            names.append("p__" + c)
        for c in i_cols:
            arrays.append(_pad(n, pa.int64()))
            names.append("i__" + c)
        return pa.Table.from_arrays(arrays, names=names)

    def _prep_intervals(t: pa.Table) -> pa.Table:
        n = len(t)
        arrays = [t[by].combine_chunks(),
                  pa.array(np.zeros(n, dtype=np.int64)),
                  pa.array(np.ones(n, dtype=np.int8)),
                  t[start_col].combine_chunks(), t[end_col].combine_chunks()]
        names = [by, "t_us", "__side", "__start", "__end"]
        for c in p_cols:
            arrays.append(_pad(n, pa.int64()))
            names.append("p__" + c)
        for c in i_cols:
            arrays.append(t[c].combine_chunks())
            names.append("i__" + c)
        return pa.Table.from_arrays(arrays, names=names)

    def _join(df: pd.DataFrame) -> pd.DataFrame:
        pts = df[df["__side"] == 0]
        ivs = df[df["__side"] == 1]
        out_cols = ([by, "t_us"] + [point_keep[c] for c in p_cols]
                    + [interval_keep[c] for c in i_cols])
        if not len(pts) or not len(ivs):
            return pd.DataFrame({c: pd.Series(dtype="int64")
                                 for c in out_cols})
        starts = ivs["__start"].to_numpy(dtype=np.int64)
        order = np.argsort(starts, kind="stable")
        starts = starts[order]
        ends = ivs["__end"].to_numpy(dtype=np.int64)[order]
        t = pts["t_us"].to_numpy(dtype=np.int64)
        idx = np.searchsorted(starts, t, side="right") - 1
        safe = np.maximum(idx, 0)
        matched = (idx >= 0) & (t <= ends[safe])
        pts = pts[matched]
        out = {by: pts[by].to_numpy(dtype=np.int64),
               "t_us": t[matched]}
        for c in p_cols:
            out[point_keep[c]] = pts["p__" + c].to_numpy()
        sel = safe[matched]
        for c in i_cols:
            out[interval_keep[c]] = ivs["i__" + c].to_numpy()[order][sel]
        return pd.DataFrame(out)

    tagged_p = points_ds.map_batches(_prep_points, batch_format="pyarrow")
    tagged_i = intervals_ds.map_batches(_prep_intervals,
                                        batch_format="pyarrow")
    return (tagged_p.union(tagged_i)
            .groupby(by)
            .map_groups(_join, batch_format="pandas"))


def json_field_int64(ds, json_col: str = "props", key: str = "k",
                     out_col: str | None = None):
    """Extract an integer field from a JSON-string column — the
    semi-structured projection every event/log pipeline needs before it
    can aggregate (``props`` payloads, crawler metadata, API dumps).

    Rows where the field is missing, non-numeric, or the JSON is invalid
    are DROPPED (SQL ``json_extract`` returns NULL there and aggregates
    skip NULLs — dropping keeps the engine and a SQL oracle bit-exact on
    integer sums/counts).  Runs as a per-batch map (stdlib ``json``; the
    parse is per-row by nature), no shuffle.
    """
    import json as _json

    out_col = out_col or key

    def _ex(batch: pd.DataFrame) -> pd.DataFrame:
        n = len(batch)
        vals = np.zeros(n, dtype=np.int64)
        keep = np.zeros(n, dtype=bool)
        for i, s in enumerate(batch[json_col]):
            try:
                v = _json.loads(s).get(key)
            except (TypeError, ValueError):
                continue
            if isinstance(v, bool) or not isinstance(v, (int, float)):
                continue
            vals[i] = int(v)
            keep[i] = True
        out = batch.loc[keep].copy()
        out[out_col] = vals[keep]
        return out.drop(columns=[json_col])

    return ds.map_batches(_ex, batch_format="pandas")


def lag_gaps(events_ds, by: str = "user_id", on: str = "ts",
             id_col: str = "event_id"):
    """Per-row previous-event gap — the SQL ``LAG`` window analogue.

    For each key, order rows by ``(on, id_col)`` and emit
    ``gap_us = t - prev_t`` in epoch microseconds (null for the first row
    of each key).  One hash exchange on the key, then an in-task lexsort
    + vectorized diff per group — no total-order sort of the table.
    Partitioning assumption: one key's rows fit a worker task (same as
    sessionize / grouped_topk)."""

    def _to_us(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t[by].combine_chunks(), t[id_col].combine_chunks(),
             _ts_us_i64(t[on])],
            names=[by, id_col, "t_us"])

    def _gap(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({id_col: pd.Series(dtype="int64"),
                                 "gap_us": pd.Series(dtype="float64")})
        order = np.lexsort((df[id_col].to_numpy(),
                            df["t_us"].to_numpy()))
        t = df["t_us"].to_numpy(dtype=np.int64)[order]
        ids = df[id_col].to_numpy()[order]
        gap = np.empty(len(t), dtype=np.float64)
        gap[0] = np.nan
        gap[1:] = (t[1:] - t[:-1]).astype(np.float64)
        return pd.DataFrame({id_col: ids, "gap_us": gap})

    return (events_ds
            .map_batches(_to_us, batch_format="pyarrow")
            .groupby(by)
            .map_groups(_gap, batch_format="pandas"))


def distinct_count_by(events_ds, by_expr_col: str, key: str,
                      out_col: str = "n_distinct"):
    """Exact ``COUNT(DISTINCT key) GROUP BY by`` with a per-batch
    combiner: each batch first dedups its own (by, key) rows (packed
    lexsort — removes the bulk of repeats before anything moves), then
    ONE hash ``groupby(by, key)`` dedups globally and a second,
    bounded-cardinality ``groupby(by).count`` produces the counts.  The
    wide exchange carries distinct (by, key) rows, not raw events —
    the standard two-level exact-distinct shape (use the HLL sketch
    when approximate is acceptable and even that exchange is too wide).
    """
    from .relational import distinct, rename

    def _local_dedup(df: pd.DataFrame) -> pd.DataFrame:
        b = df[by_expr_col].to_numpy()
        k = df[key].to_numpy()
        if (np.issubdtype(b.dtype, np.integer)
                and np.issubdtype(k.dtype, np.integer)
                and len(k) and (k >= 0).all() and k.max() < 2 ** 32
                and (b >= 0).all()):
            # packed-int fast path: one np.unique instead of a pandas
            # hash dedup (ids/buckets are the common case)
            packed = np.unique((b.astype(np.int64) << 32)
                               | k.astype(np.int64))
            return pd.DataFrame({by_expr_col: packed >> 32,
                                 key: packed & 0xFFFFFFFF})
        out = df[[by_expr_col, key]].drop_duplicates()
        # keep block dtypes identical across batches whichever branch ran
        for c in (by_expr_col, key):
            if np.issubdtype(out[c].dtype, np.integer):
                out[c] = out[c].astype(np.int64)
        return out

    ded = events_ds.map_batches(_local_dedup, batch_format="pandas")
    uniq = distinct(ded, [by_expr_col, key])
    return rename(uniq.groupby(by_expr_col).count(),
                  {"count()": out_col})


def percent_rank(ds, by: str, order_col: str, tiebreak: str,
                 out_col: str = "pr"):
    """SQL ``PERCENT_RANK() OVER (PARTITION BY by ORDER BY order_col)``
    — per key, ``(rank - 1) / (n - 1)`` where ``rank`` is the 1-based
    minimum rank (ties on ``order_col`` share a rank); a single-row
    group gets 0.0.  ``tiebreak`` is carried through as the row identity
    column only — it does NOT affect the rank, exactly like the SQL
    window (ties share ``pr`` regardless of physical order).  One hash
    shuffle on the key, in-task sort per group; emits
    ``by, tiebreak, order_col, out_col``.  Partitioning assumption: one
    key's rows fit a worker task."""

    def _pr(df: pd.DataFrame) -> pd.DataFrame:
        v = df[order_col].to_numpy()
        order = np.argsort(v, kind="stable")
        sv = v[order]
        n = len(df)
        # min-rank with ties: position of first equal value in the sort
        rank0 = np.searchsorted(sv, sv, side="left").astype(np.float64)
        pr = rank0 / (n - 1) if n > 1 else np.zeros(1, dtype=np.float64)
        out = df.iloc[order][[by, tiebreak, order_col]].copy()
        out[out_col] = pr
        return out

    return ds.groupby(by).map_groups(_pr, batch_format="pandas")


def ntile(ds, by: str, order_col: str, tiebreak: str, n: int,
          out_col: str = "tile"):
    """SQL ``NTILE(n) OVER (PARTITION BY by ORDER BY order_col,
    tiebreak)`` — per key, split the ordered rows into n buckets, the
    first ``count % n`` buckets one row larger (DuckDB/ANSI rule).
    The (order_col, tiebreak) pair must be unique per key for an
    engine-independent result.  One hash shuffle on the key, in-task
    argsort per group; emits ``by, tiebreak, order_col, out_col``.
    Partitioning assumption: one key's rows fit a worker task."""

    def _tile(df: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((df[tiebreak].to_numpy(),
                            df[order_col].to_numpy()))
        cnt = len(df)
        base = cnt // n
        extra = cnt % n
        sizes = np.full(min(n, cnt) if base == 0 else n, base,
                        dtype=np.int64)
        if base == 0:
            sizes[:] = 1        # fewer rows than tiles: one row per tile
        else:
            sizes[:extra] += 1
        tiles = np.repeat(np.arange(1, len(sizes) + 1, dtype=np.int64),
                          sizes[:len(sizes)])[:cnt]
        out = df.iloc[order][[by, tiebreak, order_col]].copy()
        out[out_col] = tiles
        return out

    return ds.groupby(by).map_groups(_tile, batch_format="pandas")


def funnel_counts(ds, steps, user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts"):
    """Ordered funnel conversion: for each stage i, how many users
    performed steps[0..i] in strict chronological order (greedy
    earliest-completion semantics — stage i's timestamp is the earliest
    occurrence strictly after stage i-1's, the standard product-funnel
    rule and exactly the SQL twin's MIN(ts) chain).

    One hash shuffle on the user; the per-user scan touches only that
    user's events.  Returns ``(stage, step, n_users)``.
    """
    import pandas as pd

    steps = list(steps)

    def _depth(g: pd.DataFrame) -> pd.DataFrame:
        t_prev = None
        depth = 0
        for s in steps:
            sub = g[g[type_col] == s][ts_col]
            if t_prev is not None:
                sub = sub[sub > t_prev]
            if not len(sub):
                break
            t_prev = sub.min()
            depth += 1
        return pd.DataFrame({"depth": [depth]})

    # (no rename_columns here: map_groups emits pandas blocks, where
    # Ray's rename_columns — an Arrow-block op — fails)
    depths = (ds.select_columns([user_col, type_col, ts_col])
              .groupby(user_col).map_groups(_depth, batch_format="pandas")
              .groupby("depth").count().to_pandas())
    # tiny driver fold: n_users reaching >= stage i (dict of ≤len(steps))
    byd = dict(zip(depths["depth"], depths["count()"]))
    rows = []
    cum = 0
    for stage in range(len(steps), 0, -1):
        cum += int(byd.get(stage, 0))
        rows.append({"stage": stage - 1, "step": steps[stage - 1],
                     "n_users": cum})
    import ray.data as rd
    return rd.from_pandas(pd.DataFrame(list(reversed(rows))))


def new_user_growth(ds, user_col: str = "user_id", ts_col: str = "ts"):
    """Cumulative new-user growth curve: per hour bucket, the number of
    FIRST-SEEN users and the running total — the standard signup-growth
    chart, exact integers end to end.

    groupby-min (first-seen hour per user) → hourly count → the
    distributed two-phase :func:`..aggregates.prefix_sum` scan.  Returns
    ``(hour_bucket, new_users, cum_users)``; hour_bucket = epoch
    microseconds // 3600e6 (events_hourly's bucket rule).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .aggregates import prefix_sum

    def _bucket(t: pa.Table) -> pa.Table:
        # normalize to microseconds first — parquet/pandas sources differ
        # in timestamp resolution (us vs ns)
        micros = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                         pa.int64())
        hour = pc.divide(micros, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({
            user_col: t[user_col].combine_chunks(),
            "h": hour.combine_chunks()
            if isinstance(hour, pa.ChunkedArray) else hour})

    first = (ds.select_columns([user_col, ts_col])
             .map_batches(_bucket, batch_format="pyarrow")
             .groupby(user_col).min("h"))
    hourly = (first.map_batches(
        lambda t: pa.table({"hour_bucket":
                            t["min(h)"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow")
        .groupby("hour_bucket").count()
        .rename_columns({"count()": "new_users"}))
    cum = prefix_sum(hourly, "hour_bucket", "new_users",
                     out_col="cum_users")
    return cum


def transition_counts(ds, user_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id"):
    """First-order transition (Markov bigram) counts over each user's
    event stream: ``(prev_type, next_type, n)`` — the training table for
    sequence models / next-event prediction.

    One user-keyed shuffle; within each group events are ordered by
    ``(ts, id)`` (the id tie-break makes simultaneous events
    deterministic and exactly mirrors the SQL LAG window), then a tiny
    two-key count shuffle over the bigram pairs.
    """
    import pandas as pd

    def _pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, id_col])
        a = g[type_col].to_numpy()
        if len(a) < 2:
            return pd.DataFrame({"prev_type": pd.Series(dtype="object"),
                                 "next_type": pd.Series(dtype="object")})
        return pd.DataFrame({"prev_type": a[:-1], "next_type": a[1:]})

    pairs = (ds.select_columns([user_col, type_col, ts_col, id_col])
             .groupby(user_col).map_groups(_pairs, batch_format="pandas"))
    # rename via an Arrow map: Ray's rename_columns fails on the pandas
    # blocks this groupby emits
    return (pairs.groupby(["prev_type", "next_type"]).count()
            .map_batches(
                lambda t: t.rename_columns(
                    ["n" if c == "count()" else c
                     for c in t.column_names]),
                batch_format="pyarrow"))


def retention_cohorts(ds, user_col: str = "user_id", ts_col: str = "ts"):
    """Cohort retention matrix: users are cohorted by first-seen hour;
    for every (cohort_hour, offset_h) the count of cohort members active
    in that later hour — the standard retention triangle, exact integers
    end to end.

    groupby-min (cohort per user) ⋈ distinct (user, hour) activity on
    the user key, then one two-key count shuffle.  Returns
    ``(cohort_hour, offset_h, n_users)`` (offset_h = 0 row is cohort
    size).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .relational import distinct, inner_join

    def _bucket(t: pa.Table) -> pa.Table:
        micros = pc.cast(pc.cast(t[ts_col], pa.timestamp("us")),
                         pa.int64())
        hour = pc.divide(micros, pa.scalar(3_600_000_000, pa.int64()))
        return pa.table({
            user_col: t[user_col].combine_chunks(),
            "h": hour.combine_chunks()
            if isinstance(hour, pa.ChunkedArray) else hour})

    from .schema_util import drop_empty_blocks

    hours = (ds.select_columns([user_col, ts_col])
             .map_batches(_bucket, batch_format="pyarrow")).materialize()
    # drop schema-less empty blocks the groupby/distinct shuffles emit —
    # they poison the join's schema broadcast (see schema_util)
    cohort = drop_empty_blocks(hours.groupby(user_col).min("h").map_batches(
        lambda t: pa.table({
            user_col: t[user_col].combine_chunks(),
            "cohort_hour": t["min(h)"].combine_chunks().cast(pa.int64())}),
        batch_format="pyarrow"))
    active = drop_empty_blocks(distinct(hours, [user_col, "h"]))
    j = inner_join(active, cohort, on=user_col)

    def _offset(t: pa.Table) -> pa.Table:
        off = pc.subtract(t["h"], t["cohort_hour"])
        return pa.table({
            "cohort_hour": t["cohort_hour"].combine_chunks(),
            "offset_h": off.combine_chunks()
            if isinstance(off, pa.ChunkedArray) else off})

    return (j.map_batches(_offset, batch_format="pyarrow")
            .groupby(["cohort_hour", "offset_h"]).count()
            .map_batches(
                lambda t: t.rename_columns(
                    ["n_users" if c == "count()" else c
                     for c in t.column_names]),
                batch_format="pyarrow"))


def recency_activity(events_ds, user_col: str = "user_id",
                     ts_col: str = "ts", max_age_days: int = 40):
    """Recency-weighted activity per user: ``Σ 2^(-age_days)`` over the
    user's events, ``age_days = floor((t_max − ts)/86400 s)`` anchored at
    the global max timestamp (deterministic — no wall clock) and clamped
    at ``max_age_days``.

    The base-2 decay is chosen for CROSS-ENGINE BIT-EXACTNESS: every
    term is an exact dyadic double (2^-k), so any summation order gives
    identical bits as long as the per-user sum's exponent span stays
    within the 53-bit mantissa — with the 40-day clamp that holds up to
    ~4096 events per user, documented here as the exactness envelope
    (beyond it the result is still deterministic per engine, only the
    last ulp may differ from the SQL twin).

    Shape: one streaming max, one vectorized ``np.ldexp`` map, one
    single-key grouped float sum.  Returns ``(user_id, recency)``.
    """
    import numpy as np

    tmax = events_ds.max(ts_col)
    tmax_us = int(pd.Timestamp(tmax).value // 1000) \
        if not isinstance(tmax, (int, np.integer)) else int(tmax)

    def _terms(t: pa.Table) -> pa.Table:
        ts_us = _ts_us_i64(t[ts_col]).to_numpy(zero_copy_only=False)
        age = np.minimum((tmax_us - ts_us) // 86_400_000_000,
                         max_age_days).astype(np.int64)
        term = np.ldexp(1.0, -age)
        return pa.table({user_col: t[user_col].combine_chunks()
                         .cast(pa.int64()),
                         "term": pa.array(term, pa.float64())})

    from .relational import rename

    out = (events_ds.map_batches(_terms, batch_format="pyarrow")
           .groupby(user_col).sum("term"))
    return rename(out, {"sum(term)": "recency"})


def gap_quantiles(events_ds, by: str = "user_id", on: str = "ts",
                  id_col: str = "event_id", qs=(0.25, 0.5, 0.9)):
    """Per-key ``quantile_cont`` of inter-arrival gaps (µs) — the
    rhythm-of-activity profile (bot detection, engagement tiers).

    ONE hash exchange: the LAG diff AND the DuckDB interpolator run
    inside the same ``map_groups`` pass (first event per key contributes
    no gap; keys with a single event emit no row).  Interpolator form is
    the repo's bit-exact ``quantile_cont`` twin (stats.group_quantiles).
    Partitioning assumption: one key's rows fit a worker task (same as
    sessionize / lag_gaps).  Returns ``(by, q, value)``.
    """
    qs = tuple(float(q) for q in qs)

    def _to_us(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t[by].combine_chunks(), t[id_col].combine_chunks(),
             _ts_us_i64(t[on])],
            names=[by, id_col, "t_us"])

    def _q(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({by: pd.Series(dtype="int64"),
                              "q": pd.Series(dtype="float64"),
                              "value": pd.Series(dtype="float64")})
        if len(g) < 2:
            return empty
        from .stats import interp_quantiles
        order = np.lexsort((g[id_col].to_numpy(), g["t_us"].to_numpy()))
        t = g["t_us"].to_numpy(dtype=np.int64)[order]
        x = np.sort((t[1:] - t[:-1]).astype(np.float64))
        vals = interp_quantiles(x, qs)
        return pd.DataFrame({by: np.full(len(qs), g[by].iloc[0]),
                             "q": np.asarray(qs, dtype=np.float64),
                             "value": np.asarray(vals, dtype=np.float64)})

    return (events_ds
            .map_batches(_to_us, batch_format="pyarrow")
            .groupby(by)
            .map_groups(_q, batch_format="pandas"))


def rfm_segments(orders_ds, cust_col: str = "o_custkey",
                 date_col: str = "o_orderdate",
                 price_col: str = "o_totalprice", n_tiles: int = 5):
    """Classic RFM customer segmentation: per customer the recency
    anchor (last order, epoch µs), order count, and exact monetary cents,
    each scored 1..n by global ``NTILE`` over ``(metric, custkey)``
    (DuckDB/ANSI bucket rule: the first ``count % n`` buckets one row
    larger; tile n = most recent / most frequent / highest spend).

    Shape: ONE per-customer map_groups aggregate (exact int64 cents —
    float money never sums), then the three tile assignments in one
    task over the customer summary table.  Scale note: the global NTILE
    step holds ONE ROW PER CUSTOMER (not per order); past ~10^8
    customers swap it for exact quantile boundaries
    (stats.exact_quantiles) and CASE buckets, trading ANSI tie handling
    for a fully distributed plan.
    """
    def _agg(g: pd.DataFrame) -> pd.DataFrame:
        us = g["_us"].to_numpy(dtype=np.int64)
        cents = g["_cents"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "custkey": [int(g[cust_col].iloc[0])],
            "last_us": [int(us.max())],
            "f": [len(g)],
            "m_cents": [int(cents.sum())]})

    def _prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(
            t[price_col].combine_chunks().cast(pa.float64()),
            pa.scalar(100.0))), pa.int64())
        return pa.table({cust_col: t[cust_col].combine_chunks(),
                         "_us": _ts_us_i64(t[date_col]),
                         "_cents": cents})

    summary = (orders_ds.map_batches(_prep, batch_format="pyarrow")
               .groupby(cust_col).map_groups(_agg, batch_format="pandas"))

    def _tiles(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("custkey").reset_index(drop=True)
        n = len(df)

        def _ntile(metric):
            order = np.lexsort((df["custkey"].to_numpy(),
                                df[metric].to_numpy()))
            base, extra = n // n_tiles, n % n_tiles
            sizes = np.full(n_tiles, base, dtype=np.int64)
            sizes[:extra] += 1
            tiles = np.repeat(np.arange(1, n_tiles + 1, dtype=np.int64),
                              sizes)[:n]
            out = np.empty(n, dtype=np.int64)
            out[order] = tiles
            return out

        df["rscore"] = _ntile("last_us")
        df["fscore"] = _ntile("f")
        df["mscore"] = _ntile("m_cents")
        return df

    return (summary.repartition(1)
            .map_batches(_tiles, batch_format="pandas", batch_size=None))


def hopping_window_counts(ds, ts_col: str = "ts",
                          width_us: int = 3 * 3_600_000_000,
                          hop_us: int = 3_600_000_000):
    """Hopping (sliding) window event counts: window k covers
    ``[k·hop, k·hop + width)`` epoch microseconds, ``width`` a multiple
    of ``hop`` — the streaming-SQL HOP/HOPPING window as a batch
    operator.  Returns ``(window_start, n)``, window_start in epoch µs.

    Window membership is a PURE FUNCTION of the timestamp (an event at
    ts falls in exactly width/hop windows, k = ts//hop − j for
    j = 0..m−1), so this is one per-batch integer explode followed by a
    single count shuffle over window keys — no join, no sort, and the
    exchange carries ≤ m·|hours with data| counter rows after the
    per-block Arrow pre-combine.
    """
    if width_us % hop_us != 0:
        raise ValueError("width_us must be a multiple of hop_us")
    m = width_us // hop_us

    def _explode(t: pa.Table) -> pa.Table:
        us = _ts_us_i64(t[ts_col]).to_numpy(zero_copy_only=False)
        q = us // hop_us
        ks = (q[:, None] - np.arange(m, dtype=np.int64)[None, :]).ravel()
        starts = ks * hop_us
        # per-block pre-combine: ship (window, count) partials only
        part = pa.table({"window_start": pa.array(starts, pa.int64()),
                         "one": pa.array(np.ones(len(starts), np.int64),
                                         pa.int64())})
        agg = part.group_by(["window_start"]).aggregate([("one", "sum")])
        return agg.rename_columns(["window_start", "n"])

    out = (ds.select_columns([ts_col])
           .map_batches(_explode, batch_format="pyarrow")
           .groupby("window_start").sum("n"))
    return out.map_batches(
        lambda t: pa.table({"window_start": t["window_start"],
                            "n": t["sum(n)"].combine_chunks()
                            .cast(pa.int64())}),
        batch_format="pyarrow")
