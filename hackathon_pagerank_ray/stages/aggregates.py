"""Pre-aggregated (combiner-style) wide aggregations.

The canonical pattern for a grouped aggregate whose group cardinality is
tiny compared to the input (TPC-H Q1: billions of lineitems, ~6 groups):
compute per-block partial sums inside ``map_batches`` (vectorized Arrow
``group_by``), then shuffle only the partials — a few rows per block —
through ``groupby().sum()``.  The all-to-all exchange moves kilobytes
regardless of input size.

Monetary sums are carried as scaled int64 (cents / micro-units) so the
result is exact and summation-order independent — the same convention the
repo's SQL oracles use (``SUM(CAST(ROUND(x*100) AS BIGINT))/100.0``).
At ~1e8+ rows × 1e11 scaled units a single group's sum approaches int64
range; a 100 TB deployment would widen the partials to decimal128, which
Arrow supports with the same layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PARTIALS = ["sum_qty100", "sum_price100", "sum_disc_price6",
             "sum_charge6", "sum_disc100", "count_order"]


def _scaled_int(arr, scale: float) -> pa.Array:
    out = pc.round(pc.multiply(arr, pa.scalar(float(scale))))
    out = pc.cast(out, pa.int64())
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


def pricing_summary(li_ds, cutoff: str = "1998-09-02"):
    """TPC-H-Q1-shaped pricing summary over ``lineitem``.

    Returns one row per (l_returnflag, l_linestatus) with sum_qty,
    sum_base_price, sum_disc_price, sum_charge, avg_qty, avg_price,
    avg_disc, count_order for rows with ``l_shipdate <= cutoff``.
    Reference analogue: the per-key aggregate tables the backend derives
    from crawl metadata (SURVEY.md A-family); expressed here as the
    partial-combine idiom that survives web scale.
    """
    import datetime as _dt

    cut = _dt.datetime.fromisoformat(cutoff)

    def _partial(t: pa.Table) -> pa.Table:
        mask = pc.less_equal(t["l_shipdate"], pa.scalar(cut))
        t = t.filter(mask)
        disc1 = pc.subtract(pa.scalar(1.0), t["l_discount"])
        disc_price = pc.multiply(t["l_extendedprice"], disc1)
        charge = pc.multiply(disc_price,
                             pc.add(pa.scalar(1.0), t["l_tax"]))
        prep = pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty100": _scaled_int(t["l_quantity"], 100),
            "sum_price100": _scaled_int(t["l_extendedprice"], 100),
            "sum_disc_price6": _scaled_int(disc_price, 1e6),
            "sum_charge6": _scaled_int(charge, 1e6),
            "sum_disc100": _scaled_int(t["l_discount"], 100),
        })
        part = prep.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [(c, "sum") for c in _PARTIALS[:-1]]
            + [("sum_qty100", "count")])
        return part.rename_columns(
            ["l_returnflag", "l_linestatus"] + _PARTIALS)

    partials = li_ds.map_batches(_partial, batch_format="pyarrow")
    merged = partials.groupby(["l_returnflag", "l_linestatus"]).sum(
        _PARTIALS)

    def _final(t: pa.Table) -> pa.Table:
        def col(name):
            c = t[f"sum({name})"]
            return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

        n = pc.cast(col("count_order"), pa.float64())
        sum_qty = pc.divide(pc.cast(col("sum_qty100"), pa.float64()),
                            pa.scalar(100.0))
        sum_price = pc.divide(pc.cast(col("sum_price100"), pa.float64()),
                              pa.scalar(100.0))
        sum_disc = pc.divide(pc.cast(col("sum_disc100"), pa.float64()),
                             pa.scalar(100.0))
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": sum_qty,
            "sum_base_price": sum_price,
            "sum_disc_price": pc.divide(
                pc.cast(col("sum_disc_price6"), pa.float64()),
                pa.scalar(1e6)),
            "sum_charge": pc.divide(
                pc.cast(col("sum_charge6"), pa.float64()), pa.scalar(1e6)),
            "avg_qty": pc.divide(sum_qty, n),
            "avg_price": pc.divide(sum_price, n),
            "avg_disc": pc.divide(sum_disc, n),
            "count_order": col("count_order"),
        })

    return merged.map_batches(_final, batch_format="pyarrow")


def pivot_counts(ds, row_key: str, col_key: str, values: list[str],
                 prefix: str = "n_"):
    """Crosstab / PIVOT: one output row per ``row_key`` value with a
    ``{prefix}{v}`` count column per pivot value.

    ``values`` must be the known pivot domain (standard for PIVOT —
    discover it with a cheap ``distinct`` pass if unknown).  Same
    combiner shape as :func:`pricing_summary`: per-block Arrow group_by
    partials (one int64 column per pivot value), then a tiny
    ``groupby().sum()`` — the exchange carries |row keys| × |values|
    counters, never rows."""
    cols = [f"{prefix}{v}" for v in values]

    def _partial(t: pa.Table) -> pa.Table:
        ck = t[col_key]
        arrays = {row_key: t[row_key]}
        for v, c in zip(values, cols):
            flag = pc.cast(pc.equal(ck, pa.scalar(v)), pa.int64())
            arrays[c] = (flag.combine_chunks()
                         if isinstance(flag, pa.ChunkedArray) else flag)
        part = pa.table(arrays).group_by([row_key]).aggregate(
            [(c, "sum") for c in cols])
        return part.rename_columns([row_key] + cols)

    merged = ds.map_batches(_partial, batch_format="pyarrow") \
        .groupby(row_key).sum(cols)
    return merged.rename_columns({f"sum({c})": c for c in cols})


def _grouping_sets_small(finest, keys, sets, total_label):
    """Fold ALL coarser grouping sets of a small finest aggregate in ONE
    worker task (adaptive small path, r5): every Ray groupby above the
    finest level pays the sort-groupby's multi-second fixed floor just
    to re-aggregate a group-cardinality-sized table — below the gate the
    whole lattice is a handful of vectorized Arrow ``group_by`` calls on
    one concatenated table.  Scaled-int sums make the fold bit-identical
    to the per-level exchange path."""
    import ray

    @ray.remote
    def _fold(*parts):
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return pa.table({k: pa.array([], pa.string()) for k in keys}
                            | {"v100": pa.array([], pa.int64()),
                               "n": pa.array([], pa.int64())})
        t = pa.concat_tables(parts)
        outs = [t]
        for kept in sets:
            kept = list(kept)
            if kept:
                g = t.group_by(kept).aggregate(
                    [("v100", "sum"), ("n", "sum")])
                g = g.rename_columns(kept + ["v100", "n"])
            else:
                g = pa.table({"v100": pa.array(
                    [pc.sum(t["v100"]).as_py() or 0], pa.int64()),
                    "n": pa.array([pc.sum(t["n"]).as_py() or 0],
                                  pa.int64())})
            n = g.num_rows
            outs.append(pa.table(
                {k: (g[k] if k in kept
                     else pa.array([total_label] * n, pa.string()))
                 for k in keys}
                | {"v100": g["v100"], "n": g["n"]}))
        return pa.concat_tables(outs)

    import ray.data as rd
    return rd.from_arrow_refs([_fold.remote(*finest.to_arrow_refs())])


def rollup_counts(ds, keys: list[str], agg_col: str,
                  total_label: str = "ALL"):
    """GROUP BY ROLLUP over ``keys``: sums of ``agg_col`` (scaled-cent
    exact) at every prefix level, subtotal rows carrying ``total_label``
    in the rolled-up key columns (string keys only).

    One pass computes the finest-level partials per block; each coarser
    level folds from the finest aggregate — so the input is read once and
    every exchange above the first moves only group-cardinality rows."""
    def _partial(t: pa.Table) -> pa.Table:
        prep = pa.table(
            {k: t[k] for k in keys}
            | {"v100": _scaled_int(t[agg_col], 100)})
        part = prep.group_by(keys).aggregate(
            [("v100", "sum"), ("v100", "count")])
        return part.rename_columns(keys + ["v100", "n"])

    finest = (ds.map_batches(_partial, batch_format="pyarrow")
              .groupby(keys).sum(["v100", "n"])
              .rename_columns({"sum(v100)": "v100", "sum(n)": "n"})
              .materialize())

    sets = [tuple(keys[:depth]) for depth in range(len(keys) - 1, -1, -1)]
    if finest.count() <= 200_000:
        # the whole prefix ladder folds in one task (bit-identical —
        # exact scaled-int sums)
        out = _grouping_sets_small(finest, keys, sets, total_label)
    else:
        levels = [finest]
        for kept_t in sets:
            kept = list(kept_t)
            rolled = keys[len(kept):]

            def _fold(t: pa.Table, kept=kept, rolled=rolled) -> pa.Table:
                n = t.num_rows
                arrays = {k: t[k] for k in kept}
                arrays |= {k: pa.array([total_label] * n, pa.string())
                           for k in rolled}
                arrays |= {"v100": t["v100"], "n": t["n"]}
                return pa.table(arrays)

            lvl = finest.map_batches(_fold, batch_format="pyarrow")
            if kept:
                lvl = (lvl.groupby(kept).sum(["v100", "n"])
                       .rename_columns({"sum(v100)": "v100",
                                        "sum(n)": "n"}))
                lvl = lvl.map_batches(
                    lambda t, kept=kept, rolled=rolled: pa.table(
                        {k: t[k] for k in kept}
                        | {k: pa.array([total_label] * t.num_rows,
                                       pa.string()) for k in rolled}
                        | {"v100": t["v100"], "n": t["n"]}),
                    batch_format="pyarrow")
            else:
                lvl = (lvl.groupby(rolled).sum(["v100", "n"])
                       .rename_columns({"sum(v100)": "v100",
                                        "sum(n)": "n"}))
            levels.append(lvl)

        out = levels[0]
        for lvl in levels[1:]:
            out = out.union(lvl)

    def _final(t: pa.Table) -> pa.Table:
        return pa.table(
            {k: t[k] for k in keys}
            | {"total": pc.divide(pc.cast(t["v100"], pa.float64()),
                                  pa.scalar(100.0)),
               "n": pc.cast(t["n"], pa.int64())})

    return out.map_batches(_final, batch_format="pyarrow")


def _cube_final(keys):
    def _final(t: pa.Table) -> pa.Table:
        return pa.table(
            {k: t[k] for k in keys}
            | {"total": pc.divide(pc.cast(t["v100"], pa.float64()),
                                  pa.scalar(100.0)),
               "n": pc.cast(t["n"], pa.int64())})
    return _final


def cube_counts(ds, keys: list[str], agg_col: str,
                total_label: str = "ALL"):
    """GROUP BY CUBE over ``keys``: sums of ``agg_col`` (scaled-cent
    exact) at EVERY subset of the keys (2^k grouping sets), subtotal
    rows carrying ``total_label`` in the rolled-up key columns (string
    keys only) — the lattice completion of :func:`rollup_counts`, which
    only emits prefix levels.

    Same one-pass shape: the finest level is computed with per-block
    combiner partials; every other grouping set folds from the finest
    aggregate, so the input is read once and each exchange above the
    first moves only group-cardinality rows.  Exact scaled-int sums make
    every fold summation-order independent."""
    from itertools import combinations

    def _partial(t: pa.Table) -> pa.Table:
        prep = pa.table(
            {k: t[k] for k in keys}
            | {"v100": _scaled_int(t[agg_col], 100)})
        part = prep.group_by(keys).aggregate(
            [("v100", "sum"), ("v100", "count")])
        return part.rename_columns(keys + ["v100", "n"])

    finest = (ds.map_batches(_partial, batch_format="pyarrow")
              .groupby(keys).sum(["v100", "n"])
              .rename_columns({"sum(v100)": "v100", "sum(n)": "n"})
              .materialize())

    def _label(t: pa.Table, kept: tuple) -> pa.Table:
        n = t.num_rows
        return pa.table(
            {k: (t[k] if k in kept
                 else pa.array([total_label] * n, pa.string()))
             for k in keys}
            | {"v100": t["v100"], "n": t["n"]})

    sets = [kept for r in range(len(keys) - 1, -1, -1)
            for kept in combinations(keys, r)]
    if finest.count() <= 200_000:
        # whole 2^k lattice folded in one task (bit-identical — exact
        # scaled-int sums); the per-set Ray groupby path remains for
        # high-cardinality finest levels
        out = _grouping_sets_small(finest, keys, sets, total_label)
        return out.map_batches(_cube_final(keys), batch_format="pyarrow")
    levels = [finest]
    for r in range(len(keys) - 1, -1, -1):
        for kept in combinations(keys, r):
            if kept:
                lvl = (finest.groupby(list(kept)).sum(["v100", "n"])
                       .rename_columns({"sum(v100)": "v100",
                                        "sum(n)": "n"}))
            else:
                # grand total: fold the tiny finest table per block,
                # then one groupby over a constant key
                def _grand(t: pa.Table) -> pa.Table:
                    if t.num_rows == 0:
                        return pa.table({"_g": pa.array([], pa.int64()),
                                         "v100": pa.array([], pa.int64()),
                                         "n": pa.array([], pa.int64())})
                    return pa.table({
                        "_g": pa.array([0], pa.int64()),
                        "v100": pa.array([pc.sum(t["v100"]).as_py()],
                                         pa.int64()),
                        "n": pa.array([pc.sum(t["n"]).as_py()],
                                      pa.int64())})

                lvl = (finest.map_batches(_grand, batch_format="pyarrow")
                       .groupby("_g").sum(["v100", "n"])
                       .rename_columns({"sum(v100)": "v100", "sum(n)": "n"})
                       .drop_columns(["_g"]))
            levels.append(lvl.map_batches(
                lambda t, kept=kept: _label(t, kept),
                batch_format="pyarrow"))

    out = levels[0]
    for lvl in levels[1:]:
        out = out.union(lvl)

    def _final(t: pa.Table) -> pa.Table:
        return pa.table(
            {k: t[k] for k in keys}
            | {"total": pc.divide(pc.cast(t["v100"], pa.float64()),
                                  pa.scalar(100.0)),
               "n": pc.cast(t["n"], pa.int64())})

    return out.map_batches(_final, batch_format="pyarrow")


def group_zscore(ds, key: str, col: str, out_col: str = "z",
                 broadcast_groups_max: int = 100_000):
    """Per-group z-score — the ``(x - AVG(x) OVER (PARTITION BY key)) /
    STDDEV_POP(...)`` window-aggregate analogue.

    Combiner pass: per-block per-key (Σx·100, Σx²·10⁴, n) scaled-int
    partials (exact for 2-decimal inputs, summation-order independent),
    reduced by one small ``groupby().sum()``.  The group-stats table then
    flows back: broadcast once via ``ray.put`` when ≤
    ``broadcast_groups_max`` groups (a per-batch dict lookup, no second
    shuffle), hash-joined otherwise.  Degenerate groups (var ≤ 0) get
    z = 0."""
    import numpy as np

    import ray

    def _partial(t: pa.Table) -> pa.Table:
        x = t[col]
        prep = pa.table({
            key: t[key],
            "s100": _scaled_int(x, 100),
            "sq4": _scaled_int(pc.multiply(x, x), 10_000),
        })
        part = prep.group_by([key]).aggregate(
            [("s100", "sum"), ("sq4", "sum"), ("s100", "count")])
        return part.rename_columns([key, "s100", "sq4", "n"])

    stats = (ds.map_batches(_partial, batch_format="pyarrow")
             .groupby(key).sum(["s100", "sq4", "n"]).materialize())

    def _mean_var(s100, sq4, n):
        mean = s100 / 100.0 / n
        var = sq4 / 10_000.0 / n - mean * mean
        return mean, var

    if stats.count() <= broadcast_groups_max:
        sdf = stats.to_pandas()
        mv = {}
        for k, s100, sq4, n in zip(sdf[key], sdf[f"sum(s100)"],
                                   sdf["sum(sq4)"], sdf["sum(n)"]):
            mv[k] = _mean_var(float(s100), float(sq4), int(n))
        ref = ray.put(mv)

        def _z(batch):
            import pandas as pd
            mv = ray.get(ref)
            x = batch[col].to_numpy(dtype=np.float64)
            mean = np.empty(len(x))
            sd = np.empty(len(x))
            for i, k in enumerate(batch[key]):
                m, v = mv[k]
                mean[i] = m
                sd[i] = np.sqrt(v) if v > 0 else np.inf
            batch[out_col] = (x - mean) / sd
            batch.loc[~np.isfinite(batch[out_col]), out_col] = 0.0
            return batch

        return ds.map_batches(_z, batch_format="pandas")

    from .relational import inner_join
    joined = inner_join(ds, stats, on=key)

    def _zj(batch):
        x = batch[col].to_numpy(dtype=np.float64)
        mean = batch["sum(s100)"].to_numpy(np.float64) / 100.0 \
            / batch["sum(n)"].to_numpy(np.float64)
        var = (batch["sum(sq4)"].to_numpy(np.float64) / 10_000.0
               / batch["sum(n)"].to_numpy(np.float64)) - mean * mean
        sd = np.where(var > 0, np.sqrt(np.maximum(var, 0)), np.inf)
        batch[out_col] = (x - mean) / sd
        batch.loc[~np.isfinite(batch[out_col]), out_col] = 0.0
        return batch.drop(columns=["sum(s100)", "sum(sq4)", "sum(n)"])

    return joined.map_batches(_zj, batch_format="pandas")


def pearson_corr(ds, x_col: str, y_col: str, scale: int = 100):
    """Pearson correlation of two ≤2-decimal columns as one combiner
    pass: per-block scaled-int partial sums of (x, y, xy, x², y², n) —
    exact and order-independent — merged with a single tiny reduce, then
    the textbook formula on the driver (one row out).

    int64 bound: |Σ x²·scale²| must stay under 2⁶³ — with 2-decimal
    inputs ≤ 10⁴ that holds to ~10¹⁴ rows; widen to decimal128 partials
    beyond.  Returns a one-row Dataset ``(corr_xy, n)``."""
    import math

    import pandas as pd
    import ray.data as rd

    s2 = scale * scale

    def _partial(t: pa.Table) -> pa.Table:
        x = t[x_col]
        y = t[y_col]
        return pa.table({
            "sx": [_sum64(_scaled_int(x, scale))],
            "sy": [_sum64(_scaled_int(y, scale))],
            "sxy": [_sum64(_scaled_int(pc.multiply(x, y), s2))],
            "sxx": [_sum64(_scaled_int(pc.multiply(x, x), s2))],
            "syy": [_sum64(_scaled_int(pc.multiply(y, y), s2))],
            "n": [t.num_rows],
        })

    p = ds.map_batches(_partial, batch_format="pyarrow").to_pandas()
    n = int(p["n"].sum()) if "n" in p.columns else 0
    if n == 0:
        return rd.from_pandas(pd.DataFrame(
            {"corr_xy": pd.Series(dtype="float64"),
             "n": pd.Series(dtype="int64")}))
    sx, sy = int(p["sx"].sum()), int(p["sy"].sum())
    sxy, sxx, syy = (int(p["sxy"].sum()), int(p["sxx"].sum()),
                     int(p["syy"].sum()))
    # exact integer moments, then one float expression (mirrored in SQL)
    num = float(n * sxy - sx * sy)
    den = math.sqrt(float(n * sxx - sx * sx)) * math.sqrt(
        float(n * syy - sy * sy))
    corr = num / den if den > 0 else float("nan")
    return rd.from_pandas(pd.DataFrame([{"corr_xy": corr, "n": n}]))


def _sum64(arr: pa.Array) -> int:
    v = pc.sum(arr)
    return int(v.as_py() or 0)


def prefix_sum(ds, order_col: str, value_col: str,
               out_col: str = "cum"):
    """Distributed inclusive prefix sum — the ``SUM(v) OVER (ORDER BY
    key)`` scan, a Dataset-API gap.

    Classic two-phase scan: (1) range-sort on ``order_col`` (the global
    order IS the semantics — this is the one shuffle), materialize, and
    reduce each block to (first_key, block_sum) — a block-count-sized
    table; (2) exclusive-scan those partials on the driver (tiny) and
    broadcast, then a second pass adds each block's offset to its
    in-block cumulative sum.  Blocks are matched to offsets by their
    first key, so ``order_col`` must be UNIQUE (ties would make block
    attribution ambiguous); ``value_col`` must be integer (exact sums,
    bit-identical to the SQL window).  Emits ``order_col, value_col,
    out_col``.
    """
    import ray

    srt = ds.select_columns([order_col, value_col]) \
            .sort(order_col).materialize()

    def _part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64())})
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        k = t[order_col].to_numpy(zero_copy_only=False)
        return pa.table({"first": pa.array([int(k[0])], pa.int64()),
                         "total": pa.array([int(v.sum())], pa.int64())})

    parts = (srt.map_batches(_part, batch_format="pyarrow",
                             batch_size=None).to_pandas()
             .sort_values("first").reset_index(drop=True))
    firsts = parts["first"].to_numpy()
    offsets = np.concatenate(([0], np.cumsum(parts["total"].to_numpy())[:-1]))
    ref = ray.put((firsts, offsets))

    def _scan(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({order_col: pa.array([], pa.int64()),
                             value_col: pa.array([], pa.int64()),
                             out_col: pa.array([], pa.int64())})
        f, off = ray.get(ref)
        k = t[order_col].to_numpy(zero_copy_only=False)
        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        i = int(np.searchsorted(f, int(k[0])))
        base = int(off[i])
        return pa.table({order_col: pa.array(k.astype(np.int64)),
                         value_col: pa.array(v),
                         out_col: pa.array(base + np.cumsum(v))})

    return srt.map_batches(_scan, batch_format="pyarrow", batch_size=None)


def group_mode(ds, by: str, col: str, out_col: str = "mode"):
    """Per-group most frequent value, ties to the smallest value — the
    deterministic MODE() (SQL twin: ROW_NUMBER() OVER (PARTITION BY key
    ORDER BY COUNT(*) DESC, value) = 1).

    Per-batch (key, value) pre-counts shrink the shuffle to the distinct
    pair count before the single hash shuffle on ``by``; the per-group
    pick then sums pair partials in-task.  Returns ``(by, out_col, n)``.
    """
    import pandas as pd

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby([by, col], sort=False).size()
                .reset_index(name="n"))

    def _pick(g: pd.DataFrame) -> pd.DataFrame:
        agg = g.groupby(col, sort=True)["n"].sum()
        best = int(agg.max())
        return pd.DataFrame({by: [g[by].iloc[0]],
                             out_col: [agg[agg == best].index.min()],
                             "n": [best]})

    return (ds.map_batches(_partial, batch_format="pandas")
            .groupby(by).map_groups(_pick, batch_format="pandas"))


def regr_slope_by(ds, by: str, x_col: str, y_col: str, scale: int = 100,
                  out_col: str = "slope"):
    """Per-group least-squares slope of y on x via exact scaled-int
    moments (same combiner discipline as :func:`pearson_corr`): per-batch
    per-key partial sums of (n, x, y, xy, x²), one shuffle keyed on
    ``by``, then the closed form (nΣxy − ΣxΣy)/(nΣxx − Σx²) evaluated as
    ONE double division of two exact integers — so the SQL twin using the
    same integer moments is bit-identical, with no dependence on either
    engine's streaming-covariance float order.  The x/y scale factors
    cancel in the ratio when both columns use ``scale``.

    Groups with zero x-variance return NULL (matches SQL regr_slope).
    Returns ``(by, out_col, n)``.
    """
    import pandas as pd

    s2 = scale * scale

    def _partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            by: t[by].to_pandas(),
            "sx": _scaled_int(t[x_col], scale).to_numpy(),
            "sy": _scaled_int(t[y_col], scale).to_numpy(),
            "sxy": _scaled_int(pc.multiply(t[x_col], t[y_col]),
                               s2).to_numpy(),
            "sxx": _scaled_int(pc.multiply(t[x_col], t[x_col]),
                               s2).to_numpy()})
        return df.groupby(by, sort=False).agg(
            n=("sx", "size"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxy=("sxy", "sum"), sxx=("sxx", "sum")).reset_index()

    def _solve(g: pd.DataFrame) -> pd.DataFrame:
        # python ints: the cross moments overflow int64 at corpus scale
        n = int(g["n"].sum())
        sx, sy = int(g["sx"].astype(object).sum()), \
            int(g["sy"].astype(object).sum())
        sxy, sxx = int(g["sxy"].astype(object).sum()), \
            int(g["sxx"].astype(object).sum())
        den = n * sxx - sx * sx
        # zero-x-variance groups are NULL (SQL REGR_SLOPE convention) —
        # explicit None in a nullable float column, not a NaN that only
        # becomes null through pandas->Arrow coercion
        slope = float(n * sxy - sx * sy) / float(den) if den != 0 else None
        return pd.DataFrame({by: [g[by].iloc[0]],
                             out_col: pd.array([slope], dtype="Float64"),
                             "n": [n]})

    return (ds.map_batches(_partial, batch_format="pyarrow")
            .groupby(by).map_groups(_solve, batch_format="pandas"))


def pack_sequences(counted_ds, id_col: str = "doc_id",
                   count_col: str = "n_tokens", capacity: int = 2048,
                   group_size: int = 256, seed: int = 7,
                   num_partitions: int = 8):
    """Greedy ATOMIC sequence packing — the materialization step after
    :func:`prefix_sum`-based ``pack_offsets``: documents are never split;
    each goes whole into the current pack, and a pack closes when the
    next document would overflow ``capacity`` tokens (a document alone
    larger than ``capacity`` still gets its own pack, honestly recorded
    with ``fill > capacity``).

    Greedy fill is inherently a sequential recurrence, so exact global
    greedy cannot stream.  The distributed contract instead fixes a
    deterministic document order (the :func:`..sampling.
    deterministic_shuffle` md5 skey — partition/retry-stable) and runs
    the recurrence independently inside contiguous ``group_size``-doc
    groups: packs never cross group boundaries, every group is a
    bounded sequential kernel (≤ ``group_size`` rows), and the whole
    assignment is a pure function of (id set, token counts, seed,
    group_size, capacity) — reproducible by a recursive-CTE SQL twin.
    ``pack_id = grp * group_size + pack_within_group`` (unique: a group
    opens at most ``group_size`` packs).

    Input must carry ``(id_col, count_col)``; emits per-document rows
    ``(id_col, count_col, pack_id, pack_pos)``.  Aggregate with
    :func:`pack_summary` for the per-pack view.
    """
    from .relational import inner_join
    from .sampling import deterministic_shuffle

    pos = deterministic_shuffle(
        counted_ds.select_columns([id_col]), id_col, seed=seed)

    def _grp(t: pa.Table) -> pa.Table:
        p = t["pos"].to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: t[id_col].combine_chunks(),
            "grp": pa.array((p - 1) // group_size, pa.int64()),
            "rwg": pa.array((p - 1) % group_size + 1, pa.int64())})

    ranked = pos.map_batches(_grp, batch_format="pyarrow")
    joined = inner_join(ranked, counted_ds.select_columns(
        [id_col, count_col]), on=id_col, num_partitions=num_partitions)

    import pandas as pd

    def _fill(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("rwg")
        n = g[count_col].to_numpy().astype(np.int64)
        grp = int(g["grp"].iloc[0])
        lp = np.zeros(len(g), dtype=np.int64)   # pack index within group
        pp = np.zeros(len(g), dtype=np.int64)   # position within pack
        cur, fill, ppos = 0, 0, 0
        for i in range(len(n)):                  # ≤ group_size iterations
            if i > 0 and fill + n[i] > capacity:
                cur, fill, ppos = cur + 1, 0, 0
            fill += n[i]
            ppos += 1
            lp[i], pp[i] = cur, ppos
        return pd.DataFrame({
            id_col: g[id_col].to_numpy(),
            count_col: n,
            "pack_id": grp * group_size + lp,
            "pack_pos": pp})

    return joined.groupby("grp").map_groups(_fill, batch_format="pandas")


def pack_summary(packed_ds, count_col: str = "n_tokens",
                 capacity: int = 2048):
    """Per-pack view of :func:`pack_sequences` output: ``(pack_id,
    n_docs, pack_tokens, fill_frac)``.  ``fill_frac`` can exceed 1.0
    only for a single oversized document in its own pack."""
    import pyarrow.compute as pc

    from ray.data.aggregate import Count, Sum
    agg = (packed_ds.groupby("pack_id")
           .aggregate(Count(alias_name="n_docs"),
                      Sum(count_col, alias_name="pack_tokens")))

    def _frac(t: pa.Table) -> pa.Table:
        return t.append_column("fill_frac", pc.divide(
            pc.cast(t["pack_tokens"], pa.float64()), float(capacity)))

    return agg.map_batches(_frac, batch_format="pyarrow")
