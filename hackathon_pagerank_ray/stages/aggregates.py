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
