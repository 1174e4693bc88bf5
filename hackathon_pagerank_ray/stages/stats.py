"""Distribution-summary operators with bounded-cardinality scale shapes.

The naive way to get quantiles out of a Dataset is a global sort — an
all-to-all shuffle of every row.  At 100 TB that is the single most
expensive operation an engine can run for a four-number answer.  These
operators instead reduce the data to a histogram whose cardinality is
bounded by the value range / bin width (thousands of rows, not
billions): each batch emits (bin, count) partials, one tiny ``groupby``
merges them, and the quantile selection walks the cumulative counts on
the driver.  All arithmetic is integer (bin indexes + counts), so the
result is deterministic and bit-exact against a SQL oracle computing the
same discrete rule — unlike interpolated quantiles, which depend on
float summation order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def histogram(ds, col: str, bin_width: float):
    """(bin, n) counts with ``bin = floor(col / bin_width)`` — the
    bounded-cardinality reduction all the quantile/summary ops share.
    NULLs are dropped (SQL aggregate convention)."""
    from ray.data.aggregate import Sum

    from .relational import rename

    def _partial(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        x = x[~np.isnan(x)]
        bins = np.floor(x / bin_width).astype(np.int64)
        uniq, cnt = np.unique(bins, return_counts=True)
        return pa.table({"bin": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt.astype(np.int64), pa.int64())})

    partials = ds.map_batches(_partial, batch_format="pyarrow")
    return rename(partials.groupby("bin").aggregate(Sum("n", alias_name="n")),
                  {"sum(n)": "n"})


def histogram_quantiles(ds, col: str, bin_width: float,
                        qs=(0.25, 0.5, 0.75, 0.95)):
    """Quantiles at histogram resolution: for each q, the lower edge of
    the first bin whose cumulative count reaches ``ceil(q * n_total)``.

    Returns a tiny Dataset ``(q, value)`` (one row per requested
    quantile; ``value = bin * bin_width``).  The only distributed work
    is :func:`histogram`; the cumulative walk touches #bins rows on the
    driver — bounded by the value range, independent of row count.

    The equivalent SQL (same discrete rule, hash-exact)::

        WITH h AS (SELECT CAST(FLOOR(x / w) AS BIGINT) AS bin,
                          COUNT(*) AS n FROM t GROUP BY 1),
             c AS (SELECT bin, SUM(n) OVER (ORDER BY bin) AS cum,
                          SUM(n) OVER () AS total FROM h)
        SELECT q, MIN(bin) * w FROM c, (VALUES ...) qs(q)
        WHERE cum >= CEIL(q * total) GROUP BY q
    """
    hist = histogram(ds, col, bin_width).to_pandas()
    # an empty Dataset groupby yields a schema-less table — NaN quantiles
    if not len(hist) or "bin" not in hist.columns:
        return pd.DataFrame({"q": pd.Series(list(qs), dtype=np.float64),
                             "value": pd.Series([np.nan] * len(qs))})
    hist = hist.sort_values("bin")
    cum = hist["n"].cumsum().to_numpy()
    bins = hist["bin"].to_numpy()
    total = int(cum[-1])
    out_q, out_v = [], []
    for q in qs:
        target = int(np.ceil(q * total)) if q > 0 else 1
        target = min(max(target, 1), total)
        idx = int(np.searchsorted(cum, target))
        out_q.append(float(q))
        out_v.append(float(bins[idx]) * bin_width)
    return pd.DataFrame({"q": np.asarray(out_q, dtype=np.float64),
                         "value": np.asarray(out_v, dtype=np.float64)})
