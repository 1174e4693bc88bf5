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
import pyarrow.compute as pc


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


# -- HyperLogLog distinct-count sketch --------------------------------------

# worker-process DuckDB connection for bulk md5 (created once per worker)
_DUCK_CON = None


def _bulk_md5_upper_be(keys: np.ndarray, prefixes=("",)) -> np.ndarray:
    """Bulk md5 of utf-8 string keys: the big-endian uint64 of
    ``digest()[:8]`` for each (prefix, key), shape (len(prefixes), n).

    The per-key ``hashlib.md5`` Python loop was the round-2 sketch
    bottleneck (cms_event_users 17.7 s at sf0.1).  DuckDB's
    ``md5_number_upper`` computes the same first-8-bytes value in
    vectorized C++ — it returns the *little*-endian interpretation, so a
    numpy ``byteswap`` recovers exactly
    ``int.from_bytes(hashlib.md5((p+k).encode()).digest()[:8], 'big')``,
    i.e. the integer the SQL oracles parse from ``substr(md5(..),1,16)``.
    Prefixes are engine-controlled literals (``"{d}:"``), not user data.
    """
    global _DUCK_CON
    if _DUCK_CON is None:
        import duckdb
        _DUCK_CON = duckdb.connect()
    con = _DUCK_CON
    karr = (keys if isinstance(keys, (pa.Array, pa.ChunkedArray))
            else pa.array(keys, pa.string()))
    tbl = pa.table({"i": pa.array(np.arange(len(karr)), pa.int64()),
                    "k": karr})
    con.register("__sketch_keys", tbl)
    cols = ", ".join(
        f"md5_number_upper('{p}' || k) AS h{j}"
        for j, p in enumerate(prefixes))
    # ORDER BY i: DuckDB may scan/emit out of row order under parallelism
    res = con.execute(
        f"SELECT {cols} FROM __sketch_keys ORDER BY i").fetchnumpy()
    con.unregister("__sketch_keys")
    out = np.empty((len(prefixes), len(keys)), dtype=np.uint64)
    for j in range(len(prefixes)):
        out[j] = np.ascontiguousarray(
            res[f"h{j}"].astype(np.uint64)).byteswap()
    return out


def _bit_length_u64(v: np.ndarray) -> np.ndarray:
    """Vectorized int.bit_length over a uint64 array (0 -> 0)."""
    bl = np.zeros(len(v), dtype=np.int64)
    x = v.copy()
    for s in (32, 16, 8, 4, 2, 1):
        sh = np.uint64(s)
        mask = x >= (np.uint64(1) << sh)
        bl[mask] += s
        x[mask] >>= sh
    bl += (x > 0).astype(np.int64)
    return bl


def _hll_partial(batch: pd.DataFrame, key_col: str, m: int) -> pd.DataFrame:
    """Per-batch HLL register partial: md5-hash each key, bucket on the
    top 8 bits, rho = leading-zero run (+1) of the remaining 56 bits —
    integer bit ops on the same md5 prefix the DuckDB oracle parses from
    the hex string, so every register matches bit-exactly (float log2
    would round at power-of-two boundaries).  Emits one (bucket, rho)
    row per batch-local max.  Duplicates map to the same (bucket, rho)
    and the merge is a max, so hashing each distinct key once per batch
    is bit-identical and cuts the hash count by the duplication factor.
    """
    keys = np.unique(batch[key_col].astype(str).to_numpy())
    if not len(keys):
        return pd.DataFrame({"bucket": pd.Series(dtype=np.int64),
                             "rho": pd.Series(dtype=np.int64)})
    h = _bulk_md5_upper_be(keys)[0]
    buckets = (h >> np.uint64(56)).astype(np.int64)
    tail = (h & np.uint64((1 << 56) - 1))
    # rho = (leading zero bits of the 56-bit tail) + 1 = 57 - bit_length
    rhos = 57 - _bit_length_u64(tail)
    # batch-local combine: max rho per bucket
    mx = np.zeros(m, dtype=np.int64)
    np.maximum.at(mx, buckets, rhos)
    nz = np.flatnonzero(mx)
    return pd.DataFrame({"bucket": nz, "rho": mx[nz]})


def hll_registers(ds, key_col: str, m: int = 256):
    """Distributed HyperLogLog sketch of ``COUNT(DISTINCT key_col)``:
    every batch emits ≤ m (bucket, max-rho) partial rows, one
    bounded-cardinality ``groupby(bucket).max`` merges them — the classic
    mergeable-sketch shape (no shuffle of raw keys, no distinct; at
    100 TB the exchange is ≤ m rows per block regardless of input size).
    ``m`` must be 256 (8-bit bucket prefix of the md5 hex)."""
    if m != 256:
        raise ValueError("m=256 is the md5-hex bucketing this sketch uses")
    from .taskshuffle import grouped_agg_int64
    partials = ds.map_batches(_hll_partial, batch_format="pandas",
                              fn_kwargs=dict(key_col=key_col, m=m))
    return grouped_agg_int64(partials, "bucket", "rho", op="max",
                             out_val="rho")


def _hll_partial_by(batch: pd.DataFrame, group_col: str, key_col: str,
                    m: int) -> pd.DataFrame:
    """Per-batch GROUPED HLL partial: one packed (group<<8 | bucket,
    max-rho) row per batch-local register.  Each distinct key is hashed
    once (bulk md5) even when it appears under many groups; the group
    key must be a non-negative int64 below 2^55 (epoch-hour buckets are
    ~2^19)."""
    df = batch[[group_col, key_col]].drop_duplicates()
    if not len(df):
        return pd.DataFrame({"k": pd.Series(dtype=np.int64),
                             "rho": pd.Series(dtype=np.int64)})
    keys, inv = np.unique(df[key_col].astype(str).to_numpy(),
                          return_inverse=True)
    h = _bulk_md5_upper_be(keys)[0]
    buckets = (h >> np.uint64(56)).astype(np.int64)
    tail = (h & np.uint64((1 << 56) - 1))
    rhos = 57 - _bit_length_u64(tail)
    g = df[group_col].to_numpy(dtype=np.int64)
    if len(g) and (g.min() < 0 or g.max() >= (1 << 55)):
        raise ValueError("group key outside the packed-register bound")
    packed = (g << np.int64(8)) | buckets[inv]
    uniq, uinv = np.unique(packed, return_inverse=True)
    mx = np.zeros(len(uniq), dtype=np.int64)
    np.maximum.at(mx, uinv, rhos[inv])
    return pd.DataFrame({"k": uniq, "rho": mx})


def hll_registers_by(ds, group_col: str, key_col: str, m: int = 256):
    """Grouped HyperLogLog: ``COUNT(DISTINCT key) GROUP BY group`` as a
    mergeable register table ``(group, bucket, rho)`` — ≤ m partial rows
    per (batch, group) leave each block and the merge is one
    packed-int64 max shuffle, so the exchange is bounded by
    groups × m regardless of input size (the at-scale replacement for
    the exact two-level distinct in ``events.distinct_count_by``)."""
    if m != 256:
        raise ValueError("m=256 is the md5-hex bucketing this sketch uses")
    import pyarrow as pa

    from .taskshuffle import grouped_agg_int64
    partials = ds.map_batches(_hll_partial_by, batch_format="pandas",
                              fn_kwargs=dict(group_col=group_col,
                                             key_col=key_col, m=m))
    merged = grouped_agg_int64(partials, "k", "rho", op="max",
                               out_val="rho")

    def _unpack(t: pa.Table) -> pa.Table:
        k = np.asarray(t["k"], dtype=np.int64)
        return pa.table({group_col: pa.array(k >> np.int64(8), pa.int64()),
                         "bucket": pa.array(k & np.int64(0xFF), pa.int64()),
                         "rho": t["rho"].combine_chunks()})

    return merged.map_batches(_unpack, batch_format="pyarrow")


def hll_estimate(registers_df, m: int = 256) -> float:
    """Driver-side HLL estimator (Flajolet et al.): bias-corrected
    harmonic mean with the small-range linear-counting correction.
    ``registers_df``: pandas with (bucket, rho) for the nonzero
    registers."""
    import math

    rho = registers_df["rho"].to_numpy()
    # integer-exact harmonic sum: Σ 2^(57-rho) + empty·2^57 over /2^57
    s_int = int((2 ** (57 - rho.astype(object))).sum()) if len(rho) else 0
    zeros = m - len(rho)
    s_int += zeros * 2 ** 57
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m * (float(2 ** 57) / float(s_int))
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


# -- count-min frequency sketch ----------------------------------------------


def _cms_partial(batch: pd.DataFrame, key_col: str, depth: int,
                 width: int) -> pd.DataFrame:
    """Per-batch count-min partial: for each of ``depth`` seeded md5 hash
    rows, count keys per bucket — ≤ depth·width rows leave the batch.
    Integer registers, so the merged sketch is bit-exact vs a SQL twin.

    Registers are additive over per-key counts, so each distinct key is
    hashed once (bulk, via :func:`_bulk_md5_upper_be` — all ``depth``
    seeded hashes in one vectorized query) and its bucket weighted by
    the key's multiplicity — exact, no per-key Python loop.  The bucket
    is the first 8 hex chars of ``md5('{d}:' || key)`` as a big-endian
    int, i.e. the top 32 bits of the 64-bit hash prefix, mod width.
    """
    uniq, mult = np.unique(batch[key_col].astype(str).to_numpy(),
                           return_counts=True)
    if not len(uniq):
        return pd.DataFrame({"d": pd.Series(dtype=np.int64),
                             "bucket": pd.Series(dtype=np.int64),
                             "n": pd.Series(dtype=np.int64)})
    hmat = _bulk_md5_upper_be(uniq, [f"{d}:" for d in range(depth)])
    bmat = ((hmat >> np.uint64(32)) % np.uint64(width)).astype(np.int64)
    out_d, out_b, out_n = [], [], []
    for d in range(depth):
        counts = np.bincount(bmat[d], weights=mult,
                             minlength=width).astype(np.int64)
        nz = np.flatnonzero(counts)
        out_d.append(np.full(len(nz), d, dtype=np.int64))
        out_b.append(nz)
        out_n.append(counts[nz])
    return pd.DataFrame({"d": np.concatenate(out_d),
                         "bucket": np.concatenate(out_b),
                         "n": np.concatenate(out_n)})


def cms_registers(ds, key_col: str, depth: int = 4, width: int = 1024):
    """Distributed count-min sketch of per-key frequencies: batches emit
    (d, bucket, count) partials, one bounded-cardinality groupby-sum
    merges — the same mergeable-sketch shape as :func:`hll_registers`
    (≤ depth·width rows move per block at any input size).  Point
    estimates via :func:`cms_estimate`.

    The merge key is ``d·width + bucket`` packed into ONE int64: Ray
    Data's multi-column groupby sorts on a composite key and measured
    ~8× slower than the identical single-key plan on this register
    table (19.5 s vs 2.4 s at sf0.1); the output unpacks back to
    (d, bucket, n)."""
    def _merge_key(t: pa.Table) -> pa.Table:
        k = np.asarray(t["d"]) * np.int64(width) + np.asarray(t["bucket"])
        return pa.table({"k": pa.array(k, pa.int64()),
                         "n": t["n"].combine_chunks()})

    def _unpack(t: pa.Table) -> pa.Table:
        k = np.asarray(t["k"])
        return pa.table({"d": pa.array(k // width, pa.int64()),
                         "bucket": pa.array(k % width, pa.int64()),
                         "n": pc.cast(t["n"].combine_chunks(),
                                      pa.int64())})

    from .taskshuffle import grouped_agg_int64
    partials = ds.map_batches(_cms_partial, batch_format="pandas",
                              fn_kwargs=dict(key_col=key_col, depth=depth,
                                             width=width))
    merged = grouped_agg_int64(
        partials.map_batches(_merge_key, batch_format="pyarrow"),
        "k", "n", op="sum", out_val="n")
    return merged.map_batches(_unpack, batch_format="pyarrow")


def cms_estimate(registers_df, key, depth: int = 4,
                 width: int = 1024) -> int:
    """Count-min point query: min over depth rows of the key's bucket —
    an upper bound on the true count (classic one-sided error)."""
    import hashlib

    reg = {(int(r["d"]), int(r["bucket"])): int(r["n"])
           for _, r in registers_df.iterrows()}
    est = None
    for d in range(depth):
        b = int(hashlib.md5(f"{d}:{key}".encode()).hexdigest()[:8], 16) % width
        v = reg.get((d, b), 0)
        est = v if est is None else min(est, v)
    return int(est or 0)


def exact_quantiles(ds, col: str, qs=(0.25, 0.5, 0.9, 0.99),
                    num_bins: int = 65536, max_collect: int = 5_000_000):
    """Exact linear-interpolated quantiles (DuckDB ``quantile_cont``
    semantics: ``h = (n-1)·q``; ``v = x_{⌊h⌋} + (h-⌊h⌋)·(x_{⌊h⌋+1} -
    x_{⌊h⌋})``) WITHOUT a global sort.

    Selection by histogram refinement: one combiner pass for
    (min, max, count), then per level a ``num_bins``-bin histogram whose
    exchange carries ≤ num_bins counter rows; only the bins containing
    the needed order statistics are pulled to the driver (bounded by the
    level's bin population), and a bin still over ``max_collect`` rows
    recurses on a worker-side filtered dataset instead.  Bin membership
    in the filter is the SAME index computation as in the histogram, so
    float edge rounding can never split a value between count and
    collect.  NULLs are dropped (SQL aggregate convention).  Returns a
    tiny ``(q, value)`` Dataset."""
    import pandas as pd
    import ray.data as rd

    def _vals(t: pa.Table, c: str) -> np.ndarray:
        x = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
        return x[~np.isnan(x)]

    stats = ds.map_batches(
        lambda t: pa.table({
            "mn": pa.array([float(np.min(v)) if len(
                v := _vals(t, col)) else np.inf]),
            "mx": pa.array([float(np.max(v)) if len(v) else -np.inf]),
            "n": pa.array([len(v)], pa.int64())}),
        batch_format="pyarrow")
    sdf = stats.to_pandas()                    # one tiny row per block
    n = int(sdf["n"].sum())
    if n == 0:
        return rd.from_pandas(pd.DataFrame(
            {"q": pd.Series(dtype="float64"),
             "value": pd.Series(dtype="float64")}))
    lo, hi = float(sdf["mn"].min()), float(sdf["mx"].max())

    ranks = sorted({r for q in qs
                    for r in (int(np.floor((n - 1) * q)),
                              min(int(np.floor((n - 1) * q)) + 1, n - 1))})

    def _bin_index(v: np.ndarray, lo: float, width: float) -> np.ndarray:
        return np.minimum(((v - lo) / width).astype(np.int64),
                          num_bins - 1)

    def _order_stats(cur_ds, c, lo, hi, ranks, depth=0):
        """rank → value for 0-based ``ranks`` over column ``c``."""
        if lo == hi or not ranks:
            return {r: lo for r in ranks}
        width = (hi - lo) / num_bins

        def _hist(t: pa.Table) -> pa.Table:
            v = _vals(t, c)
            uniq, cnt = np.unique(_bin_index(v, lo, width),
                                  return_counts=True)
            return pa.table({"bin": pa.array(uniq, pa.int64()),
                             "n": pa.array(cnt.astype(np.int64))})

        h = (cur_ds.map_batches(_hist, batch_format="pyarrow")
             .groupby("bin").sum("n").to_pandas()
             .sort_values("bin").reset_index(drop=True))
        bins = h["bin"].to_numpy()
        counts = h["sum(n)"].to_numpy()
        cum = counts.cumsum()
        out = {}
        by_bin = {}
        for r in ranks:
            i = int(np.searchsorted(cum, r + 1))
            by_bin.setdefault(i, []).append(r)
        for i, rs in by_bin.items():
            b = int(bins[i])
            before = int(cum[i] - counts[i])

            def _select(t: pa.Table, b=b) -> pa.Table:
                v = _vals(t, c)
                return pa.table(
                    {"v": pa.array(v[_bin_index(v, lo, width) == b])})

            sub_ds = cur_ds.map_batches(_select, batch_format="pyarrow")
            if counts[i] > max_collect and depth < 4 and width > 0:
                blo = lo + b * width
                bhi = lo + (b + 1) * width if b < num_bins - 1 else hi
                sub = _order_stats(sub_ds.materialize(), "v", blo, bhi,
                                   [r - before for r in rs], depth + 1)
                out.update({r + before: v for r, v in sub.items()})
                continue
            chunks = [_vals(t, "v") for t in sub_ds.iter_batches(
                batch_format="pyarrow", batch_size=None)]
            vals = np.sort(np.concatenate(chunks)
                           if chunks else np.array([]))
            for r in rs:
                out[r] = float(vals[r - before])
        return out

    if n <= max_collect:
        # small path: the refinement plan's whole point is to never pull
        # more than max_collect values — under that bound, ONE collect
        # pass yields the identical order statistics without the
        # histogram level's extra execution (each level re-reads the
        # pruned input).  Same driver-side memory bound as a single
        # over-threshold bin in the big path.
        chunks = [_vals(t, col) for t in ds.iter_batches(
            batch_format="pyarrow", batch_size=None)]
        vals = np.sort(np.concatenate(chunks) if chunks
                       else np.array([]))
        ov = {r: float(vals[r]) for r in ranks}
    else:
        ov = _order_stats(ds, col, lo, hi, ranks)
    rows = []
    for q in qs:
        h = (n - 1) * q
        f = int(np.floor(h))
        c = min(f + 1, n - 1)
        # DuckDB's interpolator is lower·(CRN−RN) + upper·(RN−FRN) —
        # algebraically equal to lower + frac·(upper−lower) but NOT
        # bit-equal in float64; match it exactly so 9-dp value hashing
        # can never land on a different side of a rounding boundary
        v = ov[f] if c == f else ov[f] * (c - h) + ov[c] * (h - f)
        rows.append({"q": float(q), "value": float(v)})
    return rd.from_pandas(pd.DataFrame(rows))


def interp_quantiles(x: "np.ndarray", qs) -> list[float]:
    """DuckDB ``quantile_cont`` interpolator over a SORTED float64 array:
    ``h = (n-1)·q``, ``v = x_f·(c-h) + x_c·(h-f)`` — the exact two-product
    form, bit-equal to the SQL function (NOT numpy.quantile's
    ``x_f + (h-f)·(x_c-x_f)`` rearrangement, which differs in the last
    ulp).  The ONE definition every grouped/exact quantile op shares."""
    n = len(x)
    vals = []
    for q in qs:
        h = (n - 1) * q
        f = int(np.floor(h))
        c = min(f + 1, n - 1)
        vals.append(float(x[f]) if c == f
                    else float(x[f] * (c - h) + x[c] * (h - f)))
    return vals


def group_quantiles(ds, by: str, col: str, qs=(0.25, 0.5, 0.9)):
    """Per-group exact linear-interpolated quantiles (same
    ``quantile_cont`` rule as :func:`exact_quantiles`: ``h = (n-1)·q``,
    ``v = x_⌊h⌋ + (h-⌊h⌋)·(x_⌊h⌋+1 - x_⌊h⌋)``), grouped by a key.

    One hash shuffle on ``by``, then an in-task sort per group — the
    right shape when group count is large and per-group rows are
    bounded (the usual per-nation / per-domain / per-language profile).
    For a handful of giant groups use :func:`exact_quantiles` per key
    instead (histogram refinement, no per-group sort).  NULLs dropped.
    Returns ``(by, q, value)``.
    """
    qs = tuple(float(q) for q in qs)

    def _q(g: pd.DataFrame) -> pd.DataFrame:
        x = g[col].to_numpy(dtype=np.float64)
        x = np.sort(x[~np.isnan(x)])
        n = len(x)
        empty = pd.DataFrame({by: pd.Series(dtype="int64"),
                              "q": pd.Series(dtype="float64"),
                              "value": pd.Series(dtype="float64")})
        if n == 0:
            return empty
        vals = interp_quantiles(x, qs)
        return pd.DataFrame({by: np.full(len(qs), g[by].iloc[0]),
                             "q": np.asarray(qs, dtype=np.float64),
                             "value": np.asarray(vals, dtype=np.float64)})

    return ds.groupby(by).map_groups(_q, batch_format="pandas")


def group_mad(ds, by: str, col: str, out_col: str = "mad"):
    """Per-group median absolute deviation, matching DuckDB ``mad()``
    on DOUBLE: ``median_cont(|x - median_cont(x)|)`` with the same
    linear interpolator as :func:`group_quantiles` (verified:
    mad([1,2,4,7]) = 1.5 — median 3.0, deviations sorted [1,1,2,4],
    interpolated median 1.5).  Robust per-domain/per-language spread
    for outlier gating where stddev is skew-dominated.  One hash
    shuffle on ``by``, two in-task partitions per group; NULLs dropped.
    Returns ``(by, out_col)``."""

    def _median_cont(x: np.ndarray) -> float:
        n = len(x)
        h = (n - 1) * 0.5
        f = int(np.floor(h))
        c = min(f + 1, n - 1)
        return float(x[f]) if c == f else float(
            x[f] * (c - h) + x[c] * (h - f))

    def _mad(g: pd.DataFrame) -> pd.DataFrame:
        x = g[col].to_numpy(dtype=np.float64)
        x = np.sort(x[~np.isnan(x)])
        if len(x) == 0:     # all-NULL group
            return pd.DataFrame({by: pd.Series([], dtype=g[by].dtype),
                                 out_col: pd.Series([], dtype="float64")})
        med = _median_cont(x)
        dev = np.sort(np.abs(x - med))
        return pd.DataFrame({by: [g[by].iloc[0]],
                             out_col: [_median_cont(dev)]})

    return ds.groupby(by).map_groups(_mad, batch_format="pandas")


def winsorize_by(ds, by: str, col: str, lo: float = 0.05,
                 hi: float = 0.95, key_col: str | None = None,
                 out_col: str = "clipped"):
    """Per-group winsorization: clip ``col`` into its group's
    [quantile(lo), quantile(hi)] band — the standard outlier gate before
    scoring/weighting a training corpus.

    One hash shuffle on ``by``; quantiles (the same DuckDB
    ``quantile_cont`` interpolator as :func:`group_quantiles`, bit-exact)
    and the clip happen in-task per group, so there is no second join
    pass.  NaNs pass through unclipped.  Returns ``(key_col?, by,
    out_col)``.
    """
    import pandas as pd

    def _w(g: pd.DataFrame) -> pd.DataFrame:
        x = g[col].to_numpy(dtype=np.float64)
        xs = np.sort(x[~np.isnan(x)])
        n = len(xs)

        def q(qq: float) -> float:
            h = (n - 1) * qq
            f = int(np.floor(h))
            c = min(f + 1, n - 1)
            # DuckDB interpolator form (see exact_quantiles): bit-exact
            return xs[f] if c == f else xs[f] * (c - h) + xs[c] * (h - f)

        clipped = np.minimum(np.maximum(x, q(lo)), q(hi)) if n \
            else x
        cols = {}
        if key_col is not None:
            cols[key_col] = g[key_col].to_numpy()
        cols[by] = g[by].to_numpy()
        cols[out_col] = clipped
        return pd.DataFrame(cols)

    return ds.groupby(by).map_groups(_w, batch_format="pandas")
