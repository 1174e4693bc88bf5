"""Generic relational operators (SURVEY.md §2.4–2.7) as Dataset transforms.

Thin, documented wrappers so every reference operator has a named engine
entry point; all of them stream (no driver-side row loops) and shuffle only
where the semantics demand it.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def distinct(ds, cols: list[str], num_partitions: int | None = None):
    """Exact dedup on a key tuple — hash-partition + first per group
    (SURVEY.md D2; reference ``seen``-set at api/build_corpus.py:88-92).

    Two-integer-column keys within packed-int64 bounds (both ≥ 0,
    first < 2^31, second < 2^32 — every dense-id edge table) dedup on
    ONE packed key: Ray Data's multi-column groupby sorts a composite
    key and measured ~8× slower than the identical single-key plan on
    small tables and ~1.4× at 5M rows (BASELINE.md r3).  The bound
    check costs one min/max pass over the materialized key projection;
    anything outside the bounds falls back to the generic plan.
    """
    import numpy as np
    import pyarrow as pa
    from ray.data.aggregate import Count, Max, Min

    proj = ds.select_columns(cols)
    if len(cols) == 2:
        proj = proj.materialize()
        packable = False
        try:
            a, b = cols
            # ONE aggregation execution for the bound check (count +
            # both mins + both maxes), not three driver round-trips
            agg = proj.aggregate(Count(), Min(a), Min(b), Max(a), Max(b))
            if agg and agg.get("count()"):
                packable = (
                    isinstance(agg[f"min({a})"], (int, np.integer))
                    and isinstance(agg[f"min({b})"], (int, np.integer))
                    and agg[f"min({a})"] >= 0 and agg[f"min({b})"] >= 0
                    and agg[f"max({a})"] < 2 ** 31
                    and agg[f"max({b})"] < 2 ** 32)
        except Exception:
            packable = False
        if packable:
            a, b = cols

            def _pack(t: pa.Table) -> pa.Table:
                k = ((np.asarray(t[a], dtype=np.int64) << np.int64(32))
                     | np.asarray(t[b], dtype=np.int64))
                # local pre-dedup: repeats never leave the batch
                return pa.table({"k": pa.array(np.unique(k), pa.int64())})

            def _unpack(t: pa.Table) -> pa.Table:
                k = np.asarray(t["k"], dtype=np.int64)
                return pa.table({
                    a: pa.array(k >> np.int64(32), pa.int64()),
                    b: pa.array(k & np.int64(0xFFFFFFFF), pa.int64())})

            # task-level dedup: the Dataset groupby pays a multi-second
            # sort-shuffle floor at any size (stages/taskshuffle.py)
            from .taskshuffle import distinct_int64
            deduped = distinct_int64(
                proj.map_batches(_pack, batch_format="pyarrow"), "k")
            return deduped.map_batches(_unpack, batch_format="pyarrow")
    out = proj.groupby(cols).aggregate(Count(alias_name="_n"))
    return out.select_columns(cols)


def topk(ds, keys, k: int, descending=True):
    """Total-order top-k (SURVEY.md K1; reference full sort + truncate,
    backend/cuda/pagerank_gpu.cu:429-441).

    Scale shape: every block first reduces to its LOCAL top-k (any
    global top-k row is necessarily in its block's top-k), so the
    all-to-all sort ranks ≤ k·blocks pre-filtered rows instead of the
    whole table — K4's partial+merge machinery as a drop-in for the
    plain sort+limit.  Pass a key tuple with a unique tiebreaker for
    deterministic output (the block-local head is exact only under a
    total order)."""
    import pandas as pd  # noqa: F401  (batch_format contract)

    keys_l = [keys] if isinstance(keys, str) else list(keys)
    desc = ([descending] * len(keys_l) if isinstance(descending, bool)
            else list(descending))

    def _partial(df):
        if len(df) <= k:
            return df
        # NaN-key rows pass through untouched: pandas sorts NaN last
        # regardless of direction, so head(k) would drop them in large
        # blocks but keep them in ≤k-row blocks — layout-dependent
        # output.  Forwarding them keeps the pre-filter a pure superset
        # of the global top-k and leaves NaN placement to the one
        # global sort, same as the plain sort+limit it replaces.
        na = df[keys_l].isna().any(axis=1)
        top = (df[~na].sort_values(keys_l,
                                   ascending=[not d for d in desc],
                                   kind="mergesort").head(k))
        return pd.concat([top, df[na]]) if na.any() else top

    pre = ds.map_batches(_partial, batch_format="pandas")
    return pre.sort(keys, descending=descending).limit(k)


def grouped_topk(ds, by: str, sort_col: str, k: int, tiebreak: str,
                 descending: bool = True):
    """Per-key top-k (SURVEY.md K-family extension): one hash shuffle on
    ``by``, then an in-task argsort + head per group — no total-order sort
    of the whole table.  ``tiebreak`` (ascending) makes output
    deterministic for equal ``sort_col`` values.  Partitioning
    assumption: one key's rows fit a worker task."""
    import numpy as np
    import pandas as pd

    def _top(df: pd.DataFrame) -> pd.DataFrame:
        v = df[sort_col].to_numpy()
        t = df[tiebreak].to_numpy()
        order = np.lexsort((t, -v if descending else v))[:k]
        return df.iloc[order]

    return ds.groupby(by).map_groups(_top, batch_format="pandas")


def inner_join(left, right, on, right_on=None, num_partitions: int = 16):
    """Hash-partitioned inner join (SURVEY.md J1 semantics: rows without a
    match are dropped, backend/data/parse_pagerank.py:43-55)."""
    return left.join(right, "inner", num_partitions, on=_t(on),
                     right_on=_t(right_on) if right_on else None,
                     validate_schemas=True)


def left_join_coalesce(left, right, on, fill: dict,
                       num_partitions: int = 16, right_on=None):
    """Left join + fill missing right columns (SURVEY.md J3: pagerank
    defaults to 0.0 for unranked urls, api/main.py:391-398)."""
    joined = left.join(right, "left_outer", num_partitions, on=_t(on),
                       right_on=_t(right_on) if right_on else None,
                       validate_schemas=True)

    def _fill(t: pa.Table) -> pa.Table:
        for col, val in fill.items():
            if col in t.schema.names:
                filled = pc.fill_null(t[col], val)
                t = t.set_column(t.schema.get_field_index(col), col, filled)
        return t

    return joined.map_batches(_fill, batch_format="pyarrow")


def anti_join(left, right, on, num_partitions: int = 16, right_on=None):
    """Rows of ``left`` with no match in ``right`` (SURVEY.md J4/D5,
    api/check.py:18-22)."""
    return left.join(right, "left_anti", num_partitions, on=_t(on),
                     right_on=_t(right_on) if right_on else None,
                     validate_schemas=True)


def semi_join(left, right, on, num_partitions: int = 16, right_on=None):
    return left.join(right, "left_semi", num_partitions, on=_t(on),
                     right_on=_t(right_on) if right_on else None,
                     validate_schemas=True)


def sum_normalize(ds, col: str, out_col: str | None = None):
    """Divide a column by its global sum (SURVEY.md A7; reference
    renormalization backend/data/parse_pagerank.py:57-61).  One cheap
    aggregate pass, then a broadcast-scalar map."""
    total = ds.sum(col)
    out_col = out_col or col
    if not total:
        return ds

    def _div(t: pa.Table) -> pa.Table:
        arr = pc.divide(t[col], pa.scalar(float(total), pa.float64()))
        if out_col in t.schema.names:
            return t.set_column(t.schema.get_field_index(out_col), out_col, arr)
        return t.append_column(out_col, arr)

    return ds.map_batches(_div, batch_format="pyarrow")


def minmax_normalize(ds, col: str, out_col: str | None = None):
    """Rescale a column to [0,1] (SURVEY.md A9; api/main.py:117-127 —
    including the reference's span=1.0 guard when max == min)."""
    lo = ds.min(col)
    hi = ds.max(col)
    span = (hi - lo) if hi > lo else 1.0
    out_col = out_col or f"{col}_norm"

    def _scale(t: pa.Table) -> pa.Table:
        arr = pc.divide(pc.subtract(t[col], pa.scalar(float(lo), pa.float64())),
                        pa.scalar(float(span), pa.float64()))
        return t.append_column(out_col, arr)

    return ds.map_batches(_scale, batch_format="pyarrow")


def default_num_partitions() -> int:
    """Join/shuffle partition count sized to the session's CPUs — two hash
    joins can be live in one plan, and each join's aggregator pool reserves
    CPUs, so oversized pools deadlock small sessions."""
    import ray
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(2, min(16, cpus // 2))


def tune_shuffle() -> None:
    """Cap hash-shuffle aggregator actors so concurrent join pools always
    fit the session (call once per session before running join plans)."""
    import ray
    from ray.data import DataContext
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    ctx = DataContext.get_current()
    ctx.max_hash_shuffle_aggregators = max(2, cpus // 4)


def rename(ds, mapping: dict):
    """Format-agnostic column rename (Dataset.rename_columns breaks on
    pandas-format blocks in Ray 2.49)."""
    def _r(t: pa.Table) -> pa.Table:
        return t.rename_columns([mapping.get(n, n) for n in t.schema.names])
    return ds.map_batches(_r, batch_format="pyarrow")


def _t(on):
    if on is None:
        return None
    return (on,) if isinstance(on, str) else tuple(on)


def band_join(ds, bands_df, col: str, lo_col: str = "lo",
              hi_col: str = "hi", label_col: str = "label",
              out_col: str = "band"):
    """Broadcast range join: attach to each row the band whose
    ``[lo, hi)`` interval contains ``col``.

    The dimension side is a SMALL in-memory table (non-overlapping
    intervals); it is ``ray.put`` once and every task assigns bands with
    one vectorized ``searchsorted`` — NO shuffle of the fact table, the
    only data movement is the tiny broadcast.  This is the 100 TB shape
    for every BETWEEN-style dimension join (price bands, size classes,
    date ranges): shuffling a petabyte fact table against a 10-row
    dimension is never right.  Rows outside every band are dropped
    (inner semantics).
    """
    import ray

    bands = bands_df.sort_values(lo_col).reset_index(drop=True)
    lo = np.ascontiguousarray(bands[lo_col].to_numpy(dtype=np.float64))
    hi = np.ascontiguousarray(bands[hi_col].to_numpy(dtype=np.float64))
    labels = bands[label_col].to_numpy()
    ref = ray.put((lo, hi, labels))

    def _assign(t: pa.Table) -> pa.Table:
        blo, bhi, blab = ray.get(ref)
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        idx = np.searchsorted(blo, x, side="right") - 1
        safe = np.maximum(idx, 0)
        keep = (idx >= 0) & (x < bhi[safe]) & ~np.isnan(x)
        t = t.filter(pa.array(keep))
        return t.append_column(out_col,
                               pa.array(blab[safe[keep]], pa.string()))

    return ds.map_batches(_assign, batch_format="pyarrow")
