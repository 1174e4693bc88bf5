"""Task-level hash shuffle for int64-keyed combines.

Ray Data's sort-based groupby pays a multi-second floor at ANY input
size in this Ray version (measured: 9–12 s for a 313k-row single-key
sum at 8 CPUs, 2.4 s at 32 — the sample-sort + reduce machinery, not
the data).  For the engine's many bounded-ish combines over integer
keys (sketch registers, window/line hashes, packed pair codes) a
hand-rolled two-wave task shuffle does the same exact aggregation in
tens of milliseconds per wave:

    split wave:  one task per input block — local pre-combine
                 (np.unique + bincount / maximum), then range-split by
                 ``key % R`` into R outputs (``num_returns=R``)
    reduce wave: R tasks, each merging its disjoint key range

Exactness: int64 sums/max are order-independent, so this is
bit-identical to the Dataset groupby it replaces.  Scale shape: the
same O(blocks·R) object fan a hash shuffle pays; each reducer holds
only its key range (R scales with the cluster).  Use for integer keys;
string keys stay on the Dataset groupby.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _block_table(b) -> pa.Table:
    return b if isinstance(b, pa.Table) else pa.Table.from_pandas(
        b, preserve_index=False)


def _combine(k: np.ndarray, v: np.ndarray, op: str):
    uniq, inv = np.unique(k, return_inverse=True)
    if op == "max":
        agg = np.full(len(uniq), np.iinfo(np.int64).min, dtype=np.int64)
        np.maximum.at(agg, inv, v)
    else:                       # "sum" (count = sum of ones)
        # float64-weighted bincount is exact only while the running
        # |sum| stays under 2^53 — above that it silently rounds int64
        # values (e.g. 2^53 + 1 -> 2^53).  A cheap float bound picks the
        # fast path; otherwise sort by group and reduce in int64, which
        # is order-independent and bit-identical to the SQL sum.
        if len(v) == 0:
            agg = np.zeros(0, dtype=np.int64)
        elif np.abs(v.astype(np.float64)).sum() < 2.0 ** 52:
            agg = np.bincount(inv, weights=v).astype(np.int64)
        else:
            order = np.argsort(inv, kind="stable")
            starts = np.concatenate(
                ([0], np.flatnonzero(np.diff(inv[order])) + 1))
            agg = np.add.reduceat(v[order], starts)
    return uniq, agg


def grouped_agg_int64(ds, key_col: str, val_col: str | None = None,
                      op: str = "sum", num_reducers: int | None = None,
                      out_val: str = "agg"):
    """``SELECT key, {op}(val) GROUP BY key`` over an int64 key column
    as a two-wave task shuffle.  ``val_col=None`` counts rows.  Returns
    a Dataset ``(key_col, out_val)`` (both int64)."""
    import ray

    if op not in ("sum", "max"):
        raise ValueError(op)
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    R = num_reducers or max(1, min(len(refs), cpus // 4))

    @ray.remote
    def _split(block):
        t = _block_table(block)
        k = np.asarray(t[key_col], dtype=np.int64) if t.num_rows else \
            np.empty(0, dtype=np.int64)
        if val_col is None:
            v = np.ones(len(k), dtype=np.int64)
        else:
            v = (np.asarray(t[val_col], dtype=np.int64) if t.num_rows
                 else np.empty(0, dtype=np.int64))
        uniq, agg = _combine(k, v, op)
        part = uniq % R         # keys are hashes/packed codes — uniform
        outs = []
        for r in range(R):
            m = part == r
            outs.append(pa.table({
                "k": pa.array(uniq[m], pa.int64()),
                "v": pa.array(agg[m], pa.int64())}))
        return tuple(outs) if R > 1 else outs[0]

    @ray.remote
    def _reduce(*parts):
        if not parts:
            return pa.table({key_col: pa.array([], pa.int64()),
                             out_val: pa.array([], pa.int64())})
        k = np.concatenate([np.asarray(p["k"]) for p in parts])
        v = np.concatenate([np.asarray(p["v"]) for p in parts])
        uniq, agg = _combine(k, v, op)
        return pa.table({key_col: pa.array(uniq, pa.int64()),
                         out_val: pa.array(agg, pa.int64())})

    splits = [_split.options(num_returns=R).remote(r) for r in refs]
    if R == 1:
        red = [_reduce.remote(*splits)]
    else:
        red = [_reduce.remote(*[s[r] for s in splits]) for r in range(R)]
    return ray.data.from_arrow_refs(red)


def distinct_int64(ds, key_col: str, num_reducers: int | None = None):
    """Distinct values of an int64 column — the same two-wave shuffle
    with a pure dedup combine.  Returns a Dataset ``(key_col,)``."""
    import ray

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    R = num_reducers or max(1, min(len(refs), cpus // 4))

    @ray.remote
    def _split(block):
        t = _block_table(block)
        k = (np.unique(np.asarray(t[key_col], dtype=np.int64))
             if t.num_rows else np.empty(0, dtype=np.int64))
        part = k % R
        outs = [pa.table({"k": pa.array(k[part == r], pa.int64())})
                for r in range(R)]
        return tuple(outs) if R > 1 else outs[0]

    @ray.remote
    def _reduce(*parts):
        k = (np.unique(np.concatenate(
            [np.asarray(p["k"]) for p in parts]))
            if parts else np.empty(0, dtype=np.int64))
        return pa.table({key_col: pa.array(k, pa.int64())})

    splits = [_split.options(num_returns=R).remote(r) for r in refs]
    if R == 1:
        red = [_reduce.remote(*splits)]
    else:
        red = [_reduce.remote(*[s[r] for s in splits]) for r in range(R)]
    return ray.data.from_arrow_refs(red)


def two_way_count_int64(ds_a, ds_b, key_col: str,
                        num_reducers: int | None = None,
                        out_a: str = "cnt_a", out_b: str = "cnt_b"):
    """Per-key row counts of TWO datasets in ONE shuffle — the outer-join
    count table ``(key, cnt_a, cnt_b)`` over the union of keys (missing
    side = 0), without a join: both sides' partials are tagged and land
    in the same reducer by ``key % R``.  The building block for
    snapshot-diff operators (degree deltas between two crawls)."""
    import ray

    mat_a = ds_a.materialize()
    mat_b = ds_b.materialize()
    refs_a = mat_a.to_arrow_refs()
    refs_b = mat_b.to_arrow_refs()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    R = num_reducers or max(1, min(len(refs_a) + len(refs_b), cpus // 4))

    def _make_split(tag: int):
        @ray.remote
        def _split(block):
            t = _block_table(block)
            k = (np.asarray(t[key_col], dtype=np.int64) if t.num_rows
                 else np.empty(0, dtype=np.int64))
            uniq, agg = _combine(k, np.ones(len(k), dtype=np.int64), "sum")
            part = uniq % R
            outs = []
            for r in range(R):
                m = part == r
                outs.append(pa.table({
                    "k": pa.array(uniq[m], pa.int64()),
                    "v": pa.array(agg[m], pa.int64()),
                    "tag": pa.array(np.full(int(m.sum()), tag, np.int64),
                                    pa.int64())}))
            return tuple(outs) if R > 1 else outs[0]
        return _split

    @ray.remote
    def _reduce(*parts):
        if not parts:
            empty = pa.array([], pa.int64())
            return pa.table({key_col: empty, out_a: empty, out_b: empty})
        k = np.concatenate([np.asarray(p["k"]) for p in parts])
        v = np.concatenate([np.asarray(p["v"]) for p in parts])
        tag = np.concatenate([np.asarray(p["tag"]) for p in parts])
        uniq, inv = np.unique(k, return_inverse=True)
        ca = np.zeros(len(uniq), dtype=np.int64)
        cb = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(ca, inv[tag == 0], v[tag == 0])
        np.add.at(cb, inv[tag == 1], v[tag == 1])
        return pa.table({key_col: pa.array(uniq, pa.int64()),
                         out_a: pa.array(ca, pa.int64()),
                         out_b: pa.array(cb, pa.int64())})

    split_a, split_b = _make_split(0), _make_split(1)
    splits = ([split_a.options(num_returns=R).remote(r) for r in refs_a]
              + [split_b.options(num_returns=R).remote(r) for r in refs_b])
    if R == 1:
        red = [_reduce.remote(*splits)]
    else:
        red = [_reduce.remote(*[s[r] for s in splits]) for r in range(R)]
    return ray.data.from_arrow_refs(red)


def densify_ref(ds, key_col: str, val_col: str, fill: int = 0):
    """Build a dense int64 array ``arr[key] = val`` from a (key, val)
    Dataset in ONE worker task and return the ObjectRef — the broadcast
    small-side pattern (callers ``ray.get`` it inside map_batches for a
    zero-copy per-node read; the array never touches the driver).
    Caller is responsible for gating on a size threshold."""
    import ray

    @ray.remote
    def _dense(*blocks):
        import numpy as np
        ks = np.concatenate([np.asarray(b[key_col], dtype=np.int64)
                             for b in blocks])
        vs = np.concatenate([np.asarray(b[val_col], dtype=np.int64)
                             for b in blocks])
        arr = np.full(int(ks.max()) + 1 if len(ks) else 0, fill,
                      dtype=np.int64)
        arr[ks] = vs
        return arr

    return _dense.remote(*ds.materialize().to_arrow_refs())


def grouped_fsum_int64key(ds, key_col: str, val_col: str,
                          num_reducers: int | None = None,
                          out_val: str = "agg",
                          carry_col: str | None = None):
    """``SELECT key, SUM(val) GROUP BY key`` for an int64 key and a
    FLOAT64 value — the same two-wave task shuffle as
    :func:`grouped_agg_int64`, avoiding the Ray sort-groupby's
    multi-second fixed floor on small-but-wide candidate sets (the warm
    search-query path).  Per-key float sums fold in partition order, so
    results can differ from the sort-groupby by summation-order ulps —
    same tolerance class as any distributed float sum here.
    ``carry_col``: optional float64 column aggregated as per-key MAX and
    emitted alongside — for values constant within a key (e.g. a doc's
    cosine norm riding its posting rows), max IS the value and no second
    shuffle or join is needed."""
    import ray

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    R = num_reducers or max(1, min(len(refs), cpus // 4))

    @ray.remote
    def _split(block):
        t = _block_table(block)
        if t.num_rows:
            k = np.asarray(t[key_col], dtype=np.int64)
            v = np.asarray(t[val_col], dtype=np.float64)
            uniq, inv = np.unique(k, return_inverse=True)
            agg = np.bincount(inv, weights=v, minlength=len(uniq))
            if carry_col is not None:
                cv = np.asarray(t[carry_col], dtype=np.float64)
                car = np.full(len(uniq), -np.inf)
                np.maximum.at(car, inv, cv)
            else:
                car = None
        else:
            uniq = np.empty(0, dtype=np.int64)
            agg = np.empty(0, dtype=np.float64)
            car = np.empty(0, dtype=np.float64) \
                if carry_col is not None else None
        part = uniq % R
        outs = []
        for r in range(R):
            m = part == r
            cols = {"k": pa.array(uniq[m], pa.int64()),
                    "v": pa.array(agg[m], pa.float64())}
            if car is not None:
                cols["c"] = pa.array(car[m], pa.float64())
            outs.append(pa.table(cols))
        return tuple(outs) if R > 1 else outs[0]

    @ray.remote
    def _reduce(*parts):
        cols = {key_col: pa.array([], pa.int64()),
                out_val: pa.array([], pa.float64())}
        if carry_col is not None:
            cols[carry_col] = pa.array([], pa.float64())
        if not parts:
            return pa.table(cols)
        k = np.concatenate([np.asarray(p["k"]) for p in parts])
        v = np.concatenate([np.asarray(p["v"], dtype=np.float64)
                            for p in parts])
        uniq, inv = np.unique(k, return_inverse=True)
        agg = np.bincount(inv, weights=v, minlength=len(uniq))
        cols = {key_col: pa.array(uniq, pa.int64()),
                out_val: pa.array(agg, pa.float64())}
        if carry_col is not None:
            cv = np.concatenate([np.asarray(p["c"], dtype=np.float64)
                                 for p in parts])
            car = np.full(len(uniq), -np.inf)
            np.maximum.at(car, inv, cv)
            cols[carry_col] = pa.array(car, pa.float64())
        return pa.table(cols)

    splits = [_split.options(num_returns=R).remote(r) for r in refs]
    if R == 1:
        red = [_reduce.remote(*splits)]
    else:
        red = [_reduce.remote(*[s[r] for s in splits]) for r in range(R)]
    return ray.data.from_arrow_refs(red)
