"""Item-item co-purchase pairs — the market-basket projection.

The classic item-item collaborative-filtering build (Linden et al.,
"Amazon.com Recommendations: Item-to-Item Collaborative Filtering",
IEEE IC 2003): project the (basket, item) bipartite table onto item
pairs co-occurring in the same basket and rank by support.  The event
sibling (`event_type_affinity`) counts users-with-both; this one counts
BASKETS with both, the CF support measure.

Plan: two-wave task shuffle, no per-group Python.  Wave 1 dedups
(basket, item) per block and hash-partitions by basket; wave 2 dedups
globally per partition, sorts, and pair-expands each basket run with
the segmented kernel (`triangles.segment_pairs`), locally combining to
(pair-code, count) partials; a pair-code-keyed `grouped_agg_int64`
merges the partials and a multi-key top-k finishes.  Exact int64
counts — ties broken (support desc, p1, p2) identically to the SQL
twin.

Scale shape: baskets are bounded (a cart has tens of items, TPC-H
orders ≤ 7 lineitems), so pair volume is O(rows · basket_size) — no
hub blowup; the partitioning keys are the basket then the item pair.
``max_basket_size`` guards the pathological case (a "basket" that is
actually a crawl artifact): larger baskets keep their ``cap`` smallest
items (deterministic) — the exact uncapped mode is what the SQL oracle
checks.  Requires ids < 2^31 (packed-code bound, asserted).

Reference scope note: the reference has no basket surface (SURVEY.md
§2 addenda) — co-purchase is the standard recommender build on
transaction logs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def copurchase_topk(ds, basket_col: str, item_col: str, k: int = 50,
                    max_basket_size: int | None = None,
                    num_reducers: int | None = None):
    """Top-k item pairs by basket co-occurrence:
    ``(p1, p2, n_both)`` with p1 < p2, ordered by (n_both desc, p1, p2).
    """
    import ray

    from ..graph.triangles import segment_pairs
    from .relational import topk
    from .taskshuffle import _block_table, grouped_agg_int64

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    cpus = int(ray.cluster_resources().get("CPU", 8))
    R = num_reducers or max(1, min(len(refs), cpus // 4))

    @ray.remote
    def _split(block):
        t = _block_table(block)
        if t.num_rows:
            b = np.asarray(t[basket_col], dtype=np.int64)
            i = np.asarray(t[item_col], dtype=np.int64)
            assert i.max() < 2 ** 31 and i.min() >= 0, \
                "copurchase packed-code bound: item id outside [0, 2^31)"
            assert b.max() < 2 ** 31 and b.min() >= 0, \
                "copurchase packed-code bound: basket id outside [0, 2^31)"
            code = np.unique((b << 32) | i)   # block-local dedup
        else:
            code = np.empty(0, dtype=np.int64)
        part = (code >> np.int64(32)) % R     # partition by basket
        outs = []
        for r in range(R):
            outs.append(pa.table({"c": pa.array(code[part == r],
                                                pa.int64())}))
        return tuple(outs) if R > 1 else outs[0]

    @ray.remote
    def _pairs(*parts):
        code = np.unique(np.concatenate(
            [np.asarray(p["c"]) for p in parts]))  # global (b, i) dedup
        empty = pa.table({"code": pa.array([], pa.int64()),
                          "cnt": pa.array([], pa.int64())})
        if len(code) == 0:
            return empty
        b, i = code >> 32, code & 0xFFFFFFFF      # sorted by (b, i)
        starts = np.flatnonzero(np.r_[True, b[1:] != b[:-1]])
        lens = np.diff(np.r_[starts, len(b)])
        if max_basket_size is not None:
            rel = np.arange(len(i), dtype=np.int64) - np.repeat(starts,
                                                                lens)
            keep = rel < max_basket_size
            i = i[keep]
            lens = np.minimum(lens, max_basket_size)
        li, ri, _ = segment_pairs(lens)
        if not len(li):
            return empty
        pcode = (i[li] << np.int64(32)) | i[ri]   # p1 < p2 (sorted runs)
        uniq, cnt = np.unique(pcode, return_counts=True)
        return pa.table({"code": pa.array(uniq, pa.int64()),
                         "cnt": pa.array(cnt.astype(np.int64),
                                         pa.int64())})

    splits = [_split.options(num_returns=R).remote(r) for r in refs]
    if R == 1:
        pair_refs = [_pairs.remote(*splits)]
    else:
        pair_refs = [_pairs.remote(*[s[r] for s in splits])
                     for r in range(R)]
    partials = ray.data.from_arrow_refs(pair_refs)
    counts = grouped_agg_int64(partials, "code", "cnt", op="sum",
                               out_val="n_both")

    def _unpack(t: pa.Table) -> pa.Table:
        c = np.asarray(t["code"], dtype=np.int64)
        return pa.table({
            "p1": pa.array(c >> np.int64(32), pa.int64()),
            "p2": pa.array(c & np.int64(0xFFFFFFFF), pa.int64()),
            "n_both": t["n_both"].combine_chunks().cast(pa.int64())})

    pairs = counts.map_batches(_unpack, batch_format="pyarrow")
    return topk(pairs, ["n_both", "p1", "p2"], k,
                descending=[True, False, False])
