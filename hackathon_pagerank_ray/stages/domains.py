"""Host-graph collapse and link reciprocity (web-graph rollups).

The reference engine works on the page-level link graph (edges built in
crawler/core.py:160-210 and ranked in backend/cuda/pagerank_gpu.cu); a
production web pipeline also needs the HOST (domain) graph — vertices
collapsed through a page→domain projection, edge weight = the number of
page-level links between the two domains, intra-domain links dropped
(Broder et al., "Graph structure in the Web", 2000).  Reciprocity (the
fraction of directed distinct links whose reverse edge also exists) is
the standard mixing-health signal on either graph.

Scale shape: the collapse is ONE packed-key count shuffle
(stages/taskshuffle.py — Ray Data's multi-column groupby measured ~8×
slower than the identical single-key plan, BASELINE.md r3) whose output
cardinality is at most num_domains², independent of edge count; the
reciprocity pass is a distinct + one hash-partitioned self-semi-join,
both streaming.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def domain_graph(edges_ds, num_domains: int = 128,
                 src_col: str = "src", dst_col: str = "dst",
                 drop_intra: bool = True):
    """Collapse a page-level edge table to the domain (host) graph.

    ``domain(v) = v % num_domains`` stands in for the url→host
    projection (the engine's id assigner is dense, stages/ids.py, so a
    modulo is the deterministic small-scale synthesis of "many pages
    per host"); a real deployment passes a page→host mapping column
    instead.  Returns ``(src_dom, dst_dom, w)`` with ``w`` = the int64
    count of page-level links, intra-domain links dropped when
    ``drop_intra`` (the host graph convention).

    Requires non-negative vertex ids and ``num_domains < 2^31`` (the
    packed-key bound; numpy's ``%`` matches SQL's only for non-negative
    dividends).
    """
    from .taskshuffle import grouped_agg_int64

    if not (0 < num_domains < 2 ** 31):
        raise ValueError(f"num_domains out of packed-key bounds: "
                         f"{num_domains}")
    nd = np.int64(num_domains)

    def _collapse(t: pa.Table) -> pa.Table:
        s = np.asarray(t[src_col], dtype=np.int64)
        d = np.asarray(t[dst_col], dtype=np.int64)
        if len(s) and (s.min() < 0 or d.min() < 0):
            raise ValueError("domain_graph requires non-negative ids")
        # zero-copy Arrow buffers are read-only: no in-place ops
        s = s % nd
        d = d % nd
        if drop_intra:
            keep = s != d
            s, d = s[keep], d[keep]
        return pa.table({"k": pa.array((s << np.int64(32)) | d, pa.int64())})

    packed = edges_ds.map_batches(_collapse, batch_format="pyarrow")
    agg = grouped_agg_int64(packed, "k", None, op="sum", out_val="w")

    def _unpack(t: pa.Table) -> pa.Table:
        k = np.asarray(t["k"], dtype=np.int64)
        return pa.table({
            "src_dom": pa.array(k >> np.int64(32), pa.int64()),
            "dst_dom": pa.array(k & np.int64(0xFFFFFFFF), pa.int64()),
            "w": t["w"].combine_chunks()})

    return agg.map_batches(_unpack, batch_format="pyarrow")


def domain_weighted_edges(edges_ds, num_domains: int = 128,
                          src_col: str = "src", dst_col: str = "dst"):
    """The collapsed graph shaped for the PageRank engine:
    ``(src, dst, w)`` with float64 weights (counts are exact in a
    double until 2^53, far beyond any per-domain-pair link count)."""

    def _to_pr(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["src_dom"].combine_chunks(),
            "dst": t["dst_dom"].combine_chunks(),
            "w": t["w"].combine_chunks().cast(pa.float64())})

    return domain_graph(edges_ds, num_domains, src_col, dst_col).map_batches(
        _to_pr, batch_format="pyarrow")


def reciprocity(edges_ds, src_col: str = "src", dst_col: str = "dst",
                num_partitions: int = 16):
    """Global link reciprocity: over the DISTINCT non-self-loop edge
    set, the fraction whose reverse edge exists.  One row
    ``(n_edges, n_mutual, reciprocity)``.

    Because the left side of the self-semi-join is distinct, every row
    matches at most once, so the semi-join row count equals the SQL
    inner-join COUNT(*) (same argument as degrees.mutual_edge_counts).
    The ratio is one float64 division of two exact int64 counts —
    bit-identical to the SQL twin's CAST(... AS DOUBLE) / n.
    """
    import pyarrow.compute as pc
    import ray.data as rd

    from .relational import distinct, semi_join

    def _drop_self(t: pa.Table) -> pa.Table:
        t = t.filter(pc.not_equal(t[src_col], t[dst_col]))
        return pa.table({src_col: t[src_col].combine_chunks(),
                         dst_col: t[dst_col].combine_chunks()})

    e = distinct(edges_ds.map_batches(_drop_self, batch_format="pyarrow"),
                 [src_col, dst_col], num_partitions).materialize()
    mutual = semi_join(e, e, on=(src_col, dst_col),
                       right_on=(dst_col, src_col),
                       num_partitions=num_partitions)
    n_edges = e.count()
    n_mutual = mutual.count()
    ratio = float(n_mutual) / float(n_edges) if n_edges else 0.0
    return rd.from_arrow(pa.table({
        "n_edges": pa.array([n_edges], pa.int64()),
        "n_mutual": pa.array([n_mutual], pa.int64()),
        "reciprocity": pa.array([ratio], pa.float64())}))


def crawl_budget(ranks_ds, budget: int = 10_000, id_col: str = "vid",
                 rank_col: str = "rank"):
    """Per-domain crawl-budget apportionment: split an integer page
    ``budget`` across domains proportionally to their (already
    sum-normalized) PageRank by largest-remainder (Hamilton) rounding —
    ``base = floor(budget·rank)``; the leftover ``budget − Σbase`` units
    go to the largest fractional remainders (ties to the smaller vid).
    The crawl-scheduling step a recrawl pipeline keys on
    ``domain_pagerank`` / ``domain_rank_mass``.

    All-integer output, so the SQL twin hashes exactly PROVIDED both
    engines hold identical rank doubles (true for the unrolled
    fixed-sweep solves this feeds on; a last-ulp rank difference at a
    floor/remainder boundary would flip one unit — same empirical-parity
    caveat as stages/kmeans).

    The domain table is bounded (|domains| ≪ pages — e.g. 128 collapse
    buckets regardless of page count), so the global remainder sort runs
    in ONE worker task over a single block; nothing reaches the driver.
    """
    import numpy as np
    import ray.data as rd

    def _alloc(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "alloc": pa.array([], pa.int64())})
        vid = t[id_col].combine_chunks().to_numpy(zero_copy_only=False)
        r = t[rank_col].combine_chunks().to_numpy(zero_copy_only=False)
        q = budget * r
        base = np.floor(q)
        frac = q - base
        base = base.astype(np.int64)
        left = max(int(budget - base.sum()), 0)
        order = np.lexsort((vid, -frac))      # frac desc, vid asc
        alloc = base.copy()
        alloc[order[:left]] += 1
        out_order = np.argsort(vid, kind="stable")
        return pa.table({id_col: pa.array(vid[out_order], pa.int64()),
                         "alloc": pa.array(alloc[out_order], pa.int64())})

    return ranks_ds.repartition(1).map_batches(
        _alloc, batch_format="pyarrow", batch_size=None)
