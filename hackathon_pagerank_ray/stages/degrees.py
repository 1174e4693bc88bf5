"""Degree tables and dangling detection (SURVEY.md A1/A2/A4).

Reference computes out-degrees with a dense array pass and flags
``outdeg == 0`` as dangling (backend/cuda/pagerank_gpu.cu:68-80); here they
are groupby-count shuffles plus an anti-join, all streaming.
"""

from __future__ import annotations

from .relational import anti_join


def out_degrees(edges_ds, src_col: str = "src"):
    """(src, outdeg) — count per source vertex (A1).  Vertex ids are
    int64, so the count runs on the task shuffle (Dataset groupby pays
    a multi-second floor, stages/taskshuffle.py)."""
    from .taskshuffle import grouped_agg_int64
    return grouped_agg_int64(edges_ds.select_columns([src_col]), src_col,
                             None, op="sum", out_val="outdeg")


def in_degrees(edges_ds, dst_col: str = "dst"):
    """(dst, indeg) — count per destination vertex (A4)."""
    from .taskshuffle import grouped_agg_int64
    return grouped_agg_int64(edges_ds.select_columns([dst_col]), dst_col,
                             None, op="sum", out_val="indeg")


def dangling_vertices(vertices_ds, edges_ds, vid_col: str = "vid",
                      src_col: str = "src", num_partitions: int = 16):
    """A2: vertices with no out-edges = anti-join of the vertex table
    against distinct edge sources."""
    from .relational import distinct
    srcs = distinct(edges_ds, [src_col], num_partitions)
    return anti_join(vertices_ds, srcs, on=vid_col, right_on=src_col,
                     num_partitions=num_partitions)


def mutual_edge_counts(edges_ds, src_col: str = "src",
                       dst_col: str = "dst", num_partitions: int = 16):
    """(src, mutual_cnt) — per source vertex, how many of its distinct
    out-edges are reciprocated (the reverse edge exists).  Link-graph
    reciprocity: the fraction of mutual links is a standard web-graph
    health signal (directed edges u→v with v→u also present).

    Shape: dedup the edge table, then ONE hash-partitioned semi-join of
    the distinct edges against themselves with the key columns swapped
    (``left.(src,dst) = right.(dst,src)``), then a count shuffle on src.
    Because the left side is distinct, each row matches at most once, so
    the semi-join count equals the SQL inner-join COUNT(*).
    """
    from .relational import distinct, semi_join
    e = distinct(edges_ds, [src_col, dst_col], num_partitions)
    mutual = semi_join(e, e, on=(src_col, dst_col),
                       right_on=(dst_col, src_col),
                       num_partitions=num_partitions)
    from .taskshuffle import grouped_agg_int64
    return grouped_agg_int64(mutual.select_columns([src_col]), src_col,
                             None, op="sum", out_val="mutual_cnt")


def degree_histogram(edges_ds, src_col: str = "src"):
    """(degree, n_vertices) — the out-degree distribution: two count
    shuffles, the second over at most max-degree distinct keys (power-law
    graphs: a few hundred rows regardless of graph size)."""
    from .taskshuffle import grouped_agg_int64
    hist = grouped_agg_int64(out_degrees(edges_ds, src_col), "outdeg",
                             None, op="sum", out_val="n_vertices")
    return hist.rename_columns({"outdeg": "degree"})


def degree_assortativity(edges_ds, num_partitions: int = 8):
    """Out–in degree assortativity of the directed edge table: the
    Pearson correlation, over every edge (u, v), of outdeg(u) against
    indeg(v) — positive when hubs link to hubs (Newman 2002's r for
    directed graphs, the standard web-graph mixing signal).

    Two hash joins decorate each edge with its endpoint degrees; the
    correlation itself reuses :func:`..aggregates.pearson_corr` at
    scale=1 — degrees are integers, so the moments are EXACT and the
    single float expression is bit-identical to the SQL twin.  Returns
    one row ``(corr_xy, n)``.
    """
    from .aggregates import pearson_corr
    from .relational import inner_join

    do = out_degrees(edges_ds)
    di = in_degrees(edges_ds)
    j = inner_join(edges_ds, do, on="src", num_partitions=num_partitions)
    j = inner_join(j, di, on="dst", num_partitions=num_partitions)
    return pearson_corr(j, "outdeg", "indeg", scale=1)


def two_hop_counts(edges_ds, num_partitions: int = 8):
    """(src, two_hop) — per source vertex, the number of DISTINCT
    vertices reachable in exactly two directed steps (src→mid→w, w ≠
    src; direct neighbors count only if also reachable in two steps).
    The friends-of-friends audience size, a standard web/social-graph
    reach signal.

    One self-join of the distinct edge table on the middle vertex, then
    a distinct + count — all integer, so the SQL twin is trivially
    hash-exact.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from .relational import distinct, inner_join, rename

    e = distinct(edges_ds, ["src", "dst"], num_partitions).materialize()
    right = rename(e, {"src": "mid", "dst": "w"})
    j = inner_join(rename(e, {"dst": "mid"}), right, on="mid",
                   num_partitions=num_partitions)

    def _drop_self(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["src"], t["w"])
        t = t.filter(keep)
        return pa.table({"src": t["src"].combine_chunks(),
                         "w": t["w"].combine_chunks()})

    pairs = distinct(j.map_batches(_drop_self, batch_format="pyarrow"),
                     ["src", "w"], num_partitions)
    return (pairs.groupby("src").count()
            .rename_columns({"count()": "two_hop"}))


def powerlaw_alpha(edges_ds, src_col: str = "src", dmin: int = 5):
    """Hill estimator of the out-degree power-law exponent
    ``alpha = 1 + n / Σ ln(d_i / dmin)`` over vertices with degree ≥
    ``dmin`` (Broder et al. report alpha ≈ 2.1 for the web graph — the
    health check a crawl rollup runs on its degree distribution).

    Shape: reuses :func:`degree_histogram` (bounded output — at most
    max-degree rows on any graph size), collects the tiny histogram,
    and folds the log-sum in degree order with ``math.log`` per DISTINCT
    degree — ``math.log`` matches SQL ``ln`` bit-for-bit where numpy's
    SIMD log differs in the last ulp (BASELINE.md float-parity rules).
    One row ``(n_tail, alpha)``.
    """
    import math

    import pyarrow as pa
    import ray.data as rd

    hist = degree_histogram(edges_ds, src_col).to_pandas()
    tail = hist[hist["degree"] >= dmin].sort_values("degree")
    n = int(tail["n_vertices"].sum())
    sl = 0.0
    for deg, cnt in zip(tail["degree"].to_numpy(),
                        tail["n_vertices"].to_numpy()):
        sl += float(cnt) * math.log(float(deg) / float(dmin))
    alpha = 1.0 + float(n) / sl if sl > 0 else float("inf")
    return rd.from_arrow(pa.table({
        "n_tail": pa.array([n], pa.int64()),
        "alpha": pa.array([alpha], pa.float64())}))


def avg_neighbor_degree(edges_ds, num_partitions: int = 8):
    """(vid, avg_nbr_deg) over the undirected simple graph — the
    per-vertex degree-correlation function knn(v) (Pastor-Satorras et
    al.): mean degree of v's neighbors.  Rich-club/assortativity
    companion at vertex granularity.

    Exact: neighbor-degree SUM and COUNT are int64 (one undirected-edge
    explode + one single-key shuffle each via the task shuffle), the
    mean is ONE float division per vertex — no float summation.
    """
    import pyarrow as pa

    from ..graph.triangles import canonical_undirected, undirected_degrees
    from .relational import inner_join, rename
    from .schema_util import drop_empty_blocks, enforce_schema
    from .taskshuffle import grouped_agg_int64

    und = canonical_undirected(edges_ds, num_partitions).materialize()
    deg = undirected_degrees(und).materialize()

    # explode to directed (vid, nbr) then attach nbr's degree
    def _sym(t: pa.Table) -> pa.Table:
        import numpy as np
        u = np.asarray(t["u"], dtype=np.int64)
        v = np.asarray(t["v"], dtype=np.int64)
        return pa.table({"vid": pa.array(np.concatenate([u, v]), pa.int64()),
                         "nbr": pa.array(np.concatenate([v, u]), pa.int64())})

    sym = und.map_batches(_sym, batch_format="pyarrow")
    withdeg = inner_join(sym, rename(deg, {"vid": "nbr", "deg": "nbr_deg"}),
                         on="nbr", num_partitions=num_partitions)
    withdeg = drop_empty_blocks(enforce_schema(withdeg, pa.schema(
        [("vid", pa.int64()), ("nbr", pa.int64()),
         ("nbr_deg", pa.int64())])))
    sums = grouped_agg_int64(withdeg, "vid", "nbr_deg", op="sum",
                             out_val="s")

    # join back the vertex's own degree as the divisor (count of nbrs)
    out = inner_join(drop_empty_blocks(enforce_schema(sums, pa.schema(
        [("vid", pa.int64()), ("s", pa.int64())]))), deg,
        on="vid", num_partitions=num_partitions)

    def _div(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = t["s"].combine_chunks().cast(pa.float64())
        d = t["deg"].combine_chunks().cast(pa.float64())
        return pa.table({"vid": t["vid"].combine_chunks(),
                         "avg_nbr_deg": pc.divide(s, d)})

    return drop_empty_blocks(enforce_schema(
        out.map_batches(_div, batch_format="pyarrow"),
        pa.schema([("vid", pa.int64()), ("avg_nbr_deg", pa.float64())])))


def rich_club(edges_ds, ks=(5, 10, 20), num_partitions: int = 8,
              broadcast_threshold: int = 50_000_000):
    """Rich-club coefficient φ(k) over the undirected simple graph
    (Colizza et al. 2006): among vertices with degree > k, the realized
    fraction of possible edges — ``φ = 2·E_k / (N_k·(N_k−1))``.  The
    hub-interconnection health check (web graphs: rising φ(k) = a
    tightly-knit core of hubs).

    Exact int64 counts + ONE float division per k.  The degree table is
    densified in a worker task and broadcast under ``broadcast_threshold``
    vertices (8 bytes each), so counting E_k is one streaming pass over
    the edges per call — no shuffle beyond the degree count itself; the
    output is ``len(ks)`` rows regardless of graph size.
    """
    import ray
    import pyarrow as pa

    from ..graph.triangles import canonical_undirected, undirected_degrees

    und = canonical_undirected(edges_ds, num_partitions).materialize()
    deg = undirected_degrees(und).materialize()
    if deg.count() > broadcast_threshold:
        raise NotImplementedError(
            "rich_club: degree table exceeds the broadcast bound; the "
            "at-scale path is a per-k degree semi-join on both endpoints "
            "— add it when a graph this large actually needs φ(k)")

    from .taskshuffle import densify_ref

    dref = densify_ref(deg, "vid", "deg", fill=0)
    ks = tuple(int(k) for k in ks)

    def _partial(t: pa.Table) -> pa.Table:
        import numpy as np
        arr = ray.get(dref)
        u = np.asarray(t["u"], dtype=np.int64)
        v = np.asarray(t["v"], dtype=np.int64)
        du, dv = arr[u], arr[v]
        return pa.table({"k": pa.array(ks, pa.int64()),
                         "e_k": pa.array(
                             [int(((du > k) & (dv > k)).sum())
                              for k in ks], pa.int64())})

    ek = (und.map_batches(_partial, batch_format="pyarrow")
          .groupby("k").sum("e_k"))
    ek_map = {int(r["k"]): int(r["sum(e_k)"]) for r in ek.take_all()}
    # N_k counted in a worker task — the dense array never reaches the
    # driver (only len(ks) ints do)
    nk_list = ray.get(ray.remote(
        lambda arr, _ks=ks: [int((arr > k).sum()) for k in _ks]
    ).remote(dref))
    rows_k, rows_n, rows_e, rows_phi = [], [], [], []
    for k, n_k in zip(ks, nk_list):
        e_k = ek_map.get(k, 0)
        rows_k.append(k)
        rows_n.append(n_k)
        rows_e.append(e_k)
        rows_phi.append(2.0 * e_k / (n_k * (n_k - 1)) if n_k > 1 else 0.0)
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "k": pa.array(rows_k, pa.int64()),
        "n_nodes": pa.array(rows_n, pa.int64()),
        "n_edges": pa.array(rows_e, pa.int64()),
        "phi": pa.array(rows_phi, pa.float64())}))
