"""PageRank expressed purely in Dataset ops (SURVEY.md §7.6 first plan).

Each sweep is the literal gather-scatter the north rule names:
``ranks ⋈ edges on src`` → per-edge contribution ``rank/outdeg`` →
``groupby(dst).sum`` (the hash(dst)-keyed shuffle) → affine update →
L1 residual.  Semantics identical to ``graph.engine.pagerank`` and the
reference (backend/cuda/pagerank_gpu.cu:137-191); this form exists as the
Dataset-native statement of the algorithm and as a cross-check for the
sharded engine — per-sweep Dataset shuffles cost seconds, so use the
sharded engine for anything beyond small graphs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..stages.degrees import out_degrees
from ..stages.relational import inner_join, left_join_coalesce, semi_join
from ..stages.schema_util import drop_empty_blocks, enforce_schema

_VID = pa.schema([pa.field("vid", pa.int64())])
_GATHERED = pa.schema([pa.field("vid", pa.int64()),
                       pa.field("sum(contrib)", pa.float64())])
_CONTRIB = pa.schema([pa.field("vid", pa.int64()),
                      pa.field("contrib", pa.float64())])
_RANKS = pa.schema([pa.field("vid", pa.int64()), pa.field("rank", pa.float64())])


def pagerank_dataset(edges_ds, n: int | None = None, alpha: float = 0.85,
                     tol: float = 1e-8, max_iter: int = 100,
                     num_partitions: int = 8):
    """Returns ``(ranks_ds (vid, rank), info)``."""
    import ray.data as rd

    edges_ds = edges_ds.materialize()
    if n is None:
        if edges_ds.count() == 0:
            n = 0                      # max() returns None on empty input
        else:
            mx = edges_ds.max(["src", "dst"])
            n = int(max(mx["max(src)"], mx["max(dst)"])) + 1
    if n == 0:
        return (rd.from_arrow(_RANKS.empty_table()),
                {"sweeps": 0, "residual_l1": 0.0, "n": 0})

    # materialized: consumed by two downstream plans (1/outdeg join and the
    # dangling anti-join) — reusing a lazy Dataset object across separately
    # executed plans both recomputes it and can corrupt the later join plan
    deg = out_degrees(edges_ds).materialize()

    def _inv(t: pa.Table) -> pa.Table:
        inv = pc.divide(pa.scalar(1.0), pc.cast(t["outdeg"], pa.float64()))
        return t.append_column("inv_out", inv)

    # edges with 1/outdeg attached — computed once, reused every sweep
    e = inner_join(edges_ds, deg.map_batches(_inv, batch_format="pyarrow"),
                   on="src", num_partitions=num_partitions)
    e = drop_empty_blocks(e.select_columns(["src", "dst", "inv_out"]))

    vertices = rd.range(n).map_batches(
        lambda t: pa.Table.from_arrays(
            [pc.cast(t["id"], pa.int64())], names=["vid"]),
        batch_format="pyarrow").materialize()
    dangling = enforce_schema(vertices.join(
        deg.rename_columns({"src": "vid"}), "left_anti", num_partitions,
        on=("vid",), validate_schemas=True), _VID)
    dangling = drop_empty_blocks(dangling)
    # an empty materialized dataset carries no schema and breaks later
    # joins — and with no dangling vertices the per-sweep mass is just 0
    has_dangling = dangling.count() > 0

    ranks = vertices.map_batches(
        lambda t: t.append_column(
            "rank", pa.array([1.0 / n] * t.num_rows, pa.float64())),
        batch_format="pyarrow").materialize()

    teleport = (1.0 - alpha) / n
    residual = float("inf")
    sweeps = 0
    for it in range(max_iter):
        dm = (semi_join(ranks, dangling, on="vid",
                        num_partitions=num_partitions).sum("rank") or 0.0
              ) if has_dangling else 0.0

        contribs = inner_join(ranks.rename_columns({"vid": "src"}), e,
                              on="src", num_partitions=num_partitions)
        def _contrib(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return _CONTRIB.empty_table()
            prod = pc.multiply(t["rank"], t["inv_out"])
            if isinstance(prod, pa.ChunkedArray):
                prod = prod.combine_chunks()
            return pa.Table.from_arrays(
                [t["dst"].combine_chunks(), prod], names=["vid", "contrib"])

        contribs = contribs.map_batches(_contrib, batch_format="pyarrow")
        gathered = drop_empty_blocks(enforce_schema(
            contribs.groupby("vid").sum("contrib"), _GATHERED))

        new_ranks = left_join_coalesce(vertices, gathered, on="vid",
                                       fill={"sum(contrib)": 0.0},
                                       num_partitions=num_partitions)

        def _update(t: pa.Table, dm=dm) -> pa.Table:
            if t.num_rows == 0 or t.num_columns == 0:
                return _RANKS.empty_table()
            y = pc.add(t["sum(contrib)"], pa.scalar(dm / n, pa.float64()))
            r = pc.add(pc.multiply(y, pa.scalar(alpha, pa.float64())),
                       pa.scalar(teleport, pa.float64()))
            return pa.Table.from_arrays(
                [t["vid"].combine_chunks(), r], names=["vid", "rank"])

        new_ranks = drop_empty_blocks(
            new_ranks.map_batches(_update, batch_format="pyarrow"))

        diff = inner_join(new_ranks.rename_columns({"rank": "rank_new"}),
                          ranks, on="vid", num_partitions=num_partitions)
        residual = diff.map_batches(
            lambda t: pa.Table.from_arrays(
                [pc.abs(pc.subtract(t["rank_new"], t["rank"]))],
                names=["d"]),
            batch_format="pyarrow").sum("d")
        ranks = new_ranks
        sweeps = it + 1
        if residual < tol:
            break

    total = ranks.sum("rank")
    if total and total > 0:
        ranks = ranks.map_batches(
            lambda t: pa.Table.from_arrays(
                [t["vid"].combine_chunks(),
                 pc.divide(t["rank"], pa.scalar(float(total), pa.float64()))],
                names=["vid", "rank"]),
            batch_format="pyarrow")

    return ranks, {"sweeps": sweeps, "residual_l1": float(residual), "n": n}
