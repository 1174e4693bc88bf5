"""Newman modularity of a community assignment over the undirected
simple graph — the standard quality score for label-propagation
communities (Newman & Girvan 2004; LP per Raghavan et al. 2007).

Per community c:  ``q_c = inside_c / m  -  (vol_c / 2m)^2``
where ``inside_c`` = edges with both endpoints in c, ``vol_c`` = sum of
member degrees (each edge contributes 2 to its endpoints' communities),
and ``m`` = undirected simple edge count.  Global modularity Q is the
sum of ``q_c`` — left to the consumer, so this operator emits NO float
summation anywhere: ``inside``/``volume`` are exact int64 counts and
each ``q_c`` is a fixed expression tree over them, making the DuckDB
twin bit-equal per row.

Scale shape: two vid-keyed hash joins of the edge table against the
label table (the engine's single partitioning key), then two
single-int64-key count shuffles whose output is bounded by the number
of communities.  No per-row Python; no driver collect.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def community_modularity(edges_ds, labels_ds, num_partitions: int = 8,
                         broadcast_threshold: int = 4_000_000):
    """Per-community modularity terms.

    ``labels_ds`` has columns ``(vid, label)`` covering every vertex that
    appears on an edge (LP/CC outputs qualify).  Returns a Dataset
    ``(label:int64, inside_edges:int64, volume:int64, q:float64)`` with
    one row per community that touches at least one edge (communities of
    isolated vertices have q = 0 by definition and are omitted), sorted
    by label.
    """
    import ray.data
    from .triangles import canonical_undirected
    from ..stages.relational import inner_join, left_join_coalesce
    from ..stages.schema_util import drop_empty_blocks, enforce_schema
    from ..stages.taskshuffle import grouped_agg_int64

    und = canonical_undirected(edges_ds, num_partitions).materialize()
    m = und.count()
    if m == 0:
        return ray.data.from_arrow(_SCHEMA.empty_table())

    n_labels = labels_ds.count()
    if n_labels <= broadcast_threshold:
        # small-universe path (the adaptive pattern used repo-wide):
        # densify the label table in ONE worker task, ray.put the array
        # once, and index it inside map_batches over the edges — the two
        # edge×label hash joins disappear entirely.
        import ray
        from ..stages.taskshuffle import densify_ref

        lab_ref = densify_ref(labels_ds, "vid", "label", fill=-1)

        def _lookup(t: pa.Table) -> pa.Table:
            import numpy as np
            arr = ray.get(lab_ref)   # zero-copy shared per node
            u = np.asarray(t["u"], dtype=np.int64)
            v = np.asarray(t["v"], dtype=np.int64)
            return pa.table({"lab_u": pa.array(arr[u], pa.int64()),
                             "lab_v": pa.array(arr[v], pa.int64())})

        ej = und.map_batches(_lookup, batch_format="pyarrow")
    else:
        # at-scale path: two hash joins keyed on the engine's single
        # partitioning key
        def _as(name):
            # arrow-projection rename: robust to pandas-backed label
            # blocks, and pins int64 dtypes before the joins
            def _p(t: pa.Table) -> pa.Table:
                return pa.table({
                    "vid": t["vid"].combine_chunks().cast(pa.int64()),
                    name: t["label"].combine_chunks().cast(pa.int64())})
            return labels_ds.map_batches(_p, batch_format="pyarrow")

        ej = inner_join(und, _as("lab_u"),
                        "u", right_on="vid", num_partitions=num_partitions)
        ej = inner_join(ej, _as("lab_v"),
                        "v", right_on="vid", num_partitions=num_partitions)
        ej = drop_empty_blocks(ej.select_columns(["lab_u", "lab_v"]))

    # two consumers (inside + volume): pin ej once, or the whole
    # join/lookup pipeline executes twice
    ej = ej.materialize()
    inside = grouped_agg_int64(
        ej.map_batches(
            lambda t: pa.table({"label": t.filter(
                pc.equal(t["lab_u"], t["lab_v"]))["lab_u"].combine_chunks()
                .cast(pa.int64())}),
            batch_format="pyarrow"),
        "label", None, op="sum", out_val="inside_edges")
    volume = grouped_agg_int64(
        ej.map_batches(
            lambda t: pa.table({"label": pa.concat_arrays(
                [t["lab_u"].combine_chunks().cast(pa.int64()),
                 t["lab_v"].combine_chunks().cast(pa.int64())])}),
            batch_format="pyarrow"),
        "label", None, op="sum", out_val="volume")

    # The task shuffle emits schema-less blocks for empty reducers —
    # strip/re-type both sides or the join can't resolve the key field.
    # A zero-inside-edge assignment (possible: synchronous LP two-colors
    # bipartite-ish graphs, leaving every edge cross-community) makes the
    # whole `inside` dataset schema-less; Ray's hash join can't take an
    # all-empty side, so skip the join and splice a zero column instead.
    volume = drop_empty_blocks(enforce_schema(volume, pa.schema(
        [pa.field("label", pa.int64()), pa.field("volume", pa.int64())])))
    if inside.count() == 0:
        out = volume.map_batches(
            lambda t: t.append_column(
                "inside_edges", pa.array([0] * t.num_rows, pa.int64())),
            batch_format="pyarrow")
    else:
        inside = drop_empty_blocks(enforce_schema(inside, pa.schema(
            [pa.field("label", pa.int64()),
             pa.field("inside_edges", pa.int64())])))
        out = left_join_coalesce(volume, inside, "label",
                                 fill={"inside_edges": 0},
                                 num_partitions=num_partitions)

    def _q(t: pa.Table) -> pa.Table:
        inside_f = t["inside_edges"].combine_chunks().cast(pa.float64())
        vol_f = t["volume"].combine_chunks().cast(pa.float64())
        # fixed expression tree (division + one multiply, no pow/log):
        # bit-equal to the SQL twin's CAST(...)/m - (CAST(..)/(2m))*(..)
        frac = pc.divide(vol_f, pa.scalar(float(2 * m), pa.float64()))
        q = pc.subtract(
            pc.divide(inside_f, pa.scalar(float(m), pa.float64())),
            pc.multiply(frac, frac))
        return pa.table({"label": t["label"].combine_chunks(),
                         "inside_edges": t["inside_edges"].combine_chunks(),
                         "volume": t["volume"].combine_chunks(),
                         "q": q})

    out = out.map_batches(_q, batch_format="pyarrow")
    return drop_empty_blocks(enforce_schema(out, _SCHEMA).sort("label"))


_SCHEMA = pa.schema([pa.field("label", pa.int64()),
                     pa.field("inside_edges", pa.int64()),
                     pa.field("volume", pa.int64()),
                     pa.field("q", pa.float64())])
