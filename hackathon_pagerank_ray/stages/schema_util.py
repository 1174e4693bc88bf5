"""Schema stability helpers.

Ray Data's hash-shuffle join broadcasts each side's schema via the first
block it sees; a zero-column empty block (which ``map_groups``/aggregations
can emit for empty partitions) poisons that broadcast and the join fails
with ``No match ... for key field reference`` — timing-dependent, so it
only bites on sparse/small inputs.  ``schema_safe`` wraps a batch function
so empty or degenerate input blocks always come out as a correctly-typed
empty table.
"""

from __future__ import annotations

import pyarrow as pa


def schema_safe(schema: pa.Schema, fn):
    """Wrap an Arrow-batch fn: degenerate/empty inputs → schema.empty_table()."""
    def wrapped(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        out = fn(t)
        if out.num_rows == 0:
            return schema.empty_table()
        return out
    return wrapped


def drop_empty_blocks(ds):
    """Materialize and strip zero-column/zero-row blocks.

    Ray's hash joins and groupby shuffles emit schema-less empty blocks for
    empty partitions; ``map_batches`` never calls the UDF on them, so they
    survive every transform and poison the schema broadcast of the NEXT
    join.  Stripping them at the ref level is the only reliable cure.
    Use on any join/groupby output that feeds another join.
    """
    import ray
    import ray.data as rd

    mat = ds.materialize()
    refs = mat.to_arrow_refs()

    @ray.remote
    def _probe(b):
        # blocks can be pandas DataFrames; to_arrow_refs does not convert
        if isinstance(b, pa.Table):
            return b.num_columns > 0 and b.num_rows > 0, True
        return b.shape[1] > 0 and b.shape[0] > 0, False

    @ray.remote
    def _to_arrow(b) -> pa.Table:
        return b if isinstance(b, pa.Table) else pa.Table.from_pandas(
            b, preserve_index=False)

    probes = ray.get([_probe.remote(r) for r in refs])
    keep = [(r, is_arrow) for r, (ok, is_arrow) in zip(refs, probes) if ok]
    if not keep:
        return mat                     # fully empty — caller must guard
    if len(keep) == len(refs) and all(a for _, a in keep):
        return mat                     # already clean, all Arrow
    return rd.from_arrow_refs(
        [r if is_arrow else _to_arrow.remote(r) for r, is_arrow in keep])


def enforce_schema(ds, schema: pa.Schema):
    """Append a pass that re-types every block to ``schema`` (empty blocks
    included) — use before joins on datasets whose lineage includes
    map_groups or aggregations."""
    def _enforce(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or t.num_columns == 0:
            return schema.empty_table()
        return t.select(schema.names).cast(schema)
    return ds.map_batches(_enforce, batch_format="pyarrow")
