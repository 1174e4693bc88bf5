"""TrustRank / spam mass (Gyöngyi, Garcia-Molina & Pedersen, "Combating
web spam with TrustRank", VLDB 2004).

TrustRank IS personalized PageRank whose teleport (and dangling) mass
lands on a trusted seed set, so the engine reuses the sharded
``pagerank(personalization=)`` solve unchanged.  The spam-detection
signal is the **relative spam mass**: ``(pr - tr) / pr`` — the fraction
of a page's PageRank that does NOT flow through trusted pages; values
near 1 flag link-spam candidates, trusted hubs sit near or below 0.

Scale shape: ONE mesh build, two fixed-sweep solves on it (state is
re-initialized per solve), one vid-keyed hash join of the two rank
tables, and one fixed float64 expression per row (subtract + divide, no
summation) — the SQL twin composes the two unrolled chains and matches
at hash precision.

Reference scope note: the reference computes plain PageRank only
(backend/data/pagerank.py); TrustRank/spam-mass is part of this repo's
link-analysis widening over the same mesh primitives.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCHEMA = pa.schema([pa.field("vid", pa.int64()),
                     pa.field("pr", pa.float64()),
                     pa.field("tr", pa.float64()),
                     pa.field("spam_mass", pa.float64())])


def spam_mass(edges_ds, seeds: np.ndarray | None = None,
              num_owners: int = 4, sweeps: int = 20, alpha: float = 0.85,
              num_partitions: int = 8):
    """(vid, pr, tr, spam_mass) over the edge table's vertex universe.

    ``seeds`` defaults to the deterministic stand-in trusted set
    ``vid % 10 == 0`` (the same set the `personalized_pagerank` query
    uses); a real deployment passes a curated whitelist.  Both solves
    run exactly ``sweeps`` power sweeps (tol=0) so the unrolled SQL twin
    is exact.
    """
    import ray.data
    from .engine import ShardedGraph, pagerank
    from ..stages.relational import inner_join
    from ..stages.schema_util import drop_empty_blocks, enforce_schema

    g = ShardedGraph.build(edges_ds, num_owners=num_owners)
    try:
        if g.n == 0:
            return ray.data.from_arrow(_SCHEMA.empty_table())
        pr, _ = pagerank(g, alpha=alpha, tol=0.0, max_iter=sweeps)
        pr = pr.materialize()
        if seeds is None:
            seeds = np.arange(0, g.n, 10, dtype=np.int64)
        w = np.full(len(seeds), 1.0 / len(seeds))
        tr, _ = pagerank(g, alpha=alpha, tol=0.0, max_iter=sweeps,
                         personalization=(seeds, w))
        tr = tr.materialize()
    finally:
        g.shutdown()

    pr2 = pr.map_batches(
        lambda t: pa.table({"vid": t["vid"].combine_chunks(),
                            "pr": t["rank"].combine_chunks()}),
        batch_format="pyarrow")
    tr2 = tr.map_batches(
        lambda t: pa.table({"vid": t["vid"].combine_chunks(),
                            "tr": t["rank"].combine_chunks()}),
        batch_format="pyarrow")
    out = inner_join(pr2, tr2, "vid", num_partitions=num_partitions)

    def _mass(t: pa.Table) -> pa.Table:
        p = t["pr"].combine_chunks().cast(pa.float64())
        r = t["tr"].combine_chunks().cast(pa.float64())
        # pr > 0 always: the (1-alpha)/n teleport floor is strictly
        # positive, so the division is safe
        return pa.table({"vid": t["vid"].combine_chunks(), "pr": p,
                         "tr": r,
                         "spam_mass": pc.divide(pc.subtract(p, r), p)})

    return drop_empty_blocks(enforce_schema(
        out.map_batches(_mass, batch_format="pyarrow"), _SCHEMA))
