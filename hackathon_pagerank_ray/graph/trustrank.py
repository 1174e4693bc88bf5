"""TrustRank / spam mass (Gyöngyi, Garcia-Molina & Pedersen, "Combating
web spam with TrustRank", VLDB 2004).

TrustRank IS personalized PageRank whose teleport (and dangling) mass
lands on a trusted seed set, so the engine reuses the sharded
``pagerank(personalization=)`` solve unchanged.  The spam-detection
signal is the **relative spam mass**: ``(pr - tr) / pr`` — the fraction
of a page's PageRank that does NOT flow through trusted pages; values
near 1 flag link-spam candidates, trusted hubs sit near or below 0.

Scale shape: ONE mesh build, two fixed-sweep solves on it (state is
re-initialized per solve), a per-owner slot-aligned zip of the two
rank tables (both solves share the mesh, so no join at all), and one
fixed float64 expression per row (subtract + divide, no summation) — the SQL twin composes the two unrolled chains and matches
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


def _zip_mass_fn(pr_t: pa.Table, tr_t: pa.Table) -> pa.Table:
    """Slot-aligned zip of the two rank tables + the per-row mass
    expression.  pr > 0 always (the (1-alpha)/n teleport floor is
    strictly positive), so the division is safe."""
    p = pr_t["rank"].combine_chunks().cast(pa.float64())
    r = tr_t["rank"].combine_chunks().cast(pa.float64())
    return pa.table({"vid": pr_t["vid"].combine_chunks(), "pr": p, "tr": r,
                     "spam_mass": pc.divide(pc.subtract(p, r), p)})


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
    import ray
    import ray.data
    from .engine import ShardedGraph, pagerank

    zip_mass = ray.remote(_zip_mass_fn)

    g = ShardedGraph.build(edges_ds, num_owners=num_owners)
    try:
        if g.n == 0:
            return ray.data.from_arrow(_SCHEMA.empty_table())
        pagerank(g, alpha=alpha, tol=0.0, max_iter=sweeps)
        # snapshot pr per owner (get+put) before the second solve
        # overwrites owner state — both solves run on ONE mesh, so the
        # two rank tables are slot-aligned and zip without a join
        pr_refs = [ray.put(t) for t in ray.get(
            [ow.ranks_table.remote() for ow in g.owners])]
        if seeds is None:
            seeds = np.arange(0, g.n, 10, dtype=np.int64)
        w = np.full(len(seeds), 1.0 / len(seeds))
        pagerank(g, alpha=alpha, tol=0.0, max_iter=sweeps,
                 personalization=(seeds, w))
        refs = [zip_mass.remote(pr_refs[j], ow.ranks_table.remote())
                for j, ow in enumerate(g.owners)]
        out = ray.data.from_arrow_refs(refs).materialize()
    finally:
        g.shutdown()
    return out
