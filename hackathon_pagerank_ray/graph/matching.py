"""Deterministic maximal matching (and 2-approx vertex cover) over the
undirected edge table.

Luby-style local-min rounds on EDGES with static priorities: each round,
an active edge whose priority is the minimum at BOTH of its endpoints
joins the matching; its endpoints (and their incident edges) deactivate.
With static priorities this equals the GREEDY sequential matching for the
priority order (same Blelloch/Fineman/Shun local-min argument as
graph/mis.py), so the result is unique and SQL-replayable.

Edge priorities are fixed-width hex strings
``md5prefix8('{seed}:u:v') || %08x(u) || %08x(v)`` — the md5 prefix is
the repo's key rule (stages/sampling), the (u, v) suffix makes the key
unique, and fixed-width lowercase hex compares lexicographically ==
numerically in BOTH engines (the same argument hash_sample relies on).
Requires ``0 <= vid < 2**32`` (enforced) for the %08x width.

The matched endpoint set is the classic 2-approximate minimum vertex
cover (every edge has a matched endpoint; any cover needs ≥ |M|
vertices).

Scale shape: per round, one ``groupby(vertex).min`` over the active edge
table's endpoint explode, two hash joins keyed on vertex to test the
local-min condition, and two anti joins to drop edges incident to newly
matched vertices; the active edge table shrinks monotonically.  A
single-task greedy small path (sort by priority, scan) runs below a
vertex threshold — identical output by the equivalence above.

Reference scope note: the reference engine has no matching surface
(SURVEY.md §2 addenda — graph-analytics extension).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.sampling import _bucket32


def _edge_pkeys(us: np.ndarray, vs: np.ndarray, seed) -> np.ndarray:
    """24-hex-char priority per canonical edge — SQL-twin-exact."""
    u = np.asarray(us, dtype=np.int64)
    v = np.asarray(vs, dtype=np.int64)
    if len(u) and (min(u.min(), v.min()) < 0
                   or max(u.max(), v.max()) >= (1 << 32)):
        raise ValueError("maximal_matching: vid must be in [0, 2**32) "
                         "for the fixed-width priority key")
    keys = np.char.add(np.char.add(u.astype("U10"), ":"),
                       v.astype("U10"))
    h = _bucket32(seed, keys)
    return np.array([f"{int(a):08x}{int(b):08x}{int(c):08x}"
                     for a, b, c in zip(h, u, v)], dtype=object)


def maximal_matching(edges_ds, seed=9, max_rounds: int = 64,
                     num_partitions: int = 8,
                     small_threshold: int = 2_000_000):
    """(u, v) rows of a maximal matching of the undirected simple graph
    (self-loops dropped), u < v.  Raises past ``max_rounds`` (keep equal
    to the SQL twin's unroll depth).

    Returns ``(dataset, info)``, ``info = {"rounds": r, "path": p}``.
    """
    import ray
    import ray.data  # noqa: F401

    from ..stages.relational import anti_join, distinct
    from ..stages.schema_util import drop_empty_blocks

    def _canon(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"u": pa.array(np.minimum(s, d), pa.int64()),
                         "v": pa.array(np.maximum(s, d), pa.int64())})

    und = distinct(edges_ds.map_batches(_canon, batch_format="pyarrow"),
                   ["u", "v"], num_partitions).materialize()

    pair_schema = pa.schema([("u", pa.int64()), ("v", pa.int64())])
    if und.count() == 0:
        return ray.data.from_arrow(pair_schema.empty_table()), \
            {"rounds": 0, "path": "empty"}

    # cheap vertex-count bound: 2·|edges| upper-bounds |verts|; exact
    # count only matters near the threshold, where the bound is safe
    n_bound = 2 * und.count()

    if n_bound <= small_threshold:
        @ray.remote
        def _greedy(*blocks):
            us = np.concatenate([
                b["u"].combine_chunks().to_numpy(zero_copy_only=False)
                for b in blocks])
            vs = np.concatenate([
                b["v"].combine_chunks().to_numpy(zero_copy_only=False)
                for b in blocks])
            order = np.argsort(_edge_pkeys(us, vs, seed), kind="stable")
            taken: set[int] = set()
            ou, ov = [], []
            for i in order:
                a, b = int(us[i]), int(vs[i])
                if a in taken or b in taken:
                    continue
                taken.add(a)
                taken.add(b)
                ou.append(a)
                ov.append(b)
            return pa.table({"u": pa.array(ou, pa.int64()),
                             "v": pa.array(ov, pa.int64())})

        out = ray.data.from_arrow_refs(
            [_greedy.remote(*und.to_arrow_refs())])
        return out, {"rounds": 0, "path": "greedy-task"}

    def _with_p(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks().to_numpy(zero_copy_only=False)
        v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table({"u": pa.array(u, pa.int64()),
                         "v": pa.array(v, pa.int64()),
                         "p": pa.array(_edge_pkeys(u, v, seed),
                                       pa.string())})

    act = drop_empty_blocks(
        und.map_batches(_with_p, batch_format="pyarrow"))
    matched_parts = []
    rounds = 0
    while act.count() > 0:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"maximal_matching: no fixpoint in {max_rounds} rounds — "
                "raise max_rounds (and the SQL twin's unroll)")

        def _ends(t: pa.Table) -> pa.Table:
            return pa.table({
                "vtx": pa.concat_arrays([t["u"].combine_chunks(),
                                         t["v"].combine_chunks()]),
                "p": pa.concat_arrays([t["p"].combine_chunks()] * 2)})

        vmin = drop_empty_blocks(
            act.map_batches(_ends, batch_format="pyarrow")
            .groupby("vtx").min("p")
            .map_batches(lambda t: pa.table(
                {"vtx": t["vtx"], "mp": t["min(p)"]}),
                batch_format="pyarrow"))

        from ..stages.relational import inner_join
        ju = inner_join(act, vmin, on="u", right_on="vtx",
                        num_partitions=num_partitions)

        def _keep_u(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            t = t.filter(pc.equal(t["p"], t["mp"]))
            return t.select(["u", "v", "p"])

        ju = drop_empty_blocks(
            ju.map_batches(_keep_u, batch_format="pyarrow"))
        if ju.count() == 0:
            # cannot happen: the globally minimal active edge always
            # wins both endpoints; guard for safety
            raise RuntimeError("maximal_matching: no local-min edge")
        jv = inner_join(ju, vmin, on="v", right_on="vtx",
                        num_partitions=num_partitions)

        def _keep_v(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc
            t = t.filter(pc.equal(t["p"], t["mp"]))
            return t.select(["u", "v"])

        mm = drop_empty_blocks(
            jv.map_batches(_keep_v, batch_format="pyarrow")).materialize()
        matched_parts.append(mm)

        mv = drop_empty_blocks(distinct(mm.map_batches(
            lambda t: pa.table({"vtx": pa.concat_arrays(
                [t["u"].combine_chunks(), t["v"].combine_chunks()])}),
            batch_format="pyarrow"), ["vtx"], num_partitions))

        act = drop_empty_blocks(anti_join(
            act, mv, on="u", right_on="vtx",
            num_partitions=num_partitions))
        if act.count() == 0:
            break
        act = drop_empty_blocks(anti_join(
            act, mv, on="v", right_on="vtx",
            num_partitions=num_partitions))

    out = matched_parts[0]
    for p in matched_parts[1:]:
        out = out.union(p)
    return out, {"rounds": rounds, "path": "distributed"}
