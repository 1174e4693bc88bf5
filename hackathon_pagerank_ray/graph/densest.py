"""Densest-subgraph 2(1+ε)-approximation by parallel peeling.

Bahmani, Kumar & Vassilvitskii (VLDB'12): repeatedly delete every vertex
whose degree is ≤ 2(1+ε)·(m/n) — the average-degree bar — and keep the
round whose subgraph had the highest density m/n.  The removal test is
the exact integer cross-multiplication ``deg·eps_den·n ≤
2·(eps_den+eps_num)·m`` (no float boundary), a removal set is never
empty (some vertex is at or below average degree), and rounds are
O(log_{1+ε} n) — 6–8 on the test graphs at ε = 1/10.

Density argmax: both engines compare the SAME float64 ``m/n`` doubles
(ties to the earliest round), so the selected round is identical by
construction; the SQL twin unrolls the rounds and selects the winning
round's vertex set.

Scale shape: each round is one degree count shuffle over the active
edge table's endpoint explode plus two vertex-keyed semi joins; the
edge table shrinks geometrically.  A single-task small path runs the
whole peel below an edge bound.

Reference scope note: the reference has no dense-cluster surface
(SURVEY.md §2 addenda) — densest subgraph is the standard
link-spam/community-core detector on web graphs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def densest_subgraph(edges_ds, eps_num: int = 1, eps_den: int = 10,
                     max_rounds: int = 64, num_partitions: int = 8,
                     small_threshold: int = 2_000_000):
    """(vid) rows of the densest round's vertex set over the undirected
    simple graph (self-loops dropped).  Raises past ``max_rounds``.

    Round budget (ADVICE r3): Bahmani peeling at eps = eps_num/eps_den
    needs at most ``log_{1+eps} n`` rounds in the adversarial worst case
    (~145 at eps=0.1, n=10^6), though real web graphs converge in a
    handful because each round strips far more than the guaranteed
    (eps/(1+eps)) fraction.  The default is 64; the conformance query
    passes ``max_rounds=16`` explicitly IN LOCKSTEP with its 16-round
    SQL-twin unroll (``__ray_entry__._densest_oracle_sql(rounds=16)``)
    — raise both together if a fixture ever needs more.

    Returns ``(dataset, info)``,
    ``info = {"rounds", "best_m", "best_n", "path"}``.
    """
    import ray
    import ray.data  # noqa: F401

    from ..stages.relational import distinct, semi_join
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

    vid_schema = pa.schema([("vid", pa.int64())])
    m0 = und.count()
    if m0 == 0:
        return ray.data.from_arrow(vid_schema.empty_table()), \
            {"rounds": 0, "best_m": 0, "best_n": 0, "path": "empty"}

    bar_num = 2 * (eps_den + eps_num)      # deg·eps_den·n ≤ bar_num·m

    if 2 * m0 <= small_threshold:
        @ray.remote
        def _peel(*blocks):
            u = np.concatenate([
                b["u"].combine_chunks().to_numpy(zero_copy_only=False)
                for b in blocks])
            v = np.concatenate([
                b["v"].combine_chunks().to_numpy(zero_copy_only=False)
                for b in blocks])
            best = (-1.0, None, 0, 0, 0)   # (density, verts, m, n, r)
            r = 0
            while len(u):
                r += 1
                if r > max_rounds:
                    raise RuntimeError(
                        f"densest_subgraph: > {max_rounds} rounds — "
                        "raise max_rounds (and the SQL twin's unroll)")
                verts, cnt = np.unique(np.concatenate([u, v]),
                                       return_counts=True)
                m, n = len(u), len(verts)
                dens = m / n               # float64, same as SQL's CAST
                if dens > best[0]:
                    best = (dens, verts.copy(), m, n, r)
                if int(cnt.max()) * eps_den * n >= (1 << 63):
                    raise OverflowError(
                        "densest_subgraph: deg·eps_den·n exceeds int64 "
                        "— the exact threshold test needs int128 here")
                keepv = verts[cnt * eps_den * n > bar_num * m]
                ku = np.isin(u, keepv)
                kv = np.isin(v, keepv)
                mask = ku & kv
                u, v = u[mask], v[mask]
            return (pa.table({"vid": pa.array(best[1], pa.int64())}),
                    best[2], best[3], best[4])

        tbl, bm, bn, rounds = ray.get(_peel.remote(*und.to_arrow_refs()))
        return ray.data.from_arrow(tbl), {
            "rounds": rounds, "best_m": bm, "best_n": bn,
            "path": "peel-task"}

    act = und
    best = (-1.0, None, 0, 0)              # (density, verts_ds, m, n)
    rounds = 0
    while True:
        m = act.count()
        if m == 0:
            break
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"densest_subgraph: > {max_rounds} rounds — raise "
                "max_rounds (and the SQL twin's unroll)")

        def _ends(t: pa.Table) -> pa.Table:
            return pa.table({"vtx": pa.concat_arrays(
                [t["u"].combine_chunks(), t["v"].combine_chunks()])})

        deg = drop_empty_blocks(
            act.map_batches(_ends, batch_format="pyarrow")
            .groupby("vtx").count()).materialize()
        n = deg.count()
        dens = m / n
        if dens > best[0]:
            verts_ds = deg.map_batches(
                lambda t: pa.table({"vid": t["vtx"]}),
                batch_format="pyarrow").materialize()
            best = (dens, verts_ds, m, n)

        def _keep(t: pa.Table, m=m, n=n) -> pa.Table:
            import pyarrow.compute as pc
            c = t["count()"].combine_chunks().cast(pa.int64())
            if len(c) and int(pc.max(c).as_py()) * eps_den * n >= (1 << 63):
                raise OverflowError(
                    "densest_subgraph: deg·eps_den·n exceeds int64 — "
                    "the exact threshold test needs int128 here")
            ok = pc.greater(pc.multiply(c, pa.scalar(eps_den * n,
                                                     pa.int64())),
                            pa.scalar(bar_num * m, pa.int64()))
            return pa.table({"vtx": t["vtx"].combine_chunks()
                             .filter(ok.combine_chunks()
                                     if isinstance(ok, pa.ChunkedArray)
                                     else ok)})

        keepv = drop_empty_blocks(
            deg.map_batches(_keep, batch_format="pyarrow"))
        if keepv.count() == 0:
            break
        act = drop_empty_blocks(semi_join(
            act, keepv, on="u", right_on="vtx",
            num_partitions=num_partitions))
        if act.count() == 0:
            break
        act = drop_empty_blocks(semi_join(
            act, keepv, on="v", right_on="vtx",
            num_partitions=num_partitions))

    return best[1], {"rounds": rounds, "best_m": best[2],
                     "best_n": best[3], "path": "distributed"}
