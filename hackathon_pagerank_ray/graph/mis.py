"""Deterministic maximal independent set over the undirected edge table.

Luby-style local-min rounds with STATIC per-vertex priorities: each round,
every active vertex whose priority is strictly smaller than every active
neighbor's joins the set; joiners and their neighbors deactivate.  With
static priorities this computes exactly the GREEDY sequential MIS for the
priority order (Blelloch, Fineman & Shun, SPAA'12: the parallel local-min
schedule and the sequential greedy resolve identically), so the result is
unique, deterministic, and SQL-replayable round by round.

Priorities reuse the repo's md5 key rule (``stages/sampling._bucket32``,
the same ``substr(md5('{seed}:{vid}'),1,8)`` a DuckDB oracle computes):
``p(v) = (h32 & 0x7FFFFFFF) << 32 | vid`` — unique per vertex (total
order, no ties), requiring ``0 <= vid < 2**32`` like
``deterministic_shuffle`` (enforced; violation would silently corrupt the
order).  Random priorities give O(log n) rounds w.h.p.

Scale shape: priorities are a PURE FUNCTION of vid, so the sender's
priority is computed per edge batch — no priority join ever happens.
Each round is one ``groupby(receiver).min`` over the still-active edge
table plus semi/anti joins keyed on vid, and the active edge table
shrinks monotonically (on web graphs most vertices settle in the first
two rounds).  Nothing reaches the driver but per-round counts.

Reference scope note: the reference engine has no MIS surface
(SURVEY.md §2 addenda — graph-analytics extension); MIS is the standard
primitive for parallel graph coloring / scheduling passes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..stages.sampling import _bucket32

_P31 = np.int64(0x7FFFFFFF)


def _priorities(vids: np.ndarray, seed) -> np.ndarray:
    """p(v) = (md5-prefix31) << 32 | vid — int64, unique, SQL-twin-exact."""
    v = np.asarray(vids, dtype=np.int64)
    if len(v) and (v.min() < 0 or v.max() >= (1 << 32)):
        raise ValueError("maximal_independent_set: vid must be in "
                         "[0, 2**32) for the packed priority key")
    h = _bucket32(seed, v) & _P31
    return (h << np.int64(32)) | v


def maximal_independent_set(edges_ds, seed=7, max_rounds: int = 64,
                            num_partitions: int = 8,
                            small_threshold: int = 2_000_000):
    """(vid, in_mis) for every vertex of the undirected simple graph on
    the edge table (self-loops dropped).  Raises if the fixpoint needs
    more than ``max_rounds`` rounds (keep equal to the SQL twin's
    unroll depth so the engines cannot silently diverge).

    Adaptive dual (the repo-wide pattern): at ≤ ``small_threshold``
    vertices the whole edge set fits one worker, so a single remote
    task runs the O(n + m) sequential greedy over a CSR — the identical
    result, none of the per-round exchange floor (the greedy/parallel
    equivalence above is exactly what licenses this fast path).  Above
    the threshold, the distributed local-min rounds run.  Set
    ``small_threshold=0`` to force the distributed path.

    Returns ``(dataset, info)`` with ``info = {"rounds": r, "path": p}``.
    """
    import ray
    import ray.data  # noqa: F401

    from ..stages.relational import (anti_join, distinct,
                                     left_join_coalesce, semi_join)
    from ..stages.schema_util import drop_empty_blocks, enforce_schema

    def _canon(t: pa.Table) -> pa.Table:
        s = t["src"].combine_chunks().to_numpy(zero_copy_only=False)
        d = t["dst"].combine_chunks().to_numpy(zero_copy_only=False)
        keep = s != d
        s, d = s[keep], d[keep]
        return pa.table({"u": pa.array(np.minimum(s, d), pa.int64()),
                         "v": pa.array(np.maximum(s, d), pa.int64())})

    und = distinct(edges_ds.map_batches(_canon, batch_format="pyarrow"),
                   ["u", "v"], num_partitions)

    def _both(t: pa.Table) -> pa.Table:
        u = t["u"].combine_chunks()
        v = t["v"].combine_chunks()
        return pa.table({"u": pa.concat_arrays([u, v]),
                         "v": pa.concat_arrays([v, u])})

    # directed both-ways: u = receiver, v = sender
    act_edges = und.map_batches(_both, batch_format="pyarrow").materialize()
    verts = distinct(act_edges.select_columns(["u"]),
                     ["u"], num_partitions).map_batches(
        lambda t: pa.table({"vid": t["u"]}), batch_format="pyarrow") \
        .materialize()

    vid_schema = pa.schema([("vid", pa.int64())])
    n_verts = verts.count()
    if n_verts == 0:                     # no simple edges at all
        return ray.data.from_arrow(pa.schema(
            [("vid", pa.int64()),
             ("in_mis", pa.int64())]).empty_table()), {"rounds": 0,
                                                       "path": "empty"}

    if n_verts <= small_threshold:
        # one worker task, never the driver; result identical by the
        # greedy/parallel equivalence in the module docstring
        @ray.remote
        def _greedy(*blocks):
            us = np.concatenate([
                b["u"].combine_chunks().to_numpy(zero_copy_only=False)
                for b in blocks])
            vs = np.concatenate([
                b["v"].combine_chunks().to_numpy(zero_copy_only=False)
                for b in blocks])
            vids = np.unique(np.concatenate([us, vs]))
            ui = np.searchsorted(vids, us)
            vi = np.searchsorted(vids, vs)
            n = len(vids)
            # CSR over both directions, built by one stable argsort
            src_all = np.concatenate([ui, vi])
            dst_all = np.concatenate([vi, ui])
            nbr = dst_all[np.argsort(src_all, kind="stable")]
            off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(np.bincount(src_all, minlength=n), out=off[1:])
            # sequential greedy in priority order (the only scalar loop:
            # O(n + m) total neighbor-blocking work)
            order = np.argsort(_priorities(vids, seed), kind="stable")
            in_mis = np.zeros(n, dtype=bool)
            blocked = np.zeros(n, dtype=bool)
            for i in order:
                if blocked[i]:
                    continue
                in_mis[i] = True
                blocked[nbr[off[i]:off[i + 1]]] = True
            return pa.table({"vid": pa.array(vids, pa.int64()),
                             "in_mis": pa.array(in_mis.astype(np.int64),
                                                pa.int64())})

        und_mat = und.materialize()
        out = ray.data.from_arrow_refs(
            [_greedy.remote(*und_mat.to_arrow_refs())])
        return out, {"rounds": 0, "path": "greedy-task"}

    active = verts
    mis_parts = []
    rounds = 0
    while True:
        if active.count() == 0:
            break
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(
                f"maximal_independent_set: no fixpoint in {max_rounds} "
                "rounds — raise max_rounds (and the SQL twin's unroll)")

        if act_edges.count() == 0:
            # every survivor is isolated: all join, done
            mis_parts.append(active)
            break

        # min active-neighbor priority per receiver; the sender's
        # priority is a pure function of its vid (no join)
        def _with_p(t: pa.Table) -> pa.Table:
            v = t["v"].combine_chunks().to_numpy(zero_copy_only=False)
            return pa.table({"vid": t["u"],
                             "pv": pa.array(_priorities(v, seed),
                                            pa.int64())})

        mn = (act_edges.map_batches(_with_p, batch_format="pyarrow")
              .groupby("vid").min("pv"))
        # groupby/join shuffles emit schema-less empty blocks for empty
        # partitions; strip them before anything feeds another join
        # (see stages/schema_util.drop_empty_blocks)
        mn = drop_empty_blocks(mn.map_batches(
            lambda t: pa.table({"vid": t["vid"], "mn": t["min(pv)"]}),
            batch_format="pyarrow"))

        sent = np.iinfo(np.int64).max
        cand = left_join_coalesce(active, mn, on="vid", fill={"mn": sent},
                                  num_partitions=num_partitions)

        def _join_test(t: pa.Table) -> pa.Table:
            v = t["vid"].combine_chunks().to_numpy(zero_copy_only=False)
            m = t["mn"].combine_chunks().to_numpy(zero_copy_only=False)
            keep = _priorities(v, seed) < m.astype(np.int64)
            return pa.table({"vid": pa.array(v[keep], pa.int64())})

        joiners = drop_empty_blocks(enforce_schema(
            cand.map_batches(_join_test, batch_format="pyarrow"),
            vid_schema))
        mis_parts.append(joiners)

        # neighbors of joiners: receivers of edges whose sender joined
        nbrs = distinct(
            semi_join(act_edges, joiners, on="v", right_on="vid",
                      num_partitions=num_partitions)
            .map_batches(lambda t: pa.table({"vid": t["u"]}),
                         batch_format="pyarrow"),
            ["vid"], num_partitions)

        removed = drop_empty_blocks(joiners.union(nbrs))
        active = drop_empty_blocks(anti_join(
            active, removed, on="vid", num_partitions=num_partitions))
        if active.count() == 0:
            break
        # two semi joins, cleansed between them — the first one's empty
        # partitions would otherwise poison the second's schema broadcast
        act_edges = drop_empty_blocks(semi_join(
            act_edges, active, on="u", right_on="vid",
            num_partitions=num_partitions))
        if act_edges.count() == 0:
            act_edges = ray.data.from_arrow(
                pa.schema([("u", pa.int64()),
                           ("v", pa.int64())]).empty_table())
            continue
        act_edges = drop_empty_blocks(semi_join(
            act_edges, active, on="v", right_on="vid",
            num_partitions=num_partitions))
        if act_edges.count() == 0:
            act_edges = ray.data.from_arrow(
                pa.schema([("u", pa.int64()),
                           ("v", pa.int64())]).empty_table())

    mis = verts.map_batches(                    # empty-graph fallback
        lambda t: pa.table({"vid": pa.array([], pa.int64())}),
        batch_format="pyarrow")
    for p in mis_parts:
        mis = mis.union(p)
    mis = drop_empty_blocks(mis.map_batches(
        lambda t: pa.table({"vid": t["vid"],
                            "one": pa.array([1] * t.num_rows, pa.int64())}),
        batch_format="pyarrow"))

    out = left_join_coalesce(verts, mis, on="vid", fill={"one": 0},
                             num_partitions=num_partitions)
    out = out.map_batches(
        lambda t: pa.table({"vid": t["vid"], "in_mis": t["one"]}),
        batch_format="pyarrow")
    return out, {"rounds": rounds, "path": "distributed"}


def greedy_coloring(edges_ds, seed=7, max_colors: int = 16,
                    max_rounds: int = 64, num_partitions: int = 8,
                    small_threshold: int = 2_000_000):
    """Graph coloring by iterated MIS: color ``c`` is the maximal
    independent set of the residual graph after colors ``0..c-1`` are
    removed (Jones & Plassmann-style, with the same static md5
    priorities every iteration — fully deterministic and round-by-round
    SQL-replayable).  Uses at most Δ+1 colors; each iteration reuses
    :func:`maximal_independent_set` (including its adaptive
    single-task small path), so the scale shape is MIS's.

    Returns ``(dataset, info)``: ``(vid, color)`` int64 rows and
    ``info = {"colors": k}``.  Raises past ``max_colors`` — keep it at
    the SQL twin's unroll depth so the engines cannot silently diverge.
    """
    import ray
    import ray.data  # noqa: F401

    from ..stages.relational import anti_join, semi_join
    from ..stages.schema_util import drop_empty_blocks

    def _mis_only(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table(
            {"vid": t.filter(pc.equal(t["in_mis"], 1))["vid"]})

    # universe = endpoints of the ORIGINAL simple edge set; vertices that
    # become isolated in the residual still need a color (see below)
    from ..stages.relational import distinct

    def _ends(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        s = t["src"].combine_chunks()
        d = t["dst"].combine_chunks()
        mask = pc.not_equal(s, d)
        return pa.table({"vid": pa.concat_arrays(
            [s.filter(mask), d.filter(mask)])})

    universe = distinct(
        edges_ds.map_batches(_ends, batch_format="pyarrow"),
        ["vid"], num_partitions).materialize()
    if universe.count() == 0:
        return ray.data.from_arrow(pa.schema(
            [("vid", pa.int64()),
             ("color", pa.int64())]).empty_table()), {"colors": 0}

    def _no_self(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return t.filter(pc.not_equal(t["src"], t["dst"]))

    # self-loops can never be removed by coloring their (never-colored)
    # vertex — strip them once so the residual drains to empty
    residual = drop_empty_blocks(
        edges_ds.map_batches(_no_self, batch_format="pyarrow"))

    if universe.count() <= small_threshold:
        # whole-coloring small path: one worker task runs the iterated
        # greedy (== iterated parallel MIS) over a CSR — no per-color
        # exchange floor.  Same justification as MIS's small path.
        @ray.remote
        def _color_task(*blocks):
            us = np.concatenate([
                b["src"].combine_chunks().to_numpy(zero_copy_only=False)
                for b in blocks])
            vs = np.concatenate([
                b["dst"].combine_chunks().to_numpy(zero_copy_only=False)
                for b in blocks])
            vids = np.unique(np.concatenate([us, vs]))
            ui = np.searchsorted(vids, us)
            vi = np.searchsorted(vids, vs)
            n = len(vids)
            src_all = np.concatenate([ui, vi])
            dst_all = np.concatenate([vi, ui])
            nbr = dst_all[np.argsort(src_all, kind="stable")]
            off = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(np.bincount(src_all, minlength=n), out=off[1:])
            order = np.argsort(_priorities(vids, seed), kind="stable")
            color = np.full(n, -1, dtype=np.int64)
            c = 0
            remaining = n
            while remaining:
                if c >= max_colors:
                    raise RuntimeError(
                        f"greedy_coloring: more than {max_colors} colors"
                        " — raise max_colors (and the SQL twin's unroll)")
                blocked = np.zeros(n, dtype=bool)
                for i in order:
                    if color[i] >= 0 or blocked[i]:
                        continue
                    color[i] = c
                    remaining -= 1
                    # block only still-uncolored neighbors this round
                    nb = nbr[off[i]:off[i + 1]]
                    blocked[nb[color[nb] < 0]] = True
                c += 1
            return pa.table({"vid": pa.array(vids, pa.int64()),
                             "color": pa.array(color, pa.int64())})

        res_mat = residual.materialize()
        if res_mat.count() == 0:
            # simple-edge-free graph was handled by the universe guard;
            # here universe > 0 means every edge was a self-loop dup —
            # cannot happen (universe excludes self-loop-only vertices)
            out = universe.map_batches(
                lambda t: pa.table(
                    {"vid": t["vid"],
                     "color": pa.array([0] * t.num_rows, pa.int64())}),
                batch_format="pyarrow")
            return out, {"colors": 1}
        out = ray.data.from_arrow_refs(
            [_color_task.remote(*res_mat.to_arrow_refs())])
        out = out.materialize()
        k = 0
        for ref in out.to_arrow_refs():
            t = ray.get(ref)
            if t.num_rows:
                import pyarrow.compute as pc
                k = max(k, int(pc.max(t["color"]).as_py()) + 1)
        return out, {"colors": k}

    uncolored = universe
    parts = []
    colors = 0
    while uncolored.count() > 0:
        if colors >= max_colors:
            raise RuntimeError(
                f"greedy_coloring: more than {max_colors} colors — raise "
                "max_colors (and the SQL twin's unroll)")

        if residual.count() == 0:
            # no edges left among uncolored vertices: all of them are
            # pairwise non-adjacent, so one final color covers them
            mis = uncolored
        else:
            out, _info = maximal_independent_set(
                residual, seed=seed, max_rounds=max_rounds,
                num_partitions=num_partitions,
                small_threshold=small_threshold)
            mis = drop_empty_blocks(out.materialize().map_batches(
                _mis_only, batch_format="pyarrow"))
            # uncolored vertices ISOLATED in the residual have no active
            # neighbor, so they join this iteration's MIS too
            ends = drop_empty_blocks(distinct(residual.map_batches(
                _ends, batch_format="pyarrow"), ["vid"], num_partitions))
            isolated = drop_empty_blocks(anti_join(
                uncolored, ends, on="vid",
                num_partitions=num_partitions))
            if isolated.count() > 0:
                mis = mis.union(isolated)

        part = mis.map_batches(
            lambda t, c=colors: pa.table(
                {"vid": t["vid"],
                 "color": pa.array([c] * t.num_rows, pa.int64())}),
            batch_format="pyarrow").materialize()
        parts.append(part)
        colors += 1

        uncolored = drop_empty_blocks(anti_join(
            uncolored, part, on="vid", num_partitions=num_partitions))
        if uncolored.count() == 0:
            break
        # residual = edges among uncolored vertices; colored vertices
        # leave with their incident edges, so this shrinks monotonically
        residual = drop_empty_blocks(anti_join(
            residual, part, on="src", right_on="vid",
            num_partitions=num_partitions))
        if residual.count() > 0:
            residual = drop_empty_blocks(anti_join(
                residual, part, on="dst", right_on="vid",
                num_partitions=num_partitions))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out, {"colors": colors}
