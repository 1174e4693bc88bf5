"""Driver-side orchestration of the sharded iterative graph engine.

``ShardedGraph.build`` turns an edge ``ray.data.Dataset`` (``src``/``dst``
int64) into P ``RankOwner`` + E ``EdgeShard`` actors (see
:mod:`hackathon_pagerank_ray.graph.shards` for the physical plan), then
:func:`pagerank`, :func:`connected_components` and :func:`label_propagation`
run per-sweep gather → local-combine → hash(dst)-keyed reduce rounds over
those actors with cheap scalar barriers, exactly the shape the reference's
per-iteration device→host reductions take on one GPU
(backend/cuda/pagerank_gpu.cu:277-313).

Every sweep can checkpoint vertex state + a manifest with per-partition
lineage/metrics; ``resume=True`` restarts from the last complete sweep
(north_rule: resumable mid-iteration — an incomplete sweep directory has no
manifest and is discarded).
"""

from __future__ import annotations

import math
import time

import numpy as np
import pyarrow as pa
import ray

from ..state.checkpoint import (latest_sweep, read_manifest, sweep_dir,
                                write_sweep_manifest)
from .shards import EdgeShard, RankOwner


def _expand_parquet_paths(paths) -> list[str]:
    """A directory / file path or list of them → flat sorted file list."""
    import os
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            out.extend(os.path.join(p, f) for f in sorted(os.listdir(p))
                       if f.endswith(".parquet"))
        else:
            out.append(p)
    if not out:
        raise ValueError(f"no parquet files under {paths!r}")
    return out


def _wire_mesh(owners, shards, n: int) -> None:
    """Phase 2 of a mesh (re)build: gather-side addressing + owner wiring
    (subscriptions, scatter maps, out-degrees) — shared by
    ``ShardedGraph.build`` and ``ShardedGraph.apply_edge_delta``
    (``RankOwner.configure`` resets the degree vectors, so rewiring after
    a delta rebuilds them from the patched shards)."""
    num_owners = len(owners)
    gather_pending = [sh.build_gather.remote(n) for sh in shards]
    ray.get([ow.configure.remote(n) for ow in owners])
    ray.get(gather_pending)
    pending = []
    for e, sh in enumerate(shards):
        if num_owners > 1:
            payloads = sh.build_owner_payloads.options(
                num_returns=num_owners).remote()
        else:
            payloads = [sh.build_owner_payloads.remote()]
        for j, ow in enumerate(owners):
            pending.append(ow.register_shard.remote(e, payloads[j]))
    ray.get(pending)
    ray.get([ow.finalize_build.remote() for ow in owners])
    # raw src/dst are build-time only — sweeps run on the composed
    # indexes; freeing them cuts resident memory by ~16 bytes/edge
    for sh in shards:
        sh.release_raw_edges.remote()


class ShardedGraph:
    def __init__(self, owners, edge_shards, n: int, m: int, num_owners: int,
                 gather_mode: str = "full"):
        self.owners = owners
        self.edge_shards = edge_shards
        self.n = n
        self.m = m
        self.P = num_owners
        self.E = len(edge_shards)
        self.gather_mode = gather_mode

    @classmethod
    def build(cls, edges_ds, n: int | None = None, num_owners: int = 8,
              num_edge_shards: int | None = None, undirected: bool = False,
              sort_by_src: bool = False, gather_mode: str = "auto",
              actor_num_cpus: float = 0, weight_col: str | None = None,
              canonical_scatter: bool = False):
        """Build the actor mesh from an edge Dataset.

        ``sort_by_src`` (opt-in) range-partitions edges by source before
        chunking — this shrinks each shard's gather subscription from ~n
        to ~n/E (measured 11× less per-sweep exchange + a 1.6× faster
        kernel at 160M edges, BASELINE.md "Weak scaling v3").  It costs a
        full Dataset sort, so the PREFERRED way to get the locality is to
        hand ``build`` a parquet path whose files are already src-range
        partitioned (``testgen.write_edges_parquet(sort_by_src=True)``,
        or any upstream edge writer keyed on the engine's single
        partitioning key) — the fragment→shard mapping then preserves the
        ranges for free; the in-build sort is the fallback when the input
        layout is out of your control.  ``n`` defaults to the reference
        convention ``max_id + 1`` (backend/cuda/pagerank_gpu.cu:65).

        ``gather_mode``: ``"full"`` ships each owner's whole value vector
        once per sweep (one plasma object, zero-copy shared by all shards on
        a node — the single-node fast path); ``"subscribe"`` ships only each
        shard's subscribed slice (minimal bytes — the multi-node path, where
        a full-vector gather would move O(shards x n) doubles over the
        network every sweep).  ``"auto"`` (default) picks ``"full"`` on a
        single-node cluster and ``"subscribe"`` when Ray reports more than
        one alive node.  Results are identical; both are tested.

        ``weight_col``: optional positive per-edge weight column —
        :func:`pagerank` then computes weighted PageRank
        (``contrib = r[src]·w / Σ_out w``); label/k-core ops ignore it.
        """
        if gather_mode == "auto":
            alive = [nd for nd in ray.nodes() if nd.get("Alive")]
            gather_mode = "subscribe" if len(alive) > 1 else "full"
        E = num_edge_shards or num_owners
        # Create the actor mesh FIRST: after a Ray Data execution the raylet
        # throttles new worker-process starts for several seconds, so actor
        # creation must overlap with (not follow) the shuffle.
        # ``actor_num_cpus=1`` makes each shard reserve a core for its
        # lifetime — the honest footprint for scaling measurements (the
        # mesh must then fit the cluster: P + E <= num_cpus); the default 0
        # lets small test sessions oversubscribe freely.
        shard_cls = (EdgeShard.options(num_cpus=actor_num_cpus)
                     if actor_num_cpus else EdgeShard)
        owner_cls = (RankOwner.options(num_cpus=actor_num_cpus)
                     if actor_num_cpus else RankOwner)
        shards = [
            shard_cls.remote(e, num_owners, None, undirected, gather_mode,
                             canonical_scatter)
            for e in range(E)
        ]
        owners = [owner_cls.remote(j, num_owners) for j in range(num_owners)]

        if isinstance(edges_ds, (str, list)):
            # at-scale fast path: parquet path(s) straight to the shards —
            # each shard reads only its own fragments, pruned to src/dst,
            # with no driver-side materialize / plasma copy of the edge
            # table (halves build memory traffic; ~6x faster build than
            # routing the same bytes through Ray Data blocks)
            if sort_by_src:
                raise ValueError("sort_by_src requires a Dataset input")
            refs = _expand_parquet_paths(edges_ds)
            m = None
        else:
            if sort_by_src:
                edges_ds = edges_ds.sort("src").repartition(E)
            edges_ds = edges_ds.materialize()
            m = edges_ds.count()
            refs = edges_ds.to_arrow_refs()
            if len(refs) < E and not sort_by_src:
                # too few natural blocks to feed every shard — one extra
                # split; when blocks >= E we reuse the reader's blocks as-is
                # (the repartition here used to dominate build time, r1)
                edges_ds = edges_ds.repartition(E).materialize()
                refs = edges_ds.to_arrow_refs()
        # round-robin fragments over E shards (blocks stay in object store;
        # paths are read inside the shard)
        per_shard: list[list] = [[] for _ in range(E)]
        for i, r in enumerate(refs):
            per_shard[i % E].append(r)

        max_ids = ray.get([
            sh.set_edges.remote(per_shard[e], undirected, weight_col)
            for e, sh in enumerate(shards)
        ])
        if m is None:
            m = int(sum(ray.get([sh.get_m.remote() for sh in shards])))
        if n is None:
            # reference convention n = max_id + 1 (pagerank_gpu.cu:65)
            n = max(max_ids) + 1
        _wire_mesh(owners, shards, n)
        return cls(owners, shards, n, m, num_owners, gather_mode)

    # -- incremental recrawl ----------------------------------------------
    def apply_edge_delta(self, added=None, removed=None, n: int | None = None):
        """Patch the built mesh with a recrawl delta instead of a cold
        rebuild: drop every (src, dst) row of ``removed``, append the
        rows of ``added`` (``w`` column required on weighted meshes),
        then rebuild each shard's indexes in place and rewire the owners
        (degrees, subscriptions, scatter maps).  Vertex/rank state is
        reset — run :func:`pagerank` (typically with ``warm_start``) /
        the label ops afterwards.

        Contract: the mesh must be built with ``canonical_scatter=True``
        on src-range-partitioned input (each shard's src range disjoint
        and ascending — the engine's ONE persistent partitioning key).
        Delta rows route to shards by those persistent boundaries, and
        because the canonical index build is row-order independent, the
        patched mesh solves **bit-identically** to a cold build of the
        post-delta edge set routed by the same boundaries — while
        skipping the parquet load, actor spawn and full-table shuffle of
        a cold build.  New vertices may grow ``n``; pass ``n`` to pin it
        (e.g. to match a cold-build twin).  Returns ``{"n": ..,
        "m": ..}``.
        """
        E = self.E
        ranges = ray.get([sh.src_range.remote() for sh in self.edge_shards])
        if any(r[0] < 0 for r in ranges):
            raise ValueError("apply_edge_delta: every shard needs edges "
                             "(empty shard has no routable src range)")
        for e in range(E - 1):
            if ranges[e][1] >= ranges[e + 1][0]:
                raise ValueError(
                    "apply_edge_delta requires disjoint ascending per-shard "
                    "src ranges (build from src-range-partitioned input)")
        bounds = np.array([ranges[e][0] for e in range(1, E)],
                          dtype=np.int64)

        @ray.remote
        def _route(block):
            t = block if isinstance(block, pa.Table) else \
                pa.Table.from_pandas(block, preserve_index=False)
            if not t.num_rows:
                outs = [t] * E
                return tuple(outs) if E > 1 else t
            s = np.asarray(t["src"], dtype=np.int64)
            idx = np.searchsorted(bounds, s, side="right")
            outs = [t.filter(pa.array(idx == e)) for e in range(E)]
            return tuple(outs) if E > 1 else outs[0]

        def _split(ds):
            if ds is None:
                return [[] for _ in range(E)]
            refs = ds.materialize().to_arrow_refs()
            if E == 1:
                return [[_route.remote(b) for b in refs]]
            parts = [_route.options(num_returns=E).remote(b) for b in refs]
            return [[p[e] for p in parts] for e in range(E)]

        added_parts = _split(added)
        removed_parts = _split(removed)
        max_ids = ray.get([
            sh.apply_delta.remote(added_parts[e], removed_parts[e])
            for e, sh in enumerate(self.edge_shards)])
        new_n = max(max(max_ids) + 1, self.n)
        if n is not None:
            if n < new_n:
                raise ValueError(f"n={n} below max delta vid {new_n - 1}")
            new_n = n
        _wire_mesh(self.owners, self.edge_shards, new_n)
        self.n = new_n
        self.m = int(sum(ray.get([sh.get_m.remote()
                                  for sh in self.edge_shards])))
        return {"n": self.n, "m": self.m}

    # -- shared sweep plumbing --------------------------------------------
    def _submit_gathers(self):
        """Subscribe-mode slice wave, ``gathers[e][j]``: one
        ``get_values_all`` per owner (``num_returns=E``) instead of E·P
        ``get_values`` calls.  Submitting this right after a sweep's
        update wave queues it behind each owner's update on the actor,
        so slices materialize as owners finish — the same one-wave
        pipelining the full-gather mode gets from ``get_full_values``.
        """
        per_owner = []
        for ow in self.owners:
            refs = ow.get_values_all.options(num_returns=self.E).remote()
            if self.E == 1:
                refs = [refs]
            per_owner.append(refs)
        return [[per_owner[j][e] for j in range(self.P)]
                for e in range(self.E)]

    def _partial_refs(self, method: str, gathers=None):
        """partials[e][j] = edge shard e's partial aggregate for owner j.

        Transfer modes: ``"packed"`` (default with full gather) returns ONE
        plasma object per shard holding all P partial arrays — owners read
        their slice zero-copy from shared memory, cutting per-sweep object
        count from O(E·P) to O(E); ``"split"`` (used with subscribe gather)
        ships per-owner objects — the multi-node bandwidth-minimal layout.
        ``gathers`` lets a pipelined caller pass a pre-submitted slice
        wave (see :meth:`_submit_gathers`).
        """
        if self.gather_mode == "full":
            full = [ow.get_full_values.remote() for ow in self.owners]
            gathers = [full] * self.E
        elif gathers is None:
            gathers = self._submit_gathers()
        packed = self.gather_mode == "full"
        partials = []
        for e, sh in enumerate(self.edge_shards):
            fn = getattr(sh, method)
            if packed or self.P == 1:
                ref = fn.remote(*gathers[e])
                partials.append([ref] * self.P)   # same packed ref for all
            else:
                partials.append(fn.options(num_returns=self.P).remote(*gathers[e]))
        return partials  # partials[e][j]

    def collect_metrics(self) -> list[dict]:
        return ray.get([sh.get_metrics.remote() for sh in self.edge_shards])

    def ranks_dataset(self):
        return ray.data.from_arrow_refs(
            [ow.ranks_table.remote() for ow in self.owners])

    def labels_dataset(self):
        return ray.data.from_arrow_refs(
            [ow.labels_table.remote() for ow in self.owners])

    def shutdown(self):
        for a in self.owners + self.edge_shards:
            ray.kill(a)


def pagerank(graph: ShardedGraph, alpha: float = 0.85, tol: float = 1e-8,
             max_iter: int = 100, checkpoint_dir: str | None = None,
             checkpoint_every: int = 1, resume: bool = False,
             normalize: bool = True, dangling_mode: str = "distribute",
             personalization=None, warm_start=None):
    """Distributed power iteration, reference semantics
    (backend/cuda/pagerank_gpu.cu:137-191): per sweep measure dangling mass
    on the in-vector, ``r' = α·(P·r + dm/n) + (1-α)/n``, L1 stop AFTER the
    sweep, final sum-normalize.  Returns ``(ranks_dataset, info)``.

    ``dangling_mode``: ``"distribute"`` spreads dangling mass uniformly
    (the G1/G2 semantics); ``"teleport"`` discards it — the alternative
    strategy of the reference's browser implementation
    (frontend/app/page.tsx:294-365, G4).

    ``personalization``: optional teleport distribution for personalized
    PageRank — a ``dict[vid, weight]`` or a ``(vids, weights)`` array pair
    (weights are normalized to sum 1).  The update becomes
    ``r' = α·(P·r + dm·w) + (1-α)·w`` with ``r0 = w``: both the random
    jump and (in ``"distribute"`` mode) the dangling mass land on the seed
    distribution instead of uniform 1/n.  Only the seed entries ship to
    the owners (each holds its dense local slice), so a sparse seed set
    costs O(|seeds|) transfer regardless of n.

    ``warm_start``: optional starting rank vector for the recrawl loop —
    a ``(vid, rank)`` Dataset (e.g. the previous snapshot's output) or a
    ``(vids, ranks)`` array pair.  Vertices absent from it start at the
    uniform 1/n; rank rows whose vid no longer exists (the graph shrank —
    pages vanished since the last crawl) are dropped.  The power
    iteration's fixpoint is unique for α < 1, so
    warm-starting changes ONLY the sweep count to tolerance, never the
    converged ranks; a Dataset ships block-by-block through worker-side
    split tasks (no driver collect).  Mutually exclusive with ``resume``
    (checkpoints already carry their own state).
    """
    if dangling_mode not in ("distribute", "teleport"):
        raise ValueError(dangling_mode)
    if warm_start is not None and resume:
        raise ValueError("warm_start and resume are mutually exclusive")
    _install_personalization(graph, personalization)
    if graph.n == 0:
        ray.get([ow.init_ranks.remote() for ow in graph.owners])
        return graph.ranks_dataset(), {
            "sweeps": 0, "sweeps_run": 0, "residual_l1": 0.0,
            "converged": True, "n": 0, "m": 0, "elapsed_sec": 0.0,
            "sweep_times": [], "median_sweep_sec": None,
            "edges_per_sec_per_sweep": None,
            "edges_per_sec_per_sweep_median": None}
    owners = graph.owners
    start_it = 0
    residual = math.inf
    if warm_start is not None:
        _install_warm_start(graph, warm_start)
    elif resume and checkpoint_dir:
        last = latest_sweep(checkpoint_dir)
        if last is not None:
            it, manifest = last
            _validate_resume(graph, manifest, alpha,
                             personalized=personalization is not None)
            ray.get([ow.load_state_part.remote(
                f"{sweep_dir(checkpoint_dir, it)}/ranks", "ranks")
                for ow in owners])
            start_it = it + 1
            residual = manifest["residual_l1"]
            if residual < tol:
                # checkpoints store PRE-normalization ranks: apply the same
                # final normalize as every other exit path so a resumed-
                # converged run returns identically scaled ranks
                if normalize:
                    total = sum(ray.get([ow.rank_sum.remote()
                                         for ow in owners]))
                    if total > 0:
                        ray.get([ow.scale_ranks.remote(1.0 / total)
                                 for ow in owners])
                return graph.ranks_dataset(), {
                    "sweeps": start_it, "residual_l1": residual,
                    "resumed_at": it, "converged": True,
                    "edges_per_sec_per_sweep": None}
        else:
            ray.get([ow.init_ranks.remote() for ow in owners])
    else:
        ray.get([ow.init_ranks.remote() for ow in owners])

    t0 = time.perf_counter()
    sweeps_run = 0
    it = start_it - 1
    dangling_mass = None   # measured by start_pagerank_sweep on sweep 1,
    #                        then returned fused with each update
    full_refs = None       # pipelined value-vector refs (full gather mode)
    sub_gathers = None     # pipelined slice-wave refs (subscribe mode)
    sweep_times = []
    for it in range(start_it, max_iter):
        t_sweep = time.perf_counter()
        if dangling_mass is None:
            dangling_mass = sum(ray.get(
                [ow.start_pagerank_sweep.remote() for ow in owners]))
        dm = 0.0 if dangling_mode == "teleport" else dangling_mass
        if graph.gather_mode == "full":
            if full_refs is None:
                full_refs = [ow.get_full_values.remote() for ow in owners]
            partials = [[sh.pagerank_partials.remote(*full_refs)] * graph.P
                        for sh in graph.edge_shards]
        if graph.gather_mode == "full":
            update_refs = [
                ow.apply_pagerank_update.remote(
                    alpha, dm, *[partials[e][j] for e in range(graph.E)])
                for j, ow in enumerate(owners)
            ]
            # queued behind each owner's update → results are ready the
            # moment the driver schedules the next sweep (hides one wave)
            full_refs = [ow.get_full_values.remote() for ow in owners]
        else:
            partials = graph._partial_refs("pagerank_partials",
                                           gathers=sub_gathers)
            # fused slice emission: the update call itself returns the
            # next sweep's per-shard gather slices (num_returns = 1 + E),
            # so a subscribe sweep runs exactly two task waves — partials
            # and updates — with no separate slice wave to schedule
            raw = [
                ow.apply_pagerank_update.options(
                    num_returns=1 + graph.E).remote(
                    alpha, dm, *[partials[e][j] for e in range(graph.E)],
                    emit_slices=True)
                for j, ow in enumerate(owners)
            ]
            update_refs = [r[0] for r in raw]
            sub_gathers = [[raw[j][1 + e] for j in range(graph.P)]
                           for e in range(graph.E)]
        results = ray.get(update_refs)
        residual = float(sum(d for d, _ in results))
        dangling_mass = float(sum(m for _, m in results))
        sweep_times.append(time.perf_counter() - t_sweep)
        sweeps_run += 1
        if checkpoint_dir and (it % checkpoint_every == 0 or residual < tol):
            _checkpoint(graph, checkpoint_dir, it, "ranks", {
                "residual_l1": residual, "dangling_mass": dangling_mass,
                "alpha": alpha, "tol": tol, "op": "pagerank",
                "personalized": personalization is not None,
                "num_owners": graph.P, "n": graph.n})
        if residual < tol:
            break
    elapsed = time.perf_counter() - t0

    if normalize:
        total = sum(ray.get([ow.rank_sum.remote() for ow in owners]))
        if total > 0:
            ray.get([ow.scale_ranks.remote(1.0 / total) for ow in owners])

    median_sweep = (sorted(sweep_times)[len(sweep_times) // 2]
                    if sweep_times else None)
    info = {
        "sweeps": it + 1,
        "sweeps_run": sweeps_run,
        "residual_l1": residual,
        "converged": residual < tol,
        "n": graph.n,
        "m": graph.m,
        "elapsed_sec": elapsed,
        "sweep_times": [round(t, 4) for t in sweep_times],
        "median_sweep_sec": median_sweep,
        "edges_per_sec_per_sweep":
            graph.m * sweeps_run / elapsed if elapsed > 0 and sweeps_run else None,
        # median-sweep throughput is robust to this host's intermittent
        # page-fault storms — the scaling evidence uses it
        "edges_per_sec_per_sweep_median":
            graph.m / median_sweep if median_sweep else None,
    }
    return graph.ranks_dataset(), info


def _install_warm_start(graph: ShardedGraph, warm_start) -> None:
    """Scatter a previous rank vector onto the owners: init every slot to
    the uniform 1/n (new-since-last-crawl vertices), then overlay the
    given (vid, rank) rows.  A Dataset is split per-owner in worker tasks
    block-by-block — the driver never holds the vector."""
    owners = graph.owners
    P = graph.P
    fill = 1.0 / graph.n if graph.n else 0.0
    ray.get([ow.init_ranks.remote(fill) for ow in owners])

    if isinstance(warm_start, tuple):
        vids, vals = warm_start
        vids = np.asarray(vids, dtype=np.int64)
        vals = np.asarray(vals, dtype=np.float64)
        if len(vids) and vids.min() < 0:
            raise ValueError("warm_start vid < 0")
        # vids >= n are pages that VANISHED since the previous snapshot
        # (the graph shrank) — drop them, that's the recrawl contract
        keep = vids < graph.n
        vids, vals = vids[keep], vals[keep]
        owner_of = vids % P
        ray.get([ow.warm_apply_parts.remote(
            pa.table({"vid": pa.array(vids[owner_of == j], pa.int64()),
                      "rank": pa.array(vals[owner_of == j], pa.float64())}))
            for j, ow in enumerate(owners) if (owner_of == j).any()])
        return

    # Dataset path: split each block by owner in a worker task
    n = graph.n

    @ray.remote
    def _split(block):
        t = block if isinstance(block, pa.Table) else \
            pa.Table.from_pandas(block, preserve_index=False)
        v = (np.asarray(t["vid"], dtype=np.int64) if t.num_rows
             else np.empty(0, dtype=np.int64))
        r = (np.asarray(t["rank"], dtype=np.float64) if t.num_rows
             else np.empty(0, dtype=np.float64))
        if len(v) and v.min() < 0:
            raise ValueError("warm_start vid < 0")
        keep = v < n          # vanished-page vids: drop (see tuple path)
        v, r = v[keep], r[keep]
        owner_of = v % P
        outs = [pa.table({"vid": pa.array(v[owner_of == j], pa.int64()),
                          "rank": pa.array(r[owner_of == j], pa.float64())})
                for j in range(P)]
        # with num_returns=1 Ray would keep a 1-tuple as ONE object and
        # warm_apply_parts would receive a tuple, not a table
        return tuple(outs) if P > 1 else outs[0]

    refs = warm_start.materialize().to_arrow_refs()
    if P == 1:
        splits = [_split.remote(b) for b in refs]
        ray.get(owners[0].warm_apply_parts.remote(*splits))
    else:
        splits = [_split.options(num_returns=P).remote(b) for b in refs]
        ray.get([ow.warm_apply_parts.remote(*[s[j] for s in splits])
                 for j, ow in enumerate(owners)])


def _install_personalization(graph: ShardedGraph, personalization) -> None:
    """Ship a sparse teleport distribution to the owners (or clear it)."""
    owners = graph.owners
    if personalization is None:
        ray.get([ow.set_personalization.remote(None, None) for ow in owners])
        return
    if isinstance(personalization, dict):
        vids = np.fromiter(personalization.keys(), dtype=np.int64)
        w = np.fromiter(personalization.values(), dtype=np.float64)
    else:
        vids, w = personalization
        vids = np.asarray(vids, dtype=np.int64)
        w = np.asarray(w, dtype=np.float64)
    if len(vids) == 0 or w.sum() <= 0:
        raise ValueError("personalization needs at least one positive weight")
    if vids.min() < 0 or (graph.n and vids.max() >= graph.n):
        raise ValueError("personalization vid outside [0, n)")
    w = w / w.sum()
    owner_of = vids % graph.P
    ray.get([
        ow.set_personalization.remote(vids[owner_of == j], w[owner_of == j])
        for j, ow in enumerate(owners)
    ])


def hits(edges_ds, num_owners: int = 8, max_iter: int = 20,
         num_edge_shards: int | None = None):
    """HITS hubs & authorities (Kleinberg) on the sharded engine.

    Two actor meshes share the same ``vid % P`` partition map: the forward
    graph computes the authority half-sweep ``a = A^T h`` (partial sums
    keyed by dst — exactly the PageRank gather-scatter shape, with the
    owner-side 1/outdeg weighting replaced by raw values), the reversed
    graph computes the hub half-sweep ``h = A a``.  Between half-sweeps an
    owner ships its n/P-slot state vector to its same-index peer (plasma
    object, zero-copy on-node); each half-sweep L2-normalizes via one
    scalar barrier — the same per-sweep cost structure as :func:`pagerank`.

    Fixed ``max_iter`` sweeps (deterministic — the conformance oracle
    unrolls the same count).  Returns ``(scores_dataset, info)`` where the
    dataset has columns ``(vid, auth, hub)``.
    """
    import pyarrow as pa
    import ray.data  # noqa: F401  (ensure the submodule is loaded)

    edges_ds = edges_ds.materialize()
    rev = edges_ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["dst"].combine_chunks(), t["src"].combine_chunks()],
            names=["src", "dst"]),
        batch_format="pyarrow")
    g_fwd = ShardedGraph.build(edges_ds, num_owners=num_owners,
                               num_edge_shards=num_edge_shards)
    g_rev = ShardedGraph.build(rev, n=g_fwd.n, num_owners=num_owners,
                               num_edge_shards=num_edge_shards)
    try:
        n = g_fwd.n
        if n == 0:
            empty = ray.data.from_arrow(pa.table(
                {"vid": pa.array([], pa.int64()),
                 "auth": pa.array([], pa.float64()),
                 "hub": pa.array([], pa.float64())}))
            return empty, {"sweeps": 0, "n": 0, "m": 0}
        t0 = time.perf_counter()
        # h0 = the L2-normalized constant vector
        ray.get([ow.init_ranks.remote(1.0 / math.sqrt(n))
                 for ow in g_rev.owners])

        def _half_sweep(src_graph, dst_graph):
            """values from src_graph's owners → dst_graph's plain-sum
            reduce → L2 normalize; scores land in dst_graph.owners[].r."""
            vals = [ow.ranks_array.remote() for ow in src_graph.owners]
            ray.get([ow.set_sweep_values.remote(vals[j])
                     for j, ow in enumerate(dst_graph.owners)])
            partials = dst_graph._partial_refs("pagerank_partials")
            ssq = ray.get([
                ow.apply_sum_update.remote(
                    *[partials[e][j] for e in range(dst_graph.E)])
                for j, ow in enumerate(dst_graph.owners)
            ])
            norm = math.sqrt(sum(ssq))
            if norm > 0:
                ray.get([ow.scale_ranks.remote(1.0 / norm)
                         for ow in dst_graph.owners])

        for _ in range(max_iter):
            _half_sweep(g_rev, g_fwd)   # auth: gather hub values over A^T
            _half_sweep(g_fwd, g_rev)   # hub: gather auth values over A
        elapsed = time.perf_counter() - t0

        # zip the two meshes' owner tables per partition (same vid order)
        def _zip_tables(auth_t, hub_t):
            return pa.Table.from_arrays(
                [auth_t["vid"].combine_chunks(),
                 auth_t["rank"].combine_chunks(),
                 hub_t["rank"].combine_chunks()],
                names=["vid", "auth", "hub"])
        zip_remote = ray.remote(_zip_tables)
        refs = [
            zip_remote.remote(fo.ranks_table.remote(), ro.ranks_table.remote())
            for fo, ro in zip(g_fwd.owners, g_rev.owners)
        ]
        out = ray.data.from_arrow_refs(refs).materialize()
        return out, {"sweeps": max_iter, "n": n, "m": g_fwd.m,
                     "elapsed_sec": elapsed}
    finally:
        g_fwd.shutdown()
        g_rev.shutdown()


def salsa(edges_ds, num_owners: int = 8, max_iter: int = 20,
          num_edge_shards: int | None = None):
    """SALSA (Lempel & Moran, "The stochastic approach for link-structure
    analysis", WWW9 2000): authority and hub scores as the stationary
    distributions of the two-step bipartite random walks

        a' = A_cᵀ (A_r a)        (authority chain)
        h' = A_r (A_cᵀ h)        (hub chain)

    with ``A_r`` / ``A_c`` the row- / column-L1-normalized adjacency over
    the DISTINCT directed edge set.  Fixed ``max_iter`` power sweeps from
    the uniform vector, L1-renormalized per sweep (mass reaching a
    zero-out-degree / zero-in-degree endpoint leaks and the renormalize
    compensates — standard power-iteration SALSA).

    Mesh shape: the two HITS meshes (forward + reversed, shared vid % P
    partition map) and the same plain-sum half-sweep; the only addition
    is the owner-side pre-scale by the OTHER mesh's degree slice
    (``scaled_ranks_array``), shipped once per half-sweep as an
    O(n/P)-sized plasma object — identical per-sweep exchange volume to
    :func:`hits`.  Returns ``(dataset, info)`` with columns
    ``(vid, salsa_auth, salsa_hub)``.
    """
    import pyarrow as pa
    import ray.data  # noqa: F401  (ensure the submodule is loaded)
    from ..stages.relational import distinct

    edges_ds = distinct(edges_ds, ["src", "dst"],
                        num_partitions=num_owners * 2).materialize()
    rev = edges_ds.map_batches(
        lambda t: pa.Table.from_arrays(
            [t["dst"].combine_chunks(), t["src"].combine_chunks()],
            names=["src", "dst"]),
        batch_format="pyarrow")
    g_fwd = ShardedGraph.build(edges_ds, num_owners=num_owners,
                               num_edge_shards=num_edge_shards)
    g_rev = ShardedGraph.build(rev, n=g_fwd.n, num_owners=num_owners,
                               num_edge_shards=num_edge_shards)
    try:
        n = g_fwd.n
        if n == 0:
            empty = ray.data.from_arrow(pa.table(
                {"vid": pa.array([], pa.int64()),
                 "salsa_auth": pa.array([], pa.float64()),
                 "salsa_hub": pa.array([], pa.float64())}))
            return empty, {"sweeps": 0, "n": 0, "m": 0}
        t0 = time.perf_counter()
        # degree slices, fetched once: outdeg of the forward mesh is the
        # out-degree, outdeg of the reversed mesh is the in-degree —
        # same vid % P slots on both sides
        fwd_deg = [ow.outdeg_array.remote() for ow in g_fwd.owners]
        rev_deg = [ow.outdeg_array.remote() for ow in g_rev.owners]

        def _half(src_graph, dst_graph, deg_refs):
            """Ship src owners' r/deg into dst mesh, plain-sum reduce
            (scores land in dst_graph.owners[].r, unnormalized)."""
            vals = [ow.scaled_ranks_array.remote(deg_refs[j])
                    for j, ow in enumerate(src_graph.owners)]
            ray.get([ow.set_sweep_values.remote(vals[j])
                     for j, ow in enumerate(dst_graph.owners)])
            partials = dst_graph._partial_refs("pagerank_partials")
            ray.get([ow.apply_sum_update.remote(
                *[partials[e][j] for e in range(dst_graph.E)])
                for j, ow in enumerate(dst_graph.owners)])

        def _l1_normalize(graph):
            total = sum(ray.get([ow.rank_sum.remote()
                                 for ow in graph.owners]))
            if total > 0:
                ray.get([ow.scale_ranks.remote(1.0 / total)
                         for ow in graph.owners])

        def _chain(holder, other, holder_deg, other_deg):
            """Run one SALSA chain to ``max_iter`` sweeps: scores live on
            ``holder``; each sweep ships holder's scores scaled by the
            OTHER mesh's degree slice (``other_deg``) into the other
            mesh, then back scaled by ``holder_deg``, then L1
            renormalizes.  ``holder_deg`` / ``other_deg`` are each mesh's
            own outdeg arrays (the reversed mesh's outdeg is the forward
            graph's in-degree)."""
            ray.get([ow.init_ranks.remote(1.0 / n) for ow in holder.owners])
            for _ in range(max_iter):
                _half(holder, other, other_deg)
                _half(other, holder, holder_deg)
                _l1_normalize(holder)
            return [ow.ranks_table.remote() for ow in holder.owners]

        # authority chain: scores on the forward mesh (gathers key on the
        # forward graph's dst), pre-scales by in-degree then out-degree.
        # Snapshot the tables (per-actor ordering already fixes their
        # content before the hub chain re-inits the owners; the get+put
        # also pins them independent of actor lifetime).
        auth_refs = [ray.put(t)
                     for t in ray.get(_chain(g_fwd, g_rev, fwd_deg,
                                             rev_deg))]
        # hub chain: scores on the reversed mesh — the mirror walk
        hub_refs = _chain(g_rev, g_fwd, rev_deg, fwd_deg)

        def _zip_tables(auth_t, hub_t):
            return pa.Table.from_arrays(
                [auth_t["vid"].combine_chunks(),
                 auth_t["rank"].combine_chunks(),
                 hub_t["rank"].combine_chunks()],
                names=["vid", "salsa_auth", "salsa_hub"])
        zip_remote = ray.remote(_zip_tables)
        refs = [zip_remote.remote(a, h)
                for a, h in zip(auth_refs, hub_refs)]
        out = ray.data.from_arrow_refs(refs).materialize()
        return out, {"sweeps": max_iter, "n": n, "m": g_fwd.m,
                     "elapsed_sec": time.perf_counter() - t0}
    finally:
        g_fwd.shutdown()
        g_rev.shutdown()


def eigenvector_centrality(edges_ds, num_owners: int = 8,
                           max_iter: int = 20,
                           num_edge_shards: int | None = None):
    """Eigenvector centrality (Bonacich): power iteration
    ``x' = A^T x / ||A^T x||_2`` — a vertex is central when pointed to by
    central vertices, the undamped ancestor of PageRank.  Exactly the
    HITS authority half-sweep (:func:`hits`) run on ONE mesh against
    itself: plain-sum gather-scatter keyed by dst, one L2 scalar barrier
    per sweep, same per-sweep cost structure as :func:`pagerank`.

    Fixed ``max_iter`` sweeps (deterministic — the conformance oracle
    unrolls the same count; convergence of undamped power iteration is
    graph-dependent, which is why PageRank damps).  Returns
    ``(scores_dataset(vid, score), info)``.
    """
    g = ShardedGraph.build(edges_ds, num_owners=num_owners,
                           num_edge_shards=num_edge_shards)
    try:
        n = g.n
        if n == 0:
            empty = ray.data.from_arrow(pa.table(
                {"vid": pa.array([], pa.int64()),
                 "score": pa.array([], pa.float64())}))
            return empty, {"sweeps": 0, "n": 0, "m": 0}
        t0 = time.perf_counter()
        ray.get([ow.init_ranks.remote(1.0 / math.sqrt(n))
                 for ow in g.owners])
        for _ in range(max_iter):
            # src and dst owner are the SAME actor (unlike hits()'s two
            # meshes), so publishing r as this sweep's values is a local
            # assignment — no object-store round-trip of the vector
            ray.get([ow.start_value_sweep.remote() for ow in g.owners])
            partials = g._partial_refs("pagerank_partials")
            ssq = ray.get([
                ow.apply_sum_update.remote(
                    *[partials[e][j] for e in range(g.E)])
                for j, ow in enumerate(g.owners)
            ])
            norm = math.sqrt(sum(ssq))
            if norm > 0:
                ray.get([ow.scale_ranks.remote(1.0 / norm)
                         for ow in g.owners])
        elapsed = time.perf_counter() - t0
        out = (g.ranks_dataset()
               .rename_columns({"rank": "score"}).materialize())
        return out, {"sweeps": max_iter, "n": n, "m": g.m,
                     "elapsed_sec": elapsed}
    finally:
        g.shutdown()


def _validate_resume(graph: ShardedGraph, manifest: dict, alpha: float,
                     personalized: bool = False):
    """Fail fast when a checkpoint was written by a differently-shaped run —
    ``load_state_part`` loads per-owner part files, so a mesh/n/alpha
    mismatch would silently assign wrong vertex state (ADVICE r1).  The
    ``op`` guard (ADVICE r4) rejects a checkpoint written by a different
    operator — sssp also stores its state under kind "ranks", so without
    it a same-shape sssp checkpoint would silently load distances as
    ranks (and vice versa)."""
    rec_op = manifest.get("op")
    if rec_op is not None and rec_op != "pagerank":
        raise ValueError(
            f"checkpoint/resume mismatch: manifest written by op={rec_op!r}"
            f" but this run is 'pagerank'")
    for key, current in (("num_owners", graph.P), ("n", graph.n),
                         ("alpha", alpha), ("personalized", personalized)):
        recorded = manifest.get(key)
        if recorded is not None and recorded != current:
            raise ValueError(
                f"checkpoint/resume mismatch: manifest {key}={recorded} but "
                f"current run has {key}={current}; rebuild with the "
                f"checkpointing run's configuration or start a fresh run")


def _resume_fixpoint(graph: ShardedGraph, checkpoint_dir: str, kind: str,
                     op: str, extra_checks: tuple = ()):
    """Shared resume loader for the label/distance fixpoints: load the
    newest complete sweep's per-owner state, failing fast on a manifest
    written by a different operator or mesh shape (the same guard
    :func:`_validate_resume` gives PageRank).  Returns ``(next_it,
    manifest)`` or ``None`` when there is nothing to resume from."""
    last = latest_sweep(checkpoint_dir)
    if last is None:
        return None
    it, manifest = last
    rec_op = manifest.get("op")
    if rec_op is not None and rec_op != op:
        raise ValueError(
            f"checkpoint/resume mismatch: manifest written by op={rec_op!r}"
            f" but this run is {op!r}")
    for key, current in (("num_owners", graph.P), ("n", graph.n),
                         *extra_checks):
        recorded = manifest.get(key)
        if recorded is not None and recorded != current:
            raise ValueError(
                f"checkpoint/resume mismatch: manifest {key}={recorded} "
                f"but current run has {key}={current}")
    ray.get([ow.load_state_part.remote(
        f"{sweep_dir(checkpoint_dir, it)}/{kind}", kind)
        for ow in graph.owners])
    return it + 1, manifest


def connected_components(graph: ShardedGraph, max_iter: int = 10_000,
                         checkpoint_dir: str | None = None,
                         checkpoint_every: int = 5, resume: bool = False):
    """Iterative min-label propagation to fixpoint (exact); build the graph
    with ``undirected=True``.  Labels converge to min vid per component.
    ``resume=True`` restarts from the newest complete sweep checkpoint
    (min-label state is monotone, so a resumed run reaches the identical
    fixpoint, and an already-converged checkpoint returns immediately)."""
    owners = graph.owners
    if graph.n == 0:
        ray.get([ow.init_labels.remote() for ow in owners])
        return graph.labels_dataset(), {"sweeps": 0}
    start_it = 0
    if resume and checkpoint_dir:
        loaded = _resume_fixpoint(graph, checkpoint_dir, "labels", "cc")
        if loaded is not None:
            start_it, manifest = loaded
            if manifest.get("changed") == 0:
                return graph.labels_dataset(), {
                    "sweeps": start_it, "resumed_at": start_it - 1,
                    "converged": True}
        else:
            ray.get([ow.init_labels.remote() for ow in owners])
    else:
        ray.get([ow.init_labels.remote() for ow in owners])
    it = start_it - 1
    for it in range(start_it, max_iter):
        ray.get([ow.start_label_sweep.remote() for ow in owners])
        partials = graph._partial_refs("min_label_partials")
        changed = sum(ray.get([
            ow.apply_min_label_update.remote(
                *[partials[e][j] for e in range(graph.E)])
            for j, ow in enumerate(owners)
        ]))
        if checkpoint_dir and (it % checkpoint_every == 0 or changed == 0):
            _checkpoint(graph, checkpoint_dir, it, "labels",
                        {"changed": changed, "op": "cc",
                         "num_owners": graph.P, "n": graph.n})
        if changed == 0:
            break
    return graph.labels_dataset(), {"sweeps": it + 1}


def k_core(graph: ShardedGraph, k: int, max_iter: int = 10_000):
    """k-core membership by iterative peeling to fixpoint: drop every
    vertex with fewer than ``k`` alive neighbors until none changes.
    Build the graph with ``undirected=True`` on the canonical simple edge
    set.  Each round is one plain-sum gather-scatter of the alive mask —
    the same per-sweep cost structure as :func:`pagerank`.

    Returns ``(dataset, info)`` with columns ``(vid, in_core)``
    (int64 0/1)."""
    import pyarrow as pa
    import pyarrow.compute as pc
    owners = graph.owners
    ray.get([ow.init_ranks.remote(1.0) for ow in owners])
    if graph.n == 0:
        return graph.ranks_dataset(), {"sweeps": 0}
    it = -1
    for it in range(max_iter):
        ray.get([ow.start_value_sweep.remote() for ow in owners])
        partials = graph._partial_refs("pagerank_partials")
        changed = sum(ray.get([
            ow.apply_kcore_update.remote(
                k, *[partials[e][j] for e in range(graph.E)])
            for j, ow in enumerate(owners)
        ]))
        if changed == 0:
            break

    def _shape(t: pa.Table) -> pa.Table:
        return pa.Table.from_arrays(
            [t["vid"].combine_chunks(),
             pc.cast(pc.greater(t["rank"], 0.5), pa.int64())],
            names=["vid", "in_core"])

    out = graph.ranks_dataset().map_batches(_shape, batch_format="pyarrow")
    return out, {"sweeps": it + 1}


def strongly_connected_components(edges_ds, num_owners: int = 8,
                                  num_edge_shards: int | None = None,
                                  max_outer: int = 100_000,
                                  meshes=None):
    """Exact SCCs of the directed graph, labels = min vid per component.

    Forward/backward min-label coloring with a settled mask (the
    Orzan-style scheme on the sharded mesh): per outer round, propagate
    min labels to fixpoint along edges (forward mesh) and against them
    (reversed mesh), with settled vertices pinned to the int64-max
    sentinel so nothing flows through them; a vertex whose two fixpoints
    agree on a finite x is mutually reachable with x, and since labels
    are min-vids, x IS its SCC's min vid — settle it.  Each outer round
    settles at least the SCC of the smallest unsettled vid (all alive
    labels are ≥ it, so its fixpoints agree), and in practice most
    rounds settle many components at once.  Outer rounds are bounded by
    the longest vid-decreasing chain in the condensation DAG; web graphs
    settle in a handful.

    Returns ``(dataset, info)`` with columns ``(vid, label)`` — exact,
    matching ``oracle.strongly_connected_components``.

    ``meshes``: optional prebuilt ``(g_fwd, g_rev)`` ShardedGraph pair
    (forward and reversed edge sets, same n) — state is re-initialized
    here, and the CALLER keeps ownership (no shutdown), so a composite
    like the bow-tie decomposition can reuse the meshes for BFS passes
    instead of paying two more builds."""
    import pyarrow as pa
    import ray.data  # noqa: F401  (ensure the submodule is loaded)

    if meshes is not None:
        g_fwd, g_rev = meshes
    else:
        edges_ds = edges_ds.materialize()
        rev = edges_ds.map_batches(
            lambda t: pa.Table.from_arrays(
                [t["dst"].combine_chunks(), t["src"].combine_chunks()],
                names=["src", "dst"]),
            batch_format="pyarrow")
        g_fwd = ShardedGraph.build(edges_ds, num_owners=num_owners,
                                   num_edge_shards=num_edge_shards)
        g_rev = ShardedGraph.build(rev, n=g_fwd.n, num_owners=num_owners,
                                   num_edge_shards=num_edge_shards)
    try:
        n = g_fwd.n
        for g in (g_fwd, g_rev):
            ray.get([ow.init_scc.remote() for ow in g.owners])
        if n == 0:
            empty = ray.data.from_arrow(pa.table(
                {"vid": pa.array([], pa.int64()),
                 "label": pa.array([], pa.int64())}))
            return empty, {"outer_rounds": 0, "n": 0}
        t0 = time.perf_counter()
        settled, outer, inner_total = 0, 0, 0
        while settled < n:
            outer += 1
            if outer > max_outer:
                raise RuntimeError("SCC outer rounds exceeded max_outer")
            for g in (g_fwd, g_rev):
                ray.get([ow.reset_alive_labels.remote() for ow in g.owners])
                while True:   # inner min-label fixpoint (≤ diameter sweeps)
                    inner_total += 1
                    ray.get([ow.start_label_sweep.remote()
                             for ow in g.owners])
                    partials = g._partial_refs("min_label_partials")
                    changed = sum(ray.get([
                        ow.apply_masked_min_update.remote(
                            *[partials[e][j] for e in range(g.E)])
                        for j, ow in enumerate(g.owners)
                    ]))
                    if changed == 0:
                        break
            fwd_labels = [ow.labels_array.remote() for ow in g_fwd.owners]
            rev_labels = [ow.labels_array.remote() for ow in g_rev.owners]
            now = sum(ray.get([
                fo.settle_compare.remote(rev_labels[j])
                for j, fo in enumerate(g_fwd.owners)
            ]))
            ray.get([ro.settle_compare.remote(fwd_labels[j])
                     for j, ro in enumerate(g_rev.owners)])
            assert now > 0, "SCC coloring made no progress"
            settled += now
        out = ray.data.from_arrow_refs(
            [ow.scc_table.remote() for ow in g_fwd.owners]).materialize()
        return out, {"outer_rounds": outer, "inner_sweeps": inner_total,
                     "n": n, "m": g_fwd.m,
                     "elapsed_sec": time.perf_counter() - t0}
    finally:
        if meshes is None:
            g_fwd.shutdown()
            g_rev.shutdown()


def bfs_distances(graph: ShardedGraph, source: int, max_iter: int = 10_000):
    """Single-source BFS hop distances over the directed edge set by
    min-plus propagation to fixpoint (each round relaxes
    ``d(v) = min(d(v), min over in-neighbors d(u) + 1)`` — the same
    gather-scatter/min-reduce skeleton as connected components; rounds =
    eccentricity of the source).  Unreached vertices get distance -1.

    Returns ``(dataset, info)`` with columns ``(vid, dist)``."""
    import pyarrow as pa
    import pyarrow.compute as pc
    if not (0 <= source < max(graph.n, 1)):
        raise ValueError(f"source {source} outside [0, n)")
    owners = graph.owners
    ray.get([ow.init_distances.remote(source) for ow in owners])
    if graph.n == 0:
        return graph.labels_dataset(), {"sweeps": 0}
    it = -1
    for it in range(max_iter):
        ray.get([ow.start_label_sweep.remote() for ow in owners])
        partials = graph._partial_refs("min_label_partials")
        changed = sum(ray.get([
            ow.apply_bfs_update.remote(
                *[partials[e][j] for e in range(graph.E)])
            for j, ow in enumerate(owners)
        ]))
        if changed == 0:
            break

    sent = np.iinfo(np.int64).max

    def _shape(t: pa.Table) -> pa.Table:
        lab = t["label"]
        dist = pc.if_else(pc.equal(lab, pa.scalar(sent, pa.int64())),
                          pa.scalar(-1, pa.int64()), lab)
        return pa.Table.from_arrays(
            [t["vid"].combine_chunks(), dist.combine_chunks()],
            names=["vid", "dist"])

    out = graph.labels_dataset().map_batches(_shape, batch_format="pyarrow")
    return out, {"sweeps": it + 1}


def sssp_distances(graph: ShardedGraph, source,
                   max_iter: int = 10_000,
                   checkpoint_dir: str | None = None,
                   checkpoint_every: int = 5, resume: bool = False):
    """Weighted single-source (or multi-source: pass an array — distance
    to the NEAREST seed) shortest paths by distributed Bellman-Ford:
    per round relax ``d(v) = min(d(v), min over in-edges (d(u) + w))``
    over the mesh (rounds ≤ the hop count of the longest shortest path;
    requires non-negative weights — build the mesh with ``weight_col``,
    else every edge costs 1.0 and this degrades to float hop distances).

    Float exactness: every candidate distance is a specific left-fold sum
    of edge weights along one path, reproduced identically by the
    unrolled SQL twin's recursion, so min-fixpoint equality is exact.
    Unreached vertices report -1.0.  Returns ``(dataset, info)`` with
    columns ``(vid, dist)``.

    ``resume=True`` restarts from the newest complete sweep checkpoint
    (min-plus state is monotone — identical fixpoint; the manifest pins
    the source set so a different-source resume fails fast).
    """
    import pyarrow as pa
    srcs = np.atleast_1d(np.asarray(source, dtype=np.int64))
    if len(srcs) == 0 or srcs.min() < 0 or srcs.max() >= max(graph.n, 1):
        raise ValueError(f"source(s) {source} outside [0, n)")
    owners = graph.owners
    if graph.n == 0:
        empty = ray.data.from_arrow(pa.table(
            {"vid": pa.array([], pa.int64()),
             "dist": pa.array([], pa.float64())}))
        return empty, {"sweeps": 0}

    def _out():
        return ray.data.from_arrow_refs(
            [ow.ranks_table.remote() for ow in owners]).map_batches(
            _sssp_shape, batch_format="pyarrow")

    start_it = 0
    if resume and checkpoint_dir:
        loaded = _resume_fixpoint(
            graph, checkpoint_dir, "ranks", "sssp",
            (("sources", srcs.tolist()),))
        if loaded is not None:
            start_it, manifest = loaded
            if manifest.get("changed") == 0:
                return _out(), {"sweeps": start_it,
                                "resumed_at": start_it - 1,
                                "converged": True}
        else:
            ray.get([ow.init_sssp.remote(srcs) for ow in owners])
    else:
        ray.get([ow.init_sssp.remote(srcs) for ow in owners])
    it = start_it - 1
    for it in range(start_it, max_iter):
        ray.get([ow.start_value_sweep.remote() for ow in owners])
        partials = graph._partial_refs("minplus_partials")
        changed = sum(ray.get([
            ow.apply_minplus_update.remote(
                *[partials[e][j] for e in range(graph.E)])
            for j, ow in enumerate(owners)
        ]))
        if checkpoint_dir and (it % checkpoint_every == 0 or changed == 0):
            _checkpoint(graph, checkpoint_dir, it, "ranks",
                        {"changed": changed, "op": "sssp",
                         "num_owners": graph.P, "n": graph.n,
                         "sources": srcs.tolist()})
        if changed == 0:
            break
    return _out(), {"sweeps": it + 1}


def _sssp_shape(t):
    """(vid, rank) owner table → (vid, dist) with inf → -1.0."""
    import pyarrow as pa
    import pyarrow.compute as pc
    d = t["rank"].combine_chunks()
    dist = pc.if_else(pc.equal(d, pa.scalar(float("inf"), pa.float64())),
                      pa.scalar(-1.0, pa.float64()), d)
    return pa.Table.from_arrays(
        [t["vid"].combine_chunks(), dist.combine_chunks()
         if isinstance(dist, pa.ChunkedArray) else dist],
        names=["vid", "dist"])


def label_propagation(graph: ShardedGraph, max_iter: int = 10,
                      checkpoint_dir: str | None = None,
                      checkpoint_every: int = 1, resume: bool = False):
    """Synchronous LP with the deterministic min-label tie-break — the exact
    contract of ``oracle.label_propagation``; build with ``undirected=True``
    on the canonical simple edge set.

    ``resume=True`` continues from the newest complete sweep checkpoint:
    LP is NOT monotone, so exact-parity resume relies on the checkpoint
    carrying the full label state and the manifest carrying the sweep
    index — the resumed run executes exactly the REMAINING sweeps of the
    fixed ``max_iter`` budget, reproducing the uninterrupted labels
    bit-for-bit."""
    owners = graph.owners
    if graph.n == 0:
        ray.get([ow.init_labels.remote() for ow in owners])
        return graph.labels_dataset(), {"sweeps": 0}
    start_it = 0
    if resume and checkpoint_dir:
        # max_iter is a sweep BUDGET, not a shape param, and is
        # deliberately NOT validated against the manifest (ADVICE r4
        # considered it): each LP sweep is a deterministic function of
        # the label state alone — the budget only decides how many
        # sweeps run.  Resuming a killed-at-k checkpoint under budget B
        # executes sweeps k..B-1 on state identical to what an
        # uninterrupted budget-B run holds at sweep k, so parity with
        # the uninterrupted run at the RESUMED budget holds for any B
        # (a too-small B is the already-handled early-return below).
        loaded = _resume_fixpoint(graph, checkpoint_dir, "labels", "lp")
        if loaded is not None:
            start_it, manifest = loaded
            if manifest.get("changed") == 0 or start_it >= max_iter:
                return graph.labels_dataset(), {
                    "sweeps": start_it, "resumed_at": start_it - 1,
                    "converged": manifest.get("changed") == 0}
        else:
            ray.get([ow.init_labels.remote() for ow in owners])
    else:
        ray.get([ow.init_labels.remote() for ow in owners])
    it = start_it - 1
    for it in range(start_it, max_iter):
        ray.get([ow.start_label_sweep.remote() for ow in owners])
        partials = graph._partial_refs("mode_label_partials")
        changed = sum(ray.get([
            ow.apply_mode_label_update.remote(
                *[partials[e][j] for e in range(graph.E)])
            for j, ow in enumerate(owners)
        ]))
        if checkpoint_dir and (it % checkpoint_every == 0 or changed == 0):
            _checkpoint(graph, checkpoint_dir, it, "labels",
                        {"changed": changed, "op": "lp",
                         "num_owners": graph.P, "n": graph.n,
                         "max_iter": max_iter})
        if changed == 0:
            break
    return graph.labels_dataset(), {"sweeps": it + 1}


def _lp_small_fn(max_iter: int, *parts):
    """Whole synchronous-LP fixpoint in ONE vectorized task — the exact
    global restatement of ``RankOwner.apply_mode_label_update``'s merge
    (per-vertex argmax neighbor-label count, min-label tie-break), so
    labels are identical to the mesh plan by construction."""
    import pyarrow as pa
    parts = [p if isinstance(p, pa.Table)
             else pa.Table.from_pandas(p, preserve_index=False)
             for p in parts]
    parts = [p for p in parts if p.num_rows]
    if not parts:
        return pa.table({"vid": pa.array([], pa.int64()),
                         "label": pa.array([], pa.int64())})
    t = pa.concat_tables([p.select(["src", "dst"]) for p in parts])
    src = np.asarray(t["src"], dtype=np.int64)
    dst = np.asarray(t["dst"], dtype=np.int64)
    n = int(max(src.max(initial=-1), dst.max(initial=-1))) + 1
    s = np.concatenate([src, dst])
    d = np.concatenate([dst, src])
    labels = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        lab = labels[s]
        order = np.lexsort((lab, d))
        dd, ll = d[order], lab[order]
        boundary = np.ones(len(dd), dtype=bool)
        boundary[1:] = (dd[1:] != dd[:-1]) | (ll[1:] != ll[:-1])
        group = np.cumsum(boundary) - 1
        cnt = np.bincount(group).astype(np.int64)
        mi, ml = dd[boundary], ll[boundary]
        order2 = np.lexsort((-ml, cnt, mi))
        mi2, ml2 = mi[order2], ml[order2]
        last = np.ones(len(mi2), dtype=bool)
        last[:-1] = mi2[1:] != mi2[:-1]
        new = labels.copy()
        new[mi2[last]] = ml2[last]
        if (new == labels).all():
            break
        labels = new
    return pa.table({"vid": pa.array(np.arange(n, dtype=np.int64)),
                     "label": pa.array(labels)})


def label_propagation_ds(edges_ds, max_iter: int = 10,
                         num_owners: int = 4,
                         small_threshold: int = 2_000_000):
    """Dataset-level LP convenience with the adaptive small path: the
    input must already be the canonical UNDIRECTED simple edge set (as
    ``triangles.canonical_undirected`` emits, renamed to src/dst).  At
    or below ``small_threshold`` rows the whole fixpoint runs as one
    vectorized task (the mesh build + per-sweep task waves dominate at
    small scale); above it the sharded mesh runs.  Labels are identical
    either way (integer argmax/min merge, partitioning-independent)."""
    edges_ds = edges_ds.materialize()
    if edges_ds.count() <= small_threshold:
        small = ray.remote(_lp_small_fn)
        ref = small.remote(max_iter, *edges_ds.to_arrow_refs())
        return ray.data.from_arrow_refs([ref])
    g = ShardedGraph.build(edges_ds, num_owners=num_owners,
                           undirected=True)
    try:
        labels, _ = label_propagation(g, max_iter=max_iter)
        return labels.materialize()
    finally:
        g.shutdown()


def _checkpoint(graph: ShardedGraph, ckpt_dir: str, it: int, kind: str,
                extra: dict):
    """Write all owner parts into ``it=<k>.tmp``, then atomically publish by
    writing the manifest and renaming (SURVEY.md §7.7)."""
    tmp = sweep_dir(ckpt_dir, it, tmp=True)
    part_metrics = ray.get([
        ow.write_state_part.remote(f"{tmp}/{kind}", kind)
        for ow in graph.owners
    ])
    write_sweep_manifest(ckpt_dir, it, {
        "iteration": it,
        "kind": kind,
        **extra,
        "partitions": part_metrics,
        "edge_shards": graph.collect_metrics(),
    })
