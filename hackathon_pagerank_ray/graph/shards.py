"""Partitioned CSR graph shards — the iterative-compute substrate.

Physical plan (BASELINE.json north_rule: "gather-scatter over CSR partitions
followed by a groupby-aggregate shuffle keyed on destination-vertex hash"):

* ``RankOwner`` actors — P hash partitions of the *vertex state* (ranks /
  labels, out-degrees, dangling flags).  Vertex ``v`` lives on owner
  ``v % P`` at local index ``v // P``.
* ``EdgeShard`` actors — E balanced partitions of the *edge list*.  Edges
  are sorted by ``src`` and split by edge count, NOT by source vertex, so a
  hub's out-edges straddle shards (explicit out-skew splitting).  Each shard
  builds its local CSR-style index **once** (build time), then every sweep:

  1. gathers the vertex values it needs from owners via per-shard
     *subscription lists* computed at build time (only the unique vertex ids
     this shard touches move — the broadcast-free gather),
  2. computes contributions and **pre-aggregates locally by destination**
     (``np.bincount`` over a compacted dst index) — this is the combiner
     that caps an in-hub's shuffle fan-in at ≤ E partial values no matter
     its in-degree (explicit in-skew handling), and
  3. ships one partial-sum array per destination owner — the
     groupby-aggregate shuffle keyed on ``hash(dst) = dst % P``.

The reference keeps the whole CSR on one GPU (backend/cuda/
pagerank_gpu.cu:32-37,255-260); this is its partitioned equivalent, and the
per-sweep scalar barrier (dangling mass, L1 residual) mirrors the
reference's per-iteration device→host reductions (``:279-305``).

All numeric work is vectorized numpy on int64/float64 arrays.  Actors never
call ``ray.init``.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray


def _to_numpy(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.to_numpy(zero_copy_only=False)


def _tune_malloc() -> None:
    """Keep freed large buffers on the heap for reuse instead of
    mmap/munmap per allocation (glibc default MMAP_THRESHOLD is 128 KB).

    Every sweep allocates tens of MB of numpy temporaries per actor;
    with the default allocator each one is fresh mmap'd pages whose
    first-touch faults dominate sweep time on virtualized hosts
    (measured 1.55x sweep speedup on the bench graph).  Called once per
    actor process; silently a no-op off glibc."""
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)    # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)    # M_TRIM_THRESHOLD
    except Exception:
        pass


@ray.remote
class RankOwner:
    """Owns vertex state for the partition ``{v : v % P == j}``."""

    def __init__(self, shard_id: int, num_owners: int, n: int | None = None):
        _tune_malloc()
        self.j = shard_id
        self.P = num_owners
        # subscriptions[e] = local indices whose values EdgeShard e gathers
        self.subscriptions: dict[int, np.ndarray] = {}
        # dst_maps[e] = local indices EdgeShard e's partial sums align to
        self.dst_maps: dict[int, np.ndarray] = {}
        self.r: np.ndarray | None = None
        self.labels: np.ndarray | None = None
        self._vals: np.ndarray | None = None   # per-sweep gathered value vector
        self.pers: np.ndarray | None = None    # personalized teleport weights
        self.metrics = {"gather_bytes": 0, "sweep_seconds": 0.0}
        if n is not None:
            self.configure(n)

    def configure(self, n: int) -> None:
        """Size the vertex-state arrays once ``n`` is known (deferred so the
        actor can be created before the edge Dataset has executed)."""
        self.n = n
        self.n_local = len(range(self.j, n, self.P))
        self.outdeg = np.zeros(self.n_local, dtype=np.float64)

    # -- build -------------------------------------------------------------
    def add_outdeg(self, contrib) -> None:
        """``contrib`` = (local_idx, counts) — one edge shard's out-degree
        partial (passed as a single ObjectRef, resolved by Ray)."""
        local_idx, counts = contrib
        np.add.at(self.outdeg, local_idx, counts)

    def get_metrics(self) -> dict:
        return {"owner": self.j, **self.metrics}

    def exchange_profile(self) -> dict:
        """Wire-volume introspection (r5 rehearsal): bytes of each
        per-shard gather slice this owner emits per subscribe-mode
        sweep, plus the raylet hosting this actor."""
        import ray as _r
        E = len(self.subscriptions)
        return {"owner": self.j,
                "node": _r.get_runtime_context().get_node_id(),
                "slice_bytes_to_shard": [
                    int(len(self.subscriptions[e]) * 8)
                    for e in range(E)]}

    def subscribe(self, edge_shard_id: int, sub) -> None:
        """``sub`` = (gather local_idx, scatter dst_local_idx) from
        ``EdgeShard.subscription`` — passed by ObjectRef, no driver copy."""
        local_idx, dst_local_idx = sub
        self.subscriptions[edge_shard_id] = np.asarray(local_idx, dtype=np.int64)
        self.dst_maps[edge_shard_id] = np.asarray(dst_local_idx, dtype=np.int64)

    def register_shard(self, edge_shard_id: int, payload) -> None:
        """Batched wiring: one message per (shard, owner) carrying the
        subscription, scatter map and out-degree partial together."""
        sub_local, dst_local, od_idx, od_cnt = payload
        self.subscriptions[edge_shard_id] = np.asarray(sub_local, dtype=np.int64)
        self.dst_maps[edge_shard_id] = np.asarray(dst_local, dtype=np.int64)
        if len(od_idx):
            np.add.at(self.outdeg, od_idx, od_cnt)

    def get_full_values(self) -> np.ndarray:
        """Full-partition value vector for ``gather_mode="full"`` — ONE
        plasma object per owner per sweep, shared zero-copy by every edge
        shard on the node (single-node fast path; ``"subscribe"`` is the
        multi-node bandwidth-minimal path)."""
        return self._vals

    def finalize_build(self) -> dict:
        self.dangling = self.outdeg == 0
        self.inv_out = np.zeros(self.n_local)
        nz = ~self.dangling
        self.inv_out[nz] = 1.0 / self.outdeg[nz]
        return {"owner": self.j, "n_local": self.n_local,
                "dangling": int(self.dangling.sum())}

    def vids(self) -> np.ndarray:
        return np.arange(self.j, self.n, self.P, dtype=np.int64)

    # -- PageRank ----------------------------------------------------------
    def init_ranks(self, value: float | None = None) -> None:
        if self.pers is not None and value is None:
            # personalized PageRank starts at the teleport distribution
            self.r = self.pers.copy()
            return
        if value is None:
            value = 1.0 / self.n if self.n else 0.0
        self.r = np.full(self.n_local, value)

    def set_personalization(self, vids, weights) -> None:
        """Install this owner's slice of a personalized teleport vector
        (``vids`` must all satisfy ``vid % P == j``); ``None`` vids clears
        back to the uniform 1/n teleport."""
        if vids is None:
            self.pers = None
            return
        w = np.zeros(self.n_local)
        v = np.asarray(vids, dtype=np.int64)
        if len(v):
            w[v // self.P] = np.asarray(weights, dtype=np.float64)
        self.pers = w

    def set_ranks(self, ranks: np.ndarray) -> None:
        self.r = np.asarray(ranks, dtype=np.float64).copy()

    def warm_apply_parts(self, *tables) -> None:
        """Overlay (vid, rank) rows onto the current rank vector — the
        warm-start scatter target.  ``init_ranks(fill)`` must run first;
        every vid must be owned here (``vid % P == j``)."""
        for t in tables:
            v = np.asarray(t["vid"], dtype=np.int64)
            if len(v):
                self.r[v // self.P] = np.asarray(t["rank"],
                                                 dtype=np.float64)

    def start_pagerank_sweep(self) -> float:
        """Compute rr = r/outdeg and return this partition's dangling mass
        (reference measures it on the in-vector, pagerank_gpu.cu:150-154)."""
        t0 = time.perf_counter()
        self._vals = self.r * self.inv_out
        dm = float(self.r[self.dangling].sum())
        self.metrics["sweep_seconds"] += time.perf_counter() - t0
        return dm

    def get_values(self, edge_shard_id: int) -> np.ndarray:
        """The gather: only this shard's subscribed values leave the owner."""
        out = self._vals[self.subscriptions[edge_shard_id]]
        self.metrics["gather_bytes"] += out.nbytes
        return out

    def get_values_all(self):
        """Every shard's gather slice in ONE actor call (used with
        ``options(num_returns=E)``): the slice wave costs P scheduled
        tasks instead of E·P — at mesh 16 that is 16 tasks, not 256,
        and per-task scheduling overhead is most of the subscribe-mode
        sweep's non-kernel wall time."""
        E = len(self.subscriptions)
        out = tuple(self._vals[self.subscriptions[e]] for e in range(E))
        self.metrics["gather_bytes"] += sum(o.nbytes for o in out)
        return out if E > 1 else out[0]

    def apply_pagerank_update(self, alpha: float, dangling_mass: float,
                              *partials: np.ndarray, emit_slices: bool = False):
        """Reduce edge-shard partials (fixed shard order → deterministic),
        apply ``r' = α·(y + dm/n) + (1-α)/n``.

        Returns ``(L1 residual part, next sweep's dangling-mass part)`` and
        eagerly prepares the next sweep's value vector ``r'/outdeg`` — the
        fusion removes one driver round-trip barrier per sweep (the
        reference pays the same fused device→host copy each iteration,
        pagerank_gpu.cu:279-305).

        ``emit_slices=True`` (used with ``options(num_returns=1 + E)``)
        additionally returns the next sweep's per-shard gather slices —
        fusing the slice wave into the update call, so a subscribe-mode
        sweep needs no separate ``get_values_all`` task wave at all."""
        t0 = time.perf_counter()
        y = np.zeros(self.n_local)
        for e_id in sorted(self.dst_maps):
            part = partials[e_id]
            if isinstance(part, tuple):      # packed transfer: pick own slice
                part = part[self.j]
            if part is not None and len(part):
                # dst_maps entries are UNIQUE per shard (uniq_dst_local) —
                # plain fancy-index add is several times faster than
                # np.add.at on the per-sweep hot path
                y[self.dst_maps[e_id]] += part
        if self.pers is None:
            r_new = (alpha * (y + dangling_mass / self.n)
                     + (1.0 - alpha) / self.n)
        else:
            # personalized teleport: both the (1-α) jump and the dangling
            # mass land on the personalization vector instead of uniform 1/n
            r_new = (alpha * (y + dangling_mass * self.pers)
                     + (1.0 - alpha) * self.pers)
        delta = float(np.abs(r_new - self.r).sum())
        self.r = r_new
        self._vals = r_new * self.inv_out
        dm_next = float(r_new[self.dangling].sum())
        self.metrics["sweep_seconds"] += time.perf_counter() - t0
        if emit_slices:
            E = len(self.subscriptions)
            slices = tuple(self._vals[self.subscriptions[e]]
                           for e in range(E))
            self.metrics["gather_bytes"] += sum(s.nbytes for s in slices)
            return ((delta, dm_next), *slices)
        return delta, dm_next

    # -- k-core ------------------------------------------------------------
    def start_value_sweep(self) -> None:
        """Ship raw ``r`` as this sweep's values (k-core alive mask)."""
        self._vals = self.r

    def apply_kcore_update(self, k: int, *partials) -> int:
        """One peeling round: ``y`` = alive-neighbor count (plain-sum
        reduce of the alive mask over the undirected adjacency); a vertex
        stays alive iff it was alive and ``y >= k``.  Returns the number
        of vertices peeled this round (0 → fixpoint)."""
        t0 = time.perf_counter()
        y = np.zeros(self.n_local)
        for e_id in sorted(self.dst_maps):
            part = partials[e_id]
            if isinstance(part, tuple):
                part = part[self.j]
            if part is not None and len(part):
                y[self.dst_maps[e_id]] += part
        new_alive = np.where((self.r > 0.5) & (y >= k), 1.0, 0.0)
        changed = int(np.count_nonzero(new_alive != self.r))
        self.r = new_alive
        self.metrics["sweep_seconds"] += time.perf_counter() - t0
        return changed

    # -- HITS (hubs & authorities) ----------------------------------------
    def set_sweep_values(self, vals) -> None:
        """Install an externally-supplied per-sweep value vector (HITS ships
        the OTHER graph's owner state here: hub values into the forward
        graph before an authority sweep and vice versa)."""
        self._vals = np.asarray(vals, dtype=np.float64)

    def ranks_array(self) -> np.ndarray:
        return self.r

    def outdeg_array(self) -> np.ndarray:
        """This owner's per-slot out-degree vector (in the graph this mesh
        was built over — the REVERSED mesh's outdeg is the forward graph's
        in-degree for the same vid % P slots)."""
        return self.outdeg

    def scaled_ranks_array(self, deg) -> np.ndarray:
        """``r / deg`` with zero-degree slots contributing 0.0 — the
        SALSA pre-scale (``deg`` is usually the OTHER mesh's outdeg slice
        for the same slots; both meshes share the vid % P map)."""
        deg = np.asarray(deg, dtype=np.float64)
        out = np.zeros(self.n_local)
        nz = deg > 0
        out[nz] = self.r[nz] / deg[nz]
        return out

    def apply_sum_update(self, *partials) -> float:
        """Plain-sum reduce (no damping, no teleport): ``r = Σ partials`` —
        the HITS half-sweep.  Returns this partition's Σ r² so the driver
        can L2-normalize with one scalar barrier."""
        t0 = time.perf_counter()
        y = np.zeros(self.n_local)
        for e_id in sorted(self.dst_maps):
            part = partials[e_id]
            if isinstance(part, tuple):
                part = part[self.j]
            if part is not None and len(part):
                y[self.dst_maps[e_id]] += part
        self.r = y
        self.metrics["sweep_seconds"] += time.perf_counter() - t0
        return float((y * y).sum())

    def rank_sum(self) -> float:
        return float(self.r.sum())

    def scale_ranks(self, factor: float) -> None:
        self.r = self.r * factor

    def ranks_table(self) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array(self.vids(), pa.int64()), pa.array(self.r, pa.float64())],
            names=["vid", "rank"],
        )

    # -- label ops (CC / LP) ----------------------------------------------
    def init_labels(self) -> None:
        self.labels = self.vids().copy()

    def set_labels(self, labels: np.ndarray) -> None:
        self.labels = np.asarray(labels, dtype=np.int64).copy()

    def start_label_sweep(self) -> None:
        self._vals = self.labels

    def apply_min_label_update(self, *partial_mins: np.ndarray) -> int:
        """CC: take the min of current labels and incoming neighbor minima;
        returns the number of labels that changed."""
        new = self.labels.copy()
        for e_id in sorted(self.dst_maps):
            part = partial_mins[e_id]
            if isinstance(part, tuple):
                part = part[self.j]
            if part is not None and len(part):
                idx = self.dst_maps[e_id]          # unique per shard
                new[idx] = np.minimum(new[idx], part.astype(np.int64))
        changed = int((new != self.labels).sum())
        self.labels = new
        return changed

    # -- SCC (forward/backward min-label with settled mask) ----------------
    def init_scc(self) -> None:
        self.scc_label = np.full(self.n_local, -1, dtype=np.int64)

    def reset_alive_labels(self) -> None:
        """Start an SCC inner fixpoint: unsettled vertices propose their
        own vid; settled vertices hold the int64-max sentinel so labels
        never flow into or THROUGH them (min with sentinel is a no-op —
        the settled subgraph is effectively removed)."""
        sent = np.iinfo(np.int64).max
        self.labels = np.where(self.scc_label < 0, self.vids(), sent)

    def apply_masked_min_update(self, *partial_mins: np.ndarray) -> int:
        """``apply_min_label_update`` restricted to unsettled vertices."""
        sent = np.iinfo(np.int64).max
        new = self.labels.copy()
        for e_id in sorted(self.dst_maps):
            part = partial_mins[e_id]
            if isinstance(part, tuple):
                part = part[self.j]
            if part is not None and len(part):
                idx = self.dst_maps[e_id]
                new[idx] = np.minimum(new[idx], part.astype(np.int64))
        new[self.scc_label >= 0] = sent
        changed = int((new != self.labels).sum())
        self.labels = new
        return changed

    def labels_array(self) -> np.ndarray:
        return self.labels

    def settle_compare(self, other_labels) -> int:
        """Settle every unsettled vertex whose forward and backward
        fixpoint labels agree on a finite value x: x is then both an
        ancestor and a descendant, i.e. x is the min vid of this vertex's
        SCC.  Returns the number settled."""
        other = np.asarray(other_labels, dtype=np.int64)
        sent = np.iinfo(np.int64).max
        m = ((self.scc_label < 0) & (self.labels == other)
             & (self.labels != sent))
        self.scc_label[m] = self.labels[m]
        return int(m.sum())

    def scc_table(self) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array(self.vids(), pa.int64()),
             pa.array(self.scc_label, pa.int64())],
            names=["vid", "label"])

    def init_sssp(self, source) -> None:
        """Weighted SSSP state: +inf everywhere except the source(s)
        (float64 in the rank buffer; start_value_sweep ships it).
        ``source`` may be one vid or an array — multi-source init gives
        distance-to-nearest-seed semantics."""
        self.r = np.full(self.n_local, np.inf)
        srcs = np.atleast_1d(np.asarray(source, dtype=np.int64))
        mine = srcs[(srcs % self.P == self.j)
                    & (srcs // self.P < self.n_local)]
        if len(mine):
            self.r[mine // self.P] = 0.0

    def apply_minplus_update(self, *partials) -> int:
        """Bellman-Ford relax: ``d = min(d, incoming min(d_u + w))``.
        Candidates are exact path-weight sums reproduced identically by
        the unrolled SQL twin, so the fixpoint equality test is exact
        (min never invents new floats).  Returns #improved."""
        new = self.r.copy()
        for e_id in sorted(self.dst_maps):
            part = partials[e_id]
            if isinstance(part, tuple):
                part = part[self.j]
            if part is not None and len(part):
                idx = self.dst_maps[e_id]
                new[idx] = np.minimum(new[idx], part)
        changed = int((new != self.r).sum())
        self.r = new
        return changed

    def init_distances(self, source: int) -> None:
        """BFS state: int64-max sentinel everywhere except the source."""
        self.labels = np.full(self.n_local, np.iinfo(np.int64).max,
                              dtype=np.int64)
        if source % self.P == self.j and source // self.P < self.n_local:
            self.labels[source // self.P] = 0

    def apply_bfs_update(self, *partial_mins: np.ndarray) -> int:
        """Min-plus relax: ``d' = min(d, min_in_neighbor(d) + 1)``;
        unreached (sentinel) partials stay sentinel instead of wrapping.
        Returns the number of distances that improved."""
        sent = np.iinfo(np.int64).max
        new = self.labels.copy()
        for e_id in sorted(self.dst_maps):
            part = partial_mins[e_id]
            if isinstance(part, tuple):
                part = part[self.j]
            if part is not None and len(part):
                p = part.astype(np.int64)
                p = np.where(p == sent, sent, p + 1)
                idx = self.dst_maps[e_id]          # unique per shard
                new[idx] = np.minimum(new[idx], p)
        changed = int((new != self.labels).sum())
        self.labels = new
        return changed

    def apply_mode_label_update(self, *partial_counts) -> int:
        """LP: merge (local_idx, label, count) triplets from all edge shards,
        adopt per-vertex argmax count with min-label tie-break (the
        deterministic contract in oracle.label_propagation)."""
        idx_parts, lab_parts, cnt_parts = [], [], []
        for part in partial_counts:
            if part is None:
                continue
            if isinstance(part, tuple) and len(part) == self.P and \
                    isinstance(part[0], tuple):   # packed transfer
                part = part[self.j]
            i, l, c = part
            if len(i):
                idx_parts.append(np.asarray(i, dtype=np.int64))
                lab_parts.append(np.asarray(l, dtype=np.int64))
                cnt_parts.append(np.asarray(c, dtype=np.int64))
        if not idx_parts:
            return 0
        idx = np.concatenate(idx_parts)
        lab = np.concatenate(lab_parts)
        cnt = np.concatenate(cnt_parts)
        # merge duplicate (idx, lab) pairs, then argmax by (count, -label)
        order = np.lexsort((lab, idx))
        idx, lab, cnt = idx[order], lab[order], cnt[order]
        boundary = np.ones(len(idx), dtype=bool)
        boundary[1:] = (idx[1:] != idx[:-1]) | (lab[1:] != lab[:-1])
        group = np.cumsum(boundary) - 1
        merged_cnt = np.bincount(group, weights=cnt).astype(np.int64)
        merged_idx = idx[boundary]
        merged_lab = lab[boundary]
        # per-vertex argmax: sort by (idx, count, -label) and take the last
        # entry per idx → max count, and among ties the MIN label
        order2 = np.lexsort((-merged_lab, merged_cnt, merged_idx))
        mi, ml = merged_idx[order2], merged_lab[order2]
        last = np.ones(len(mi), dtype=bool)
        last[:-1] = mi[1:] != mi[:-1]
        new = self.labels.copy()
        new[mi[last]] = ml[last]
        changed = int((new != self.labels).sum())
        self.labels = new
        return changed

    def labels_table(self) -> pa.Table:
        return pa.Table.from_arrays(
            [pa.array(self.vids(), pa.int64()),
             pa.array(self.labels, pa.int64())],
            names=["vid", "label"],
        )

    # -- sharded Brandes (K-lane betweenness/closeness) --------------------
    # The at-scale exact path for betweenness/closeness: K sources run
    # level-synchronously as lanes of a (n_local, K) state matrix; the
    # whole-graph CSR never exists anywhere (r3 verdict's one remaining
    # one-worker-heap bound).  Forward phase (this mesh = forward edges):
    # BFS levels + shortest-path counts sigma.  Backward phase (reversed
    # mesh): dependency accumulation delta.  sigma values are integer-
    # valued floats, so their accumulation is order-exact; delta is
    # deterministic (fixed shard-order reduce) but associates differently
    # from the broadcast path — parity is allclose, not bit-equal.

    def source_sample(self, max_sources, seed: int):
        """This owner's Brandes source candidates (outdeg>0 vids) with
        their md5 ranks (the deterministic sampling order shared with the
        broadcast path).  With ``max_sources`` set, only the owner's
        ``max_sources`` smallest-rank candidates return — the driver
        merges P such lists, so its payload is bounded by P·max_sources
        regardless of n.  Returns ``(n_candidates, vids, ranks)``."""
        vids = self.vids()[self.outdeg > 0]
        n_cand = len(vids)
        if max_sources is None:
            return n_cand, vids, None
        from ..stages.stats import _bulk_md5_upper_be
        ranks = _bulk_md5_upper_be(vids.astype(str), [f"{seed}:"])[0]
        if n_cand > max_sources:
            pick = np.argsort(ranks, kind="stable")[:max_sources]
            vids, ranks = vids[pick], ranks[pick]
        return n_cand, vids, ranks

    def brandes_init(self, sources) -> None:
        """Start a K-lane forward phase: lane k's source is vid
        ``sources[k]``; dist = -1 everywhere except 0 at each owned
        source, sigma = 0 except 1 there."""
        srcs = np.asarray(sources, dtype=np.int64)
        K = len(srcs)
        self.b_src = srcs
        self.b_dist = np.full((self.n_local, K), -1, dtype=np.int64)
        self.b_sigma = np.zeros((self.n_local, K))
        mine = (srcs % self.P == self.j) & (srcs // self.P < self.n_local)
        for k in np.flatnonzero(mine):
            self.b_dist[srcs[k] // self.P, k] = 0
            self.b_sigma[srcs[k] // self.P, k] = 1.0

    def brandes_publish_sigma(self, level: int) -> np.ndarray:
        """(n_local, K) matrix: sigma where dist == level, else 0 — the
        frontier's path counts, one full-mode gather object per owner."""
        return np.where(self.b_dist == level, self.b_sigma, 0.0)

    def brandes_apply_sigma(self, level: int, *partials) -> int:
        """Assign newly-reached vertices to ``level + 1``: a vertex is at
        level+1 iff unvisited and some in-neighbor at ``level`` reaches
        it; its sigma is the (exact, integer-in-float) sum of those
        neighbors' sigmas.  Returns #newly reached across lanes."""
        K = self.b_dist.shape[1]
        y = np.zeros((self.n_local, K))
        for e_id in sorted(self.dst_maps):
            part = partials[e_id]
            if isinstance(part, tuple):
                part = part[self.j]
            if part is not None and len(part):
                y[self.dst_maps[e_id]] += part
        newly = (self.b_dist == -1) & (y > 0)
        self.b_dist[newly] = level + 1
        self.b_sigma[newly] = y[newly]
        return int(newly.sum())

    def brandes_state(self):
        """(sources, dist, sigma) — shipped once per batch to the
        reversed mesh's same-index owner (identical vid % P slots)."""
        return self.b_src, self.b_dist, self.b_sigma

    def brandes_load_state(self, state) -> None:
        self.b_src, self.b_dist, self.b_sigma = state
        self.b_delta = np.zeros_like(self.b_sigma)

    def brandes_reset_total(self) -> None:
        self.b_total = np.zeros(self.n_local)

    def brandes_publish_g(self, level: int) -> np.ndarray:
        """(1 + delta) / sigma masked to dist == level — the backward
        phase's per-vertex factor (sigma >= 1 wherever reached)."""
        g = np.zeros_like(self.b_sigma)
        mask = self.b_dist == level
        np.divide(1.0 + self.b_delta, self.b_sigma, out=g, where=mask)
        return g

    def brandes_apply_delta(self, level: int, *partials) -> None:
        """delta(u) += sigma(u) · Σ_{v ∈ succ(u), dist(v)=level+1} g(v),
        restricted to dist(u) == level (the predecessor condition —
        partials arrive over the REVERSED edge set)."""
        K = self.b_dist.shape[1]
        y = np.zeros((self.n_local, K))
        for e_id in sorted(self.dst_maps):
            part = partials[e_id]
            if isinstance(part, tuple):
                part = part[self.j]
            if part is not None and len(part):
                y[self.dst_maps[e_id]] += part
        m = self.b_dist == level
        self.b_delta[m] += (self.b_sigma * y)[m]

    def brandes_accumulate(self, scale: float) -> None:
        """Fold this batch's lanes into the running betweenness totals,
        excluding each lane's own source (delta_s(s) is never counted)."""
        d = self.b_delta
        srcs = self.b_src
        mine = (srcs % self.P == self.j) & (srcs // self.P < self.n_local)
        for k in np.flatnonzero(mine):
            d[srcs[k] // self.P, k] = 0.0
        self.b_total += d.sum(axis=1) * scale

    def brandes_total_table(self) -> pa.Table:
        nz = np.flatnonzero(self.b_total)
        return pa.table({
            "vid": pa.array(self.vids()[nz], pa.int64()),
            "betweenness": pa.array(self.b_total[nz], pa.float64())})

    def lane_slices_all(self, kind: str, level: int):
        """Subscribe-mode gather for the K-lane sweeps: every shard's
        subscription row-slice of this owner's publish matrix in ONE
        call (used with ``options(num_returns=E)``) — only the rows a
        shard's edges touch leave the owner, the multi-node
        bandwidth-minimal path (``kind``: "sigma" for the forward
        frontier, "g" for the backward factor)."""
        M = (self.brandes_publish_sigma(level) if kind == "sigma"
             else self.brandes_publish_g(level))
        E = len(self.subscriptions)
        out = tuple(M[self.subscriptions[e]] for e in range(E))
        self.metrics["gather_bytes"] += sum(o.nbytes for o in out)
        return out if E > 1 else out[0]

    def distance_lane_partials(self):
        """Per-lane (Σ dist, #reached, Σ 1/dist) over this owner's slots
        with dist > 0 — the closeness/harmonic reductions of the forward
        phase (driver sums P such partials per lane; int sums are exact,
        the harmonic float sum is fixed owner-major order)."""
        d = self.b_dist
        pos = d > 0
        sums = np.where(pos, d, 0).sum(axis=0).astype(np.int64)
        reach = pos.sum(axis=0).astype(np.int64)
        inv = np.where(pos, 1.0 / np.maximum(d, 1), 0.0).sum(axis=0)
        return sums, reach, inv

    # -- checkpoint --------------------------------------------------------
    def write_state_part(self, path: str, kind: str) -> dict:
        import os
        import pyarrow.parquet as pq
        os.makedirs(path, exist_ok=True)
        t0 = time.perf_counter()
        table = self.ranks_table() if kind == "ranks" else self.labels_table()
        out = f"{path}/part-{self.j:05d}.parquet"
        pq.write_table(table, out)
        return {"owner": self.j, "rows": table.num_rows,
                "bytes": table.nbytes, "seconds": time.perf_counter() - t0,
                "file": out, **self.metrics}

    def load_state_part(self, path: str, kind: str) -> None:
        """Load this owner's checkpoint part, remapping rows BY VID (not
        positionally) and failing fast if any vid belongs to a different
        owner — catches resumes against a checkpoint written with another
        mesh shape (ADVICE r1; the manifest check in the engine is the
        first line of defense, this is the per-part one)."""
        import pyarrow.parquet as pq
        table = pq.read_table(f"{path}/part-{self.j:05d}.parquet")
        vids = _to_numpy(table["vid"]).astype(np.int64)
        if len(vids) != self.n_local or (len(vids) and (
                (vids % self.P != self.j).any() or vids.max() >= self.n)):
            raise ValueError(
                f"checkpoint part {path}/part-{self.j:05d}.parquet does not "
                f"match owner {self.j}/{self.P} with n={self.n} "
                f"(part has {len(vids)} rows)")
        local = vids // self.P
        vals = _to_numpy(table["rank" if kind == "ranks" else "label"])
        out = np.empty(self.n_local, dtype=vals.dtype)
        out[local] = vals
        if kind == "ranks":
            self.set_ranks(out)
        else:
            self.set_labels(out)


@ray.remote
class EdgeShard:
    """One balanced chunk of the edge list with build-once local indexes."""

    def __init__(self, shard_id: int, num_owners: int,
                 edge_tables=None, undirected: bool = False,
                 gather_mode: str = "full",
                 canonical_scatter: bool = False):
        _tune_malloc()
        self.e = shard_id
        self.P = num_owners
        self.gather_mode = gather_mode
        # canonical_scatter totally orders the scatter sort by
        # (dst_owner, dst, src) instead of (dst_owner, dst) with
        # input-position ties — per-destination float accumulation is
        # then independent of edge ROW ORDER, which is what lets
        # apply_edge_delta's patched mesh solve bit-identically to a
        # cold rebuild of the same edge set (opt-in: it changes
        # last-ulp sums vs the default order)
        self.canonical_scatter = canonical_scatter
        self.undirected = undirected
        self.metrics = {"edges": 0, "uniq_src": 0, "sweep_seconds": 0.0}
        if edge_tables is not None:
            self.set_edges(edge_tables, undirected)

    def set_edges(self, edge_tables, undirected: bool = False,
                  weight_col: str | None = None) -> int:
        """Load this shard's edge chunk and build the local CSR-style
        indexes (once).  Returns the shard's max vertex id (-1 if empty) so
        the driver can derive ``n = max_id + 1`` without a Dataset pass.

        ``edge_tables`` entries may be Arrow tables, plasma refs to Arrow
        tables, or parquet file paths (str) — the path form is the at-scale
        build: each shard reads only its own fragments, column-pruned to
        src/dst (+ the weight column when given), with no driver-side
        materialization or plasma copy of the edge table.

        ``weight_col``: optional per-edge positive weight — PageRank
        contributions become ``r[src]·w/Σ_out w`` (weighted PageRank);
        label/k-core sweeps ignore weights."""
        num_owners = self.P
        cols = ["src", "dst"] + ([weight_col] if weight_col else [])
        _t = time.perf_counter()
        if isinstance(edge_tables, (pa.Table, str)):
            edge_tables = [edge_tables]
        # refs nested in a list are not auto-resolved by Ray — fetch here
        # (zero-copy reads from the local object store); str entries are
        # parquet fragment paths read directly (pruned to the edge columns)
        edge_tables = [
            pq.read_table(t, columns=cols) if isinstance(t, str)
            else (ray.get(t) if isinstance(t, ray.ObjectRef) else t)
            for t in edge_tables
        ]
        # sort/repartition can emit empty blocks with an EMPTY schema —
        # drop anything that doesn't carry the edge columns
        edge_tables = [t for t in edge_tables
                       if t.num_rows and "src" in t.schema.names]
        w = None
        if edge_tables:
            edge_table = pa.concat_tables(
                [t.select(cols) for t in edge_tables]
            )
            src = _to_numpy(edge_table["src"]).astype(np.int64, copy=False)
            dst = _to_numpy(edge_table["dst"]).astype(np.int64, copy=False)
            if weight_col:
                w = _to_numpy(edge_table[weight_col]).astype(np.float64,
                                                             copy=False)
        else:
            src = np.zeros(0, dtype=np.int64)
            dst = np.zeros(0, dtype=np.int64)
            if weight_col:
                w = np.zeros(0)
        self.metrics["build_load_sec"] = round(time.perf_counter() - _t, 3)
        self.undirected = undirected
        return self._finish_load(src, dst, w, undirected)

    def _finish_load(self, src, dst, w, undirected: bool,
                     presorted: bool = False) -> int:
        """Array → index build (phase 1): shared by the parquet/table load
        path (:meth:`set_edges`) and the in-place patch path
        (:meth:`apply_delta`).  Returns the shard's max vertex id.

        ``presorted=True`` (delta path only): the arrays are already in
        canonical (dst_owner, dst, src) order, so the scatter sort — the
        most expensive build phase — is the identity permutation."""
        num_owners = self.P
        # canonical (pre-doubling) row count — what Dataset.count() reports
        self.m_input = len(src)
        if undirected:
            # treat each stored canonical edge as both directions
            src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
            if w is not None:
                w = np.concatenate([w, w])
        self.src = src
        self.dst = dst
        self.w = w
        self.m = len(src)
        self._od_cache = None
        self._src_min = int(src.min()) if self.m else -1
        self._src_max = int(src.max()) if self.m else -1

        _t = time.perf_counter()
        # scatter side: per destination owner, a compacted dst index.
        # ONE argsort on an (owner-major, dst-minor) composite key replaces
        # the owner argsort PLUS a per-owner np.unique re-sort: segments
        # come out dst-sorted, so uniques are just change boundaries.  Any
        # consistent edge permutation is valid here — src_pos is composed
        # through the same scatter_order in build_gather.
        dst_owner = dst % num_owners
        if self.m and presorted:
            self.scatter_order = np.arange(self.m, dtype=np.int64)
        elif self.m and self.canonical_scatter:
            # total (dst_owner, dst, src) order: row-order independent
            span = int(dst.max()) + 1
            span_s = int(src.max()) + 1
            if num_owners * span * span_s < 2 ** 63:
                key = (dst_owner * np.int64(span) + dst) \
                    * np.int64(span_s) + src
                self.scatter_order = np.argsort(key, kind="stable")
            else:
                self.scatter_order = np.lexsort((src, dst, dst_owner))
        elif self.m:
            span = int(dst.max()) + 1
            if num_owners * span < 2 ** 63:
                self.scatter_order = np.argsort(
                    dst_owner * np.int64(span) + dst)
            else:  # composite key would overflow int64 — two stable sorts
                self.scatter_order = np.lexsort((dst, dst_owner))
        else:
            self.scatter_order = np.zeros(0, dtype=np.int64)
        sorted_dst = dst[self.scatter_order]
        self.scatter_counts = np.bincount(dst_owner, minlength=num_owners)
        soffs = np.concatenate([[0], np.cumsum(self.scatter_counts)])
        self.dst_compact = np.empty(self.m, dtype=np.int64)
        self.uniq_dst_local = []
        for j in range(num_owners):
            seg = sorted_dst[soffs[j]:soffs[j + 1]]
            if not len(seg):
                self.uniq_dst_local.append(np.zeros(0, dtype=np.int64))
                continue
            new = np.empty(len(seg), dtype=bool)
            new[0] = True
            np.not_equal(seg[1:], seg[:-1], out=new[1:])
            self.dst_compact[soffs[j]:soffs[j + 1]] = np.cumsum(new) - 1
            self.uniq_dst_local.append(seg[new] // num_owners)
        self.soffs = soffs
        # per-edge weights in scatter order (the order pagerank_partials
        # walks); None on the unweighted fast path
        self.w_scattered = (self.w[self.scatter_order]
                            if self.w is not None else None)
        self.metrics["build_scatter_sec"] = round(time.perf_counter() - _t, 3)
        self.metrics["edges"] = self.m
        return int(max(src.max(initial=-1), dst.max(initial=-1)))

    def build_gather(self, n: int) -> None:
        """Build the gather-side addressing once ``n`` is known (phase 2 of
        the build — the driver calls this on every shard after deriving
        ``n = max(max_ids) + 1`` from phase 1's return values).

        Two layouts:

        - **dense direct** (``gather_mode="full"`` and ``m >= n // 2``):
          every owner ships its whole value vector anyway, so a shard that
          touches a large fraction of the vertices gains nothing from
          compacting to its unique sources — the edge→slot map is pure
          arithmetic (``offs[src % P] + src // P``) with NO unique/sort
          passes, which removes the two most expensive build phases, and
          the per-sweep gather becomes P contiguous slice copies instead
          of an indexed ``np.take``.
        - **compacted** (otherwise): unique sources only — bounds the
          shard's gather buffer by its edge count, required for
          ``"subscribe"`` (only subscribed slices are shipped) and for
          sparse shards where ``uniq_src << n``.
        """
        num_owners = self.P
        src = self.src
        _t = time.perf_counter()
        self.dense_gather = (self.gather_mode == "full"
                             and self.m >= n // 2)
        if self.dense_gather:
            counts = np.array(
                [max(0, (n - j + num_owners - 1) // num_owners)
                 for j in range(num_owners)], dtype=np.int64)
            self.owner_slice_counts = counts
            offs = np.concatenate([[0], np.cumsum(counts)])
            self.src_pos = offs[src % num_owners] + src // num_owners
            # owners never ship subscribed slices in full mode
            self.sub_local = [np.zeros(0, dtype=np.int64)
                              for _ in range(num_owners)]
            n_slots = int(offs[-1])
            self.metrics["build_gather_sec"] = round(
                time.perf_counter() - _t, 3)
            self.metrics["build_sub_sec"] = 0.0
        else:
            # gather side: unique vertices whose values this shard needs
            self.uniq_src = np.unique(src)                     # sorted
            self.src_pos = np.searchsorted(self.uniq_src, src)  # edge→slot
            self.metrics["build_gather_sec"] = round(
                time.perf_counter() - _t, 3)
            _t = time.perf_counter()
            # received value vectors are concatenated in owner order;
            # compute the offset of each owner's slice in the gather vector
            owner_of_uniq = self.uniq_src % num_owners
            self.gather_order = np.argsort(owner_of_uniq, kind="stable")
            inverse = np.empty(len(self.uniq_src), dtype=np.int64)
            inverse[self.gather_order] = np.arange(len(self.uniq_src))
            self.src_pos = inverse[self.src_pos]
            sorted_owner = owner_of_uniq[self.gather_order]
            self.owner_slice_counts = np.bincount(sorted_owner,
                                                  minlength=num_owners)
            # per-owner subscription lists (local indices at the owner)
            uniq_sorted = self.uniq_src[self.gather_order]
            offs = np.concatenate([[0], np.cumsum(self.owner_slice_counts)])
            self.sub_local = [
                uniq_sorted[offs[j]:offs[j + 1]] // num_owners
                for j in range(num_owners)
            ]
            n_slots = len(self.uniq_src)
            self.metrics["build_sub_sec"] = round(
                time.perf_counter() - _t, 3)
        # fuse the two per-sweep gathers (vals[src_pos] then [scatter_order])
        # into ONE build-time composed index — halves the random-access
        # traffic on the sweep hot path
        self.src_pos_scattered = self.src_pos[self.scatter_order]
        # reusable per-sweep buffers: the gathered value vector and the
        # per-edge contribution vector are the two big allocations of every
        # sweep — np.take(out=) into these avoids fresh page-faulting memory
        # each sweep (float64 paths; label ops cast and take the slow path)
        self._gather_offs = np.concatenate(
            [[0], np.cumsum(self.owner_slice_counts)])
        self._vals_buf = np.empty(n_slots)
        self._contrib_buf = np.empty(self.m)
        self.metrics["uniq_src"] = n_slots

    # -- build helpers ------------------------------------------------------
    def get_m(self) -> int:
        """Canonical edge-row count of this shard (pre-undirected-doubling),
        matching what ``Dataset.count()`` reports on the build input."""
        return int(getattr(self, "m_input", self.m))

    def subscription(self, owner_id: int):
        return self.sub_local[owner_id], self.uniq_dst_local[owner_id]

    def outdeg_contrib(self, owner_id: int):
        """(local_idx, counts) of this shard's edges per source vertex."""
        vids, counts = self._outdeg_by_owner()[owner_id]
        return vids, counts

    def _outdeg_by_owner(self):
        """Per-owner (local_idx, count) out-degree partials; cached for
        the duration of the build.  Dense layout: one ``bincount`` over
        the already-computed slot indexes (no sort at all); compacted
        layout: one unique pass over src, then split by owner (not P
        masked passes)."""
        if getattr(self, "_od_cache", None) is None:
            if getattr(self, "dense_gather", False):
                w = np.bincount(self.src_pos, weights=self.w,
                                minlength=int(self._gather_offs[-1]))
                offs = self._gather_offs
                cache = []
                for j in range(self.P):
                    seg = w[offs[j]:offs[j + 1]]
                    idx = np.flatnonzero(seg)
                    cache.append((idx, seg[idx]))
                self._od_cache = cache
                return self._od_cache
            if self.w is None:
                vids, counts = np.unique(self.src, return_counts=True)
            else:  # weighted: per-source Σw instead of edge counts
                vids, inv = np.unique(self.src, return_inverse=True)
                counts = np.bincount(inv, weights=self.w)
            owner = vids % self.P
            order = np.argsort(owner, kind="stable")
            vids, counts, owner = vids[order], counts[order], owner[order]
            per = np.bincount(owner, minlength=self.P)
            offs = np.concatenate([[0], np.cumsum(per)])
            self._od_cache = [
                (vids[offs[j]:offs[j + 1]] // self.P,
                 counts[offs[j]:offs[j + 1]])
                for j in range(self.P)
            ]
        return self._od_cache

    def build_owner_payloads(self):
        """All per-owner wiring payloads in one call (used with
        ``options(num_returns=P)`` so each owner fetches only its own)."""
        od = self._outdeg_by_owner()
        out = []
        for j in range(self.P):
            out.append((self.sub_local[j], self.uniq_dst_local[j],
                        od[j][0], od[j][1]))
        return tuple(out) if self.P > 1 else out[0]

    # -- incremental recrawl: in-place edge delta ---------------------------
    def src_range(self):
        """(min src, max src) of this shard's current edges (-1, -1 when
        empty) — the driver derives the persistent range-routing
        boundaries for :meth:`apply_delta` from these."""
        return getattr(self, "_src_min", -1), getattr(self, "_src_max", -1)

    def _reconstruct_edges(self):
        """Rebuild (src, dst, w) arrays in scatter order from the composed
        sweep indexes — no raw-edge retention needed (release_raw_edges
        freed them), O(m) gathers only."""
        P = self.P
        dst = np.empty(self.m, dtype=np.int64)
        for j in range(P):
            seg = slice(self.soffs[j], self.soffs[j + 1])
            if self.soffs[j + 1] > self.soffs[j]:
                dst[seg] = self.uniq_dst_local[j][self.dst_compact[seg]] \
                    * P + j
        if getattr(self, "dense_gather", False):
            offs = self._gather_offs
            slot = self.src_pos_scattered
            owner = np.searchsorted(offs, slot, side="right") - 1
            src = (slot - offs[owner]) * P + owner
        else:
            uniq_sorted = self.uniq_src[self.gather_order]
            src = uniq_sorted[self.src_pos_scattered]
        w = self.w_scattered.copy() if self.w_scattered is not None else None
        return src, dst, w

    def apply_delta(self, added, removed) -> int:
        """Patch this shard's edge set in place: drop every edge matching
        a (src, dst) row of ``removed``, append the rows of ``added``
        (``w`` column required iff the mesh is weighted), rebuild the
        local indexes (phase 1).  The driver must then re-run phase 2
        (``build_gather`` + owner rewiring) — see
        ``ShardedGraph.apply_edge_delta``.  Returns the new max vertex id.

        Requires ``canonical_scatter=True`` (row-order-independent index
        build — the property that makes the patched mesh solve
        bit-identical to a cold rebuild) and a directed mesh (the
        undirected doubling would need both directions patched; the
        recrawl loop operates on the directed link graph).
        """
        if not self.canonical_scatter:
            raise ValueError(
                "apply_delta requires a mesh built with "
                "canonical_scatter=True (row-order-independent indexes)")
        if self.undirected:
            raise NotImplementedError(
                "apply_delta supports directed meshes only")
        src, dst, w = self._reconstruct_edges()
        weighted = self.w_scattered is not None

        def _cols(t):
            if t is None or not t.num_rows:
                return (np.empty(0, np.int64), np.empty(0, np.int64),
                        np.empty(0, np.float64))
            s = _to_numpy(t["src"]).astype(np.int64, copy=False)
            d = _to_numpy(t["dst"]).astype(np.int64, copy=False)
            ww = (_to_numpy(t["w"]).astype(np.float64, copy=False)
                  if "w" in t.schema.names else np.empty(0, np.float64))
            return s, d, ww

        removed = [ray.get(t) if isinstance(t, ray.ObjectRef) else t
                   for t in (removed or [])]
        added = [ray.get(t) if isinstance(t, ray.ObjectRef) else t
                 for t in (added or [])]
        r_s = np.concatenate([_cols(t)[0] for t in removed]) if removed \
            else np.empty(0, np.int64)
        r_d = np.concatenate([_cols(t)[1] for t in removed]) if removed \
            else np.empty(0, np.int64)
        a_s = np.concatenate([_cols(t)[0] for t in added]) if added \
            else np.empty(0, np.int64)
        a_d = np.concatenate([_cols(t)[1] for t in added]) if added \
            else np.empty(0, np.int64)
        a_w = None
        if weighted and added:
            a_w = np.concatenate([_cols(t)[2] for t in added])
            if len(a_w) != len(a_s):
                raise ValueError(
                    "weighted mesh delta needs a 'w' column on added edges")

        # merge-based patch: the reconstructed arrays are already in
        # canonical (dst_owner, dst, src) order, so removal is a boolean
        # mask and insertion a searchsorted merge — NO argsort anywhere,
        # the patched arrays go to _finish_load presorted (O(m + k·log)
        # total vs the cold build's O(m·log m) scatter sort)
        P = np.int64(self.P)
        span = np.int64(int(max(dst.max(initial=0), a_d.max(initial=0),
                                r_d.max(initial=0))) + 1)
        span_s = np.int64(int(max(src.max(initial=0), a_s.max(initial=0),
                                  r_s.max(initial=0))) + 1)
        if int(P) * int(span) * int(span_s) >= 2 ** 63:
            raise NotImplementedError(
                "apply_delta packed-key span exceeds int64")

        def _key(s, d):
            return ((d % P) * span + d) * span_s + s

        key = _key(src, dst)            # ascending by construction
        if len(r_s):
            # key is sorted: membership = one searchsorted over the
            # (small, sorted) removal keys — np.isin would argsort the
            # whole concatenation, reintroducing the O(m log m) we
            # removed from the build
            rk = np.sort(_key(r_s, r_d))
            idx = np.minimum(np.searchsorted(rk, key), len(rk) - 1)
            keep = rk[idx] != key
            src, dst, key = src[keep], dst[keep], key[keep]
            if w is not None:
                w = w[keep]
        if len(a_s):
            akey = _key(a_s, a_d)
            aorder = np.argsort(akey, kind="stable")
            a_s, a_d, akey = a_s[aorder], a_d[aorder], akey[aorder]
            pos = np.searchsorted(key, akey)
            if weighted:
                # bit-exact guard (ADVICE r4): on a weighted mesh,
                # duplicate (src, dst) rows with different weights tie
                # under the canonical key, and the cold build's STABLE
                # sort orders ties by input row order — which a merge
                # patch cannot reproduce.  Unweighted duplicate rows are
                # byte-identical either way; weighted duplicate-key adds
                # are rejected so the documented cold-rebuild parity
                # guarantee never silently degrades to last-ulp drift.
                dup_existing = (pos < len(key)) & (key[np.minimum(
                    pos, len(key) - 1)] == akey) if len(key) else \
                    np.zeros(len(akey), dtype=bool)
                dup_within = np.zeros(len(akey), dtype=bool)
                dup_within[1:] = akey[1:] == akey[:-1]
                if dup_existing.any() or dup_within.any():
                    raise ValueError(
                        "apply_delta on a weighted mesh requires distinct "
                        "(src, dst) keys among added edges and vs the "
                        "existing edge set: duplicate keys tie under the "
                        "canonical scatter order, breaking bit-exact "
                        "parity with a cold rebuild. Pre-aggregate "
                        "duplicate weighted edges (e.g. sum w per "
                        "(src, dst)) or remove the old row first.")
            src = np.insert(src, pos, a_s)
            dst = np.insert(dst, pos, a_d)
            if weighted:
                w = np.insert(w, pos, a_w[aorder])
        return self._finish_load(src, dst, w, undirected=False,
                                 presorted=True)

    def release_raw_edges(self) -> None:
        """Drop the raw src/dst arrays (and the build-time out-degree
        cache) once owner wiring is done — sweeps only touch the composed
        indexes, and the freed ~16 bytes/edge matters on memory-ballooned
        hosts and at 10^9-edge shard sizes."""
        self.src = None
        self.dst = None
        self.w = None            # w_scattered stays — sweeps use it
        self._od_cache = None

    def get_metrics(self) -> dict:
        return {"shard": self.e, **self.metrics}

    def exchange_profile(self) -> dict:
        """Wire-volume introspection for the multi-raylet rehearsal
        (r5): the exact bytes this shard EMITS per sweep — one partial
        array per destination owner, sized by that owner's unique-dst
        footprint in this shard — plus the raylet this actor landed on,
        so cross-node bytes are attributable pair by pair."""
        import ray as _r
        return {"shard": self.e,
                "node": _r.get_runtime_context().get_node_id(),
                "partial_bytes_to_owner": [
                    int(len(self.uniq_dst_local[j]) * 8)
                    for j in range(self.P)]}

    # -- sweeps -------------------------------------------------------------
    def _gathered(self, value_slices) -> np.ndarray:
        if not value_slices:
            return np.zeros(0)
        if self.gather_mode == "full":
            first = np.asarray(value_slices[0])
            if getattr(self, "dense_gather", False):
                # dense direct layout: the concatenated owner vectors ARE
                # the gather vector — P contiguous slice copies, no index
                # arrays touched (float64 reuses the preallocated buffer)
                if first.dtype == np.float64:
                    buf, offs = self._vals_buf, self._gather_offs
                    for j, v in enumerate(value_slices):
                        buf[offs[j]:offs[j + 1]] = np.asarray(v)
                    return buf
                return np.concatenate(
                    [np.asarray(v) for v in value_slices])
            # compacted layout: slice each full per-owner vector to this
            # shard's subscription locally (plasma gives zero-copy views);
            # float64 values reuse the preallocated gather buffer
            if first.dtype == np.float64:
                buf, offs = self._vals_buf, self._gather_offs
                for j, v in enumerate(value_slices):
                    np.take(np.asarray(v), self.sub_local[j],
                            out=buf[offs[j]:offs[j + 1]])
                return buf
            return np.concatenate([
                np.asarray(v)[self.sub_local[j]]
                for j, v in enumerate(value_slices)
            ])
        return np.concatenate([np.asarray(v) for v in value_slices])

    def pagerank_partials(self, *value_slices: np.ndarray):
        """contrib = rr[src]; local combine by dst → one partial array per
        destination owner (aligned with uniq_dst_local)."""
        t0 = time.perf_counter()
        vals = self._gathered(value_slices)
        if vals.dtype == np.float64 and len(self._contrib_buf) == self.m:
            contrib = np.take(vals, self.src_pos_scattered,
                              out=self._contrib_buf)
        else:
            contrib = vals[self.src_pos_scattered]
        if self.w_scattered is not None:
            # weighted PageRank: contribution = r[src]·w / Σ_out w (the
            # owner-side value already divides by the weighted out-degree)
            contrib = np.multiply(
                contrib, self.w_scattered,
                out=contrib if contrib is self._contrib_buf else None)
        out = []
        for j in range(self.P):
            seg = slice(self.soffs[j], self.soffs[j + 1])
            if self.soffs[j + 1] == self.soffs[j]:
                out.append(np.zeros(0))
                continue
            out.append(np.bincount(self.dst_compact[seg], weights=contrib[seg],
                                   minlength=len(self.uniq_dst_local[j])))
        self.metrics["sweep_seconds"] += time.perf_counter() - t0
        return tuple(out) if self.P > 1 else out[0]

    def min_label_partials(self, *label_slices: np.ndarray):
        """per-dst minimum of source labels, per destination owner."""
        labels = self._gathered(label_slices).astype(np.int64)
        vals = labels[self.src_pos_scattered]
        out = []
        for j in range(self.P):
            seg = slice(self.soffs[j], self.soffs[j + 1])
            size = len(self.uniq_dst_local[j])
            if self.soffs[j + 1] == self.soffs[j]:
                out.append(np.full(0, np.iinfo(np.int64).max))
                continue
            mins = np.full(size, np.iinfo(np.int64).max)
            np.minimum.at(mins, self.dst_compact[seg], vals[seg])
            out.append(mins)
        return tuple(out) if self.P > 1 else out[0]

    def minplus_partials(self, *dist_slices: np.ndarray):
        """per-dst minimum of (source distance + edge weight), per
        destination owner — the weighted-SSSP relax partial.  Weight
        defaults to 1.0 per edge when the mesh was built without a
        weight column (hop distances in float)."""
        d = self._gathered(dist_slices)
        vals = d[self.src_pos_scattered]
        vals = vals + (self.w_scattered if self.w_scattered is not None
                       else 1.0)
        out = []
        for j in range(self.P):
            seg = slice(self.soffs[j], self.soffs[j + 1])
            size = len(self.uniq_dst_local[j])
            if self.soffs[j + 1] == self.soffs[j]:
                out.append(np.full(0, np.inf))
                continue
            mins = np.full(size, np.inf)
            np.minimum.at(mins, self.dst_compact[seg], vals[seg])
            out.append(mins)
        return tuple(out) if self.P > 1 else out[0]

    def lane_sum_partials(self, *value_matrices):
        """K-lane plain-sum gather-scatter (sharded Brandes): per owner,
        either the whole ``(n_local, K)`` float64 state matrix (full
        gather — rows are sliced to this shard's subscription locally)
        or the pre-sliced ``(len(sub), K)`` subscription rows (subscribe
        gather — the multi-node path, shipped by
        ``RankOwner.lane_slices_all``); the shard returns
        per-destination-owner ``(len(uniq_dst_local), K)`` partial-sum
        matrices — K bincount passes over the same composed indexes the
        1-lane sweeps use, so transient memory stays O(m) per lane,
        never O(m·K)."""
        t0 = time.perf_counter()
        mats = [np.asarray(v) for v in value_matrices]
        K = mats[0].shape[1]
        if self.gather_mode != "full":
            # subscribe: owners already sliced to this shard's rows
            V = np.concatenate(mats, axis=0)
        elif getattr(self, "dense_gather", False):
            V = np.concatenate(mats, axis=0)
        else:
            V = np.concatenate(
                [m[self.sub_local[j]] for j, m in enumerate(mats)], axis=0)
        VT = np.ascontiguousarray(V.T)   # lane-major: contiguous columns
        out = []
        for j in range(self.P):
            seg = slice(self.soffs[j], self.soffs[j + 1])
            size = len(self.uniq_dst_local[j])
            if self.soffs[j + 1] == self.soffs[j]:
                out.append(np.zeros((0, K)))
                continue
            dc = self.dst_compact[seg]
            sp = self.src_pos_scattered[seg]
            part = np.empty((size, K))
            for k in range(K):
                part[:, k] = np.bincount(dc, weights=VT[k][sp],
                                         minlength=size)
            out.append(part)
        self.metrics["sweep_seconds"] += time.perf_counter() - t0
        return tuple(out) if self.P > 1 else out[0]

    def mode_label_partials(self, *label_slices: np.ndarray):
        """(dst_local_idx, label, count) triplets per destination owner —
        the pre-aggregated histogram shuffle for label propagation."""
        labels = self._gathered(label_slices).astype(np.int64)
        vals = labels[self.src_pos_scattered]
        out = []
        for j in range(self.P):
            seg = slice(self.soffs[j], self.soffs[j + 1])
            if self.soffs[j + 1] == self.soffs[j]:
                z = np.zeros(0, dtype=np.int64)
                out.append((z, z, z))
                continue
            d = self.dst_compact[seg]
            l = vals[seg]
            order = np.lexsort((l, d))
            d, l = d[order], l[order]
            boundary = np.ones(len(d), dtype=bool)
            boundary[1:] = (d[1:] != d[:-1]) | (l[1:] != l[:-1])
            group = np.cumsum(boundary) - 1
            counts = np.bincount(group).astype(np.int64)
            local = self.uniq_dst_local[j][d[boundary]]
            out.append((local, l[boundary], counts))
        return tuple(out) if self.P > 1 else out[0]
