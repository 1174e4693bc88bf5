"""Single-process NumPy oracles for the graph operators (SURVEY.md §5).

Used only by tests and fixture generation — never in the distributed path.
``pagerank`` reproduces the reference CPU power iteration's observable
semantics step for step (backend/cuda/pagerank_gpu.cu:137-191): dangling
mass measured on the in-vector each sweep, update
``r' = α·(P·r + dangling_mass/n) + (1-α)/n``, L1 stopping rule checked
*after* the sweep, and a final sum-normalize.

The CC / LP / triangle oracles define the deterministic semantics the
distributed implementations must match exactly (BASELINE.json north_rule);
the reference has no such operators, so the spec here is the contract.
"""

from __future__ import annotations

import math

import numpy as np


def n_from_edges(edges: np.ndarray) -> int:
    """Vertex-count convention of the reference loader: ``max_id + 1``
    (backend/cuda/pagerank_gpu.cu:65)."""
    if len(edges) == 0:
        return 0
    return int(edges.max()) + 1


def pagerank(edges: np.ndarray, n: int | None = None, alpha: float = 0.85,
             tol: float = 1e-8, max_iter: int = 100,
             dangling_mode: str = "distribute", r0: np.ndarray | None = None):
    """Power iteration with dangling redistribution; returns (ranks, sweeps,
    residual).  Semantics of backend/cuda/pagerank_gpu.cu:137-191.
    ``r0`` optionally seeds the iteration (warm-start twin; default
    uniform 1/n)."""
    if n is None:
        n = n_from_edges(edges)
    if n == 0:
        return np.zeros(0), 0, 0.0
    src = edges[:, 0].astype(np.int64)
    dst = edges[:, 1].astype(np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    dangling = outdeg == 0
    live = outdeg[src] > 0           # always true for src, but mirrors build_P
    src, dst = src[live], dst[live]
    inv_out = np.zeros(n)
    nz = outdeg > 0
    inv_out[nz] = 1.0 / outdeg[nz]

    r = np.full(n, 1.0 / n) if r0 is None else np.asarray(r0, np.float64).copy()
    teleport = (1.0 - alpha) / n
    sweeps, delta = 0, np.inf
    for it in range(max_iter):
        dangling_mass = r[dangling].sum() if dangling_mode == "distribute" else 0.0
        contrib = r[src] * inv_out[src]
        y = np.bincount(dst, weights=contrib, minlength=n)
        r_new = alpha * (y + dangling_mass / n) + teleport
        delta = np.abs(r_new - r).sum()
        r = r_new
        sweeps = it + 1
        if delta < tol:
            break
    total = r.sum()
    if total > 0:
        r = r / total
    return r, sweeps, float(delta)


def weighted_pagerank(edges: np.ndarray, w: np.ndarray,
                      n: int | None = None, alpha: float = 0.85,
                      tol: float = 1e-8, max_iter: int = 100):
    """Weighted power iteration: ``contrib = r[src]·w / Σ_out w``; dangling
    = zero out-weight (= no out-edges for positive w).  Returns (ranks,
    sweeps, residual)."""
    if n is None:
        n = n_from_edges(edges)
    if n == 0:
        return np.zeros(0), 0, 0.0
    src = edges[:, 0].astype(np.int64)
    dst = edges[:, 1].astype(np.int64)
    w = np.asarray(w, dtype=np.float64)
    outw = np.bincount(src, weights=w, minlength=n)
    dangling = outw == 0
    inv_out = np.zeros(n)
    nz = outw > 0
    inv_out[nz] = 1.0 / outw[nz]

    r = np.full(n, 1.0 / n)
    teleport = (1.0 - alpha) / n
    sweeps, delta = 0, np.inf
    for it in range(max_iter):
        dangling_mass = r[dangling].sum()
        contrib = r[src] * inv_out[src] * w
        y = np.bincount(dst, weights=contrib, minlength=n)
        r_new = alpha * (y + dangling_mass / n) + teleport
        delta = np.abs(r_new - r).sum()
        r = r_new
        sweeps = it + 1
        if delta < tol:
            break
    total = r.sum()
    if total > 0:
        r = r / total
    return r, sweeps, float(delta)


def personalized_pagerank(edges: np.ndarray, seeds: np.ndarray,
                          weights: np.ndarray | None = None,
                          n: int | None = None, alpha: float = 0.85,
                          tol: float = 1e-8, max_iter: int = 100):
    """Personalized PageRank: ``r' = α·(P·r + dm·w) + (1-α)·w`` with
    ``r0 = w`` (w = seed distribution, normalized); dangling mass lands on
    w.  Returns (ranks, sweeps, residual)."""
    if n is None:
        n = n_from_edges(edges)
    if n == 0:
        return np.zeros(0), 0, 0.0
    seeds = np.asarray(seeds, dtype=np.int64)
    w = np.zeros(n)
    if weights is None:
        w[seeds] = 1.0 / len(seeds)
    else:
        w[seeds] = np.asarray(weights, dtype=np.float64)
        w = w / w.sum()
    src = edges[:, 0].astype(np.int64)
    dst = edges[:, 1].astype(np.int64)
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    dangling = outdeg == 0
    inv_out = np.zeros(n)
    nz = outdeg > 0
    inv_out[nz] = 1.0 / outdeg[nz]

    r = w.copy()
    sweeps, delta = 0, np.inf
    for it in range(max_iter):
        dangling_mass = r[dangling].sum()
        contrib = r[src] * inv_out[src]
        y = np.bincount(dst, weights=contrib, minlength=n)
        r_new = alpha * (y + dangling_mass * w) + (1.0 - alpha) * w
        delta = np.abs(r_new - r).sum()
        r = r_new
        sweeps = it + 1
        if delta < tol:
            break
    total = r.sum()
    if total > 0:
        r = r / total
    return r, sweeps, float(delta)


def hits(edges: np.ndarray, n: int | None = None, max_iter: int = 20):
    """HITS with per-half-sweep L2 normalization, h0 = 1/√n.
    Returns (auth, hub)."""
    if n is None:
        n = n_from_edges(edges)
    if n == 0:
        return np.zeros(0), np.zeros(0)
    src = edges[:, 0].astype(np.int64)
    dst = edges[:, 1].astype(np.int64)
    h = np.full(n, 1.0 / math.sqrt(n))
    a = np.zeros(n)
    for _ in range(max_iter):
        a = np.bincount(dst, weights=h[src], minlength=n)
        norm = np.sqrt((a * a).sum())
        if norm > 0:
            a /= norm
        h = np.bincount(src, weights=a[dst], minlength=n)
        norm = np.sqrt((h * h).sum())
        if norm > 0:
            h /= norm
    return a, h


def k_core(edges: np.ndarray, k: int, n: int | None = None) -> np.ndarray:
    """k-core membership (0/1) by peeling on the undirected simple graph."""
    if n is None:
        n = n_from_edges(edges)
    if n == 0:
        return np.zeros(0, dtype=np.int64)
    e = edges[edges[:, 0] != edges[:, 1]]
    u = np.minimum(e[:, 0], e[:, 1]).astype(np.int64)
    v = np.maximum(e[:, 0], e[:, 1]).astype(np.int64)
    packed = np.unique(u * (n + 1) + v)
    u, v = packed // (n + 1), packed % (n + 1)
    alive = np.ones(n, dtype=bool)
    while True:
        keep = alive[u] & alive[v]
        deg = (np.bincount(u[keep], minlength=n)
               + np.bincount(v[keep], minlength=n))
        new_alive = alive & (deg >= k)
        if np.array_equal(new_alive, alive):
            return new_alive.astype(np.int64)
        alive = new_alive


def strongly_connected_components(edges: np.ndarray,
                                  n: int | None = None) -> np.ndarray:
    """SCC labels (min vid per component), iterative Tarjan."""
    if n is None:
        n = n_from_edges(edges)
    adj: list[list[int]] = [[] for _ in range(n)]
    for u, v in edges:
        adj[int(u)].append(int(v))
    index = np.full(n, -1, dtype=np.int64)
    low = np.zeros(n, dtype=np.int64)
    on_stack = np.zeros(n, dtype=bool)
    comp = np.full(n, -1, dtype=np.int64)
    stack: list[int] = []
    counter = 0
    for root in range(n):
        if index[root] != -1:
            continue
        # iterative Tarjan: work stack holds (vertex, next-child index)
        work = [(root, 0)]
        while work:
            v, ci = work[-1]
            if ci == 0:
                index[v] = low[v] = counter
                counter += 1
                stack.append(v)
                on_stack[v] = True
            advanced = False
            while ci < len(adj[v]):
                w = adj[v][ci]
                ci += 1
                if index[w] == -1:
                    work[-1] = (v, ci)
                    work.append((w, 0))
                    advanced = True
                    break
                if on_stack[w]:
                    low[v] = min(low[v], index[w])
            if advanced:
                continue
            work.pop()
            if low[v] == index[v]:
                members = []
                while True:
                    w = stack.pop()
                    on_stack[w] = False
                    members.append(w)
                    if w == v:
                        break
                comp[members] = min(members)
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
    return comp


def bfs_distances(edges: np.ndarray, source: int,
                  n: int | None = None) -> np.ndarray:
    """Directed single-source BFS hop distances; unreached = -1."""
    if n is None:
        n = n_from_edges(edges)
    dist = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return dist
    adj: list[list[int]] = [[] for _ in range(n)]
    for u, v in edges:
        adj[int(u)].append(int(v))
    dist[source] = 0
    frontier = [source]
    d = 0
    while frontier:
        d += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if dist[v] == -1:
                    dist[v] = d
                    nxt.append(v)
        frontier = nxt
    return dist


def undirected_adj(edges: np.ndarray, n: int) -> list[set[int]]:
    adj: list[set[int]] = [set() for _ in range(n)]
    for u, v in edges:
        if u != v:
            adj[int(u)].add(int(v))
            adj[int(v)].add(int(u))
    return adj


def connected_components(edges: np.ndarray, n: int | None = None) -> np.ndarray:
    """Iterative min-label propagation on the undirected view until no
    change; label(v) converges to min vid of v's component (exact)."""
    if n is None:
        n = n_from_edges(edges)
    labels = np.arange(n, dtype=np.int64)
    if len(edges) == 0:
        return labels
    u = edges[:, 0].astype(np.int64)
    v = edges[:, 1].astype(np.int64)
    while True:
        new = labels.copy()
        # neighbor minimum along both directions
        np.minimum.at(new, v, labels[u])
        np.minimum.at(new, u, labels[v])
        if np.array_equal(new, labels):
            return labels
        labels = new


def label_propagation(edges: np.ndarray, n: int | None = None,
                      max_iter: int = 10) -> np.ndarray:
    """Synchronous label propagation, deterministic.

    Contract (north_rule "label propagation community detection", exact):
    labels init to vid; each sweep every vertex adopts the most frequent
    label among its undirected neighbors' *previous* labels, ties broken by
    the minimum label; isolated vertices keep their label; stop at
    fixpoint or after ``max_iter`` sweeps.
    """
    if n is None:
        n = n_from_edges(edges)
    labels = np.arange(n, dtype=np.int64)
    adj = undirected_adj(edges, n)
    for _ in range(max_iter):
        new = labels.copy()
        for v in range(n):
            if not adj[v]:
                continue
            counts: dict[int, int] = {}
            for w in adj[v]:
                lab = int(labels[w])
                counts[lab] = counts.get(lab, 0) + 1
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def triangle_counts(edges: np.ndarray, n: int | None = None) -> np.ndarray:
    """Exact per-vertex triangle counts on the undirected simple graph
    (self-loops and duplicate/reciprocal edges collapse to one edge)."""
    if n is None:
        n = n_from_edges(edges)
    counts = np.zeros(n, dtype=np.int64)
    und = set()
    for u, v in edges:
        u, v = int(u), int(v)
        if u == v:
            continue
        und.add((min(u, v), max(u, v)))
    deg = np.zeros(n, dtype=np.int64)
    for u, v in und:
        deg[u] += 1
        deg[v] += 1
    # orient low (deg, id) → high (deg, id); N+ bounded by O(sqrt(m))
    fwd: list[list[int]] = [[] for _ in range(n)]
    for u, v in und:
        a, b = (u, v) if (deg[u], u) < (deg[v], v) else (v, u)
        fwd[a].append(b)
    und_set = und
    for a in range(n):
        nb = sorted(fwd[a], key=lambda x: (deg[x], x))
        for i in range(len(nb)):
            for j in range(i + 1, len(nb)):
                b, c = nb[i], nb[j]
                if (min(b, c), max(b, c)) in und_set:
                    counts[a] += 1
                    counts[b] += 1
                    counts[c] += 1
    return counts


def bowtie_regions(edges: np.ndarray, n: int | None = None) -> np.ndarray:
    """Per-vertex bow-tie region (graph/bowtie.py contract): array of
    strings in {CORE, IN, OUT, TENDRIL, DISCONNECTED}.  CORE = largest
    SCC (ties by min label); reachability sides are BFS from/to the
    CORE's min-vid representative; TENDRIL = same weak component as
    CORE but not CORE/IN/OUT."""
    if n is None:
        n = n_from_edges(edges)
    if n == 0:
        return np.empty(0, dtype=object)
    scc = strongly_connected_components(edges, n)
    labs, counts = np.unique(scc, return_counts=True)
    core = int(labs[np.lexsort((labs, -counts))[0]])
    fwd = bfs_distances(edges, core, n)
    rev = edges[:, ::-1] if len(edges) else edges
    bwd = bfs_distances(rev, core, n)
    wcc = connected_components(edges, n)
    region = np.select(
        [scc == core, bwd >= 0, fwd >= 0, wcc == wcc[core]],
        ["CORE", "IN", "OUT", "TENDRIL"],
        default="DISCONNECTED")
    return region


def salsa(edges: np.ndarray, n: int | None = None, max_iter: int = 20):
    """SALSA authority/hub scores (graph/engine.salsa contract): power
    iteration of the two-step bipartite walks over the DISTINCT directed
    edge set, L1-renormalized per sweep, from uniform.  Returns
    ``(auth, hub)``."""
    if n is None:
        n = n_from_edges(edges)
    if n == 0:
        return np.zeros(0), np.zeros(0)
    dist = np.unique(edges[:, :2].astype(np.int64), axis=0) \
        if len(edges) else np.empty((0, 2), dtype=np.int64)
    src, dst = dist[:, 0], dist[:, 1]
    outdeg = np.bincount(src, minlength=n).astype(np.float64)
    indeg = np.bincount(dst, minlength=n).astype(np.float64)

    def _scale(x, deg):
        out = np.zeros(n)
        nz = deg > 0
        out[nz] = x[nz] / deg[nz]
        return out

    a = np.full(n, 1.0 / n)
    h = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        tmp = np.bincount(src, weights=_scale(a, indeg)[dst], minlength=n)
        a_new = np.bincount(dst, weights=_scale(tmp, outdeg)[src],
                            minlength=n)
        s = a_new.sum()
        a = a_new / s if s > 0 else a_new
        tmp2 = np.bincount(dst, weights=_scale(h, outdeg)[src], minlength=n)
        h_new = np.bincount(src, weights=_scale(tmp2, indeg)[dst],
                            minlength=n)
        s = h_new.sum()
        h = h_new / s if s > 0 else h_new
    return a, h
