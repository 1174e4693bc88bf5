"""Similarity search over embedding columns (task brief: ANN first-class).

Baseline: brute-force cosine top-k — the query matrix is broadcast once via
``ray.put`` and every batch does one numpy matmul + partial top-k; a final
tiny per-query merge produces exact global top-k.  Scale paths:
LSH-bucketed search via :func:`bucketed_topk` (probes only matching
hyperplane buckets) and coarse-quantizer IVF via :func:`ivf_topk`
(seeded spherical k-means centroids trained on a deterministic sample,
candidates restricted to the ``nprobe`` nearest inverted lists).
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa
import ray


def brute_force_topk(emb_ds, queries: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", emb_col: str = "embedding",
                     concurrency=None):
    """Exact cosine top-k per query row of ``queries`` (nq × d).

    Returns (query_id, id, cosine), exactly k rows per query (ties broken
    by lowest id for determinism).

    Runs as plain ``map_batches`` tasks, not an actor pool: the only
    stage state is the normalized query matrix, which is broadcast once
    via ``ray.put`` and fetched zero-copy from local plasma per batch.
    Actor pools here were both slower (5-17 s pool spin-up per query)
    and deadlock-prone on small sessions (a pool sized to every CPU of
    a 4-CPU driver starves the upstream read).  ``concurrency`` is
    accepted for back-compat and ignored.
    """
    q = np.asarray(queries, dtype=np.float64)
    norms = np.linalg.norm(q, axis=1)
    norms[norms == 0] = 1.0
    query_ref = ray.put(q / norms[:, None])    # (nq, d), normalized once

    def _partial(batch: pd.DataFrame) -> pd.DataFrame:
        qn = ray.get(query_ref)                # zero-copy local plasma read
        ids = batch[id_col].to_numpy()
        mat = np.asarray([np.asarray(v, dtype=np.float64)
                          for v in batch[emb_col]])
        mnorms = np.linalg.norm(mat, axis=1)
        mnorms[mnorms == 0] = 1.0
        mat = mat / mnorms[:, None]
        sims = qn @ mat.T                      # (nq, batch)
        kk = min(k, sims.shape[1])
        part = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
        out_q, out_id, out_s = [], [], []
        for qi in range(sims.shape[0]):
            sel = part[qi]
            out_q.extend([qi] * len(sel))
            out_id.extend(ids[sel])
            out_s.extend(sims[qi, sel])
        return pd.DataFrame({"query_id": np.asarray(out_q, dtype=np.int64),
                             id_col: out_id,
                             "cosine": out_s})

    partials = emb_ds.map_batches(_partial, batch_format="pandas")

    def _merge(g: pd.DataFrame) -> pd.DataFrame:
        top = heapq.nsmallest(
            k, g.itertuples(index=False),
            key=lambda r: (-r.cosine, getattr(r, id_col)))
        return pd.DataFrame(top, columns=g.columns)

    return partials.groupby("query_id").map_groups(_merge,
                                                   batch_format="pandas")


#: fixed-point scale for the exact-integer sign hash: multiplying a
#: double by 2^20 only shifts the exponent, so quantization is exact
_QUANT = 1 << 20


def _int_planes(dim: int, num_planes: int, seed: int) -> np.ndarray:
    """Exact-integer md5-derived hyperplanes for the sign-LSH bucket:
    ``p[i, j] = md5_32(f"{seed}:{i}:{j}") % 2001 - 1000`` (the module's
    standard first-8-hex-digits hash).  Integer entries make the sign
    ``sum_i floor(v_i·2^20)·p[i,j] > 0`` EXACT int64 arithmetic — no
    float-summation-order ambiguity between engines, so a SQL oracle
    reproduces every bucket bit-for-bit (unlike gaussian planes, whose
    near-zero dots could flip sign under a different fold order)."""
    from .stats import _bulk_md5_upper_be
    keys = np.array([f"{i}:{j}" for i in range(dim)
                     for j in range(num_planes)])
    h = _bulk_md5_upper_be(keys, [f"{seed}:"])[0]
    v = ((h >> np.uint64(32)).astype(np.int64) % 2001) - 1000
    return v.reshape(dim, num_planes)


def _int_buckets(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-LSH bucket per row of ``mat``: quantize to int64 at 2^20,
    integer matmul against the planes, pack the sign bits."""
    q = np.floor(mat.astype(np.float64) * _QUANT).astype(np.int64)
    dots = q @ planes                          # exact int64
    bits = (dots > 0).astype(np.uint64)
    return (bits << np.arange(planes.shape[1], dtype=np.uint64)).sum(axis=1)


def bucketed_topk(emb_ds, queries: np.ndarray, k: int = 10,
                  id_col: str = "vec_id", emb_col: str = "embedding",
                  num_planes: int = 6, probes: int = 2, seed: int = 5,
                  concurrency=None):
    """Approximate top-k: search only vectors whose hyperplane-sign bucket
    is within ``probes`` bit-flips of the query's bucket (multi-probe LSH).
    At corpus scale this touches ~``(Σ C(planes, i≤probes)) / 2^planes``
    of the data instead of all of it.

    The hash family is :func:`_int_planes` — md5-derived integer planes
    over 2^20-quantized vectors — so candidate selection is exact
    integer arithmetic and a DuckDB oracle reproduces it bit-for-bit
    (``__ray_entry__`` ``bucketed_topk`` twin)."""
    import itertools

    queries = np.asarray(queries, dtype=np.float64)
    dim = queries.shape[1]
    planes = _int_planes(dim, num_planes, seed)

    probe_sets = []
    for base in _int_buckets(queries, planes):
        buckets = {int(base)}
        for r in range(1, probes + 1):
            for flips in itertools.combinations(range(num_planes), r):
                b = int(base)
                for f in flips:
                    b ^= 1 << f
                buckets.add(b)
        probe_sets.append(buckets)
    wanted = set().union(*probe_sets) if probe_sets else set()
    wanted_ref = ray.put(np.fromiter(sorted(wanted), dtype=np.uint64,
                                     count=len(wanted)))
    planes_ref = ray.put(planes)

    def _filter(batch: pd.DataFrame) -> pd.DataFrame:
        pl = ray.get(planes_ref)
        want = ray.get(wanted_ref)
        mat = np.asarray([np.asarray(v, dtype=np.float64)
                          for v in batch[emb_col]])
        keep = np.isin(_int_buckets(mat, pl), want)
        return batch[keep]

    candidates = emb_ds.map_batches(_filter, batch_format="pandas")
    return brute_force_topk(candidates, queries, k, id_col, emb_col,
                            concurrency)


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    return mat / norms[:, None]


def train_centroids(emb_ds, n_centroids: int = 16,
                    id_col: str = "vec_id", emb_col: str = "embedding",
                    sample_mod: int | None = None, iters: int = 10,
                    seed: int = 5,
                    max_train_vectors: int = 262_144) -> np.ndarray:
    """Seeded spherical k-means coarse quantizer for :func:`ivf_topk`.

    The driver pull is bounded BY CONSTRUCTION (ADVICE r4 — the old
    ``sample_mod=1`` default collected the full embedding table into the
    driver heap): when the streamed row count exceeds
    ``max_train_vectors``, training selects exactly that many rows by
    md5-rank — the globally smallest ``md5(f"{seed}:{id}")`` buckets,
    the repo's deterministic key-stable sampling rule — via a NARROW
    top-k over (bucket, id) columns only (embeddings never enter the
    shuffle), then a broadcast-membership second pass fetches just the
    winning rows.  Deterministic for a given (seed, id set, bound),
    independent of partitioning and row order.

    ``sample_mod`` is the legacy explicit knob (``id % sample_mod == 0``)
    and bypasses the bound for callers that size it themselves.
    Assignment is by max cosine on unit vectors; empty clusters keep
    their previous centroid, so the result is deterministic for a given
    (seed, sample, n_centroids).
    """
    if sample_mod is not None and sample_mod > 1:
        sample_ds = emb_ds.map_batches(
            lambda b, _m=sample_mod: b[b[id_col] % _m == 0],
            batch_format="pandas")
    elif sample_mod is None and emb_ds.count() > max_train_vectors:
        import pyarrow as pa

        from .relational import topk
        from .sampling import _bucket32

        def _buckets(t: pa.Table) -> pa.Table:
            ids = t[id_col].to_numpy(zero_copy_only=False)
            return pa.table({
                id_col: t[id_col].combine_chunks(),
                "_b": pa.array(_bucket32(seed, ids), pa.int64())})

        win = topk(emb_ds.select_columns([id_col]).map_batches(
            _buckets, batch_format="pyarrow"),
            ["_b", id_col], max_train_vectors,
            descending=[False, False]).to_pandas()
        want = np.sort(win[id_col].to_numpy())
        want_ref = ray.put(want)

        def _members(b: pd.DataFrame) -> pd.DataFrame:
            w = ray.get(want_ref)            # zero-copy plasma read
            ids = b[id_col].to_numpy()
            pos = np.minimum(np.searchsorted(w, ids), len(w) - 1)
            return b[w[pos] == ids]

        sample_ds = emb_ds.map_batches(_members, batch_format="pandas")
    else:
        sample_ds = emb_ds
    sample = sample_ds.take_all()
    # Block arrival order is not deterministic under streaming execution
    # (preserve_order is off); sort by id so training is reproducible.
    sample.sort(key=lambda r: r[id_col])
    x = _normalize_rows(np.asarray(
        [np.asarray(r[emb_col], dtype=np.float64) for r in sample]))
    if len(x) == 0:
        raise ValueError("train_centroids: empty training sample")
    k = min(n_centroids, len(x))
    rng = np.random.RandomState(seed)
    cents = x[rng.choice(len(x), size=k, replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(x @ cents.T, axis=1)
        for c in range(k):
            members = x[assign == c]
            if len(members):
                m = members.sum(axis=0)
                nrm = np.linalg.norm(m)
                if nrm > 0:
                    cents[c] = m / nrm
    return cents


def ivf_topk(emb_ds, queries: np.ndarray, k: int = 10,
             id_col: str = "vec_id", emb_col: str = "embedding",
             n_centroids: int = 16, nprobe: int = 4, seed: int = 5,
             sample_mod: int | None = None, train_iters: int = 10,
             centroids: np.ndarray | None = None, concurrency=None,
             max_train_vectors: int = 262_144):
    """IVF approximate top-k: restrict the exact search to the union of
    each query's ``nprobe`` nearest centroid cells (coarse quantizer =
    :func:`train_centroids`).  Scans ~``nprobe / n_centroids`` of the
    corpus per query batch; with ``nprobe == n_centroids`` it is exactly
    :func:`brute_force_topk`.  Pass a precomputed ``centroids`` matrix to
    amortize training across query batches (the at-scale usage)."""
    queries = np.asarray(queries, dtype=np.float64)
    if centroids is None:
        centroids = train_centroids(emb_ds, n_centroids, id_col, emb_col,
                                    sample_mod, train_iters, seed,
                                    max_train_vectors=max_train_vectors)
    cents = _normalize_rows(np.asarray(centroids, dtype=np.float64))
    nprobe = min(nprobe, len(cents))
    qn = _normalize_rows(queries)
    sims = qn @ cents.T                       # (nq, k)
    probe = np.unique(
        np.argpartition(-sims, nprobe - 1, axis=1)[:, :nprobe])
    if len(probe) >= len(cents):
        candidates = emb_ds                   # probing every cell: no filter
    else:
        # Plain-task filter over broadcast centroids/probe set (zero-copy
        # plasma reads per batch) — same no-actor-pool rationale as
        # brute_force_topk.
        cents_ref = ray.put(cents)
        probe_ref = ray.put(probe)

        def _ivf_filter(batch: pd.DataFrame) -> pd.DataFrame:
            c = ray.get(cents_ref)
            p = ray.get(probe_ref)
            mat = _normalize_rows(np.asarray(
                [np.asarray(v, dtype=np.float64) for v in batch[emb_col]]))
            assign = np.argmax(mat @ c.T, axis=1)
            return batch[np.isin(assign, p)]

        candidates = emb_ds.map_batches(_ivf_filter, batch_format="pandas")
    return brute_force_topk(candidates, queries, k, id_col, emb_col,
                            concurrency)


def embedding_covariance(emb_ds, id_col: str = "vec_id",
                         emb_col: str = "embedding",
                         round_dp: int | None = 6):
    """Population covariance of the embedding columns — the statistics
    pass of embedding whitening / PCA at corpus scale.

    Per-block partials ``(n, Σx, ΣxxT)`` (one vectorized matmul per
    batch) fold to a single (d, d) matrix — the driver holds d² floats
    regardless of corpus size, never rows.  Returns a pandas DataFrame
    of the upper triangle ``(i, j, cov)`` with
    ``cov = (Σxixj − ΣxiΣxj/n)/n`` rounded to ``round_dp`` (the float
    fold is summation-order dependent at ~1e-13; rounding puts the SQL
    twin and any partitioning on identical bytes)."""
    import ray

    def _partial(t: "pa.Table"):
        mat = np.asarray(
            [np.asarray(v, dtype=np.float64)
             for v in t[emb_col].to_pylist()])
        if mat.size == 0:
            return None
        return len(mat), mat.sum(axis=0), mat.T @ mat

    parts = [p for p in ray.get([
        ray.remote(_partial).remote(r)
        for r in emb_ds.select_columns([emb_col])
        .materialize().to_arrow_refs()]) if p is not None]
    if not parts:
        return pd.DataFrame({"i": pd.Series(dtype="int64"),
                             "j": pd.Series(dtype="int64"),
                             "cov": pd.Series(dtype="float64")})
    n = sum(p[0] for p in parts)
    sx = np.sum([p[1] for p in parts], axis=0)
    sxx = np.sum([p[2] for p in parts], axis=0)
    cov = (sxx - np.outer(sx, sx) / n) / n
    d = len(sx)
    iu, ju = np.triu_indices(d)
    vals = cov[iu, ju]
    if round_dp is not None:
        vals = np.round(vals, round_dp)
    return pd.DataFrame({"i": iu.astype(np.int64),
                         "j": ju.astype(np.int64), "cov": vals})


def pca_project(emb_ds, k: int = 2, id_col: str = "vec_id",
                emb_col: str = "embedding"):
    """Project embeddings onto their top-``k`` principal components.

    The covariance fold above gives the (d, d) matrix; ``np.linalg.eigh``
    on the driver (d ≤ a few thousand — never corpus-sized) yields the
    components with a deterministic sign convention (largest-|coord|
    entry made positive), then one broadcast matmul pass projects every
    row.  Returns a Dataset ``(id_col, pc0..pc{k-1})``."""
    import ray

    full = embedding_covariance(emb_ds, id_col, emb_col, round_dp=None)
    d = int(full["i"].max()) + 1 if len(full) else 0
    if d == 0:
        import ray.data as rd
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64())}))
    cov = np.zeros((d, d))
    cov[full["i"], full["j"]] = full["cov"]
    cov[full["j"], full["i"]] = full["cov"]
    mean_parts = [p for p in ray.get([
        ray.remote(lambda t: (t.num_rows, np.asarray(
            [np.asarray(v, dtype=np.float64)
             for v in t[emb_col].to_pylist()]).sum(axis=0)
            if t.num_rows else None)).remote(r)
        for r in emb_ds.select_columns([emb_col])
        .materialize().to_arrow_refs()]) if p[1] is not None]
    n = sum(p[0] for p in mean_parts)
    mu = np.sum([p[1] for p in mean_parts], axis=0) / n
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order]                      # (d, k)
    flip = np.sign(comps[np.abs(comps).argmax(axis=0),
                         np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    comps = comps * flip
    cref = ray.put((mu, comps))

    def _proj(t: "pa.Table") -> "pa.Table":
        m, c = ray.get(cref)                 # zero-copy plasma read
        mat = np.asarray([np.asarray(x, dtype=np.float64)
                          for x in t[emb_col].to_pylist()])
        out = {id_col: t[id_col].combine_chunks()}
        if len(mat):
            proj = (mat - m) @ c
            for j in range(c.shape[1]):
                out[f"pc{j}"] = pa.array(proj[:, j], pa.float64())
        else:
            for j in range(c.shape[1]):
                out[f"pc{j}"] = pa.array([], pa.float64())
        return pa.table(out)

    return emb_ds.map_batches(_proj, batch_format="pyarrow")
