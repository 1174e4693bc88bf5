"""Deterministic sampling operators for training-data pipelines.

At 100 TB you cannot hold a Bernoulli RNG stream stable across retries,
re-partitioning, or a resumed run — a sample must be a pure function of
the row key.  These operators key every decision on the md5 of
``"{seed}:{key}"`` so the selection is reproducible anywhere (including
inside a DuckDB SQL oracle, which computes the identical md5), stable
under re-execution, and embarrassingly parallel (a per-batch filter; no
shuffle, no driver state).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

#: width of the hex prefix compared against the rate threshold; 8 hex
#: digits = 32 bits of the md5, plenty for sampling-rate resolution
_PREFIX = 8


def _bucket_hex(seed, key) -> str:
    return hashlib.md5(f"{seed}:{key}".encode("utf-8")).hexdigest()[:_PREFIX]


def _bucket32(seed, keys) -> np.ndarray:
    """Vectorized :func:`_bucket_hex`: the numeric value of each key's
    8-hex-digit md5 prefix as int64 (fixed-width lowercase hex compares
    lexicographically == numerically, so ``_bucket32(...) < int(thr, 16)``
    is exactly ``_bucket_hex(...) < thr``).  Bulk-hashed via
    stats._bulk_md5_upper_be — no per-row hashlib loop."""
    from .stats import _bulk_md5_upper_be
    arr = np.asarray(keys)
    if arr.dtype.kind != "U":
        arr = arr.astype(str)
    h = _bulk_md5_upper_be(arr, [f"{seed}:"])[0]
    return (h >> np.uint64(32)).astype(np.int64)


def rate_threshold_hex(rate: float) -> str:
    """The lexicographic threshold a row's md5-prefix is compared to:
    fixed-width lowercase hex, so string order == numeric order (the same
    comparison a SQL oracle can run verbatim)."""
    rate = min(max(rate, 0.0), 1.0)
    return format(int(rate * (1 << (4 * _PREFIX))), f"0{_PREFIX}x")


def hash_sample(ds, key_col: str, rate: float, seed=42):
    """Keep ~``rate`` of rows, chosen by ``md5(f"{seed}:{key}")`` — a
    deterministic, key-stable Bernoulli sample.

    The same key always lands on the same side of the threshold for a
    given seed, across runs, partitionings and engines; different seeds
    give independent samples.  SQL-oracle equivalent::

        WHERE substr(md5('{seed}:' || CAST(key AS VARCHAR)), 1, 8)
              < '{rate_threshold_hex(rate)}'
    """
    if rate >= 1.0:
        return ds
    thr = rate_threshold_hex(rate)
    if rate <= 0.0:
        return ds.filter(lambda _: False)

    thr_num = int(thr, 16)

    def _keep(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        if not t.num_rows:
            return t
        keep = _bucket32(
            seed, t[key_col].to_numpy(zero_copy_only=False)) < thr_num
        return t.filter(pa.array(keep))

    return ds.map_batches(_keep, batch_format="pyarrow")


def hash_split(ds, key_col: str, frac: float = 0.9, seed=42,
               split_col: str = "split"):
    """Tag every row ``"train"`` / ``"holdout"`` by the same md5-prefix
    rule (``< threshold`` → train).  A labelling, not a filter, so one
    pass materializes both sides consistently; the split is stable under
    re-runs and independent of row order."""
    thr = rate_threshold_hex(frac)

    thr_num = int(thr, 16)

    def _tag(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        if not t.num_rows:
            return t.append_column(split_col,
                                   pa.array([], pa.string()))
        train = _bucket32(
            seed, t[key_col].to_numpy(zero_copy_only=False)) < thr_num
        return t.append_column(
            split_col, pa.array(np.where(train, "train", "holdout")))

    return ds.map_batches(_tag, batch_format="pyarrow")


def mix_sources(ds, rates: dict, source_col: str = "source",
                key_col: str = "doc_id", seed: int = 11):
    """Deterministic source-proportion mixing — the corpus-assembly step
    of an LLM data pipeline (upweight curated sources, downsample the
    crawl): keep each row with its source's rate via the module's
    md5-keep rule, so the mix is key-stable across retries and
    re-partitionings and reproducible in SQL.

    ``rates`` maps source value → keep rate; sources not listed drop
    (rate 0), rates ≥ 1.0 keep everything.  A pure per-batch filter —
    no shuffle, no driver state.  SQL twin (rates < 1):
    ``substr(md5('{seed}:' || key), 1, 8) < CASE source ... END``.
    """
    thr = {s: int(rate_threshold_hex(min(r, 1.0)), 16)
           if r < 1.0 else (1 << 32) for s, r in rates.items()}

    def _keep(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        if not t.num_rows:
            return t
        h = _bucket32(seed, t[key_col].to_numpy(zero_copy_only=False))
        sources = t[source_col].to_numpy(zero_copy_only=False)
        tv = np.zeros(t.num_rows, dtype=np.int64)
        for s, lim in thr.items():              # |rates| distinct sources
            tv[sources == s] = lim
        return t.filter(pa.array(h < tv))

    return ds.map_batches(_keep, batch_format="pyarrow")


def stratified_sample(ds, key_col: str, id_col: str, n_per_key: int,
                      seed=42):
    """Keep the ``n_per_key`` rows per key with the smallest
    ``(md5(f"{seed}:{id}")`` prefix, id)`` — a deterministic fixed-size
    stratified sample (the key-stable analogue of per-stratum reservoir
    sampling).

    Combiner-shaped: each block first reduces to ≤ n rows per key it
    contains, so the hash exchange moves at most ``n_per_key × blocks``
    rows per key, never the raw table.  SQL-oracle equivalent:
    ``row_number() OVER (PARTITION BY key ORDER BY substr(md5(...),1,8),
    id) <= n``."""

    def _with_hex(batch: pd.DataFrame) -> pd.DataFrame:
        batch = batch.copy()
        # numeric prefix sorts identically to the fixed-width hex string
        batch["_h"] = _bucket32(seed, batch[id_col].to_numpy()) \
            if len(batch) else pd.Series(dtype=np.int64)
        return (batch.sort_values(["_h", id_col], kind="stable")
                .groupby(key_col, sort=False).head(n_per_key))

    def _final(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(["_h", id_col], kind="stable")
                .head(n_per_key).drop(columns=["_h"]))

    partial = ds.map_batches(_with_hex, batch_format="pandas")
    return partial.groupby(key_col).map_groups(
        _final, batch_format="pandas")


def quality_weighted_sample(ds, key_col: str, weight_col: str, seed=42):
    """Per-row Bernoulli keep with row-specific probability
    ``min(1, weight)`` — deterministic (md5-keyed like hash_sample), so
    quality-temperature resampling is stable across retries and engines.

    Keep rule (mirrored verbatim by the SQL oracle): weight ≥ 1 always
    keeps; otherwise keep iff ``substr(md5('{seed}:{key}'),1,8) <
    printf('%08x', floor(weight · 2³²))``."""

    def _keep(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        if not t.num_rows:
            return t
        w = t[weight_col].to_numpy(zero_copy_only=False) \
            .astype(np.float64, copy=False)
        h = _bucket32(seed, t[key_col].to_numpy(zero_copy_only=False))
        thr = np.floor(np.clip(w, 0.0, 1.0) * 4294967296.0).astype(np.int64)
        return t.filter(pa.array((w >= 1.0) | (h < thr)))

    return ds.map_batches(_keep, batch_format="pyarrow")


def deterministic_shuffle(ds, id_col: str = "doc_id", seed: int = 7,
                          out_col: str = "pos"):
    """Deterministic global corpus shuffle with explicit 1-based
    positions — the "randomize training-example order" step of a
    pre-training data pipeline, made a pure function of the row key so
    a resumed / re-partitioned run reproduces the identical order.

    Shuffle key = ``(h31 << 32) | id`` where ``h31`` is the low 31 bits
    of the 32-bit md5 prefix of ``"{seed}:{id}"`` (the module's standard
    hash rule) — a unique int64, so positions come straight from
    :func:`..aggregates.prefix_sum` of ones over the key (one range
    sort + a block-offset broadcast; no driver materialization).
    Requires ``0 <= id < 2**32`` (the packed-key bound; ids above it
    need a wider key column).  Returns ``(id_col, out_col)``.
    """
    from .aggregates import prefix_sum

    def _key(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa

        from .stats import _bulk_md5_upper_be
        ids = t[id_col].to_numpy(zero_copy_only=False)
        # enforce the packed-key bound: an id outside [0, 2**32) would
        # silently corrupt both the ordering key and the recovered id
        if len(ids) and (ids.min() < 0 or ids.max() >= 2 ** 32):
            raise ValueError(
                f"deterministic_shuffle: {id_col} must be in [0, 2**32) "
                f"for the packed int64 shuffle key (got range "
                f"[{ids.min()}, {ids.max()}])")
        # h31 = low 31 bits of the 32-bit md5 prefix = bits [32,63) of
        # the big-endian 8-byte hash value (bulk-hashed, no per-id loop)
        h64 = _bulk_md5_upper_be(ids.astype(str), [f"{seed}:"])[0]
        h = ((h64 >> np.uint64(32)).astype(np.int64)) & 0x7FFFFFFF
        return pa.table({
            "skey": pa.array((h << 32) | ids, pa.int64()),
            "one": pa.array(np.ones(len(ids), dtype=np.int64))})

    pos = prefix_sum(ds.map_batches(_key, batch_format="pyarrow"),
                     "skey", "one", out_col=out_col)

    def _unpack(t):
        import pyarrow as pa
        sk = t["skey"].to_numpy(zero_copy_only=False)
        return pa.table({id_col: pa.array(sk & 0xFFFFFFFF, type=pa.int64()),
                         out_col: t[out_col].combine_chunks()})

    return pos.map_batches(_unpack, batch_format="pyarrow")
