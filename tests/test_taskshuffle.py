"""Task-shuffle combine parity (stages/taskshuffle.py): the two-wave
task shuffle must be bit-identical to a reference pandas groupby for
int64 sums/max/dedup — including negative keys (signed 64-bit hashes),
multi-block inputs, and empties."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from hackathon_pagerank_ray.stages.taskshuffle import (distinct_int64,
                                                       grouped_agg_int64)


def _fixture(n=50_000, seed=3):
    rng = np.random.default_rng(seed)
    k = rng.integers(-10**12, 10**12, n)
    v = rng.integers(-100, 100, n)
    return k, v, rd.from_arrow(pa.table({"k": k, "v": v})).repartition(7)


def test_grouped_sum_parity_negative_keys():
    k, v, ds = _fixture()
    out = (grouped_agg_int64(ds, "k", "v", op="sum").to_pandas()
           .sort_values("k").reset_index(drop=True))
    ref = (pd.DataFrame({"k": k, "v": v}).groupby("k")["v"].sum()
           .reset_index().rename(columns={"v": "agg"})
           .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)


def test_grouped_max_and_count_parity():
    k, v, ds = _fixture(seed=5)
    out = (grouped_agg_int64(ds, "k", "v", op="max").to_pandas()
           .sort_values("k").reset_index(drop=True))
    ref = (pd.DataFrame({"k": k, "v": v}).groupby("k")["v"].max()
           .reset_index().rename(columns={"v": "agg"})
           .sort_values("k").reset_index(drop=True))
    pd.testing.assert_frame_equal(out, ref, check_dtype=False)
    cnt = (grouped_agg_int64(ds, "k", None, op="sum", out_val="n")
           .to_pandas().sort_values("k").reset_index(drop=True))
    refc = (pd.DataFrame({"k": k}).groupby("k").size()
            .reset_index(name="n").sort_values("k")
            .reset_index(drop=True))
    pd.testing.assert_frame_equal(cnt, refc, check_dtype=False)


def test_grouped_sum_exact_beyond_2_53():
    # float64-weighted bincount rounds 2**53 + 1 to 2**53; the combine
    # must take the exact int64 path for large magnitudes.
    k = np.array([1, 1, 2, 2, 3], dtype=np.int64)
    v = np.array([2**53, 1, -(2**60), 2**60 + 7, 2**62], dtype=np.int64)
    ds = rd.from_arrow(pa.table({"k": k, "v": v})).repartition(2)
    out = (grouped_agg_int64(ds, "k", "v", op="sum").to_pandas()
           .sort_values("k").reset_index(drop=True))
    assert out["agg"].tolist() == [2**53 + 1, 7, 2**62]


def test_distinct_and_empty():
    k, _, ds = _fixture(seed=7)
    d = distinct_int64(ds, "k").to_pandas()
    assert sorted(d["k"]) == sorted(set(k))
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    assert distinct_int64(empty, "k").count() == 0
    assert grouped_agg_int64(empty, "k", None).count() == 0
