"""Windowed event operators (sessionization).

Sessionization is the canonical "custom operator the Dataset API lacks"
(SURVEY.md §2 training-data extensions): expressed as a per-key
``groupby().map_groups`` so each user's ordered event stream is
processed in one task.  Partitioning assumption: one user's events fit a
worker (the hash shuffle moves each user to exactly one group task); at
10^12-event scale a hot user bounds a single task's size, which is the
standard sessionization shape — salt by (user, day) first if a key can
exceed worker memory.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def sessionize(events_ds, user_col: str = "user_id", ts_col: str = "ts",
               gap_sec: float = 1800.0):
    """Split each user's event stream into sessions at gaps > ``gap_sec``.

    Returns one row per (user, session): ``user_id, session_idx`` (1-based
    in time order), ``n_events``, ``start_us``, ``end_us`` (event-time
    bounds in epoch microseconds).
    """
    gap_us = int(round(gap_sec * 1_000_000))

    def _to_us(t: pa.Table) -> pa.Table:
        micros = pc.cast(t[ts_col], pa.int64())
        if isinstance(micros, pa.ChunkedArray):
            micros = micros.combine_chunks()
        return pa.Table.from_arrays(
            [t[user_col].combine_chunks(), micros],
            names=[user_col, "t_us"])

    def _sess(df: pd.DataFrame) -> pd.DataFrame:
        empty = {
            user_col: pd.Series(dtype="int64"),
            "session_idx": pd.Series(dtype="int64"),
            "n_events": pd.Series(dtype="int64"),
            "start_us": pd.Series(dtype="int64"),
            "end_us": pd.Series(dtype="int64"),
        }
        if not len(df):
            return pd.DataFrame(empty)
        t = np.sort(df["t_us"].to_numpy(dtype=np.int64))
        new = np.ones(len(t), dtype=bool)
        new[1:] = (t[1:] - t[:-1]) > gap_us
        starts = np.flatnonzero(new)
        ends = np.concatenate([starts[1:], [len(t)]])
        return pd.DataFrame({
            user_col: np.full(len(starts), int(df[user_col].iloc[0]),
                              dtype=np.int64),
            "session_idx": np.arange(1, len(starts) + 1, dtype=np.int64),
            "n_events": (ends - starts).astype(np.int64),
            "start_us": t[starts],
            "end_us": t[ends - 1],
        })

    return (events_ds
            .map_batches(_to_us, batch_format="pyarrow")
            .groupby(user_col)
            .map_groups(_sess, batch_format="pandas"))
