"""Resumable partitioned Parquet sink.

Writes one ``{by}={key}/`` directory per partition key, each committed
atomically (data file written under a temp name, renamed, then a
``_SUCCESS`` marker created), so a failed run can be re-executed and
**skips every partition that already committed** — the brief's
"resumable output" contract, generalized from the PageRank sweep
checkpoints (graph/state.py) to arbitrary keyed tables.

Scale shape: one hash exchange on the key (``groupby().map_groups``);
each task writes only its own partition and returns a one-row manifest,
so the driver sees partition-count rows, never data.  Keys must be
filesystem-safe scalars (int/str); one key's rows must fit a worker task
— for heavier partitions use a coarser bucket column (e.g.
``hash(key) % 4096``), which is the same knob the reference's sharded
outputs use.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _part_dir(path: str, by: str, key) -> str:
    return os.path.join(path, f"{by}={key}")


def finished_keys(path: str, by: str) -> set[str]:
    """String keys of partitions that already committed (_SUCCESS)."""
    done = set()
    prefix = f"{by}="
    if os.path.isdir(path):
        for name in os.listdir(path):
            if name.startswith(prefix) and os.path.exists(
                    os.path.join(path, name, "_SUCCESS")):
                done.add(name[len(prefix):])
    return done


def write_partitioned(ds, path: str, by: str, resume: bool = True):
    """Write ``ds`` under ``path`` partitioned by column ``by``.

    Returns the manifest as a pandas DataFrame:
    ``(key, rows, skipped)`` — one row per partition key.  With
    ``resume=True`` (default), partitions whose ``_SUCCESS`` marker
    exists are not rewritten (``skipped=True``, ``rows`` = rows the
    rerun WOULD have written)."""
    import ray

    os.makedirs(path, exist_ok=True)
    done_ref = ray.put(finished_keys(path, by) if resume else set())

    def _write(g: pd.DataFrame) -> pd.DataFrame:
        key = g[by].iloc[0]
        row = {"key": str(key), "rows": len(g), "skipped": False}
        if str(key) in ray.get(done_ref):
            row["skipped"] = True
            return pd.DataFrame([row])
        d = _part_dir(path, by, key)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, ".part-0.parquet.tmp")
        pq.write_table(pa.Table.from_pandas(g, preserve_index=False), tmp)
        os.replace(tmp, os.path.join(d, "part-0.parquet"))
        with open(os.path.join(d, "_SUCCESS"), "w") as f:
            f.write("")
        return pd.DataFrame([row])

    manifest = (ds.groupby(by).map_groups(_write, batch_format="pandas")
                .to_pandas())
    return manifest.sort_values("key").reset_index(drop=True)


def read_partitioned(path: str, by: str, **kw):
    """Read back every committed partition as one Dataset (uncommitted
    partial directories are ignored)."""
    import ray.data as rd

    dirs = [os.path.join(_part_dir(path, by, k), "part-0.parquet")
            for k in sorted(finished_keys(path, by))]
    return rd.read_parquet(dirs, **kw)
