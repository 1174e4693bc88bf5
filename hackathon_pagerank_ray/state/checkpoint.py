"""Per-sweep checkpoint/manifest layout (SURVEY.md §7.7, north_rule).

    <ckpt_dir>/sweeps/it=<k>/        published (complete) sweep
        manifest.json                iteration, residual, per-partition
                                     rows/bytes/seconds + edge-shard metrics
        ranks/part-<j>.parquet       one file per RankOwner partition
    <ckpt_dir>/sweeps/it=<k>.tmp/    in-flight sweep (discarded on resume)

A sweep is complete iff its directory carries ``manifest.json``; the tmp →
final rename after the manifest write makes publication atomic, so a job
killed mid-sweep resumes from the previous complete sweep and the partial
directory is ignored (mid-iteration resume).
"""

from __future__ import annotations

import json
import os
import re
import shutil

_SWEEP_RE = re.compile(r"^it=(\d+)$")


def sweep_dir(ckpt_dir: str, it: int, tmp: bool = False) -> str:
    suffix = ".tmp" if tmp else ""
    return os.path.join(ckpt_dir, "sweeps", f"it={it}{suffix}")


def write_sweep_manifest(ckpt_dir: str, it: int, payload: dict) -> str:
    tmp = sweep_dir(ckpt_dir, it, tmp=True)
    final = sweep_dir(ckpt_dir, it)
    os.makedirs(tmp, exist_ok=True)
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(payload, f, indent=1, default=str)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)
    return final


def read_manifest(ckpt_dir: str, it: int) -> dict | None:
    path = os.path.join(sweep_dir(ckpt_dir, it), "manifest.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def latest_sweep(ckpt_dir: str):
    """(iteration, manifest) of the newest COMPLETE sweep, else None."""
    root = os.path.join(ckpt_dir, "sweeps")
    if not os.path.isdir(root):
        return None
    best = -1
    for name in os.listdir(root):
        m = _SWEEP_RE.match(name)
        if m and os.path.exists(os.path.join(root, name, "manifest.json")):
            best = max(best, int(m.group(1)))
    if best < 0:
        return None
    return best, read_manifest(ckpt_dir, best)
