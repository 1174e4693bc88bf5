"""Regenerate the flagship_corpus oracle fixture.

The flagship pipeline parses HTML, which no SQL engine can reproduce, so
its driver oracle is a committed expected-output parquet
(tests/fixtures/flagship_corpus_expected.parquet).  This script runs the
``flagship_corpus`` query twice (second time from a fresh /tmp corpus),
asserts bit-exact run-to-run determinism, and rewrites the fixture.

Run after any DELIBERATE change to extractor or PageRank semantics:

    python tools/make_flagship_fixture.py
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures",
    "flagship_corpus_expected.parquet")


def main():
    import pandas as pd
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    def run():
        out = entrymod.queries()["flagship_corpus"]("/root/testdata/sf0.01")
        return out.to_pandas().sort_values("url").reset_index(drop=True)

    a = run()
    shutil.rmtree("/tmp/graft_corpus_200_s42", ignore_errors=True)
    b = run()
    pd.testing.assert_frame_equal(a, b, check_exact=True)
    a.to_parquet(FIXTURE, index=False)
    print(f"fixture rewritten: {len(a)} rows -> {FIXTURE}")
    ray.shutdown()


if __name__ == "__main__":
    main()
