"""Regenerate the anchor_text oracle fixture.

The anchor-text index parses HTML, which no SQL engine can reproduce,
so its driver oracle is a committed expected-output parquet
(tests/fixtures/anchor_text_expected.parquet).  Unlike the flagship
fixture (pipeline-output pin), the expected values here are computed
by an INDEPENDENT single-process loop (plain dict/Counter aggregation,
no Ray) and the Ray pipeline is asserted exactly equal to it before
the fixture is written — a true double implementation of the
aggregation and tie-break conventions.

Run after any DELIBERATE change to extractor or anchor semantics:

    python tools/make_anchor_fixture.py
"""

from __future__ import annotations

import os
import sys
from collections import Counter, defaultdict
from urllib.parse import urlparse

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIXTURE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "fixtures",
    "anchor_text_expected.parquet")
CORPUS = "/tmp/graft_corpus_200_s42"


def expected_direct() -> "pd.DataFrame":
    """No-Ray reference: loop the corpus pages, Counter the anchors."""
    import pandas as pd
    import pyarrow.parquet as pq

    from hackathon_pagerank_ray.extract import (extract_anchors,
                                                extract_text,
                                                get_base_domain,
                                                normalize_url, parse_html)

    per_target: dict[str, Counter] = defaultdict(Counter)
    for fn in sorted(os.listdir(CORPUS)):
        if not fn.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(CORPUS, fn), columns=["url", "html"])
        for url, html in zip(t["url"].to_pylist(), t["html"].to_pylist()):
            if html is None or len(html) > 2_000_000:
                continue
            doc = parse_html(html.decode("utf-8", errors="replace"))
            norm = normalize_url(url)
            base = get_base_domain(urlparse(norm).netloc.lower())
            extract_text(doc)     # prune first (reference contract)
            for target, text in extract_anchors(doc, norm, base):
                per_target[target][text] += 1

    rows = []
    for target in sorted(per_target):
        c = per_target[target]
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        rows.append((target, sum(c.values()), len(c), top))
    return pd.DataFrame(rows, columns=["url", "n_anchors",
                                       "n_unique_texts", "top_text"])


def main():
    import pandas as pd
    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    from hackathon_pagerank_ray.testgen import write_pages_parquet
    if not os.path.exists(os.path.join(CORPUS, "part-00000.parquet")):
        write_pages_parquet(CORPUS, 200, seed=42)

    exp = expected_direct()

    import __ray_entry__ as entrymod
    got = (entrymod.queries()["anchor_text"]("/root/testdata/sf0.01")
           .to_pandas().sort_values("url").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_exact=True)

    exp.to_parquet(FIXTURE, index=False)
    print(f"fixture rewritten: {len(exp)} rows -> {FIXTURE} "
          f"(Ray pipeline == independent loop, exact)")
    ray.shutdown()


if __name__ == "__main__":
    main()
